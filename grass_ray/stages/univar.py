"""Per-key univariate statistics — the ``t.rast.univar`` analog.

Mirrors ``python/grass/temporal/univar_statistics.py:38-124`` /
``raster/r.univar/stats.c:117-207``: for every registered map (here:
every key's token series, or every (key, window) after a rollup) emit
the r.univar column set::

    id, n, null_cells, min, max, range, mean, mean_of_abs,
    stddev, variance, coeff_var, sum, sum_abs
    [+ extended: quart1, median, quart3, perc90]

Notes on formulas (stats.c): population variance clamped >= 0,
``coeff_var = 100 * stddev / mean``.  The reference streams (n, Σ, Σ²);
we keep the same mergeable shape but compute per row locally (each key's
series is row-local), so no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from grass_ray.functions.reducers import reduce_segments
from grass_ray.stages.rollup import _flat_tokens_f64


def univar_batch(
    batch: pa.Table,
    *,
    extended: bool = False,
    key_cols=("source", "doc_id"),
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
) -> pa.Table:
    values = _flat_tokens_f64(batch.column(tokens_col))
    lens = (
        batch.column(n_tok_col)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    keep = lens > 0
    methods = [
        "count",
        "minimum",
        "maximum",
        "range",
        "average",
        "stddev",
        "variance",
        "coeff_var",
        "sum",
    ]
    if extended:
        methods += ["quart1", "median", "quart3", "perc90"]
    res = reduce_segments(values, lens[keep], methods)
    # abs stats: reuse the same segmentation over |values|
    res_abs = reduce_segments(np.abs(values), lens[keep], ["average", "sum"])
    # exact power sum Σv² (integer-valued tokens -> exact in float64):
    # lets callers derive variance with the closed form from exact sums
    res_sq = reduce_segments(values * values, lens[keep], ["sum"])

    nrows = batch.num_rows
    out: dict[str, pa.Array] = {}
    for k in key_cols:
        out[k] = batch.column(k)

    def expand(arr, int_type=False):
        full = np.full(nrows, np.nan)
        full[keep] = arr
        mask = np.isnan(full)
        if int_type:
            return pa.array(
                np.where(mask, 0, full).astype(np.int64), mask=mask
            )
        return pa.array(full, type=pa.float64(), mask=mask)

    n = res["count"]
    out["n"] = expand(n, int_type=True)
    out["null_cells"] = expand(lens[keep] - n, int_type=True)
    out["min"] = expand(res["minimum"])
    out["max"] = expand(res["maximum"])
    out["range"] = expand(res["range"])
    out["mean"] = expand(res["average"])
    out["mean_of_abs"] = expand(res_abs["average"])
    out["stddev"] = expand(res["stddev"])
    out["variance"] = expand(res["variance"])
    out["coeff_var"] = expand(res["coeff_var"])
    out["sum"] = expand(res["sum"])
    out["sum_abs"] = expand(res_abs["sum"])
    out["sum_sq"] = expand(res_sq["sum"])
    if extended:
        out["quart1"] = expand(res["quart1"])
        out["median"] = expand(res["median"])
        out["quart3"] = expand(res["quart3"])
        out["perc90"] = expand(res["perc90"])
    return pa.table(out)


def univar(ds, *, extended: bool = False, **kw):
    return ds.map_batches(
        lambda b: univar_batch(b, extended=extended, **kw),
        batch_format="pyarrow",
        batch_size=512,
    )


def attr_univar(ds, col: str, *, by=None, sample: bool = True):
    """Univariate statistics over an arbitrary numeric attribute column,
    optionally grouped — the ``t.vect.univar`` analog (vector-attribute
    statistics via ``v.univar``, ``univar_statistics.py:309-523``),
    including BOTH population and sample (n−1) variants like the
    reference's ``-e``/default split.

    Plan: per-block Arrow partials (n, nulls, Σx, Σx², Σ|x|, min, max)
    → one pre-combined merge exchange → closed-form finalization.
    Exact: with integer inputs every partial is an exact int64 sum, so
    the derived floats are formula-identical to a SQL derivation.
    Output columns: [by...], n, nulls, vmin, vmax, vrange, mean,
    mean_abs, variance, stddev, var_samp, stddev_samp, coeff_var, sum.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    keys = list(by) if by else []

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col)
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        xf = x.cast(pa.float64())
        null = pc.is_null(xf).to_numpy(zero_copy_only=False)
        v = np.where(null, 0.0, xf.to_numpy(zero_copy_only=False))
        cols = {k: batch.column(k) for k in keys}
        grp = pa.table(
            {
                **cols,
                "_n": pa.array((~null).astype(np.int64)),
                "_nulls": pa.array(null.astype(np.int64)),
                "_s": pa.array(v),
                "_s2": pa.array(v * v),
                "_sa": pa.array(np.abs(v)),
                "_min": pa.array(np.where(null, np.inf, v)),
                "_max": pa.array(np.where(null, -np.inf, v)),
            }
        )
        if keys:
            agg = grp.group_by(keys, use_threads=False).aggregate(
                [("_n", "sum"), ("_nulls", "sum"), ("_s", "sum"),
                 ("_s2", "sum"), ("_sa", "sum"), ("_min", "min"), ("_max", "max")]
            )
            return agg.rename_columns(
                keys + ["_n", "_nulls", "_s", "_s2", "_sa", "_min", "_max"]
            )
        return pa.table(
            {
                "_n": pa.array([int((~null).sum())], type=pa.int64()),
                "_nulls": pa.array([int(null.sum())], type=pa.int64()),
                "_s": pa.array([float(v.sum())]),
                "_s2": pa.array([float((v * v).sum())]),
                "_sa": pa.array([float(np.abs(v).sum())]),
                "_min": pa.array([float(np.min(np.where(null, np.inf, v))) if len(v) else np.inf]),
                "_max": pa.array([float(np.max(np.where(null, -np.inf, v))) if len(v) else -np.inf]),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if keys:
        from grass_ray.stages.join import bucket_agg

        merged = bucket_agg(
            partials,
            keys,
            [
                ("_n", "sum", "_n"),
                ("_nulls", "sum", "_nulls"),
                ("_s", "sum", "_s"),
                ("_s2", "sum", "_s2"),
                ("_sa", "sum", "_sa"),
                ("_min", "min", "_min"),
                ("_max", "max", "_max"),
            ],
        )
    else:
        merged = partials.groupby(None).aggregate(
            Sum("_n", alias_name="_n"),
            Sum("_nulls", alias_name="_nulls"),
            Sum("_s", alias_name="_s"),
            Sum("_s2", alias_name="_s2"),
            Sum("_sa", alias_name="_sa"),
            Min("_min", alias_name="_min"),
            Max("_max", alias_name="_max"),
        )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("_n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch.column("_s").to_numpy(zero_copy_only=False)
        s2 = batch.column("_s2").to_numpy(zero_copy_only=False)
        sa = batch.column("_sa").to_numpy(zero_copy_only=False)
        vmin = batch.column("_min").to_numpy(zero_copy_only=False)
        vmax = batch.column("_max").to_numpy(zero_copy_only=False)
        with np.errstate(all="ignore"):
            mean = s / n
            var = s2 / n - mean * mean
            var = np.where(var < 0, 0.0, var)  # stats.c clamp
            sd = np.sqrt(var)
            var_s = np.where(n > 1, (s2 - s * s / n) / (n - 1), np.nan)
            var_s = np.where(var_s < 0, 0.0, var_s)
            sd_s = np.sqrt(var_s)
            cv = 100.0 * sd / mean
        empty = n == 0
        def col_(a, nanify=True):
            a = np.where(empty, np.nan, a) if nanify else a
            return pa.array(a, type=pa.float64(), mask=np.isnan(a))
        cols = {k: batch.column(k) for k in keys}
        cols.update(
            {
                "n": batch.column("_n"),
                "nulls": batch.column("_nulls"),
                "vmin": col_(vmin),
                "vmax": col_(vmax),
                "vrange": col_(vmax - vmin),
                "mean": col_(mean),
                "mean_abs": col_(sa / n),
                "variance": col_(var),
                "stddev": col_(sd),
                "var_samp": col_(var_s),
                "stddev_samp": col_(sd_s),
                "coeff_var": col_(cv),
                "sum": col_(np.where(empty, np.nan, s), nanify=False),
            }
        )
        return pa.table(cols)

    return merged.map_batches(finalize, batch_format="pyarrow")


def value_histogram(
    ds,
    *,
    lo: float,
    hi: float,
    n_bins: int = 32,
    by: str = "source",
    tokens_col: str = "tokens",
):
    """Fixed-width value histogram of the token stream per ``by`` group
    — the r.stats / r.univar-histogram analog (reference:
    `raster/r.stats/main.c` category counts, `r.univar` with fp ranges).

    ``bin = floor((v − lo) / width)`` with ``width = (hi − lo)/n_bins``;
    values below ``lo`` land in bin −1, values at or above ``hi`` in bin
    ``n_bins`` (DuckDB twin uses LEAST/GREATEST on the same expression —
    the float ops are two fixed-order IEEE ops on exactly-representable
    int64 token values, so binning is bit-identical).  NULL tokens are
    excluded.  Plan: one vectorized per-batch partial (flatten +
    bincount per group) → a single narrow ``bucket_agg`` sum exchange —
    the wire carries one row per (group, non-empty bin) per block.
    """
    from grass_ray.stages.join import bucket_agg

    width = (float(hi) - float(lo)) / float(n_bins)

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = col.value_lengths().to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        flat = col.flatten()
        null = flat.is_null().to_numpy(zero_copy_only=False)
        import pyarrow.compute as pc

        v = (
            pc.fill_null(flat.cast(pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        bins = np.floor((v - float(lo)) / width)
        bins = np.clip(bins, -1.0, float(n_bins)).astype(np.int64)
        row_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        keys = batch.column(by)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        # group ids within the batch: dictionary-encode the key column
        enc = keys.dictionary_encode()
        gid = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_groups = len(enc.dictionary)
        sel = ~null
        # composite id: group * (n_bins + 2) + (bin + 1) — dense bincount
        comp = gid[row_of[sel]] * (n_bins + 2) + (bins[sel] + 1)
        counts = np.bincount(comp, minlength=n_groups * (n_bins + 2))
        nz = np.flatnonzero(counts)
        out_g = nz // (n_bins + 2)
        out_b = nz % (n_bins + 2) - 1
        return pa.table(
            {
                by: enc.dictionary.take(pa.array(out_g)),
                "bin": pa.array(out_b, type=pa.int64()),
                "n": pa.array(counts[nz].astype(np.int64)),
            }
        )

    return bucket_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        [by, "bin"],
        [("n", "sum", "n")],
    )
