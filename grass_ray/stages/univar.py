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
