"""Continuous-aggregate tier cascade — aggregate of aggregates.

The reference re-aggregates a fine STRDS into a coarser one by running
``t.rast.aggregate`` again over the already-aggregated maps (the
``aggregation_type`` metadata records what was applied,
``t.rast.aggregate/t.rast.aggregate.py:226-227``).  Here tiers cascade
1m→1h→1d by re-reducing *partials* carried in the nested tier rows:

* ``count`` / ``sum`` / ``minimum`` / ``maximum`` re-reduce exactly;
* ``average`` is finalized from (sum, count);
* ``range`` from (min, max);
* holistic methods (median/quantile/mode/...) are **not** decomposable
  and must come from raw — callers get a hard error, mirroring the
  FIXTURES F7 contract.

Because a key's whole window list lives in one nested row, the cascade
is a stateless row-local ``map_batches`` — the tier chain needs **no
re-shuffle at any scale** (the partition key excludes the window,
SURVEY §4 "Shuffle" row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: columns a cascade-capable tier must carry.
PARTIAL_COLS = ("count", "sum", "minimum", "maximum")

DERIVED = {"average", "range"}


def _flat_f64(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """list column -> (flat float64 with NaN nulls, list lengths)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lengths = np.asarray(col.value_lengths().to_numpy(zero_copy_only=False))
    flat = col.flatten().cast(pa.float64()).to_numpy(zero_copy_only=False)
    return flat, lengths.astype(np.int64)


def cascade_batch(
    batch: pa.Table,
    factor: int,
    *,
    extra_methods: tuple = ("average", "range"),
) -> pa.Table:
    """Re-reduce one nested-tier batch into a `factor`× coarser tier."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    windows, lens = _flat_f64(batch.column("windows"))
    windows = windows.astype(np.int64)
    nrows = batch.num_rows
    row_of = np.repeat(np.arange(nrows, dtype=np.int64), lens)
    coarse = windows // factor
    n = len(windows)
    if n == 0:
        boundary = np.empty(0, dtype=bool)
    else:
        boundary = np.ones(n, dtype=bool)
        boundary[1:] = (coarse[1:] != coarse[:-1]) | (row_of[1:] != row_of[:-1])
    starts = np.flatnonzero(boundary)
    seg_row = row_of[starts] if n else np.empty(0, np.int64)
    seg_window = coarse[starts] if n else np.empty(0, np.int64)

    cnt_f, _ = _flat_f64(batch.column("count"))
    sum_f, _ = _flat_f64(batch.column("sum"))
    min_f, _ = _flat_f64(batch.column("minimum"))
    max_f, _ = _flat_f64(batch.column("maximum"))

    def seg_add(arr):
        return np.add.reduceat(arr, starts) if n else np.empty(0)

    # count: NaN only in propagate mode; treat NaN as 0 contribution
    ccount = seg_add(np.nan_to_num(cnt_f, nan=0.0))
    csum = seg_add(np.where(np.isnan(sum_f), 0.0, sum_f))
    empty = ccount == 0
    csum[empty] = np.nan
    cmin = (
        np.minimum.reduceat(np.where(np.isnan(min_f), np.inf, min_f), starts)
        if n
        else np.empty(0)
    )
    cmax = (
        np.maximum.reduceat(np.where(np.isnan(max_f), -np.inf, max_f), starts)
        if n
        else np.empty(0)
    )
    cmin[empty] = np.nan
    cmax[empty] = np.nan

    out_vals = {
        "count": ccount,
        "sum": csum,
        "minimum": cmin,
        "maximum": cmax,
    }
    for m in extra_methods:
        if m == "average":
            with np.errstate(invalid="ignore", divide="ignore"):
                avg = csum / ccount
            avg[empty] = np.nan
            out_vals["average"] = avg
        elif m == "range":
            out_vals["range"] = cmax - cmin
        else:
            raise ValueError(
                f"method {m!r} is not decomposable — recompute from raw "
                "(FIXTURES F7; holistic reducers cascade only from tier 0 input)"
            )

    # pack back to nested rows (windows per row after coarsening)
    nwin = np.bincount(seg_row, minlength=nrows).astype(np.int64)
    offsets = pa.array(np.concatenate([[0], np.cumsum(nwin)]).astype(np.int32))
    old_gran = batch.column("gran")[0].as_py() if nrows else 1
    cols = {}
    for k in batch.column_names:
        if k in ("gran", "windows") or k in out_vals or k in PARTIAL_COLS:
            continue
        if not isinstance(batch.column(k).type, pa.ListType):
            cols[k] = batch.column(k)
    cols["gran"] = pa.array(np.full(nrows, old_gran * factor, dtype=np.int64))
    cols["windows"] = pa.ListArray.from_arrays(
        offsets, pa.array(seg_window, type=pa.int64())
    )
    for name, arr in out_vals.items():
        mask = np.isnan(arr)
        if name == "count":
            vals = pa.array(
                np.where(mask, 0, arr).astype(np.int64), mask=mask
            )
        else:
            vals = pa.array(arr, type=pa.float64(), mask=mask)
        cols[name] = pa.ListArray.from_arrays(offsets, vals)
    return pa.table(cols)


def cascade(ds, factor: int, **kw):
    """Nested tier Dataset -> coarser nested tier (stateless, no shuffle)."""
    return ds.map_batches(
        lambda b: cascade_batch(b, factor, **kw),
        batch_format="pyarrow",
        batch_size=256,
    )


def refine_batch(batch: pa.Table, factor: int) -> pa.Table:
    """Nested tier -> FINER nested tier by replication: each window
    splits into ``factor`` sub-windows carrying the same value — the
    reference's common-granularity resample (``setup_common_granularity``
    in temporal_raster_base_algebra.py: every operand is re-sampled to
    the common granularity before evaluation, each coarse map simply
    covering all its fine steps).  Extents are preserved exactly:
    gran' = gran/factor, w -> w·factor + j, worigin unchanged.  Value
    columns replicate verbatim (right for state-like values such as
    average/min/max; a replicated ``count``/``sum`` is NOT a per-fine-
    window aggregate — refine is a topology resample, not a rollup)."""
    if factor <= 0:
        raise ValueError("refine factor must be positive")
    gran = batch.column("gran").to_numpy(zero_copy_only=False)
    if (gran % factor).any():
        raise ValueError(
            f"refine factor {factor} does not divide every gran "
            f"(grans {sorted(set(gran.tolist()))[:5]})"
        )
    windows = batch.column("windows")
    if isinstance(windows, pa.ChunkedArray):
        windows = windows.combine_chunks()
    lens = np.asarray(
        windows.value_lengths().to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    flat_w = np.asarray(windows.flatten().to_numpy(zero_copy_only=False)).astype(
        np.int64
    )
    new_w = (
        flat_w[:, None] * factor + np.arange(factor, dtype=np.int64)[None, :]
    ).ravel()
    rep = np.repeat(np.arange(len(flat_w), dtype=np.int64), factor)
    new_offsets = np.zeros(batch.num_rows + 1, dtype=np.int64)
    np.cumsum(lens * factor, out=new_offsets[1:])
    cols = {}
    for k in batch.column_names:
        col = batch.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if k == "gran":
            cols[k] = pa.array(gran // factor, type=pa.int64())
        elif k == "windows":
            cols[k] = pa.LargeListArray.from_arrays(
                pa.array(new_offsets), pa.array(new_w)
            ).cast(pa.list_(pa.int64()))
        elif isinstance(col.type, pa.ListType):
            flat = col.flatten()
            cols[k] = pa.LargeListArray.from_arrays(
                pa.array(new_offsets), flat.take(pa.array(rep))
            ).cast(pa.list_(flat.type))
        else:
            cols[k] = col
    return pa.table(cols)


def refine(ds, factor: int):
    """Nested tier Dataset -> finer nested tier (stateless, no
    shuffle) — the inverse direction of :func:`cascade`."""
    return ds.map_batches(
        lambda b: refine_batch(b, factor),
        batch_format="pyarrow",
        batch_size=256,
    )


def explode_nested(ds, value_cols=None):
    """Nested tier -> flat points (source, doc_id, gran, window, cols...)."""

    def kernel(batch: pa.Table) -> pa.Table:
        windows = batch.column("windows")
        if isinstance(windows, pa.ChunkedArray):
            windows = windows.combine_chunks()
        lens = np.asarray(windows.value_lengths().to_numpy(zero_copy_only=False)).astype(np.int64)
        row_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        take = pa.array(row_of)
        cols = {}
        for k in batch.column_names:
            col = batch.column(k)
            if isinstance(col.type, pa.ListType):
                if k == "windows":
                    cols["window"] = col.combine_chunks().flatten()
                elif value_cols is None or k in value_cols:
                    cols[k] = col.combine_chunks().flatten()
            else:
                cols[k] = col.take(take)
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow", batch_size=512)
