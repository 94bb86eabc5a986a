"""Cyclic accumulation + occurrence detection — t.rast.accumulate family.

``r.series.accumulate`` (``raster/r.series.accumulate/main.c:343-418``)
per cell: take the inputs' average (optionally (avg+max)/2 for huglin),
scale/shift, apply the method, add the running basemap:

* ``mean``:    contribution = avg
* ``gdd``:     contribution = max(avg - lower, 0)
* ``bedd``:    contribution = max(min(avg, upper) - lower, 0)
* ``huglin``:  contribution = max((avg + max)/2 - lower, 0)

``t.rast.accumulate`` (``temporal/t.rast.accumulate/t.rast.accumulate.py:155-527``)
chains these over ordered steps, each step's basemap = previous
accumulation.  Here the step sequence is a key's window sequence in a
nested tier row, so the running sum is a row-local ``np.cumsum`` —
ordered scan state without any actor (the series lives in one row).

``accdetect``-style detection (``temporal/t.rast.accdetect``): per key,
the first window where the accumulated value enters [range_lo, range_hi]
(occurrence start) and the first where it exceeds range_hi (end).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


_METHODS = ("mean", "gdd", "bedd", "huglin")


def accumulate_batch(
    batch: pa.Table,
    *,
    method: str = "gdd",
    lower: float = 0.0,
    upper: float = float("inf"),
    scale: float = 1.0,
    shift: float = 0.0,
    avg_col: str = "average",
    max_col: str = "maximum",
    out_col: str = "accum",
    cycle: int | None = None,
) -> pa.Table:
    """`cycle`: restart the running sum every `cycle` windows — the
    ``t.rast.accumulate`` cycle loop (e.g. yearly GDD restart,
    ``t.rast.accumulate.py:155+``); accumulation then runs within
    ``cycle_id = window // cycle`` groups."""
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}")
    col = batch.column(avg_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = np.asarray(col.value_lengths().to_numpy(zero_copy_only=False)).astype(np.int64)
    avg = col.flatten().cast(pa.float64()).to_numpy(zero_copy_only=False)
    avg = avg * scale + shift
    if method == "huglin":
        mx = (
            batch.column(max_col)
            .combine_chunks()
            .flatten()
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        mx = mx * scale + shift
        avg = (avg + mx) / 2.0
    if method == "bedd":
        avg = np.minimum(avg, upper)
    if method in ("gdd", "bedd", "huglin"):
        contrib = np.maximum(avg - lower, 0.0)
    else:
        contrib = avg
    # NULL windows contribute 0 but stay NULL in the accumulated output
    isnan = np.isnan(contrib)
    safe = np.where(isnan, 0.0, contrib)
    # per-segment cumulative sum: global cumsum minus each segment's
    # base, where a segment is a row — or a (row, cycle) group when
    # `cycle` is set (windows assumed ascending per row, as rollup emits)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    if cycle:
        wcol = batch.column("windows")
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        w = wcol.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        cyc = np.floor_divide(w, cycle)
        n = len(w)
        boundary = np.ones(n, dtype=bool)
        if n:
            row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            boundary[1:] = (cyc[1:] != cyc[:-1]) | (row_of[1:] != row_of[:-1])
        seg_starts = np.flatnonzero(boundary)
    else:
        seg_starts = starts[lens > 0]
    c = np.cumsum(safe)
    base = np.where(seg_starts > 0, c[np.maximum(seg_starts - 1, 0)], 0.0)
    seg_lens = np.diff(np.append(seg_starts, len(safe)))
    acc = c - np.repeat(base, seg_lens)
    acc[isnan] = np.nan
    offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
    arr = pa.ListArray.from_arrays(
        offsets, pa.array(acc, type=pa.float64(), mask=np.isnan(acc))
    )
    return batch.append_column(out_col, arr)


def accumulate(ds, **kw):
    return ds.map_batches(
        lambda b: accumulate_batch(b, **kw), batch_format="pyarrow", batch_size=256
    )


def accdetect_batch(
    batch: pa.Table,
    *,
    range_lo: float,
    range_hi: float,
    accum_col: str = "accum",
) -> pa.Table:
    """Per key: first window where accum >= range_lo (start) and first
    where accum > range_hi (end); -1 when never reached."""
    col = batch.column(accum_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    windows = batch.column("windows")
    if isinstance(windows, pa.ChunkedArray):
        windows = windows.combine_chunks()
    lens = np.asarray(col.value_lengths().to_numpy(zero_copy_only=False)).astype(np.int64)
    acc = col.flatten().cast(pa.float64()).to_numpy(zero_copy_only=False)
    w = windows.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    BIG = np.iinfo(np.int64).max
    idx = np.arange(len(acc), dtype=np.int64)
    has = lens > 0

    def first_where(cond):
        cand = np.where(cond & ~np.isnan(acc), idx, BIG)
        out = np.full(len(lens), -1, dtype=np.int64)
        if has.any() and len(cand):
            picked = np.minimum.reduceat(cand, starts[has])
            sel = picked != BIG
            res = np.full(int(has.sum()), -1, dtype=np.int64)
            res[sel] = w[picked[sel]]
            out[has] = res
        return out

    start_w = first_where((acc >= range_lo) & (acc <= range_hi))
    end_w = first_where(acc > range_hi)
    cols = {}
    for k in batch.column_names:
        if not isinstance(batch.column(k).type, pa.ListType):
            cols[k] = batch.column(k)
    cols["occurrence_start"] = pa.array(start_w)
    cols["occurrence_end"] = pa.array(end_w)
    return pa.table(cols)


def accdetect(ds, **kw):
    return ds.map_batches(
        lambda b: accdetect_batch(b, **kw), batch_format="pyarrow", batch_size=512
    )
