"""Gap detection + linear-interpolation fill — the ``t.rast.gapfill`` analog.

Reference semantics (``temporal/t.rast.gapfill/t.rast.gapfill.py`` +
``raster/r.series.interp/main.c``):

* a gap is a missing window between two present windows of the same key
  (relation ``after`` between consecutive registered maps,
  ``abstract_space_time_dataset.py:1421-1492``);
* each gap window k of n between neighbors (left u1, right u2) gets
  position ``k/(n+1)`` → ``v = u1 + (u2-u1) * (w-wl)/(wr-wl)``
  (``r.series.interp/main.c:412-445``);
* either endpoint NULL → the fill is NULL (``main.c:435-441``);
* leading/trailing gaps (before the first / after the last present
  window) are NOT filled (``main.c:330-335``: outputs outside any input
  interval are skipped).

Golden fixture (FIXTURES F4 ≙ ``testsuite/test_gapfill.py:102-117``):
windows {0:100, 3:400, 11:1200} fill to {1:200, 2:300, 4:500..10:1100}.

Because a key's windows live in one nested row, gap-fill is a stateless
row-local ``map_batches`` — no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def gapfill_batch(
    batch: pa.Table,
    value_cols: tuple = ("average",),
) -> pa.Table:
    """Fill gaps in one nested-tier batch.

    Output: same keys, dense ``windows`` from each key's first to last
    present window, each value column linearly interpolated in the gaps,
    plus ``is_filled: list<bool>``.
    """
    windows_col = batch.column("windows")
    if isinstance(windows_col, pa.ChunkedArray):
        windows_col = windows_col.combine_chunks()
    lens = np.asarray(
        windows_col.value_lengths().to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    w = windows_col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    nrows = batch.num_rows
    n = len(w)
    row_of = np.repeat(np.arange(nrows, dtype=np.int64), lens)
    # next present window within the row; last element of each row has no next
    is_last = np.zeros(n, dtype=bool)
    ends = np.cumsum(lens) - 1
    is_last[ends[lens > 0]] = True
    next_w = np.empty_like(w)
    if n:
        next_w[:-1] = w[1:]
        next_w[-1] = w[-1]
    next_w[is_last] = w[is_last]
    gap = np.maximum(next_w - w - 1, 0)  # windows to synthesize after each
    counts = 1 + gap
    total = int(counts.sum())
    src = np.repeat(np.arange(n, dtype=np.int64), counts)
    cstarts = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=cstarts[1:])
    offset = np.arange(total, dtype=np.int64) - np.repeat(cstarts, counts)
    out_w = w[src] + offset
    out_row = row_of[src]
    filled = offset > 0
    with np.errstate(invalid="ignore", divide="ignore"):
        denom = (next_w - w).astype(np.float64)
        frac_all = np.where(denom > 0, 1.0 / denom, 0.0)
    frac = offset * frac_all[src]

    out_nwin = np.bincount(out_row, minlength=nrows).astype(np.int64)
    offsets = pa.array(np.concatenate([[0], np.cumsum(out_nwin)]).astype(np.int32))

    cols = {}
    for k in batch.column_names:
        col = batch.column(k)
        if not isinstance(col.type, pa.ListType):
            cols[k] = col
    cols["windows"] = pa.ListArray.from_arrays(
        offsets, pa.array(out_w, type=pa.int64())
    )
    for vc in value_cols:
        col = batch.column(vc)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.flatten().cast(pa.float64()).to_numpy(zero_copy_only=False)
        left = v[src]
        nxt = np.empty_like(v)
        if n:
            nxt[:-1] = v[1:]
            nxt[-1] = v[-1]
        nxt[is_last] = v[is_last]
        right = nxt[src]
        out_v = np.where(filled, left + (right - left) * frac, left)
        mask = np.isnan(out_v)
        cols[vc] = pa.ListArray.from_arrays(
            offsets, pa.array(out_v, type=pa.float64(), mask=mask)
        )
    cols["is_filled"] = pa.ListArray.from_arrays(
        offsets, pa.array(filled)
    )
    return pa.table(cols)


def gapfill(ds, value_cols: tuple = ("average",)):
    """Nested tier Dataset -> gap-filled nested tier (stateless)."""
    return ds.map_batches(
        lambda b: gapfill_batch(b, value_cols),
        batch_format="pyarrow",
        batch_size=256,
    )


def find_gaps_batch(batch: pa.Table) -> pa.Table:
    """Report gaps per key — the ``t.topology`` / gap-listing analog.

    Output: one row per gap: (key cols..., gap_start, gap_end, n_missing,
    left_window, right_window).
    """
    windows_col = batch.column("windows")
    if isinstance(windows_col, pa.ChunkedArray):
        windows_col = windows_col.combine_chunks()
    lens = np.asarray(
        windows_col.value_lengths().to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    w = windows_col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(w)
    row_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
    is_last = np.zeros(n, dtype=bool)
    ends = np.cumsum(lens) - 1
    is_last[ends[lens > 0]] = True
    next_w = np.empty_like(w)
    if n:
        next_w[:-1] = w[1:]
        next_w[-1] = w[-1]
    next_w[is_last] = w[is_last]
    has_gap = (next_w - w) > 1
    idx = np.flatnonzero(has_gap)
    take = pa.array(row_of[idx])
    cols = {}
    for k in batch.column_names:
        col = batch.column(k)
        if not isinstance(col.type, pa.ListType):
            cols[k] = col.take(take)
    cols["left_window"] = pa.array(w[idx])
    cols["right_window"] = pa.array(next_w[idx])
    cols["gap_start"] = pa.array(w[idx] + 1)
    cols["gap_end"] = pa.array(next_w[idx] - 1)
    cols["n_missing"] = pa.array(next_w[idx] - w[idx] - 1)
    return pa.table(cols)


def find_gaps(ds):
    return ds.map_batches(find_gaps_batch, batch_format="pyarrow", batch_size=512)
