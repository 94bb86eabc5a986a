"""Sliding-window (moving) statistics — the ``t.rast.neighbors`` analog.

``t.rast.neighbors`` runs a spatial moving-window ``r.neighbors`` per
map (``temporal/t.rast.neighbors/t.rast.neighbors.py:226+``); in the
1-D series mapping the neighborhood is a window of ``size`` consecutive
token positions centered on each position.  Values outside the series
are ignored (the region-edge behavior).  Every §2.1 reducer works as
the method — the window matrix feeds the same segmented kernels.

Row-local, stateless, vectorized via ``sliding_window_view`` with NaN
edge padding; memory per batch ≈ rows × n_tok × size × 8 bytes, so the
stage clamps ``batch_size`` for large windows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from grass_ray.functions.reducers import reduce_segments
from grass_ray.stages.rollup import _flat_tokens_f64


def neighbors_batch(
    batch: pa.Table,
    size: int = 3,
    method: str = "average",
    *,
    tokens_col: str = "tokens",
    out_col: str | None = None,
) -> pa.Table:
    if size % 2 != 1 or size < 1:
        raise ValueError("size must be odd and >= 1 (r.neighbors contract)")
    half = size // 2
    col = batch.column(tokens_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = np.asarray(col.value_lengths().to_numpy(zero_copy_only=False)).astype(np.int64)
    flat = _flat_tokens_f64(col)
    # pad every row with NaN halos so windows never cross rows
    n = len(lens)
    padded_len = lens + 2 * half
    total_pad = int(padded_len.sum())
    padded = np.full(total_pad, np.nan)
    pstarts = np.zeros(n, dtype=np.int64)
    np.cumsum(padded_len[:-1], out=pstarts[1:])
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    # scatter original values into the padded layout
    idx = (
        np.arange(len(flat), dtype=np.int64)
        - np.repeat(starts, lens)
        + np.repeat(pstarts, lens)
        + half
    )
    padded[idx] = flat
    # windows: one per original element; sliding view over the padded
    # array plus a per-row offset correction
    win = np.lib.stride_tricks.sliding_window_view(padded, size)
    sel = idx - half  # window start for each element in padded coords
    mat = win[sel]  # (n_elements, size) — copies on fancy index
    res = reduce_segments(
        mat.ravel(),
        np.full(len(flat), size, dtype=np.int64),
        [method],
    )[method]
    offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
    arr = pa.ListArray.from_arrays(
        offsets, pa.array(res, type=pa.float64(), mask=np.isnan(res))
    )
    return batch.append_column(out_col or f"{method}_{size}", arr)


def neighbors(ds, size: int = 3, method: str = "average", *, batch_size: int | None = None, **kw):
    if batch_size is None:
        batch_size = max(16, 4096 // max(1, size))
    return ds.map_batches(
        lambda b: neighbors_batch(b, size, method, **kw),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
