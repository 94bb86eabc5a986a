"""Position interpolation — the ``r.series.interp`` analog.

``raster/r.series.interp/main.c``: data maps at positions, output maps
at sampling positions, both sorted; each output inside an interval
``[left.pos, right.pos]`` gets
``v = (1 - (pos-left)/dist)*u1 + ((pos-left)/dist)*u2``
(``main.c:412-445``); either side NULL -> NULL (``:435-441``); outputs
outside any input interval are skipped (``:330-335``).  Only linear is
implemented, as in the reference (``main.c:118-126``).

Row-local over nested tiers: data positions are a key's windows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def interp_positions_batch(
    batch: pa.Table,
    positions,
    value_col: str = "average",
    key_cols=("source", "doc_id"),
) -> pa.Table:
    """Sample `positions` (sorted floats) per key by linear interpolation
    between the two neighboring data windows.  Output: one row per
    (key, in-range position): (key..., pos, value)."""
    pos = np.asarray(sorted(positions), dtype=np.float64)
    windows = batch.column("windows")
    if isinstance(windows, pa.ChunkedArray):
        windows = windows.combine_chunks()
    vals_col = batch.column(value_col)
    if isinstance(vals_col, pa.ChunkedArray):
        vals_col = vals_col.combine_chunks()
    lens = np.asarray(windows.value_lengths().to_numpy(zero_copy_only=False)).astype(np.int64)
    w = windows.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    v = vals_col.flatten().cast(pa.float64()).to_numpy(zero_copy_only=False)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])

    out_row, out_pos, out_val = [], [], []
    for i in range(batch.num_rows):
        s, n = starts[i], lens[i]
        if n < 1:
            continue
        ws = w[s : s + n]
        vs = v[s : s + n]
        # in-range positions only (outside any interval -> skipped)
        lo, hi = ws[0], ws[-1]
        sel = (pos >= lo) & (pos <= hi)
        ps = pos[sel]
        if len(ps) == 0:
            continue
        right = np.searchsorted(ws, ps, side="left")
        right = np.clip(right, 0, n - 1)
        left = np.where(ws[right] == ps, right, right - 1)
        left = np.clip(left, 0, n - 1)
        u1, u2 = vs[left], vs[right]
        dist = ws[right] - ws[left]
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = np.where(dist > 0, (ps - ws[left]) / dist, 0.0)
        res = (1.0 - frac) * u1 + frac * u2
        out_row.extend([i] * len(ps))
        out_pos.extend(ps.tolist())
        out_val.extend(res.tolist())

    take = pa.array(np.array(out_row, dtype=np.int64))
    cols = {k: batch.column(k).take(take) for k in key_cols}
    cols["pos"] = pa.array(out_pos, type=pa.float64())
    arr = np.array(out_val, dtype=np.float64)
    cols["value"] = pa.array(arr, type=pa.float64(), mask=np.isnan(arr))
    return pa.table(cols)


def interp_positions(ds, positions, value_col: str = "average", **kw):
    return ds.map_batches(
        lambda b: interp_positions_batch(b, positions, value_col, **kw),
        batch_format="pyarrow",
        batch_size=256,
    )
