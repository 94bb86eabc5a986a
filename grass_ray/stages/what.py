"""Point sampling across the series — the ``t.rast.what`` analog.

``temporal/t.rast.what/t.rast.what.py`` samples raster values at point
coordinates across every registered map (parallel ``r.what``).  Here a
"coordinate" is a token position: given query positions, return each
key's token value at those positions.  The query set is small and
broadcast once (``ray.put``), read inside the stage — no shuffle
(SURVEY §2.7 row `t.rast.what`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def what(ds, positions, *, doc_ids=None, key_cols=("source", "doc_id"), tokens_col="tokens"):
    """Sample token values at `positions` for every (or selected) doc.

    Output: one row per (key, position): (key..., pos, token) —
    the "row" layout of t.rast.what.
    """
    import ray

    pos_arr = np.asarray(sorted(positions), dtype=np.int64)
    ref = ray.put(
        {
            "positions": pos_arr,
            "doc_ids": set(doc_ids) if doc_ids is not None else None,
        }
    )

    def kernel(batch: pa.Table) -> pa.Table:
        q = ray.get(ref)
        pos = q["positions"]
        want = q["doc_ids"]
        col = batch.column(tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if want is not None:
            keep = pa.array(
                [d in want for d in batch.column("doc_id").to_pylist()]
            )
            batch = batch.filter(keep)
            col = batch.column(tokens_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
        n = batch.num_rows
        if n == 0:
            empty = {k: pa.array([], type=batch.schema.field(k).type) for k in key_cols}
            empty["pos"] = pa.array([], type=pa.int64())
            empty["token"] = pa.array([], type=pa.float64())
            return pa.table(empty)
        lens = np.asarray(col.value_lengths().to_numpy(zero_copy_only=False)).astype(np.int64)
        flat = col.flatten().cast(pa.float64()).to_numpy(zero_copy_only=False)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        # cross product rows x positions, masked to in-range
        row_rep = np.repeat(np.arange(n, dtype=np.int64), len(pos))
        pos_rep = np.tile(pos, n)
        in_range = pos_rep < lens[row_rep]
        row_rep, pos_rep = row_rep[in_range], pos_rep[in_range]
        vals = flat[starts[row_rep] + pos_rep]
        take = pa.array(row_rep)
        cols = {k: batch.column(k).take(take) for k in key_cols}
        cols["pos"] = pa.array(pos_rep)
        cols["token"] = pa.array(vals, type=pa.float64(), mask=np.isnan(vals))
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow", batch_size=512)


def what_timerow(ds, positions, *, doc_ids=None, key_cols=("source", "doc_id"), tokens_col="tokens"):
    """`t.rast.what` timerow layout: one row per key with the sampled
    values as a list aligned with `positions` (out-of-range -> NULL)."""
    import ray

    pos_arr = np.asarray(sorted(positions), dtype=np.int64)
    ref = ray.put(
        {"positions": pos_arr, "doc_ids": set(doc_ids) if doc_ids is not None else None}
    )

    def kernel(batch: pa.Table) -> pa.Table:
        q = ray.get(ref)
        pos = q["positions"]
        want = q["doc_ids"]
        if want is not None:
            keep = pa.array([d in want for d in batch.column("doc_id").to_pylist()])
            batch = batch.filter(keep)
        col = batch.column(tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = batch.num_rows
        lens = np.asarray(col.value_lengths().to_numpy(zero_copy_only=False)).astype(np.int64)
        flat = col.flatten().cast(pa.float64()).to_numpy(zero_copy_only=False)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        k = len(pos)
        vals = np.full(n * k, np.nan)
        row_rep = np.repeat(np.arange(n, dtype=np.int64), k)
        pos_rep = np.tile(pos, n)
        ok = pos_rep < lens[row_rep]
        vals[ok] = flat[starts[row_rep[ok]] + pos_rep[ok]]
        offsets = pa.array((np.arange(n + 1) * k).astype(np.int32))
        cols = {c: batch.column(c) for c in key_cols}
        cols["values"] = pa.ListArray.from_arrays(
            offsets, pa.array(vals, type=pa.float64(), mask=np.isnan(vals))
        )
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow", batch_size=512)


def what_col(
    ds,
    positions,
    *,
    doc_ids=None,
    key_cols=("source", "doc_id"),
    tokens_col="tokens",
    max_keys: int = 100_000,
):
    """`t.rast.what` "col" layout — one row per TIME STEP carrying every
    sampled point's value (``start,end,point_1,..,point_n``;
    ``temporal/t.rast.what/t.rast.what.py:434-505``): here one row per
    sampled position with the per-key samples as parallel
    ``keys``/``values`` lists in ascending key order.

    The transpose gathers every sampled key into one row per position
    (the reference's points are a small vector set), so the key set
    must stay bounded — restrict with ``doc_ids`` or rely on the
    ``max_keys`` guard, which raises loudly instead of building an
    unbounded row.  Distributed shape: the row-layout sample (no
    shuffle) then ONE exchange grouped on the few positions."""
    rows = what(
        ds,
        positions,
        doc_ids=doc_ids,
        key_cols=key_cols,
        tokens_col=tokens_col,
    )
    keys = list(key_cols)

    def transpose(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.take(
            pc.sort_indices(
                batch, sort_keys=[(k, "ascending") for k in keys]
            )
        )
        if t.num_rows > max_keys:
            raise ValueError(
                f"position {t.column('pos')[0].as_py()} samples "
                f"{t.num_rows} keys, past max_keys={max_keys}; restrict "
                "doc_ids or raise max_keys explicitly"
            )
        parts = [pc.cast(t.column(k), pa.string()) for k in keys]
        kjoin = (
            parts[0]
            if len(parts) == 1
            else pc.binary_join_element_wise(*parts, "|")
        )
        if isinstance(kjoin, pa.ChunkedArray):
            kjoin = kjoin.combine_chunks()
        vals = (
            pc.cast(t.column("token"), pa.float64())
            .to_numpy(zero_copy_only=False)
            .tolist()
        )
        return pa.table(
            {
                "pos": pa.array(
                    [int(t.column("pos")[0].as_py())], type=pa.int64()
                ),
                "n_points": pa.array([t.num_rows], type=pa.int64()),
                "keys": pa.array(
                    [kjoin.to_pylist()], type=pa.list_(pa.string())
                ),
                "values": pa.array([vals], type=pa.list_(pa.float64())),
            }
        )

    return rows.groupby("pos").map_groups(transpose, batch_format="pyarrow")
