"""Partitioned hash join for two large datasets.

The broadcast pattern covers dimension-sized sides (`ray.put` + lookup
in ``map_batches``); when BOTH sides are large the portable plan is the
explicit bucketed join: rename the right side's payload (suffix), pad
both sides to the shared wire schema with typed nulls, tag + union,
``groupby(bucket = hash(key) % B)``, and merge pairwise inside
``map_groups``.  Skewed keys are absorbed by raising B (contract:
B ≥ cluster cores × 4 so no bucket dominates).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def _as_arrow_type(t) -> pa.DataType:
    """Normalize a Ray schema type (Arrow, numpy dtype, or Python class
    for pandas-backed datasets) to an Arrow DataType so the fixed wire
    schema can be declared up front."""
    if isinstance(t, pa.DataType):
        return t
    try:
        if np.dtype(t) == np.dtype("O"):
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))
    except Exception:
        return pa.string()


def _bucket_ids(batch: pa.Table, keys, buckets: int) -> np.ndarray:
    """Deterministic bucket per row: vectorized Knuth-multiplicative hash
    for a single integer key (the common case); crc32 of the joined
    string otherwise."""
    if len(keys) == 1 and pa.types.is_integer(batch.schema.field(keys[0]).type):
        k = (
            batch.column(keys[0])
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        with np.errstate(over="ignore"):
            h = k * np.uint64(0x9E3779B97F4A7C15)
        return (h % np.uint64(buckets)).astype(np.int32)
    cols = [batch.column(k).to_pylist() for k in keys]
    return np.array(
        [
            zlib.crc32("|".join(str(v) for v in row).encode()) % buckets
            for row in zip(*cols)
        ],
        dtype=np.int32,
    )


def bucket_join(
    ds_left,
    ds_right,
    *,
    key_cols,
    buckets: int = 64,
    how: str = "inner",
    suffix: str = "_r",
):
    """Join two large Datasets on `key_cols` via explicit hash buckets.

    Right-side payload columns that collide with left names come back
    with `suffix` appended.
    """
    keys = list(key_cols)
    lschema, rschema = ds_left.schema(), ds_right.schema()
    ltypes = {n: _as_arrow_type(t) for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: _as_arrow_type(t) for n, t in zip(rschema.names, rschema.types)}
    lpay = [c for c in lschema.names if c not in keys]
    rpay_src = [c for c in rschema.names if c not in keys]
    rpay = [c + suffix if c in ltypes else c for c in rpay_src]
    wire = (
        [(k, ltypes[k]) for k in keys]
        + [(c, ltypes[c]) for c in lpay]
        + [(dst, rtypes[src]) for src, dst in zip(rpay_src, rpay)]
    )

    def pad(side: str, rename: dict):
        def kernel(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for name, typ in wire:
                src = rename.get(name, name)
                if src in batch.column_names:
                    cols[name] = batch.column(src)
                else:
                    cols[name] = pa.nulls(n, type=typ)
            cols["_bucket"] = pa.array(_bucket_ids(batch, keys, buckets))
            cols["_side"] = pa.array([side] * n)
            return pa.table(cols)

        return kernel

    # left reads its own names; right reads src names for renamed payload
    right_rename = {dst: src for src, dst in zip(rpay_src, rpay)}
    left = ds_left.map_batches(pad("l", {}), batch_format="pyarrow")
    right = ds_right.map_batches(pad("r", right_rename), batch_format="pyarrow")
    both = left.union(right)

    # fixed, bucket-independent output schema: every bucket casts to it,
    # so a bucket that happens to produce join nulls in an int column
    # cannot emit a different dtype than its siblings (Arrow ints carry
    # validity, so nullable ints stay ints — pandas' float64 upcast is
    # undone on the way out)
    out_schema = pa.schema(wire)

    def per_bucket(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        l = df[df["_side"] == "l"][keys + lpay]
        r = df[df["_side"] == "r"][keys + rpay]
        merged = l.merge(r, on=keys, how=how)
        tbl = pa.Table.from_pandas(merged, preserve_index=False)
        cols = []
        for name, typ in wire:
            col = tbl.column(name)
            if col.type != typ:
                col = col.cast(typ)
            cols.append(col)
        return pa.Table.from_arrays(cols, schema=out_schema)

    return both.groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")


def asof_join(
    ds_left,
    ds_right,
    *,
    key_cols,
    ts_col: str = "ts",
    buckets: int = 64,
    suffix: str = "_r",
    direction: str = "backward",
):
    """As-of join: each left row matches the latest right row with
    ``right.ts <= left.ts`` for the same key (direction="backward";
    "forward" takes the earliest later row).

    Plan: the same union-of-padded-sides + ``groupby(hash(key) % B)``
    exchange as :func:`bucket_join`, with ``pd.merge_asof`` per bucket
    (both sides sorted in-group).  Fully distributed — no side is
    collected on the driver.  Partitioning assumption: a key's rows land
    in one bucket (guaranteed by the key hash).
    """
    import pandas as pd

    keys = list(key_cols)
    lschema, rschema = ds_left.schema(), ds_right.schema()
    ltypes = {n: _as_arrow_type(t) for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: _as_arrow_type(t) for n, t in zip(rschema.names, rschema.types)}
    lnames = set(lschema.names)
    rpay_src = [c for c in rschema.names if c not in keys and c != ts_col]
    rename = {c: (c + suffix if c in lnames else c) for c in rpay_src}
    lpay = [c for c in lschema.names if c not in keys and c != ts_col]
    rpay = [rename[c] for c in rpay_src]
    wire = (
        [(k, ltypes[k]) for k in keys]
        + [(ts_col, ltypes[ts_col])]
        + [(c, ltypes[c]) for c in lpay]
        + [(rename[c], rtypes[c]) for c in rpay_src]
    )

    def pad(side: str, colmap: dict):
        def kernel(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for name, typ in wire:
                src = colmap.get(name, name)
                ok = (side == "l" and name in ltypes) or (
                    side == "r" and (name in rpay or name in keys or name == ts_col)
                )
                if ok and src in batch.column_names:
                    cols[name] = batch.column(src)
                else:
                    cols[name] = pa.nulls(n, type=typ)
            cols["_bucket"] = pa.array(_bucket_ids(batch, keys, buckets))
            cols["_side"] = pa.array([side] * n)
            return pa.table(cols)

        return kernel

    right_map = {dst: src for src, dst in rename.items()}
    left = ds_left.map_batches(pad("l", {}), batch_format="pyarrow")
    right = ds_right.map_batches(pad("r", right_map), batch_format="pyarrow")
    both = left.union(right)

    def per_bucket(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        l = (
            df[df["_side"] == "l"][keys + [ts_col] + lpay]
            .sort_values(ts_col)
            .reset_index(drop=True)
        )
        r = (
            df[df["_side"] == "r"][keys + [ts_col] + rpay]
            .sort_values(ts_col)
            .reset_index(drop=True)
        )
        if len(r) == 0:
            out = l.copy()
            for c in rpay:
                out[c] = None
            out[ts_col + suffix] = pd.NaT
            return pa.Table.from_pandas(out, preserve_index=False)
        r = r.copy()
        r[ts_col + suffix] = r[ts_col]
        merged = pd.merge_asof(
            l, r, on=ts_col, by=keys, direction=direction, suffixes=("", suffix)
        )
        return pa.Table.from_pandas(merged, preserve_index=False)

    return both.groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")


def interval_join(
    ds_left,
    ds_right,
    *,
    key_cols=(),
    start_col: str = "start",
    end_col: str = "end",
    bucket_span: int = 1024,
    suffix: str = "_r",
):
    """Range join: pairs of (left, right) intervals that overlap
    (half-open ``[start, end)``), optionally also matching on key_cols —
    the distributed form of the reference's R-tree interval topology
    join (``spatio_temporal_relationships.py:496-516``).

    Plan: each interval replicates to every coarse bucket of width
    ``bucket_span`` it touches; a bucket-local cross check keeps actual
    overlaps; pairs spanning several buckets are deduplicated by
    attributing each pair to the bucket containing
    ``max(start_l, start_r)``.  Partitioning assumption: interval
    lengths ≪ total span (replication factor ≈ len/bucket_span + 1);
    pick ``bucket_span`` ≥ the typical interval length.
    """
    keys = list(key_cols)

    def expand(side: str):
        def kernel(batch: pa.Table) -> pa.Table:
            s = batch.column(start_col).to_numpy(zero_copy_only=False).astype(np.int64)
            e = batch.column(end_col).to_numpy(zero_copy_only=False).astype(np.int64)
            b0 = np.floor_divide(s, bucket_span)
            b1 = np.floor_divide(np.maximum(e - 1, s), bucket_span)
            counts = (b1 - b0 + 1).astype(np.int64)
            total = int(counts.sum())
            src = np.repeat(np.arange(len(s), dtype=np.int64), counts)
            cstarts = np.zeros(len(s), dtype=np.int64)
            np.cumsum(counts[:-1], out=cstarts[1:])
            off = np.arange(total, dtype=np.int64) - np.repeat(cstarts, counts)
            bucket = b0[src] + off
            take = pa.array(src)
            cols = {c: batch.column(c).take(take) for c in batch.column_names}
            cols["_bucket"] = pa.array(bucket)
            cols["_side"] = pa.array([side] * total)
            return pa.table(cols)

        return kernel

    lschema, rschema = ds_left.schema(), ds_right.schema()
    lnames = set(lschema.names)
    rename = {
        c: (c + suffix if c in lnames else c)
        for c in rschema.names
        if c not in keys
    }
    # align schemas for the union: left keeps names; right renames
    # non-key columns then both pad to the combined set
    lcols = list(lschema.names)
    rcols = [rename.get(c, c) for c in rschema.names]
    all_cols = keys + [c for c in lcols if c not in keys] + [
        c for c in rcols if c not in keys and c not in lcols
    ]
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = {rename.get(n, n): t for n, t in zip(rschema.names, rschema.types)}

    def pad(side: str):
        def kernel(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for c in all_cols:
                src = c
                if side == "r":
                    inv = {v: k for k, v in rename.items()}
                    src = inv.get(c, c)
                if src in batch.column_names and (
                    side == "l" and c in ltypes or side == "r" and c in rtypes or c in keys
                ):
                    cols[c] = batch.column(src)
                else:
                    typ = ltypes.get(c) or rtypes.get(c)
                    cols[c] = pa.nulls(n, type=typ)
            cols["_bucket"] = batch.column("_bucket")
            cols["_side"] = batch.column("_side")
            return pa.table(cols)

        return kernel

    left = ds_left.map_batches(expand("l"), batch_format="pyarrow").map_batches(
        pad("l"), batch_format="pyarrow"
    )
    right = ds_right.map_batches(expand("r"), batch_format="pyarrow").map_batches(
        pad("r"), batch_format="pyarrow"
    )
    both = left.union(right)
    rstart = rename.get(start_col, start_col)
    rend = rename.get(end_col, end_col)

    def per_bucket(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        bucket = int(df["_bucket"].iloc[0])
        l = df[df["_side"] == "l"]
        r = df[df["_side"] == "r"]
        lkeep = keys + [c for c in lcols if c not in keys]
        rkeep = keys + [c for c in rcols if c not in keys]
        l = l[lkeep]
        r = r[rkeep]
        if keys:
            merged = l.merge(r, on=keys, how="inner")
        else:
            merged = l.assign(_x=1).merge(r.assign(_x=1), on="_x").drop(columns=["_x"])
        if len(merged) == 0:
            return pa.Table.from_pandas(merged, preserve_index=False)
        ov = (merged[start_col] < merged[rend]) & (merged[rstart] < merged[end_col])
        anchor = np.maximum(merged[start_col].to_numpy(), merged[rstart].to_numpy())
        own = np.floor_divide(anchor, bucket_span) == bucket
        return pa.Table.from_pandas(
            merged[ov & own].reset_index(drop=True), preserve_index=False
        )

    return both.groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")
