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
    broadcast_threshold: int = 500_000,
):
    """Join two Datasets on `key_cols`.

    Two regimes, chosen by the measured right-side row count (standard
    size-based join planning):

    * **broadcast** (inner/left joins with ≤ ``broadcast_threshold``
      right rows): the right table ships once via ``ray.put`` and the
      join is a zero-shuffle map-side merge per left batch;
    * **exchange** (larger right sides, or right/outer joins): both
      sides move through explicit hash buckets
      (``groupby(hash(key) % B)`` + per-bucket merge).

    Right-side payload columns that collide with left names come back
    with `suffix` appended.  The output schema is fixed and
    bucket-independent in both regimes.
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

    # fixed, bucket-independent output schema (see per-regime casts)
    out_schema_fields = wire

    if how in ("inner", "left"):
        right_mat = ds_right.materialize()
        if right_mat.count() <= broadcast_threshold:
            return _broadcast_join(
                right_mat, ds_left, keys, lpay, rpay_src, rpay, how,
                out_schema_fields,
            )
        ds_right = right_mat

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


def _broadcast_join(right_mat, ds_left, keys, lpay, rpay_src, rpay, how, wire):
    """Map-side regime of :func:`bucket_join`: the (small) right table
    ships once via ``ray.put``; each left batch merges locally — no
    shuffle of either side."""
    import ray

    rt = pa.Table.from_pandas(right_mat.to_pandas(), preserve_index=False)
    cols = {}
    for k in keys:
        cols[k] = rt.column(k) if k in rt.column_names else pa.nulls(rt.num_rows)
    for src, dst in zip(rpay_src, rpay):
        cols[dst] = rt.column(src)
    rdf = pa.table(cols).to_pandas() if rt.num_rows else None
    import pandas as pd

    if rdf is None:
        rdf = pd.DataFrame({name: pd.Series(dtype=object) for name in keys + rpay})
    ref = ray.put(rdf)
    out_schema = pa.schema(wire)

    def kernel(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[keys + lpay]
        merged = df.merge(ray.get(ref), on=keys, how=how)
        tbl = pa.Table.from_pandas(merged, preserve_index=False)
        out = []
        for name, typ in wire:
            col = tbl.column(name)
            if col.type != typ:
                col = col.cast(typ)
            out.append(col)
        return pa.Table.from_arrays(out, schema=out_schema)

    return ds_left.map_batches(kernel, batch_format="pyarrow")


def distinct_keys(ds, key_cols):
    """Distributed DISTINCT over key columns: a pre-combined Count
    aggregate (partials per block, one row per key on the wire) — never
    a per-group Python dispatch or a driver-side drop_duplicates."""
    from ray.data.aggregate import Count

    keys = list(key_cols)
    out = ds.groupby(keys).aggregate(Count(alias_name="_n"))
    return out.drop_columns(["_n"])


def semi_join(
    ds,
    keys_ds,
    *,
    key_cols,
    buckets: int = 64,
    anti: bool = False,
    broadcast_threshold: int = 2_000_000,
    keys_distinct: bool = False,
):
    """Distributed semi-join (anti=True -> anti-join): keep rows of `ds`
    whose key (does not) appear in `keys_ds`.  The keys side is made
    distinct first, so duplicate keys never fan out rows.

    Two regimes, chosen by the measured distinct-key count (the standard
    size-based join strategy):

    * **broadcast** (≤ ``broadcast_threshold`` keys): the key set ships
      once via ``ray.put`` and a single zero-shuffle ``map_batches``
      filter runs over `ds` — no exchange of the big side at all;
    * **exchange** (larger): both sides move through the bucket
      machinery — the drop set that grows with the corpus never lands
      on the driver.
    """
    import pyarrow.compute as pc

    keys = list(key_cols)
    if keys_ds.schema() is None or keys_ds.count() == 0:
        # empty keys side: semi-join keeps nothing, anti-join everything
        return ds if anti else ds.limit(0)
    # keys_distinct=True skips the dedup exchange — callers whose keys
    # side is already one row per key (an aggregate output) must not pay
    # a second groupby, nor a lazy re-execution of their pipeline
    distinct = (
        keys_ds.select_columns(keys)
        if keys_distinct
        else distinct_keys(keys_ds.select_columns(keys), keys)
    ).materialize()
    if distinct.count() <= broadcast_threshold:
        return _semi_join_broadcast(ds, distinct, keys, anti)
    marked = distinct.map_batches(
        lambda b: b.append_column("_kj", pa.array(np.ones(b.num_rows, dtype=np.int8))),
        batch_format="pyarrow",
    )
    j = bucket_join(ds, marked, key_cols=keys, buckets=buckets, how="left")

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.is_valid(batch.column("_kj"))
        if anti:
            m = pc.invert(m)
        return batch.filter(m).drop_columns(["_kj"])

    return j.map_batches(keep, batch_format="pyarrow")


def _semi_join_broadcast(ds, distinct, keys, anti):
    import ray

    single = len(keys) == 1
    single_int = single and pa.types.is_integer(
        distinct.schema().base_schema.field(keys[0]).type
    )
    if single_int:
        vals = []
        for b in distinct.iter_batches(batch_format="pyarrow"):
            vals.append(
                b.column(keys[0]).cast(pa.int64()).to_numpy(zero_copy_only=False)
            )
        side = np.sort(np.concatenate(vals)) if vals else np.empty(0, np.int64)
    else:
        side = set()
        for b in distinct.iter_batches(batch_format="pyarrow"):
            if single:
                side.update(b.column(keys[0]).to_pylist())
            else:
                side.update(zip(*(b.column(k).to_pylist() for k in keys)))
    ref = ray.put(side)

    def keep(batch: pa.Table, _anti=anti) -> pa.Table:
        s = ray.get(ref)
        if single_int:
            k = batch.column(keys[0]).cast(pa.int64()).to_numpy(zero_copy_only=False)
            mask = np.isin(k, s)
        elif single:
            mask = np.fromiter(
                (v in s for v in batch.column(keys[0]).to_pylist()),
                dtype=bool,
                count=batch.num_rows,
            )
        else:
            rows = zip(*(batch.column(k).to_pylist() for k in keys))
            mask = np.fromiter(
                (r in s for r in rows), dtype=bool, count=batch.num_rows
            )
        if _anti:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def anti_join(ds, keys_ds, *, key_cols, buckets: int = 64, keys_distinct: bool = False):
    return semi_join(
        ds,
        keys_ds,
        key_cols=key_cols,
        buckets=buckets,
        anti=True,
        keys_distinct=keys_distinct,
    )


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
    # fixed, bucket-independent output schema (pandas upcasts nullable
    # ints to float64 — cast every bucket back, same as bucket_join)
    ltypes_a = {n: _as_arrow_type(t) for n, t in ltypes.items()}
    rtypes_a = {n: _as_arrow_type(t) for n, t in rtypes.items()}
    out_fields = [(c, ltypes_a.get(c) or rtypes_a.get(c)) for c in all_cols]
    out_schema = pa.schema(out_fields)

    def per_bucket(batch: pa.Table) -> pa.Table:
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
        if len(merged):
            ov = (merged[start_col] < merged[rend]) & (merged[rstart] < merged[end_col])
            anchor = np.maximum(merged[start_col].to_numpy(), merged[rstart].to_numpy())
            own = np.floor_divide(anchor, bucket_span) == bucket
            merged = merged[ov & own].reset_index(drop=True)
        tbl = pa.Table.from_pandas(merged, preserve_index=False)
        cols = []
        for name, typ in out_fields:
            col = tbl.column(name)
            if col.type != typ:
                col = col.cast(typ)
            cols.append(col)
        return pa.Table.from_arrays(cols, schema=out_schema)

    return both.groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")
