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
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
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
            key_vals = [batch.column(k).to_pylist() for k in keys]
            b = np.array(
                [
                    zlib.crc32("|".join(str(v) for v in row).encode()) % buckets
                    for row in zip(*key_vals)
                ],
                dtype=np.int32,
            )
            cols["_bucket"] = pa.array(b)
            cols["_side"] = pa.array([side] * n)
            return pa.table(cols)

        return kernel

    # left reads its own names; right reads src names for renamed payload
    right_rename = {dst: src for src, dst in zip(rpay_src, rpay)}
    left = ds_left.map_batches(pad("l", {}), batch_format="pyarrow")
    right = ds_right.map_batches(pad("r", right_rename), batch_format="pyarrow")
    both = left.union(right)

    wire_types = dict(wire)

    def per_bucket(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        l = df[df["_side"] == "l"][keys + lpay]
        r = df[df["_side"] == "r"][keys + rpay]
        merged = l.merge(r, on=keys, how=how)
        tbl = pa.Table.from_pandas(merged, preserve_index=False)
        # the null padding upcast ints to float64 through pandas; restore
        # the wire types where the join produced no nulls
        for name in tbl.column_names:
            typ = wire_types.get(name)
            if (
                typ is None
                or not isinstance(typ, pa.DataType)
                or tbl.schema.field(name).type == typ
            ):
                continue
            col = tbl.column(name)
            if pa.types.is_integer(typ) and col.null_count > 0:
                continue  # outer-join nulls: stay float64
            tbl = tbl.set_column(
                tbl.column_names.index(name), name, col.cast(typ)
            )
        return tbl

    return both.groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow")
