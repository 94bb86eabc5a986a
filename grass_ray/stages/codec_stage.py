"""Tier ↔ compressed-tier stages (actor-pool map_batches).

Rolled-up nested tiers (one row per key, parallel list columns) are
bit-packed per key before the Parquet sink: window ids via
delta-of-delta, each value column via Gorilla XOR
(:mod:`grass_ray.functions.codec`).  The engine analog of the
reference's per-row raster compression (``lib/gis/compress.h:4-12``).

These stages are callable classes for ``map_batches(Cls, concurrency=N)``
— the actor-pool pattern (setup once per actor; per-partition metrics
accumulate in the actor, mirroring the reference's RPC-server isolation
of stateful resources, ``python/grass/temporal/c_libraries_interface.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from grass_ray.functions.codec import (
    decode_floats,
    decode_windows,
    encode_floats,
    encode_windows,
)


class EncodeTier:
    """nested tier -> (keys..., gran, n_points, windows_enc, <col>_enc)."""

    def __init__(self, value_cols=("count", "sum", "minimum", "maximum", "average")):
        self.value_cols = tuple(value_cols)
        self.rows_encoded = 0  # per-actor metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        windows = batch.column("windows")
        if isinstance(windows, pa.ChunkedArray):
            windows = windows.combine_chunks()
        offs = windows.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        w_flat = windows.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        flats = {}
        for vc in self.value_cols:
            col = batch.column(vc)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flats[vc] = col.flatten().cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
        n = batch.num_rows
        lens = np.diff(offs)
        npoints = lens.astype(np.int64)
        from grass_ray.functions.codec import (
            encode_floats_columns,
            encode_windows_column,
        )

        w_enc = encode_windows_column(w_flat, lens)
        # NOTE: fusing all value columns into ONE encoder call (concat +
        # np.tile lengths) was measured SLOWER (20ms vs 12ms per batch):
        # the 5x working set falls out of cache and loses more than the
        # per-call fixed costs save.  Keep per-column calls.
        v_enc = {
            vc: encode_floats_columns(flats[vc], lens)
            for vc in self.value_cols
        }
        self.rows_encoded += n
        cols = {}
        for k in batch.column_names:
            if not isinstance(batch.column(k).type, pa.ListType):
                cols[k] = batch.column(k)
        cols["n_points"] = pa.array(npoints)
        cols["windows_enc"] = w_enc
        for vc in self.value_cols:
            cols[f"{vc}_enc"] = v_enc[vc]
        return pa.table(cols)


class DecodeTier:
    """Inverse of :class:`EncodeTier`: encoded tier -> nested tier."""

    def __init__(self, value_cols=("count", "sum", "minimum", "maximum", "average")):
        self.value_cols = tuple(value_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w_col = batch.column("windows_enc").to_pylist()
        w_lists = [decode_windows(b) for b in w_col]
        lens = np.array([len(w) for w in w_lists], dtype=np.int64)
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        )
        cols = {}
        for k in batch.column_names:
            if k == "n_points" or k.endswith("_enc"):
                continue
            cols[k] = batch.column(k)
        flat_w = (
            np.concatenate(w_lists) if n else np.empty(0, dtype=np.int64)
        )
        cols["windows"] = pa.ListArray.from_arrays(
            offsets, pa.array(flat_w, type=pa.int64())
        )
        for vc in self.value_cols:
            blobs = batch.column(f"{vc}_enc").to_pylist()
            # a null blob means this row never carried the column (e.g.
            # cross-tier concat padding): decode to all-NULL values
            vals = (
                np.concatenate(
                    [
                        decode_floats(b)
                        if b is not None
                        else np.full(l, np.nan)
                        for b, l in zip(blobs, lens)
                    ]
                )
                if n
                else np.empty(0)
            )
            mask = np.isnan(vals)
            if vc == "count":
                arr = pa.array(
                    np.where(mask, 0, vals).astype(np.int64), mask=mask
                )
            else:
                arr = pa.array(vals, type=pa.float64(), mask=mask)
            cols[vc] = pa.ListArray.from_arrays(offsets, arr)
        return pa.table(cols)


def encode_tier(ds, value_cols=("count", "sum", "minimum", "maximum", "average"), concurrency=None):
    return ds.map_batches(
        EncodeTier,
        fn_constructor_kwargs={"value_cols": value_cols},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency or (1, 4),
    )


def decode_tier(ds, value_cols=("count", "sum", "minimum", "maximum", "average"), concurrency=None):
    return ds.map_batches(
        DecodeTier,
        fn_constructor_kwargs={"value_cols": value_cols},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency or (1, 4),
    )


_DECODERS: dict = {}


def decode_tier_kernel(batch, value_cols):
    """Task-pool kernel: per-worker memoized DecodeTier (same
    actor-style amortization as the text/minhash/tokenizer kernels,
    without actor-pool spin-up latency)."""
    d = _DECODERS.get(value_cols)
    if d is None:
        d = _DECODERS.setdefault(value_cols, DecodeTier(value_cols))
    return d(batch)
