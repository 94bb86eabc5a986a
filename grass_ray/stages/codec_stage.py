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


#: columns whose stored form is an exact elementwise formula of other
#: stored columns (the engine computes them with EXACTLY these formulas
#: in both the rollup reducers and the cascade recombiner, so deriving
#: at decode time is bit-identical — IEEE-754 ops are deterministic,
#: and the NaN-as-NULL convention propagates: empty windows give
#: NaN/NaN = NaN and NaN-NaN = NaN):
#:   average = sum / count   (reducers._m_average, cascade extra)
#:   range   = maximum - minimum
_DERIVABLE = {
    "average": ("sum", "count"),
    "range": ("maximum", "minimum"),
}


class EncodeTier:
    """nested tier -> (keys..., gran, n_points, windows_enc, <col>_enc).

    ``derive=True`` (default) skips the bitstream for columns in
    :data:`_DERIVABLE` whose source columns are also being encoded —
    ~1/5 less float-encode work and smaller files for the standard
    five-method tier; :class:`DecodeTier` recomputes them bit-exactly.
    The parquet schema self-describes the choice (no ``<col>_enc``
    column), so readers need no flag.  Pass ``derive=False`` for tiers
    whose ``average`` is NOT sum/count (e.g. externally produced
    weighted tiers re-encoded verbatim).
    """

    def __init__(self, value_cols=("count", "sum", "minimum", "maximum", "average"), derive: bool = True):
        self.value_cols = tuple(value_cols)
        if derive:
            self.enc_cols = tuple(
                c
                for c in self.value_cols
                if c not in _DERIVABLE
                or not set(_DERIVABLE[c]) <= set(self.value_cols)
            )
        else:
            self.enc_cols = self.value_cols
        self.rows_encoded = 0  # per-actor metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        windows = batch.column("windows")
        if isinstance(windows, pa.ChunkedArray):
            windows = windows.combine_chunks()
        offs = windows.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        w_flat = windows.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        flats = {}
        for vc in self.enc_cols:
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
            for vc in self.enc_cols
        }
        self.rows_encoded += n
        cols = {}
        for k in batch.column_names:
            if not isinstance(batch.column(k).type, pa.ListType):
                cols[k] = batch.column(k)
        cols["n_points"] = pa.array(npoints)
        cols["windows_enc"] = w_enc
        for vc in self.enc_cols:
            cols[f"{vc}_enc"] = v_enc[vc]
        return pa.table(cols)


class DecodeTier:
    """Inverse of :class:`EncodeTier`: encoded tier -> nested tier."""

    def __init__(self, value_cols=("count", "sum", "minimum", "maximum", "average")):
        self.value_cols = tuple(value_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from grass_ray.functions.codec import (
            decode_floats_batched,
            decode_windows_batched,
        )

        n = batch.num_rows
        w_col = batch.column("windows_enc").to_pylist()
        flat_w, lens = (
            decode_windows_batched(w_col)
            if n
            else (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        )
        total = int(lens.sum())
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        )
        cols = {}
        for k in batch.column_names:
            if k == "n_points" or k.endswith("_enc"):
                continue
            cols[k] = batch.column(k)
        cols["windows"] = pa.ListArray.from_arrays(
            offsets, pa.array(flat_w, type=pa.int64())
        )
        # element-level scatter mask for rows whose blob is NULL
        # (cross-tier concat padding): those rows decode to all-NULL
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        present = set(batch.column_names)
        # decode order: stored columns first (derivation sources), then
        # columns derived from them (schema-driven: a missing
        # ``<col>_enc`` means EncodeTier chose derivation)
        stored = [c for c in self.value_cols if f"{c}_enc" in present]
        derived = [c for c in self.value_cols if f"{c}_enc" not in present]
        # derivation sources are decoded even when not themselves
        # requested (e.g. DecodeTier(("average",)) over a derived tier)
        for vc in derived:
            for src in _DERIVABLE.get(vc, ()):
                if src not in stored and f"{src}_enc" in present:
                    stored.append(src)
        flats: dict[str, np.ndarray] = {}
        for vc in stored:
            blobs = batch.column(f"{vc}_enc").to_pylist()
            # a null blob means this row never carried the column (e.g.
            # cross-tier concat padding): decode to all-NULL values
            if not n:
                flats[vc] = np.empty(0)
                continue
            ok_rows = np.fromiter(
                (b is not None for b in blobs), dtype=bool, count=n
            )
            if ok_rows.all():
                flats[vc] = decode_floats_batched(blobs)[0]
            else:
                vals = np.full(total, np.nan)
                elem_ok = ok_rows[row_of]
                if elem_ok.any():
                    vals[elem_ok] = decode_floats_batched(
                        [b for b in blobs if b is not None]
                    )[0]
                flats[vc] = vals
        for vc in derived:
            if vc not in _DERIVABLE or not set(_DERIVABLE[vc]) <= flats.keys():
                raise KeyError(
                    f"tier has no {vc}_enc column and {vc} is not "
                    f"derivable from the stored columns"
                )
            a, b = (flats[s] for s in _DERIVABLE[vc])
            with np.errstate(invalid="ignore", divide="ignore"):
                flats[vc] = (a / b) if vc == "average" else (a - b)
        for vc in self.value_cols:
            vals = flats[vc]
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
