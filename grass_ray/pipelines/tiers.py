"""The flagship pipeline: resumable cascading retention-tier build.

``t.rast.aggregate`` chained across granularities with registration into
a catalog (SURVEY §3.1), Ray-Data-first.  Three build strategies:

* **one-pass** (default, :func:`build_tiers_onepass`): every corpus
  batch emits ALL tiers' encoded rows in one kernel
  (rollup → cascade → cascade, all row-local) tagged with a ``tier``
  column; one partitioned write; per-(tier, partition) bulk manifest
  commits.  The raw data is read exactly once, nothing is re-read, and
  **no stage shuffles**: range partitioning on the doc index makes each
  batch partition-contiguous, so even the partitioned write needs no
  exchange.

      corpus parquet
        → assign range partition (doc index // docs_per_partition)
        → filter out committed partitions            [resume]
        → per batch: rollup 1m → cascade ×60 → cascade ×24,
          row stats + Gorilla/dod encode, tier tag   [row-local]
        → write staging partitioned by (tier, part)  [sink]
        → bulk atomic commits + one manifest file    [driver]

* **chained** (``strategy="chained"``): tier k reads tier k−1's
  committed output back (decoded) — the incremental path when a fine
  tier already exists and only coarser tiers need (re)building.

* **waves** (:func:`build_tiers_waves`): partitions processed in
  footer-range-selected waves, each committing independently — the
  long-running-job shape (a kill loses at most one wave).

Resumability: a re-run skips partitions whose manifest row is committed
(the catalog-as-checkpoint behavior of the reference,
``aggregation.py:146-160``); hash partitioning (+ pre-write sort) stays
available for skewed id spaces.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pyarrow as pa

from grass_ray.stages.cascade import cascade, cascade_batch
from grass_ray.stages.codec_stage import EncodeTier
from grass_ray.stages.rollup import rollup
from grass_ray.state.manifest import TierStore

ENGINE_VERSION = "0.1"
TIER_METHODS = ("count", "sum", "minimum", "maximum", "average")


def _hash_partition(doc_ids: pa.Array, num_partitions: int) -> np.ndarray:
    """Deterministic, process-stable partition id per doc_id (crc32) —
    hashed once per DISTINCT id via dictionary encoding, then gathered
    (key columns repeat heavily on the events path)."""
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    enc = doc_ids.dictionary_encode()
    uniq = np.array(
        [
            zlib.crc32(str(s).encode()) % num_partitions
            for s in enc.dictionary.to_pylist()
        ],
        dtype=np.int32,
    )
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(uniq) == 0:
        return np.empty(0, dtype=np.int32)
    return uniq[codes]


def assign_partition(ds, num_partitions: int, key_col: str = "doc_id"):
    def kernel(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        part = _hash_partition(col, num_partitions)
        return batch.append_column("part", pa.array(part))

    return ds.map_batches(kernel, batch_format="pyarrow")


def assign_partition_range(ds, docs_per_partition: int, key_col: str = "doc_id"):
    """Range partitioning on the numeric doc index ('d0000042' -> 42):
    partition SIZE is fixed and the count grows with the data — at 100 TB
    that means tens of thousands of resume units, none hot.  Because
    input blocks hold contiguous doc ranges, each batch usually belongs
    to ONE partition, so the partitioned write needs no shuffle at all
    (versus hash partitioning, which scatters every batch over all
    partitions and forces a sort before the write)."""

    def kernel(batch: pa.Table) -> pa.Table:
        part = (
            _doc_index_array(batch.column(key_col)) // docs_per_partition
        ).astype(np.int32)
        return batch.append_column("part", pa.array(part))

    return ds.map_batches(kernel, batch_format="pyarrow")


def _doc_index_array(col) -> np.ndarray:
    """Vectorized canonical-id index: 'd0000042' -> 42 via Arrow slice +
    cast (no per-row Python on the flagship hot path).  Any batch with a
    non-canonical id falls back to a per-row stable crc32, so foreign
    corpora degrade to hash partitioning instead of crashing (they just
    lose the contiguous-range no-shuffle property)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    try:
        tail = pc.utf8_slice_codeunits(col, 1)
        return pc.cast(tail, pa.int64()).to_numpy(zero_copy_only=False)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        out = np.empty(len(col), dtype=np.int64)
        for i, s in enumerate(col.to_pylist()):
            t = s[1:] if isinstance(s, str) and len(s) > 1 else ""
            out[i] = int(t) if t.isdigit() else zlib.crc32(str(s).encode())
        return out


def filter_partitions(ds, skip: set[int]):
    """Drop rows whose partition is already committed (resume path)."""
    if not skip:
        return ds
    skip_arr = np.array(sorted(skip), dtype=np.int64)

    def kernel(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        part = (
            pc.cast(batch.column("part"), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        keep = ~np.isin(part, skip_arr)
        return batch.filter(pa.array(keep))

    return ds.map_batches(kernel, batch_format="pyarrow")


def _keep_partitions(ds, keep: set[int]):
    """Keep only rows whose partition is in `keep`."""
    keep_arr = np.array(sorted(keep), dtype=np.int64)

    def kernel(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        part = (
            pc.cast(batch.column("part"), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        return batch.filter(pa.array(np.isin(part, keep_arr)))

    return ds.map_batches(kernel, batch_format="pyarrow")


def with_row_stats(ds):
    """Append scalar wstart/wend/vmin/vmax per nested row so partition
    stats come from Parquet footer statistics, not a data scan."""

    def kernel(batch: pa.Table) -> pa.Table:
        stale = [c for c in ("wstart", "wend", "vmin", "vmax") if c in batch.column_names]
        if stale:
            batch = batch.drop_columns(stale)
        windows = batch.column("windows")
        if isinstance(windows, pa.ChunkedArray):
            windows = windows.combine_chunks()
        lens = np.asarray(
            windows.value_lengths().to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        w = windows.flatten().to_numpy(zero_copy_only=False)
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        ends = np.cumsum(lens) - 1
        has = lens > 0
        wstart = np.where(has, w[np.where(has, starts, 0)], 0)
        wend = np.where(has, w[np.where(has, ends, 0)], -1)

        def minmax(colname, fn, fill):
            col = batch.column(colname)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            v = col.flatten().cast(pa.float64()).to_numpy(zero_copy_only=False)
            v = np.where(np.isnan(v), fill, v)
            out = np.full(len(lens), np.nan)
            if has.any() and len(v):
                # reduceat over only non-empty rows' starts: empty rows
                # contribute zero elements so consecutive non-empty starts
                # delimit exactly one row's range
                out[has] = fn.reduceat(v, starts[has])
            out[out == fill] = np.nan
            return out

        vmin = minmax("minimum", np.minimum, np.inf)
        vmax = minmax("maximum", np.maximum, -np.inf)
        t = batch.append_column("wstart", pa.array(wstart, type=pa.int64()))
        t = t.append_column("wend", pa.array(wend, type=pa.int64()))
        t = t.append_column(
            "vmin", pa.array(vmin, type=pa.float64(), mask=np.isnan(vmin))
        )
        t = t.append_column(
            "vmax", pa.array(vmax, type=pa.float64(), mask=np.isnan(vmax))
        )
        return t

    return ds.map_batches(kernel, batch_format="pyarrow")


def _write_and_commit(
    nested_ds,
    store: TierStore,
    tier: str,
    *,
    agg_type: str,
    lineage: dict,
    encode: bool = True,
    value_cols=TIER_METHODS,
    skip_partitions: set[int] | None = None,
):
    """Encode (optional) + stage-write + atomically commit partitions."""
    skip = skip_partitions or set()
    ds = with_row_stats(nested_ds)
    if encode:
        ds = ds.map_batches(
            EncodeTier,
            fn_constructor_kwargs={"value_cols": value_cols},
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 4),
        )
    staging = store.staging_dir(tier)
    ds.write_parquet(staging, partition_cols=["part"], compression="zstd")
    committed = []
    if os.path.isdir(staging):
        for d in sorted(os.listdir(staging)):
            if not d.startswith("part="):
                continue
            p = int(d.split("=", 1)[1])
            if p in skip:
                continue
            staged = os.path.join(staging, d)
            stats = store.partition_stats_from_files(staged)
            store.commit_partition(
                tier,
                p,
                staged,
                agg_type=agg_type,
                lineage=json.dumps(
                    {**lineage, "engine_version": ENGINE_VERSION, "partition": p}
                ),
                stats=stats,
            )
            committed.append(p)
        store.clean_staging(tier)
    return committed


def _row_stats_kernel():
    """Extract with_row_stats' batch kernel for inline (non-Dataset) use."""
    holder = {}

    class _Fake:
        def map_batches(self, fn, **kw):
            holder["fn"] = fn
            return self

    with_row_stats(_Fake())
    return holder["fn"]


def onepass_kernel(tier_specs, methods):
    """The fused rollup → cascade → encode batch kernel of the one-pass
    build, exposed so tooling (stage isolation) can time the compute
    slice without the parquet sink."""
    from grass_ray.stages.codec_stage import EncodeTier
    from grass_ray.stages.rollup import rollup_batch

    stats_kernel = _row_stats_kernel()
    first_gran = tier_specs[0][1]

    def kernel(batch: pa.Table) -> pa.Table:
        nested = rollup_batch(
            batch,
            first_gran,
            methods,
            nested=True,
            key_cols=("source", "doc_id", "part"),
        )
        outs = []
        current = nested
        for i, (name, factor) in enumerate(tier_specs):
            if i > 0:
                current = cascade_batch(current, factor)
            # holistic tier-0-only columns (median, quantiles, ...) drop
            # out after a cascade (non-decomposable, F7): encode only
            # the value columns this tier actually carries
            present = [
                c
                for c in methods
                if c in current.column_names
                and isinstance(current.column(c).type, pa.ListType)
            ]
            extra = [
                c
                for c in ("average", "range")
                if c in current.column_names and c not in present
            ]
            t = EncodeTier(tuple(present + extra))(stats_kernel(current))
            outs.append(t.append_column("tier", pa.array([name] * t.num_rows)))
        return pa.concat_tables(outs, promote_options="default")

    return kernel


def build_tiers_onepass(
    corpus_ds,
    out_root: str,
    *,
    tier_specs=(("1m", 60), ("1h", 60), ("1d", 24)),
    methods=TIER_METHODS,
    num_partitions: int = 32,
    resume: bool = True,
    lineage_inputs: str = "corpus",
    partitioning: str = "range",
    docs_per_partition: int = 2000,
):
    """Single-pass cascade: every corpus batch emits ALL tiers' encoded
    rows (rollup → cascade → cascade, all row-local) tagged with a
    ``tier`` column; one partitioned write, per-(tier, partition)
    manifest commits.  The raw data is read exactly once and no tier is
    ever re-read during the build — the narrowest possible plan for the
    full rebuild case (the chained :func:`build_tiers` path remains for
    incremental re-cascades of an existing tier).
    """
    store = TierStore(out_root)
    tier_names = [name for name, _ in tier_specs]
    done_by_tier = {
        name: (store.committed_partitions(name) if resume else set())
        for name in tier_names
    }
    # a partition is done iff committed in every tier
    done = set.intersection(*done_by_tier.values()) if done_by_tier else set()
    if partitioning == "range":
        ds = assign_partition_range(corpus_ds, docs_per_partition)
    else:
        ds = assign_partition(corpus_ds, num_partitions)
    ds = filter_partitions(ds, done)
    out = ds.map_batches(
        onepass_kernel(tier_specs, methods),
        batch_format="pyarrow",
        batch_size=512,
    )
    if partitioning != "range":
        # hash partitioning scatters every batch over all P partitions:
        # without co-location each block writes one tiny file per value
        # (blocks × P files — measured to make 32 CPUs *slower* than 8).
        # The sort shuffles only the encoded tier rows (~2% of input
        # bytes).  Range partitioning needs none of this: batches are
        # already partition-contiguous.
        out = out.sort(["tier", "part"])
    staging = os.path.join(out_root, f".staging-onepass-{__import__('uuid').uuid4().hex[:8]}")
    out.write_parquet(staging, partition_cols=["tier", "part"], compression="zstd")
    results: dict[str, list[int]] = {name: [] for name in tier_names}
    if os.path.isdir(staging):
        # ONE columnar read yields every (tier, partition)'s stats
        stats_all = store.bulk_partition_stats_all(staging)
        for tdir in sorted(os.listdir(staging)):
            if not tdir.startswith("tier="):
                continue
            tier = tdir.split("=", 1)[1]
            tier_stage = os.path.join(staging, tdir)
            all_stats = {
                p: s for (t_, p), s in stats_all.items() if t_ == tier
            }
            jobs = []
            for pdir in sorted(os.listdir(tier_stage)):
                if not pdir.startswith("part="):
                    continue
                p = int(pdir.split("=", 1)[1])
                if p in done_by_tier.get(tier, set()):
                    continue
                jobs.append(
                    (p, os.path.join(tier_stage, pdir), all_stats.get(p, {}))
                )

            def lineage_fn(p, _tier=tier):
                return json.dumps(
                    {
                        "inputs": lineage_inputs,
                        "engine_version": ENGINE_VERSION,
                        "partition": p,
                        "strategy": "onepass",
                    }
                )

            committed = store.commit_partitions_bulk(
                tier, jobs, agg_type=",".join(methods), lineage_fn=lineage_fn
            )
            results[tier].extend(sorted(committed))
        shutil_rmtree(staging)
    # sweep any stale one-pass staging dirs from killed runs
    for d in os.listdir(out_root):
        if d.startswith(".staging-onepass-"):
            shutil_rmtree(os.path.join(out_root, d))
    return results


def shutil_rmtree(path):
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def build_tiers(
    corpus_ds,
    out_root: str,
    *,
    tier_specs=(("1m", 60), ("1h", 60), ("1d", 24)),
    methods=TIER_METHODS,
    num_partitions: int = 32,
    encode: bool = True,
    resume: bool = True,
    lineage_inputs: str = "corpus",
    strategy: str = "onepass",
    partitioning: str = "range",
    docs_per_partition: int = 2000,
):
    """Build the full retention cascade; returns {tier: committed parts}.

    tier_specs: first entry aggregates raw positions with its granularity;
    each later entry is a cascade *factor* over the previous tier.

    strategy="onepass" (default, encode only): one streaming pass emits
    every tier.  strategy="chained": tier k is read back (decoded) from
    tier k-1's committed output — the incremental path when a fine tier
    already exists.
    """
    if strategy == "onepass" and encode:
        return build_tiers_onepass(
            corpus_ds,
            out_root,
            tier_specs=tier_specs,
            methods=methods,
            num_partitions=num_partitions,
            resume=resume,
            lineage_inputs=lineage_inputs,
            partitioning=partitioning,
            docs_per_partition=docs_per_partition,
        )
    store = TierStore(out_root)
    results: dict[str, list[int]] = {}

    first_name, first_gran = tier_specs[0]
    done = store.committed_partitions(first_name) if resume else set()
    ds = assign_partition(corpus_ds, num_partitions)
    ds = filter_partitions(ds, done)
    nested = rollup(ds, first_gran, methods, nested=True, key_cols=("source", "doc_id", "part"))
    results[first_name] = _write_and_commit(
        nested,
        store,
        first_name,
        agg_type=",".join(methods),
        lineage={"inputs": lineage_inputs, "gran": first_gran},
        encode=encode,
        value_cols=methods,
        skip_partitions=done,
    )

    prev_name = first_name
    for name, factor in tier_specs[1:]:
        done = store.committed_partitions(name) if resume else set()
        prev = read_tier(
            store, prev_name, encoded=encode, value_cols=methods, decode=encode
        )
        prev = filter_partitions(prev, done)
        coarser = cascade(prev, factor)
        results[name] = _write_and_commit(
            coarser,
            store,
            name,
            agg_type=",".join(methods),
            lineage={"inputs": prev_name, "factor": factor},
            encode=encode,
            value_cols=methods,
            skip_partitions=done,
        )
        prev_name = name
    return results


def read_tier(
    store: TierStore,
    tier: str,
    *,
    encoded: bool = True,
    decode: bool = True,
    value_cols=TIER_METHODS,
    columns=None,
    window_range: tuple | None = None,
):
    """Read a committed tier as a Dataset (optionally decoding the codec).

    Reads the whole tier directory (hive partitioning restores the
    ``part`` column; ``.staging-*`` dirs are hidden from discovery) and
    keeps only partitions with a committed manifest row, so orphan
    directories from a crash mid-commit are ignored.

    window_range=(lo, hi) prunes at the read: partitions whose manifest
    (window_start, window_end) extent misses the range are never opened,
    and a Parquet predicate on the per-row wstart/wend footer statistics
    skips non-overlapping row groups inside the survivors — the engine's
    own storage honors the prune-at-the-read rule.
    """
    import pyarrow.compute as _pc

    import ray.data

    committed = store.committed_partitions(tier)
    pq_filter = None
    if window_range is not None:
        lo, hi = window_range
        m = store.manifest(tier).to_pydict()
        committed = {
            p
            for p, ws, we in zip(
                m["partition"], m["window_start"], m["window_end"]
            )
            if p in committed
            and ws is not None
            and we is not None
            and we >= lo
            and ws <= hi
        }
        pq_filter = (_pc.field("wend") >= lo) & (_pc.field("wstart") <= hi)
    if not committed or not os.path.isdir(store.tier_dir(tier)):
        # unknown/empty tier -> empty dataset rather than a read error
        import pandas as pd

        return ray.data.from_pandas(pd.DataFrame())
    from grass_ray.sources.readers import read_parquet_sized

    ds = read_parquet_sized(
        store.tier_dir(tier), columns=columns, filter=pq_filter
    )
    ds = _keep_partitions(ds, committed)
    if encoded and decode:
        from grass_ray.stages.codec_stage import decode_tier_kernel

        vc = tuple(value_cols)
        ds = ds.map_batches(
            lambda b, _vc=vc: decode_tier_kernel(b, _vc),
            batch_format="pyarrow",
            batch_size=256,
        )
    return ds


def build_tiers_waves(
    corpus_dir: str,
    out_root: str,
    *,
    tier_specs=(("1m", 60), ("1h", 60), ("1d", 24)),
    methods=TIER_METHODS,
    docs_per_partition: int = 2000,
    partitions_per_wave: int = 64,
    resume: bool = True,
    lineage_inputs: str | None = None,
):
    """Checkpointed tier build: partitions are processed in WAVES, each
    wave a complete one-pass build over only the input files whose doc
    range overlaps it (Parquet footer min/max of ``doc_id``).

    This bounds the blast radius of a failure to one wave (the plain
    one-pass build commits only at the end of the whole run) and bounds
    re-read amplification to the files straddling wave boundaries — the
    long-running-100TB-job shape: kill it anywhere, rerun, and only the
    in-flight wave recomputes.  Returns {tier: [committed partitions]}.
    """
    import pyarrow.parquet as pq

    import ray.data

    from grass_ray.state.manifest import _parquet_files

    files = _parquet_files(corpus_dir)
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        schema_names = md.schema.to_arrow_schema().names
        ci = {n: i for i, n in enumerate(schema_names)}
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci["doc_id"]).statistics
            if st is None or not st.has_min_max:
                lo = None
                break
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                mn, mx = mn.decode(), mx.decode()
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        if lo is not None:
            try:
                ranges.append((f, int(lo[1:]), int(hi[1:])))
                continue
            except (ValueError, IndexError):
                lo = None  # non-canonical ids: derive the range below
        # no usable footer stats: one bounded single-column read of this
        # file yields its true index range (foreign id spaces degrade to
        # crc32 hash indexes via _doc_index_array instead of crashing,
        # and max_doc stays finite so the wave loop stays bounded)
        ids = _doc_index_array(pq.read_table(f, columns=["doc_id"]).column("doc_id"))
        if len(ids) == 0:
            continue
        ranges.append((f, int(ids.min()), int(ids.max())))
    if not ranges:
        return {name: [] for name, _ in tier_specs}
    max_doc = max(hi for _, _, hi in ranges)
    n_parts = max_doc // docs_per_partition + 1
    results: dict[str, list[int]] = {name: [] for name, _ in tier_specs}
    wave_start = 0
    while wave_start < n_parts:
        wave_end = min(wave_start + partitions_per_wave, n_parts)
        doc_lo = wave_start * docs_per_partition
        doc_hi = wave_end * docs_per_partition  # exclusive
        wave = [
            (f, lo, hi) for f, lo, hi in ranges if hi >= doc_lo and lo < doc_hi
        ]
        wave_files = [f for f, _, _ in wave]
        if wave_files:
            from grass_ray.sources.readers import read_parquet_sized

            ds = read_parquet_sized(wave_files)
            # clip only when a file actually straddles the wave boundary
            # (with partition-aligned input files the clip pass — a full
            # decode + filter of the wave — is a no-op and is skipped)
            if any(lo < doc_lo or hi >= doc_hi for _, lo, hi in wave):

                def clip(batch, _lo=doc_lo, _hi=doc_hi):
                    di = _doc_index_array(batch.column("doc_id"))
                    return batch.filter(pa.array((di >= _lo) & (di < _hi)))

                ds = ds.map_batches(clip, batch_format="pyarrow")
            wave_res = build_tiers_onepass(
                ds,
                out_root,
                tier_specs=tier_specs,
                methods=methods,
                resume=resume,
                lineage_inputs=lineage_inputs
                or f"{corpus_dir}[{doc_lo}:{doc_hi}]",
                partitioning="range",
                docs_per_partition=docs_per_partition,
            )
            for name, parts in wave_res.items():
                results[name].extend(parts)
        wave_start = wave_end
    return results


def nest_windows(
    flat_ds,
    *,
    key_cols,
    value_cols=TIER_METHODS,
    window_col: str = "window",
    gran: int = 1,
    buckets: int = 64,
):
    """Flat per-(key, window) rollup rows -> the nested tier layout
    (one row per key: ``windows`` + parallel value lists, sorted by
    window) that :func:`with_row_stats` / the codec / ``cascade``
    consume.  One fixed-bucket exchange co-locates a key's windows;
    the per-bucket kernel sorts once and packs EVERY key via offset
    slicing — no per-key Python dispatch."""
    from grass_ray.stages.join import _bucket_ids

    keys = list(key_cols)
    vcols = list(value_cols)

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bucket", pa.array(_bucket_ids(batch, keys, buckets))
        )

    def per_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from grass_ray.stages.grouped import _key_group_slices

        t = batch.take(
            pc.sort_indices(
                batch,
                sort_keys=[(k, "ascending") for k in keys]
                + [(window_col, "ascending")],
            )
        )
        # stable re-sort by keys only: window order inside each key is
        # retained, groups come back contiguous
        order, starts, ends = _key_group_slices(t, keys)
        t = t.take(pa.array(order))
        n = t.num_rows
        offsets = pa.array(
            np.append(starts, n).astype(np.int32)
        )
        cols = {k: t.column(k).take(pa.array(starts)) for k in keys}
        cols["gran"] = pa.array(np.full(len(starts), gran, dtype=np.int64))
        wvals = t.column(window_col)
        if isinstance(wvals, pa.ChunkedArray):
            wvals = wvals.combine_chunks()
        cols["windows"] = pa.ListArray.from_arrays(
            offsets, wvals.cast(pa.int64())
        )
        for vc in vcols:
            v = t.column(vc)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            cols[vc] = pa.ListArray.from_arrays(offsets, v)
        return pa.table(cols)

    return (
        flat_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def build_calendar_tier(
    events_ds,
    out_root: str,
    *,
    tier_name: str | None = None,
    unit: str = "months",
    mult: int = 1,
    methods=TIER_METHODS,
    key_cols=("event_type",),
    ts_col: str = "ts",
    val_col: str = "value",
    num_partitions: int = 8,
    encode: bool = True,
    resume: bool = True,
):
    """Calendar-granularity tier build — ``t.rast.aggregate`` with a
    ``"1 months"``-style granularity over wall-clock events
    (``temporal/t.rast.aggregate/testsuite/test_aggregation_absolute.py``),
    threaded through the SAME committed-tier machinery as the integer
    flagship: windows are calendar granule indices
    (:func:`grass_ray.functions.calendar.window_id` — months roll on
    real month boundaries, weeks start Monday), rows nest per key, the
    codec + footer stats + atomic partition commits and resume all
    apply unchanged.  Returns {tier_name: committed partitions}.

    Plan shape: one windowing map (no shuffle) -> partial-combined
    rollup exchange -> one nesting exchange keyed on the (few) keys ->
    partitioned write.  The ``windows`` column stores granule indices;
    ``lineage`` records the calendar granularity so
    :func:`grass_ray.functions.calendar.window_start` can recover
    wall-clock extents.
    """
    from grass_ray.stages.grouped import rollup_events

    store = TierStore(out_root)
    name = tier_name or f"{mult}{unit}"
    done = store.committed_partitions(name) if resume else set()
    ds = assign_partition(events_ds, num_partitions, key_col=key_cols[0])
    ds = filter_partitions(ds, done)
    flat = rollup_events(
        ds,
        calendar_unit=unit,
        calendar_mult=mult,
        methods=methods,
        key_cols=list(key_cols) + ["part"],
        ts_col=ts_col,
        val_col=val_col,
    )
    nested = nest_windows(
        flat, key_cols=list(key_cols) + ["part"], value_cols=methods
    )
    committed = _write_and_commit(
        nested,
        store,
        name,
        agg_type=",".join(methods),
        lineage={"inputs": "events", "granularity": f"{mult} {unit}"},
        encode=encode,
        value_cols=methods,
        skip_partitions=done,
    )
    return {name: committed}
