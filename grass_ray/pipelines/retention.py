"""Retention policy — age data out of a tier by window cutoff.

The retention half of the "rollup + downsample + retention engine":
fine tiers keep a bounded window horizon while coarse tiers retain
history.  ``apply_retention(store, tier, min_window)`` removes every
rolled-up point with ``window < min_window``:

* partitions whose manifest extent ends before the cutoff are dropped
  whole (cheap: manifest + directory delete, no data read);
* partitions straddling the cutoff are trimmed: rows decoded, windows
  below the cutoff removed, re-encoded and atomically re-committed
  (same write-staging → rename → manifest contract as the builder);
* partitions entirely above the cutoff are untouched.

A typical policy: ``1m`` keeps 7 days, ``1h`` keeps 90 days, ``1d``
keeps everything — expressed as three `apply_retention` calls driven by
each tier's granularity.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from grass_ray.stages.codec_stage import DecodeTier, EncodeTier
from grass_ray.state.manifest import TierStore, _parquet_files


def _trim_partition_table(t: pa.Table, min_window: int, value_cols) -> pa.Table:
    """Decode rows, drop windows < min_window, re-encode, refresh stats."""
    from grass_ray.pipelines.tiers import _row_stats_kernel

    dec = DecodeTier(value_cols)(t)
    wcol = dec.column("windows")
    if isinstance(wcol, pa.ChunkedArray):
        wcol = wcol.combine_chunks()
    keep_rows = []
    d = dec.to_pydict()
    list_cols = [
        k for k in dec.column_names if isinstance(dec.column(k).type, pa.ListType)
    ]
    out = {k: [] for k in dec.column_names}
    for i in range(dec.num_rows):
        ws = d["windows"][i]
        keep = [j for j, w in enumerate(ws) if w >= min_window]
        if not keep and ws:
            continue  # row entirely aged out
        for k in dec.column_names:
            if k in list_cols:
                out[k].append([d[k][i][j] for j in keep])
            else:
                out[k].append(d[k][i])
    arrays = {}
    for k in dec.column_names:
        if k in list_cols:
            arrays[k] = pa.array(out[k], type=dec.column(k).type)
        else:
            arrays[k] = pa.array(out[k], type=dec.schema.field(k).type)
    trimmed = pa.table(arrays)
    if trimmed.num_rows == 0:
        return trimmed
    stale = [c for c in ("wstart", "wend", "vmin", "vmax") if c in trimmed.column_names]
    if stale:
        trimmed = trimmed.drop_columns(stale)
    stats_kernel = _row_stats_kernel()
    return EncodeTier(value_cols)(stats_kernel(trimmed))


def apply_retention(
    store: TierStore,
    tier: str,
    min_window: int,
    *,
    value_cols=("count", "sum", "minimum", "maximum", "average"),
) -> dict:
    """Remove all points with window < min_window from a tier.

    Returns {"dropped": [...], "trimmed": [...], "kept": n}.
    """
    m = store.manifest(tier).to_pydict()
    dropped, trimmed, kept = [], [], 0
    for p, ws, we, p_agg in zip(
        m["partition"], m["window_start"], m["window_end"], m["agg_type"]
    ):
        if we is not None and we < min_window:
            store.unregister_partition(tier, p)
            dropped.append(p)
        elif ws is not None and ws < min_window:
            pdir = store.partition_dir(tier, p)
            t = pa.concat_tables(
                [pq.read_table(f) for f in _parquet_files(pdir)]
            )
            if "part" not in t.column_names:
                t = t.append_column(
                    "part", pa.array([p] * t.num_rows, type=pa.int32())
                )
            # derive the partition's actual encoded columns so a trim
            # never silently drops extras (e.g. range_enc / holistic
            # tier-0 columns) its sibling partitions keep
            found = [
                c[: -len("_enc")]
                for c in t.column_names
                if c.endswith("_enc")
                and c != "windows_enc"
                # all-null enc columns are cross-tier concat padding,
                # not data this partition ever carried
                and t.column(c).null_count < t.num_rows
            ]
            new = _trim_partition_table(t, min_window, found or value_cols)
            if new.num_rows == 0:
                store.unregister_partition(tier, p)
                dropped.append(p)
                continue
            staged = store.staging_dir(tier)
            os.makedirs(staged, exist_ok=True)
            pq.write_table(
                new.drop_columns(
                    [c for c in ("part",) if c in new.column_names]
                ),
                os.path.join(staged, "data.parquet"),
            )
            stats = store.partition_stats_from_files(staged)
            store.unregister_partition(tier, p)
            store.commit_partition(
                tier,
                p,
                staged,
                agg_type=p_agg or "retention",
                lineage=json.dumps(
                    {"op": "retention", "min_window": min_window, "partition": p}
                ),
                stats=stats,
            )
            trimmed.append(p)
        else:
            kept += 1
    store.clean_staging(tier)
    return {"dropped": sorted(dropped), "trimmed": sorted(trimmed), "kept": kept}


def apply_retention_policy(store: TierStore, policy: dict) -> dict:
    """Apply {tier: min_window} cutoffs (a full retention sweep)."""
    return {
        tier: apply_retention(store, tier, cutoff)
        for tier, cutoff in policy.items()
    }


def _compact_partition_files(files: list[str], staged_dir: str) -> int:
    """Rewrite one partition's parquet files as a single file under
    ``staged_dir`` (rows concatenated in sorted file-name order —
    row order within a partition carries no meaning; keys identify
    rows).  Returns the row count written."""
    t = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
    os.makedirs(staged_dir, exist_ok=True)
    pq.write_table(
        t, os.path.join(staged_dir, "data.parquet"), compression="zstd"
    )
    return t.num_rows


def compact_tier(
    store: TierStore, tier: str, *, min_files: int = 2
) -> list[int]:
    """Rewrite fragmented partition dirs into one parquet file each.

    Incremental registers, late-data re-registers and multi-block
    staged writes leave a partition dir holding several small parquet
    files; every later read then pays per-file open/footer cost (the
    engine's analog of a time-series DB's segment-merge maintenance).
    Compaction changes ONLY the file layout: decoded points are
    byte-identical, and the manifest stats carry over unchanged with
    lineage recording the op.  One Ray task per fragmented partition
    (the driver holds just the partition list), published through the
    same staged-dir rename + manifest-row contract as every other
    commit, so a kill mid-compaction leaves each partition either old
    or new — never half.

    Returns the sorted list of compacted partition ids.
    """
    import ray

    store.recover_swaps(tier)  # finish any crashed partition swap first
    min_files = max(min_files, 2)  # 0/1 would rewrite healthy dirs
    m = store.manifest(tier).to_pydict()
    stats_by_p = {
        m["partition"][i]: {
            "window_start": m["window_start"][i],
            "window_end": m["window_end"][i],
            "n_rows": m["n_rows"][i],
            "n_points": m["n_points"][i],
            "vmin": m["vmin"][i],
            "vmax": m["vmax"][i],
        }
        for i in range(len(m["partition"]))
    }
    agg_by_p = dict(zip(m["partition"], m["agg_type"]))
    jobs = []
    staging = store.staging_dir(tier)
    for p in sorted(store.committed_partitions(tier)):
        files = _parquet_files(store.partition_dir(tier, p))
        if len(files) >= min_files:
            jobs.append((p, files, os.path.join(staging, f"part={p}")))
    if not jobs:
        return []
    if ray.is_initialized() and len(jobs) > 1:
        fn = ray.remote(num_cpus=1)(_compact_partition_files)
        ray.get([fn.remote(files, staged) for _, files, staged in jobs])
    else:
        for _, files, staged in jobs:
            _compact_partition_files(files, staged)
    committed: list[int] = []
    for p, files, staged in jobs:
        store.commit_partition(
            tier,
            p,
            staged,
            agg_type=agg_by_p.get(p) or "compact",
            lineage=json.dumps(
                {"op": "compact", "partition": p, "files_before": len(files)}
            ),
            stats=stats_by_p.get(p),
        )
        committed.append(p)
    store.clean_staging(tier)
    return sorted(committed)
