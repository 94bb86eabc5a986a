"""Catalog CRUD pipelines — t.rast.list / t.merge / export / import.

The reference's listing module renders filtered, ordered map lists in
plain/csv/json formats (``python/grass/temporal/list_stds.py:35-210``);
export packs per-map files + ``list.txt``/``init.txt``/``metadata.txt``
(``stds_export.py:54-150``); merge unions registrations, skipping maps
already present (``t.merge.py``).  Engine equivalents over the tier
store: listings come from the *encoded* tier's scalar columns (no
decode), export/import move committed partitions + manifest atomically.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from grass_ray.state.manifest import TierStore


def list_tier(
    store: TierStore,
    tier: str,
    *,
    where=None,
    order_by: str | None = "doc_id",
    columns=("source", "doc_id", "gran", "wstart", "wend", "n_points"),
    fmt: str = "table",
    limit: int | None = None,
    max_rows: int = 1_000_000,
):
    """Per-key listing of a committed tier (t.rast.list analog).

    `where`: fn(pa.Table) -> BooleanArray predicate over the scalar
    columns; `fmt`: table | csv | json.

    A listing is a driver-side artifact by contract, so its size must
    be bounded: pass ``limit`` for top-N, else the stream is collected
    up to ``max_rows`` and raises loudly past it (never a silent
    whole-tier materialization)."""
    import os

    import ray.data

    from grass_ray.pipelines.tiers import _keep_partitions

    committed = store.committed_partitions(tier)
    if not committed or not os.path.isdir(store.tier_dir(tier)):
        import pandas as pd

        empty = pa.Table.from_pandas(pd.DataFrame(), preserve_index=False)
        return empty if fmt == "table" else ("" if fmt == "csv" else "[]")
    ds = ray.data.read_parquet(store.tier_dir(tier))
    ds = _keep_partitions(ds, committed)

    def project(batch: pa.Table) -> pa.Table:
        if where is not None:
            batch = batch.filter(where(batch))
        keep = [c for c in columns if c in batch.column_names]
        return batch.select(keep)

    ds = ds.map_batches(project, batch_format="pyarrow")
    if order_by:
        ds = ds.sort(order_by)
    if limit:
        ds = ds.limit(limit)
    batches = []
    n = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        n += b.num_rows
        if limit is None and n > max_rows:
            raise ValueError(
                f"tier listing exceeds max_rows={max_rows}; pass limit= "
                "(top-N) or raise max_rows explicitly"
            )
        batches.append(b)
    t = (
        pa.concat_tables(batches).combine_chunks()
        if batches
        else pa.Table.from_pylist([], schema=ds.schema().base_schema)
    )
    t = pa.Table.from_pandas(t.to_pandas(), preserve_index=False)
    if fmt == "table":
        return t
    if fmt == "csv":
        import io

        import pyarrow.csv as pcsv

        buf = io.BytesIO()
        pcsv.write_csv(t, buf)
        return buf.getvalue().decode()
    if fmt == "json":
        return json.dumps(t.to_pylist(), default=str)
    raise ValueError(f"unknown fmt {fmt!r}")


def merge_tiers(store: TierStore, sources: list[str], dest: str, *, buckets: int = 64):
    """`t.merge`: union several tiers' keys into a new tier; a key
    registered in an earlier source wins (duplicate registration is
    skipped, like the catalog PK check ``base.py:248-265``).

    Distributed plan — no whole-tier driver materialization: each tier
    tags its registration priority, a narrow (source, doc_id, prio)
    ``bucket_agg`` Min exchange finds each key's winning source, and a
    distributed ``semi_join`` on (source, doc_id, prio) keeps exactly
    the winning rows; full rows move once, through the semi-join pass.
    Output stage-writes partitioned by ``part`` and commits atomically
    (the `_write_and_commit` shape, without re-encoding)."""
    import numpy as np
    import ray.data

    from grass_ray.pipelines.tiers import _keep_partitions
    from grass_ray.stages.join import bucket_agg, semi_join

    tagged = []
    for i, tier in enumerate(sources):
        ds = ray.data.read_parquet(store.tier_dir(tier))
        ds = _keep_partitions(ds, store.committed_partitions(tier))
        ds = ds.map_batches(
            lambda b, _i=i: b.append_column(
                "_prio", pa.array(np.full(b.num_rows, _i, dtype=np.int64))
            ),
            batch_format="pyarrow",
        )
        tagged.append(ds)
    uni = tagged[0]
    for d in tagged[1:]:
        uni = uni.union(d)
    keys = uni.map_batches(
        lambda b: b.select(["source", "doc_id", "_prio"]),
        batch_format="pyarrow",
    )
    winners = bucket_agg(
        keys, ["source", "doc_id"], [("_prio", "min", "_prio")], buckets=buckets
    )
    kept = semi_join(
        uni,
        winners,
        key_cols=("source", "doc_id", "_prio"),
        buckets=buckets,
        keys_distinct=True,
    )
    out = kept.map_batches(
        lambda b: b.drop_columns(["_prio"]), batch_format="pyarrow"
    )

    staging = store.staging_dir(dest)
    out.write_parquet(staging, partition_cols=["part"], compression="zstd")
    committed = []
    for d in sorted(os.listdir(staging)):
        if not d.startswith("part="):
            continue
        p = int(d.split("=", 1)[1])
        staged = os.path.join(staging, d)
        stats = store.partition_stats_from_files(staged)
        store.commit_partition(
            dest,
            p,
            staged,
            agg_type="merge",
            lineage=json.dumps({"inputs": sources}),
            stats=stats,
        )
        committed.append(p)
    store.clean_staging(dest)
    return committed


def export_tier(store: TierStore, tier: str, dest_dir: str, *, archive: bool = False):
    """Pack a tier: partition parquet + manifest + init/list metadata
    (the stds_export layout: data + list.txt + init.txt).  archive=True
    additionally produces ``<dest_dir>.tar.gz`` — the reference's
    tar.gz packaging (``stds_export.py:54-150``)."""
    os.makedirs(dest_dir, exist_ok=True)
    data_dir = os.path.join(dest_dir, "data")
    if os.path.isdir(data_dir):
        shutil.rmtree(data_dir)
    shutil.copytree(store.tier_dir(tier), data_dir)
    m = store.manifest(tier)
    pq.write_table(m, os.path.join(dest_dir, "manifest.parquet"))
    info = store.info(tier)
    with open(os.path.join(dest_dir, "init.txt"), "w") as f:
        for k, v in info.items():
            f.write(f"{k}={v}\n")
    with open(os.path.join(dest_dir, "list.txt"), "w") as f:
        for row in m.to_pylist():
            f.write(
                f"part={row['partition']}|{row['window_start']}|{row['window_end']}|{row['n_rows']}\n"
            )
    if archive:
        base = shutil.make_archive(dest_dir, "gztar", dest_dir)
        return base
    return dest_dir


def import_tier_archive(store: TierStore, archive_path: str, tier: str):
    """Unpack an exported ``.tar.gz`` and import it (stds_import)."""
    import tempfile

    with tempfile.TemporaryDirectory(prefix="grassray_imp_") as tmp:
        shutil.unpack_archive(archive_path, tmp)
        return import_tier(store, tmp, tier)


def import_tier(store: TierStore, src_dir: str, tier: str):
    """Inverse of :func:`export_tier` (stds_import analog)."""
    data_dir = os.path.join(src_dir, "data")
    dest = store.tier_dir(tier)
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    shutil.copytree(data_dir, dest)
    m = pq.read_table(os.path.join(src_dir, "manifest.parquet"))
    mdir = store._manifest_dir(tier)
    shutil.rmtree(mdir, ignore_errors=True)
    os.makedirs(mdir, exist_ok=True)
    for row in m.to_pylist():
        row = dict(row)
        row["tier"] = tier
        one = pa.Table.from_pylist([row], schema=m.schema)
        pq.write_table(
            one, store._manifest_row_path(tier, row["partition"])
        )
    return sorted(store.committed_partitions(tier))
