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
):
    """Per-key listing of a committed tier (t.rast.list analog).

    `where`: fn(pa.Table) -> BooleanArray predicate over the scalar
    columns; `fmt`: table | csv | json.
    """
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
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
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


def merge_tiers(store: TierStore, sources: list[str], dest: str):
    """`t.merge`: union several tiers' keys into a new tier; a key
    registered in an earlier source wins (duplicate registration is
    skipped, like the catalog PK check ``base.py:248-265``)."""
    import ray.data

    from grass_ray.pipelines.tiers import _keep_partitions

    seen_schema = None
    seen: set = set()
    frames = []
    for tier in sources:
        ds = ray.data.read_parquet(store.tier_dir(tier))
        ds = _keep_partitions(ds, store.committed_partitions(tier))
        df = ds.to_pandas()
        key = list(zip(df["source"], df["doc_id"]))
        keep = [k not in seen for k in key]
        seen.update(k for k, kp in zip(key, keep) if kp)
        frames.append(df[keep])
        seen_schema = df.columns
    import pandas as pd

    merged = pd.concat(frames, ignore_index=True)
    out_dir = store.staging_dir(dest)
    os.makedirs(out_dir, exist_ok=True)
    by_part = merged.groupby("part") if "part" in merged.columns else [(0, merged)]
    committed = []
    for p, grp in by_part:
        staged = os.path.join(out_dir, f"part={int(p)}")
        os.makedirs(staged, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(grp.drop(columns=["part"]), preserve_index=False),
            os.path.join(staged, "data.parquet"),
        )
        stats = store.partition_stats_from_files(staged)
        store.commit_partition(
            dest,
            int(p),
            staged,
            agg_type="merge",
            lineage=json.dumps({"inputs": sources}),
            stats=stats,
        )
        committed.append(int(p))
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
