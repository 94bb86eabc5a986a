"""Per-tier Parquet manifest — the engine's temporal-database catalog.

Replaces the reference's SQLite/PostgreSQL temporal catalog
(``python/grass/temporal/core.py:643``; STDS tables
``lib/temporal/SQL/stds_tables_template.sql``) with a tiny file-based
manifest per tier: one row per committed partition carrying lineage,
row/point counts, window extent and value min/max (the analog of
``strds_metadata``'s ``number_of_maps`` / ``min_min``…``max_max``,
updated by ``update_from_registered_maps``,
``abstract_space_time_dataset.py:2797+``).

Resumability contract (north rule): a partition is visible iff its data
directory was atomically renamed into place AND its manifest row file
exists; re-runs skip committed partitions, so a killed run resumes with
no double-counting.  Commit order: data rename first, then manifest row
(write-tmp → rename) — a crash between the two re-processes that
partition idempotently (the rename replaces the same directory).

Layout::

    root/
      <tier>/part=<p>/*.parquet          # committed data
      <tier>/.staging-<runid>/...        # in-flight (discarded on resume)
      _manifest/<tier>/part=<p>.parquet  # one-row manifest per partition
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_SCHEMA = pa.schema(
    [
        ("tier", pa.string()),
        ("partition", pa.int32()),
        ("window_start", pa.int64()),
        ("window_end", pa.int64()),
        ("n_rows", pa.int64()),
        ("n_points", pa.int64()),
        ("agg_type", pa.string()),
        ("vmin", pa.float64()),
        ("vmax", pa.float64()),
        ("lineage", pa.string()),
        ("done", pa.bool_()),
        # monotonic commit ordering: duplicate partition rows are
        # resolved by the highest commit_seq, not by filename (a later
        # per-partition commit must beat an earlier bulk-run row even
        # though 'part=N' sorts before 'run-*')
        ("commit_seq", pa.int64()),
    ]
)


class TierStore:
    """Catalog + atomic-commit layer for tier outputs under one root."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---- paths -----------------------------------------------------
    def tier_dir(self, tier: str) -> str:
        return os.path.join(self.root, tier)

    def partition_dir(self, tier: str, p: int) -> str:
        return os.path.join(self.tier_dir(tier), f"part={p}")

    def _manifest_dir(self, tier: str) -> str:
        return os.path.join(self.root, "_manifest", tier)

    def _manifest_row_path(self, tier: str, p: int) -> str:
        return os.path.join(self._manifest_dir(tier), f"part={p}.parquet")

    def staging_dir(self, tier: str, run_id: str | None = None) -> str:
        run_id = run_id or uuid.uuid4().hex[:8]
        return os.path.join(self.tier_dir(tier), f".staging-{run_id}")

    # ---- catalog ops (t.create / t.info / t.remove / t.rename ...) --
    def tiers(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d
            for d in os.listdir(self.root)
            if d != "_manifest" and os.path.isdir(os.path.join(self.root, d))
        )

    def _manifest_files(self, tier: str) -> list[str]:
        d = self._manifest_dir(tier)
        if not os.path.isdir(d):
            return []
        return [
            os.path.join(d, f)
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet") and not f.startswith(".")
        ]

    def committed_partitions(self, tier: str) -> set[int]:
        out: set[int] = set()
        for f in self._manifest_files(tier):
            out.update(
                pq.read_table(f, columns=["partition"])
                .column("partition")
                .to_pylist()
            )
        return out

    def manifest(self, tier: str) -> pa.Table:
        """All committed manifest rows for a tier (the commit with the
        highest ``commit_seq`` per partition wins; empty table if none).
        Legacy rows without the column inherit their file's mtime so
        pre-seq manifests still order correctly."""
        files = self._manifest_files(tier)
        if not files:
            return MANIFEST_SCHEMA.empty_table()
        parts = []
        for f in files:
            t = pq.read_table(f)
            if "commit_seq" not in t.column_names:
                seq = os.stat(f).st_mtime_ns
                t = t.append_column(
                    "commit_seq",
                    pa.array([seq] * t.num_rows, type=pa.int64()),
                )
            parts.append(t.select(MANIFEST_SCHEMA.names))
        t = pa.concat_tables(parts)
        df = (
            t.to_pandas()
            .sort_values("commit_seq", kind="stable")
            .drop_duplicates("partition", keep="last")
            .sort_index()
        )
        return pa.Table.from_pandas(df, schema=MANIFEST_SCHEMA, preserve_index=False)

    def info(self, tier: str) -> dict:
        """`t.info`-style rollup of the tier manifest."""
        m = self.manifest(tier)
        if m.num_rows == 0:
            return {"tier": tier, "partitions": 0, "n_rows": 0, "n_points": 0}
        import pyarrow.compute as pc

        return {
            "tier": tier,
            "partitions": m.num_rows,
            "n_rows": int(pc.sum(m.column("n_rows")).as_py() or 0),
            "n_points": int(pc.sum(m.column("n_points")).as_py() or 0),
            "window_start": pc.min(m.column("window_start")).as_py(),
            "window_end": pc.max(m.column("window_end")).as_py(),
            "vmin": pc.min(m.column("vmin")).as_py(),
            "vmax": pc.max(m.column("vmax")).as_py(),
            "agg_type": m.column("agg_type")[0].as_py(),
        }

    def remove_tier(self, tier: str):
        shutil.rmtree(self.tier_dir(tier), ignore_errors=True)
        shutil.rmtree(self._manifest_dir(tier), ignore_errors=True)

    def rename_tier(self, old: str, new: str):
        if os.path.isdir(self.tier_dir(old)):
            os.rename(self.tier_dir(old), self.tier_dir(new))
        if os.path.isdir(self._manifest_dir(old)):
            os.makedirs(os.path.dirname(self._manifest_dir(new)), exist_ok=True)
            os.rename(self._manifest_dir(old), self._manifest_dir(new))

    # ---- atomic partition commit ------------------------------------
    def commit_partition(
        self,
        tier: str,
        p: int,
        staged_dir: str,
        *,
        agg_type: str,
        lineage: dict | str,
        stats: dict | None = None,
    ):
        """Atomically publish one staged partition + its manifest row."""
        final = self.partition_dir(tier, p)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(staged_dir, final)
        stats = dict(stats or {})
        stats.setdefault("n_rows", _count_rows(final))
        row = pa.table(
            {
                "tier": [tier],
                "partition": [p],
                "window_start": [stats.get("window_start")],
                "window_end": [stats.get("window_end")],
                "n_rows": [stats.get("n_rows", 0)],
                "n_points": [stats.get("n_points", 0)],
                "agg_type": [agg_type],
                "vmin": [stats.get("vmin")],
                "vmax": [stats.get("vmax")],
                "lineage": [
                    lineage if isinstance(lineage, str) else json.dumps(lineage)
                ],
                "done": [True],
                "commit_seq": [_time_ns()],
            },
            schema=MANIFEST_SCHEMA,
        )
        mdir = self._manifest_dir(tier)
        os.makedirs(mdir, exist_ok=True)
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex[:8]}.parquet")
        pq.write_table(row, tmp)
        os.rename(tmp, self._manifest_row_path(tier, p))

    def commit_partitions_bulk(
        self,
        tier: str,
        jobs: list,
        *,
        agg_type: str,
        lineage_fn,
    ) -> list[int]:
        """Commit many partitions with ONE manifest file: rename every
        staged dir into place, then write a single run manifest (tmp →
        rename).  A crash between renames and the manifest write leaves
        unmanifested dirs that the next run recomputes idempotently
        (same contract as the per-partition path, amortized I/O).

        jobs: [(partition, staged_dir, stats_dict), ...]
        """
        import time as _time

        seq = _time_ns()
        rows = []
        for p, staged, stats in jobs:
            final = self.partition_dir(tier, p)
            os.makedirs(os.path.dirname(final), exist_ok=True)
            if os.path.isdir(final):
                shutil.rmtree(final)
            os.rename(staged, final)
            stats = dict(stats or {})
            rows.append(
                {
                    "tier": tier,
                    "partition": p,
                    "window_start": stats.get("window_start"),
                    "window_end": stats.get("window_end"),
                    "n_rows": stats.get("n_rows", 0),
                    "n_points": stats.get("n_points", 0),
                    "agg_type": agg_type,
                    "vmin": stats.get("vmin"),
                    "vmax": stats.get("vmax"),
                    "lineage": lineage_fn(p),
                    "done": True,
                    "commit_seq": seq,
                }
            )
        if not rows:
            return []
        mdir = self._manifest_dir(tier)
        os.makedirs(mdir, exist_ok=True)
        name = f"run-{_time.time_ns():020d}-{uuid.uuid4().hex[:6]}.parquet"
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex[:8]}")
        pq.write_table(
            pa.Table.from_pylist(rows, schema=MANIFEST_SCHEMA), tmp
        )
        os.rename(tmp, os.path.join(mdir, name))
        return [r["partition"] for r in rows]

    def unregister_partition(self, tier: str, p: int):
        """`t.unregister` analog: drop one partition's data + manifest
        rows (manifest files are rewritten without the partition)."""
        shutil.rmtree(self.partition_dir(tier, p), ignore_errors=True)
        for f in self._manifest_files(tier):
            t = pq.read_table(f)
            mask = [v != p for v in t.column("partition").to_pylist()]
            if all(mask):
                continue
            kept = t.filter(pa.array(mask))
            tmp = f + f".tmp-{uuid.uuid4().hex[:6]}"
            if kept.num_rows:
                pq.write_table(kept, tmp)
                os.rename(tmp, f)
            else:
                os.remove(f)

    def bulk_partition_stats_all(self, staging_dir: str) -> dict:
        """{(tier, part): stats} for the WHOLE one-pass staging dir in a
        single columnar read (tier and part from the hive paths) — one
        file-discovery + scan instead of one per tier."""
        import pyarrow.dataset as pads

        dsn = pads.dataset(staging_dir, partitioning="hive")
        want = [
            c
            for c in ("tier", "part", "n_points", "wstart", "wend", "vmin", "vmax")
            if c in dsn.schema.names
        ]
        t = dsn.to_table(columns=want)
        if "part" not in t.column_names or "tier" not in t.column_names or t.num_rows == 0:
            return {}
        agg = t.group_by(["tier", "part"]).aggregate(
            [
                ("n_points", "sum"),
                ("part", "count"),
                ("wstart", "min"),
                ("wend", "max"),
                ("vmin", "min"),
                ("vmax", "max"),
            ]
        )
        out = {}
        d = agg.to_pydict()
        for i in range(agg.num_rows):
            out[(str(d["tier"][i]), int(d["part"][i]))] = {
                "n_points": d["n_points_sum"][i] or 0,
                "n_rows": d["part_count"][i],
                "window_start": d["wstart_min"][i],
                "window_end": d["wend_max"][i],
                "vmin": d["vmin_min"][i],
                "vmax": d["vmax_max"][i],
            }
        return out

    def bulk_partition_stats(self, tier_staging_dir: str) -> dict:
        """Per-partition stats for a whole staged tier in ONE columnar
        read (part from hive path + the scalar stat columns) instead of
        per-partition footer walks."""
        import pyarrow.dataset as pads

        dsn = pads.dataset(tier_staging_dir, partitioning="hive")
        want = [
            c
            for c in ("part", "n_points", "wstart", "wend", "vmin", "vmax")
            if c in dsn.schema.names
        ]
        t = dsn.to_table(columns=want)
        if "part" not in t.column_names or t.num_rows == 0:
            return {}
        agg = t.group_by("part").aggregate(
            [
                ("n_points", "sum"),
                ("part", "count"),
                ("wstart", "min"),
                ("wend", "max"),
                ("vmin", "min"),
                ("vmax", "max"),
            ]
        )
        out = {}
        d = agg.to_pydict()
        for i in range(agg.num_rows):
            out[int(d["part"][i])] = {
                "n_points": d["n_points_sum"][i] or 0,
                "n_rows": d["part_count"][i],
                "window_start": d["wstart_min"][i],
                "window_end": d["wend_max"][i],
                "vmin": d["vmin_min"][i],
                "vmax": d["vmax_max"][i],
            }
        return out

    def partition_stats_from_files(self, staged_dir: str) -> dict:
        """Partition stats from Parquet footer statistics — no data scan.

        Reads row counts plus min/max of the scalar stat columns
        (wstart/wend/vmin/vmax) that the tier writer appends per row.
        """
        stats: dict = {"n_rows": 0, "n_points": 0}
        agg = {
            "wstart": ("window_start", min),
            "wend": ("window_end", max),
            "vmin": ("vmin", min),
            "vmax": ("vmax", max),
        }
        for f in _parquet_files(staged_dir):
            md = pq.read_metadata(f)
            stats["n_rows"] += md.num_rows
            schema_names = md.schema.to_arrow_schema().names
            col_idx = {n: i for i, n in enumerate(schema_names)}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for src, (dst, fn) in agg.items():
                    if src in col_idx:
                        st = g.column(col_idx[src]).statistics
                        if st is not None and st.has_min_max:
                            lo = st.min if fn is min else st.max
                            cur = stats.get(dst)
                            stats[dst] = lo if cur is None else fn(cur, lo)
        # n_points needs a (cheap, single-column) scan
        try:
            import pyarrow.dataset as pads

            dsn = pads.dataset(staged_dir)
            if "n_points" in dsn.schema.names:
                import pyarrow.compute as pc

                stats["n_points"] = int(
                    pc.sum(dsn.to_table(columns=["n_points"])["n_points"]).as_py()
                    or 0
                )
        except Exception:
            pass
        return stats

    def clean_staging(self, tier: str):
        td = self.tier_dir(tier)
        if not os.path.isdir(td):
            return
        for d in os.listdir(td):
            if d.startswith(".staging-"):
                shutil.rmtree(os.path.join(td, d), ignore_errors=True)


def _time_ns() -> int:
    import time

    return time.time_ns()


def _parquet_files(d: str) -> list[str]:
    out = []
    for root, _, files in os.walk(d):
        out.extend(
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        )
    return sorted(out)


def _count_rows(d: str) -> int:
    return sum(pq.read_metadata(f).num_rows for f in _parquet_files(d))


def _meta_path(store: "TierStore", tier: str) -> str:
    return os.path.join(store._manifest_dir(tier), "_meta.json")


def set_tier_metadata(store: "TierStore", tier: str, **kv):
    """`t.support` analog: attach/update descriptive metadata for a tier
    (title, description, semantic labels...) — atomic tmp+rename."""
    path = _meta_path(store, tier)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    current = get_tier_metadata(store, tier)
    current.update(kv)
    tmp = path + f".tmp-{uuid.uuid4().hex[:6]}"
    with open(tmp, "w") as f:
        json.dump(current, f)
    os.rename(tmp, path)
    return current


def get_tier_metadata(store: "TierStore", tier: str) -> dict:
    path = _meta_path(store, tier)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


TierStore.set_metadata = set_tier_metadata
TierStore.get_metadata = get_tier_metadata


def copy_tier(store: "TierStore", src: str, dst: str):
    """`t.copy` analog: duplicate a tier's data + manifest under a new
    name (committed partitions only)."""
    if os.path.isdir(store.tier_dir(dst)) or store.committed_partitions(dst):
        raise ValueError(f"tier {dst!r} already exists")
    shutil.copytree(store.tier_dir(src), store.tier_dir(dst))
    # drop any staging leftovers from the copy
    for d in os.listdir(store.tier_dir(dst)):
        if d.startswith(".staging"):
            shutil.rmtree(os.path.join(store.tier_dir(dst), d), ignore_errors=True)
    os.makedirs(store._manifest_dir(dst), exist_ok=True)
    for f in store._manifest_files(src):
        t = pq.read_table(f)
        import pyarrow.compute as pc_

        t = t.set_column(
            t.column_names.index("tier"),
            "tier",
            pa.array([dst] * t.num_rows),
        )
        pq.write_table(t, os.path.join(store._manifest_dir(dst), os.path.basename(f)))
    return sorted(store.committed_partitions(dst))


TierStore.copy_tier = copy_tier
