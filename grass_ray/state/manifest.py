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
        _swap_in(final, staged_dir)
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
            _swap_in(final, staged)
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
        """{(tier, part): stats} for the WHOLE one-pass staging dir from
        Parquet FOOTER statistics (tier and part come from the hive
        paths) — the only data touched is the single ``n_points`` column
        per file; wstart/wend/vmin/vmax min/max and the row count come
        from row-group metadata.  Per-file partials run serially on the
        driver and fan out as Ray tasks above
        ``_FOOTER_STATS_RAY_THRESHOLD`` files, so the commit step stays
        O(files/parallelism), never O(output rows), on the driver."""
        files_keys = []
        for f in _parquet_files(staging_dir):
            tier, part = _hive_tier_part(os.path.relpath(f, staging_dir))
            if tier is None or part is None:
                continue
            files_keys.append((f, (tier, part)))
        return {
            k: _partial_to_stats(v)
            for k, v in _footer_stats_by_key(files_keys).items()
        }

    def partition_stats_from_files(self, staged_dir: str) -> dict:
        """Partition stats from Parquet footer statistics — no data scan
        beyond the n_points column, and not even that when every row
        group's n_points is uniform (see :func:`_file_footer_partial`)."""
        acc: dict = {}
        for f in _parquet_files(staged_dir):
            _fold_partial(acc, 0, _file_footer_partial(f))
        return _partial_to_stats(acc.get(0, [0, 0, None, None, None, None]))

    def clean_staging(self, tier: str):
        """Sweep in-flight staging dirs AND finish any interrupted
        partition swaps (see :func:`_swap_in`): a ``.old-part=N-*`` dir
        whose final partition dir is missing is the old data from a
        crash between the two swap renames — restore it; if the final
        dir exists the swap completed and the old copy is garbage."""
        td = self.tier_dir(tier)
        if not os.path.isdir(td):
            return
        for d in os.listdir(td):
            if d.startswith(".staging-"):
                shutil.rmtree(os.path.join(td, d), ignore_errors=True)
        self.recover_swaps(tier)

    def recover_swaps(self, tier: str):
        """Finish interrupted partition swaps without touching staging
        (safe to call before reading a tier that might have crashed
        mid-commit)."""
        td = self.tier_dir(tier)
        if not os.path.isdir(td):
            return
        for d in os.listdir(td):
            if d.startswith(".old-part="):
                old = os.path.join(td, d)
                final = os.path.join(td, d[len(".old-") :].rsplit("-", 1)[0])
                if os.path.isdir(final):
                    shutil.rmtree(old, ignore_errors=True)
                else:
                    os.rename(old, final)


def _time_ns() -> int:
    import time

    return time.time_ns()


def _swap_in(final: str, staged: str):
    """Replace ``final`` with ``staged`` without a data-loss window.

    The naive rmtree-then-rename leaves NO copy of the data if the
    process dies between the two steps — fatal when replacing a
    COMMITTED partition (late-data re-register, compaction): the
    manifest row would survive pointing at nothing and resume would
    skip the rebuild.  Instead rename the old dir aside (dot-prefixed,
    so hive discovery and readers never see it), rename the staged dir
    in, then delete the old copy.  A crash between the renames leaves
    the old data recoverable — :meth:`TierStore.recover_swaps` /
    ``clean_staging`` restore or garbage-collect ``.old-*`` dirs.
    """
    old = None
    if os.path.isdir(final):
        parent, name = os.path.split(final)
        old = os.path.join(
            parent, f".old-{name}-{uuid.uuid4().hex[:6]}"
        )
        os.rename(final, old)
    os.rename(staged, final)
    if old is not None:
        shutil.rmtree(old, ignore_errors=True)


def _parquet_files(d: str) -> list[str]:
    out = []
    for root, _, files in os.walk(d):
        out.extend(
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        )
    return sorted(out)


# ---- footer-statistics partition stats --------------------------------
# The tier writer appends scalar wstart/wend/vmin/vmax per row exactly so
# partition stats can come from row-group metadata instead of a data
# scan (the vmin/vmax columns are NULL-masked, never NaN, so Parquet
# min/max statistics are exact for them).  Only the n_points SUM needs
# bytes from the file body, and that is one narrow column.

_STAT_COLS = (("wstart", "min"), ("wend", "max"), ("vmin", "min"), ("vmax", "max"))
_FOOTER_STATS_RAY_THRESHOLD = 1024  # files; below this, a serial walk wins


def _file_footer_partial(path: str) -> tuple:
    """(n_rows, n_points_sum, wstart_min, wend_max, vmin_min, vmax_max)
    for ONE staged file.  Footer-only except the n_points sum; a column
    whose statistics are missing for a row group that has non-null
    values falls back to reading just that column."""
    md = pq.read_metadata(path)
    idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
    out = {"wstart": None, "wend": None, "vmin": None, "vmax": None}
    cols = [(name, mode, idx[name]) for name, mode in _STAT_COLS if name in idx]
    bad: set = set()
    j_np = idx.get("n_points")
    npoints = 0
    np_ok = j_np is not None
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for name, mode, j in cols:
            if name in bad:
                continue
            st = g.column(j).statistics
            if st is None:
                bad.add(name)
            elif st.has_min_max:
                v = st.min if mode == "min" else st.max
                cur = out[name]
                if cur is None:
                    out[name] = v
                else:
                    out[name] = min(cur, v) if mode == "min" else max(cur, v)
            elif not (st.has_null_count and st.null_count == g.num_rows):
                bad.add(name)  # stats absent but data present: must read
        if np_ok:
            # uniform-windows shortcut: min==max and no nulls means the
            # column sum is num_rows * value — no data read needed
            st = g.column(j_np).statistics
            if (
                st is not None
                and st.has_min_max
                and st.min == st.max
                and st.has_null_count
                and st.null_count == 0
            ):
                npoints += g.num_rows * st.min
            else:
                np_ok = False
    read_cols = sorted(bad)
    if j_np is not None and not np_ok:
        read_cols.append("n_points")
    if read_cols:
        import pyarrow.compute as pc

        t = pq.ParquetFile(path).read(columns=read_cols, use_threads=False)
        if "n_points" in read_cols:
            npoints = int(pc.sum(t.column("n_points")).as_py() or 0)
        modes = dict(_STAT_COLS)
        for name in bad:
            fn = pc.min if modes[name] == "min" else pc.max
            out[name] = fn(t.column(name)).as_py()
    return (md.num_rows, npoints, out["wstart"], out["wend"], out["vmin"], out["vmax"])


def _fold_partial(acc: dict, key, p: tuple):
    a = acc.get(key)
    if a is None:
        acc[key] = list(p)
        return
    a[0] += p[0]
    a[1] += p[1]
    for i, mode in ((2, min), (3, max), (4, min), (5, max)):
        if p[i] is not None:
            a[i] = p[i] if a[i] is None else mode(a[i], p[i])


def _partial_to_stats(a) -> dict:
    return {
        "n_points": a[1],
        "n_rows": a[0],
        "window_start": a[2],
        "window_end": a[3],
        "vmin": a[4],
        "vmax": a[5],
    }


def _footer_stats_chunk(files_keys: list) -> dict:
    """Fold footer partials for a chunk of (path, key) pairs — the body
    of both the thread-pool and the Ray-task fan-out."""
    acc: dict = {}
    for f, key in files_keys:
        _fold_partial(acc, tuple(key), _file_footer_partial(f))
    return acc


def _footer_stats_by_key(files_keys: list) -> dict:
    """{key: partial} over many staged files.  Footer parsing is
    GIL-bound Python (~0.3 ms/file; measured: a thread pool is SLOWER
    than serial), so run serially on the driver below the threshold and
    fan out as Ray tasks above it so a 100-TB staging dir never
    serializes on the driver."""
    if not files_keys:
        return {}
    if len(files_keys) >= _FOOTER_STATS_RAY_THRESHOLD:
        try:
            import ray

            if ray.is_initialized():
                fn = ray.remote(num_cpus=1)(_footer_stats_chunk)
                chunk = 256
                refs = [
                    fn.remote(files_keys[i : i + chunk])
                    for i in range(0, len(files_keys), chunk)
                ]
                acc: dict = {}
                for d in ray.get(refs):
                    for k, p in d.items():
                        _fold_partial(acc, k, p)
                return acc
        except Exception:
            pass  # fall through to the serial walk
    return _footer_stats_chunk(files_keys)


def _hive_tier_part(relpath: str):
    """(tier, part) parsed from hive path segments; None when absent."""
    tier = None
    part = None
    for seg in relpath.split(os.sep):
        if seg.startswith("tier="):
            tier = seg[5:]
        elif seg.startswith("part="):
            try:
                part = int(seg[5:])
            except ValueError:
                part = None
    return tier, part


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
