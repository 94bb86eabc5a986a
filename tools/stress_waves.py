"""Billion-token stress drive for the wave-checkpointed tier builder.

Stages a 1M-doc x 1440-token corpus (1.44B tokens) as parquet under
/tmp (reused across runs), then runs ``build_tiers_waves`` over it and
reports throughput + per-tier totals from the manifests.

    python tools/stress_waves.py [--docs 1000000] [--kill-test]

``--kill-test``: launches the build in a subprocess, SIGKILLs it
mid-run, re-runs to completion, and verifies the resumed totals match a
fresh uninterrupted build — the north-rule resumability evidence.

``--kill-compact``: builds, fragments every partition dir into two
files, launches ``compact_tier`` in a subprocess and SIGKILLs it inside
the per-partition commit/swap window (polling the manifest for the
first ``op: compact`` lineage row), then finishes compaction in-process
and verifies (a) every partition dir is back to one file, (b) the
decoded 1m points hash bit-identically to the pre-fragment decode, and
(c) per-tier manifest totals are unchanged — the maintenance-op
counterpart of the build kill test (use a smaller --docs, e.g. 200000).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

N_TOK = 1440
DOCS_PER_PARTITION = 5000
PARTITIONS_PER_WAVE = 50


def corpus_dir(n_docs: int) -> str:
    return f"/tmp/grassray_stress_corpus_{n_docs}x{N_TOK}"


def stage_corpus(n_docs: int) -> str:
    path = corpus_dir(n_docs)
    if os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return path
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from grass_ray.sources.corpus import synth_corpus

    t0 = time.time()
    synth_corpus(n_docs, n_tok=N_TOK, docs_per_block=5000).write_parquet(path)
    print(f"staged corpus {n_docs} docs in {time.time() - t0:.1f}s -> {path}")
    return path


def run_build(out_root: str, n_docs: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from grass_ray.pipelines.tiers import build_tiers_waves
    from grass_ray.state.manifest import TierStore

    src = corpus_dir(n_docs)
    t0 = time.time()
    build_tiers_waves(
        src,
        out_root,
        docs_per_partition=DOCS_PER_PARTITION,
        partitions_per_wave=PARTITIONS_PER_WAVE,
    )
    dt = time.time() - t0
    store = TierStore(out_root)
    info = {t: store.info(t) for t in store.tiers()}
    tokens = n_docs * N_TOK
    return {
        "sec": round(dt, 2),
        "tokens": tokens,
        "tokens_per_sec": round(tokens / dt),
        "tiers": {
            t: {"partitions": i["partitions"], "n_points": i["n_points"]}
            for t, i in info.items()
        },
    }


def _fragment_tiers(out_root: str, pieces: int = 2) -> int:
    """Split every committed partition's single parquet file into
    ``pieces`` files — the layout incremental registers leave behind."""
    import pyarrow.parquet as pq

    from grass_ray.state.manifest import TierStore, _parquet_files

    store = TierStore(out_root)
    n = 0
    for tier in store.tiers():
        for p in sorted(store.committed_partitions(tier)):
            d = store.partition_dir(tier, p)
            files = _parquet_files(d)
            if len(files) > 1:
                n += 1  # multi-block staged write: already fragmented
                continue
            if not files:
                continue
            t = pq.read_table(files[0])
            step = max(1, t.num_rows // pieces)
            for i in range(pieces):
                lo = i * step
                hi = t.num_rows if i == pieces - 1 else (i + 1) * step
                if lo >= t.num_rows:
                    break
                pq.write_table(t.slice(lo, hi - lo), os.path.join(d, f"frag_{i}.parquet"))
            os.remove(files[0])
            n += 1
    return n


def _decode_hash_1m(out_root: str) -> str:
    """Order-insensitive sha256 of the decoded 1m tier points."""
    import hashlib

    import numpy as np

    from grass_ray.pipelines.tiers import read_tier
    from grass_ray.stages.cascade import explode_nested
    from grass_ray.state.manifest import TierStore

    store = TierStore(out_root)
    pts = explode_nested(read_tier(store, "1m"), value_cols=("sum", "count"))
    df = pts.to_pandas().sort_values(["source", "doc_id", "window"]).reset_index(drop=True)
    h = hashlib.sha256()
    for c in ("source", "doc_id", "window", "sum", "count"):
        if df[c].dtype == object:
            h.update("\x00".join(map(str, df[c].tolist())).encode())
        else:
            h.update(np.ascontiguousarray(df[c].to_numpy()).tobytes())
    return h.hexdigest()[:16]


def _tier_totals(out_root: str) -> dict:
    from grass_ray.state.manifest import TierStore

    store = TierStore(out_root)
    return {
        t: {"partitions": store.info(t)["partitions"], "n_points": store.info(t)["n_points"]}
        for t in store.tiers()
    }


def _compact_all(out_root: str) -> dict:
    from grass_ray.pipelines.retention import compact_tier
    from grass_ray.state.manifest import TierStore

    store = TierStore(out_root)
    return {t: len(compact_tier(store, t)) for t in store.tiers()}


def _first_compact_seen(out_root: str, tier: str = "1m") -> bool:
    """True once the tier manifest holds at least one op:compact lineage
    row (read races with the child's manifest rewrite — treat errors as
    'not yet')."""
    try:
        from grass_ray.state.manifest import TierStore

        m = TierStore(out_root).manifest(tier).to_pydict()
        return any("compact" in (ln or "") for ln in m.get("lineage", []))
    except Exception:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--kill-test", action="store_true")
    ap.add_argument("--kill-compact", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--_child-build", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--_child-compact", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._child_build:
        res = run_build(args._child_build, args.docs)
        print(json.dumps(res))
        return

    if args._child_compact:
        import ray

        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
        print(json.dumps({"compacted": _compact_all(args._child_compact)}))
        return

    if args.kill_compact:
        import shutil

        import ray

        stage_corpus(args.docs)
        out = args.out or f"/tmp/grassray_stress_compact_{args.docs}"
        shutil.rmtree(out, ignore_errors=True)
        res = run_build(out, args.docs)
        print(json.dumps({"mode": "build", **res}))
        n_frag = _fragment_tiers(out)
        pre_hash = _decode_hash_1m(out)
        pre_totals = _tier_totals(out)
        print(json.dumps({"fragmented_partitions": n_frag, "pre_hash": pre_hash}))
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--docs", str(args.docs),
             "--_child-compact", out],
            cwd="/root/repo",
        )
        t0 = time.time()
        mid_flight = False
        while time.time() - t0 < 120 and child.poll() is None:
            if _first_compact_seen(out):
                mid_flight = True
                break
            time.sleep(0.1)
        os.kill(child.pid, signal.SIGKILL)
        child.wait()
        print(json.dumps({"killed_mid_flight": mid_flight}))
        _compact_all(out)  # recover interrupted swaps + finish
        from grass_ray.state.manifest import TierStore, _parquet_files

        store = TierStore(out)
        still_frag = [
            (t, p)
            for t in store.tiers()
            for p in sorted(store.committed_partitions(t))
            if len(_parquet_files(store.partition_dir(t, p))) != 1
        ]
        post_hash = _decode_hash_1m(out)
        post_totals = _tier_totals(out)
        ok = (
            not still_frag
            and post_hash == pre_hash
            and post_totals == pre_totals
        )
        print(json.dumps({
            "kill_compact_decode_match": ok,
            "still_fragmented": len(still_frag),
            "post_hash": post_hash,
            "totals_match": post_totals == pre_totals,
        }))
        ray.shutdown()
        sys.exit(0 if ok else 1)

    stage_corpus(args.docs)
    out = args.out or f"/tmp/grassray_stress_tiers_{args.docs}"
    import shutil

    if not args.kill_test:
        shutil.rmtree(out, ignore_errors=True)
        res = run_build(out, args.docs)
        print(json.dumps({"mode": "clean", **res}))
        return

    # kill test: start a child build, SIGKILL it mid-run, re-run, then
    # compare totals with a fresh clean build
    shutil.rmtree(out, ignore_errors=True)
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--docs", str(args.docs),
         "--_child-build", out],
        cwd="/root/repo",
    )
    time.sleep(25)  # mid-run: some waves committed, one in flight
    os.kill(child.pid, signal.SIGKILL)
    child.wait()
    print("killed child mid-build; resuming…")
    t0 = time.time()
    resumed = run_build(out, args.docs)
    print(json.dumps({"mode": "resumed", "resume_sec": round(time.time() - t0, 2), **resumed}))
    clean_out = out + "_clean"
    shutil.rmtree(clean_out, ignore_errors=True)
    clean = run_build(clean_out, args.docs)
    match = resumed["tiers"] == clean["tiers"]
    print(json.dumps({"mode": "clean_reference", **clean}))
    print(json.dumps({"kill_resume_totals_match": match}))
    shutil.rmtree(clean_out, ignore_errors=True)
    sys.exit(0 if match else 1)


if __name__ == "__main__":
    main()
