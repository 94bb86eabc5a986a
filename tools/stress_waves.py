"""Billion-token stress drive for the wave-checkpointed tier builder.

Stages a 1M-doc x 1440-token corpus (1.44B tokens) as parquet under
/tmp (reused across runs), then runs ``build_tiers_waves`` over it and
reports throughput + per-tier totals from the manifests.

    python tools/stress_waves.py [--docs 1000000] [--kill-test]

``--kill-test``: launches the build in a subprocess, SIGKILLs it
mid-run, re-runs to completion, and verifies the resumed totals match a
fresh uninterrupted build — the north-rule resumability evidence.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--kill-test", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--_child-build", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._child_build:
        res = run_build(args._child_build, args.docs)
        print(json.dumps(res))
        return

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
