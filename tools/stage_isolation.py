"""Stage-isolation evidence for the 8→32 single-box scaling plateau.

Times three nested slices of the headline build in a fresh Ray session
at a given num_cpus (run once per level in separate processes):

  read    — parquet decode only (forced via a row-count map)
  rollup  — read + the windowed-reduce kernel (nested tier, no codec)
  build   — the full one-pass tier build (rollup + cascade + Gorilla
            encode + partitioned write + manifests)

Plus one NON-memory-bound control slice when the 1M-doc stress corpus
is staged (tools/stress_curation.py stages it):

  textq   — the vectorized text-analysis kernel (quality + repetition
            features) over 1M documents: compute-dominated (codepoint
            classification, span hashing, per-doc reductions), tiny
            output, no shuffle.  If THIS slice scales ~linearly 8→32
            while read/build plateau, the plateau is DRAM bandwidth on
            the memory-bound tiers path, not a box- or Ray-level
            serialization — the isolation argument made direct.

Usage:  python tools/stage_isolation.py            # runs 8 and 32
        python tools/stage_isolation.py --cpus 8   # one level (child)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CORPUS = "/tmp/grassray_bench_corpus_300000x1440"
DOCS = "/tmp/grassray_stress_docs_1000000"


def run_level(ncpu: int) -> dict:
    import ray

    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa
    import ray.data

    from grass_ray.sources.readers import read_parquet_sized
    from grass_ray.stages.rollup import rollup

    out = {}

    def timed(name, fn, repeats=2):
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)

    def consume(ds):
        """Near-zero sink that keeps the plan shape of the real build:
        a 1-row-per-batch map FUSES into the upstream chain (unlike an
        Aggregate tail, whose all-to-all barrier was measured to add
        MORE wall time than actually writing the output), and the
        parquet write of ~one row per block costs nothing."""
        import shutil

        sink = f"/tmp/grassray_iso_sink_{ncpu}"
        shutil.rmtree(sink, ignore_errors=True)
        ds.map_batches(
            lambda b: pa.table({"n": [b.num_rows]}),
            batch_format="pyarrow",
            batch_size=None,
        ).write_parquet(sink)
        shutil.rmtree(sink, ignore_errors=True)

    def read_only():
        consume(read_parquet_sized(CORPUS))

    def rollup_only():
        consume(
            rollup(
                ds := read_parquet_sized(CORPUS),
                60,
                ("count", "sum", "minimum", "maximum", "average"),
                nested=True,
            )
        )

    def encode_only():
        from grass_ray.pipelines.tiers import (
            assign_partition_range,
            onepass_kernel,
        )

        ds = assign_partition_range(read_parquet_sized(CORPUS), 2500)
        kern = onepass_kernel(
            (("1m", 60), ("1h", 60), ("1d", 24)),
            ("count", "sum", "minimum", "maximum", "average"),
        )
        consume(ds.map_batches(kern, batch_format="pyarrow", batch_size=512))

    def full_build():
        import shutil

        from grass_ray.pipelines.tiers import build_tiers_onepass

        dst = f"/tmp/grassray_iso_{ncpu}"
        shutil.rmtree(dst, ignore_errors=True)
        ds = read_parquet_sized(CORPUS)
        build_tiers_onepass(ds, dst, partitioning="range", docs_per_partition=2500)
        shutil.rmtree(dst, ignore_errors=True)

    def textq_only():
        from grass_ray.stages.text_stage import analyze_text

        ds = read_parquet_sized(DOCS, columns=["doc_id", "text"])
        consume(analyze_text(ds, features=("quality", "repetition")))

    timed("read", read_only)
    timed("rollup", rollup_only)
    timed("encode", encode_only)
    timed("build", full_build)
    if os.path.isdir(DOCS):
        timed("textq", textq_only)
    ray.shutdown()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()
    if args.cpus:
        print(json.dumps({"cpus": args.cpus, **run_level(args.cpus)}))
        return
    if not os.path.isdir(CORPUS):
        print("stage the bench corpus first (run bench.py once)", file=sys.stderr)
        sys.exit(1)
    res = {}
    for n in (8, 32):
        o = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpus", str(n)],
            capture_output=True, text=True, check=True, cwd="/root/repo",
        ).stdout
        res[n] = json.loads(o.strip().splitlines()[-1])
    summary = {
        "read_speedup_8_32": round(res[8]["read"] / res[32]["read"], 2),
        "rollup_speedup_8_32": round(res[8]["rollup"] / res[32]["rollup"], 2),
        "encode_speedup_8_32": round(res[8]["encode"] / res[32]["encode"], 2),
        "build_speedup_8_32": round(res[8]["build"] / res[32]["build"], 2),
        # the write tail = full build minus the fused compute slice
        "write_tail_8": round(res[8]["build"] - res[8]["encode"], 3),
        "write_tail_32": round(res[32]["build"] - res[32]["encode"], 3),
        "levels": res,
    }
    if "textq" in res[8]:
        summary["textq_speedup_8_32"] = round(
            res[8]["textq"] / res[32]["textq"], 2
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
