"""Benchmark harness — headline tier-cascade build + per-query timings.

Prints ONE JSON line:
    {"metric": "tier_cascade_build", "value": <sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "tokens_per_sec": ..., "sequences_per_sec": ..., "tiers": {...}}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS
(default 32), GRAFT_BENCH_DOCS (corpus size override).

``--scaling``: runs the same bench in two fresh processes at
num_cpus=8 and 32 and reports throughput at both plus scaling
efficiency T8/(4*T32-normalized) — the sandbox stand-in for N vs 4N
nodes (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "20000"))
N_TOK = 1440  # one "day" of minutes per doc (FIXTURES F5)


def run_bench() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from grass_ray.pipelines.tiers import build_tiers
    from grass_ray.sources.corpus import corpus_from_documents, synth_corpus
    from grass_ray.state.manifest import TierStore

    timings: dict[str, float] = {}

    # ---- headline: skewed corpus -> 1m -> 1h -> 1d encoded tiers ------
    root = "/tmp/grassray_bench_tiers"
    shutil.rmtree(root, ignore_errors=True)
    corpus = synth_corpus(N_DOCS, n_tok=N_TOK, skew=0.3, docs_per_block=N_DOCS // (NUM_CPUS * 2) or N_DOCS)
    # warm: materialize generator output once so the timed run measures
    # rollup/cascade/codec, not synthesis; also warms the page cache
    corpus = corpus.materialize()
    t0 = time.perf_counter()
    build_tiers(corpus, root, num_partitions=max(32, NUM_CPUS * 2), resume=False)
    headline = time.perf_counter() - t0
    timings["tier_cascade_build"] = headline
    store = TierStore(root)
    tiers_info = {t: store.info(t)["n_points"] for t in store.tiers()}

    total_tokens = N_DOCS * N_TOK
    tokens_per_sec = total_tokens / headline
    seqs_per_sec = N_DOCS / headline

    # ---- per-query timings over the sf dir ----------------------------
    import __ray_entry__ as E

    qs = E.queries()
    bench_queries = [
        "rollup_1m",
        "rollup_1h",
        "cascade_1h",
        "series_stats",
        "series_holistic",
        "univar",
        "events_1h",
        "gapfill_linear",
        "accumulate_running",
        "dedup_exact",
        "minhash_dedup",
        "ann_topk",
        "langid_quality",
    ]
    for name in bench_queries:
        t0 = time.perf_counter()
        qs[name](SF_DIR)
        timings[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "tier_cascade_build",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: v for k, v in timings.items() if k != "tier_cascade_build"},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_docs": N_DOCS,
        "bench_tokens": total_tokens,
        "tokens_per_sec": round(tokens_per_sec),
        "sequences_per_sec": round(seqs_per_sec),
        "tier_points": tiers_info,
    }


def run_scaling():
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "sec_8": t_lo,
                "sec_32": t_hi,
                "tokens_per_sec_8": r_lo["tokens_per_sec"],
                "tokens_per_sec_32": r_hi["tokens_per_sec"],
                "sequences_per_sec_8": r_lo["sequences_per_sec"],
                "sequences_per_sec_32": r_hi["sequences_per_sec"],
                "num_cpus": [lo, hi],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
