"""Million-doc stress drive for the curation/dedup family.

The tier build has 1.44 B-token kill-tested evidence
(``stress_waves.py``); this sibling gives the dedup/curation operators
the same treatment: a ≥1 M-doc synthetic corpus with a PLANTED,
exactly-countable duplicate structure, driven end-to-end at 32 cpus
with wall-time, docs/s, peak cluster RSS and exchange-size reporting.

    python tools/stress_curation.py [--docs 1000000] [--jobs minhash,components,curate]

Planted structure (deterministic, batch-stateless): for every decade of
doc ids ``10d..10d+9``,

* ``10d+8`` is an EXACT duplicate of ``10d+5`` (Jaccard 1.0),
* ``10d+9`` is a NEAR duplicate of ``10d+5`` (one appended word →
  word-5-gram Jaccard S/(S+1) ≥ 0.973 for S ≥ 36 shingles),
* everything else is unique.

So the ground truth is exact: one 3-node duplicate component per
decade, 3 verified pairs per decade ((5,8) (5,9) (8,9) — the two
copies also match each other), and BOTH the 1-hop and the
connected-components keep rule retain exactly ``0.8 * n_docs`` docs.
A run that deviates from those counts fails loudly.

Mirrors the reference's scaling-benchmark ethos
(``python/grass/benchmark/runners.py:71-141``): same job, measured
wall time, machine-readable result rows.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa

POOL_SIZE = 2000
WORD_POOL = np.array(
    ["the", "a", "of", "to", "and", "in", "that", "is", "for", "on"]
    + [f"w{j:04d}" for j in range(POOL_SIZE - 10)],
    dtype=object,
)
_MIX = np.uint64(0x9E3779B97F4A7C15)
_MUL1 = np.uint64(0xBF58476D1CE4E5B9)
_MUL2 = np.uint64(0x94D049BB133111EB)


def _splitmix(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + _MIX
        z = (z ^ (z >> np.uint64(30))) * _MUL1
        z = (z ^ (z >> np.uint64(27))) * _MUL2
        return z ^ (z >> np.uint64(31))


def docs_batch(batch: pa.Table) -> pa.Table:
    """Deterministic document synthesis for a block of doc ids.

    Stateless per id: the text of id ``i`` is a pure function of ``i``,
    so planted duplicates (cross-id references) never cross a batch
    boundary dependency — the base text is re-derived in place.
    """
    ids = batch.column("id").to_numpy().astype(np.int64)
    mod = ids % 10
    base = np.where(mod == 8, ids - 3, np.where(mod == 9, ids - 4, ids))
    n_words = 40 + (base * 13) % 41  # 40..80 words, a fn of the BASE id
    total = int(n_words.sum())
    row_of = np.repeat(np.arange(len(ids)), n_words)
    starts = np.zeros(len(ids), dtype=np.int64)
    np.cumsum(n_words[:-1], out=starts[1:])
    pos = np.arange(total, dtype=np.int64) - starts[row_of]
    seed = _splitmix(base)[row_of]
    with np.errstate(over="ignore"):
        widx = (_splitmix(seed + pos.astype(np.uint64) * _MIX) % np.uint64(
            POOL_SIZE
        )).astype(np.int64)
    words = WORD_POOL[widx]
    bounds = np.concatenate([starts, [total]])
    texts = []
    for r, i in enumerate(ids):
        t = " ".join(words[bounds[r] : bounds[r + 1]])
        if i % 10 == 9:  # near dup: ONE appended word -> J = S/(S+1)
            t = t + f" nd{i}"
        texts.append(t)
    text_arr = pa.array(texts, type=pa.string())
    import pyarrow.compute as pc

    return pa.table(
        {
            "doc_id": pa.array(ids),
            "text": text_arr,
            "lang": pa.array(np.where(ids % 23 == 0, "de", "en")),
            "source": pa.array([f"src{int(i) % 7}" for i in ids]),
            "n_chars": pc.cast(pc.utf8_length(text_arr), pa.int64()),
        }
    )


def corpus_dir(n_docs: int) -> str:
    return f"/tmp/grassray_stress_docs_{n_docs}"


def stage_docs(n_docs: int) -> str:
    path = corpus_dir(n_docs)
    if os.path.isdir(path) and glob.glob(os.path.join(path, "*.parquet")):
        return path
    import ray

    t0 = time.time()
    (
        ray.data.range(n_docs, override_num_blocks=max(8, n_docs // 25_000))
        .map_batches(docs_batch, batch_format="pyarrow")
        .write_parquet(path)
    )
    print(f"staged {n_docs} docs in {time.time() - t0:.1f}s -> {path}")
    return path


class RssPoller:
    """Samples the total RSS of every live process (the whole Ray
    cluster lives on this box) twice a second; reports the peak."""

    def __init__(self):
        self.peak = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    @staticmethod
    def _total_rss() -> int:
        total = 0
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/statm", "rb") as f:
                    total += int(f.read().split()[1])
            except OSError:
                continue
        return total * os.sysconf("SC_PAGE_SIZE")

    def _run(self):
        while not self._stop.wait(0.5):
            self.peak = max(self.peak, self._total_rss())

    def __enter__(self):
        self.peak = self._total_rss()
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=2)


def _check(label: str, got: int, want: int):
    status = "OK" if got == want else "FAIL"
    print(f"  [{status}] {label}: got {got} want {want}")
    if got != want:
        raise SystemExit(f"{label} mismatch: got {got} want {want}")


def run_minhash(src: str, n_docs: int, components: bool) -> dict:
    import ray

    from grass_ray.stages.dedup import minhash_dedup

    ds = ray.data.read_parquet(src)
    name = "minhash_components" if components else "minhash_dedup"
    with RssPoller() as rss:
        t0 = time.time()
        kept, pairs = minhash_dedup(
            ds, threshold=0.8, id_col="doc_id", text_col="text",
            components=components,
        )
        n_kept = kept.count()
        n_pairs = pairs.count()
        wall = time.time() - t0
    decades = n_docs // 10
    _check(f"{name} kept", n_kept, n_docs - 2 * decades)
    _check(f"{name} verified pairs", n_pairs, 3 * decades)
    res = {
        "job": name,
        "docs": n_docs,
        "wall_s": round(wall, 2),
        "docs_per_s": round(n_docs / wall),
        "verified_pairs": n_pairs,
        "kept": n_kept,
        "band_rows": n_docs * 16,
        "peak_rss_gib": round(rss.peak / 2**30, 1),
    }
    print(json.dumps(res))
    return res


def run_exchange_audit(src: str, n_docs: int) -> dict:
    """Counts the dominant exchange of the dedup family — the LSH
    candidate-pair stream — so BASELINE can state measured (not
    analytic) exchange sizes."""
    import ray

    from grass_ray.stages.dedup import minhash_candidates

    ds = ray.data.read_parquet(src)
    with RssPoller() as rss:
        t0 = time.time()
        n_cand = minhash_candidates(
            ds, id_col="doc_id", text_col="text"
        ).count()
        wall = time.time() - t0
    res = {
        "job": "candidate_audit",
        "docs": n_docs,
        "wall_s": round(wall, 2),
        "candidate_pairs": n_cand,
        "band_rows": n_docs * 16,
        "peak_rss_gib": round(rss.peak / 2**30, 1),
    }
    print(json.dumps(res))
    return res


def run_curate(src: str, n_docs: int) -> dict:
    import ray

    from grass_ray.stages.curate import curate_v2

    ds = ray.data.read_parquet(src)
    with RssPoller() as rss:
        t0 = time.time()
        out = curate_v2(
            ds,
            mix_rates={"src0": 0.5},
            min_logprob=-9.0,
            split_fractions={"train": 0.9, "val": 0.05, "test": 0.05},
            tokenizer="rank",
        )
        n_out = out.count()
        wall = time.time() - t0
    res = {
        "job": "curate_v2",
        "docs": n_docs,
        "wall_s": round(wall, 2),
        "docs_per_s": round(n_docs / wall),
        "rows_out": n_out,
        "peak_rss_gib": round(rss.peak / 2**30, 1),
    }
    print(json.dumps(res))
    return res


def run_textops(src: str, n_docs: int) -> dict:
    """Late-r5 text-analysis ops at 1M docs: the Gopher composite
    filter (zero-shuffle map), the per-source vocab-coverage report
    (top-k broadcast + one narrow exchange), and the cross-source
    k-gram overlap matrix (distinct exchange + pair explosion over 7
    sources).  The corpus' cross-source gram sharing is PLANTED, not
    organic: texts are pseudorandom over a huge word space, so shared
    5-grams come only from the per-decade dup structure (base at
    10k+5, its exact dup at 10k+8, its near dup at 10k+9; source =
    id % 7 → pair distances {3, 4, 1} ≡ unordered {1, 3} mod 7) — as
    the decade base cycles mod 7 that yields exactly the 14 unordered
    source pairs at cyclic distance 1 or 3, an exact structural
    prediction the run asserts."""
    import ray

    from grass_ray.stages.curate import gopher_filter
    from grass_ray.stages.vocab import ngram_source_overlap, vocab_coverage

    ds = ray.data.read_parquet(src)
    res = {"job": "textops", "docs": n_docs}
    with RssPoller() as rss:
        t0 = time.time()
        n_gopher = gopher_filter(ds).count()
        t1 = time.time()
        cov = vocab_coverage(ds, 50_000).to_pandas()
        t2 = time.time()
        ov = ngram_source_overlap(ds).to_pandas()
        t3 = time.time()
    _check("gopher rows (one per doc)", n_gopher, n_docs)
    _check("coverage rows (one per source)", len(cov), 7)
    want_pairs = {
        tuple(sorted((f"src{a}", f"src{(a + d) % 7}")))
        for a in range(7)
        for d in (1, 3)
    }
    got_pairs = set(zip(ov["source_a"], ov["source_b"]))
    _check("overlap pairs (planted distance-1/3 set)", len(got_pairs ^ want_pairs), 0)
    assert (ov["jaccard"] > 0).all() and (ov["jaccard"] <= 1.0).all()
    res.update(
        {
            "gopher_s": round(t1 - t0, 2),
            "gopher_docs_per_s": round(n_docs / (t1 - t0)),
            "coverage_s": round(t2 - t1, 2),
            "overlap_s": round(t3 - t2, 2),
            "overlap_docs_per_s": round(n_docs / (t3 - t2)),
            "overlap_pairs": len(ov),
            "min_pair_jaccard": round(float(ov["jaccard"].min()), 5),
            "peak_rss_gib": round(rss.peak / 2**30, 1),
        }
    )
    print(json.dumps(res))
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument(
        "--jobs", default="minhash,components,audit,curate,textops",
        help="comma list: minhash,components,audit,curate,textops",
    )
    args = ap.parse_args()

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

    src = stage_docs(args.docs)
    jobs = set(args.jobs.split(","))
    results = []
    if "minhash" in jobs:
        results.append(run_minhash(src, args.docs, components=False))
    if "components" in jobs:
        results.append(run_minhash(src, args.docs, components=True))
    if "audit" in jobs:
        results.append(run_exchange_audit(src, args.docs))
    if "curate" in jobs:
        results.append(run_curate(src, args.docs))
    if "textops" in jobs:
        results.append(run_textops(src, args.docs))
    print("== summary ==")
    for r in results:
        print(json.dumps(r))
    ray.shutdown()


if __name__ == "__main__":
    main()
