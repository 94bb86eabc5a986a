"""Round-2 extension operators: per-group top-k, hopping windows,
vocabulary stats, benchmark decontamination."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def test_topk_per_group(ray_session):
    import ray.data

    from grass_ray.stages.grouped import topk_per_group

    rng = np.random.default_rng(5)
    n = 500
    df = pd.DataFrame(
        {
            "g": [f"g{i % 4}" for i in range(n)],
            "id": np.arange(n),
            "v": rng.integers(0, 1000, size=n),
        }
    )
    out = (
        topk_per_group(
            ray.data.from_pandas(df), key_cols=("g",), val_col="v", k=5,
            tie_cols=("id",),
        )
        .to_pandas()
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["v", "id"], ascending=[False, True], kind="mergesort")
        .groupby("g", sort=False)
        .head(5)
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    assert len(out) == 20
    assert (out["id"].to_numpy() == want["id"].to_numpy()).all()


def test_hop_windows_vs_pandas(ray_session):
    import ray.data

    from grass_ray.stages.grouped import hop_windows

    rng = np.random.default_rng(6)
    n = 2000
    pos = np.sort(rng.integers(0, 10_000, size=n))
    df = pd.DataFrame(
        {
            "k": [f"k{i % 3}" for i in range(n)],
            "pos": pos,
            "v": rng.integers(1, 100, size=n).astype(np.int64),
        }
    )
    size, hop = 400, 100
    out = (
        hop_windows(
            ray.data.from_pandas(df), key_cols=("k",), pos_col="pos",
            val_col="v", size=size, hop=hop, methods=("count", "sum"),
        )
        .to_pandas()
        .set_index(["k", "window_start"])
        .sort_index()
    )
    # literal oracle: every (k, window) with window covering the point
    rows = []
    for j in range(size // hop):
        d = df.copy()
        d["window_start"] = (d["pos"] // hop - j) * hop
        d = d[(d["pos"] >= d["window_start"]) & (d["pos"] < d["window_start"] + size)]
        rows.append(d)
    full = pd.concat(rows)
    want = (
        full.groupby(["k", "window_start"])
        .agg(count=("v", "size"), sum=("v", "sum"))
        .sort_index()
    )
    assert len(out) == len(want)
    assert (out["count"].to_numpy() == want["count"].to_numpy()).all()
    assert np.allclose(out["sum"].to_numpy(dtype=float), want["sum"].to_numpy(dtype=float))


def test_vocab_topn(ray_session):
    import ray.data

    from grass_ray.stages.vocab import vocab_topn

    docs = pd.DataFrame(
        {
            "text": [
                "apple banana apple",
                "banana cherry BANANA",
                "apple date",
            ]
        }
    )
    out = vocab_topn(ray.data.from_pandas(docs), 3).to_pandas()
    assert list(out["word"]) == ["apple", "banana", "cherry"]
    assert list(out["cnt"]) == [3, 3, 1]  # tie apple/banana -> word asc


def test_decontaminate(ray_session):
    import ray.data

    from grass_ray.stages.vocab import decontaminate

    bench = pd.DataFrame(
        {"doc_id": [100], "text": ["the quick brown fox jumps over lazy dogs"]}
    )
    train = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "we saw the quick brown fox yesterday",  # shares 3-gram
                "completely clean text with no overlap here",
                "to short",  # < k words -> never contaminated
            ],
        }
    )
    kept, bad = decontaminate(
        ray.data.from_pandas(train), ray.data.from_pandas(bench), k=3
    )
    assert sorted(kept.to_pandas()["doc_id"]) == [2, 3]
    assert sorted(bad.to_pandas()["doc_id"]) == [1]


def test_decontaminate_no_overlap(ray_session):
    import ray.data

    from grass_ray.stages.vocab import decontaminate

    bench = pd.DataFrame({"doc_id": [9], "text": ["alpha beta gamma delta"]})
    train = pd.DataFrame({"doc_id": [1], "text": ["one two three four five"]})
    kept, bad = decontaminate(
        ray.data.from_pandas(train), ray.data.from_pandas(bench), k=3
    )
    assert sorted(kept.to_pandas()["doc_id"]) == [1]
    assert bad.count() == 0


def test_vocab_coverage_vs_counter(ray_session):
    """vocab_coverage vs a brute-force Counter reference, including a
    count tie at the k boundary (word-asc wins) and a group whose texts
    contain no words (dropped)."""
    import re
    from collections import Counter

    import ray.data

    from grass_ray.stages.vocab import vocab_coverage

    texts = [
        ("a", "alpha beta beta gamma gamma delta"),
        ("a", "alpha alpha zeta"),
        ("b", "beta gamma epsilon epsilon"),
        ("b", "alpha iota"),
        ("c", "!!! ??? ..."),  # no words at all
    ]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(texts))]),
            "source": pa.array([s for s, _ in texts]),
            "text": pa.array([x for _, x in texts]),
        }
    )
    k = 3
    out = (
        vocab_coverage(ray.data.from_arrow(t), k)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )

    rx = re.compile(r"[a-z0-9_']+")
    words = Counter()
    per_src: dict[str, Counter] = {}
    for s, x in texts:
        ws = rx.findall(x.lower())
        words.update(ws)
        per_src.setdefault(s, Counter()).update(ws)
    vocab = {
        w for w, _ in sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    }
    assert "c" not in out.index  # wordless group dropped
    for s, c in per_src.items():
        if not c:
            continue
        total = sum(c.values())
        covered = sum(n for w, n in c.items() if w in vocab)
        assert out.loc[s, "total_words"] == total
        assert out.loc[s, "covered_words"] == covered
        assert out.loc[s, "coverage"] == covered / total
        assert out.loc[s, "oov_rate"] == 1.0 - covered / total


def test_decontaminate_report_regimes_vs_reference(ray_session):
    """decontaminate_report vs a brute-force set reference, and the
    broadcast vs exchange regimes row-identical (including docs with
    zero grams and zero contamination)."""
    import re

    import ray.data

    from grass_ray.stages.vocab import decontaminate_report

    bench_texts = ["alpha beta gamma delta", "one two three"]
    train_texts = [
        "alpha beta gamma delta epsilon",  # two bench 3-grams
        "zeta eta theta iota kappa",       # clean
        "one two three one two three",     # repeats fold: distinct grams only
        "xy zz",                           # < 3 words -> 0 grams
    ]
    rx = re.compile(r"[a-z0-9_']+")

    def gramset(t):
        ws = rx.findall(t.lower())
        return {tuple(ws[i : i + 3]) for i in range(len(ws) - 2)}

    bench_grams = set().union(*(gramset(t) for t in bench_texts))
    bench = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([f"b{i}" for i in range(len(bench_texts))]),
                "text": pa.array(bench_texts),
            }
        )
    )
    train = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([f"t{i}" for i in range(len(train_texts))]),
                "text": pa.array(train_texts),
            }
        )
    )
    got_b = (
        decontaminate_report(train, bench, k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got_x = (
        decontaminate_report(train, bench, k=3, broadcast_threshold=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got_b.equals(got_x)  # regime parity
    for i, t in enumerate(train_texts):
        g = gramset(t)
        row = got_b[got_b["doc_id"] == f"t{i}"].iloc[0]
        assert row["n_grams"] == len(g)
        assert row["n_contaminated"] == len(g & bench_grams)
    # the crafted corners actually fire
    assert got_b.set_index("doc_id").loc["t3", "n_grams"] == 0
    assert got_b.set_index("doc_id").loc["t1", "n_contaminated"] == 0
    assert got_b.set_index("doc_id").loc["t0", "n_contaminated"] > 0
