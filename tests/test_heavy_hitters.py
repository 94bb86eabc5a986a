"""SpaceSaving heavy hitters: deterministic guarantees + distributed plan.

Contract: for every item with true frequency f, the tracked count c
satisfies f <= c <= f + err; any item with f > n/m is present.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from grass_ray.functions.sketch import SpaceSaving
from grass_ray.stages.vocab import vocab_heavy_hitters, word_counts


def _zipf_stream(n=20_000, vocab=2_000, seed=3):
    rng = np.random.default_rng(seed)
    items = rng.zipf(1.3, size=n) % vocab
    return [f"w{int(i):04d}" for i in items]


def test_spacesaving_bounds_small_m():
    stream = _zipf_stream()
    truth = Counter(stream)
    s = SpaceSaving(64).add_many(stream)
    assert s.n == len(stream)
    for item, c, err in s.topk(64):
        f = truth[item]
        assert f <= c <= f + err, (item, f, c, err)
    # guaranteed heavy hitters: every item with f > n/m is tracked
    thresh = len(stream) / 64
    for item, f in truth.items():
        if f > thresh:
            assert item in s.counts, (item, f, thresh)


def test_spacesaving_merge_keeps_bounds():
    stream = _zipf_stream(30_000)
    truth = Counter(stream)
    thirds = [stream[:10_000], stream[10_000:20_000], stream[20_000:]]
    parts = [SpaceSaving(64).add_many(t) for t in thirds]
    merged = parts[0].merge(parts[1]).merge(parts[2])
    assert merged.n == len(stream)
    for item, c, err in merged.topk(64):
        f = truth[item]
        assert f <= c <= f + err, (item, f, c, err)
    thresh = len(stream) / 64
    for item, f in truth.items():
        if f > thresh:
            assert item in merged.counts


def test_spacesaving_exact_when_m_exceeds_vocab():
    stream = _zipf_stream(5_000, vocab=300)
    truth = Counter(stream)
    s = SpaceSaving(1024).add_many(stream)
    assert {k: v for k, v, e in s.topk(1024)} == dict(truth)
    assert all(e == 0 for _k, _c, e in s.topk(1024))


def test_vocab_heavy_hitters_matches_exact(ray_session):
    docs = [
        "the quick brown fox the lazy dog the end",
        "quick quick brown cat sat here",
        "dog dog dog barks at the fox",
    ] * 5
    ds = ray.data.from_arrow(pa.table({"text": docs}))
    t = vocab_heavy_hitters(ds, n=10, m=1 << 16)
    got = list(zip(t.column("word").to_pylist(), t.column("cnt").to_pylist()))
    exact = word_counts(ray.data.from_arrow(pa.table({"text": docs})))
    df = exact.to_pandas().sort_values(
        ["cnt", "word"], ascending=[False, True], kind="mergesort"
    )
    want = list(zip(df["word"].head(10), df["cnt"].head(10)))
    assert got == want
    assert t.column("err").to_pylist() == [0] * len(got)
