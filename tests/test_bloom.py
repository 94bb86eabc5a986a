"""Bloom filter + bloom-regime decontamination.

Contract: NO false negatives ever; false positives bounded by the
configured rate (over-drop is the safe direction for decontamination).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from grass_ray.functions.bloom import (
    bloom_add,
    bloom_contains,
    bloom_empty,
    bloom_merge,
    bloom_params,
)
from grass_ray.stages.vocab import decontaminate


def test_bloom_no_false_negatives_and_fp_bound():
    rng = np.random.default_rng(7)
    members = rng.integers(0, 1 << 62, size=20_000, dtype=np.int64)
    others = rng.integers(0, 1 << 62, size=20_000, dtype=np.int64)
    others = others[~np.isin(others, members)]
    m_bits, k = bloom_params(len(members), fp_rate=1e-3)
    words = bloom_add(bloom_empty(m_bits), members, k)
    assert bloom_contains(words, members, k).all()  # no false negatives
    fp = bloom_contains(words, others, k).mean()
    assert fp < 5e-3, fp


def test_bloom_merge_is_union():
    rng = np.random.default_rng(8)
    a_h = rng.integers(0, 1 << 62, size=500, dtype=np.int64)
    b_h = rng.integers(0, 1 << 62, size=500, dtype=np.int64)
    m_bits, k = bloom_params(1000)
    a = bloom_add(bloom_empty(m_bits), a_h, k)
    b = bloom_add(bloom_empty(m_bits), b_h, k)
    merged = bloom_merge(a, b)
    both = bloom_add(bloom_add(bloom_empty(m_bits), a_h, k), b_h, k)
    assert (merged == both).all()


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
            }
        )
    )


def test_decontaminate_bloom_matches_exact(ray_session):
    bench = _docs([("b1", "the quick brown fox jumps over the lazy dog")])
    train = _docs(
        [
            ("t1", "something about the quick brown fox jumps over the lazy dog today"),
            ("t2", "completely unrelated text with many distinct words here"),
            ("t3", "short"),
        ]
    )
    kept_e, cont_e = decontaminate(train, bench, k=5)
    kept_b, cont_b = decontaminate(
        train, bench, k=5, method="bloom", bloom_expected_n=1 << 16
    )
    ce = sorted(r["doc_id"] for r in cont_e.take_all())
    cb = sorted(r["doc_id"] for r in cont_b.take_all())
    # no false negatives: bloom catches at least everything exact does;
    # at this size (huge filter vs tiny gram set) it matches exactly
    assert ce == ["t1"]
    assert cb == ce
    assert sorted(r["doc_id"] for r in kept_b.take_all()) == ["t2", "t3"]


def test_decontaminate_exact_regime_parity(ray_session):
    """Broadcast-exact vs semi-join exchange regime: identical kept and
    contaminated sets on the same inputs."""
    import ray.data

    from grass_ray.stages.vocab import decontaminate

    train = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )
    bench = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    ).limit(30).materialize()
    k_a, c_a = decontaminate(train, bench, k=8)
    k_b, c_b = decontaminate(train, bench, k=8, broadcast_threshold=0)
    ca = sorted(c_a.to_pandas()["doc_id"]) if c_a.count() else []
    cb = sorted(c_b.to_pandas()["doc_id"]) if c_b.count() else []
    assert ca == cb and len(ca) >= 30  # bench docs contaminate themselves
    assert sorted(k_a.to_pandas()["doc_id"]) == sorted(
        k_b.to_pandas()["doc_id"]
    )
