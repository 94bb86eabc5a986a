"""Int8-quantized ANN (quantize → integer-dot candidates → float
rerank) and the cross-source k-gram overlap matrix, vs literal
single-node numpy / set references."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from grass_ray.stages.similarity import (
    _quantize_rows,
    ann_topk,
    ann_topk_int8,
    ann_topk_rerank,
    quantize_embeddings,
)
from grass_ray.stages.vocab import ngram_source_overlap


def _emb_table(rng, n, dim):
    m = rng.standard_normal((n, dim)).astype(np.float32)
    return m, pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [r.tolist() for r in m], type=pa.list_(pa.float32())
            ),
        }
    )


def _ref_quantize(m64):
    """The per-element formula, spelled identically to the SQL twin."""
    out = np.empty(m64.shape, dtype=np.int64)
    scales = np.empty(m64.shape[0])
    for i, row in enumerate(m64):
        maxabs = max(abs(float(x)) for x in row)
        safe = maxabs if maxabs != 0.0 else 1.0
        out[i] = [int(np.floor(float(x) * 127.0 / safe + 0.5)) for x in row]
        scales[i] = maxabs / 127.0
    return out, scales


def test_quantize_codes_match_reference(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    m, t = _emb_table(rng, 40, 16)
    # adversarial rows: all-zero vector, negative-dominant vector
    m[3] = 0.0
    m[5] = -np.abs(m[5]) * 3.0
    t = t.set_column(
        1,
        "embedding",
        pa.array([r.tolist() for r in m], type=pa.list_(pa.float32())),
    )
    out = (
        quantize_embeddings(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    codes = np.stack(
        [np.asarray(c, dtype=np.int64) for c in out["code"].to_numpy()]
    )
    ref_codes, ref_scales = _ref_quantize(m.astype(np.float64))
    assert np.array_equal(codes, ref_codes)
    assert np.array_equal(out["scale"].to_numpy(), ref_scales)
    assert codes.max() <= 127 and codes.min() >= -127
    # zero vector → all-zero codes, scale 0
    assert codes[3].sum() == 0 and out["scale"][3] == 0.0
    # extreme elements hit exactly ±127
    assert 127 in np.abs(codes[5])


def test_ann_int8_matches_numpy(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    m, t = _emb_table(rng, 120, 24)
    codes, _ = _quantize_rows(m.astype(np.float64))
    q = codes[:3].astype(np.int64)
    ds = quantize_embeddings(ray.data.from_arrow(t).repartition(5))
    out = ann_topk_int8(ds, q, k=7).to_pandas()
    scores = q @ codes.T.astype(np.int64)  # exact
    for qi in range(3):
        order = np.lexsort((np.arange(len(m)), -scores[qi]))[:7]
        got = out[out["query_id"] == qi].sort_values("rank")
        assert got["vec_id"].tolist() == order.tolist()
        assert got["score"].tolist() == scores[qi][order].tolist()


def test_ann_rerank_full_equals_bruteforce(ray_session):
    import ray.data

    rng = np.random.default_rng(13)
    m, t = _emb_table(rng, 90, 16)
    q = m[:2].astype(np.float64)
    ds = ray.data.from_arrow(t).repartition(4)
    exact = ann_topk(ds, q, k=5, dtype=np.float64).to_pandas()
    two_stage = ann_topk_rerank(
        ds, q, k=5, rerank=len(m), dtype=np.float64
    ).to_pandas()
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True), two_stage.reset_index(drop=True)
    )


def test_ann_rerank_pruned_recall(ray_session):
    import ray.data

    rng = np.random.default_rng(17)
    m, t = _emb_table(rng, 400, 32)
    q = m[:3].astype(np.float64)
    ds = ray.data.from_arrow(t).repartition(4)
    exact = ann_topk(ds, q, k=10, dtype=np.float64).to_pandas()
    pruned = ann_topk_rerank(
        ds, q, k=10, rerank=60, dtype=np.float64
    ).to_pandas()
    # surviving candidates re-rank with EXACT cosine, so any id in both
    # results carries the identical score
    hit = 0
    for qi in range(3):
        e = exact[exact["query_id"] == qi].set_index("vec_id")["score"]
        p = pruned[pruned["query_id"] == qi].set_index("vec_id")["score"]
        common = e.index.intersection(p.index)
        hit += len(common)
        assert (e.loc[common] == p.loc[common]).all()
    assert hit >= 24  # ≥80% recall at 15% rerank depth on gaussian data


def _ref_overlap(texts, sources, k):
    from grass_ray.functions.textstats import kgram_hashes_batch

    flat, lens = kgram_hashes_batch(list(texts), k)
    per_src: dict[str, set] = {}
    pos = 0
    for s, ln in zip(sources, lens):
        per_src.setdefault(s, set()).update(flat[pos : pos + ln].tolist())
        pos += ln
    rows = []
    names = sorted(per_src)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            sh = len(per_src[a] & per_src[b])
            if sh:
                na, nb = len(per_src[a]), len(per_src[b])
                rows.append(
                    (a, b, sh, na, nb, float(sh) / float(na + nb - sh))
                )
    return pd.DataFrame(
        rows,
        columns=["source_a", "source_b", "n_shared", "n_a", "n_b", "jaccard"],
    )


def test_source_overlap_vs_sets(ray_session):
    import ray.data

    rng = np.random.default_rng(23)
    vocab = np.array([f"w{i}" for i in range(60)])
    texts, sources = [], []
    for d in range(80):
        src = f"s{d % 4}"
        nw = int(rng.integers(3, 30))
        texts.append(" ".join(rng.choice(vocab, size=nw)))
        sources.append(src)
    # one planted exact clone across two sources → guaranteed overlap
    texts.append(texts[0])
    sources.append("s9")
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "source": pa.array(sources),
        }
    )
    ref = _ref_overlap(texts, sources, 5)
    for parts in (1, 7):
        out = (
            ngram_source_overlap(ray.data.from_arrow(t).repartition(parts))
            .to_pandas()
            .sort_values(["source_a", "source_b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, ref)
    assert ("s9" == ref["source_b"]).any()  # the planted clone pair exists


def test_source_overlap_empty_and_short_docs(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(["", "one two", "one two"]),
            "source": pa.array(["a", "b", "c"]),
        }
    )
    out = ngram_source_overlap(ray.data.from_arrow(t)).to_pandas()
    # short docs (<k words) emit the whole-doc hash (shingles rule) →
    # b and c share exactly that one gram; the empty doc emits nothing
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["source_a"], row["source_b"]) == ("b", "c")
    assert row["n_shared"] == 1 and row["jaccard"] == 1.0
