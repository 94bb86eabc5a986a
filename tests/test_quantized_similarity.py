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


def test_ivf_int8_full_probe_equals_ann_int8(ray_session):
    """store="int8" IVF at nprobe == n_clusters scans every partition
    with integer-dot scoring, so the result must EXACTLY equal
    ann_topk_int8 over the quantized corpus — proves the code-storing
    build + schema-detected search plumbing end-to-end."""
    import shutil
    import tempfile

    import ray.data

    from grass_ray.stages.similarity import ivf_topk

    rng = np.random.default_rng(43)
    m, t = _emb_table(rng, 150, 16)
    codes, _ = _quantize_rows(m.astype(np.float64))
    q = m[:3].astype(np.float64)
    ds = ray.data.from_arrow(t).repartition(4)
    exact = ann_topk_int8(
        quantize_embeddings(ds), codes[:3].astype(np.int64), k=6
    ).to_pandas()
    idx = tempfile.mkdtemp(prefix="grassray_ivf_i8_")
    try:
        got = ivf_topk(
            ds, q, k=6, n_clusters=5, nprobe=5, store="int8", index_dir=idx
        ).to_pandas()
        # the stored index really is codes, not floats
        import glob

        import pyarrow.parquet as pq

        f = glob.glob(f"{idx}/vectors/centroid=*/*.parquet")[0]
        names = set(pq.read_schema(f).names)
        assert "code" in names and "embedding" not in names
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exact.reset_index(drop=True)
    )


def test_ivf_int8_pruned_self_recall(ray_session):
    import ray.data

    from grass_ray.stages.similarity import ivf_topk

    rng = np.random.default_rng(47)
    m, t = _emb_table(rng, 300, 24)
    q = m[:5].astype(np.float64)
    ds = ray.data.from_arrow(t).repartition(3)
    got = ivf_topk(ds, q, k=3, n_clusters=8, nprobe=3, store="int8")
    gp = got.to_pandas()
    top1 = gp[gp["rank"] == 1].set_index("query_id")["vec_id"]
    # int8 self-dot is the max integer dot against own codes in almost
    # all cases; require >= 4/5 to stay robust to quantization ties
    assert (top1.loc[range(5)].to_numpy() == np.arange(5)).sum() >= 4


def test_source_overlap_gram_cap(ray_session):
    """A gram above max_sources_per_gram drops from the PAIR stage
    (logged) but stays in the totals — pairs then come only from the
    uncapped grams."""
    import ray.data

    texts = ["common gram one two three unique%d alpha beta gamma delta" % i
             for i in range(6)]
    sources = [f"s{i}" for i in range(6)]
    # s0/s1 share an extra full clone → extra grams beyond the common prefix
    texts.append(texts[0])
    sources.append("s1")
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "source": pa.array(sources),
        }
    )
    full = ngram_source_overlap(ray.data.from_arrow(t)).to_pandas()
    capped = ngram_source_overlap(
        ray.data.from_arrow(t), max_sources_per_gram=5
    ).to_pandas()
    # the 6-source shared prefix gram exceeds the cap of 5: all pure
    # prefix-only pairs vanish; the s0-s1 clone pair survives with only
    # its uncapped shared grams, totals (n_a/n_b) unchanged
    assert len(capped) < len(full)
    row = capped[(capped.source_a == "s0") & (capped.source_b == "s1")]
    frow = full[(full.source_a == "s0") & (full.source_b == "s1")]
    assert len(row) == 1 and len(frow) == 1
    assert row.iloc[0]["n_a"] == frow.iloc[0]["n_a"]
    assert row.iloc[0]["n_shared"] < frow.iloc[0]["n_shared"]


def test_plan_mixture_vs_reference(ray_session):
    """Planner math vs a literal reference + the apply round trip:
    uneven strata, explicit targets, a zero-share stratum, budget
    override, and mix_sources realizing the planned rates."""
    import ray.data

    from grass_ray.stages.mix import mix_sources, plan_mixture

    rng = np.random.default_rng(59)
    rows = []
    sizes = {"web": 4000, "code": 500, "books": 1500}
    did = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((did, s, int(rng.integers(50, 150))))
            did += 1
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "source": pa.array([r[1] for r in rows]),
            "n_chars": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )
    totals = {s: sum(r[2] for r in rows if r[1] == s) for s in sizes}
    targets = {"web": 0.5, "code": 0.5, "books": 0.0}
    ds = ray.data.from_arrow(t).repartition(4)
    plan, rates = plan_mixture(ds, targets)
    p = plan.to_pandas().set_index("source")
    # literal reference
    B = min(totals["web"] / 0.5, totals["code"] / 0.5)
    for s in sizes:
        assert p.loc[s, "n_weight"] == totals[s]
        ref_rate = 0.0 if s == "books" else min(0.5 * B / totals[s], 1.0)
        assert p.loc[s, "rate"] == ref_rate == rates[s]
    assert p.loc["code", "rate"] == 1.0  # the scarce stratum binds
    assert p.loc["books", "expect_weight"] == 0.0
    # budget override halves every expected contribution
    plan2, rates2 = plan_mixture(ds, targets, budget=B / 2)
    p2 = plan2.to_pandas().set_index("source")
    assert p2.loc["web", "rate"] == 0.5 * (B / 2) / totals["web"]
    # apply: realized weights land near the plan (fmix32 sampling)
    kept = mix_sources(ds, rates).to_pandas()
    got_w = kept.groupby("source")["n_chars"].sum()
    assert set(got_w.index) <= {"web", "code"}
    assert got_w["code"] == totals["code"]  # rate 1.0 keeps everything
    assert abs(got_w["web"] - p.loc["web", "expect_weight"]) < 0.1 * totals["web"]


def test_upsample_sources_vs_reference(ray_session):
    """Literal epoch-repetition reference: floor(f) full copies + a
    fmix32 fractional tail, layout-independent."""
    import ray.data

    from grass_ray.stages.mix import (
        mix_hash_u32,
        rate_threshold,
        upsample_sources,
    )

    n = 400
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array([f"s{i % 3}" for i in range(n)]),
        }
    )
    factors = {"s0": 2.5, "s1": 0.25, "s2": 0.0}
    ids = np.arange(n, dtype=np.int64)
    u = mix_hash_u32(ids, 17)
    ref = []
    for i in range(n):
        f = factors[f"s{i % 3}"]
        reps = int(np.floor(f)) + int(u[i] < rate_threshold(f - np.floor(f)))
        ref.extend((i, e) for e in range(reps))
    for parts in (1, 6):
        out = (
            upsample_sources(
                ray.data.from_arrow(t).repartition(parts), factors, seed=17
            )
            .to_pandas()
            .sort_values(["doc_id", "epoch"])
        )
        assert list(zip(out["doc_id"], out["epoch"])) == ref
    # s2 factor 0.0 emits nothing; s0 rows appear at least twice
    src = out["source"]
    assert not (src == "s2").any()
    assert (out[src == "s0"].groupby("doc_id").size() >= 2).all()
