"""Adversarial edge cases across the engine."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from grass_ray.sources.corpus import synth_corpus_table
from grass_ray.stages.cascade import cascade_batch
from grass_ray.stages.rollup import rollup_batch


def test_giant_single_doc(ray_session):
    """One 2M-token doc through the full encoded tier build."""
    import ray.data

    from grass_ray.pipelines.tiers import build_tiers, read_tier
    from grass_ray.state.manifest import TierStore

    n = 2_000_000
    toks = np.arange(n, dtype=np.int64) % 32003
    t = pa.table(
        {
            "doc_id": pa.array(["d0000000"]),
            "tokens": pa.array([toks.astype(np.int32)], type=pa.list_(pa.int32())),
            "n_tok": pa.array([n], type=pa.int32()),
            "source": pa.array(["s"]),
        }
    )
    import tempfile

    root = tempfile.mkdtemp(prefix="giant_")
    build_tiers(ray.data.from_arrow(t), root)
    store = TierStore(root)
    info = store.info("1m")
    assert info["n_points"] == (n + 59) // 60
    out = read_tier(store, "1d").to_pandas()
    # 1d windows: 2M / 86400 = 23.1 -> 24 windows
    assert len(out["windows"][0]) == 24
    # exact check of a day-window sum vs closed form
    w0 = [v for v in out["sum"][0]][0]
    assert w0 == float(np.sum(np.arange(86400) % 32003))
    import shutil

    shutil.rmtree(root, ignore_errors=True)


def test_negative_positions_grouped(ray_session):
    import ray.data

    from grass_ray.stages.grouped import rollup_points

    t = pa.table(
        {
            "k": ["a"] * 5,
            "pos": pa.array([-7, -3, -1, 0, 4], type=pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        }
    )
    out = (
        rollup_points(
            ray.data.from_arrow(t),
            key_cols=("k",),
            pos_col="pos",
            val_col="v",
            gran=4,
            methods=("count", "sum"),
        )
        .to_pandas()
        .sort_values("window")
        .reset_index(drop=True)
    )
    # floor semantics: -7//4=-2, -3//4=-1, -1//4=-1, 0//4=0, 4//4=1
    assert list(out["window"]) == [-2, -1, 0, 1]
    assert list(out["count"]) == [1, 2, 1, 1]


def test_cascade_factor_bigger_than_range():
    t = synth_corpus_table(5, seed=1, n_tok=100)
    fine = rollup_batch(t, 10, ("count", "sum", "minimum", "maximum", "average"), nested=True)
    coarse = cascade_batch(fine, 1000).to_pydict()
    for ws in coarse["windows"]:
        assert ws == [0]
    direct = rollup_batch(t, 10_000, ("count", "sum"), nested=True).to_pydict()
    assert coarse["sum"] == direct["sum"]


def test_unicode_text_ops(ray_session):
    from grass_ray.functions.textstats import (
        detect_language,
        fingerprint,
        quality_features,
        shingles,
    )
    from grass_ray.stages.dedup import simhash64

    txt = "héllo wörld — привет 你好 🎉 the and of to a in"
    assert isinstance(fingerprint(txt), int)
    assert fingerprint(txt) == fingerprint(txt)
    q = quality_features(txt)
    assert 0 <= q["quality_score"] <= 1
    assert detect_language(txt)[0] in ("en", "und", "de", "fr", "es", "it")
    assert len(shingles(txt, 3)) > 0
    assert simhash64(txt) == simhash64(txt)


def test_single_token_docs(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i:07d}" for i in range(3)]),
            "tokens": pa.array([[5], [None], [7]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([1, 1, 1], type=pa.int32()),
            "source": pa.array(["s"] * 3),
        }
    )
    out = rollup_batch(t, 60, ("count", "sum", "median", "slope")).to_pydict()
    assert out["count"] == [1, 0, 1]
    assert out["sum"] == [5.0, None, 7.0]
    assert out["median"] == [5.0, None, 7.0]
    assert out["slope"] == [None, None, None]  # count < 2


def test_explode_chunking_guard(monkeypatch):
    """Wide-row chunking produces identical results to unchunked."""
    import grass_ray.stages.rollup as R

    t = synth_corpus_table(40, seed=2, n_tok=2880)
    full = R.rollup_batch(t, 60, ("count", "sum", "average")).to_pydict()
    monkeypatch.setattr(R, "_MAX_EXPLODE_VALUES", 10_000)
    chunked = R.rollup_batch(t, 60, ("count", "sum", "average")).to_pydict()
    assert chunked == full
    nested_full = R.rollup_batch(t, 60, ("count", "sum", "minimum", "maximum", "average"), nested=True).to_pydict()
    monkeypatch.setattr(R, "_MAX_EXPLODE_VALUES", 32_000_000)
    nested_ref = R.rollup_batch(t, 60, ("count", "sum", "minimum", "maximum", "average"), nested=True).to_pydict()
    assert nested_full == nested_ref


@pytest.mark.parametrize("seed,g0,f1,f2", [(101, 7, 4, 3), (202, 13, 5, 2), (303, 60, 60, 24), (404, 1, 4, 3)])
def test_fuzz_build_vs_bruteforce(ray_session, tmp_path, seed, g0, f1, f2):
    """Differential fuzz: full encoded tier build (one-pass, manifests,
    codec) vs a brute-force per-doc recompute in plain numpy."""
    import ray.data

    from grass_ray.pipelines.tiers import build_tiers, read_tier
    from grass_ray.state.manifest import TierStore

    rng = np.random.default_rng(seed)
    n_docs = 30
    rows = []
    for i in range(n_docs):
        n = int(rng.integers(1, 400))
        toks = rng.integers(0, 1000, size=n).astype(object)
        for j in range(n):
            if rng.random() < 0.15:
                toks[j] = None
        rows.append((f"d{i:07d}", f"s{i % 4}", [None if t is None else int(t) for t in toks]))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "tokens": pa.array([r[2] for r in rows], type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[2]) for r in rows], type=pa.int32()),
            "source": pa.array([r[1] for r in rows]),
        }
    )
    root = str(tmp_path / f"fuzz{seed}")
    specs = (("t0", g0), ("t1", f1), ("t2", f2))
    build_tiers(ray.data.from_arrow(t), root, tier_specs=specs, docs_per_partition=7)
    store = TierStore(root)

    def brute(toks, gran):
        out = {}
        for w in range((len(toks) + gran - 1) // gran):
            seg = [v for v in toks[w * gran : (w + 1) * gran] if v is not None]
            out[w] = (
                len(seg),
                float(sum(seg)) if seg else None,
                float(min(seg)) if seg else None,
                float(max(seg)) if seg else None,
            )
        return out

    grans = {"t0": g0, "t1": g0 * f1, "t2": g0 * f1 * f2}
    for tier, gran in grans.items():
        got = read_tier(store, tier).to_pandas().set_index("doc_id")
        for doc_id, _, toks in rows:
            want = brute(toks, gran)
            ws = list(got.loc[doc_id, "windows"])
            assert ws == sorted(want), (tier, doc_id)
            for j, w in enumerate(ws):
                cnt, s, mn, mx = want[w]
                assert got.loc[doc_id, "count"][j] == cnt, (tier, doc_id, w)
                gs = got.loc[doc_id, "sum"][j]
                if s is None:
                    assert gs is None or (isinstance(gs, float) and np.isnan(gs))
                else:
                    assert gs == s
                    assert got.loc[doc_id, "minimum"][j] == mn
                    assert got.loc[doc_id, "maximum"][j] == mx


def test_round3_ops_empty_and_tiny(ray_session):
    """Round-3 paths on empty / single-row inputs: the ANN merge tree,
    semdedup, the distributed-rank tokenizer and tfidf/pmi exchange
    regimes must all return empty/degenerate results, not crash."""
    import ray.data

    from grass_ray.stages.similarity import ann_topk, semdedup
    from grass_ray.stages.vocab import (
        pmi_collocations,
        tfidf_top,
        tokenize_by_rank,
    )

    # --- empty embedding table through the merge tree + semdedup
    empty_vec = pa.table(
        {
            "vec_id": pa.array([], type=pa.int64()),
            "embedding": pa.array([], type=pa.list_(pa.float32())),
        }
    )
    q = np.eye(2, 8, dtype=np.float32)
    out = ann_topk(ray.data.from_arrow(empty_vec), q, k=3)
    assert out.num_rows == 0
    assert out.column_names == ["query_id", "vec_id", "score", "rank"]

    one_vec = pa.table(
        {
            "vec_id": pa.array([7], type=pa.int64()),
            "embedding": pa.array(
                [np.arange(8, dtype=np.float32).tolist()],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    kept, drops = semdedup(
        ray.data.from_arrow(one_vec), eps=0.9, n_clusters=2, iters=2
    )
    assert kept.count() == 1 and drops.count() == 0

    # --- empty / single-doc text through both vocab regimes
    empty_docs = pa.table(
        {
            "doc_id": pa.array([], type=pa.string()),
            "text": pa.array([], type=pa.string()),
        }
    )
    one_doc = pa.table(
        {
            "doc_id": pa.array(["d0"]),
            "text": pa.array(["alpha beta alpha"]),
        }
    )
    for thr in (500_000, 0):
        td = tokenize_by_rank(
            ray.data.from_arrow(one_doc), broadcast_threshold=thr
        ).to_pandas()
        assert list(td["tokens"][0]) == [0, 1, 0]  # alpha=rank0, beta=rank1
        tf = tfidf_top(
            ray.data.from_arrow(one_doc), broadcast_threshold=thr
        ).to_pandas()
        assert len(tf) == 1
        pm = pmi_collocations(
            ray.data.from_arrow(one_doc),
            broadcast_threshold=thr,
            top_n=5,
            min_count=1,
        ).to_pandas()
        assert len(pm) >= 1
    # empty corpus: no rows out, no crash (broadcast regime)
    assert tokenize_by_rank(ray.data.from_arrow(empty_docs)).count() == 0
