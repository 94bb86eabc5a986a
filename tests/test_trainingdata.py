"""Training-data ops: text analysis, dedup family, ANN, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from grass_ray.functions.textstats import (
    count_tokens_bpe,
    count_tokens_ws,
    detect_language,
    fingerprint,
    jaccard,
    quality_features,
    shingles,
)
from grass_ray.stages.dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_signature,
    _perm_params,
    simhash64,
    simhash_candidates,
)
from grass_ray.stages.multimodal import decode_pipeline, frame_sample, synth_media
from grass_ray.stages.similarity import ann_topk, embedding_dedup, ivf_topk
from grass_ray.stages.text_stage import analyze_text


def docs_table(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(["s"] * len(texts)),
        }
    )


# ---------------------------------------------------------------------------
# text stats
# ---------------------------------------------------------------------------


def test_language_detection():
    assert detect_language("the cat sat on the mat and it was warm")[0] == "en"
    assert detect_language("der Hund ist nicht in dem Haus und die Katze")[0] == "de"
    assert detect_language("")[0] == "und"


def test_token_counts_and_quality():
    t = "Hello world, this is a test."
    assert count_tokens_ws(t) == 6
    assert count_tokens_bpe(t) >= 6
    q = quality_features(t)
    assert 0 <= q["quality_score"] <= 1
    assert q["n_words"] == 6
    assert quality_features("")["quality_score"] == 0.0


def test_fingerprint_stable_and_distinct():
    a = fingerprint("hello world")
    assert a == fingerprint("hello world")
    assert a != fingerprint("hello world!")
    assert fingerprint("") == 0


def test_shingles_jaccard():
    a = shingles("one two three four five six seven", k=3)
    b = shingles("one two three four five six eight", k=3)
    j = jaccard(a, b)
    assert 0 < j < 1
    assert jaccard(a, a) == 1.0


def test_analyze_text_stage(ray_session):
    import ray.data

    t = docs_table(["the quick brown fox jumps over the lazy dog"] * 3)
    out = analyze_text(ray.data.from_arrow(t)).to_pandas()
    assert {"lang_pred", "n_tok_ws", "quality_score", "fingerprint"} <= set(
        out.columns
    )
    assert (out["lang_pred"] == "en").all()
    assert out["fingerprint"].nunique() == 1


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def test_exact_dedup(ray_session):
    import ray.data

    t = docs_table(["aaa", "bbb", "aaa", "ccc", "bbb"], ids=[5, 2, 1, 9, 4])
    out = exact_dedup(ray.data.from_arrow(t)).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 9]  # min id per content


def test_minhash_signature_similarity():
    a, b = _perm_params(128)
    s1 = shingles("the quick brown fox jumps over the lazy dog every day", 3)
    s2 = shingles("the quick brown fox jumps over the lazy cat every day", 3)
    s3 = shingles("completely different words nothing shared here at all", 3)
    sig1 = minhash_signature(s1, a, b)
    sig2 = minhash_signature(s2, a, b)
    sig3 = minhash_signature(s3, a, b)
    sim12 = (sig1 == sig2).mean()
    sim13 = (sig1 == sig3).mean()
    assert sim12 > 0.3 > sim13


def test_minhash_dedup(ray_session):
    import ray.data

    base = (
        "data processing engines stream batches of rows through operators "
        "that filter map join and aggregate them into results for users"
    )
    near = base.replace("users", "analysts")
    other = (
        "completely unrelated text about gardens flowers bees and honey "
        "production in the warm summer months of the southern valleys"
    )
    t = docs_table([base, near, other], ids=[1, 2, 3])
    kept, pairs = minhash_dedup(
        ray.data.from_arrow(t), threshold=0.5, num_perm=64, bands=16, k_shingle=3
    )
    kdf = kept.to_pandas()
    assert sorted(kdf["doc_id"]) == [1, 3]
    p = pairs.to_pandas()  # operator returns a Dataset now
    assert (1, 2) in list(zip(p["id_a"], p["id_b"]))


def test_simhash(ray_session):
    import ray.data

    base = "data processing engines stream batches of rows through operators"
    t = docs_table([base, base + " quickly", "bees honey gardens flowers"], ids=[1, 2, 3])
    assert simhash64(base) == simhash64(base)
    cand = simhash_candidates(
        ray.data.from_arrow(t), max_hamming=16
    ).to_pandas()
    pairs = set(zip(cand["id_a"], cand["id_b"]))
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------


def test_ann_topk_exact(ray_session):
    import ray.data

    path = "/root/testdata/sf0.001/embeddings.parquet"
    ds = ray.data.read_parquet(path)
    df = pd.read_parquet(path)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float32)
    q = X[:2]
    out = ann_topk(ds, q, k=5).to_pandas()
    assert len(out) == 10
    # self must be rank 1 with score ~1
    for qi in (0, 1):
        top = out[(out["query_id"] == qi) & (out["rank"] == 1)].iloc[0]
        assert top["vec_id"] == df["vec_id"][qi]
        assert top["score"] == pytest.approx(1.0, abs=1e-5)
    # brute-force numpy oracle agreement
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    want0 = set(
        df["vec_id"].to_numpy()[np.argsort(-(qn[0] @ Xn.T))[:5]].tolist()
    )
    got0 = set(out[out["query_id"] == 0]["vec_id"].tolist())
    assert got0 == want0


def test_assign_stage_scores_vs_numpy(ray_session):
    """_assign_stage with dtype=float64 + with_score (the
    ★kmeans_assign oracle contract): deterministic first-k centroids,
    argmax ties to the LOWEST centroid id, winning cosine emitted as
    float64 — numpy-oracle exact."""
    import ray.data

    from grass_ray.stages.similarity import _assign_stage, _normalize

    path = "/root/testdata/sf0.001/embeddings.parquet"
    df = pd.read_parquet(path).sort_values("vec_id").reset_index(drop=True)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    cent = _normalize(X[:4].copy())
    ds = ray.data.read_parquet(path)
    out = (
        _assign_stage(ds, cent, "embedding", dtype=np.float64, with_score=True)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    Xn = _normalize(X)
    scores = Xn @ cent.T
    want = np.argmax(scores, axis=1)
    assert out["centroid"].to_numpy().tolist() == want.tolist()
    np.testing.assert_allclose(
        out["score"].to_numpy(),
        scores[np.arange(len(want)), want],
        rtol=0,
        atol=1e-12,
    )
    # the 4 centroid-source vectors assign to themselves with score ~1
    assert out["centroid"][:4].tolist() == [0, 1, 2, 3]
    # default (no score) keeps the original narrow schema
    slim = _assign_stage(ds, cent, "embedding").to_pandas()
    assert "score" not in slim.columns


def test_ivf_topk_recall(ray_session):
    import ray.data

    path = "/root/testdata/sf0.001/embeddings.parquet"
    ds = ray.data.read_parquet(path)
    df = pd.read_parquet(path)
    X = np.stack(df["embedding"].to_numpy()).astype(np.float32)
    q = X[:3]
    exact = ann_topk(ds, q, k=5).to_pandas()
    approx = ivf_topk(ds, q, k=5, n_clusters=8, nprobe=4).to_pandas()
    # recall@5 of IVF vs exact should be decent with nprobe=half
    recall = 0.0
    for qi in range(3):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recall += len(e & a) / 5
    assert recall / 3 >= 0.6


def test_ivf_full_probe_equals_brute_force(ray_session):
    """nprobe == n_clusters scans every partition → IVF must reproduce
    ann_topk EXACTLY (ids, ranks, float64 scores) — the ivf_topk_full
    oracle contract."""
    import ray.data

    path = "/root/testdata/sf0.001/embeddings.parquet"
    ds = ray.data.read_parquet(path)
    df = pd.read_parquet(path)
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)[:3]
    exact = ann_topk(ds, q, k=5, dtype=np.float64).to_pandas()
    full = ivf_topk(
        ds, q, k=5, n_clusters=8, nprobe=8, dtype=np.float64
    ).to_pandas()
    cols = ["query_id", "rank", "vec_id"]
    assert exact[cols].equals(full[cols])
    # scores agree to round6 (matmul vs matvec differ in the last ulp —
    # the ivf_topk_full oracle contract rounds both sides)
    assert np.allclose(
        exact["score"].to_numpy(), full["score"].to_numpy(), atol=1e-9, rtol=0
    )


def test_embedding_dedup(ray_session):
    import ray.data

    rng = np.random.default_rng(0)
    base = rng.normal(size=(20, 16)).astype(np.float32)
    vecs = np.vstack([base, base[:5] * 1.001])  # 5 near-dups
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], type=pa.list_(pa.float32())
            ),
        }
    )
    kept, pairs_ds = embedding_dedup(
        ray.data.from_arrow(t), threshold=0.999, n_clusters=4
    )
    kdf = kept.to_pandas()
    pairs = pairs_ds.to_pandas()  # operator returns a Dataset now
    assert len(kdf) == 20
    assert set(pairs["id_b"]) == {20, 21, 22, 23, 24}


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_multimodal_decode_features(ray_session):
    import ray.data

    t = synth_media(8, payload_bytes=2048)
    out = decode_pipeline(ray.data.from_arrow(t), fake=True, feature_dim=32).to_pandas()
    assert len(out) == 8
    assert all(len(p) == 64 * 64 for p in out["pixels"])
    assert all(len(f) == 32 for f in out["features"])
    # deterministic: same payload -> same features
    t2 = synth_media(8, payload_bytes=2048)
    out2 = decode_pipeline(ray.data.from_arrow(t2), fake=True, feature_dim=32).to_pandas()
    a = np.stack(out.sort_values("media_id")["features"].to_numpy())
    b = np.stack(out2.sort_values("media_id")["features"].to_numpy())
    assert np.allclose(a, b)


def test_multimodal_real_decode_raises(ray_session):
    # without PIL the real path raises loudly; with PIL it decodes (see
    # test_multimodal_real_decode_pil)
    from grass_ray.stages.multimodal import DecodeMedia

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: real decode path active")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        DecodeMedia(fake=False)(synth_media(1))


def test_multimodal_real_decode_pil(ray_session):
    """Real PIL decode (soft dep): skipped when the lib is absent,
    never stubbed when it is present."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    from grass_ray.stages.multimodal import DecodeMedia

    img = Image.fromarray(np.arange(64, dtype=np.uint8).reshape(8, 8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    t = pa.table(
        {
            "media_id": pa.array(["m0"]),
            "payload": pa.array([buf.getvalue()], type=pa.binary()),
            "media_type": pa.array(["image"]),
            "width": pa.array([0], type=pa.int32()),
            "height": pa.array([0], type=pa.int32()),
            "sample_rate": pa.array([0], type=pa.int32()),
            "n_frames": pa.array([1], type=pa.int32()),
        }
    )
    out = DecodeMedia(fake=False)(t)
    assert out.column("width")[0].as_py() == 8
    assert list(out.column("pixels")[0].as_py()) == list(range(64))


def test_frame_sample(ray_session):
    import ray.data

    t = synth_media(4, media_type="video", payload_bytes=8192)
    out = frame_sample(ray.data.from_arrow(t), every_n=2).to_pandas()
    assert all(len(f) == 4 for f in out["frames"])  # 8 frames -> every 2nd
    assert all(len(f[0]) == 1024 for f in out["frames"])


def test_resize_images(ray_session):
    import ray.data
    from grass_ray.stages.multimodal import DecodeMedia, resize_images

    t = synth_media(4, payload_bytes=4096)
    decoded = ray.data.from_arrow(DecodeMedia(fake=True)(t))
    out = resize_images(decoded, out_w=16, out_h=16).to_pandas()
    assert all(len(p) == 256 for p in out["pixels_resized"])
    # deterministic nearest-neighbor: top-left pixel preserved
    for _, r in out.iterrows():
        assert r["pixels_resized"][0] == r["pixels"][0]


def test_connected_components(ray_session):
    import ray.data
    from grass_ray.stages.dedup import connected_components

    pairs = pa.table(
        {
            "id_a": pa.array([1, 5, 9, 20], type=pa.int64()),
            "id_b": pa.array([5, 9, 13, 21], type=pa.int64()),
        }
    )
    out = (
        connected_components(ray.data.from_arrow(pairs))
        .to_pandas()
        .set_index("node")["component"]
        .to_dict()
    )
    # chain 1-5-9-13 collapses to component 1; 20-21 to 20
    assert out == {1: 1, 5: 1, 9: 1, 13: 1, 20: 20, 21: 20}


def test_minhash_dedup_components(ray_session):
    import ray.data

    base = (
        "data processing engines stream batches of rows through operators "
        "that filter map join and aggregate them into results for users"
    )
    a = base
    b = base.replace("users", "analysts")
    c = b.replace("results", "answers")
    other = "totally different gardening text about bees flowers and honey yields"
    t = docs_table([a, b, c, other], ids=[1, 2, 3, 4])
    kept, pairs = minhash_dedup(
        ray.data.from_arrow(t), threshold=0.5, num_perm=64, bands=32,
        k_shingle=3, components=True,
    )
    kdf = kept.to_pandas()
    # chain a~b~c collapses to one representative (smallest id)
    assert 1 in set(kdf["doc_id"]) and 4 in set(kdf["doc_id"])
    assert {2, 3} & set(kdf["doc_id"]) == set() or len(kdf) <= 3


def test_bpe_contractions():
    # GPT-2-style pre-tokenizer splits contractions
    assert count_tokens_bpe("don't stop") >= 3  # don / 't / stop
    assert count_tokens_bpe("a,b") == 3


def test_scrub_text_redacts_and_counts(ray_session):
    import pyarrow as pa
    import ray.data

    from grass_ray.stages.text_stage import scrub_text

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ["a", "b", "c"],
                "text": [
                    "mail me at bob@example.com or 10.0.0.1",
                    "id 12345678 twice 99999999",
                    "nothing to redact",
                ],
            }
        )
    )
    out = scrub_text(ds).to_pandas().set_index("doc_id")
    assert out.loc["a", "text"] == "mail me at <EMAIL> or <IP>"
    assert out.loc["a", "n_redactions"] == 2
    assert out.loc["b", "text"] == "id <NUM> twice <NUM>"
    assert out.loc["b", "n_redactions"] == 2
    assert out.loc["c", "text"] == "nothing to redact"
    assert out.loc["c", "n_redactions"] == 0


def test_attr_univar_population_and_sample(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from grass_ray.stages.univar import attr_univar

    vals = [1.0, 2.0, 3.0, 4.0, None, 10.0]
    grp = ["a", "a", "a", "b", "b", "b"]
    ds = ray.data.from_arrow(
        pa.table({"g": grp, "x": pa.array(vals, type=pa.float64())})
    )
    out = attr_univar(ds, "x", by=("g",)).to_pandas().set_index("g")
    a = np.array([1.0, 2.0, 3.0])
    b = np.array([4.0, 10.0])
    assert out.loc["a", "n"] == 3 and out.loc["a", "nulls"] == 0
    assert out.loc["b", "n"] == 2 and out.loc["b", "nulls"] == 1
    import pytest as _pt

    # engine uses the power-sum closed form (formula-identical to its
    # SQL oracle); numpy mean-centers — equal to ~1e-12
    assert out.loc["a", "variance"] == _pt.approx(a.var(), rel=1e-12)
    assert out.loc["a", "var_samp"] == _pt.approx(a.var(ddof=1), rel=1e-12)
    assert out.loc["b", "stddev_samp"] == _pt.approx(b.std(ddof=1), rel=1e-12)
    assert out.loc["b", "vrange"] == 6.0
    # global (ungrouped) form
    g = attr_univar(ds, "x").to_pandas()
    allv = np.array([1.0, 2.0, 3.0, 4.0, 10.0])
    assert g.loc[0, "n"] == 5 and g.loc[0, "nulls"] == 1
    assert g.loc[0, "mean"] == _pt.approx(allv.mean(), rel=1e-12)
    assert g.loc[0, "var_samp"] == _pt.approx(allv.var(ddof=1), rel=1e-12)


def test_semdedup_exact_groups(ray_session):
    import ray.data

    from grass_ray.stages.similarity import semdedup

    rng = np.random.default_rng(3)
    base = rng.normal(size=(30, 16)).astype(np.float32)
    # precondition: distinct base vectors are below the eps radius
    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    s = bn @ bn.T
    np.fill_diagonal(s, 0.0)
    assert s.max() < 0.95
    # ids 30..34 duplicate base[0..4] exactly (cosine 1 regardless of
    # scale); identical vectors always share a cluster bucket, so the
    # drop set is clustering-independent
    vecs = np.vstack([base, base[:5] * 2.0])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    kept, drops = semdedup(ds, eps=0.95, n_clusters=4, iters=4)
    kdf = kept.to_pandas()
    ddf = drops.to_pandas()
    # within each identical pair (i, 30+i) csim ties -> id asc keeps i
    assert sorted(ddf["vec_id"]) == [30, 31, 32, 33, 34]
    assert sorted(kdf["vec_id"]) == list(range(30))
    assert (ddf["max_cosine"] > 0.999).all()

    # eps above any possible cosine -> nothing dropped
    kept2, drops2 = semdedup(ds, eps=1.5, n_clusters=4, iters=4)
    assert drops2.count() == 0
    assert kept2.count() == 35


def test_semdedup_deterministic_centroids(ray_session):
    """centroids= skips the iterative fit (the ★semdedup_det exact-
    oracle configuration): assignment + prune replayed against a
    numpy oracle in float64."""
    import ray.data

    from grass_ray.stages.similarity import _normalize, semdedup

    rng = np.random.default_rng(9)
    X = rng.normal(size=(60, 16)).astype(np.float64)
    cent = X[:4].copy()
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(60), type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in X], type=pa.list_(pa.float64())
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    eps = 0.3
    _kept, drops = semdedup(ds, eps=eps, centroids=cent, dtype=np.float64)
    ddf = drops.to_pandas().sort_values("vec_id").reset_index(drop=True)
    # numpy oracle: assign to nearest normalized centroid, per cluster
    # order by (csim asc, id asc), drop i iff max_{j<i} cos(i,j) > eps
    Xn = _normalize(X.copy())
    cn = _normalize(cent.copy())
    sims = Xn @ cn.T
    a = np.argmax(sims, axis=1)
    csim = sims[np.arange(len(a)), a]
    want = {}
    for c in range(4):
        ids = np.flatnonzero(a == c)
        order = ids[np.lexsort((ids, csim[ids]))]
        sub = Xn[order] @ Xn[order].T
        tri = np.tril(sub, k=-1)
        mx = tri.max(axis=1) if len(order) else np.empty(0)
        for pos in np.flatnonzero(mx > eps):
            want[int(order[pos])] = (c, mx[pos])
    assert ddf["vec_id"].tolist() == sorted(want)
    for _, r in ddf.iterrows():
        c, mxv = want[int(r["vec_id"])]
        assert int(r["cluster"]) == c
        assert r["max_cosine"] == pytest.approx(mxv, abs=1e-12)
    assert len(want) > 0  # non-vacuous at this eps


def test_embedding_dedup_deterministic_centroids(ray_session):
    """centroids= skips the sampled fit (the ★embedding_dedup_det
    exact-oracle configuration): bucketing + pair detection replayed
    against a numpy oracle in float64 (1-hop pairs, max-id drops)."""
    import ray.data

    from grass_ray.stages.similarity import _normalize, embedding_dedup

    rng = np.random.default_rng(13)
    X = rng.normal(size=(60, 16)).astype(np.float64)
    cent = X[:4].copy()
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(60), type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in X], type=pa.list_(pa.float64())
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    thr = 0.3
    kept, pairs = embedding_dedup(
        ds, threshold=thr, centroids=cent, dtype=np.float64
    )
    pdf = pairs.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    Xn = _normalize(X.copy())
    a = np.argmax(Xn @ _normalize(cent.copy()).T, axis=1)
    want = []
    for c in range(4):
        ids = np.flatnonzero(a == c)
        sub = Xn[ids] @ Xn[ids].T
        iu = np.triu_indices(len(ids), k=1)
        for x, y in zip(*iu):
            if sub[x, y] >= thr:
                want.append((int(ids[x]), int(ids[y]), sub[x, y]))
    want.sort()
    assert len(want) > 0  # non-vacuous at this threshold
    assert list(zip(pdf["id_a"], pdf["id_b"])) == [(x, y) for x, y, _ in want]
    np.testing.assert_allclose(
        pdf["cosine"].to_numpy(), [c for _, _, c in want], rtol=0, atol=1e-12
    )
    # drops = distinct max ids of the pairs
    assert set(range(60)) - set(kept.to_pandas()["vec_id"]) == {
        y for _, y, _ in want
    }


def test_ann_merge_tree_many_blocks(ray_session):
    """The coalesce-combine top-k merge must stay exact when the
    candidate stream spans more blocks than the fan-in (multi-level
    combine actually exercised)."""
    import ray.data

    rng = np.random.default_rng(11)
    X = rng.normal(size=(400, 12)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(400), type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in X], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(40)  # 40 blocks >> fan_in 16
    q = X[:3]
    out = ann_topk(ds, q, k=7, dtype=np.float64).to_pandas()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    for qi in range(3):
        want = np.argsort(-(qn[qi] @ Xn.T), kind="stable")[:7].tolist()
        got = out[out["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        assert got == want


def test_semdedup_property_single_cluster(ray_session):
    """n_clusters=1 (and no projection bits) reduces semdedup to the
    paper's GLOBAL procedure — property-check the prune step against a
    direct numpy implementation on random corpora with planted
    duplicates, using the engine's (deterministic) fitted centroid so
    both sides order by the same float32 centroid similarities."""
    import ray.data
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from grass_ray.stages.similarity import _normalize, kmeans_fit, semdedup

    @settings(max_examples=15, deadline=None)
    @given(
        seed=st.integers(0, 10_000),
        n=st.integers(3, 24),
        ndup=st.integers(0, 6),
    )
    def check(seed, n, ndup):
        rng = np.random.default_rng(seed)
        base = rng.normal(size=(n, 8)).astype(np.float32)
        dups = base[rng.integers(0, n, size=min(ndup, n))]
        vecs = np.vstack([base, dups]) if len(dups) else base
        eps = 0.97
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(len(vecs)), type=pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], type=pa.list_(pa.float32())
                ),
            }
        )
        ds = ray.data.from_arrow(t)
        kept, drops = semdedup(
            ds,
            eps=eps,
            n_clusters=1,
            iters=2,
            target_bucket=1 << 30,  # no projection bits
        )
        got = (
            sorted(drops.to_pandas()["vec_id"].tolist())
            if drops.count()
            else []
        )

        # numpy reference for the PRUNE step, driven by the engine's own
        # fitted centroid (kmeans_fit is bit-deterministic): float32
        # matmuls exactly as the assign/prune kernels compute them
        cent, _, _ = kmeans_fit(ds, n_clusters=1, iters=2)
        m = _normalize(vecs)
        csim = (m @ cent.T)[:, 0]
        order = np.lexsort((np.arange(len(m)), csim))
        mo = m[order]
        s = mo @ mo.T
        tri = np.tril(s, k=-1)
        mx = tri.max(axis=1) if len(m) else np.empty(0)
        want = sorted(np.arange(len(m))[order][mx > eps].tolist())
        assert got == want
        assert kept.count() == len(vecs) - len(want)

    check()


def test_multimodal_real_decode_wav(ray_session):
    """REAL audio decode with no external library: the stdlib wave
    module parses PCM WAV payloads (this test always runs, unlike the
    PIL one).  Mono and stereo, sample_rate/n_frames written back,
    samples exact."""
    import ray.data

    from grass_ray.stages.multimodal import (
        DecodeMedia,
        audio_features,
        synth_wav,
    )

    rate, n = 8000, 800
    mono = synth_wav(n_samples=n, rate=rate, freq=440.0)
    stereo = synth_wav(n_samples=n, rate=rate, freq=220.0, channels=2)
    t = pa.table(
        {
            "media_id": pa.array(["a0", "a1"]),
            "payload": pa.array([mono, stereo], type=pa.binary()),
            "media_type": pa.array(["audio", "audio"]),
            "width": pa.array([0, 0], type=pa.int32()),
            "height": pa.array([0, 0], type=pa.int32()),
            "sample_rate": pa.array([0, 0], type=pa.int32()),
            "n_frames": pa.array([0, 0], type=pa.int32()),
        }
    )
    out = DecodeMedia(fake=False)(t)
    assert out.column("sample_rate").to_pylist() == [rate, rate]
    assert out.column("n_frames").to_pylist() == [n, n]
    got = np.array(out.column("samples")[0].as_py())
    ref = np.rint(
        np.sin(2 * np.pi * 440.0 * np.arange(n) / rate) * 32000
    ).astype(np.int32)
    assert np.array_equal(got, ref)
    # stereo mixes the two (identical) channels to the mono signal
    got2 = np.array(out.column("samples")[1].as_py())
    ref2 = np.rint(
        np.sin(2 * np.pi * 220.0 * np.arange(n) / rate) * 32000
    ).astype(np.int32)
    assert np.array_equal(got2, ref2)

    # features: vectorized kernel equals the literal per-clip formulas
    feats = (
        audio_features(ray.data.from_arrow(out))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for i, sig in enumerate((ref, ref2)):
        x = sig.astype(np.float64)
        assert feats["duration_s"][i] == pytest.approx(n / rate)
        assert feats["rms"][i] == pytest.approx(np.sqrt((x * x).mean()))
        assert feats["zcr"][i] == pytest.approx(
            ((x[1:] * x[:-1]) < 0).sum() / n
        )


def test_multimodal_video_still_raises(ray_session):
    from grass_ray.stages.multimodal import DecodeMedia

    with pytest.raises(NotImplementedError):
        DecodeMedia(fake=False)(synth_media(1, media_type="video"))


def test_multimodal_mixed_batch_real_decode(ray_session):
    """A batch mixing audio and image rows decodes each kind with its
    own decoder (type-specific columns null-fill); empty batches pass
    through untouched."""
    from grass_ray.stages.multimodal import DecodeMedia, synth_wav

    wav = synth_wav(n_samples=100, rate=8000)
    rows = pa.table(
        {
            "media_id": pa.array(["a0", "i0"]),
            "payload": pa.array([wav, b"not used"], type=pa.binary()),
            "media_type": pa.array(["audio", "video"]),
            "width": pa.array([0, 4], type=pa.int32()),
            "height": pa.array([0, 4], type=pa.int32()),
            "sample_rate": pa.array([0, 0], type=pa.int32()),
            "n_frames": pa.array([0, 1], type=pa.int32()),
        }
    )
    dec = DecodeMedia(fake=False)
    # mixed audio+video: the video half raises loudly (no pyav)
    with pytest.raises(NotImplementedError):
        dec(rows)
    # pure-audio subset decodes; empty batch passes through
    audio_only = rows.slice(0, 1)
    out = dec(audio_only)
    assert out.column("n_frames").to_pylist() == [100]
    empty = rows.slice(0, 0)
    assert dec(empty).num_rows == 0
