"""Segment-level exact substring dedup + unigram LM scoring vs literal
single-node references (pure-Python first-occurrence / Counter math)."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

WORD_RX = re.compile(r"[a-z0-9_']+")


def _ref_segment_dedup(texts, k):
    """Literal reference: first corpus-wide occurrence of each k-word
    segment wins, scanned in (doc, seg_idx) order."""
    seen = {}
    segs_per_doc = []
    for d, t in enumerate(texts):
        words = WORD_RX.findall((t or "").lower())
        segs = [
            " ".join(words[i : i + k]) for i in range(0, len(words), k)
        ]
        segs_per_doc.append(segs)
        for si, s in enumerate(segs):
            seen.setdefault(s, (d, si))
    out = []
    for d, segs in enumerate(segs_per_doc):
        kept = [s for si, s in enumerate(segs) if seen[s] == (d, si)]
        out.append(
            {
                "doc_id": d,
                "text_dedup": " ".join(kept),
                "n_segs": len(segs),
                "n_kept": len(kept),
                "n_dropped": len(segs) - len(kept),
            }
        )
    return out


def _mk_docs(rng, n_docs, vocab, lo=4, hi=40):
    texts = []
    for _ in range(n_docs):
        nw = int(rng.integers(lo, hi))
        texts.append(" ".join(rng.choice(vocab, size=nw)))
    return texts


def test_segment_dedup_vs_reference(ray_session):
    import ray.data

    from grass_ray.stages.dedup import segment_dedup

    rng = np.random.default_rng(7)
    vocab = np.array(["aa", "bb", "cc", "dd", "ee"])  # tiny → many dups
    texts = _mk_docs(rng, 80, vocab)
    texts[10] = ""  # wordless doc must still appear
    texts[11] = "aa bb"  # single short (partial) segment
    want = _ref_segment_dedup(texts, k=3)
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    )
    got = (
        segment_dedup(ds, k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for w, (_, g) in zip(want, got.iterrows()):
        assert g["doc_id"] == w["doc_id"]
        assert g["text_dedup"] == w["text_dedup"], w["doc_id"]
        assert g["n_segs"] == w["n_segs"]
        assert g["n_kept"] == w["n_kept"]
        assert g["n_dropped"] == w["n_dropped"]
    assert int(got["n_dropped"].sum()) > 0  # non-trivial on this corpus


def test_segment_dedup_exchange_regime(ray_session):
    """Force the semi-join exchange regime (threshold 0 is impossible;
    use a tiny broadcast threshold via many winners) by shrinking
    buckets — result must be identical to the reference."""
    import ray.data

    from grass_ray.stages.dedup import segment_dedup

    rng = np.random.default_rng(9)
    vocab = np.array(["x", "y", "z", "w"])
    texts = _mk_docs(rng, 50, vocab, lo=3, hi=25)
    want = _ref_segment_dedup(texts, k=2)
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    )
    got = (
        segment_dedup(ds, k=2, buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for w, (_, g) in zip(want, got.iterrows()):
        assert g["text_dedup"] == w["text_dedup"]
        assert g["n_dropped"] == w["n_dropped"]


def _ref_lm(texts):
    cnt = Counter()
    for t in texts:
        cnt.update(WORD_RX.findall((t or "").lower()))
    total = sum(cnt.values())
    rows = []
    for d, t in enumerate(texts):
        ws = WORD_RX.findall((t or "").lower())
        lp = sum(int(math.floor(1e6 * math.log(cnt[w]))) for w in ws)
        rows.append(
            {
                "doc_id": d,
                "n_words": len(ws),
                "logcnt_sum_micro": lp,
                "avg_logprob": (
                    lp / (1e6 * len(ws)) - math.log(total) if ws else None
                ),
            }
        )
    return rows


def test_lm_score_vs_reference_both_regimes(ray_session):
    import ray.data

    from grass_ray.stages.vocab import lm_score

    rng = np.random.default_rng(11)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
    texts = _mk_docs(rng, 60, vocab)
    texts[5] = ""
    want = _ref_lm(texts)
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    for thr in (2_000_000, 1):  # broadcast regime, then exchange regime
        got = (
            lm_score(ray.data.from_pandas(df), broadcast_threshold=thr)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(got) == len(want)
        for w, (_, g) in zip(want, got.iterrows()):
            assert g["n_words"] == w["n_words"]
            assert g["logcnt_sum_micro"] == w["logcnt_sum_micro"]
            if w["avg_logprob"] is None:
                assert pd.isna(g["avg_logprob"])
            else:
                assert g["avg_logprob"] == w["avg_logprob"]


def _u32_ref(i, seed):
    """Literal murmur3 fmix32 finalizer over (id + seed·40503)."""
    h = (i + seed * 40503) % (1 << 32)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) % (1 << 32)
    h ^= h >> 13
    h = (h * 0xC2B2AE35) % (1 << 32)
    return h ^ (h >> 16)


def test_mix_sources_vs_reference(ray_session):
    import ray.data

    from grass_ray.stages.mix import mix_sources, rate_threshold

    n = 4000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "source": [f"s{i % 5}" for i in range(n)],
        }
    )
    rates = {"s0": 1.0, "s1": 0.5, "s2": 0.0}
    got = (
        mix_sources(
            ray.data.from_pandas(df), rates, default_rate=0.25, seed=99
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    want = [
        i
        for i in range(n)
        if _u32_ref(i, 99)
        < rate_threshold(rates.get(f"s{i % 5}", 0.25))
    ]
    assert got["doc_id"].tolist() == want
    # rate sanity: s0 fully kept, s2 fully dropped, s1 near half
    by = got.groupby("source").size()
    assert by.get("s0", 0) == 800 and "s2" not in by.index
    assert 320 <= by.get("s1", 0) <= 480


def test_deterministic_shuffle_is_exact_permutation(ray_session):
    import ray.data

    from grass_ray.stages.mix import deterministic_shuffle

    n = 3000
    ids = np.arange(n) * 7 + 3  # non-contiguous ids
    got = (
        deterministic_shuffle(
            ray.data.from_pandas(pd.DataFrame({"doc_id": ids})),
            seed=5,
            parts=16,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    keys = sorted(ids, key=lambda i: (_u32_ref(int(i), 5), int(i)))
    want = {int(i): r for r, i in enumerate(keys)}
    assert sorted(got["shuffle_rank"].tolist()) == list(range(n))
    assert all(
        want[int(i)] == int(r)
        for i, r in zip(got["doc_id"], got["shuffle_rank"])
    )


def test_rank_vocab_and_tokenize(ray_session):
    import ray.data

    from grass_ray.stages.vocab import rank_vocab, tokenize_by_rank

    texts = [
        "b b b a a c",
        "a d",
        "",
        "c c b",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df)
    v = rank_vocab(ds)
    # counts: b=4, a=3, c=3, d=1 -> rank by (cnt desc, word asc)
    assert v == {"b": 0, "a": 1, "c": 2, "d": 3}
    got = (
        tokenize_by_rank(ray.data.from_pandas(df), vocab=v)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["tokens"].tolist()[0].tolist() == [0, 0, 0, 1, 1, 2]
    assert got["tokens"].tolist()[1].tolist() == [1, 3]
    assert got["tokens"].tolist()[2].tolist() == []
    assert got["tokens"].tolist()[3].tolist() == [2, 2, 0]
    assert got["n_tok"].tolist() == [6, 2, 0, 3]
    # foreign vocab: unseen words -> oov_id
    got2 = (
        tokenize_by_rank(
            ray.data.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["a z"]})),
            vocab=v,
            oov_id=-1,
        )
        .to_pandas()
    )
    assert got2["tokens"].tolist()[0].tolist() == [1, -1]


def test_kmeans_fit_matches_numpy_lloyd(ray_session):
    """Distributed Lloyd's == single-node Lloyd's with identical init
    (well-separated clusters so float fold order cannot flip an
    assignment)."""
    import ray.data

    from grass_ray.stages.similarity import _normalize, kmeans, kmeans_fit

    rng = np.random.default_rng(3)
    k, d, per = 4, 8, 200
    centers = _normalize(rng.normal(size=(k, d)).astype(np.float64))
    X = np.concatenate(
        [c + 0.02 * rng.normal(size=(per, d)) for c in centers]
    ).astype(np.float32)
    ids = np.arange(len(X))
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [r.tolist() for r in X], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    cent, n_it, shift = kmeans_fit(
        ds, n_clusters=k, iters=20, seed=7, sample_size=800
    )
    # reference: same init (sample = full table in row order), same rule
    Xn = _normalize(X.astype(np.float32))
    rr = np.random.default_rng(7)
    ref = Xn[rr.choice(len(Xn), size=k, replace=False)].astype(np.float64)
    for _ in range(20):
        a = np.argmax(Xn.astype(np.float64) @ ref.T, axis=1)
        new = ref.copy()
        for c in range(k):
            m = Xn[a == c]
            if len(m):
                new[c] = m.astype(np.float64).mean(axis=0)
        new = _normalize(new)
        if np.max(np.linalg.norm(new - ref, axis=1)) < 1e-6:
            ref = new
            break
        ref = new
    assert np.allclose(cent, ref.astype(np.float32), atol=1e-4)
    got = kmeans(ds, n_clusters=k, iters=20, seed=7).to_pandas()
    a_ref = np.argmax(Xn @ ref.T.astype(np.float32), axis=1)
    got = got.sort_values("vec_id")
    # same partition of points (cluster labels may permute — here init
    # is identical so they should not, but compare as a partition)
    lab = {}
    ok = True
    for g, r in zip(got["cluster"], a_ref):
        if g in lab:
            ok &= lab[g] == r
        else:
            lab[g] = r
    assert ok and len(lab) == k


def test_normalize_text_unicode(ray_session):
    """NFC + RE2-whitespace collapse vs a literal python reference
    (RE2 \\s is ASCII [\\t\\n\\f\\r ] — \\xa0 must survive)."""
    import re
    import unicodedata

    import ray.data

    from grass_ray.stages.text_stage import normalize_text

    texts = [
        "Café  double  space",   # combining accent -> é, collapse
        "tab\there\nand newline",
        "nbsp\xa0stays",
        "  edges  ",
        "ascii only",
        "",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = (
        normalize_text(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for t, g, ch in zip(texts, got["text_norm"], got["norm_changed"]):
        want = re.sub(r"[\t\n\f\r ]+", " ", unicodedata.normalize("NFC", t))
        want = want.strip()
        assert g == want, (t, g, want)
        assert bool(ch) == (want != t)
    assert got["text_norm"][2] == "nbsp\xa0stays"
    assert got["text_norm"][0] == "Café double space"


def test_split_dataset_deterministic(ray_session):
    import ray.data

    from grass_ray.stages.mix import split_dataset, split_thresholds

    n = 5000
    df = pd.DataFrame({"doc_id": np.arange(n)})
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = (
        split_dataset(ray.data.from_pandas(df), fr, seed=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    names, bounds = split_thresholds(fr)
    want = []
    for i in range(n):
        u = _u32_ref(i, 3)
        lab = names[-1]
        for nm, b in zip(names, bounds):
            if u < int(b):
                lab = nm
                break
        want.append(lab)
    assert got["split"].tolist() == want
    frac = got["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["val"] - 0.1) < 0.01
    # rerun with a different block layout: identical assignment
    got2 = (
        split_dataset(
            ray.data.from_pandas(df).repartition(7), fr, seed=3
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got2["split"].tolist() == want


def test_delta_and_ffill_rollup_literal(ray_session):
    """Hand-computed edge cases: NULL at series head, NULL runs, lag
    boundary, short final window."""
    import ray.data

    from grass_ray.stages.seriesops import delta_rollup, ffill_rollup

    toks = [
        [None, 5, 7, None, 10],  # head null; dv: -,-,2,-,-; ff: -,5,7,7,10
        [1, 2],                  # dv: -,1 ; ff: 1,2
        [],                      # no windows
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "tokens": pa.array(toks, type=pa.list_(pa.int32())),
            "source": pa.array(["s", "s", "s"]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    d = (
        delta_rollup(ds, 3)
        .to_pandas()
        .sort_values(["doc_id", "window"])
        .reset_index(drop=True)
    )
    # doc a windows: [0,1,2]=pos0..2 -> dv valid only pos2 (7-5=2);
    # [3,4]=pos3..4 -> none valid (null on either side)
    assert d.loc[0, ["cnt_d", "sum_d", "min_d", "max_d"]].tolist() == [1, 2, 2, 2]
    assert d.loc[1, "cnt_d"] == 0 and pd.isna(d.loc[1, "sum_d"])
    # doc b single window: dv = 1 at pos1
    assert d.loc[2, ["cnt_d", "sum_d"]].tolist() == [1, 1]
    assert len(d) == 3  # doc c emits nothing
    f = (
        ffill_rollup(ds, 3)
        .to_pandas()
        .sort_values(["doc_id", "window"])
        .reset_index(drop=True)
    )
    # doc a w0: filled = -,5,7 -> cnt 2 sum 12; w1: 7,10 -> cnt 2 sum 17
    assert f.loc[0, ["cnt_f", "sum_f"]].tolist() == [2, 12]
    assert f.loc[1, ["cnt_f", "sum_f"]].tolist() == [2, 17]
    assert f.loc[2, ["cnt_f", "sum_f"]].tolist() == [2, 3]


from hypothesis import given, settings
from hypothesis import strategies as st

_PIECES = st.sampled_from(
    ["agg", "The", "ROW", "a", "b2", "_x", "don't", "café", "naïve",
     ",", ".", "!", "  ", "\t", "\n", "…", "—", "ß", "東京", ""]
)
_TEXTS = st.lists(
    st.lists(_PIECES, min_size=0, max_size=30).map(" ".join),
    min_size=1,
    max_size=12,
)


@settings(max_examples=15, deadline=None)
@given(texts=_TEXTS)
def test_segment_dedup_fuzz_messy_text(ray_session, texts):
    """Messy text (punctuation, unicode words, odd whitespace) through
    the vectorized span kernel must match the literal re.findall
    reference.  NOTE: the engine's ascii_words class is [a-z0-9_'];
    non-ASCII letters are separators on BOTH sides here."""
    import ray.data

    from grass_ray.stages.dedup import segment_dedup

    want = _ref_segment_dedup(texts, k=2)
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    )
    got = (
        segment_dedup(ds, k=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for w, (_, g) in zip(want, got.iterrows()):
        assert g["text_dedup"] == w["text_dedup"], (texts, w["doc_id"])
        assert g["n_segs"] == w["n_segs"]


@settings(max_examples=10, deadline=None)
@given(texts=_TEXTS)
def test_lm_score_fuzz_messy_text(ray_session, texts):
    import ray.data

    from grass_ray.stages.vocab import lm_score

    want = _ref_lm(texts)
    got = (
        lm_score(
            ray.data.from_pandas(
                pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
            )
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for w, (_, g) in zip(want, got.iterrows()):
        assert g["n_words"] == w["n_words"], texts
        assert g["logcnt_sum_micro"] == w["logcnt_sum_micro"], texts


def test_quantile_filter_exact_and_nulls(ray_session):
    import ray.data

    from grass_ray.stages.curate import quantile_filter

    vals = [float(x) for x in [5, 1, 9, 3, 7, 2, 8, 4, 6, 10]]
    tbl = pa.table(
        {
            "id": pa.array(list(range(10)) + [99]),
            "v": pa.array(vals + [None], type=pa.float64()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    kept, t = quantile_filter(ds, val_col="v", q=0.3)
    # rank = ceil(0.3*10) = 3 -> threshold = 3rd smallest = 3.0
    assert t == 3.0
    got = sorted(kept.to_pandas()["v"].tolist())
    assert got == [3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0]  # null dropped
    kept_b, t_b = quantile_filter(ds, val_col="v", q=0.7, keep="below")
    assert t_b == 7.0
    assert sorted(kept_b.to_pandas()["v"].tolist()) == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]


def test_approx_distinct_error_bound(ray_session):
    """HLL grouped distinct estimates within ~5x the 1.6% standard
    error on known cardinalities, merge-invariant across block layouts."""
    import ray.data

    from grass_ray.stages.grouped import approx_distinct

    rng = np.random.default_rng(21)
    rows = []
    truth = {"a": 500, "b": 5000, "c": 37}
    for g, n in truth.items():
        vals = rng.choice(n * 10, size=n, replace=False)
        for v in np.concatenate([vals, vals[: n // 2]]):  # dups don't count
            rows.append((g, int(v)))
    df = pd.DataFrame(rows, columns=["g", "v"])
    for nparts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(nparts)
        got = (
            approx_distinct(ds, key_cols=("g",), val_col="v")
            .to_pandas()
            .set_index("g")["approx_distinct"]
        )
        for g, n in truth.items():
            assert abs(got[g] - n) / n < 0.08, (g, got[g], n, nparts)


def test_hll_register_table_exact(ray_session):
    """The distributed register table equals a single driver-side
    sketch over each key's values, for every block layout — pins the
    partial/max-merge chain bit-exactly (the SQL oracle re-derives the
    same registers independently in HUGEINT arithmetic)."""
    import ray.data

    from grass_ray.functions.sketch import HyperLogLog
    from grass_ray.stages.grouped import hll_register_table
    from grass_ray.stages.join import _hash_rows

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], size=4000),
            "v": rng.integers(0, 1 << 62, size=4000),
        }
    )
    want = {}
    for g, grp in df.groupby("g"):
        h = _hash_rows(
            pa.table({"v": grp["v"].to_numpy()}), ["v"]
        ).astype(np.int64)
        sk = HyperLogLog(12).add_many(h)
        idxs = np.nonzero(sk.registers)[0]
        want[g] = list(zip(idxs.tolist(), sk.registers[idxs].tolist()))
    for nparts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = hll_register_table(ds, key_cols=("g",), val_col="v").to_pandas()
        for g, pairs in want.items():
            sub = out[out["g"] == g].sort_values("reg_idx")
            got = list(zip(sub["reg_idx"].tolist(), sub["max_rank"].tolist()))
            assert got == pairs, (g, nparts)


def test_tfidf_top_literal(ray_session):
    import math

    import ray.data

    from grass_ray.stages.vocab import tfidf_top

    texts = [
        "apple apple banana",   # tf apple=2
        "banana cherry",
        "apple cherry cherry",
        "",                     # wordless: no output row
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = (
        tfidf_top(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    N = 4.0  # wordless doc counts toward N (it is a document)
    def idf(dfc):
        return int(math.floor(1e6 * math.log(N / dfc)))
    # df: apple 2, banana 2, cherry 2 -> idf equal; doc0 argmax = apple (tf2)
    assert got.loc[0, "top_word"] == "apple" and got.loc[0, "tf"] == 2
    assert got.loc[0, "score_micro"] == 2 * idf(2)
    # doc1: tie tf=1, idf equal -> word asc => banana
    assert got.loc[1, "top_word"] == "banana"
    # doc2: cherry tf2 wins
    assert got.loc[2, "top_word"] == "cherry"
    assert len(got) == 3  # wordless doc emits nothing


def test_pmi_collocations_literal(ray_session):
    import math

    import ray.data

    from grass_ray.stages.vocab import pmi_collocations

    # "x y" always adjacent (strong collocation); "a b" sometimes
    texts = ["x y a c", "x y b a", "a x y c b", "c a x y", "b c x y a"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = (
        pmi_collocations(
            ray.data.from_pandas(df), top_n=3, min_count=5
        ).to_pandas()
    )
    # only (x, y) reaches c12 = 5; N = 22 words, c(x) = c(y) = 5
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["w1"], r["w2"], r["c12"]) == ("x", "y", 5)
    assert r["pmi_micro"] == int(math.floor(1e6 * math.log((22.0 * 5) / (5.0 * 5))))


def _vocab_corpus(n_docs: int = 60, seed: int = 7) -> pd.DataFrame:
    """Deterministic corpus with heavy count ties and shared prefixes
    (the hard cases for the distributed rank: many words in one count
    class, many sharing a 2-char prefix bucket)."""
    rng = np.random.default_rng(seed)
    words = (
        [f"aa{c}" for c in "bcdefgh"]
        + [f"ab{c}" for c in "xyz"]
        + ["zeta", "zet", "z", "aa", "a"]
        + [f"w{i:03d}" for i in range(40)]
    )
    texts = []
    for d in range(n_docs):
        k = int(rng.integers(0, 12))
        texts.append(" ".join(rng.choice(words, size=k).tolist()))
    return pd.DataFrame({"doc_id": np.arange(n_docs), "text": texts})


def test_rank_vocab_ds_matches_dict(ray_session):
    """Distributed rank == driver-side lexsort rank, word for word."""
    import ray.data

    from grass_ray.stages.vocab import rank_vocab, rank_vocab_ds

    df = _vocab_corpus()
    want = rank_vocab(ray.data.from_pandas(df))
    got_df = (
        rank_vocab_ds(ray.data.from_pandas(df), prefix_chars=2, buckets=8)
        .to_pandas()
    )
    got = dict(zip(got_df["word"], got_df["token_id"].astype(int)))
    assert got == want
    # token_id is a permutation of 0..V-1
    assert sorted(got_df["token_id"].tolist()) == list(range(len(want)))


def test_tokenize_exchange_matches_broadcast(ray_session):
    """Unbounded-vocabulary tokenization (word-keyed exchange + doc
    rebuild) is row/column/value-identical to the broadcast kernel."""
    import ray.data

    from grass_ray.stages.vocab import tokenize_by_rank

    df = _vocab_corpus(n_docs=80, seed=11)
    df["source"] = np.where(df["doc_id"] % 3 == 0, "web", "books")
    bc = (
        tokenize_by_rank(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ex = (
        tokenize_by_rank(
            ray.data.from_pandas(df), broadcast_threshold=0, buckets=8
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(bc.columns) == list(ex.columns)
    assert bc["n_tok"].tolist() == ex["n_tok"].tolist()
    assert bc["source"].tolist() == ex["source"].tolist()
    for a, b in zip(bc["tokens"], ex["tokens"]):
        assert list(a) == list(b)


def test_tfidf_exchange_matches_broadcast(ray_session):
    import ray.data

    from grass_ray.stages.vocab import tfidf_top

    df = _vocab_corpus(n_docs=80, seed=13)
    bc = (
        tfidf_top(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ex = (
        tfidf_top(ray.data.from_pandas(df), broadcast_threshold=0, buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(bc.columns) == list(ex.columns)
    for c in bc.columns:
        assert bc[c].tolist() == ex[c].tolist(), c


def test_pmi_exchange_matches_broadcast(ray_session):
    import ray.data

    from grass_ray.stages.vocab import pmi_collocations

    texts = ["x y a c", "x y b a", "a x y c b", "c a x y", "b c x y a"] * 3
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    bc = pmi_collocations(
        ray.data.from_pandas(df), top_n=5, min_count=3
    ).to_pandas()
    ex = pmi_collocations(
        ray.data.from_pandas(df),
        top_n=5,
        min_count=3,
        broadcast_threshold=0,
        buckets=4,
    ).to_pandas()
    assert list(bc.columns) == list(ex.columns)
    for c in bc.columns:
        assert bc[c].tolist() == ex[c].tolist(), c
