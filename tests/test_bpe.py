"""BPE tokenizer: training parity vs a brute-force reference,
encode/decode roundtrip, distribution-invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from grass_ray.stages.bpe import (
    _word_symbols,
    bpe_decode_word,
    bpe_encode,
    bpe_train,
    bpe_vocab,
)

TEXTS = [
    "the lower the newer the lowest",
    "low lower lowest newest new",
    "widest wide wider new newer",
    "the new low est wid er",
    "lowest newest widest lowest",
    # self-overlapping merge pathology: (a,a) occurs overlapping
    "aaaa aaaaaa aaa aaaa baab",
]


def _ref_train(word_counts: dict, n_merges: int, min_pair_count: int = 2):
    """Brute-force Sennrich BPE: full pair recount every iteration."""
    words = {w: list(_word_symbols(w)) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for w, syms in words.items():
            c = word_counts[w]
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _counts_of(texts):
    from collections import Counter

    c: Counter = Counter()
    for t in texts:
        c.update(t.lower().split())
    return dict(c)


def test_bpe_train_matches_bruteforce(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(TEXTS))]),
            "text": pa.array(TEXTS),
        }
    )
    merges, alphabet = bpe_train(ray.data.from_arrow(t), n_merges=30)
    want = _ref_train(_counts_of(TEXTS), 30)
    assert merges == want
    assert len(merges) > 5  # the corpus genuinely produces merges
    assert alphabet == sorted({ch for w in _counts_of(TEXTS) for ch in w} | {" "})


def test_bpe_train_distribution_invariant(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(TEXTS))]),
            "text": pa.array(TEXTS),
        }
    )
    m1, a1 = bpe_train(ray.data.from_arrow(t), n_merges=20)
    m2, a2 = bpe_train(ray.data.from_arrow(t).repartition(5), n_merges=20)
    assert m1 == m2 and a1 == a2


def test_bpe_encode_roundtrip(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(TEXTS))]),
            "text": pa.array(TEXTS),
        }
    )
    ds = ray.data.from_arrow(t)
    merges, alphabet = bpe_train(ds, n_merges=25)
    vocab = bpe_vocab(merges, alphabet)
    out = bpe_encode(ds, merges, alphabet).to_pandas()
    assert set(out.columns) == {"doc_id", "tokens", "n_tok"}
    by_id = {r["doc_id"]: r for _, r in out.iterrows()}
    for i, text in enumerate(TEXTS):
        row = by_id[f"d{i}"]
        ids = list(row["tokens"])
        assert row["n_tok"] == len(ids)
        assert all(v >= 0 for v in ids)  # no OOV on the training corpus
        decoded = bpe_decode_word(ids, vocab)  # EOW -> '' concatenates
        assert decoded == text.lower().replace(" ", "")


def test_bpe_encode_oov_and_trim(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(TEXTS))]),
            "text": pa.array(TEXTS),
        }
    )
    ds = ray.data.from_arrow(t)
    merges, alphabet = bpe_train(ds, n_merges=10, max_words=3)
    # trimmed training still yields a usable tokenizer
    t2 = pa.table({"doc_id": pa.array(["x"]), "text": pa.array(["zzz low"])})
    out = bpe_encode(
        ray.data.from_arrow(t2), merges, alphabet
    ).to_pandas()
    ids = list(out["tokens"][0])
    assert -1 in ids  # 'z' unseen in the trimmed alphabet -> oov


def test_bpe_train_property_matches_bruteforce(ray_session):
    """Random tiny corpora: incremental pair maintenance must equal the
    full-recount reference for every merge sequence."""
    import ray.data
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=6)
    corpus = st.lists(
        st.lists(word, min_size=1, max_size=8).map(" ".join),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=25, deadline=None)
    @given(texts=corpus)
    def check(texts):
        t = pa.table(
            {
                "doc_id": pa.array([f"d{i}" for i in range(len(texts))]),
                "text": pa.array(texts),
            }
        )
        merges, _ = bpe_train(
            ray.data.from_arrow(t), n_merges=12, min_pair_count=1
        )
        want = _ref_train(_counts_of(texts), 12, min_pair_count=1)
        assert merges == want

    check()


def test_bpe_fixed_merge_chain_goldens(ray_session):
    """The ★bpe_encode_fixed merge table applies multi-level chains
    (t+h → th+e → the+␣) via the greedy lowest-rank loop — goldens
    pin the encode against hand-derived merge sequences."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __ray_entry__ import _BPE_FIXED_ALPHABET, _BPE_FIXED_MERGES
    from grass_ray.stages.bpe import _encode_word, bpe_vocab

    ranks = {p: i for i, p in enumerate(_BPE_FIXED_MERGES)}
    vocab = bpe_vocab(_BPE_FIXED_MERGES, _BPE_FIXED_ALPHABET)
    # 'the' chains t+h -> th+e -> the+EOW into ONE token
    assert _encode_word("the", ranks) == ("the ",)
    # 'other': o+u no, t+h wins first (rank 0) -> o,th,e,r,EOW; then
    # th+e (rank 1) -> o,the,r,EOW; e+' ' gone (consumed), e+r gone;
    # no pair of (o,the) (the,r) (r,EOW) in table -> 3 symbols + r EOW
    assert _encode_word("other", ranks) == ("o", "the", "r", " ")
    # standalone suffix merges: 'ring' -> r,in,g,EOW? i+n rank 7 wins
    # over in+g? in+g rank 13 needs 'in' first; then ing+EOW rank 14
    assert _encode_word("ring", ranks) == ("r", "ing ")
    # every golden symbol is in the shared vocab (no OOV possible)
    for w in ("the", "other", "ring", "sand", "order"):
        assert all(s in vocab for s in _encode_word(w, ranks))
