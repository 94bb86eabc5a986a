"""Parity: vectorized batch text kernels == per-row reference functions.

The per-row functions (`detect_language`, `quality_features`,
`count_tokens_ws/bpe`, `fingerprint`, `HashTokenizer._tok`) define the
semantics; `analyze_batch` / `_tok_batch` must produce bit-identical
values (they are the engine's hot path).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from grass_ray.functions import textstats as T
from grass_ray.sources.readers import HashTokenizer

EDGE = [
    "",
    "   ",
    "don't stop won't",
    "héllo wörld çafé",
    "a,b;c!",
    "der Hund ist nicht in dem Haus und die Katze",
    "the the the",
    "___ 123 abc_def",
    "x" * 5000,
    "\t\n mixed   spaces  ok",
    "日本語のテキストです",
    "café " * 40,
    "word'",
    "The Cat SAT on the mat and it was warm",
    "¡señor! ¿qué tal?  ÀÉÎÕÜ",
]


def _texts():
    t = (
        pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["text"]
        )
        .column("text")
        .to_pylist()
    )
    return t + EDGE


def test_analyze_batch_parity():
    texts = _texts()
    b = T.analyze_batch(texts)
    for i, t in enumerate(texts):
        lang, score = T.detect_language(t)
        q = T.quality_features(t)
        assert b["lang_pred"][i] == lang, (i, t[:40])
        assert b["lang_score"][i] == score
        assert b["n_tok_ws"][i] == T.count_tokens_ws(t)
        assert b["n_tok_bpe"][i] == T.count_tokens_bpe(t)
        assert b["fingerprint"][i] == T.fingerprint(t)
        for k in (
            "n_words",
            "mean_word_len",
            "punct_ratio",
            "stopword_ratio",
            "alpha_ratio",
            "unique_word_ratio",
            "quality_score",
        ):
            assert b[k][i] == q[k], (k, i, t[:40])


def test_repetition_batch_parity():
    texts = _texts() + ["a", "a a a a", "a b a b a b", "x y z x y z x y z"]
    b = T.analyze_batch(texts, features=("repetition",))
    for i, t in enumerate(texts):
        r = T.repetition_features(t)
        for k in ("top_word_frac", "dup_bigram_frac", "dup_trigram_frac"):
            assert b[k][i] == r[k], (k, i, t[:40])


def test_tokenizer_batch_parity():
    texts = _texts()
    tk = HashTokenizer()
    out = tk._tok_batch(texts).to_pylist()
    ref = HashTokenizer()
    for i, t in enumerate(texts):
        assert out[i] == ref._tok(t or ""), (i, t[:40])


def test_fingerprint_batch_v_matches_scalar():
    texts = ["", "a", "hello world", "hello world!", "é" * 100]
    got = T.fingerprint_batch_v(texts)
    want = np.array([T.fingerprint(t) for t in texts], dtype=np.int64)
    assert (got == want).all()


# --- property-based parity (random unicode) --------------------------------

from hypothesis import given, settings, strategies as st

_texty = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),  # no lone surrogates
        max_codepoint=0x2FFF,
    ),
    max_size=200,
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_texty, min_size=1, max_size=8))
def test_analyze_batch_parity_fuzz(texts):
    b = T.analyze_batch(texts)
    for i, t in enumerate(texts):
        lang, score = T.detect_language(t)
        q = T.quality_features(t)
        assert b["lang_pred"][i] == lang
        assert b["lang_score"][i] == score
        assert b["n_tok_ws"][i] == T.count_tokens_ws(t)
        assert b["n_tok_bpe"][i] == T.count_tokens_bpe(t)
        assert b["fingerprint"][i] == T.fingerprint(t)
        for k in ("n_words", "mean_word_len", "punct_ratio", "stopword_ratio",
                  "alpha_ratio", "quality_score"):
            assert b[k][i] == q[k], (k, repr(t))


@settings(max_examples=40, deadline=None)
@given(st.lists(_texty, min_size=1, max_size=6))
def test_repetition_parity_fuzz(texts):
    b = T.analyze_batch(texts, features=("repetition",))
    for i, t in enumerate(texts):
        r = T.repetition_features(t)
        for k in ("top_word_frac", "dup_bigram_frac", "dup_trigram_frac"):
            assert b[k][i] == r[k], (k, repr(t))


@settings(max_examples=60, deadline=None)
@given(st.lists(_texty, min_size=1, max_size=8))
def test_tokenizer_batch_parity_fuzz(texts):
    tk = HashTokenizer()
    out = tk._tok_batch(texts).to_pylist()
    ref = HashTokenizer()
    for i, t in enumerate(texts):
        assert out[i] == ref._tok(t or ""), repr(t)
