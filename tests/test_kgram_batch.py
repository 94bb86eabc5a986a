"""Parity: whole-batch k-gram / minhash / simhash / word-count kernels
== the per-row reference functions they replace on the hot path.

`shingles` / `vocab._gram_hashes` / `minhash_signature` and a literal
Counter fold define the semantics; `kgram_hashes_batch`,
`minhash_signature_batch`, `simhash64_batch` and `word_count_batch`
must produce bit-identical values.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow.parquet as pq

from grass_ray.functions import textstats as T
from grass_ray.stages import dedup as D
from grass_ray.stages import vocab as V

EDGE = [
    "",
    "   ",
    "don't stop won't",
    "héllo wörld çafé héllo wörld çafé words enough for grams",
    "a,b;c!",
    "one two",  # < k words -> short-doc rule
    "the the the the the the the",  # duplicate shingles collapse
    "___ 123 abc_def tail word five six seven",
    "x" * 5000,
    "\t\n mixed   spaces  ok tail word five six seven",
    "日本語のテキストです and some ascii words here too",
    "café " * 40,
    "word'",
    "The Cat SAT on the mat and it was warm",
    "¡señor! ¿qué tal?  ÀÉÎÕÜ tail word five six seven",
    "ab" + "c" * 3000 + " trailing words one two three four five",
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


def _split(flat, lens):
    offs = np.concatenate([[0], np.cumsum(lens)])
    return [flat[offs[i] : offs[i + 1]] for i in range(len(lens))]


def test_kgram_batch_parity_shingles():
    for k in (2, 5):
        texts = _texts()
        flat, lens = T.kgram_hashes_batch(texts, k)
        per_doc = _split(flat, lens)
        for i, t in enumerate(texts):
            ref = T.shingles(t, k)
            got = per_doc[i]
            assert np.array_equal(np.sort(ref), got), (k, i, t[:40])


def test_kgram_batch_parity_gram_hashes():
    rx = re.compile(V.ASCII_WORD)
    for k in (3, 13):
        texts = _texts()
        flat, lens = T.kgram_hashes_batch(
            texts, k, ascii_words=True, short_doc_hash=False
        )
        per_doc = _split(flat, lens)
        for i, t in enumerate(texts):
            ref = V._gram_hashes(t, k, rx)
            assert np.array_equal(ref, per_doc[i]), (k, i, t[:40])


def test_batch_grams_custom_pattern_fallback():
    # non-standard word class must route through the per-row reference
    rx = re.compile(r"[a-z]+")
    texts = ["abc def ghi 123 jkl", "x1y2z3"]
    flat, lens = V._batch_grams(texts, 2, rx)
    per_doc = _split(flat, lens)
    for i, t in enumerate(texts):
        assert np.array_equal(V._gram_hashes(t, 2, rx), per_doc[i])


def test_minhash_signature_batch_parity():
    a, b = D._perm_params(32)
    texts = _texts()
    flat, lens = T.kgram_hashes_batch(texts, 5)
    sigs = D.minhash_signature_batch(flat, lens, a, b)
    for i, t in enumerate(texts):
        ref = D.minhash_signature(T.shingles(t, 5), a, b)
        assert np.array_equal(ref, sigs[i]), (i, t[:40])


def test_simhash_batch_parity():
    texts = _texts()
    got = D.simhash64_batch(texts)
    # literal per-row reference: frequency-weighted sign sum of word
    # hash bits over WORD_RE of the lowered text
    for i, t in enumerate(texts):
        words = T.WORD_RE.findall((t or "").lower())
        if not words:
            assert got[i] == 0
            continue
        ids = T._word_ids(words)
        acc = np.zeros(64, dtype=np.int64)
        for wid in ids:
            bits = (wid >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        ref = np.uint64(0)
        for j in range(64):
            if acc[j] > 0:
                ref |= np.uint64(1) << np.uint64(j)
        assert np.uint64(got[i]) == ref or got[i] == int(
            np.int64(ref)
        ), (i, t[:40])


def test_word_count_batch_parity():
    rx = re.compile(V.ASCII_WORD)
    texts = _texts()
    words, cnts = T.word_count_batch(texts)
    got = dict(zip(words, (int(c) for c in cnts)))
    ref: Counter = Counter()
    for t in texts:
        ref.update(rx.findall((t or "").lower()))
    assert got == dict(ref)


def test_simhash_md5_matches_duckdb():
    # hash_fn="md5" defines the word hash as DuckDB's md5_number_lower
    # — the contract behind the exact ★simhash_candidates_md5 oracle
    import duckdb

    # ASCII-only: Python \w is unicode, RE2 \w is ASCII — the oracle
    # contract (like fingerprint_docs) holds on the ASCII corpus
    texts = [t for t in _texts() if (t or "").isascii()]
    assert texts
    got = D.simhash64_batch(texts, hash_fn="md5")
    con = duckdb.connect()
    for i, t in enumerate(texts):
        ref = con.execute(
            r"""WITH w AS (SELECT unnest(regexp_extract_all(lower(?),
                                  '[\w'']+')) AS word),
            bits AS (
                SELECT bb.bit,
                       2 * sum(CASE WHEN (md5_number_lower(word) >> bb.bit)
                                         & 1 = 1 THEN 1 ELSE 0 END)
                           - count(*) AS acc
                FROM w CROSS JOIN (SELECT unnest(range(0, 63)) AS bit) bb
                GROUP BY 1
            )
            SELECT COALESCE(CAST(sum(CASE WHEN acc > 0
                        THEN CAST(1 AS HUGEINT) << bit
                        ELSE 0 END) AS BIGINT), 0) FROM bits""",
            [t or ""],
        ).fetchone()[0]
        assert got[i] == ref, (i, t[:40])


def test_kgram_md5_matches_int_reference():
    # hash_fn="md5" shingle hash: h(s) = (Σ_j md5lower(word[s+j])·B^j
    # mod 2^64) >> 1, distinct ascending per doc — pure-int reference
    import hashlib

    B = 1099511628211
    M = 1 << 64

    def md5l(w):
        return int.from_bytes(hashlib.md5(w.encode()).digest()[8:16], "little")

    texts = ["the quick brown fox jumps over the lazy dog", "tiny doc", ""]
    flat, lens = T.kgram_hashes_batch(texts, 5, hash_fn="md5")
    got = np.split(flat, np.cumsum(lens)[:-1])
    for t, g in zip(texts, got):
        words = [w.lower() for w in T.WORD_RE.findall(t)]
        if not words:
            assert len(g) == 0
            continue
        if len(words) < 5:
            hs = [sum(md5l(w) * pow(B, j, M) for j, w in enumerate(words)) % M]
        else:
            hs = [
                sum(md5l(words[s + j]) * pow(B, j, M) for j in range(5)) % M
                for s in range(len(words) - 4)
            ]
        ref = sorted(set(h >> 1 for h in hs))
        assert list(g) == ref, t


def test_unknown_hash_fn_rejected():
    import pytest

    with pytest.raises(ValueError, match="hash_fn"):
        T._word_ids(["x"], hash_fn="sha1")
    with pytest.raises(ValueError, match="hash_fn"):
        T.kgram_hashes_batch(["some words here"], 2, hash_fn="blake2")
