"""Property tests for the md5-oracle contract: on ANY ascii corpus the
engine's md5 hash paths must equal the DuckDB SQL derivations the
exact oracles are built from (word hash, shingle polynomial, minhash
signature) — random corpora probe the edge shapes (repeated words,
apostrophes, short docs, punctuation runs) the fixed testdata misses.
"""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from grass_ray.functions import textstats as T
from grass_ray.stages import dedup as D

# ascii word-ish soup incl. apostrophes, punctuation, digits, repeats
_word = st.sampled_from(
    ["the", "cat", "cat", "don't", "x1", "_u_", "a", "lorem", "42", "!?;", "w'"]
)
_text = st.lists(_word, min_size=0, max_size=24).map(" ".join)


@st.composite
def corpora(draw):
    return draw(st.lists(_text, min_size=1, max_size=8))


@settings(max_examples=25, deadline=None)
@given(corpora())
def test_md5_word_hash_matches_duckdb(texts):
    con = duckdb.connect()
    for t in texts:
        words = [w.lower() for w in T.WORD_RE.findall(t)]
        if not words:
            continue
        got = [int(x) for x in T._word_ids(words, hash_fn="md5")]
        ref = [
            con.execute("SELECT md5_number_lower(?)", [w]).fetchone()[0]
            for w in words
        ]
        assert got == ref


@settings(max_examples=25, deadline=None)
@given(corpora(), st.sampled_from([2, 5]))
def test_md5_shingles_match_sql_polynomial(texts, k):
    B, M = 1099511628211, 1 << 64
    con = duckdb.connect()
    flat, lens = T.kgram_hashes_batch(texts, k, hash_fn="md5")
    per_doc = np.split(flat, np.cumsum(lens)[:-1])
    for t, g in zip(texts, per_doc):
        rows = con.execute(
            r"""WITH w AS (SELECT unnest(list_transform(
                    regexp_extract_all(?, '[\w'']+'), x -> lower(x))) AS word),
            i AS (SELECT CAST(md5_number_lower(word) AS HUGEINT) AS id,
                         row_number() OVER () - 1 AS wi FROM w)
            SELECT id FROM i ORDER BY wi""",
            [t],
        ).fetchall()
        ids = [r[0] for r in rows]
        if not ids:
            assert len(g) == 0
            continue
        if len(ids) < k:
            hs = [sum(x * pow(B, j, M) for j, x in enumerate(ids)) % M]
        else:
            hs = [
                sum(ids[s + j] * pow(B, j, M) for j in range(k)) % M
                for s in range(len(ids) - k + 1)
            ]
        assert list(g) == sorted(set(h >> 1 for h in hs)), (t, k)


@settings(max_examples=15, deadline=None)
@given(corpora())
def test_md5_minhash_signature_matches_int_reference(texts):
    # sig_i = min over shingles of ((a_i*h + b_i) mod 2^64) >> 1 —
    # the exact formula _minhash_md5_sql inlines as SQL
    M = 1 << 64
    a, b = D._perm_params(8)
    flat, lens = T.kgram_hashes_batch(texts, 5, hash_fn="md5")
    sigs = D.minhash_signature_batch(flat, lens, a, b)
    per_doc = np.split(flat, np.cumsum(lens)[:-1])
    for i, g in enumerate(per_doc):
        if len(g) == 0:
            assert all(s == np.iinfo(np.int64).max for s in sigs[i])
            continue
        for p in range(8):
            ref = min(((int(a[p]) * int(h) + int(b[p])) % M) >> 1 for h in g)
            assert sigs[i][p] == ref
