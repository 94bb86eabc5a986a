"""Corpus ingestion from jsonl/csv/textdir + hash tokenizer."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from grass_ray.sources.readers import (
    HashTokenizer,
    read_corpus_csv,
    read_corpus_jsonl,
    read_corpus_textdir,
    tokenize_text,
)


def test_hash_tokenizer_deterministic():
    t1 = HashTokenizer(vocab_size=1000)
    t2 = HashTokenizer(vocab_size=1000)
    toks = t1._tok("Hello, world! hello")
    assert toks == t2._tok("Hello, world! hello")
    assert len(toks) == 5  # hello , world ! hello
    assert toks[0] == toks[4]  # case-folded repeat
    assert all(0 <= t < 1000 for t in toks)


def test_hash_tokenizer_md5_matches_duckdb():
    # hash_fn="md5" is DEFINED as DuckDB's md5_number_lower % vocab —
    # the contract behind the exact ★tokenize_rollup_md5 oracle
    import duckdb

    tk = HashTokenizer(vocab_size=32000, hash_fn="md5")
    text = "The quick-BROWN fox, 42 times; _under_ scored!"
    toks = tk._tok(text)
    con = duckdb.connect()
    sql = con.execute(
        r"""SELECT list(CAST(md5_number_lower(w) % 32000 AS INT) ORDER BY i)
            FROM (SELECT unnest(ws) AS w, generate_subscripts(ws, 1) AS i
                  FROM (SELECT regexp_extract_all(lower(?),
                               '\w+|[^\w\s]') AS ws))""",
        [text],
    ).fetchone()[0]
    assert toks == sql
    # the vectorized batch path agrees with the per-row path
    batch_toks = tk._tok_batch([text, "", text.upper()]).to_pylist()
    assert batch_toks == [toks, [], tk._tok(text.upper())]


def test_tokenize_documents_rollup(ray_session):
    """Real text -> tokens -> windowed rollup end to end."""
    import ray.data

    from grass_ray.stages.rollup import rollup

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "source"],
    )
    corpus = tokenize_text(docs, vocab_size=32000)
    out = rollup(corpus, 16, ("count", "sum")).to_pandas()
    assert len(out) > 500
    assert (out["count"] <= 16).all()


def test_read_corpus_jsonl(ray_session, tmp_path):
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"doc_id": 1, "tokens": [1, 2, 3], "source": "a"}) + "\n")
        f.write(json.dumps({"doc_id": 2, "tokens": [4, 5], "source": "b"}) + "\n")
    out = read_corpus_jsonl(str(p)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == ["d0000001", "d0000002"]
    assert list(out["n_tok"]) == [3, 2]
    # text variant
    p2 = tmp_path / "docs_text.jsonl"
    with open(p2, "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "one two three", "source": "a"}) + "\n")
    out2 = read_corpus_jsonl(str(p2)).to_pandas()
    assert out2["n_tok"][0] == 3


def test_read_corpus_csv(ray_session, tmp_path):
    p = tmp_path / "docs.csv"
    with open(p, "w") as f:
        f.write("doc_id,text,source\n")
        f.write('7,"alpha beta gamma",web\n')
    out = read_corpus_csv(str(p)).to_pandas()
    assert out["doc_id"][0] == "d0000007"
    assert out["n_tok"][0] == 3
    assert out["source"][0] == "web"


def test_read_corpus_textdir(ray_session, tmp_path):
    d = tmp_path / "txt"
    os.makedirs(d)
    (d / "docA.txt").write_text("the quick brown fox")
    (d / "docB.txt").write_text("lazy dog")
    out = read_corpus_textdir(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == ["docA", "docB"]
    assert list(out["n_tok"]) == [4, 2]
    assert (out["source"] == "files").all()


def test_snap_blocks_to_files_properties():
    """Invariants of the file-boundary snap: never more blocks than
    asked, never a fatter max files-per-task than the unsnapped split,
    skewed file sizes and pre-split inputs left alone."""
    from hypothesis import given, strategies as st

    from grass_ray.sources.readers import snap_blocks_to_files

    @given(
        st.integers(min_value=1, max_value=500),
        st.integers(min_value=1, max_value=200),
    )
    def check(f, n):
        sizes = [100] * f  # uniform
        out = snap_blocks_to_files(n, sizes)
        if f < n:
            assert out == n  # files already split further by Ray
        else:
            assert 1 <= out <= n
            # max files any task carries never exceeds the unsnapped
            # split's max, and the snapped split is even
            per = -(-f // n)
            assert -(-f // out) == per
            assert out == -(-f // per)

    check()
    # skew guard: max > 2x min -> untouched
    assert snap_blocks_to_files(64, [100] * 119 + [300]) == 64
    assert snap_blocks_to_files(0, [100]) == 0
    assert snap_blocks_to_files(64, []) == 64
