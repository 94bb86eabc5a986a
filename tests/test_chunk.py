"""Fixed-length chunking: distributed prefix-scan offsets + assembly."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from grass_ray.sources.corpus import corpus_from_documents
from grass_ray.stages.chunk import chunk_stats, chunk_tokens, doc_offsets

SF = "/root/testdata/sf0.001"


def _reference_stream():
    """Concatenated token stream in doc-index order (None = null)."""
    import pyarrow.parquet as pq

    from grass_ray.sources.corpus import NULL_MOD, NULL_RESIDUE, TOKEN_MOD

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    rows = sorted(zip(t.column("doc_id").to_pylist(), t.column("n_chars").to_pylist()))
    stream = []
    for did, n in rows:
        for i in range(n):
            if (31 * i + did) % NULL_MOD == NULL_RESIDUE:
                stream.append(None)
            else:
                stream.append((7 * i + did) % TOKEN_MOD)
    return stream


def test_doc_offsets_are_exclusive_prefix_sums(ray_session):
    ds = corpus_from_documents(SF)
    offs = doc_offsets(ds, docs_per_partition=100).to_pandas()
    offs = offs.sort_values("doc_id").reset_index(drop=True)
    expect = np.concatenate([[0], np.cumsum(offs["n_tok"].to_numpy())[:-1]])
    assert (offs["offset"].to_numpy() == expect).all()


def test_chunk_tokens_reconstructs_stream(ray_session):
    L = 128
    ds = corpus_from_documents(SF)
    out = chunk_tokens(ds, L, docs_per_partition=100).to_pandas()
    out = out.sort_values("chunk_id").reset_index(drop=True)
    stream = _reference_stream()
    n_chunks = (len(stream) + L - 1) // L
    assert len(out) == n_chunks
    got = []
    for _i, r in out.iterrows():
        toks = list(r["tokens"])
        assert len(toks) == L or r["chunk_id"] == n_chunks - 1
        got.extend(None if x is None or (isinstance(x, float) and np.isnan(x)) else int(x) for x in toks)
    assert got == stream


def test_chunk_stats_matches_stream(ray_session):
    L = 200
    ds = corpus_from_documents(SF)
    out = chunk_stats(ds, L, docs_per_partition=100).to_pandas()
    stream = _reference_stream()
    want_cnt: dict = {}
    want_sum: dict = {}
    for i, v in enumerate(stream):
        c = i // L
        if v is not None:
            want_cnt[c] = want_cnt.get(c, 0) + 1
            want_sum[c] = want_sum.get(c, 0) + v
    got = {int(r["chunk_id"]): (int(r["cnt"]), float(r["sum_tok"])) for _i, r in out.iterrows()}
    assert got == {c: (want_cnt.get(c, 0), float(want_sum.get(c, 0))) for c in got}
    assert set(got) == set(range((len(stream) + L - 1) // L))
