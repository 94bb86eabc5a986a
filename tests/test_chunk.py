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


def _reference_pack(L):
    """Reference packing of the NON-NULL stream: per-doc kept spans."""
    import pyarrow.parquet as pq

    from grass_ray.sources.corpus import NULL_MOD, NULL_RESIDUE

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    rows = sorted(zip(t.column("doc_id").to_pylist(), t.column("n_chars").to_pylist()))
    spans = []
    off = 0
    for did, n in rows:
        kept = sum(
            1 for i in range(n) if (31 * i + did) % NULL_MOD != NULL_RESIDUE
        )
        s, e = off, off + kept
        off = e
        if e == s:
            continue
        for b in range(s // L, (e - 1) // L + 1):
            lo, hi = max(s, b * L), min(e, (b + 1) * L)
            spans.append((b, f"d{did:07d}", lo - b * L, hi - lo))
    return spans, off


def test_pack_spans_global_matches_reference(ray_session):
    from grass_ray.stages.chunk import pack_spans_global

    L = 300
    ds = corpus_from_documents(SF)
    out = pack_spans_global(ds, L, docs_per_partition=100).to_pandas()
    got = sorted(
        (int(r["block_id"]), r["doc_id"], int(r["span_start"]), int(r["span_len"]))
        for _i, r in out.iterrows()
    )
    want, total = _reference_pack(L)
    assert got == sorted(want)
    # spans tile every block exactly
    per_block = out.groupby("block_id")["span_len"].sum()
    n_blocks = (total + L - 1) // L
    assert len(per_block) == n_blocks
    assert (per_block.iloc[:-1] == L).all() if n_blocks > 1 else True
    assert per_block.sum() == total


def test_pack_blocks_global_layout_independent(ray_session):
    from grass_ray.stages.chunk import pack_blocks_global

    L = 300
    ds = corpus_from_documents(SF)
    a = pack_blocks_global(ds, L, docs_per_partition=100).to_pandas()
    b = pack_blocks_global(
        ds.repartition(7), L, docs_per_partition=23
    ).to_pandas()
    a = a.sort_values("block_id").reset_index(drop=True)
    b = b.sort_values("block_id").reset_index(drop=True)
    assert a.equals(b)
    want, total = _reference_pack(L)
    n_docs = {}
    for blk, _d, _s, _l in want:
        n_docs[blk] = n_docs.get(blk, 0) + 1
    assert dict(zip(a["block_id"], a["n_docs"])) == n_docs
    assert int(a["n_tok"].sum()) == total


def test_pack_empty_and_single_doc(ray_session):
    from grass_ray.stages.chunk import pack_blocks_global, pack_spans_global

    empty = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.string()),
                "tokens": pa.array([], type=pa.list_(pa.int32())),
            }
        )
    )
    assert pack_spans_global(empty, 16).count() == 0
    one = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["d0000001"]),
                "tokens": pa.array(
                    [[1, None, 3, 4, 5]], type=pa.list_(pa.int32())
                ),
            }
        )
    )
    t = pack_blocks_global(one, 3).to_pandas().sort_values("block_id")
    # 4 non-null tokens -> blocks of 3 + 1
    assert list(t["n_tok"]) == [3, 1]
    assert list(t["n_docs"]) == [1, 1]
