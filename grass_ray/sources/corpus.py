"""Corpus sources: the canonical pre-tokenized sequence table.

Schema (BASELINE input_hint / FIXTURES F0)::

    doc_id : string       # "d0000042"
    tokens : list<int32>  # token values; position index = sample time
    n_tok  : int32        # len(tokens)
    source : string       # granule grouping key

Two generators:

* :func:`corpus_from_documents` — derives the corpus *deterministically*
  from the driver's ``documents.parquet`` table so the DuckDB oracle can
  reproduce the exact same tokens in SQL (:func:`corpus_sql`):
  ``tokens[i] = (7*i + doc_id) % 32003`` with a NULL injected where
  ``(31*i + doc_id) % 97 == 13`` and ``n_tok = n_chars``.
* :func:`synth_corpus` — standalone deterministic generator for tests and
  benchmarks (skewed sources, fixed n_tok), FIXTURES F0/F5.

Plays the role of ``t.register`` ingest in the reference
(``python/grass/temporal/register.py:37-470``): rows enter the engine
with their granule key (source, doc_id) and implicit sample times
(token positions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TOKEN_MOD = 32003
NULL_MOD = 97
NULL_RESIDUE = 13

CORPUS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def _tokens_list_array(doc_ids: np.ndarray, n_toks: np.ndarray) -> pa.ListArray:
    """Vectorized token synthesis for a batch of docs.

    tokens[i] = (7*i + doc_id) % TOKEN_MOD, NULL where
    (31*i + doc_id) % NULL_MOD == NULL_RESIDUE.
    """
    n_toks = n_toks.astype(np.int64)
    total = int(n_toks.sum())
    row_of = np.repeat(np.arange(len(n_toks)), n_toks)
    starts = np.zeros(len(n_toks), dtype=np.int64)
    np.cumsum(n_toks[:-1], out=starts[1:])
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, n_toks)
    did = doc_ids[row_of]
    vals = ((7 * pos + did) % TOKEN_MOD).astype(np.int32)
    is_null = ((31 * pos + did) % NULL_MOD) == NULL_RESIDUE
    values = pa.array(vals, type=pa.int32(), mask=is_null)
    offsets = pa.array(
        np.concatenate([[0], np.cumsum(n_toks)]).astype(np.int32)
    )
    return pa.ListArray.from_arrays(offsets, values)


def make_corpus_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: documents(doc_id, source, n_chars) -> corpus."""
    did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    n_chars = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
    tokens = _tokens_list_array(did, n_chars)
    doc_id = pa.array([f"d{int(d):07d}" for d in did], type=pa.string())
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(n_chars.astype(np.int32)),
            "source": batch.column("source"),
        }
    )


def corpus_from_documents(sf_dir: str, **read_kwargs):
    """Read documents.parquet and derive the deterministic corpus.

    Column-pruned read (only doc_id, source, n_chars leave storage) —
    the token payload is synthesized in the map stage.
    """
    from grass_ray.sources.readers import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
        # the map stage expands each row into ~n_chars int32 tokens —
        # size blocks by the post-expansion bytes, not the input file
        size_multiplier=24.0,
        **read_kwargs,
    )
    return ds.map_batches(make_corpus_batch, batch_format="pyarrow")


def corpus_sql(inner: str = "documents") -> str:
    """DuckDB CTE body producing the exploded (doc_id, source, pos, token)
    stream identical to :func:`corpus_from_documents` + explode.

    Use as::

        WITH tok AS ({corpus_sql()}) SELECT ... FROM tok ...
    """
    return f"""
        SELECT
            'd' || lpad(CAST(d.doc_id AS VARCHAR), 7, '0') AS doc_id,
            d.source AS source,
            i AS pos,
            CASE WHEN ((31 * i + d.doc_id) % {NULL_MOD}) = {NULL_RESIDUE}
                 THEN NULL
                 ELSE (7 * i + d.doc_id) % {TOKEN_MOD}
            END AS token
        FROM {inner} AS d
        CROSS JOIN UNNEST(range(0, d.n_chars)) AS u(i)
    """


# ---------------------------------------------------------------------------
# standalone synthetic corpus (tests / bench, FIXTURES F0+F5)
# ---------------------------------------------------------------------------


def synth_corpus_table(
    n_docs: int,
    *,
    n_tok: int | None = None,
    seed: int = 42,
    skew: float = 0.0,
    n_sources: int = 20,
    start_doc: int = 0,
) -> pa.Table:
    """Deterministic corpus slab as one Arrow table.

    skew > 0 sends ~`skew` fraction of docs to source "src_hot"
    (FIXTURES F5: one hot source ≈ 30% of rows) — used by the salted
    groupby and skew benchmarks.  `n_tok=None` draws lengths from
    {40, 61, 100, 1440, 2880} to exercise partial windows (FIXTURES F0).
    """
    rng = np.random.default_rng(seed + start_doc)
    did = np.arange(start_doc, start_doc + n_docs, dtype=np.int64)
    if n_tok is None:
        lens = rng.choice([40, 61, 100, 1440, 2880], size=n_docs).astype(np.int64)
    else:
        lens = np.full(n_docs, n_tok, dtype=np.int64)
    src_idx = rng.integers(0, n_sources, size=n_docs)
    sources = np.array([f"src{int(s)}" for s in src_idx], dtype=object)
    if skew > 0:
        hot = rng.random(n_docs) < skew
        sources[hot] = "src_hot"
    tokens = _tokens_list_array(did, lens)
    return pa.table(
        {
            "doc_id": pa.array([f"d{int(d):07d}" for d in did]),
            "tokens": tokens,
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": pa.array(list(sources), type=pa.string()),
        }
    )


def synth_corpus(
    n_docs: int,
    *,
    n_tok: int | None = None,
    seed: int = 42,
    skew: float = 0.0,
    n_sources: int = 20,
    docs_per_block: int = 2000,
):
    """Deterministic synthetic corpus as a Ray Dataset.

    Generated block-parallel: a tiny seed dataset of block descriptors is
    expanded inside ``map_batches`` so no large table ever materializes on
    the driver — the generator itself streams at scale.
    """
    import ray.data

    blocks = []
    start = 0
    while start < n_docs:
        n = min(docs_per_block, n_docs - start)
        blocks.append({"start_doc": start, "n_docs": n})
        start += n

    def expand(batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            outs.append(
                synth_corpus_table(
                    row["n_docs"],
                    n_tok=n_tok,
                    seed=seed,
                    skew=skew,
                    n_sources=n_sources,
                    start_doc=row["start_doc"],
                )
            )
        return pa.concat_tables(outs)

    seed_ds = ray.data.from_items(blocks)
    return seed_ds.map_batches(
        expand, batch_format="pyarrow", batch_size=1
    )
