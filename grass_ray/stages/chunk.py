"""Fixed-length training-sequence chunking over the corpus token stream.

The final step of a training-data pipeline: concatenate every document's
tokens in deterministic (doc-index) order and cut the stream into
fixed-length sequences that may cross document boundaries.

The global position of each document is a distributed PREFIX SCAN:

1. per-partition token totals — a tiny aggregate (one row per range
   partition, partition count grows with data but each row is 16 bytes);
2. the driver prefix-sums the sorted partition totals (bounded: ~5×10⁵
   rows at 100 TB) and broadcasts the base offsets via ``ray.put``;
3. each partition computes its documents' offsets locally (sorted
   within-partition cumsum) — no all-to-all for the scan itself.

``chunk_stats`` then aggregates per-chunk (count, sum) with per-block
Arrow partials before one narrow exchange — the oracle-checkable form.
``chunk_tokens`` materializes the actual fixed-length sequences (a full
token exchange grouped by chunk — inherent to re-chunking).

Deterministic: same corpus → same chunks, independent of block layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from grass_ray.pipelines.tiers import _doc_index_array


def doc_offsets(ds, *, docs_per_partition: int = 2000, id_col: str = "doc_id",
                len_col: str = "n_tok"):
    """(doc_id, n_tok, offset) — offset = total tokens of all docs with a
    smaller doc index (the distributed prefix scan described above)."""
    import ray
    from ray.data.aggregate import Sum

    def with_part(batch: pa.Table) -> pa.Table:
        idx = _doc_index_array(batch.column(id_col))
        part = (idx // docs_per_partition).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "_idx": pa.array(idx),
                len_col: batch.column(len_col).cast(pa.int64()),
                "_part": pa.array(part),
            }
        )

    narrow = ds.map_batches(with_part, batch_format="pyarrow").materialize()
    totals = (
        narrow.groupby("_part").aggregate(Sum(len_col, alias_name="_total"))
    ).to_pandas()
    if len(totals) == 0:  # empty input: aggregate loses its schema
        bases = {}
    else:
        totals = totals.sort_values("_part")
        bases = dict(
            zip(
                totals["_part"].astype(int),
                np.concatenate([[0], np.cumsum(totals["_total"].to_numpy())[:-1]]).astype(np.int64),
            )
        )
    ref = ray.put(bases)

    def per_part(batch: pa.Table) -> pa.Table:
        b = ray.get(ref)
        idx = batch.column("_idx").to_numpy(zero_copy_only=False)
        lens = batch.column(len_col).to_numpy(zero_copy_only=False)
        part = batch.column("_part").to_numpy(zero_copy_only=False)
        order = np.argsort(idx, kind="stable")
        off = np.empty(len(idx), dtype=np.int64)
        lo = lens[order]
        po = part[order]
        cum = np.concatenate([[0], np.cumsum(lo)[:-1]])
        # restart the cumsum at each partition boundary and add the base
        starts = np.flatnonzero(
            np.concatenate([[True], po[1:] != po[:-1]])
        )
        seg_base = np.repeat(cum[starts], np.diff(np.concatenate([starts, [len(po)]])))
        off[order] = cum - seg_base + np.array([b[int(p)] for p in po], dtype=np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                len_col: batch.column(len_col),
                "offset": pa.array(off),
            }
        )

    # partition rows are co-located per batch only under range reads; a
    # groupby makes the per-partition cumsum correct for ANY layout
    return (
        narrow.groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
    )


def chunk_stats(corpus_ds, seq_len: int, *, docs_per_partition: int = 2000):
    """(chunk_id, cnt, sum_tok) per fixed-length chunk of the global
    token stream — per-block Arrow partials, one narrow exchange."""
    from grass_ray.stages.join import attach_column

    offs = doc_offsets(corpus_ds, docs_per_partition=docs_per_partition)
    with_off = attach_column(
        corpus_ds, offs.map_batches(
            lambda b: b.select(["doc_id", "offset"]), batch_format="pyarrow"
        ),
        key_col="doc_id", lookup_key="doc_id", value_col="offset",
        out_col="offset",
    )

    def partial(batch: pa.Table) -> pa.Table:
        toks = batch.column("tokens")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = toks.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        vals = flat.to_numpy(zero_copy_only=False).astype(np.float64)
        null_mask = flat.is_null().to_numpy(zero_copy_only=False)
        off = batch.column("offset").to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(starts, lens)
        gpos = np.repeat(off, lens) + pos
        chunk = gpos // seq_len
        t = pa.table(
            {
                "chunk_id": pa.array(chunk),
                "_n": pa.array((~null_mask).astype(np.int64)),
                "_s": pa.array(np.where(null_mask, 0.0, vals)),
            }
        )
        agg = t.group_by("chunk_id", use_threads=False).aggregate(
            [("_n", "sum"), ("_s", "sum")]
        )
        return agg.rename_columns(["chunk_id", "cnt", "sum_tok"])

    partials = with_off.map_batches(partial, batch_format="pyarrow")
    from grass_ray.stages.join import bucket_agg

    return bucket_agg(
        partials,
        ["chunk_id"],
        [("cnt", "sum", "cnt"), ("sum_tok", "sum", "sum_tok")],
    )


def _kept_lengths(col) -> np.ndarray:
    """Per-doc count of NON-NULL tokens in a list<int32> column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = np.asarray(
        col.value_lengths().to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    valid = col.flatten().is_valid().to_numpy(zero_copy_only=False)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    kept = np.zeros(len(lens), dtype=np.int64)
    if (lens > 0).any():
        kept[lens > 0] = np.add.reduceat(
            valid.astype(np.int64), starts[lens > 0]
        )
    return kept


def pack_spans_global(
    corpus_ds,
    block_len: int = 2048,
    *,
    docs_per_partition: int = 2000,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
):
    """Globally-consistent sequence packing: doc spans over fixed
    ``block_len`` blocks of the whole-corpus NON-NULL token stream in
    doc-index order — independent of Ray block layout (the per-Ray-block
    variant is :func:`grass_ray.stages.curate.pack_sequences`).

    Plan: per-doc kept length map-side → distributed prefix scan
    (:func:`doc_offsets`, driver fold bounded by the partition count) →
    each doc independently explodes into its overlapping blocks
    map-side.  No token exchange at all: the spans are pure arithmetic
    on (offset, kept_len), so 100 TB of tokens never move.

    Returns (block_id, doc_id, span_start, span_len) — span_start is
    the offset within the block; spans cover every block exactly
    (sum(span_len) per block == block_len except the final block).
    """

    def kept_kernel(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_kept": pa.array(_kept_lengths(batch.column(tokens_col))),
            }
        )

    kept = corpus_ds.map_batches(kept_kernel, batch_format="pyarrow")
    offs = doc_offsets(
        kept, docs_per_partition=docs_per_partition, id_col=id_col,
        len_col="n_kept",
    )

    def spans(batch: pa.Table) -> pa.Table:
        n = batch.column("n_kept").to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch.column("offset").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        pos = np.flatnonzero(n > 0)
        s2, e2 = s[pos], s[pos] + n[pos]
        b0, b1 = s2 // block_len, (e2 - 1) // block_len
        counts = b1 - b0 + 1
        total = int(counts.sum())
        row_of = np.repeat(np.arange(len(pos)), counts)
        starts = np.zeros(len(pos), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        blk = b0[row_of] + (np.arange(total, dtype=np.int64) - np.repeat(starts, counts))
        lo = np.maximum(s2[row_of], blk * block_len)
        hi = np.minimum(e2[row_of], (blk + 1) * block_len)
        return pa.table(
            {
                "block_id": pa.array(blk),
                id_col: ids.take(pa.array(pos[row_of])),
                "span_start": pa.array(lo - blk * block_len),
                "span_len": pa.array(hi - lo),
            }
        )

    return offs.map_batches(spans, batch_format="pyarrow")


def pack_blocks_global(corpus_ds, block_len: int = 2048, **kw):
    """Per-block aggregates of :func:`pack_spans_global`:
    (block_id, n_tok, n_docs) — one narrow bucket exchange over span
    rows (≤ docs + total_tokens/block_len rows, never the tokens)."""
    from grass_ray.stages.join import bucket_agg

    spans = pack_spans_global(corpus_ds, block_len, **kw)

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "block_id": batch.column("block_id"),
                "n_tok": batch.column("span_len"),
                "n_docs": pa.array(np.ones(len(batch), dtype=np.int64)),
            }
        )

    return bucket_agg(
        spans.map_batches(narrow, batch_format="pyarrow"),
        ["block_id"],
        [("n_tok", "sum", "n_tok"), ("n_docs", "sum", "n_docs")],
    )


def chunk_tokens(corpus_ds, seq_len: int, *, docs_per_partition: int = 2000,
                 buckets: int = 64):
    """(chunk_id, tokens list<int32>) fixed-length sequences — the full
    re-chunk: tokens exchange once grouped by chunk bucket, each chunk
    assembled in global-position order (the last partial chunk keeps its
    remainder length)."""
    from grass_ray.stages.join import attach_column

    offs = doc_offsets(corpus_ds, docs_per_partition=docs_per_partition)
    with_off = attach_column(
        corpus_ds, offs.map_batches(
            lambda b: b.select(["doc_id", "offset"]), batch_format="pyarrow"
        ),
        key_col="doc_id", lookup_key="doc_id", value_col="offset",
        out_col="offset",
    )

    def explode(batch: pa.Table) -> pa.Table:
        toks = batch.column("tokens")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = toks.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        off = batch.column("offset").to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(starts, lens)
        gpos = np.repeat(off, lens) + pos
        chunk = gpos // seq_len
        return pa.table(
            {
                "chunk_id": pa.array(chunk),
                "gpos": pa.array(gpos),
                "token": flat,
                "_bucket": pa.array((chunk % buckets).astype(np.int32)),
            }
        )

    def assemble(batch: pa.Table) -> pa.Table:
        chunk = batch.column("chunk_id").to_numpy(zero_copy_only=False)
        gpos = batch.column("gpos").to_numpy(zero_copy_only=False)
        tok = batch.column("token")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        order = np.lexsort((gpos, chunk))
        c_s = chunk[order]
        newc = np.concatenate([[True], c_s[1:] != c_s[:-1]])
        counts = np.diff(np.concatenate([np.flatnonzero(newc), [len(c_s)]]))
        off64 = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        values = tok.take(pa.array(order))
        if off64[-1] > np.iinfo(np.int32).max:
            # int32 list offsets overflow past 2^31 tokens per bucket;
            # a silent wrap would corrupt every chunk after it
            raise ValueError(
                f"chunk bucket holds {int(off64[-1])} tokens, past the "
                "int32 list-offset limit; raise `buckets` so each "
                "bucket stays under 2^31 tokens"
            )
        toks = pa.ListArray.from_arrays(
            pa.array(off64.astype(np.int32), type=pa.int32()), values
        )
        return pa.table(
            {
                "chunk_id": pa.array(c_s[newc]),
                "tokens": toks,
            }
        )

    return (
        with_off.map_batches(explode, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(assemble, batch_format="pyarrow")
    )
