"""Training-data curation ops: stratified sampling, sequence packing,
and the composed curation pipeline (analyze → filter → dedup → pack).

These are the engine-native operations a large-scale training-data
pipeline needs on top of the TGRASS surface (north rule: first-class
components).  All deterministic — a rerun reproduces the same sample,
packs, and survivors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sample_stratified(ds, rates: dict, *, default_rate: float = 0.0, key_col: str = "source", id_col: str = "doc_id"):
    """Deterministic per-stratum sampling: keep a row iff
    ``doc_index % 100 < rates[source]*100``.

    Rates are percentages per source (broadcast once); the modulus rule
    makes the sample reproducible and SQL-expressible — no RNG state
    shipped to workers.
    """
    import ray

    pct = {k: int(round(v * 100)) for k, v in rates.items()}
    ref = ray.put((pct, int(round(default_rate * 100))))

    def kernel(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        p, dflt = ray.get(ref)
        if batch.num_rows == 0:
            return batch

        # per-row rate: dictionary-encode the (few) sources, map the
        # uniques once, gather — no per-row dict lookups
        src = batch.column(key_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        rate_of = np.array(
            [p.get(s, dflt) for s in enc.dictionary.to_pylist()],
            dtype=np.int64,
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        rates = (
            rate_of[codes]
            if len(rate_of)
            else np.empty(0, dtype=np.int64)
        )

        # per-row index: numeric-tail fast path via Arrow slice+cast;
        # crc32 only over the (rare) non-numeric remainder
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if pa.types.is_integer(ids.type):
            idxv = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            tail = pc.utf8_slice_codeunits(ids, 1)
            isnum = pc.match_substring_regex(tail, r"^[0-9]{1,18}$")
            numeric = np.asarray(
                isnum.fill_null(False).to_numpy(zero_copy_only=False)
            )
            safe = pc.if_else(isnum, tail, pa.scalar("0", pa.string()))
            idxv = (
                pc.cast(safe, pa.int64())
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                .copy()
            )
            if not numeric.all():
                import zlib

                bad = np.flatnonzero(~numeric)
                subs = ids.take(pa.array(bad)).to_pylist()
                idxv[bad] = np.fromiter(
                    (zlib.crc32(str(s).encode()) for s in subs),
                    dtype=np.int64,
                    count=len(bad),
                )
        keep = pa.array(idxv % 100 < rates)
        return batch.filter(keep)

    return ds.map_batches(kernel, batch_format="pyarrow")


def pack_sequences(
    ds,
    block_len: int = 2048,
    *,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    drop_remainder: bool = False,
):
    """Greedy sequence packing into fixed-length training blocks.

    Documents are concatenated in order and cut into `block_len` token
    blocks; each output row carries the packed tokens plus the doc spans
    (doc_id, start offset within block, length) so attention masking can
    respect document boundaries.  Packing is per input block — blocks
    pack independently (the standard distributed-packing tradeoff: at
    most one padded/short block per Ray block instead of a global
    shuffle).  NULL tokens are dropped before packing (they are masked
    positions, not trainable tokens).
    """

    def kernel(batch: pa.Table) -> pa.Table:
        col = batch.column(tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten()
        valid = flat.is_valid().to_numpy(zero_copy_only=False)
        vals = flat.fill_null(0).to_numpy(zero_copy_only=False)
        lens = np.asarray(col.value_lengths().to_numpy(zero_copy_only=False)).astype(np.int64)
        ids = batch.column(id_col).to_pylist()
        # drop nulls, tracking per-doc kept lengths
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        kept_lens = (
            np.add.reduceat(valid.astype(np.int64), starts[lens > 0])
            if (lens > 0).any()
            else np.empty(0, np.int64)
        )
        all_kept = np.zeros(len(lens), dtype=np.int64)
        all_kept[lens > 0] = kept_lens
        stream = vals[valid]
        total = len(stream)
        n_blocks = total // block_len if drop_remainder else (total + block_len - 1) // block_len

        block_tokens = []
        spans_block, spans_doc, spans_start, spans_len = [], [], [], []
        # doc boundaries in the concatenated stream
        doc_ends = np.cumsum(all_kept)
        doc_starts = doc_ends - all_kept
        for b in range(n_blocks):
            lo, hi = b * block_len, min((b + 1) * block_len, total)
            block_tokens.append(stream[lo:hi].astype(np.int32))
            # docs overlapping [lo, hi)
            first = int(np.searchsorted(doc_ends, lo, side="right"))
            d = first
            while d < len(ids) and doc_starts[d] < hi:
                s = max(int(doc_starts[d]), lo) - lo
                e = min(int(doc_ends[d]), hi) - lo
                if e > s:
                    spans_block.append(b)
                    spans_doc.append(ids[d])
                    spans_start.append(s)
                    spans_len.append(e - s)
                d += 1
        offsets = pa.array(
            np.concatenate(
                [[0], np.cumsum([len(t) for t in block_tokens])]
            ).astype(np.int32)
        )
        flat_out = (
            np.concatenate(block_tokens) if block_tokens else np.empty(0, np.int32)
        )
        spans_per_block = (
            np.bincount(np.array(spans_block, dtype=np.int64), minlength=n_blocks)
            if n_blocks
            else np.empty(0, np.int64)
        )
        span_offsets = pa.array(
            np.concatenate([[0], np.cumsum(spans_per_block)]).astype(np.int32)
        )
        blocks_t = pa.table(
            {
                "block_id": pa.array(np.arange(n_blocks, dtype=np.int64)),
                "tokens": pa.ListArray.from_arrays(
                    offsets, pa.array(flat_out, type=pa.int32())
                ),
                "n_tok": pa.array(
                    np.array([len(t) for t in block_tokens], dtype=np.int32)
                ),
                "n_docs": pa.array(spans_per_block.astype(np.int32)),
                # doc spans (attention-mask boundaries): parallel lists
                # aligned per block, ordered by offset within the block
                "span_doc_ids": pa.ListArray.from_arrays(
                    span_offsets, pa.array([str(d) for d in spans_doc])
                ),
                "span_starts": pa.ListArray.from_arrays(
                    span_offsets,
                    pa.array(np.array(spans_start, dtype=np.int32)),
                ),
                "span_lens": pa.ListArray.from_arrays(
                    span_offsets,
                    pa.array(np.array(spans_len, dtype=np.int32)),
                ),
            }
        )
        return blocks_t

    return ds.map_batches(kernel, batch_format="pyarrow", batch_size=512)


def curate(
    ds,
    *,
    min_quality: float = 0.3,
    lang: str | None = None,
    dedup_threshold: float = 0.85,
    block_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "blake2b",
    pack: str = "local",
):
    """The composed curation pipeline over a documents table:

    analyze (actor pool) → quality/lang filter → exact dedup →
    MinHash near-dedup → tokenize (deterministic corpus derivation) →
    pack into training blocks.

    ``hash_fn`` selects the MinHash word hash ("blake2b" default;
    "md5" is the DuckDB-replayable oracle hash).  ``pack="local"``
    packs per Ray block (`pack_sequences`); ``"global"`` uses the
    layout-independent prefix-scan packing
    (:func:`grass_ray.stages.chunk.pack_blocks_global`) whose output
    is exact-oracle-checkable.

    Returns (packed_blocks_ds, report dict).
    """
    import pyarrow.compute as pc

    from grass_ray.sources.corpus import make_corpus_batch
    from grass_ray.stages.dedup import exact_dedup, minhash_dedup
    from grass_ray.stages.text_stage import analyze_text

    report: dict = {}
    analyzed = analyze_text(ds, features=("lang", "quality"))

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch.column("quality_score"), min_quality)
        if lang:
            m = pc.and_(m, pc.equal(batch.column("lang_pred"), lang))
        return batch.filter(m)

    # materialize the two fan-out points: exact_dedup and minhash_dedup
    # each consume their input TWICE (candidate/winner derivation + the
    # final semi/anti-join pass), so leaving these lazy re-executes the
    # analyze actor pool up to 4x.  Both sit post-filter (smaller than
    # the input), and Ray's object store spills to disk beyond memory —
    # recompute-vs-cache goes to cache here, same call as curate_v2's
    # mid-chain materialize.
    filtered = analyzed.map_batches(keep, batch_format="pyarrow").materialize()
    deduped = exact_dedup(filtered, col=text_col, id_col=id_col).materialize()
    kept, pairs = minhash_dedup(
        deduped, threshold=dedup_threshold, id_col=id_col, text_col=text_col,
        hash_fn=hash_fn,
    )
    report["near_dup_pairs"] = pairs.count()
    corpus = kept.map_batches(
        lambda b: make_corpus_batch(
            b.select(["doc_id", "source", "n_chars"])
        ),
        batch_format="pyarrow",
    )
    if pack == "global":
        from grass_ray.stages.chunk import pack_blocks_global

        packed = pack_blocks_global(corpus, block_len=block_len)
    else:
        packed = pack_sequences(corpus, block_len=block_len)
    return packed, report


def curate_v2(
    ds,
    *,
    mix_rates: dict | None = None,
    default_rate: float = 1.0,
    k_seg: int = 3,
    min_logprob: float | None = None,
    split_fractions: dict | None = None,
    seed: int = 17,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "rank",
    bpe_merges: int = 1000,
):
    """The round-2 curation composition over a documents table:

    normalize (NFC + whitespace) → deterministic domain mixing →
    corpus-wide segment-level exact substring dedup → unigram-LM
    quality filter → tokenization → deterministic train/val/test
    split.  ``tokenizer="rank"`` (default) uses the frequency-rank
    vocabulary; ``"bpe"`` trains ``bpe_merges`` subword merges on the
    SURVIVING documents (post-dedup/filter, the standard practice) and
    encodes with them.

    Every stage is one of the engine's named operators; the glue is
    semi-joins on the surviving id set.  Returns a Dataset
    ``(doc_id, tokens, n_tok, split)`` of surviving documents.
    """
    import pyarrow.compute as pc

    from grass_ray.stages.dedup import segment_dedup
    from grass_ray.stages.join import semi_join
    from grass_ray.stages.mix import mix_sources, split_dataset
    from grass_ray.stages.text_stage import normalize_text
    from grass_ray.stages.vocab import lm_score, tokenize_by_rank

    cur = normalize_text(ds, text_col=text_col)
    if mix_rates:
        cur = mix_sources(
            cur, mix_rates, default_rate=default_rate, id_col=id_col,
            seed=seed,
        )
    sd = segment_dedup(cur, k=k_seg, id_col=id_col, text_col="text_norm")
    sd = sd.map_batches(
        lambda b: b.filter(pc.greater(b.column("n_kept"), 0)),
        batch_format="pyarrow",
    ).materialize()  # feeds the LM filter AND the tokenizer
    if min_logprob is not None:
        lm = lm_score(sd, id_col=id_col, text_col="text_dedup")
        good = lm.map_batches(
            lambda b: b.filter(
                pc.fill_null(
                    pc.greater_equal(b.column("avg_logprob"), min_logprob),
                    False,
                )
            ).select([id_col]),
            batch_format="pyarrow",
        )
        sd = semi_join(sd, good, key_cols=(id_col,), keys_distinct=True)
    if tokenizer == "bpe":
        from grass_ray.stages.bpe import bpe_encode, bpe_train

        merges, alphabet = bpe_train(
            sd, n_merges=bpe_merges, text_col="text_dedup"
        )
        toks = bpe_encode(
            sd, merges, alphabet, id_col=id_col, text_col="text_dedup"
        )
    elif tokenizer == "rank":
        toks = tokenize_by_rank(sd, id_col=id_col, text_col="text_dedup")
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    return split_dataset(
        toks,
        split_fractions or {"train": 0.9, "val": 0.05, "test": 0.05},
        id_col=id_col,
        seed=seed,
    )


def gopher_filter(
    ds,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_ratio: float = 0.6,
    min_stopword_ratio: float = 0.02,
    max_top_word_frac: float = 0.3,
    max_dup_bigram_frac: float = 0.2,
    max_dup_trigram_frac: float = 0.18,
    keep_only: bool = False,
):
    """Gopher-rules composite quality filter (Rae et al. 2021 §A1.1,
    the C4/MassiveText document-filter family): every document gets an
    int64 ``fail_mask`` bitmask of the rules it violates and a ``keep``
    flag (``fail_mask == 0``); ``keep_only=True`` drops failing rows
    instead of reporting them.

    Bits: 1 too few words, 2 too many words, 4 mean word length outside
    [min, max], 8 alphabetic-character ratio below, 16 stopword ratio
    below, 32 top-word fraction above, 64 duplicate-bigram fraction
    above, 128 duplicate-trigram fraction above.

    Zero-shuffle: one vectorized ``analyze_text`` map (quality +
    repetition features — exact integer-ratio floats) and one numpy
    rule map.  Thresholds are plain literals compared against exact
    ratios, so the whole filter replays bit-for-bit in SQL.
    """
    from grass_ray.stages.text_stage import analyze_text

    feats = analyze_text(ds, features=("quality", "repetition"))
    rules = (
        ("n_words", "lt", float(min_words)),
        ("n_words", "gt", float(max_words)),
        ("mean_word_len", "out", (min_mean_word_len, max_mean_word_len)),
        ("alpha_ratio", "lt", min_alpha_ratio),
        ("stopword_ratio", "lt", min_stopword_ratio),
        ("top_word_frac", "gt", max_top_word_frac),
        ("dup_bigram_frac", "gt", max_dup_bigram_frac),
        ("dup_trigram_frac", "gt", max_dup_trigram_frac),
    )

    def kernel(batch: pa.Table) -> pa.Table:
        mask = np.zeros(batch.num_rows, dtype=np.int64)
        for bit, (col, op, t) in enumerate(rules):
            v = batch.column(col).to_numpy(zero_copy_only=False)
            if op == "lt":
                bad = v < t
            elif op == "gt":
                bad = v > t
            else:
                bad = (v < t[0]) | (v > t[1])
            mask |= bad.astype(np.int64) << bit
        out = batch.append_column(
            "fail_mask", pa.array(mask, type=pa.int64())
        ).append_column("keep", pa.array(mask == 0))
        if keep_only:
            out = out.filter(pa.array(mask == 0))
        return out

    return feats.map_batches(kernel, batch_format="pyarrow")


def quantile_filter(
    ds,
    *,
    val_col: str,
    q: float,
    keep: str = "above",
    k_cap: int = 1 << 19,
):
    """Percentile-threshold filter (the CCNet/Gopher "cut the worst
    decile" step): the corpus-wide q-quantile of ``val_col`` is computed
    with ONE mergeable KLL sketch (exact rank statistic while the
    sketch stays level-0 — driver scale; the approximate regime at
    corpus scale over-/under-cuts by the sketch's rank error, never by
    value), broadcast as a plain threshold, and applied map-side.

    NULL values are excluded from the quantile and always dropped.
    ``keep="above"`` keeps rows with ``val >= t``; ``"below"`` keeps
    ``val <= t``.  Returns ``(kept_ds, threshold)``."""
    import pyarrow.compute as pc

    from grass_ray.functions.sketch import KLLSketch

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(val_col).to_numpy(zero_copy_only=False)
        sk = KLLSketch(k_cap).update_many(np.asarray(v, dtype=np.float64))
        return pa.table({"sketch": pa.array([sk.to_bytes()], type=pa.binary())})

    sk = None
    for b in (
        ds.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        for blob in b.column("sketch").to_pylist():
            s = KLLSketch.from_bytes(blob)
            sk = s if sk is None else sk.merge(s)
    if sk is None or sk.n == 0:
        return ds.limit(0), float("nan")
    t = sk.quantile(q)

    def kernel(batch: pa.Table) -> pa.Table:
        col = batch.column(val_col)
        m = (
            pc.greater_equal(col, t)
            if keep == "above"
            else pc.less_equal(col, t)
        )
        return batch.filter(pc.fill_null(m, False))

    return ds.map_batches(kernel, batch_format="pyarrow"), t


def quantile_filter_by(
    ds,
    *,
    val_col: str,
    q: float,
    by: str,
    keep: str = "above",
    k_cap: int = 1 << 19,
):
    """Per-GROUP percentile-threshold filter — the stratified form of
    :func:`quantile_filter` (cut each source's own worst decile so one
    source's quality distribution can't dominate the cut, the
    CCNet-per-domain convention).

    Plan: per batch ONE mergeable KLL sketch per in-batch group
    (dictionary-encoded group ids, vectorized per-group update); the
    driver folds blocks × groups fixed-size sketch blobs per group
    (bounded like the global version — the value stream never leaves
    the workers), computes each group's q-quantile (exact rank
    statistic while sketches stay level-0), and broadcasts ONE
    group→threshold dict; the filter applies map-side with a
    dictionary-decoded threshold gather.  NULL values are excluded
    from the quantiles and always dropped; rows of groups with no
    non-NULL values are dropped.  Returns ``(kept_ds, thresholds)``."""
    import ray

    from grass_ray.functions.sketch import KLLSketch

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(by)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = keys.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.asarray(
            batch.column(val_col).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        names, blobs = [], []
        for gi, name in enumerate(enc.dictionary.to_pylist()):
            sk = KLLSketch(k_cap).update_many(v[codes == gi])
            names.append(name)
            blobs.append(sk.to_bytes())
        return pa.table(
            {by: pa.array(names), "sketch": pa.array(blobs, type=pa.binary())}
        )

    merged: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for name, blob in zip(
            b.column(by).to_pylist(), b.column("sketch").to_pylist()
        ):
            s = KLLSketch.from_bytes(blob)
            merged[name] = s if name not in merged else merged[name].merge(s)
    thresholds = {
        k: s.quantile(q) for k, s in merged.items() if s.n > 0
    }
    tref = ray.put(thresholds)

    def kernel(batch: pa.Table) -> pa.Table:
        tm = ray.get(tref)
        keys = batch.column(by)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = keys.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        per_code = np.array(
            [tm.get(d, np.nan) for d in enc.dictionary.to_pylist()],
            dtype=np.float64,
        )
        thr = per_code[codes] if len(per_code) else np.empty(0)
        v = np.asarray(
            batch.column(val_col).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        with np.errstate(invalid="ignore"):
            m = (v >= thr) if keep == "above" else (v <= thr)
        # NaN comparisons are False: drops NULL values AND empty groups
        return batch.filter(pa.array(m))

    return ds.map_batches(kernel, batch_format="pyarrow"), thresholds
