"""Corpus vocabulary statistics + benchmark decontamination.

Two training-data staples the reference has no analog for (engine
extensions at the SURVEY §2.13 altitude):

* :func:`word_counts` / :func:`vocab_topn` — corpus-wide word
  frequencies: per-batch vectorized partial counts (one Arrow
  ``group_by`` per batch, so the shuffle moves one row per distinct
  word per batch, not one per token) → pre-combined ``Sum`` exchange →
  deterministic global top-N (count desc, word asc).
* :func:`decontaminate` — drop training documents sharing any word
  k-gram with a benchmark set (the standard eval-contamination guard).
  Three regimes: under the broadcast threshold the distinct benchmark
  gram hashes ship once as a sorted int64 array and the train side
  tests membership MAP-SIDE (no train-gram exchange at all); above it
  the train (doc, gram) pairs semi-join through the bucket machinery;
  ``method="bloom"`` replaces the exact set with a fixed-size
  OR-mergeable bitmap (no false negatives).  Documents shorter than k
  words emit no grams (cannot be k-gram contaminated).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from grass_ray.functions.textstats import _RK_BASE, _word_ids

#: ASCII word class — identical to the DuckDB oracle's regex so both
#: sides tokenize bit-identically (python \w adds unicode classes RE2
#: lacks)
ASCII_WORD = r"[a-z0-9_']+"


def _words(text: str, pattern) -> list[str]:
    return pattern.findall((text or "").lower())


def _topn_arrow(batch: pa.Table, sort_keys, n: int) -> pa.Table:
    """Top-``n`` rows of a batch under ``sort_keys`` — Arrow C++
    sort_indices + take, replacing the old per-batch pandas
    ``sort_values().head(n)`` round trip (r4 VERDICT cleanup #2).
    Key tuples are unique at every call site, so stability is moot."""
    import pyarrow.compute as pc

    idx = pc.sort_indices(batch, sort_keys=list(sort_keys))
    return batch.take(idx[:n])


def _batch_word_counts(texts, rx):
    """(word list, count array) for a batch — vectorized span kernel for
    the standard ASCII_WORD class, per-row Counter fold otherwise."""
    from grass_ray.functions.textstats import word_count_batch

    if rx.pattern == ASCII_WORD:
        return word_count_batch(texts)
    from collections import Counter

    c: Counter = Counter()
    for t in texts:
        c.update(_words(t, rx))
    return list(c.keys()), np.asarray(list(c.values()), dtype=np.int64)


def word_counts(ds, *, text_col: str = "text", pattern: str = ASCII_WORD):
    """(word, cnt) over the corpus — partial counts per batch, then one
    pre-combined Sum exchange (fixed-bucket Acero merge)."""
    from grass_ray.stages.join import bucket_agg

    rx = re.compile(pattern)

    def partial(batch: pa.Table) -> pa.Table:
        words, cnts = _batch_word_counts(
            batch.column(text_col).to_pylist(), rx
        )
        return pa.table(
            {
                "word": pa.array(words, type=pa.string()),
                "cnt": pa.array(cnts, type=pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucket_agg(partials, ["word"], [("cnt", "sum", "cnt")])


def vocab_topn(ds, n: int = 100, *, text_col: str = "text", pattern: str = ASCII_WORD):
    """Global top-N words by (count desc, word asc) — deterministic
    under ties.  The trim is distributed (local top-N per block, one
    bounded final group)."""
    counts = word_counts(ds, text_col=text_col, pattern=pattern)

    keys = [("cnt", "descending"), ("word", "ascending")]

    def local(batch: pa.Table) -> pa.Table:
        out = _topn_arrow(batch, keys, n)
        return out.append_column(
            "_g", pa.array(np.zeros(out.num_rows, dtype=np.int64))
        )

    partials = counts.map_batches(local, batch_format="pyarrow")

    def final(batch: pa.Table) -> pa.Table:
        return _topn_arrow(batch, keys, n).drop_columns(["_g"])

    return partials.groupby("_g").map_groups(final, batch_format="pyarrow")


def vocab_coverage(
    ds,
    k: int = 256,
    *,
    by: str = "source",
    text_col: str = "text",
):
    """Tokenizer vocabulary coverage / OOV-rate report: the share of
    word OCCURRENCES covered by the corpus' own global top-``k``
    vocabulary (count desc, word asc — the ``rank_vocab`` tie rule),
    one row per ``by`` group.  The tokenizer-design question this
    answers — "how much of each source does a k-entry vocab actually
    cover?" — is the unigram analog of the reference's per-map
    univariate coverage reports (``r.univar``/``t.rast.list`` stats).

    Two streaming passes, no driver loops: pass 1 ranks the vocabulary
    (distributed top-k trim — the driver holds exactly ``k`` words,
    shipped once via ``ray.put``); pass 2 folds per-group
    ``(total, covered)`` int64 partials per batch with the shared
    word-span kernel and merges them through one narrow ``bucket_agg``
    (output = one row per group regardless of corpus size).  The input
    is consumed once per pass — hand it a re-readable source (a parquet
    read) or a materialized dataset, as ``curate`` does.

    ``coverage = covered/total`` and ``oov_rate = 1.0 − covered/total``
    are single IEEE operations on exact int64 sums (the oracle float
    contract); groups whose texts contain no words are dropped (no
    occurrences to measure — matches the SQL unnest derivation).
    """
    import ray

    import pyarrow.compute as pc

    from grass_ray.functions.textstats import word_count_batch
    from grass_ray.stages.join import bucket_agg

    top = vocab_topn(ds, k, text_col=text_col)
    vocab = frozenset(r["word"] for r in top.take_all())
    ref = ray.put(vocab)

    def partial(batch: pa.Table) -> pa.Table:
        v = ray.get(ref)
        key = batch.column(by)
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        enc = pc.dictionary_encode(key)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        groups, totals, covered = [], [], []
        for code, g in enumerate(enc.dictionary.to_pylist()):
            idxs = np.nonzero(codes == code)[0]
            words, cnts = word_count_batch([texts[i] for i in idxs])
            if len(words) == 0:
                continue
            m = np.fromiter(
                (w in v for w in words), dtype=bool, count=len(words)
            )
            groups.append(g)
            totals.append(int(cnts.sum()))
            covered.append(int(cnts[m].sum()))
        return pa.table(
            {
                by: pa.array(groups, type=batch.schema.field(by).type),
                "total_words": pa.array(totals, type=pa.int64()),
                "covered_words": pa.array(covered, type=pa.int64()),
            }
        )

    agg = bucket_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        [by],
        [
            ("total_words", "sum", "total_words"),
            ("covered_words", "sum", "covered_words"),
        ],
    )

    def finalize(batch: pa.Table) -> pa.Table:
        tot = batch.column("total_words").to_numpy(zero_copy_only=False)
        cov = batch.column("covered_words").to_numpy(zero_copy_only=False)
        keep = tot > 0
        batch = batch.filter(pa.array(keep))
        ratio = cov[keep].astype(np.float64) / tot[keep].astype(np.float64)
        return batch.append_column(
            "coverage", pa.array(ratio, type=pa.float64())
        ).append_column("oov_rate", pa.array(1.0 - ratio, type=pa.float64()))

    return agg.map_batches(finalize, batch_format="pyarrow")


def vocab_heavy_hitters(
    ds,
    n: int = 100,
    *,
    m: int = 4096,
    text_col: str = "text",
    pattern: str = ASCII_WORD,
    buckets: int = 32,
):
    """Approximate global top-N words via mergeable SpaceSaving
    summaries — the fixed-size alternative to :func:`vocab_topn`'s full
    vocabulary exchange.

    Plan: one SpaceSaving(m) summary per block (≤ m rows each on the
    wire regardless of vocabulary size) → level-1 tree merge in a
    ``buckets``-group exchange → driver folds ``buckets`` summaries.
    Driver and exchange volume are bounded by ``buckets × m`` rows at
    ANY corpus size.  Deterministic: summaries are identified by a
    content digest and folded in digest order.  Returns an Arrow table
    (word, cnt, err) — the true frequency of every row lies in
    [cnt - err, cnt], and any word with frequency > total/m is
    guaranteed present (the SpaceSaving contract)."""
    import hashlib
    import zlib

    from grass_ray.functions.sketch import SpaceSaving

    rx = re.compile(pattern)

    def summary_rows(s: "SpaceSaving") -> pa.Table:
        words = sorted(s.counts)
        digest = hashlib.blake2b(
            repr([(w, s.counts[w]) for w in words]).encode(), digest_size=8
        ).hexdigest()
        g = zlib.crc32(digest.encode()) % buckets
        return pa.table(
            {
                "sid": pa.array([digest] * len(words)),
                "word": pa.array(words, type=pa.string()),
                "cnt": pa.array([int(s.counts[w]) for w in words], type=pa.int64()),
                "err": pa.array([int(s.errs.get(w, 0)) for w in words], type=pa.int64()),
                "n": pa.array([s.n] * len(words), type=pa.int64()),
                "_g": pa.array([g] * len(words), type=pa.int32()),
            }
        )

    def block_summary(batch: pa.Table) -> pa.Table:
        words, cnts = _batch_word_counts(
            batch.column(text_col).to_pylist(), rx
        )
        s = SpaceSaving(m)
        if len(words):
            order = sorted(range(len(words)), key=words.__getitem__)
            s.add_many(
                [words[i] for i in order],
                np.asarray(cnts, dtype=np.int64)[order],
            )
        return summary_rows(s)

    def rebuild(rows: dict, sid: str) -> "SpaceSaving":
        s = SpaceSaving(m)
        idx = [i for i, v in enumerate(rows["sid"]) if v == sid]
        s.counts = {rows["word"][i]: rows["cnt"][i] for i in idx}
        s.errs = {rows["word"][i]: rows["err"][i] for i in idx}
        s.n = rows["n"][idx[0]] if idx else 0
        return s

    def fold_bucket(batch: pa.Table) -> pa.Table:
        d = batch.to_pydict()
        acc = None
        for sid in sorted(set(d["sid"])):
            s = rebuild(d, sid)
            acc = s if acc is None else acc.merge(s)
        return summary_rows(acc if acc is not None else SpaceSaving(m))

    level1 = (
        ds.map_batches(block_summary, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(fold_bucket, batch_format="pyarrow")
        .materialize()  # consumed by count() AND iter_batches()
    )
    # final fold: ≤ buckets × m rows, bounded at any corpus size
    rows = pa.concat_tables(
        level1.iter_batches(batch_format="pyarrow", batch_size=None)
    ).to_pydict() if level1.count() else {"sid": [], "word": [], "cnt": [], "err": [], "n": []}
    acc = None
    for sid in sorted(set(rows["sid"])):
        s = rebuild(rows, sid)
        acc = s if acc is None else acc.merge(s)
    if acc is None:
        acc = SpaceSaving(m)
    top = acc.topk(n)
    return pa.table(
        {
            "word": pa.array([t[0] for t in top], type=pa.string()),
            "cnt": pa.array([t[1] for t in top], type=pa.int64()),
            "err": pa.array([t[2] for t in top], type=pa.int64()),
        }
    )


def _gram_hashes(text: str, k: int, rx) -> np.ndarray:
    """Unique polynomial hashes of the word k-grams; < k words -> empty
    (short docs cannot be k-gram contaminated — matches the oracle)."""
    words = _words(text, rx)
    if len(words) < k:
        return np.empty(0, dtype=np.int64)
    ids = _word_ids(words)
    with np.errstate(over="ignore"):
        win = np.lib.stride_tricks.sliding_window_view(ids, k)
        powers = np.empty(k, dtype=np.uint64)
        powers[0] = 1
        if k > 1:
            np.cumprod(np.full(k - 1, _RK_BASE, dtype=np.uint64), out=powers[1:])
        vals = (win * powers).sum(axis=1, dtype=np.uint64)
    return np.unique((vals >> np.uint64(1)).astype(np.int64))


def _batch_grams(texts, k, rx):
    """(flat int64 grams, per-doc lens) for a batch — the vectorized
    kernel when the word class is the standard ASCII_WORD (one numpy
    pass over the concatenated stream), the per-row reference otherwise
    (custom patterns are cold paths)."""
    from grass_ray.functions.textstats import kgram_hashes_batch

    if rx.pattern == ASCII_WORD:
        return kgram_hashes_batch(texts, k, ascii_words=True, short_doc_hash=False)
    grams = [_gram_hashes(t, k, rx) for t in texts]
    lens = np.array([len(g) for g in grams], dtype=np.int64)
    flat = np.concatenate(grams) if len(grams) else np.empty(0, np.int64)
    return flat, lens


def _gram_table(ds, *, k, id_col, text_col, rx, with_id: bool):
    def kernel(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        flat, lens = _batch_grams(texts, k, rx)
        cols = {}
        if with_id:
            take = pa.array(
                np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
            )
            cols[id_col] = batch.column(id_col).take(take)
        cols["gram"] = pa.array(flat, type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow")


def decontaminate(
    train_ds,
    bench_ds,
    *,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = ASCII_WORD,
    method: str = "exact",
    bloom_expected_n: int | None = None,
    bloom_fp_rate: float = 1e-4,
    broadcast_threshold: int | None = None,
):
    """Drop training docs sharing any word k-gram with the benchmark.

    Returns (kept_train_ds, contaminated_ids_ds).  In the broadcast
    regimes (bloom, or exact under the threshold) BOTH outputs are lazy
    map-side filters sharing one membership probe: consuming only one
    of them costs a single train pass with no exchange; consuming both
    runs the probe twice (still exchange-free).  The exchange regime
    materializes the contaminated ids (they fold from a distributed
    join) and derives kept by anti-join.

    ``method="exact"`` (default): the benchmark gram set and the
    contaminated id set go through the two-regime semi/anti-join
    machinery (broadcast under threshold, bucket exchange above).

    ``method="bloom"``: the scale path — the benchmark grams fold into a
    fixed-size OR-mergeable Bloom bitmap (a few MB regardless of gram
    cardinality) that ships once via ``ray.put``; the train side filters
    map-side with NO gram exchange at all.  No false negatives (every
    contaminated doc is dropped); false positives over-drop at the
    configured rate — the safe direction for decontamination, and the
    only direction that stays broadcastable at 100 TB.
    ``bloom_expected_n=None`` (default) sizes the bitmap from a count
    pass over the benchmark gram table (the bench side is small by
    definition — a fixed 2^22-gram bitmap cost ~10 MB of alloc/OR/ship
    per run even when the bench held 15 k grams)."""
    from grass_ray.stages.join import anti_join, distinct_keys, semi_join

    rx = re.compile(pattern)
    if method == "bloom":
        return _decontaminate_bloom(
            train_ds, bench_ds, k=k, id_col=id_col, text_col=text_col,
            rx=rx, expected_n=bloom_expected_n, fp_rate=bloom_fp_rate,
        )
    if method != "exact":
        raise ValueError(f"unknown decontaminate method {method!r}")
    import ray

    from grass_ray.stages.join import BROADCAST_KEYS_THRESHOLD

    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_KEYS_THRESHOLD
    bench_grams = distinct_keys(
        _gram_table(bench_ds, k=k, id_col=id_col, text_col=text_col, rx=rx, with_id=False),
        ("gram",),
    ).materialize()
    if bench_grams.count() <= broadcast_threshold:
        # broadcast-exact regime: the benchmark gram set is small by
        # definition (the same size premise the bloom path relies on),
        # so ship the SORTED int64 hash array once and test membership
        # map-side with searchsorted — the train side's gram table is
        # never exchanged at all (two fewer all-to-all barriers than
        # the semi-join plan, bit-identical output)
        parts = [
            b.column("gram").to_numpy(zero_copy_only=False)
            for b in bench_grams.iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        ]
        grams = (
            np.sort(np.concatenate(parts))
            if parts
            else np.empty(0, dtype=np.int64)
        )
        gref = ray.put(grams)

        def hit_mask(batch: pa.Table) -> np.ndarray:
            g = ray.get(gref)
            texts = batch.column(text_col).to_pylist()
            flat, lens = _batch_grams(texts, k, rx)
            doc_hit = np.zeros(batch.num_rows, dtype=bool)
            if len(flat) and len(g):
                idx = np.searchsorted(g, flat)
                hit = (idx < len(g)) & (
                    g[np.minimum(idx, len(g) - 1)] == flat
                )
                doc_of = np.repeat(
                    np.arange(batch.num_rows, dtype=np.int64), lens
                )
                np.logical_or.at(doc_hit, doc_of[hit], True)
            return doc_hit

        # both outputs are lazy map-side filters off the same probe —
        # the membership test replaces the contaminated-id materialize
        # + anti-join, so consuming kept costs ONE train pass (a caller
        # that consumes both pays the probe twice; each pass is still
        # exchange-free).  Ids are globally distinct by construction:
        # a doc lives in exactly one batch.
        contaminated = train_ds.map_batches(
            lambda b: pa.table(
                {id_col: b.column(id_col).filter(pa.array(hit_mask(b)))}
            ),
            batch_format="pyarrow",
        )
        kept = train_ds.map_batches(
            lambda b: b.filter(pa.array(~hit_mask(b))),
            batch_format="pyarrow",
        )
        return kept, contaminated
    train_grams = _gram_table(
        train_ds, k=k, id_col=id_col, text_col=text_col, rx=rx, with_id=True
    )
    hits = semi_join(
        train_grams, bench_grams, key_cols=("gram",), keys_distinct=True
    )
    contaminated = distinct_keys(
        hits.map_batches(
            lambda b: pa.table({id_col: b.column(id_col)}), batch_format="pyarrow"
        ),
        (id_col,),
    ).materialize()
    kept = anti_join(
        train_ds, contaminated, key_cols=(id_col,), keys_distinct=True
    )
    return kept, contaminated


def decontaminate_report(
    train_ds,
    bench_ds,
    *,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = ASCII_WORD,
    broadcast_threshold: int | None = None,
):
    """Per-training-doc contamination audit: ``n_grams`` (distinct word
    k-grams in the doc) and ``n_contaminated`` (how many of them occur
    anywhere in the benchmark set) — the evidence behind
    :func:`decontaminate`'s binary keep/drop, for eval-hygiene reports
    and overlap-threshold tuning.  One row per training doc, including
    clean and short (< k words) ones.

    Regimes mirror ``decontaminate``: a benchmark gram set at or under
    the threshold broadcasts as a sorted int64 array (`ray.put` once),
    making the whole report ONE exchange-free map pass over train
    (per-doc counts from a searchsorted membership + `bincount`);
    larger gram sets go through the distributed gram semi-join, with
    map-side ``(n_grams, 0)`` partials unioned against per-hit
    ``(0, 1)`` rows and folded by a single doc-keyed ``bucket_agg`` —
    one exchange total, nothing per-doc on the driver."""
    import ray

    from grass_ray.stages.join import (
        BROADCAST_KEYS_THRESHOLD,
        bucket_agg,
        distinct_keys,
        semi_join,
    )

    rx = re.compile(pattern)
    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_KEYS_THRESHOLD
    bench_grams = distinct_keys(
        _gram_table(
            bench_ds, k=k, id_col=id_col, text_col=text_col, rx=rx,
            with_id=False,
        ),
        ("gram",),
    ).materialize()

    if bench_grams.count() <= broadcast_threshold:
        parts = [
            b.column("gram").to_numpy(zero_copy_only=False)
            for b in bench_grams.iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        ]
        grams = (
            np.sort(np.concatenate(parts))
            if parts
            else np.empty(0, dtype=np.int64)
        )
        gref = ray.put(grams)

        def kernel(batch: pa.Table) -> pa.Table:
            g = ray.get(gref)
            texts = batch.column(text_col).to_pylist()
            flat, lens = _batch_grams(texts, k, rx)
            n_cont = np.zeros(batch.num_rows, dtype=np.int64)
            if len(flat) and len(g):
                idx = np.searchsorted(g, flat)
                hit = (idx < len(g)) & (
                    g[np.minimum(idx, len(g) - 1)] == flat
                )
                doc_of = np.repeat(
                    np.arange(batch.num_rows, dtype=np.int64), lens
                )
                n_cont = np.bincount(
                    doc_of[hit], minlength=batch.num_rows
                ).astype(np.int64)
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "n_grams": pa.array(lens, type=pa.int64()),
                    "n_contaminated": pa.array(n_cont, type=pa.int64()),
                }
            )

        return train_ds.map_batches(kernel, batch_format="pyarrow")

    def base_partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        _flat, lens = _batch_grams(texts, k, rx)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_grams": pa.array(lens, type=pa.int64()),
                "n_contaminated": pa.array(
                    np.zeros(batch.num_rows, dtype=np.int64)
                ),
            }
        )

    train_grams = _gram_table(
        train_ds, k=k, id_col=id_col, text_col=text_col, rx=rx, with_id=True
    )
    hits = semi_join(
        train_grams, bench_grams, key_cols=("gram",), keys_distinct=True
    )

    def hit_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_grams": pa.array(np.zeros(batch.num_rows, np.int64)),
                "n_contaminated": pa.array(
                    np.ones(batch.num_rows, np.int64)
                ),
            }
        )

    parts = train_ds.map_batches(
        base_partial, batch_format="pyarrow"
    ).union(hits.map_batches(hit_partial, batch_format="pyarrow"))
    return bucket_agg(
        parts,
        [id_col],
        [
            ("n_grams", "sum", "n_grams"),
            ("n_contaminated", "sum", "n_contaminated"),
        ],
    )


def _decontaminate_bloom(
    train_ds, bench_ds, *, k, id_col, text_col, rx, expected_n, fp_rate
):
    """Bloom regime of :func:`decontaminate`: per-block partial bitmaps
    over the benchmark grams OR-fold into one fixed-size filter (the
    driver holds ONE bitmap, never the gram set), broadcast once; the
    train side tests per-doc gram membership map-side."""
    import ray

    from grass_ray.functions.bloom import (
        bloom_add,
        bloom_contains,
        bloom_empty,
        bloom_params,
    )
    if expected_n is None:
        # auto-size: per-doc-unique gram rows over the (small) bench
        # side — an overcount of the distinct grams, i.e. conservative
        expected_n = max(
            _gram_table(
                bench_ds, k=k, id_col=id_col, text_col=text_col, rx=rx,
                with_id=False,
            ).count(),
            1 << 12,
        )
    m_bits, n_hashes = bloom_params(expected_n, fp_rate)

    def partial_bitmap(batch: pa.Table) -> pa.Table:
        words = bloom_empty(m_bits)
        flat, _ = _batch_grams(batch.column(text_col).to_pylist(), k, rx)
        bloom_add(words, flat, n_hashes)
        return pa.table({"bits": pa.array([words.view(np.uint8).tobytes()])})

    acc = bloom_empty(m_bits)
    partials = bench_ds.map_batches(partial_bitmap, batch_format="pyarrow")
    for b in partials.iter_batches(batch_format="pyarrow", batch_size=None):
        for buf in b.column("bits").to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint8).view(np.uint64)
    ref = ray.put(acc)

    def hit_mask(batch: pa.Table) -> np.ndarray:
        words = ray.get(ref)
        texts = batch.column(text_col).to_pylist()
        hit = np.zeros(len(texts), dtype=bool)
        flat, lens = _batch_grams(texts, k, rx)
        if flat.size:
            doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
            # chunked probe: the (n, k) bit-position temp stays ~32 MB
            # regardless of how many grams a batch carries
            step = 1 << 18
            for s in range(0, len(flat), step):
                m = bloom_contains(words, flat[s : s + step], n_hashes)
                if m.any():
                    hit[np.unique(doc_of[s : s + step][m])] = True
        return hit

    # both outputs are lazy map-side filters off the same bitmap probe
    # — no contaminated-id materialize, no anti-join exchange, so
    # consuming kept costs ONE train pass (a caller consuming both pays
    # the probe twice).  No distinct exchange needed: id_col is the
    # train PK, every row lands in exactly one batch and the hit mask
    # dedups within the batch.
    contaminated = train_ds.map_batches(
        lambda b: pa.table(
            {id_col: b.column(id_col).filter(pa.array(hit_mask(b)))}
        ),
        batch_format="pyarrow",
    )
    kept = train_ds.map_batches(
        lambda b: b.filter(pa.array(~hit_mask(b))), batch_format="pyarrow"
    )
    return kept, contaminated


# ---------------------------------------------------------------------------
# unigram LM quality scoring
# ---------------------------------------------------------------------------

_LM_SCALE = 1_000_000  # log-counts carried as exact micro-nat integers


def lm_score(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_threshold: int = 2_000_000,
    buckets: int = 64,
):
    """CCNet-style unigram language-model quality scoring: every
    document scored by its mean word log-probability under the corpus'
    own unigram distribution (low = rare-word-heavy / noisy, high =
    stereotypical).  Two passes over the corpus, no driver loops.

    Per word, ``lp(word) = floor(1e6 · ln(count(word)))`` is carried as
    an EXACT int64 (order-independent sums — the oracle float
    contract), and ``avg_logprob = Σlp / (1e6·n_words) − ln(N)``.

    Returns ``(doc_id, n_words, logcnt_sum_micro, avg_logprob)`` with
    one row per document (0/0/NULL for wordless docs).

    Regimes, chosen by the measured vocabulary size (natural-language
    vocabularies grow sublinearly — Heaps' law — so the broadcast path
    is the expected one even at corpus scales where the document side
    is petabytes):

    * **broadcast** (vocab ≤ ``broadcast_threshold``): word→lp dict
      ships once via ``ray.put``; one zero-shuffle ``map_batches`` scores
      each batch with the vectorized word-span kernel (lp summed per doc
      by ``np.bincount`` over unique-word lookups only);
    * **exchange** (larger vocabularies): explode ``(doc_id, word)``
      rows, attach counts by a word-keyed bucket exchange
      (`attach_column`), partial per-doc sums, then one doc-keyed
      `bucket_agg` — the document text never moves, only word rows.
    """
    import ray

    from grass_ray.functions.textstats import _span_hashes, _word_span_arrays
    from grass_ray.stages.join import attach_column, bucket_agg, bucket_join

    counts = word_counts(ds, text_col=text_col).materialize()
    n_vocab = counts.count()

    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("n_words", pa.int64()),
            ("logcnt_sum_micro", pa.int64()),
            ("avg_logprob", pa.float64()),
        ]
    )

    def finish(ids, nw, lp) -> pa.Table:
        with np.errstate(divide="ignore", invalid="ignore"):
            avg = lp / (_LM_SCALE * nw.astype(np.float64)) - _ln_total
        mask = nw == 0
        return pa.Table.from_arrays(
            [
                pa.array(ids.astype(np.int64)),
                pa.array(nw.astype(np.int64)),
                pa.array(lp.astype(np.int64)),
                pa.array(
                    np.where(mask, 0.0, avg), type=pa.float64(), mask=mask
                ),
            ],
            schema=out_schema,
        )

    if n_vocab <= broadcast_threshold:
        lp_map: dict = {}
        total = 0
        for b in counts.iter_batches(batch_format="pyarrow", batch_size=None):
            w = b.column("word").to_pylist()
            c = b.column("cnt").to_numpy(zero_copy_only=False)
            total += int(c.sum())
            lpv = np.floor(
                _LM_SCALE * np.log(c.astype(np.float64))
            ).astype(np.int64)
            lp_map.update(zip(w, lpv.tolist()))
        _ln_total = float(np.log(float(total))) if total else 0.0
        ref = ray.put(lp_map)

        def kernel(batch: pa.Table) -> pa.Table:
            m = ray.get(ref)
            n = batch.num_rows
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            texts = [
                (t or "").lower() for t in batch.column(text_col).to_pylist()
            ]
            big, cp, ws, we, dw = _word_span_arrays(texts, ascii_words=True)
            if len(ws) == 0:
                z = np.zeros(n, dtype=np.int64)
                return finish(ids, z, z)
            wh = _span_hashes(cp, ws, we)
            uniq, first_idx, inv = np.unique(
                wh, return_index=True, return_inverse=True
            )
            lp_u = np.fromiter(
                (m[big[ws[i] : we[i]]] for i in first_idx),
                dtype=np.int64,
                count=len(first_idx),
            )
            # per-word micro-nats ≤ ~3e7 and ≤ 2^53/doc-length docs sum
            # exactly in the float64 bincount accumulator
            lp = np.bincount(
                dw, weights=lp_u[inv].astype(np.float64), minlength=n
            ).astype(np.int64)
            nw = np.bincount(dw, minlength=n).astype(np.int64)
            return finish(ids, nw, lp)

        return ds.map_batches(kernel, batch_format="pyarrow")

    # exchange regime: (doc_id, word) rows move, text does not
    total = 0
    for b in counts.map_batches(
        lambda t: pa.table(
            {"s": pa.array([int(np.sum(t.column("cnt").to_numpy(zero_copy_only=False)))])}
        ),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        total += int(np.sum(b.column("s").to_numpy(zero_copy_only=False)))
    _ln_total = float(np.log(float(total))) if total else 0.0

    def explode(batch: pa.Table) -> pa.Table:
        texts = [(t or "").lower() for t in batch.column(text_col).to_pylist()]
        big, cp, ws, we, dw = _word_span_arrays(texts, ascii_words=True)
        if len(ws) == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "word": pa.array([], type=pa.string()),
                }
            )
        wh = _span_hashes(cp, ws, we)
        uniq, first_idx, inv = np.unique(wh, return_index=True, return_inverse=True)
        reps = np.array(
            [big[ws[i] : we[i]] for i in first_idx], dtype=object
        )
        take = pa.array(dw)
        return pa.table(
            {
                id_col: batch.column(id_col).take(take),
                "word": pa.array(reps[inv], type=pa.string()),
            }
        )

    words = ds.map_batches(explode, batch_format="pyarrow")
    scored = attach_column(
        words,
        counts,
        key_col="word",
        lookup_key="word",
        value_col="cnt",
        out_col="cnt",
        how="inner",
        buckets=buckets,
    )

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        c = batch.column("cnt").to_numpy(zero_copy_only=False)
        lpv = np.floor(_LM_SCALE * np.log(c.astype(np.float64))).astype(np.int64)
        u, inv = np.unique(ids, return_inverse=True)
        lp = np.bincount(inv, weights=lpv.astype(np.float64)).astype(np.int64)
        nw = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(u.astype(np.int64)),
                "lp": pa.array(lp),
                "nw": pa.array(nw),
            }
        )

    agg = bucket_agg(
        scored.map_batches(partial, batch_format="pyarrow"),
        [id_col],
        [("lp", "sum", "lp"), ("nw", "sum", "nw")],
        buckets=buckets,
    )
    ids_ds = ds.map_batches(
        lambda b: b.select([id_col]), batch_format="pyarrow"
    )
    joined = bucket_join(
        ids_ds, agg, key_cols=[id_col], how="left", buckets=buckets
    )

    def fin(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        nw = pc.fill_null(batch.column("nw"), 0).to_numpy(zero_copy_only=False)
        lp = pc.fill_null(batch.column("lp"), 0).to_numpy(zero_copy_only=False)
        return finish(ids, nw, lp)

    return joined.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# frequency-rank vocabulary tokenizer
# ---------------------------------------------------------------------------


def _rank_dict_from_counts(counts) -> dict:
    """Driver-side (count desc, word asc) rank of a BOUNDED counts
    Dataset → word→id dict (the broadcast-regime vocabulary)."""
    words: list = []
    cnts: list = []
    for b in counts.iter_batches(batch_format="pyarrow", batch_size=None):
        words.extend(b.column("word").to_pylist())
        cnts.append(b.column("cnt").to_numpy(zero_copy_only=False))
    if not words:
        return {}
    c = np.concatenate(cnts)
    warr = np.array(words, dtype=object)
    order = np.lexsort((warr, -c))  # count desc, word asc
    return {w: i for i, w in enumerate(warr[order])}


def _counts_total(counts) -> int:
    """Distributed Σcnt over a word-counts Dataset (one partial-sum
    row per block folds on the driver — never the vocabulary)."""
    total = 0
    for b in counts.map_batches(
        lambda t: pa.table(
            {
                "s": pa.array(
                    [int(np.sum(t.column("cnt").to_numpy(zero_copy_only=False)))]
                )
            }
        ),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        total += int(np.sum(b.column("s").to_numpy(zero_copy_only=False)))
    return total


def rank_vocab(
    ds,
    *,
    text_col: str = "text",
    broadcast_threshold: int = 4_000_000,
) -> dict:
    """word → token id where the id is the word's corpus frequency rank
    (count desc, word asc — deterministic under ties): the classic
    count-based vocabulary (word2vec-era tokenization).  The vocabulary
    is Heaps'-law bounded, so the distributed part is the count
    (`word_counts`: per-batch partials + one pre-combined exchange) and
    the rank itself is a bounded driver-side lexsort.

    A Python dict is inherently driver-bounded; above
    ``broadcast_threshold`` this raises and points at
    :func:`rank_vocab_ds`, the distributed-rank regime that returns the
    same mapping as a ``(word, cnt, token_id)`` Dataset
    (:func:`tokenize_by_rank` switches to it automatically)."""
    counts = word_counts(ds, text_col=text_col).materialize()
    n_vocab = counts.count()
    if n_vocab > broadcast_threshold:
        raise NotImplementedError(
            f"a driver-side dict of {n_vocab} words exceeds the broadcast "
            f"threshold ({broadcast_threshold}); use rank_vocab_ds (the "
            "distributed rank, identical mapping as a Dataset) — "
            "tokenize_by_rank already switches regimes itself"
        )
    return _rank_dict_from_counts(counts)


def _prefix_codes(word_col, prefix_chars: int) -> np.ndarray:
    """Order-preserving int64 bucket code of each word's first
    ``prefix_chars`` code points: the first 8 UTF-8 bytes zero-padded
    big-endian, shifted right one bit (so the top byte of a 4-byte
    code point cannot flip the int64 sign; the shift merges at most
    adjacent codes, which only COARSENS buckets — order by (code, word)
    still equals order by word)."""
    import pyarrow.compute as pc

    if isinstance(word_col, pa.ChunkedArray):
        word_col = word_col.combine_chunks()
    pre = pc.utf8_slice_codeunits(word_col, 0, prefix_chars)
    enc = pre.dictionary_encode()
    dvals = enc.dictionary.to_pylist()
    codes = np.fromiter(
        (
            int.from_bytes((s or "").encode()[:8].ljust(8, b"\0"), "big") >> 1
            for s in dvals
        ),
        dtype=np.int64,
        count=len(dvals),
    )
    idx = enc.indices.to_numpy(zero_copy_only=False)
    return codes[idx]


def rank_vocab_ds(
    ds,
    *,
    text_col: str = "text",
    counts=None,
    prefix_chars: int = 2,
    buckets: int = 64,
):
    """Distributed frequency-rank vocabulary: Dataset ``(word, cnt,
    token_id)`` with ``token_id`` = rank by (count desc, word asc) —
    bit-identical to :func:`rank_vocab`'s dict, with no driver
    materialization of the vocabulary (the unbounded regime).

    Plan (no Ray sort):

    1. **count-class histogram** ``(cnt, n_words)``: k distinct
       positive counts summing to N tokens satisfy k(k+1)/2 ≤ N, so the
       class table is ≤ √(2N) rows (~1.4 M at 10¹² tokens) — a bounded
       driver fold; a prefix scan over classes sorted cnt-desc gives
       each class its base rank, broadcast as two parallel arrays
       (searchsorted lookup, not a dict).
    2. words tagged with an order-preserving **prefix bucket**
       (:func:`_prefix_codes`); per-(cnt, bucket) sizes →
       within-class cumulative offsets via a distributed
       ``groupby(cnt)`` scan (group = one class's bucket list, bounded
       by the distinct-prefix count, not the class size).
    3. offsets join back by (cnt, bucket) and one final
       (cnt, bucket)-keyed group sorts its words asc:
       ``token_id = class_base + bucket_offset + position``.

    Group sizes in step 3 are bounded by words sharing BOTH a count
    value and a ``prefix_chars``-char prefix — raise ``prefix_chars``
    for web-scale tails (the cnt=1 class is the big one)."""
    import ray

    from grass_ray.stages.join import bucket_agg, bucket_join

    if counts is None:
        counts = word_counts(ds, text_col=text_col)
    counts = counts.materialize()

    # 1. class histogram → driver prefix scan (√(2N)-bounded)
    ones = counts.map_batches(
        lambda b: pa.table(
            {
                "cnt": b.column("cnt"),
                "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    classes = bucket_agg(
        ones, ["cnt"], [("n", "sum", "n")], buckets=buckets
    ).to_pandas()
    if len(classes) == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "word": pa.array([], type=pa.string()),
                    "cnt": pa.array([], type=pa.int64()),
                    "token_id": pa.array([], type=pa.int64()),
                }
            )
        )
    classes = classes.sort_values("cnt", ascending=False)
    cvals_desc = classes["cnt"].to_numpy(dtype=np.int64)
    sizes = classes["n"].to_numpy(dtype=np.int64)
    bases_desc = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    # ascending order for searchsorted lookups
    cnt_asc = cvals_desc[::-1].copy()
    base_asc = bases_desc[::-1].copy()
    base_ref = ray.put((cnt_asc, base_asc))

    # 2. prefix-bucket tag + within-class offsets
    def tag(batch: pa.Table) -> pa.Table:
        pb = _prefix_codes(batch.column("word"), prefix_chars)
        return pa.table(
            {
                "word": batch.column("word"),
                "cnt": batch.column("cnt"),
                "_pb": pa.array(pb),
            }
        )

    tagged = counts.map_batches(tag, batch_format="pyarrow").materialize()
    pb_sizes = bucket_agg(
        tagged.map_batches(
            lambda b: pa.table(
                {
                    "cnt": b.column("cnt"),
                    "_pb": b.column("_pb"),
                    "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["cnt", "_pb"],
        [("n", "sum", "n")],
        buckets=buckets,
    )

    def class_scan(batch: pa.Table) -> pa.Table:
        pb = batch.column("_pb").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(pb, kind="stable")
        boff = np.zeros(len(pb), dtype=np.int64)
        boff[order[1:]] = np.cumsum(n[order])[:-1]
        return pa.table(
            {
                "cnt": batch.column("cnt"),
                "_pb": batch.column("_pb"),
                "_boff": pa.array(boff),
            }
        )

    boffs = pb_sizes.groupby("cnt").map_groups(
        class_scan, batch_format="pyarrow"
    )

    # 3. join offsets back, final per-(class, bucket) word sort
    joined = bucket_join(
        tagged, boffs, key_cols=["cnt", "_pb"], how="inner", buckets=buckets
    )

    def finish(batch: pa.Table) -> pa.Table:
        cnt_a, base_a = ray.get(base_ref)
        cnt = int(batch.column("cnt")[0].as_py())
        boff = int(batch.column("_boff")[0].as_py())
        base = int(base_a[np.searchsorted(cnt_a, cnt)])
        words = np.asarray(batch.column("word").to_pylist(), dtype=object)
        order = np.argsort(words, kind="stable")  # word asc
        tid = np.empty(len(words), dtype=np.int64)
        tid[order] = np.arange(len(words), dtype=np.int64) + base + boff
        return pa.table(
            {
                "word": batch.column("word"),
                "cnt": batch.column("cnt"),
                "token_id": pa.array(tid),
            }
        )

    return joined.groupby(["cnt", "_pb"]).map_groups(
        finish, batch_format="pyarrow"
    )


def tokenize_by_rank(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: dict | None = None,
    oov_id: int = -1,
    broadcast_threshold: int = 4_000_000,
    buckets: int = 64,
):
    """(base columns minus text, tokens list<int64>, n_tok) — tokenize
    text with a frequency-rank vocabulary (built from `ds` itself when
    not supplied).  Out-of-vocabulary words (a supplied foreign vocab)
    map to ``oov_id``.

    Regimes, chosen by the MEASURED vocabulary size when ``vocab`` is
    not supplied (a passed dict is by definition broadcast-sized):

    * **broadcast** (vocab ≤ ``broadcast_threshold``): dict ships once
      via ``ray.put``; one zero-shuffle ``map_batches`` with dictionary
      lookups on UNIQUE words only;
    * **exchange** (larger vocabularies): the :func:`rank_vocab_ds`
      distributed rank, then ``(doc, pos, word)`` rows attach their
      token id by a word-keyed exchange and one doc-keyed rebuild
      exchange reassembles each document's token list (the lm_score /
      segment_dedup plan shape — text never moves, only word rows)."""
    import ray

    from grass_ray.functions.textstats import _span_hashes, _word_span_arrays

    if vocab is None:
        counts = word_counts(ds, text_col=text_col).materialize()
        if counts.count() > broadcast_threshold:
            return _tokenize_exchange(
                ds,
                counts,
                id_col=id_col,
                text_col=text_col,
                oov_id=oov_id,
                buckets=buckets,
            )
        vocab = _rank_dict_from_counts(counts)
    ref = ray.put(vocab)

    def kernel(batch: pa.Table) -> pa.Table:
        v = ray.get(ref)
        n = batch.num_rows
        base = batch.drop_columns([text_col])
        texts = [(t or "").lower() for t in batch.column(text_col).to_pylist()]
        big, cp, ws, we, dw = _word_span_arrays(texts, ascii_words=True)
        if len(ws) == 0:
            ids = pa.ListArray.from_arrays(
                pa.array(np.zeros(n + 1, dtype=np.int32), type=pa.int32()),
                pa.array([], type=pa.int64()),
            )
            return base.append_column("tokens", ids).append_column(
                "n_tok", pa.array(np.zeros(n, dtype=np.int64))
            )
        wh = _span_hashes(cp, ws, we)
        uniq, first_idx, inv = np.unique(wh, return_index=True, return_inverse=True)
        tid_u = np.fromiter(
            (v.get(big[ws[i] : we[i]], oov_id) for i in first_idx),
            dtype=np.int64,
            count=len(first_idx),
        )
        flat = tid_u[inv]
        nw = np.bincount(dw, minlength=n).astype(np.int64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(nw, out=offsets[1:])
        toks = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), type=pa.int32()),
            pa.array(flat, type=pa.int64()),
        )
        return base.append_column("tokens", toks).append_column(
            "n_tok", pa.array(nw)
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def _tokenize_exchange(
    ds,
    counts,
    *,
    id_col: str,
    text_col: str,
    oov_id: int,
    buckets: int,
    prefix_chars: int = 2,
):
    """Unbounded-vocabulary tokenization (see :func:`tokenize_by_rank`):
    word-keyed token-id attach + doc-keyed list rebuild.  Output rows,
    columns and values are identical to the broadcast kernel."""
    import pyarrow.compute as pc

    from grass_ray.functions.textstats import _span_hashes, _word_span_arrays
    from grass_ray.stages.join import _bucket_ids, attach_column

    vocab_ds = rank_vocab_ds(
        None, counts=counts, prefix_chars=prefix_chars, buckets=buckets
    ).map_batches(
        lambda b: b.select(["word", "token_id"]), batch_format="pyarrow"
    )

    def explode(batch: pa.Table) -> pa.Table:
        texts = [(t or "").lower() for t in batch.column(text_col).to_pylist()]
        big, cp, ws, we, dw = _word_span_arrays(texts, ascii_words=True)
        if len(ws) == 0:
            return pa.table(
                {
                    id_col: batch.column(id_col).slice(0, 0),
                    "_pos": pa.array([], type=pa.int64()),
                    "word": pa.array([], type=pa.string()),
                }
            )
        wh = _span_hashes(cp, ws, we)
        uniq, first_idx, inv = np.unique(
            wh, return_index=True, return_inverse=True
        )
        reps = np.array([big[ws[i] : we[i]] for i in first_idx], dtype=object)
        n = batch.num_rows
        nw = np.bincount(dw, minlength=n).astype(np.int64)
        first_w = np.zeros(n, dtype=np.int64)
        np.cumsum(nw[:-1], out=first_w[1:])
        pos = np.arange(len(dw), dtype=np.int64) - first_w[dw]
        return pa.table(
            {
                id_col: batch.column(id_col).take(pa.array(dw)),
                "_pos": pa.array(pos),
                "word": pa.array(reps[inv], type=pa.string()),
            }
        )

    words = ds.map_batches(explode, batch_format="pyarrow")
    att = attach_column(
        words,
        vocab_ds,
        key_col="word",
        lookup_key="word",
        value_col="token_id",
        out_col="_tid",
        how="left",
        buckets=buckets,
    )

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "_pos": batch.column("_pos"),
                "_tid": pc.fill_null(
                    pc.cast(batch.column("_tid"), pa.int64()), oov_id
                ),
                "_bucket": pa.array(_bucket_ids(batch, [id_col], buckets)),
            }
        )

    def per_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        pos = batch.column("_pos").to_numpy(zero_copy_only=False)
        tid = batch.column("_tid").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, ids))
        sid, stid = ids[order], tid[order].astype(np.int64)
        new = np.empty(len(sid), dtype=bool)
        new[0] = True
        new[1:] = sid[1:] != sid[:-1]
        starts = np.flatnonzero(new)
        nw = np.diff(np.append(starts, len(sid))).astype(np.int64)
        offsets = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(nw, out=offsets[1:])
        if offsets[-1] > np.iinfo(np.int32).max:
            raise ValueError(
                "token bucket exceeds int32 list offsets; raise `buckets`"
            )
        toks = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), type=pa.int32()),
            pa.array(stid, type=pa.int64()),
        )
        return pa.table(
            {
                id_col: batch.column(id_col).take(pa.array(order[starts])),
                "tokens": toks,
                "n_tok": pa.array(nw),
            }
        )

    toks = (
        att.map_batches(narrow, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .materialize()  # consumed by two attaches below
    )

    base = ds.map_batches(
        lambda b: b.drop_columns([text_col]), batch_format="pyarrow"
    )
    out = attach_column(
        base,
        toks,
        key_col=id_col,
        lookup_key=id_col,
        value_col="tokens",
        out_col="tokens",
        how="left",
        buckets=buckets,
    )
    out = attach_column(
        out,
        toks,
        key_col=id_col,
        lookup_key=id_col,
        value_col="n_tok",
        out_col="n_tok",
        how="left",
        buckets=buckets,
    )

    def fill(batch: pa.Table) -> pa.Table:
        toks_col = batch.column("tokens")
        if isinstance(toks_col, pa.ChunkedArray):
            toks_col = toks_col.combine_chunks()
        filled = pc.fill_null(toks_col, pa.scalar([], pa.list_(pa.int64())))
        nt = pc.fill_null(pc.cast(batch.column("n_tok"), pa.int64()), 0)
        i_t = batch.column_names.index("tokens")
        i_n = batch.column_names.index("n_tok")
        return batch.set_column(i_t, "tokens", filled).set_column(
            i_n, "n_tok", nt
        )

    return out.map_batches(fill, batch_format="pyarrow")


def tfidf_top(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_threshold: int = 4_000_000,
    buckets: int = 64,
):
    """Per-document top TF-IDF term (the classic keyword extractor):
    ``score = tf · floor(1e6 · ln(N / df))`` — an EXACT int64 (tf and
    df are counts; the idf factor is quantized once per vocabulary
    word), ties broken by word ascending.

    Two passes: (1) document frequencies via per-batch per-doc-unique
    word partials + one pre-combined `bucket_agg` exchange (the df
    table is vocabulary-bounded — Heaps' law); (2) a zero-shuffle
    map_batches scores every (doc, word) pair against the broadcast
    ``word → (idf_micro, alpha_rank)`` dict and keeps each doc's argmax
    (alpha_rank makes the tie-break a pure integer lexsort).

    Returns ``(doc_id, top_word, tf, df, score_micro)`` — one row per
    document with ≥1 word."""
    import ray

    from grass_ray.functions.textstats import _span_hashes, _word_span_arrays
    from grass_ray.stages.join import bucket_agg

    n_docs = ds.count()

    def df_partial(batch: pa.Table) -> pa.Table:
        texts = [(t or "").lower() for t in batch.column(text_col).to_pylist()]
        big, cp, ws, we, dw = _word_span_arrays(texts, ascii_words=True)
        if len(ws) == 0:
            return pa.table(
                {
                    "word": pa.array([], type=pa.string()),
                    "df": pa.array([], type=pa.int64()),
                }
            )
        wh = _span_hashes(cp, ws, we)
        uniq, first_idx, inv = np.unique(wh, return_index=True, return_inverse=True)
        # distinct (doc, word) pairs: a document is one row, so
        # batch-local distinct IS globally distinct
        key = dw.astype(np.int64) * len(uniq) + inv
        ku = np.unique(key)
        wcodes = (ku % len(uniq)).astype(np.int64)
        cnts = np.bincount(wcodes, minlength=len(uniq)).astype(np.int64)
        reps = [big[ws[i] : we[i]] for i in first_idx]
        return pa.table(
            {
                "word": pa.array(reps, type=pa.string()),
                "df": pa.array(cnts),
            }
        )

    df_tbl = bucket_agg(
        ds.map_batches(df_partial, batch_format="pyarrow"),
        ["word"],
        [("df", "sum", "df")],
    ).materialize()
    if df_tbl.count() > broadcast_threshold:
        return _tfidf_exchange(
            ds, df_tbl, n_docs, id_col=id_col, text_col=text_col, buckets=buckets
        )
    words: list = []
    dfs: list = []
    for b in df_tbl.iter_batches(batch_format="pyarrow", batch_size=None):
        words.extend(b.column("word").to_pylist())
        dfs.append(b.column("df").to_numpy(zero_copy_only=False))
    dfv = np.concatenate(dfs) if dfs else np.empty(0, np.int64)
    warr = np.array(words, dtype=object)
    order = np.argsort(warr)
    alpha_rank = np.empty(len(warr), dtype=np.int64)
    alpha_rank[order] = np.arange(len(warr))
    idf = np.floor(
        1e6 * np.log(float(n_docs) / dfv.astype(np.float64))
    ).astype(np.int64)
    lookup = {
        w: (int(i), int(r), int(d))
        for w, i, r, d in zip(words, idf, alpha_rank, dfv)
    }
    ref = ray.put(lookup)

    def top_kernel(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        texts = [(t or "").lower() for t in batch.column(text_col).to_pylist()]
        big, cp, ws, we, dw = _word_span_arrays(texts, ascii_words=True)
        empty = pa.table(
            {
                id_col: pa.array([], type=batch.schema.field(id_col).type),
                "top_word": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
                "df": pa.array([], type=pa.int64()),
                "score_micro": pa.array([], type=pa.int64()),
            }
        )
        if len(ws) == 0:
            return empty
        wh = _span_hashes(cp, ws, we)
        uniq, first_idx, inv = np.unique(wh, return_index=True, return_inverse=True)
        reps = np.array([big[ws[i] : we[i]] for i in first_idx], dtype=object)
        # .get, not [] — a nondeterministic upstream stage between the
        # df pass and this pass must drop the unseen word, not crash
        trips = [m.get(w) for w in reps]
        known = np.array([t is not None for t in trips], dtype=bool)
        trip = np.array(
            [t if t is not None else (0, 0, 0) for t in trips], dtype=np.int64
        )  # (u, 3)
        key = dw.astype(np.int64) * len(uniq) + inv
        ku, tf = np.unique(key, return_counts=True)
        keep = known[(ku % len(uniq)).astype(np.int64)]
        ku, tf = ku[keep], tf[keep]
        if len(ku) == 0:
            return empty
        doc_of = ku // len(uniq)
        wcode = ku % len(uniq)
        score = tf.astype(np.int64) * trip[wcode, 0]
        # argmax per doc by (score desc, alpha_rank asc): single lexsort
        srt = np.lexsort((trip[wcode, 1], -score, doc_of))
        first = np.concatenate(
            [[True], doc_of[srt][1:] != doc_of[srt][:-1]]
        )
        pick = srt[first]
        take = pa.array(doc_of[pick])
        return pa.table(
            {
                id_col: batch.column(id_col).take(take),
                "top_word": pa.array(reps[wcode[pick]], type=pa.string()),
                "tf": pa.array(tf[pick].astype(np.int64)),
                "df": pa.array(trip[wcode[pick], 2]),
                "score_micro": pa.array(score[pick]),
            }
        )

    return ds.map_batches(top_kernel, batch_format="pyarrow")


def _tfidf_exchange(
    ds,
    df_tbl,
    n_docs: int,
    *,
    id_col: str,
    text_col: str,
    buckets: int,
):
    """Unbounded-vocabulary TF-IDF (see :func:`tfidf_top`): ``(doc,
    word, tf)`` rows attach their document frequency by a word-keyed
    exchange, score map-side with the identical ``floor(1e6·ln(N/df))``
    quantization, pre-reduce to one candidate per doc per batch, and a
    doc-keyed bucket exchange picks the final (score desc, word asc)
    argmax.  The word→df dict never exists anywhere."""
    from grass_ray.functions.textstats import _span_hashes, _word_span_arrays
    from grass_ray.stages.join import _bucket_ids, attach_column

    def tf_rows(batch: pa.Table) -> pa.Table:
        texts = [(t or "").lower() for t in batch.column(text_col).to_pylist()]
        big, cp, ws, we, dw = _word_span_arrays(texts, ascii_words=True)
        if len(ws) == 0:
            return pa.table(
                {
                    id_col: batch.column(id_col).slice(0, 0),
                    "top_word": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                }
            )
        wh = _span_hashes(cp, ws, we)
        uniq, first_idx, inv = np.unique(wh, return_index=True, return_inverse=True)
        reps = np.array([big[ws[i] : we[i]] for i in first_idx], dtype=object)
        key = dw.astype(np.int64) * len(uniq) + inv
        ku, tf = np.unique(key, return_counts=True)
        doc_of = ku // len(uniq)
        wcode = (ku % len(uniq)).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col).take(pa.array(doc_of)),
                "top_word": pa.array(reps[wcode], type=pa.string()),
                "tf": pa.array(tf.astype(np.int64)),
            }
        )

    rows = ds.map_batches(tf_rows, batch_format="pyarrow")
    att = attach_column(
        rows,
        df_tbl,
        key_col="top_word",
        lookup_key="word",
        value_col="df",
        out_col="df",
        how="inner",
        buckets=buckets,
    )

    def score_and_reduce(batch: pa.Table) -> pa.Table:
        """Map-side score + per-batch per-doc argmax partial: each
        batch contributes at most one candidate row per document it
        holds, so the doc exchange moves ≤ docs×batches rows."""
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "top_word": batch.column("top_word"),
                    "tf": batch.column("tf"),
                    "df": batch.column("df"),
                    "score_micro": pa.array([], type=pa.int64()),
                    "_bucket": pa.array([], type=pa.int32()),
                }
            )
        import pyarrow.compute as pc

        from grass_ray.stages.grouped import _sorted_group_ranks

        dfv = (
            batch.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        )
        idf = np.floor(1e6 * np.log(float(n_docs) / dfv)).astype(np.int64)
        tf = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.append_column("score_micro", pa.array(tf * idf))
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    (id_col, "ascending"),
                    ("score_micro", "descending"),
                    ("top_word", "ascending"),
                ],
            )
        )
        out = t.filter(pa.array(_sorted_group_ranks(t, [id_col]) < 1))
        return out.append_column(
            "_bucket", pa.array(_bucket_ids(out, [id_col], buckets))
        )

    def pick(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from grass_ray.stages.grouped import _sorted_group_ranks

        t = batch.take(
            pc.sort_indices(
                batch,
                sort_keys=[
                    (id_col, "ascending"),
                    ("score_micro", "descending"),
                    ("top_word", "ascending"),
                ],
            )
        )
        t = t.filter(pa.array(_sorted_group_ranks(t, [id_col]) < 1))
        return t.select([id_col, "top_word", "tf", "df", "score_micro"])

    return (
        att.map_batches(score_and_reduce, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pick, batch_format="pyarrow")
    )


def pmi_collocations(
    ds,
    *,
    text_col: str = "text",
    top_n: int = 50,
    min_count: int = 5,
    broadcast_threshold: int = 4_000_000,
    buckets: int = 64,
):
    """Corpus-wide top collocations by pointwise mutual information:
    ``pmi_micro = floor(1e6 · ln(N·c12 / (c1·c2)))`` over adjacent word
    bigrams (N = total words).  The score is an exact quantized int64
    — counts are integers and the float ratio is computed with one
    fixed association order on both sides — ordered (pmi desc, w1 asc,
    w2 asc): a unique total order, so the top-N cut is deterministic.

    Plan: per-batch Acero bigram partials → one `bucket_agg` exchange
    (pair table is vocabulary²-bounded but sparse); unigram counts
    broadcast as a dict (Heaps-bounded); map-side PMI + ``min_count``
    filter; distributed local-top-N trim + one bounded final group."""
    import ray

    from grass_ray.functions.textstats import _span_hashes, _word_span_arrays
    from grass_ray.stages.join import bucket_agg

    def bigram_partial(batch: pa.Table) -> pa.Table:
        texts = [(t or "").lower() for t in batch.column(text_col).to_pylist()]
        big, cp, ws, we, dw = _word_span_arrays(texts, ascii_words=True)
        empty = pa.table(
            {
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
                "c12": pa.array([], type=pa.int64()),
            }
        )
        if len(ws) < 2:
            return empty
        wh = _span_hashes(cp, ws, we)
        uniq, first_idx, inv = np.unique(wh, return_index=True, return_inverse=True)
        reps = np.array([big[ws[i] : we[i]] for i in first_idx], dtype=object)
        words = reps[inv]
        adj = dw[:-1] == dw[1:]
        if not adj.any():
            return empty
        t = pa.table(
            {
                "w1": pa.array(words[:-1][adj], type=pa.string()),
                "w2": pa.array(words[1:][adj], type=pa.string()),
            }
        )
        g = t.group_by(["w1", "w2"], use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(["w1", "w2", "c12"])

    pairs = bucket_agg(
        ds.map_batches(bigram_partial, batch_format="pyarrow"),
        ["w1", "w2"],
        [("c12", "sum", "c12")],
    )

    counts = word_counts(ds, text_col=text_col).materialize()
    if counts.count() > broadcast_threshold:
        scored = _pmi_exchange_scored(
            pairs, counts, min_count=min_count, buckets=buckets
        )
    else:
        cmap: dict = {}
        total = 0
        for b in counts.iter_batches(batch_format="pyarrow", batch_size=None):
            w = b.column("word").to_pylist()
            c = b.column("cnt").to_numpy(zero_copy_only=False)
            total += int(c.sum())
            cmap.update(zip(w, (int(x) for x in c)))
        nd = float(total)
        ref = ray.put(cmap)

        def score(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = ray.get(ref)
            batch = batch.filter(
                pc.greater_equal(batch.column("c12"), min_count)
            )
            if batch.num_rows == 0:
                return batch.append_column(
                    "pmi_micro", pa.array([], type=pa.int64())
                )
            w1 = batch.column("w1").to_pylist()
            w2 = batch.column("w2").to_pylist()
            c12 = (
                batch.column("c12").to_numpy(zero_copy_only=False).astype(np.float64)
            )
            # .get, not [] — drop bigrams whose unigram vanished (see
            # tfidf_top's kernel note on nondeterministic upstreams)
            c1 = np.fromiter((m.get(x, 0) for x in w1), dtype=np.float64, count=len(w1))
            c2 = np.fromiter((m.get(x, 0) for x in w2), dtype=np.float64, count=len(w2))
            ok = (c1 > 0) & (c2 > 0)
            if not ok.all():
                batch = batch.filter(pa.array(ok))
                c12, c1, c2 = c12[ok], c1[ok], c2[ok]
            pmi = np.floor(1e6 * np.log((nd * c12) / (c1 * c2))).astype(np.int64)
            return batch.append_column("pmi_micro", pa.array(pmi))

        scored = pairs.map_batches(score, batch_format="pyarrow")

    pmi_keys = [
        ("pmi_micro", "descending"),
        ("w1", "ascending"),
        ("w2", "ascending"),
    ]

    def local(batch: pa.Table) -> pa.Table:
        out = _topn_arrow(batch, pmi_keys, top_n)
        return out.append_column(
            "_g", pa.array(np.zeros(out.num_rows, dtype=np.int64))
        )

    def final(batch: pa.Table) -> pa.Table:
        return _topn_arrow(batch, pmi_keys, top_n).drop_columns(["_g"])

    return (
        scored.map_batches(local, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(final, batch_format="pyarrow")
    )


def _pmi_exchange_scored(
    pairs,
    counts,
    *,
    min_count: int,
    buckets: int,
):
    """Unbounded-vocabulary PMI scoring (see :func:`pmi_collocations`):
    the ``min_count``-filtered bigram table attaches ``c1`` then ``c2``
    by two word-keyed exchanges; the total-words N is a distributed
    partial-sum fold.  Quantization is formula-identical to the
    broadcast kernel."""
    import pyarrow.compute as pc

    from grass_ray.stages.join import attach_column

    nd = float(_counts_total(counts))

    trimmed = pairs.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("c12"), min_count)),
        batch_format="pyarrow",
    )
    att = attach_column(
        trimmed,
        counts,
        key_col="w1",
        lookup_key="word",
        value_col="cnt",
        out_col="_c1",
        how="inner",
        buckets=buckets,
    )
    att = attach_column(
        att,
        counts,
        key_col="w2",
        lookup_key="word",
        value_col="cnt",
        out_col="_c2",
        how="inner",
        buckets=buckets,
    )

    def score(batch: pa.Table) -> pa.Table:
        c12 = batch.column("c12").to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = batch.column("_c1").to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = batch.column("_c2").to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.floor(1e6 * np.log((nd * c12) / (c1 * c2))).astype(np.int64)
        return batch.drop_columns(["_c1", "_c2"]).append_column(
            "pmi_micro", pa.array(pmi)
        )

    return att.map_batches(score, batch_format="pyarrow")


def ngram_source_overlap(
    ds,
    *,
    k: int = 5,
    source_col: str = "source",
    text_col: str = "text",
    hash_fn: str = "blake2b",
    buckets: int = 64,
    max_sources_per_gram: int = 1024,
):
    """Cross-source k-gram overlap matrix — the corpus diversity /
    duplication diagnostic behind source-mixing decisions: for every
    pair of sources, how many distinct word k-grams they share, their
    per-source distinct-gram totals, and the resulting gram-set Jaccard.

    ``max_sources_per_gram`` bounds the quadratic pair fan-out: a gram
    carried by s sources explodes into s(s−1)/2 pairs, so one
    ubiquitous gram at 10⁴ sources would alone emit 5·10⁷ rows.  Grams
    above the cap are dropped from the PAIR stage with a loud log (they
    stay in the per-source totals — a gram every source carries has no
    diversity signal, the standard stopword-gram argument); corpora
    with fewer sources than the cap (any driver scale here) are exact.

    Plan (two exchanges, nothing unbounded on the driver):

    1. map pass: per-doc UNIQUE k-gram hashes (the shared
       :func:`~grass_ray.functions.textstats.kgram_hashes_batch`
       kernel, same rolling-polynomial values as the MinHash family —
       ``hash_fn="md5"`` makes them DuckDB-reproducible) → batch-local
       distinct ``(gram, source)`` rows;
    2. global distinct via the bucket exchange (``distinct_keys``),
       materialized once and reused for totals and pairs;
    3. pairs: gram-keyed buckets; per bucket a VECTORIZED segment pair
       explosion (sort by (gram, source), run-length segments, the
       repeat/offset pair-index construction — no per-gram Python
       loop) into ``(source_a < source_b)`` rows, pre-counted in-bucket,
       then one ``bucket_agg`` sum.  Per-gram fan-out is bounded by the
       number of sources carrying that gram, so a gram shared by s
       sources costs s(s-1)/2 rows — the pair table is bounded by
       distinct-grams × s²/2, all of it distributed;
    4. per-source totals fold the same distinct table
       (``bucket_agg`` sum of batch partials) and broadcast as a dict
       (one row per source) for the map-side jaccard attach —
       ``jaccard = n_shared / (n_a + n_b − n_shared)`` is a single IEEE
       division of exact int64 counts, so the whole report is
       value-exact vs SQL.

    Returns a Dataset of
    ``(source_a, source_b, n_shared, n_a, n_b, jaccard)`` — one row per
    source pair sharing ≥1 gram.
    """
    import ray

    from grass_ray.functions.textstats import kgram_hashes_batch
    from grass_ray.stages.join import _bucket_ids, bucket_agg, distinct_keys

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        flat, lens = kgram_hashes_batch(texts, k, hash_fn=hash_fn)
        src = batch.column(source_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        t = pa.table(
            {
                "gram": pa.array(flat, type=pa.int64()),
                source_col: src.take(
                    pa.array(
                        np.repeat(
                            np.arange(batch.num_rows, dtype=np.int64), lens
                        )
                    )
                ),
            }
        )
        return t.group_by(["gram", source_col], use_threads=False).aggregate([])

    gs = distinct_keys(
        ds.map_batches(partial, batch_format="pyarrow"),
        ("gram", source_col),
        buckets=buckets,
    ).materialize()

    def total_partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select([source_col])
            .group_by(source_col, use_threads=False)
            .aggregate([([], "count_all")])
        )
        return t.rename_columns([source_col, "n"])

    totals = bucket_agg(
        gs.map_batches(total_partial, batch_format="pyarrow"),
        [source_col],
        [("n", "sum", "n_grams")],
        buckets=buckets,
    )
    tot_map = {}
    for b in totals.iter_batches(batch_format="pyarrow", batch_size=None):
        for s, n in zip(
            b.column(source_col).to_pylist(), b.column("n_grams").to_pylist()
        ):
            tot_map[s] = int(n)  # one row per source: bounded
    tref = ray.put(tot_map)

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bucket", pa.array(_bucket_ids(batch, ["gram"], buckets))
        )

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.select(["gram", source_col])
        idx = pc.sort_indices(
            t,
            sort_keys=[("gram", "ascending"), (source_col, "ascending")],
        )
        t = t.take(idx)
        g = t.column("gram").to_numpy(zero_copy_only=False)
        s = np.asarray(t.column(source_col).to_pylist(), dtype=object)
        if len(g) == 0:
            return pa.table(
                {
                    "source_a": pa.array([], type=pa.string()),
                    "source_b": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        starts = np.concatenate([[0], np.flatnonzero(g[1:] != g[:-1]) + 1])
        counts = np.diff(np.append(starts, len(g)))
        over = counts > max_sources_per_gram
        if over.any():
            print(
                f"ngram_source_overlap: dropping {int(over.sum())} grams "
                f"carried by more than {max_sources_per_gram} sources "
                f"from the pair stage (max seen: {int(counts.max())})"
            )
            keep_rows = np.repeat(~over, counts)
            g, s = g[keep_rows], s[keep_rows]
            starts = np.concatenate(
                [[0], np.flatnonzero(g[1:] != g[:-1]) + 1]
            ) if len(g) else np.empty(0, dtype=np.int64)
            counts = np.diff(np.append(starts, len(g)))
        local = np.arange(len(g), dtype=np.int64) - np.repeat(starts, counts)
        total = int(local.sum())
        if total == 0:
            return pa.table(
                {
                    "source_a": pa.array([], type=pa.string()),
                    "source_b": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        second = np.repeat(np.arange(len(g), dtype=np.int64), local)
        block_starts = np.cumsum(local) - local
        offset = np.arange(total, dtype=np.int64) - np.repeat(
            block_starts, local
        )
        first = np.repeat(np.repeat(starts, counts), local) + offset
        pt = pa.table(
            {
                "source_a": pa.array(s[first].tolist(), type=pa.string()),
                "source_b": pa.array(s[second].tolist(), type=pa.string()),
            }
        )
        out = pt.group_by(["source_a", "source_b"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["source_a", "source_b", "n"])

    pairs = bucket_agg(
        gs.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow"),
        ["source_a", "source_b"],
        [("n", "sum", "n_shared")],
        buckets=buckets,
    )

    def attach(batch: pa.Table) -> pa.Table:
        tm = ray.get(tref)
        sa = batch.column("source_a").to_pylist()
        sb = batch.column("source_b").to_pylist()
        ns = batch.column("n_shared").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        na = np.fromiter((tm[x] for x in sa), dtype=np.int64, count=len(sa))
        nb = np.fromiter((tm[x] for x in sb), dtype=np.int64, count=len(sb))
        jac = ns.astype(np.float64) / (na + nb - ns).astype(np.float64)
        return pa.table(
            {
                "source_a": batch.column("source_a"),
                "source_b": batch.column("source_b"),
                "n_shared": pa.array(ns, type=pa.int64()),
                "n_a": pa.array(na, type=pa.int64()),
                "n_b": pa.array(nb, type=pa.int64()),
                "jaccard": pa.array(jac, type=pa.float64()),
            }
        )

    return pairs.map_batches(attach, batch_format="pyarrow")
