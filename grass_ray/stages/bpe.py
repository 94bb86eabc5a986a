"""Byte-pair-encoding tokenizer: distributed training + map-side encode.

Completes the engine's tokenizer family (`sources.readers.HashTokenizer`
hash ids, `vocab.tokenize_by_rank` frequency ranks) with the subword
tokenizer actual training pipelines use.  Sennrich et al. 2016
character-level BPE with an explicit end-of-word symbol:

* :func:`bpe_train` — merges learned from the DISTRIBUTED word-count
  table (`vocab.word_counts`: per-batch partials → one pre-combined Sum
  exchange).  The merge loop itself runs on the driver over the word
  COUNT dictionary, which is Heaps-law bounded — and above
  ``max_words`` the table is first trimmed to the top ``max_words``
  words by (count desc, word asc) with the same distributed
  local-top-N + bounded-final-group plan as `vocab.vocab_topn`, so the
  driver never holds an unbounded vocabulary.  Frequency-truncated BPE
  training is the standard practice at corpus scale (the tail
  contributes no merges: a pair inside a count-1 word can win only
  after every pair with count ≥ 2 is exhausted).  Ties break by
  (count desc, pair lexicographic asc) so training is bit-reproducible
  across block orderings and cluster sizes.
* :func:`bpe_encode` — one vectorized-ish `map_batches` stage: merges
  ship once via ``ray.put``; each worker memoizes word → subword-id
  encodings (Zipf: the cache hit rate is the corpus' unigram mass),
  so the greedy merge loop runs once per UNIQUE word per worker, not
  once per occurrence.

Vocabulary ids are deterministic: sorted alphabet first, then merge
outputs in merge order — the id table is a pure function of the
merges list, so encode needs no second artifact.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from grass_ray.stages.vocab import ASCII_WORD

_EOW = " "  # end-of-word sentinel symbol (never in ASCII_WORD text)


def _word_symbols(word: str) -> tuple:
    return tuple(word) + (_EOW,)


def _pair_stats(words, counts):
    """pair -> total count and pair -> {word index} over symbol seqs."""
    pair_cnt: dict = {}
    pair_words: dict = {}
    for i, (syms, c) in enumerate(zip(words, counts)):
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            pair_cnt[p] = pair_cnt.get(p, 0) + c
            s = pair_words.get(p)
            if s is None:
                pair_words[p] = {i}
            else:
                s.add(i)
    return pair_cnt, pair_words


def _merge_word(syms: tuple, pair: tuple, joined: str) -> tuple:
    out = []
    i, n = 0, len(syms)
    a, b = pair
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(
    ds,
    *,
    n_merges: int = 1000,
    text_col: str = "text",
    pattern: str = ASCII_WORD,
    max_words: int = 1_000_000,
    min_pair_count: int = 2,
):
    """Learn BPE merges from the corpus; returns ``(merges, alphabet)``
    where ``merges`` is a list of ``(left, right)`` symbol pairs in
    merge order and ``alphabet`` the sorted base-symbol list.

    Distributed shape: ONE word-count exchange (`vocab.word_counts`),
    a distributed top-``max_words`` trim when the vocabulary exceeds
    the driver bound, then a driver-side merge loop over the bounded
    (word, count) summary with incremental pair-count maintenance —
    O(touched pairs) per merge, not a rescan.  Training stops early
    when the best pair's count falls below ``min_pair_count``.
    """
    from grass_ray.stages.vocab import word_counts

    counts_ds = word_counts(ds, text_col=text_col, pattern=pattern)
    counts_ds = counts_ds.materialize()
    n_vocab = counts_ds.count()
    if n_vocab > max_words:
        # distributed trim: local top-N per block -> one bounded final
        # group (vocab_topn's plan, inlined for the counts Dataset)
        def local(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            idx = pc.sort_indices(
                batch,
                sort_keys=[("cnt", "descending"), ("word", "ascending")],
            )
            t = batch.take(idx[:max_words])
            return t.append_column(
                "_g", pa.array(np.zeros(t.num_rows, dtype=np.int8))
            )

        def final(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            idx = pc.sort_indices(
                batch,
                sort_keys=[("cnt", "descending"), ("word", "ascending")],
            )
            return batch.take(idx[:max_words]).select(["word", "cnt"])

        counts_ds = (
            counts_ds.map_batches(local, batch_format="pyarrow")
            .groupby("_g")
            .map_groups(final, batch_format="pyarrow")
        )
    tbl = counts_ds.to_pandas()  # bounded: ≤ max_words rows
    word_list = tbl["word"].tolist()
    cnt_arr = tbl["cnt"].to_numpy(dtype=np.int64)
    # deterministic processing order (block order is arbitrary)
    order = np.lexsort((np.asarray(word_list, dtype=object), -cnt_arr))
    word_list = [word_list[i] for i in order]
    cnt_arr = cnt_arr[order]

    words = [_word_symbols(w) for w in word_list]
    counts = cnt_arr.tolist()
    alphabet = sorted({s for syms in words for s in syms})
    pair_cnt, pair_words = _pair_stats(words, counts)

    merges: list[tuple] = []
    for _ in range(n_merges):
        if not pair_cnt:
            break
        # max by (count, -lex): pin ties to the lexicographically
        # smallest pair for bit-reproducible training
        best = None
        best_c = 0
        for p, c in pair_cnt.items():
            if c > best_c or (c == best_c and best is not None and p < best):
                best, best_c = p, c
        if best is None or best_c < min_pair_count:
            break
        merges.append(best)
        joined = best[0] + best[1]
        affected = pair_words.pop(best, set())
        pair_cnt.pop(best, None)
        for i in sorted(affected):
            syms = words[i]
            c = counts[i]
            # retire the word's old pair contributions
            for a, b in zip(syms, syms[1:]):
                p = (a, b)
                if p in pair_cnt:
                    pair_cnt[p] -= c
                    if pair_cnt[p] <= 0:
                        del pair_cnt[p]
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(i)
                        if not s:
                            del pair_words[p]
            new = _merge_word(syms, best, joined)
            words[i] = new
            # add the new contributions
            for a, b in zip(new, new[1:]):
                p = (a, b)
                pair_cnt[p] = pair_cnt.get(p, 0) + c
                pair_words.setdefault(p, set()).add(i)
    return merges, alphabet


def bpe_vocab(merges, alphabet) -> dict:
    """symbol -> id: sorted alphabet first, then merge outputs in merge
    order (first occurrence wins when two merge chains produce the same
    string)."""
    vocab: dict = {}
    for s in alphabet:
        vocab.setdefault(s, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return vocab


def _encode_word(word: str, ranks: dict) -> tuple:
    """Greedy lowest-rank merge loop (the reference BPE encode)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_r = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_r, best_i = r, i
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


_BPE_STATE: dict = {}


def bpe_encode(
    ds,
    merges,
    alphabet,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = ASCII_WORD,
    oov_id: int = -1,
):
    """(base columns minus text, tokens list<int64>, n_tok): subword
    ids per document.  Merges/alphabet ship once (``ray.put``); each
    worker memoizes per-unique-word encodings.  Symbols outside the
    trained vocabulary (unseen characters) emit ``oov_id``."""
    import ray

    ref = ray.put((list(merges), list(alphabet)))
    rx_pat = pattern

    def kernel(batch: pa.Table) -> pa.Table:
        key = ref.hex() if hasattr(ref, "hex") else str(ref)
        st = _BPE_STATE.get(key)
        if st is None:
            m, al = ray.get(ref)
            ranks = {tuple(p): i for i, p in enumerate(m)}
            vocab = bpe_vocab([tuple(p) for p in m], al)
            st = (ranks, vocab, {}, re.compile(rx_pat))
            _BPE_STATE.clear()  # one tokenizer per worker at a time
            _BPE_STATE[key] = st
        ranks, vocab, cache, rx = st
        texts = batch.column(text_col).to_pylist()
        flat: list[int] = []
        offsets = np.zeros(len(texts) + 1, dtype=np.int64)
        for i, t in enumerate(texts):
            ids: list[int] = []
            for w in rx.findall((t or "").lower()):
                enc = cache.get(w)
                if enc is None:
                    enc = tuple(
                        vocab.get(s, oov_id) for s in _encode_word(w, ranks)
                    )
                    if len(cache) < 262144:
                        cache[w] = enc
                ids.extend(enc)
            flat.extend(ids)
            offsets[i + 1] = len(flat)
        toks = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            pa.array(np.asarray(flat, dtype=np.int64), type=pa.int64()),
        ).cast(pa.list_(pa.int64()))
        keep = [c for c in batch.column_names if c != text_col]
        out = batch.select(keep)
        out = out.append_column("tokens", toks)
        return out.append_column(
            "n_tok", pa.array(np.diff(offsets).astype(np.int64))
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def bpe_decode_word(ids, vocab: dict) -> str:
    """Inverse lookup for tests: subword ids -> the lowered word."""
    inv = {v: k for k, v in vocab.items()}
    return "".join(inv[int(i)] for i in ids).replace(_EOW, "")
