"""Text analysis kernels for training-data pipelines.

Language-ID (stopword/n-gram heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace + a BPE-ish
regex), and document fingerprinting (rolling hash).  All vectorized or
regex-compiled-once; used through the actor-pool stage
:class:`grass_ray.stages.text_stage.TextAnalyzer`.
"""

from __future__ import annotations

import re

import numpy as np

# tiny stopword profiles — enough to separate the major Latin-script
# languages with a ratio heuristic (public knowledge word lists)
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on", "with", "as", "this", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf", "dem", "den", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "dans", "pour", "que", "qui", "sur", "avec"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "en", "que", "por", "con", "para", "del"},
    "it": {"il", "la", "le", "e", "è", "un", "una", "di", "che", "per", "con", "non", "sono", "del", "gli"},
}

WORD_RE = re.compile(r"[\w']+", re.UNICODE)
# BPE-ish pre-tokenizer: GPT-2-style contractions / words / numbers /
# punctuation runs / whitespace runs (public pattern shape)
BPE_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+"
)
PUNCT_RE = re.compile(r"[^\w\s]")

STOPWORDS_EN = LANG_PROFILES["en"]


def detect_language(text: str) -> tuple[str, float]:
    """Best-scoring language by stopword hit ratio; ('und', 0.0) if no
    profile scores above zero."""
    words = [w.lower() for w in WORD_RE.findall(text)]
    if not words:
        return "und", 0.0
    wset = words  # keep duplicates: frequency-weighted evidence
    best_lang, best = "und", 0.0
    for lang, prof in LANG_PROFILES.items():
        hits = sum(1 for w in wset if w in prof)
        score = hits / len(words)
        if score > best:
            best_lang, best = lang, score
    return best_lang, best


def quality_features(text: str) -> dict:
    """Heuristic quality signals (Gopher/C4-style ratio filters)."""
    n_chars = len(text)
    words = WORD_RE.findall(text)
    n_words = len(words)
    mean_wl = float(np.mean([len(w) for w in words])) if words else 0.0
    n_punct = len(PUNCT_RE.findall(text))
    lower = [w.lower() for w in words]
    stop_ratio = (
        sum(1 for w in lower if w in STOPWORDS_EN) / n_words if n_words else 0.0
    )
    alpha_ratio = (
        sum(1 for c in text if c.isalpha()) / n_chars if n_chars else 0.0
    )
    uniq_ratio = len(set(lower)) / n_words if n_words else 0.0
    # a simple monotone score in [0,1]: long-enough, wordy, not
    # punctuation-soup, some stopwords (i.e. running prose)
    score = float(
        np.clip(
            0.25 * min(n_words / 50.0, 1.0)
            + 0.25 * np.clip((mean_wl - 2.0) / 6.0, 0, 1)
            + 0.25 * min(stop_ratio / 0.3, 1.0)
            + 0.25 * alpha_ratio,
            0.0,
            1.0,
        )
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "punct_ratio": n_punct / n_chars if n_chars else 0.0,
        "stopword_ratio": stop_ratio,
        "alpha_ratio": alpha_ratio,
        "unique_word_ratio": uniq_ratio,
        "quality_score": score,
    }


def count_tokens_ws(text: str) -> int:
    return len(text.split())


def count_tokens_bpe(text: str) -> int:
    return len(BPE_RE.findall(text))


_RK_BASE = np.uint64(1099511628211)  # Rabin–Karp base (mod 2^64 wraps)


def fingerprint(text: str) -> int:
    """Deterministic 63-bit Rabin–Karp rolling hash of the document.

    Vectorized: h = Σ byte[i]·B^(n-1-i) mod 2^64 — uint64 wraparound IS
    the modulus, so one cumprod + dot per doc.  Stable across processes
    (unlike Python's ``hash``), which matters because batches hash on
    different Ray workers.
    """
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8).astype(
        np.uint64
    )
    if len(b) == 0:
        return 0
    with np.errstate(over="ignore"):
        powers = np.ones(len(b), dtype=np.uint64)
        if len(b) > 1:
            np.cumprod(
                np.full(len(b) - 1, _RK_BASE, dtype=np.uint64),
                out=powers[1:],
            )
        h = np.uint64(np.sum(b * powers[::-1], dtype=np.uint64))
    return int(h & np.uint64(0x7FFFFFFFFFFFFFFF)) ^ len(b)


def fingerprint_batch(texts) -> np.ndarray:
    return np.array([fingerprint(t) for t in texts], dtype=np.int64)


def _stable_hash64(s: str) -> int:
    """Process-stable 63-bit string hash (blake2b digest)."""
    import hashlib

    return (
        int.from_bytes(
            hashlib.blake2b(s.encode("utf-8", "ignore"), digest_size=8).digest(),
            "little",
        )
        & 0x7FFFFFFFFFFFFFFF
    )


def _md5_hash64(s: str) -> int:
    """Lower 64 bits of the MD5 digest, little-endian — bit-identical
    to DuckDB's ``md5_number_lower``, making hash-token pipelines
    exactly SQL-replicable (the HUGEINT md5_number is the 16 digest
    bytes little-endian; its lower limb is bytes 8..16)."""
    import hashlib

    return int.from_bytes(
        hashlib.md5(s.encode("utf-8", "ignore")).digest()[8:16], "little"
    )


_WORD_HASH_CACHE: dict = {}
_WORD_HASH_CACHE_MD5: dict = {}


def _word_ids(words, hash_fn: str = "blake2b") -> np.ndarray:
    """Process-stable hash per word, memoized (vocabulary is small
    relative to the token stream).  ``hash_fn="md5"`` uses the
    DuckDB-``md5_number_lower``-identical hash (separate cache)."""
    if hash_fn == "blake2b":
        cache, fn = _WORD_HASH_CACHE, _stable_hash64
    elif hash_fn == "md5":
        cache, fn = _WORD_HASH_CACHE_MD5, _md5_hash64
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = cache.get(w)
        if h is None:
            h = np.uint64(fn(w))
            if len(cache) < 1 << 20:
                cache[w] = h
        out[i] = h
    return out


def shingles(text: str, k: int = 5) -> np.ndarray:
    """Word k-gram shingle hashes (unique int64, process-stable).

    Vectorized: per-word stable hashes (memoized) combined with a
    polynomial rolling scheme over each k-window (uint64 wraparound),
    so the per-shingle cost is one fused numpy pass instead of a
    cryptographic hash per shingle.
    """
    words = [w.lower() for w in WORD_RE.findall(text)]
    if not words:
        return np.empty(0, dtype=np.int64)
    ids = _word_ids(words)
    if len(words) < k:
        with np.errstate(over="ignore"):
            powers = np.empty(len(ids), dtype=np.uint64)
            powers[0] = 1
            if len(ids) > 1:
                np.cumprod(
                    np.full(len(ids) - 1, _RK_BASE, dtype=np.uint64),
                    out=powers[1:],
                )
            h = np.uint64(np.sum(ids * powers, dtype=np.uint64))
        return np.array([int(h >> np.uint64(1))], dtype=np.int64)
    with np.errstate(over="ignore"):
        win = np.lib.stride_tricks.sliding_window_view(ids, k)
        powers = np.empty(k, dtype=np.uint64)
        powers[0] = 1
        if k > 1:
            np.cumprod(np.full(k - 1, _RK_BASE, dtype=np.uint64), out=powers[1:])
        vals = (win * powers).sum(axis=1, dtype=np.uint64)
    return np.unique((vals >> np.uint64(1)).astype(np.int64))


def repetition_features(text: str) -> dict:
    """Gopher-style repetition signals over the lowered word stream:
    fraction of the most common word, and duplicate word-2-gram /
    3-gram fractions (1 − distinct/total).  Empty / too-short streams
    yield 0.0 (no evidence of repetition)."""
    from collections import Counter

    words = [w.lower() for w in WORD_RE.findall(text)]
    n = len(words)
    out = {"top_word_frac": 0.0, "dup_bigram_frac": 0.0, "dup_trigram_frac": 0.0}
    if n == 0:
        return out
    c = Counter(words)
    out["top_word_frac"] = max(c.values()) / n
    for k, key in ((2, "dup_bigram_frac"), (3, "dup_trigram_frac")):
        total = n - k + 1
        if total <= 0:
            continue
        grams = {tuple(words[i : i + k]) for i in range(total)}
        out[key] = 1.0 - len(grams) / total
    return out


# ---------------------------------------------------------------------------
# whole-batch vectorized kernels (the per-row functions above stay as the
# reference semantics; these compute identical values one batch at a time)
# ---------------------------------------------------------------------------

# ASCII fast-path classification tables; non-ASCII code points fall back
# to the exact Python predicates, memoized (vocabulary of non-ASCII chars
# in a batch is tiny relative to the stream)
_T_ALPHA = np.zeros(128, dtype=bool)
_T_SPACE = np.zeros(128, dtype=bool)
_T_WORD = np.zeros(128, dtype=bool)  # Python re \w for ASCII
for _c in range(128):
    _ch = chr(_c)
    _T_ALPHA[_c] = _ch.isalpha()
    _T_SPACE[_c] = _ch.isspace()
    _T_WORD[_c] = _ch.isalnum() or _ch == "_"
_NONASCII_CLASS: dict[int, tuple[bool, bool, bool]] = {}


def _classify_codepoints(cp: np.ndarray):
    """(is_alpha, is_space, is_word) boolean arrays for a uint32
    code-point stream — table lookup for ASCII, exact memoized Python
    predicates for the non-ASCII tail."""
    ascii_mask = cp < 128
    idx = np.where(ascii_mask, cp, 0)
    alpha = _T_ALPHA[idx] & ascii_mask
    space = _T_SPACE[idx] & ascii_mask
    word = _T_WORD[idx] & ascii_mask
    if not ascii_mask.all():
        hi = np.flatnonzero(~ascii_mask)
        for i in hi:
            c = int(cp[i])
            cls = _NONASCII_CLASS.get(c)
            if cls is None:
                ch = chr(c)
                cls = (ch.isalpha(), ch.isspace(), ch.isalnum() or ch == "_")
                if len(_NONASCII_CLASS) < 1 << 16:
                    _NONASCII_CLASS[c] = cls
            alpha[i], space[i], word[i] = cls
    return alpha, space, word


def _run_starts(active: np.ndarray, doc_starts: np.ndarray) -> np.ndarray:
    """Start positions of maximal runs of ``active`` that do not cross
    document boundaries."""
    if len(active) == 0:
        return np.empty(0, dtype=np.int64)
    start = active.copy()
    if len(active) > 1:
        start[1:] &= ~active[:-1]
    ds = doc_starts[doc_starts < len(active)]  # all-empty docs at the tail
    start[ds] = active[ds]
    return np.flatnonzero(start)


_PROFILE_ORDER = list(LANG_PROFILES)

# cached universal power arrays of the rolling-hash base (and inverse):
# they are data-independent, so one geometric-growth cache serves every
# batch (rebuilding them was ~40% of the batch fingerprint cost)
_POW_CACHE: dict[str, np.ndarray] = {}


def _powers(total: int):
    """(invpow, bpow) with invpow[i]=B^-i, bpow[i]=B^i for i<=total."""
    bp = _POW_CACHE.get("b")
    if bp is None or len(bp) <= total:
        size = max(total + 1, 1 << 16)
        if bp is not None:
            size = max(size, 2 * len(bp))
        with np.errstate(over="ignore"):
            b = np.empty(size, dtype=np.uint64)
            b[0] = 1
            np.cumprod(np.full(size - 1, _RK_BASE, dtype=np.uint64), out=b[1:])
            inv_b = np.uint64(pow(int(_RK_BASE), -1, 1 << 64))
            iv = np.empty(size, dtype=np.uint64)
            iv[0] = 1
            np.cumprod(np.full(size - 1, inv_b, dtype=np.uint64), out=iv[1:])
        _POW_CACHE["b"], _POW_CACHE["inv"] = b, iv
    return _POW_CACHE["inv"], _POW_CACHE["b"]


# ASCII lowercase map for the word-identity hash; non-ASCII memoized
# (single-codepoint lowering only — a multi-char expansion keeps its
# original code point, so two spellings that only unify under full
# string lowering hash apart; vanishingly rare and only affects
# unique_word_ratio by the same token)
_T_LOWER = np.arange(128, dtype=np.uint32)
_T_LOWER[ord("A") : ord("Z") + 1] += 32
_NONASCII_LOWER: dict[int, int] = {}


def _lower_codepoints(cp: np.ndarray) -> np.ndarray:
    ascii_mask = cp < 128
    out = np.where(ascii_mask, _T_LOWER[np.where(ascii_mask, cp, 0)], cp)
    if not ascii_mask.all():
        for i in np.flatnonzero(~ascii_mask):
            c = int(cp[i])
            lc = _NONASCII_LOWER.get(c)
            if lc is None:
                l = chr(c).lower()
                lc = ord(l) if len(l) == 1 else c
                if len(_NONASCII_LOWER) < 1 << 16:
                    _NONASCII_LOWER[c] = lc
            out[i] = lc
    return out


def _span_hashes(values: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """64-bit polynomial hash of each [start, end) span of a uint32
    value stream, in one prefix-sum pass (uint64 wraparound modulus)."""
    total = len(values)
    invpow, bpow = _powers(total)
    with np.errstate(over="ignore"):
        g = np.empty(total + 1, dtype=np.uint64)
        g[0] = 0
        np.cumsum(values.astype(np.uint64) * invpow[:total], out=g[1:])
        h = (g[ends] - g[starts]) * bpow[ends]
    return h ^ (ends - starts).astype(np.uint64)


def analyze_batch(texts: list, features=("lang", "tokens", "quality", "fingerprint")) -> dict:
    """Vectorized batch form of :func:`detect_language`,
    :func:`quality_features`, :func:`count_tokens_ws`,
    :func:`count_tokens_bpe` and :func:`fingerprint` — bit-identical
    values (parity-tested), one numpy pass per feature family instead of
    Python per row/word/char."""
    feats = set(features)
    n = len(texts)
    out: dict = {}
    if n == 0:
        return out
    big = "".join(texts)
    cp = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32)
    lens = np.fromiter(map(len, texts), dtype=np.int64, count=n)
    doc_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=doc_starts[1:])
    bounds = np.concatenate([doc_starts, [len(cp)]])

    def per_doc_count(positions: np.ndarray) -> np.ndarray:
        return np.bincount(
            np.searchsorted(bounds, positions, side="right") - 1, minlength=n
        )

    need_words = feats & {"lang", "quality", "repetition"}
    if need_words or "quality" in feats or "tokens" in feats:
        alpha, space, word = _classify_codepoints(cp)

    if need_words:
        # word spans: runs of [\w'] within each doc (Python re [\w']+)
        wchar = word | (cp == np.uint32(ord("'")))
        wstarts = _run_starts(wchar, doc_starts)
        # run ends: next position where wchar stops
        nonw = np.flatnonzero(~wchar)
        wends = np.searchsorted(nonw, wstarts)
        wends = np.where(
            wends < len(nonw), nonw[np.minimum(wends, len(nonw) - 1)], len(cp)
        ) if len(nonw) else np.full(len(wstarts), len(cp), dtype=np.int64)
        # clamp to doc end (a run can't cross docs by construction of
        # _run_starts only for STARTS; ends must clamp explicitly)
        doc_of_w = np.searchsorted(bounds, wstarts, side="right") - 1
        wends = np.minimum(wends, bounds[doc_of_w + 1])
        n_words = np.bincount(doc_of_w, minlength=n)
        w_len = wends - wstarts
        if len(wstarts):
            # word identity = span hash over the LOWERED code-point
            # stream (no substring materialization, no object sort);
            # strings extracted once per UNIQUE word for the profile
            # membership lookups
            cp_low = _lower_codepoints(cp)
            wh = _span_hashes(cp_low, wstarts, wends)
            uniqh, first_idx, inv = np.unique(
                wh, return_index=True, return_inverse=True
            )
            n_luniq = len(uniqh)
            u_lcode = np.arange(n_luniq, dtype=np.int64)
            reps = [
                big[wstarts[i] : wends[i]].lower() for i in first_idx
            ]
            u_member = np.zeros((n_luniq, len(_PROFILE_ORDER)), dtype=np.int64)
            for j, lang in enumerate(_PROFILE_ORDER):
                prof = LANG_PROFILES[lang]
                u_member[:, j] = [w in prof for w in reps]
        else:
            inv = np.empty(0, dtype=np.int64)
            u_lcode, n_luniq = np.empty(0, dtype=np.int64), 0
            u_member = np.zeros((0, len(_PROFILE_ORDER)), dtype=np.int64)

    if "lang" in feats:
        hits = np.zeros((n, len(_PROFILE_ORDER)), dtype=np.int64)
        if len(inv):
            for j in range(len(_PROFILE_ORDER)):
                hits[:, j] = np.bincount(
                    doc_of_w, weights=u_member[inv, j], minlength=n
                ).astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            scores = hits / np.maximum(n_words, 1)[:, None]
        best_j = np.argmax(scores, axis=1)
        best_s = scores[np.arange(n), best_j]
        langs = np.array(_PROFILE_ORDER, dtype=object)[best_j]
        und = (best_s <= 0.0) | (n_words == 0)
        langs[und] = "und"
        best_s = np.where(und, 0.0, best_s)
        out["lang_pred"] = langs
        out["lang_score"] = best_s.astype(np.float64)

    if "quality" in feats:
        n_chars = lens
        sum_wl = np.zeros(n, dtype=np.int64)
        stop_hits = np.zeros(n, dtype=np.int64)
        if len(inv):
            sum_wl = np.bincount(doc_of_w, weights=w_len, minlength=n).astype(
                np.int64
            )
            en_j = _PROFILE_ORDER.index("en")
            stop_hits = np.bincount(
                doc_of_w, weights=u_member[inv, en_j], minlength=n
            ).astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean_wl = np.where(n_words > 0, sum_wl / np.maximum(n_words, 1), 0.0)
            stop_ratio = np.where(
                n_words > 0, stop_hits / np.maximum(n_words, 1), 0.0
            )
        # distinct lowered words per doc
        uniq_per_doc = np.zeros(n, dtype=np.int64)
        if len(inv):
            key = doc_of_w * np.int64(max(n_luniq, 1)) + u_lcode[inv]
            uk = np.unique(key)
            uniq_per_doc = np.bincount(
                (uk // np.int64(max(n_luniq, 1))).astype(np.int64), minlength=n
            )
        with np.errstate(invalid="ignore", divide="ignore"):
            uniq_ratio = np.where(
                n_words > 0, uniq_per_doc / np.maximum(n_words, 1), 0.0
            )
        # punct = [^\w\s] (the \w table already includes "_"),
        # alpha = str.isalpha — per-doc codepoint counts
        punct_pos = np.flatnonzero(~word & ~space)
        n_punct = per_doc_count(punct_pos) if len(punct_pos) else np.zeros(n, dtype=np.int64)
        alpha_pos = np.flatnonzero(alpha)
        n_alpha = per_doc_count(alpha_pos) if len(alpha_pos) else np.zeros(n, dtype=np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            punct_ratio = np.where(n_chars > 0, n_punct / np.maximum(n_chars, 1), 0.0)
            alpha_ratio = np.where(n_chars > 0, n_alpha / np.maximum(n_chars, 1), 0.0)
        score = np.clip(
            0.25 * np.minimum(n_words / 50.0, 1.0)
            + 0.25 * np.clip((mean_wl - 2.0) / 6.0, 0, 1)
            + 0.25 * np.minimum(stop_ratio / 0.3, 1.0)
            + 0.25 * alpha_ratio,
            0.0,
            1.0,
        )
        out["n_words"] = n_words.astype(np.int64)
        out["mean_word_len"] = mean_wl.astype(np.float64)
        out["punct_ratio"] = punct_ratio.astype(np.float64)
        out["stopword_ratio"] = stop_ratio.astype(np.float64)
        out["alpha_ratio"] = alpha_ratio.astype(np.float64)
        out["unique_word_ratio"] = uniq_ratio.astype(np.float64)
        out["quality_score"] = score.astype(np.float64)

    if "repetition" in feats:
        top = np.zeros(n)
        dup2 = np.zeros(n)
        dup3 = np.zeros(n)
        if len(inv):
            wh_l = uniqh[inv]  # lowered word-identity hash per word
            # fraction of the most common word: counts per (doc, word)
            key = doc_of_w * np.int64(max(n_luniq, 1)) + inv
            uk, cnts = np.unique(key, return_counts=True)
            top_cnt = np.zeros(n, dtype=np.int64)
            np.maximum.at(top_cnt, uk // np.int64(max(n_luniq, 1)), cnts)
            nz = n_words > 0
            top[nz] = top_cnt[nz] / n_words[nz]

            def dup_frac(k: int) -> np.ndarray:
                out_k = np.zeros(n)
                if len(wh_l) < k:
                    return out_k
                with np.errstate(over="ignore"):
                    h = wh_l[: len(wh_l) - k + 1].copy()
                    for j in range(1, k):
                        h = h * _RK_BASE + wh_l[j : len(wh_l) - k + 1 + j]
                same = doc_of_w[: len(doc_of_w) - k + 1] == doc_of_w[k - 1 :]
                d = doc_of_w[: len(doc_of_w) - k + 1][same]
                hv = h[same]
                totals = np.bincount(d, minlength=n)
                if len(d):
                    order = np.lexsort((hv, d))
                    ds_, hs_ = d[order], hv[order]
                    newu = np.empty(len(ds_), dtype=bool)
                    newu[0] = True
                    newu[1:] = (ds_[1:] != ds_[:-1]) | (hs_[1:] != hs_[:-1])
                    distinct = np.bincount(ds_[newu], minlength=n)
                else:
                    distinct = totals
                tz = totals > 0
                out_k[tz] = 1.0 - distinct[tz] / totals[tz]
                return out_k

            dup2 = dup_frac(2)
            dup3 = dup_frac(3)
        out["top_word_frac"] = top.astype(np.float64)
        out["dup_bigram_frac"] = dup2.astype(np.float64)
        out["dup_trigram_frac"] = dup3.astype(np.float64)

    if "tokens" in feats:
        # n_tok_ws: runs of non-whitespace (str.split semantics)
        ws_starts = _run_starts(~space, doc_starts)
        out["n_tok_ws"] = (
            per_doc_count(ws_starts) if len(ws_starts) else np.zeros(n, dtype=np.int64)
        )
        # BPE-ish count: the lookahead alternation isn't expressible as
        # vectorized runs — per-doc C-regex count without building the
        # match-string list
        out["n_tok_bpe"] = np.fromiter(
            (len(BPE_RE.findall(t)) for t in texts), dtype=np.int64, count=n
        )

    if "fingerprint" in feats:
        out["fingerprint"] = fingerprint_batch_v(texts)
    return out


def fingerprint_batch_v(texts) -> np.ndarray:
    """Vectorized :func:`fingerprint` over a batch: one prefix-sum over
    the concatenated UTF-8 byte stream (H = B^{s+n-1}·(G[e]-G[s]) with
    G[j] = Σ_{i<j} byte[i]·B^{-i}, uint64 wraparound) — bit-identical
    to the per-row form."""
    n = len(texts)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    bufs = [t.encode("utf-8", "ignore") for t in texts]
    blens = np.fromiter(map(len, bufs), dtype=np.int64, count=n)
    data = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.uint64)
    total = len(data)
    ends = np.cumsum(blens)
    starts = ends - blens
    nonempty = blens > 0
    if total:
        invpow, bpow = _powers(total)
        with np.errstate(over="ignore"):
            g = np.empty(total + 1, dtype=np.uint64)
            g[0] = 0
            np.cumsum(data * invpow[:total], out=g[1:])
            h = (g[ends] - g[starts]) * bpow[np.maximum(ends - 1, 0)]
        vals = (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64) ^ blens
        out[nonempty] = vals[nonempty]
    return out


# ASCII table for the decontamination word class [a-z0-9_'] — the
# vocab.ASCII_WORD regex as a code-point lookup (texts are lowered first,
# so A-Z never appears; non-ASCII is always a separator)
_T_AWORD = np.zeros(128, dtype=bool)
for _c in "abcdefghijklmnopqrstuvwxyz0123456789_'":
    _T_AWORD[ord(_c)] = True


def _word_span_arrays(texts, *, ascii_words: bool):
    """Word spans of a whole batch over the concatenated code-point
    stream: (big, cp, wstarts, wends, doc_of_w).  ``ascii_words`` uses
    the decontamination class ``[a-z0-9_']`` (table lookup); otherwise
    the Python ``[\\w']+`` class via :func:`_classify_codepoints`."""
    n = len(texts)
    big = "".join(texts)
    cp = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32)
    lens = np.fromiter(map(len, texts), dtype=np.int64, count=n)
    doc_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=doc_starts[1:])
    bounds = np.concatenate([doc_starts, [len(cp)]])
    if ascii_words:
        am = cp < 128
        wchar = _T_AWORD[np.where(am, cp, 0)] & am
    else:
        _, _, word = _classify_codepoints(cp)
        wchar = word | (cp == np.uint32(ord("'")))
    wstarts = _run_starts(wchar, doc_starts)
    nonw = np.flatnonzero(~wchar)
    if len(nonw):
        we = np.searchsorted(nonw, wstarts)
        wends = np.where(
            we < len(nonw), nonw[np.minimum(we, len(nonw) - 1)], len(cp)
        )
    else:
        wends = np.full(len(wstarts), len(cp), dtype=np.int64)
    doc_of_w = np.searchsorted(bounds, wstarts, side="right") - 1
    wends = np.minimum(wends, bounds[doc_of_w + 1])
    return big, cp, wstarts, wends, doc_of_w


def kgram_hashes_batch(
    texts, k: int, *, ascii_words: bool = False, short_doc_hash: bool = True,
    hash_fn: str = "blake2b",
):
    """Per-document UNIQUE word k-gram hashes for a whole batch in one
    numpy pass — the batch kernel form of :func:`shingles`
    (``ascii_words=False``) and of ``vocab._gram_hashes``
    (``ascii_words=True, short_doc_hash=False``); bit-identical values
    (parity-tested).

    Returns ``(values, lens)``: a flat int64 hash array (ascending
    within each document) and the per-document counts.

    Plan: one word-span pass over the concatenated code-point stream,
    word identity = span hash → blake2b once per UNIQUE word (shared
    ``_word_ids`` cache), then every k-window's polynomial hash from ONE
    prefix sum over the word-id stream — ``h(s) = (G[s+k] − G[s])·B^−s``
    with ``G[i] = Σ_{j<i} id[j]·B^j`` (uint64 wraparound modulus), which
    equals ``Σ_j id[s+j]·B^j`` exactly.  ``short_doc_hash`` emits one
    whole-document hash for docs with ``0 < n_words < k`` (the
    :func:`shingles` rule); off matches the decontamination rule
    (short docs cannot be k-gram contaminated)."""
    n = len(texts)
    lens_out = np.zeros(n, dtype=np.int64)
    empty = np.empty(0, dtype=np.int64)
    if n == 0:
        return empty, lens_out
    if ascii_words:
        texts = [(t or "").lower() for t in texts]
    else:
        texts = [t or "" for t in texts]
    big, cp, wstarts, wends, doc_of_w = _word_span_arrays(
        texts, ascii_words=ascii_words
    )
    nw_total = len(wstarts)
    if nw_total == 0:
        return empty, lens_out
    wh = _span_hashes(cp, wstarts, wends)
    uniq_h, first_idx, inv = np.unique(wh, return_index=True, return_inverse=True)
    if ascii_words:
        reps = [big[wstarts[i] : wends[i]] for i in first_idx]
    else:
        # shingles() lowers each word AFTER matching on the original text
        reps = [big[wstarts[i] : wends[i]].lower() for i in first_idx]
    ids = _word_ids(reps, hash_fn=hash_fn)[inv]
    invpow, bpow = _powers(nw_total)
    with np.errstate(over="ignore"):
        g = np.empty(nw_total + 1, dtype=np.uint64)
        g[0] = 0
        np.cumsum(ids * bpow[:nw_total], out=g[1:])
    if nw_total >= k:
        same = doc_of_w[: nw_total - k + 1] == doc_of_w[k - 1 :]
        win_s = np.flatnonzero(same)
    else:
        win_s = np.empty(0, dtype=np.int64)
    with np.errstate(over="ignore"):
        vals = (g[win_s + k] - g[win_s]) * invpow[win_s]
    docs = doc_of_w[win_s]
    if short_doc_hash:
        nw = np.bincount(doc_of_w, minlength=n)
        first_w = np.zeros(n, dtype=np.int64)
        np.cumsum(nw[:-1], out=first_w[1:])
        short = np.flatnonzero((nw > 0) & (nw < k))
        if len(short):
            s = first_w[short]
            with np.errstate(over="ignore"):
                sv = (g[s + nw[short]] - g[s]) * invpow[s]
            vals = np.concatenate([vals, sv])
            docs = np.concatenate([docs, short])
    if len(vals) == 0:
        return empty, lens_out
    out_vals = (vals >> np.uint64(1)).astype(np.int64)
    order = np.lexsort((out_vals, docs))
    dv, vv = docs[order], out_vals[order]
    newu = np.empty(len(dv), dtype=bool)
    newu[0] = True
    newu[1:] = (dv[1:] != dv[:-1]) | (vv[1:] != vv[:-1])
    lens_out = np.bincount(dv[newu], minlength=n).astype(np.int64)
    return vv[newu], lens_out


def word_count_batch(texts):
    """(unique lowered word strings, counts) over a whole batch with the
    decontamination/vocabulary word class ``[a-z0-9_']`` — the batch
    kernel form of per-document ``Counter(rx.findall(t.lower()))``
    folding: one word-span pass, strings extracted once per UNIQUE word
    (span-hash identity), counts via ``bincount``."""
    n = len(texts)
    if n == 0:
        return [], np.empty(0, dtype=np.int64)
    texts = [(t or "").lower() for t in texts]
    big, cp, ws, we, _dw = _word_span_arrays(texts, ascii_words=True)
    if len(ws) == 0:
        return [], np.empty(0, dtype=np.int64)
    wh = _span_hashes(cp, ws, we)
    uniq, first_idx, inv = np.unique(wh, return_index=True, return_inverse=True)
    reps = [big[ws[i] : we[i]] for i in first_idx]
    cnts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    return reps, cnts


def jaccard(a, b) -> float:
    """Jaccard similarity of two shingle id arrays/sets."""
    sa, sb = set(np.asarray(a).tolist()), set(np.asarray(b).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)
