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


_WORD_HASH_CACHE: dict = {}


def _word_ids(words) -> np.ndarray:
    """Process-stable hash per word, memoized (vocabulary is small
    relative to the token stream)."""
    cache = _WORD_HASH_CACHE
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = cache.get(w)
        if h is None:
            h = np.uint64(_stable_hash64(w))
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


def jaccard(a, b) -> float:
    """Jaccard similarity of two shingle id arrays/sets."""
    sa, sb = set(np.asarray(a).tolist()), set(np.asarray(b).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)
