"""Fixed-size Bloom filter over 64-bit hashes — the broadcastable form
of a membership set whose exact size grows with the data.

Used by :func:`grass_ray.stages.vocab.decontaminate` (``method="bloom"``):
at corpus scale the benchmark k-gram set can outgrow the broadcast
threshold, but a Bloom bitmap stays a few MB regardless of cardinality,
ships once via ``ray.put``, and filters map-side with zero shuffle.
Bitmaps are OR-mergeable, so per-block partial bitmaps fold to the
global filter without a distinct exchange.

Guarantee: NO false negatives (every true member reported present);
false positives at the standard (1 - e^{-kn/m})^k rate — for
decontamination that direction is safe (a false positive over-drops a
training doc, never leaks a benchmark gram).
"""

from __future__ import annotations

import numpy as np

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_MIX = np.uint64(0xBF58476D1CE4E5B9)


def bloom_params(expected_n: int, fp_rate: float = 1e-4) -> tuple[int, int]:
    """(m_bits, k) sized for ``expected_n`` members at ``fp_rate`` —
    m = -n·ln(p)/ln(2)², k = (m/n)·ln(2); m rounded up to a power of
    two so indexing is a mask, not a modulo."""
    n = max(expected_n, 1)
    m = int(-n * np.log(fp_rate) / (np.log(2) ** 2))
    m_bits = 1 << max(int(np.ceil(np.log2(max(m, 64)))), 6)
    k = max(1, int(round(m_bits / n * np.log(2))))
    return m_bits, min(k, 16)


def _positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(h), k) bit positions via double hashing h1 + i·h2."""
    h = h.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = h * _GOLD
        h1 ^= h1 >> np.uint64(33)
        h2 = (h ^ (h >> np.uint64(29))) * _MIX | np.uint64(1)
        i = np.arange(k, dtype=np.uint64)
        pos = h1[:, None] + i[None, :] * h2[:, None]
    return (pos & np.uint64(m_bits - 1)).astype(np.int64)


def bloom_empty(m_bits: int) -> np.ndarray:
    """Zeroed bitmap as a uint64 word array (m_bits must be a power of
    two and a multiple of 64)."""
    return np.zeros(m_bits // 64, dtype=np.uint64)


def bloom_add(words: np.ndarray, h: np.ndarray, k: int) -> np.ndarray:
    """Set the k bits of every hash in ``h`` (in place; returns words)."""
    if len(h) == 0:
        return words
    m_bits = len(words) * 64
    pos = _positions(h, m_bits, k).reshape(-1)
    np.bitwise_or.at(
        words, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
    )
    return words


def bloom_contains(words: np.ndarray, h: np.ndarray, k: int) -> np.ndarray:
    """Boolean membership mask for every hash in ``h``."""
    if len(h) == 0:
        return np.zeros(0, dtype=bool)
    m_bits = len(words) * 64
    pos = _positions(h, m_bits, k)
    bits = (
        words[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))
    ) & np.uint64(1)
    return bits.all(axis=1)


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """OR-fold two bitmaps (mergeable partials)."""
    return a | b
