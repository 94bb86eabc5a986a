"""Mergeable quantile sketch (KLL-lite) for approximate holistic
aggregation at tier scale.

Exact holistic methods (median/quantiles) shuffle raw points into their
group (``stages/grouped.rollup_points_holistic``).  At 10¹²-sequence
scale that exchange is the cost ceiling, so the engine also offers the
sketch plan: each batch emits one serialized sketch per key (bounded
size), a tiny ``groupby`` merges sketches, and quantiles are answered
from the merged summary — the standard mergeable-summary pattern
(Karnin–Lang–Liberty-style compactor hierarchy, simplified: level k
holds up to ``k_cap`` sorted items, overflow compacts by keeping every
other item (deterministic offset) and promoting to level k+1, where
each item carries weight 2^(k)).

Deterministic (compaction offset from a per-level counter, no RNG) —
the same input always produces the same sketch, keeping the engine's
reproducibility contract.  Error is ~O(1/k_cap) in rank.
"""

from __future__ import annotations

import io
import struct

import numpy as np


class KLLSketch:
    """Compactor-hierarchy quantile sketch over float64 values."""

    def __init__(self, k_cap: int = 256):
        self.k_cap = int(k_cap)
        self.levels: list[np.ndarray] = [np.empty(0)]
        self.n = 0
        self._compactions = 0

    # ---- build -----------------------------------------------------
    def update_many(self, values: np.ndarray):
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def _cap(self, level: int) -> int:
        # uniform per-level capacity: rank error ~ O(sqrt(levels)/k_cap)
        return self.k_cap

    def _compress(self):
        lvl = 0
        while lvl < len(self.levels):
            arr = self.levels[lvl]
            cap = self._cap(lvl)
            if len(arr) <= cap:
                lvl += 1
                continue
            arr = np.sort(arr)
            off = self._compactions & 1  # deterministic alternating offset
            self._compactions += 1
            keep = arr[off::2]
            if lvl + 1 >= len(self.levels):
                self.levels.append(np.empty(0))
            self.levels[lvl + 1] = np.concatenate(
                [self.levels[lvl + 1], keep]
            )
            self.levels[lvl] = np.empty(0)
            lvl += 1

    # ---- merge -----------------------------------------------------
    def merge(self, other: "KLLSketch") -> "KLLSketch":
        self.n += other.n
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0))
        for i, arr in enumerate(other.levels):
            if len(arr):
                self.levels[i] = np.concatenate([self.levels[i], arr])
        self._compress()
        return self

    # ---- query -----------------------------------------------------
    def quantile(self, q: float) -> float:
        items = []
        weights = []
        for lvl, arr in enumerate(self.levels):
            if len(arr):
                items.append(arr)
                weights.append(np.full(len(arr), 1 << lvl, dtype=np.int64))
        if not items:
            return float("nan")
        v = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(idx, len(v) - 1)])

    # ---- serialization (for shipping through Arrow binary columns) --
    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        buf.write(struct.pack("<qiq", self.n, self.k_cap, self._compactions))
        buf.write(struct.pack("<i", len(self.levels)))
        for arr in self.levels:
            buf.write(struct.pack("<i", len(arr)))
            buf.write(np.ascontiguousarray(arr).tobytes())
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLLSketch":
        buf = io.BytesIO(data)
        n, k_cap, comps = struct.unpack("<qiq", buf.read(20))
        (nlev,) = struct.unpack("<i", buf.read(4))
        sk = cls(k_cap)
        sk.n = n
        sk._compactions = comps
        sk.levels = []
        for _ in range(nlev):
            (ln,) = struct.unpack("<i", buf.read(4))
            sk.levels.append(
                np.frombuffer(buf.read(8 * ln), dtype=np.float64).copy()
            )
        if not sk.levels:
            sk.levels = [np.empty(0)]
        return sk


class SpaceSaving:
    """Mergeable heavy-hitters summary (Metwally et al. SpaceSaving).

    Holds at most ``m`` (item, count, err) entries.  For every item with
    true frequency f: the tracked count c satisfies f <= c <= f + err,
    and any item with f > n/m is guaranteed present — the standard
    deterministic heavy-hitter guarantee.  Summaries merge by summing
    counts/errors for shared items, offsetting absent items by the other
    side's minimum count (its maximum possible hidden frequency), then
    re-trimming to m — the merged summary keeps both guarantees.

    At 100 TB this replaces the full-vocabulary ``groupby`` exchange:
    each block ships at most m rows, the merge is associative, and the
    driver never sees more than m entries.
    """

    __slots__ = ("m", "n", "counts", "errs")

    def __init__(self, m: int = 4096):
        self.m = m
        self.n = 0
        self.counts: dict = {}
        self.errs: dict = {}

    def add_many(self, items, weights=None):
        # The eviction heap is built lazily PER CALL, only once the
        # summary actually fills: in the exact regime (distinct ≤ m —
        # the oracle contract) the hot loop is pure dict updates with
        # zero heap traffic.  Once built, the heap is lazily
        # invalidated — counts only grow, so the top is valid iff it
        # matches the live count (classic Stream-Summary, O(log m)
        # amortized eviction instead of an O(m) scan per insert).
        import heapq

        counts, errs, m = self.counts, self.errs, self.m
        heap: list | None = None
        if weights is None:
            weights = np.ones(len(items), dtype=np.int64)
        self.n += int(np.sum(weights))
        for it, w in zip(items, weights):
            w = int(w)
            if it in counts:
                c = counts[it] + w
                counts[it] = c
                if heap is not None:
                    heapq.heappush(heap, (c, it))
            elif len(counts) < m:
                counts[it] = w
                errs[it] = 0
                if heap is not None:
                    heapq.heappush(heap, (w, it))
            else:
                if heap is None:
                    heap = [(c, k) for k, c in counts.items()]
                    heapq.heapify(heap)
                # evict the current minimum, inherit its count as error
                while heap and counts.get(heap[0][1]) != heap[0][0]:
                    heapq.heappop(heap)
                evict = heap[0][1] if heap else min(counts, key=counts.get)
                if heap:
                    heapq.heappop(heap)
                floor = counts.pop(evict)
                errs.pop(evict, None)
                counts[it] = floor + w
                errs[it] = floor
                heapq.heappush(heap, (floor + w, it))
                if len(heap) > 8 * m:  # compact stale entries
                    heap[:] = [(c, k) for k, c in counts.items()]
                    heapq.heapify(heap)
        return self

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        out = SpaceSaving(self.m)
        out.n = self.n + other.n
        a_min = min(self.counts.values()) if len(self.counts) >= self.m else 0
        b_min = min(other.counts.values()) if len(other.counts) >= other.m else 0
        keys = set(self.counts) | set(other.counts)
        merged = {}
        merrs = {}
        for k in keys:
            ca = self.counts.get(k)
            cb = other.counts.get(k)
            c = (ca if ca is not None else a_min) + (
                cb if cb is not None else b_min
            )
            e = (self.errs.get(k, 0) if ca is not None else a_min) + (
                other.errs.get(k, 0) if cb is not None else b_min
            )
            merged[k] = c
            merrs[k] = e
        if len(merged) > out.m:
            top = sorted(merged, key=lambda k: (-merged[k], k))[: out.m]
            merged = {k: merged[k] for k in top}
            merrs = {k: merrs[k] for k in top}
        out.counts, out.errs = merged, merrs
        return out

    def topk(self, k: int):
        """[(item, count_upper, err)] sorted by (count desc, item asc) —
        true frequency lies in [count-err, count]."""
        order = sorted(self.counts, key=lambda key: (-self.counts[key], key))
        return [(key, self.counts[key], self.errs.get(key, 0)) for key in order[:k]]


class HyperLogLog:
    """HyperLogLog distinct-count sketch over 64-bit hashes (Flajolet
    et al. 2007, with the standard small-range linear-counting
    correction).  2^p byte registers, OR-mergeable by element-wise max
    — the fixed-size broadcastable form of an exact distinct count
    (the engine's exact path is ``join.distinct_keys`` + count).

    Vectorized: ``add_many`` takes an int64/uint64 hash array and folds
    the whole batch with one ``np.maximum.at``.  Standard error ≈
    1.04/sqrt(2^p) (p=12 → ~1.6%)."""

    def __init__(self, p: int = 12):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = int(p)
        self.m = 1 << self.p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_many(self, hashes: np.ndarray) -> "HyperLogLog":
        if len(hashes) == 0:
            return self
        h = np.asarray(hashes).astype(np.uint64)
        with np.errstate(over="ignore"):
            # re-avalanche so low-entropy inputs (sequential ids) spread
            h = h * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(33)
            h = h * np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(29)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # vectorized leading-zero count via float exponent: for x>0,
        # 63 - floor(log2(x)) leading zeros; rest is never 0 (guard bit).
        # Values within half-ulp below 2^64 round UP in float64 (exp 65
        # -> rank 0 via uint8 wrap), so clip the int rank into the valid
        # [1, 64-p+1] band before the uint8 cast
        exp = np.frexp(rest.astype(np.float64))[1].astype(np.int64)
        rank = np.clip(64 - exp + 1, 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs of different p")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        """Deterministic, SQL-replicable estimate: the harmonic sum
        Σ 2^-reg is computed EXACTLY as the integer Σ 2^(64-reg)
        (scaled by 2^64), so the only float roundings are the final
        fixed-order ops — bit-identical to the DuckDB derivation in
        ★approx_distinct (HUGEINT sum + one CAST + left-assoc DOUBLE
        arithmetic; ``math.log`` == DuckDB ``ln`` on this libm)."""
        import math

        m = float(self.m)
        if self.p >= 7:
            alpha = 0.7213 / (1.0 + 1.079 / m)
        else:
            alpha = {4: 0.673, 5: 0.697, 6: 0.709}[self.p]
        cnts = np.bincount(self.registers, minlength=1)
        s_int = sum(
            c * (1 << (64 - r)) for r, c in enumerate(cnts.tolist()) if c
        )
        e = alpha * m * m * 18446744073709551616.0 / float(s_int)
        zeros = int(cnts[0])
        if e <= 2.5 * m and zeros:
            return m * math.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        out = cls(data[0])
        out.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return out
