"""Segmented (windowed) series reducers with GRASS ``lib/stats`` semantics.

This module is the numeric heart of the engine: every reducer from the
reference's per-cell series library (``lib/stats/c_*.c``, dispatched by
``raster/r.series/main.c:40-65``) re-expressed as *vectorized segmented
kernels* over flat NumPy arrays.  A "segment" is one (key, window) group —
the analog of the per-cell value stack that ``r.series`` hands to a
``c_<method>`` function — and all segments in a batch are reduced in one
pass with ``np.ufunc.reduceat`` / sort-based tricks, never a Python loop
per segment.

Null handling mirrors the reference exactly (NaN plays the role of the
GRASS DCELL null):

* ``average``/``sum``/``minimum``/``maximum``/``range``/``variance``/
  ``stddev``/``median``/``mode``/``quantile``/regressions: all-NULL
  segment -> NULL (``lib/stats/c_ave.c:4-26``, ``c_sum.c:4-26``, ...).
* ``count`` is never NULL (0 allowed, ``c_count.c:4-17``); ``diversity``
  returns 0 for an empty segment (``c_divr.c:12-15``).
* ``range=lo,hi`` filter: out-of-range values become NULL *and* poison
  propagate-nulls mode (``raster/r.series/main.c:573-576``).
* propagate-nulls (``-n``): any NULL in the segment -> every output NULL
  (``raster/r.series/main.c:587-588``).
* ``variance``/``stddev``/``skewness``/``kurtosis`` are *two-pass*
  mean-centered (``c_var.c:4-41``, ``c_skew.c``, ``c_kurt.c``) — we keep
  the two-pass form per segment for bit-exactness instead of merging
  sum-of-squares partials.
* ``median``: mean of the two middle order statistics (``c_median.c:5-13``).
* ``mode``: longest run on the ascending-sorted values, ties keep the
  smallest value (strict ``count > max``, ``c_mode.c:5-37``).
* quantiles: Hyndman–Fan type 7, ``k = q*(n-1)`` with linear
  interpolation (``c_percentile.c:7-27``).
* ``min_raster``/``max_raster``: window-local index of the *first*
  occurrence of the min/max (strict compare, ``c_minx.c``/``c_maxx.c``).
* regressions (``slope``/``offset``/``detcoeff``/``tvalue``): OLS with
  x = window-local position index, NULL entries keep their index but are
  skipped in the sums; count<2 -> NULL; NaN result -> NULL
  (``lib/stats/c_reg.c:15-108``).
* weighted variants (``w_*``) take a per-element weight array and follow
  ``lib/stats`` ``w_<method>`` semantics (e.g. weighted median = first
  value whose cumulative weight reaches half the total,
  ``c_median.c:15-41``).

All reducers consume float64 ``values`` (NaN = NULL) plus segment
``lengths`` and return one float64 result per segment (NaN = NULL).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "METHODS",
    "INT_OUTPUT_METHODS",
    "DECOMPOSABLE_METHODS",
    "reduce_segments",
    "SegmentedData",
]

_BIG = np.iinfo(np.int64).max

#: methods whose reference output type is integer (CELL) —
#: ``raster/r.series/main.c:40-65`` column 3.
INT_OUTPUT_METHODS = frozenset({"count", "diversity", "min_raster", "max_raster"})

#: methods that re-reduce exactly across tiers (aggregate-of-aggregates);
#: mean is derivable from (sum, count). Everything else needs raw values.
DECOMPOSABLE_METHODS = frozenset({"count", "sum", "minimum", "maximum", "range"})

#: every supported method name (the ``r.series`` method menu plus the
#: parametric ``quantile``); quantile shortcuts included.
METHODS = (
    "average",
    "count",
    "sum",
    "minimum",
    "maximum",
    "range",
    "stddev",
    "variance",
    "coeff_var",
    "median",
    "mode",
    "diversity",
    "quart1",
    "quart3",
    "perc90",
    "quantile",
    "min_raster",
    "max_raster",
    "slope",
    "offset",
    "detcoeff",
    "tvalue",
    "skewness",
    "kurtosis",
    "first",
    "last",
    "intr",
    "thresh",
)

_QUANTILE_SHORTCUTS = {"quart1": 0.25, "quart3": 0.75, "perc90": 0.90}


def _reduceat(ufunc, arr, starts):
    """`ufunc.reduceat` over non-empty segments given int64 start offsets."""
    if len(starts) == 0:
        return np.empty(0, dtype=arr.dtype)
    return ufunc.reduceat(arr, starts)


@dataclass
class SegmentedData:
    """Lazy per-batch scratch space shared by all requested reducers.

    Holds the flat value array, segment layout, validity, and memoized
    derived arrays (sorted/compacted views, moment sums) so that asking
    for e.g. ``median`` and ``quart3`` sorts only once, and
    ``variance``/``stddev``/``skewness``/``kurtosis`` share the centered
    moment pass — mirroring how ``r.series`` evaluates many methods over
    one value stack per pass (``raster/r.series/main.c:584-603``).
    """

    values: np.ndarray  # float64, NaN = NULL
    lengths: np.ndarray  # int64 per-segment lengths (all > 0)
    weights: np.ndarray | None = None  # float64 aligned with values
    lo: float | None = None
    hi: float | None = None
    _cache: dict = field(default_factory=dict)

    def __post_init__(self):
        self.values = np.ascontiguousarray(self.values, dtype=np.float64)
        self.lengths = np.ascontiguousarray(self.lengths, dtype=np.int64)
        if self.weights is not None:
            self.weights = np.ascontiguousarray(self.weights, dtype=np.float64)
        self.nseg = len(self.lengths)
        self.starts = np.zeros(self.nseg, dtype=np.int64)
        np.cumsum(self.lengths[:-1], out=self.starts[1:])
        raw_valid = ~np.isnan(self.values)
        if self.lo is not None or self.hi is not None:
            lo = -np.inf if self.lo is None else self.lo
            hi = np.inf if self.hi is None else self.hi
            in_range = raw_valid & (self.values >= lo) & (self.values <= hi)
            self.valid = in_range
        else:
            self.valid = raw_valid
        # float64 count of valid elements per segment (used everywhere)
        self.counts = _reduceat(
            np.add, self.valid.astype(np.float64), self.starts
        )
        self.icounts = self.counts.astype(np.int64)
        self.empty = self.icounts == 0

    # ---- shared derived arrays -------------------------------------
    def rep(self, per_segment):
        """Broadcast one value per segment back to element alignment."""
        return np.repeat(per_segment, self.lengths)

    @property
    def seg_ids(self):
        c = self._cache
        if "seg_ids" not in c:
            c["seg_ids"] = np.repeat(
                np.arange(self.nseg, dtype=np.int64), self.lengths
            )
        return c["seg_ids"]

    @property
    def local_idx(self):
        """Window-local position index (the regression x / *_raster index)."""
        c = self._cache
        if "local_idx" not in c:
            c["local_idx"] = (
                np.arange(len(self.values), dtype=np.int64)
                - self.rep(self.starts)
            )
        return c["local_idx"]

    @property
    def wsum(self):
        """Weighted count Σw over valid elements (w_count semantics)."""
        c = self._cache
        if "wsum" not in c:
            c["wsum"] = _reduceat(
                np.add, np.where(self.valid, self.weights, 0.0), self.starts
            )
        return c["wsum"]

    @property
    def vsum(self):
        c = self._cache
        if "vsum" not in c:
            if self.weights is None:
                arr = np.where(self.valid, self.values, 0.0)
            else:
                arr = np.where(self.valid, self.values * self.weights, 0.0)
            c["vsum"] = _reduceat(np.add, arr, self.starts)
        return c["vsum"]

    @property
    def n_eff(self):
        """Effective count: element count, or Σw in weighted mode."""
        return self.counts if self.weights is None else self.wsum

    @property
    def mean(self):
        c = self._cache
        if "mean" not in c:
            with np.errstate(invalid="ignore", divide="ignore"):
                m = self.vsum / self.n_eff
            m[self.empty] = np.nan
            c["mean"] = m
        return c["mean"]

    @property
    def moments(self):
        """Two-pass centered moment sums (Σd², Σd³, Σd⁴) per segment."""
        c = self._cache
        if "moments" not in c:
            d = np.where(self.valid, self.values - self.rep(self.mean), 0.0)
            w = 1.0 if self.weights is None else self.weights
            d2 = d * d
            m2 = _reduceat(np.add, d2 * w, self.starts)
            m3 = _reduceat(np.add, d2 * d * w, self.starts)
            m4 = _reduceat(np.add, d2 * d2 * w, self.starts)
            c["moments"] = (m2, m3, m4)
        return c["moments"]

    @property
    def vmin(self):
        c = self._cache
        if "vmin" not in c:
            m = _reduceat(
                np.minimum, np.where(self.valid, self.values, np.inf), self.starts
            )
            m[self.empty] = np.nan
            c["vmin"] = m
        return c["vmin"]

    @property
    def vmax(self):
        c = self._cache
        if "vmax" not in c:
            m = _reduceat(
                np.maximum,
                np.where(self.valid, self.values, -np.inf),
                self.starts,
            )
            m[self.empty] = np.nan
            c["vmax"] = m
        return c["vmax"]

    @property
    def sorted_compact(self):
        """Per-segment ascending valid values, nulls compacted out.

        Mirrors ``sort_cell`` (``lib/stats/sort_cell.c:28-46``): compact
        NULLs, qsort ascending.  Returns (cvals, cweights|None, cstarts)
        where ``cstarts[i]`` indexes segment i's first valid value in the
        compacted array (undefined for empty segments — mask via
        ``self.empty``).
        """
        c = self._cache
        if "sorted_compact" not in c:
            sort_key = np.where(self.valid, self.values, np.inf)
            order = np.lexsort((sort_key, self.seg_ids))
            mask_sorted = self.valid[order]
            keep = order[mask_sorted]
            cvals = self.values[keep]
            cw = self.weights[keep] if self.weights is not None else None
            cstarts = np.zeros(self.nseg, dtype=np.int64)
            np.cumsum(self.icounts[:-1], out=cstarts[1:])
            c["sorted_compact"] = (cvals, cw, cstarts)
        return c["sorted_compact"]

    @property
    def runs(self):
        """Equal-value runs over the sorted compacted values.

        Returns (run_val, run_weight, run_seg, runs_per_seg, run_starts)
        where run_weight is the run's element count (or Σw weighted).
        """
        c = self._cache
        if "runs" not in c:
            cvals, cw, _ = self.sorted_compact
            cseg = np.repeat(np.arange(self.nseg, dtype=np.int64), self.icounts)
            n = len(cvals)
            if n == 0:
                empty = np.empty(0)
                c["runs"] = (empty, empty, np.empty(0, np.int64), np.zeros(self.nseg, np.int64), np.empty(0, np.int64))
                return c["runs"]
            boundary = np.ones(n, dtype=bool)
            boundary[1:] = (cvals[1:] != cvals[:-1]) | (cseg[1:] != cseg[:-1])
            run_starts = np.flatnonzero(boundary)
            run_val = cvals[run_starts]
            run_seg = cseg[run_starts]
            if cw is None:
                run_w = np.diff(np.append(run_starts, n)).astype(np.float64)
            else:
                run_w = _reduceat(np.add, cw, run_starts)
            runs_per_seg = np.bincount(run_seg, minlength=self.nseg).astype(np.int64)
            c["runs"] = (run_val, run_w, run_seg, runs_per_seg, run_starts)
        return c["runs"]

    @property
    def had_invalid(self):
        """Per-segment: any NULL or out-of-range element (poisons -n mode)."""
        c = self._cache
        if "had_invalid" not in c:
            inv = (~self.valid).astype(np.float64)
            c["had_invalid"] = _reduceat(np.add, inv, self.starts) > 0
        return c["had_invalid"]


# ---------------------------------------------------------------------------
# individual method kernels: SegmentedData -> float64[nseg]
# ---------------------------------------------------------------------------


def self_count(s: SegmentedData):
    # never NULL: 0 allowed (c_count.c:14-17); weighted = Σw (w_count)
    return s.counts.copy() if s.weights is None else s.wsum.copy()


def _m_sum(s: SegmentedData):
    out = s.vsum.copy()
    out[s.empty] = np.nan  # all-NULL -> NULL, not 0 (c_sum.c:22-26)
    return out


def _m_average(s: SegmentedData):
    return s.mean.copy()


def _m_min(s: SegmentedData):
    return s.vmin.copy()


def _m_max(s: SegmentedData):
    return s.vmax.copy()


def _m_range(s: SegmentedData):
    return s.vmax - s.vmin


def _m_variance(s: SegmentedData):
    m2, _, _ = s.moments
    with np.errstate(invalid="ignore", divide="ignore"):
        v = m2 / s.n_eff
    v[s.empty] = np.nan
    return v


def _m_stddev(s: SegmentedData):
    with np.errstate(invalid="ignore"):
        return np.sqrt(_m_variance(s))


def _m_coeff_var(s: SegmentedData):
    # r.univar convention: 100 * stddev / mean (raster/r.univar/stats.c:131-148)
    with np.errstate(invalid="ignore", divide="ignore"):
        return 100.0 * _m_stddev(s) / s.mean


def _m_skewness(s: SegmentedData):
    m2, m3, _ = s.moments
    n = s.n_eff
    with np.errstate(invalid="ignore", divide="ignore"):
        sdev = np.sqrt(m2 / n)
        out = m3 / (n * sdev * sdev * sdev)
    out[s.empty] = np.nan
    return out


def _m_kurtosis(s: SegmentedData):
    m2, _, m4 = s.moments
    n = s.n_eff
    with np.errstate(invalid="ignore", divide="ignore"):
        var = m2 / n
        out = m4 / (n * var * var) - 3.0
    out[s.empty] = np.nan
    return out


def _m_median(s: SegmentedData):
    if s.weights is not None:
        return _weighted_quantile(s, 0.5, median_rule=True)
    cvals, _, cstarts = s.sorted_compact
    n = s.icounts
    out = np.full(s.nseg, np.nan)
    ok = ~s.empty
    i0 = cstarts[ok] + (n[ok] - 1) // 2
    i1 = cstarts[ok] + n[ok] // 2
    out[ok] = (cvals[i0] + cvals[i1]) / 2.0
    return out


def _quantile(s: SegmentedData, q: float):
    if s.weights is not None:
        return _weighted_quantile(s, q, median_rule=False)
    cvals, _, cstarts = s.sorted_compact
    n = s.icounts
    out = np.full(s.nseg, np.nan)
    ok = ~s.empty
    k = q * (n[ok] - 1)
    i0 = np.floor(k).astype(np.int64)
    i1 = np.ceil(k).astype(np.int64)
    v0 = cvals[cstarts[ok] + i0]
    v1 = cvals[cstarts[ok] + i1]
    same = i0 == i1
    res = v0 * (i1 - k) + v1 * (k - i0)
    res[same] = v0[same]
    out[ok] = res
    return out


def _weighted_quantile(s: SegmentedData, q: float, median_rule: bool):
    # w_quant / w_median: first sorted value whose cumulative weight
    # reaches total*q (>= total/2 for median), c_percentile.c:54-84.
    cvals, cw, cstarts = s.sorted_compact
    n = len(cvals)
    if n == 0:
        return np.full(s.nseg, np.nan)
    cum = np.cumsum(cw)
    base = np.zeros(s.nseg)
    nz = cstarts > 0
    base[nz] = cum[cstarts[nz] - 1]
    # guard: for empty segments cstarts may repeat; masked at the end
    within = cum - np.repeat(base, s.icounts)
    total = _seg_total(s, cw)
    thresh = total / 2.0 if median_rule else total * q
    idx = np.arange(n, dtype=np.int64)
    cand = np.where(within >= np.repeat(thresh, s.icounts), idx, _BIG)
    cseg_starts = cstarts.copy()
    out = np.full(s.nseg, np.nan)
    ok = ~s.empty
    picked = np.minimum.reduceat(cand, cseg_starts[ok]) if ok.any() else np.empty(0, np.int64)
    # reduceat over only the non-empty segment starts keeps segments aligned
    sel = picked.copy()
    # if no element reached the threshold (can't happen for q<=1 with
    # positive weights, but guard like the C loop which stops at i=n-1)
    last_idx = cseg_starts[ok] + s.icounts[ok] - 1
    sel = np.where(sel == _BIG, last_idx, sel)
    out[ok] = cvals[sel]
    return out


def _seg_total(s: SegmentedData, cw):
    tot = np.zeros(s.nseg)
    ok = ~s.empty
    if ok.any():
        cstarts = s.sorted_compact[2]
        tot[ok] = np.add.reduceat(cw, cstarts[ok])
    return tot


def _m_mode(s: SegmentedData):
    run_val, run_w, run_seg, runs_per_seg, _ = s.runs
    out = np.full(s.nseg, np.nan)
    if len(run_val) == 0:
        return out
    rstarts = np.zeros(s.nseg, dtype=np.int64)
    np.cumsum(runs_per_seg[:-1], out=rstarts[1:])
    ok = runs_per_seg > 0
    maxw = np.maximum.reduceat(run_w, rstarts[ok])
    # first run attaining the max (ascending value order -> smallest value)
    cand = np.where(
        run_w == np.repeat(maxw, runs_per_seg[ok]),
        np.arange(len(run_val), dtype=np.int64),
        _BIG,
    )
    first = np.minimum.reduceat(cand, rstarts[ok])
    out[ok] = run_val[first]
    return out


def _m_diversity(s: SegmentedData):
    _, _, _, runs_per_seg, _ = s.runs
    return runs_per_seg.astype(np.float64)  # empty segment -> 0 (c_divr.c)


def _argx(s: SegmentedData, target):
    x = s.local_idx
    cand = np.where(
        s.valid & (s.values == s.rep(target)), x, _BIG
    )
    out = _reduceat(np.minimum, cand, s.starts).astype(np.float64)
    out[s.empty] = np.nan
    return out


def _m_min_raster(s: SegmentedData):
    return _argx(s, s.vmin)


def _m_max_raster(s: SegmentedData):
    return _argx(s, s.vmax)


def _regression(s: SegmentedData):
    """Shared OLS sums -> (slope, offset, detcoeff, tvalue) per segment.

    Mirrors ``lib/stats/c_reg.c`` including its exact accumulation order
    of corrections (sums first, then subtract n·x̄·ȳ terms) and the
    NaN -> NULL guard.  x = window-local index; weighted form follows
    ``regression_w`` (x-sums weighted, count = Σw).
    """
    c = s._cache
    if "regression" in c:
        return c["regression"]
    x = s.local_idx.astype(np.float64)
    v = s.values
    w = s.weights
    if w is None:
        xsum = _reduceat(np.add, np.where(s.valid, x, 0.0), s.starts)
        sxy = _reduceat(np.add, np.where(s.valid, x * v, 0.0), s.starts)
        sxx = _reduceat(np.add, np.where(s.valid, x * x, 0.0), s.starts)
        syy = _reduceat(np.add, np.where(s.valid, v * v, 0.0), s.starts)
        n = s.counts
    else:
        xsum = _reduceat(np.add, np.where(s.valid, x * w, 0.0), s.starts)
        sxy = _reduceat(np.add, np.where(s.valid, x * v * w, 0.0), s.starts)
        sxx = _reduceat(np.add, np.where(s.valid, x * x * w, 0.0), s.starts)
        syy = _reduceat(np.add, np.where(s.valid, v * v * w, 0.0), s.starts)
        n = s.wsum
    ysum = s.vsum
    too_few = n < 2
    with np.errstate(invalid="ignore", divide="ignore"):
        xbar = xsum / n
        ybar = ysum / n
        numer = sxy - n * xbar * ybar
        denom = sxx - n * xbar * xbar
        denom2 = syy - n * ybar * ybar
        rsq = (numer * numer) / (denom * denom2)
        slope = numer / denom
        offset = ybar - xbar * numer / denom
        tval = np.sqrt(rsq * (n - 2) / (1 - rsq))
    for arr in (slope, offset, rsq, tval):
        arr[too_few] = np.nan
    c["regression"] = (slope, offset, rsq, tval)
    return c["regression"]


def _m_slope(s):
    return _regression(s)[0].copy()


def _m_offset(s):
    return _regression(s)[1].copy()


def _m_detcoeff(s):
    return _regression(s)[2].copy()


def _m_tvalue(s):
    return _regression(s)[3].copy()


def _m_intr(s: SegmentedData):
    """Interspersion percentage (``lib/stats/c_intr.c``): NULL center
    (element n/2, raw index) -> NULL; else
    ``(diff*100 + count//2)/count + 1`` where count = non-null-1 and
    diff = non-null values != center; count <= 0 -> 0."""
    center_idx = s.starts + s.lengths // 2
    center = s.values[center_idx]
    center_null = ~s.valid[center_idx]
    diff = _reduceat(
        np.add,
        np.where(s.valid & (s.values != s.rep(center)), 1.0, 0.0),
        s.starts,
    )
    count = s.counts - 1
    out = np.zeros(s.nseg)
    pos_ok = count > 0
    out[pos_ok] = (
        diff[pos_ok] * 100.0 + np.floor(count[pos_ok] / 2)
    ) / count[pos_ok] + 1
    out[center_null] = np.nan
    return out


def _m_thresh(s: SegmentedData, tval: float):
    """1-based index of the first value within epsilon=10 of the
    threshold (``lib/stats/c_thresh.c``, GDD use); none -> NULL."""
    idx = s.local_idx
    hit = s.valid & (np.abs(tval - s.values) < 10.0)
    cand = np.where(hit, idx, _BIG)
    first = _reduceat(np.minimum, cand, s.starts)
    out = (first + 1).astype(np.float64)
    out[first == _BIG] = np.nan
    return out


def _edge(s: SegmentedData, last: bool):
    """First/last valid value per segment (engine extension, not in
    r.series; used by gap-fill endpoints and `t.rast.what`-style lookups)."""
    idx = np.arange(len(s.values), dtype=np.int64)
    if last:
        cand = np.where(s.valid, idx, -1)
        pick = _reduceat(np.maximum, cand, s.starts)
        bad = pick < 0
    else:
        cand = np.where(s.valid, idx, _BIG)
        pick = _reduceat(np.minimum, cand, s.starts)
        bad = pick == _BIG
    pick = np.where(bad, 0, pick)
    out = s.values[pick]
    out[bad] = np.nan
    return out


_KERNELS = {
    "average": _m_average,
    "count": self_count,
    "sum": _m_sum,
    "minimum": _m_min,
    "maximum": _m_max,
    "range": _m_range,
    "stddev": _m_stddev,
    "variance": _m_variance,
    "coeff_var": _m_coeff_var,
    "median": _m_median,
    "mode": _m_mode,
    "diversity": _m_diversity,
    "min_raster": _m_min_raster,
    "max_raster": _m_max_raster,
    "slope": _m_slope,
    "offset": _m_offset,
    "detcoeff": _m_detcoeff,
    "tvalue": _m_tvalue,
    "skewness": _m_skewness,
    "kurtosis": _m_kurtosis,
    "first": lambda s: _edge(s, last=False),
    "last": lambda s: _edge(s, last=True),
    "intr": _m_intr,
}


def reduce_segments(
    values,
    lengths,
    methods,
    *,
    weights=None,
    lo=None,
    hi=None,
    propagate_nulls=False,
    quantiles=None,
    thresh=None,
):
    """Reduce every segment with every requested method in one pass.

    Parameters
    ----------
    values : float64 array, NaN = NULL, segments laid out back-to-back.
    lengths : int64 array of per-segment lengths (all > 0).
    methods : iterable of method names from :data:`METHODS`; ``quantile``
        requires `quantiles` (dict suffix->q) or use quart1/quart3/perc90.
    weights : optional per-element weights -> ``w_*`` reference semantics.
    lo, hi : optional value-range filter (``r.series range=``).
    propagate_nulls : the ``-n`` flag — any NULL/out-of-range element in a
        segment nulls every output for that segment.
    quantiles : optional dict like ``{"perc50": 0.5}`` of extra quantiles.
    thresh : optional threshold value -> a ``thresh`` output column
        (1-based first index within epsilon of the value, c_thresh.c).

    Returns dict of method name -> float64[nseg] (NaN = NULL).
    """
    s = SegmentedData(
        np.asarray(values), np.asarray(lengths), weights=weights, lo=lo, hi=hi
    )
    out: dict[str, np.ndarray] = {}
    for m in methods:
        if m in _QUANTILE_SHORTCUTS:
            out[m] = _quantile(s, _QUANTILE_SHORTCUTS[m])
        elif m in ("quantile", "thresh"):
            continue  # handled via the `quantiles` / `thresh` params below
        elif m in _KERNELS:
            out[m] = _KERNELS[m](s)
        else:
            raise ValueError(f"unknown reduce method: {m!r}")
    if quantiles:
        for name, q in quantiles.items():
            out[name] = _quantile(s, float(q))
    if thresh is not None or "thresh" in methods:
        out["thresh"] = _m_thresh(s, float(thresh if thresh is not None else 0.0))
    if propagate_nulls:
        poison = s.had_invalid
        for arr in out.values():
            arr[poison] = np.nan
    return out
