"""Single-node literal oracle for the §2.1 reducer semantics.

Deliberately written as straight Python loops that transcribe the
*behavior* of GRASS's ``lib/stats/c_*.c`` reducers (sort-then-pick
median, Hyndman–Fan type 7 quantile, two-pass population variance,
index-as-x regression, strict-compare tie rules).  Used only in tests to
cross-check the vectorized segmented kernels in
``grass_ray.functions.reducers``.  NaN plays the DCELL-null role.
"""

from __future__ import annotations

import math

NULL = float("nan")


def _is_null(v):
    return v is None or (isinstance(v, float) and math.isnan(v))


def _clean(values, lo=None, hi=None):
    """Apply the range filter; return (values-with-nulls, had_invalid)."""
    out = []
    had_invalid = False
    for v in values:
        if _is_null(v):
            out.append(NULL)
            had_invalid = True
        elif (lo is not None and v < lo) or (hi is not None and v > hi):
            out.append(NULL)
            had_invalid = True
        else:
            out.append(float(v))
    return out, had_invalid


def _valid(values):
    return [v for v in values if not _is_null(v)]


def o_count(values, weights=None):
    if weights is None:
        return float(len(_valid(values)))
    return float(sum(w for v, w in zip(values, weights) if not _is_null(v)))


def o_sum(values, weights=None):
    s = 0.0
    c = 0.0
    for i, v in enumerate(values):
        if _is_null(v):
            continue
        w = 1.0 if weights is None else weights[i]
        s += v * w
        c += w
    return NULL if c == 0 else s


def o_average(values, weights=None):
    s = 0.0
    c = 0.0
    for i, v in enumerate(values):
        if _is_null(v):
            continue
        w = 1.0 if weights is None else weights[i]
        s += v * w
        c += w
    return NULL if c == 0 else s / c


def o_minimum(values):
    vv = _valid(values)
    return NULL if not vv else min(vv)


def o_maximum(values):
    vv = _valid(values)
    return NULL if not vv else max(vv)


def o_range(values):
    vv = _valid(values)
    return NULL if not vv else max(vv) - min(vv)


def o_min_raster(values):
    best = None
    bestx = None
    for i, v in enumerate(values):
        if _is_null(v):
            continue
        if best is None or best > v:  # strict: first occurrence wins
            best, bestx = v, i
    return NULL if bestx is None else float(bestx)


def o_max_raster(values):
    best = None
    bestx = None
    for i, v in enumerate(values):
        if _is_null(v):
            continue
        if best is None or best < v:
            best, bestx = v, i
    return NULL if bestx is None else float(bestx)


def _moment_sums(values, weights=None):
    s = 0.0
    c = 0.0
    for i, v in enumerate(values):
        if _is_null(v):
            continue
        w = 1.0 if weights is None else weights[i]
        s += v * w
        c += w
    if c == 0:
        return None
    ave = s / c
    m2 = m3 = m4 = 0.0
    for i, v in enumerate(values):
        if _is_null(v):
            continue
        w = 1.0 if weights is None else weights[i]
        d = v - ave
        m2 += d * d * w
        m3 += d * d * d * w
        m4 += d * d * d * d * w
    return c, ave, m2, m3, m4


def o_variance(values, weights=None):
    ms = _moment_sums(values, weights)
    if ms is None:
        return NULL
    c, _, m2, _, _ = ms
    return m2 / c


def o_stddev(values, weights=None):
    v = o_variance(values, weights)
    return NULL if _is_null(v) else math.sqrt(v)


def o_coeff_var(values, weights=None):
    sd = o_stddev(values, weights)
    m = o_average(values, weights)
    if _is_null(sd) or _is_null(m):
        return NULL
    import numpy as np

    with np.errstate(invalid="ignore", divide="ignore"):
        return float(100.0 * np.float64(sd) / np.float64(m))


def o_skewness(values, weights=None):
    ms = _moment_sums(values, weights)
    if ms is None:
        return NULL
    c, _, m2, m3, _ = ms
    sdev = math.sqrt(m2 / c)
    try:
        return m3 / (c * sdev * sdev * sdev)
    except ZeroDivisionError:
        return NULL


def o_kurtosis(values, weights=None):
    ms = _moment_sums(values, weights)
    if ms is None:
        return NULL
    c, _, m2, _, m4 = ms
    var = m2 / c
    try:
        return m4 / (c * var * var) - 3.0
    except ZeroDivisionError:
        return NULL


def o_median(values, weights=None):
    if weights is not None:
        return o_quantile(values, 0.5, weights, median_rule=True)
    vv = sorted(_valid(values))
    n = len(vv)
    if n < 1:
        return NULL
    return (vv[(n - 1) // 2] + vv[n // 2]) / 2.0


def o_quantile(values, q, weights=None, median_rule=False):
    if weights is None:
        vv = sorted(_valid(values))
        n = len(vv)
        if n < 1:
            return NULL
        k = q * (n - 1)
        i0 = math.floor(k)
        i1 = math.ceil(k)
        if i0 == i1:
            return vv[i0]
        return vv[i0] * (i1 - k) + vv[i1] * (k - i0)
    pairs = sorted(
        [(v, w) for v, w in zip(values, weights) if not _is_null(v)]
    )
    if not pairs:
        return NULL
    total = sum(w for _, w in pairs)
    thresh = total / 2.0 if median_rule else total * q
    k = 0.0
    for v, w in pairs:
        k += w
        if k >= thresh:
            return v
    return pairs[-1][0]


def o_mode(values, weights=None):
    if weights is None:
        vv = sorted(_valid(values))
        best = 0
        mode = NULL
        prev = None
        count = 0
        for v in vv:
            if best == 0 or v != prev:
                prev = v
                count = 0
            count += 1
            if count > best:
                best = count
                mode = prev
        return NULL if best == 0 else mode
    pairs = sorted(
        [(v, w) for v, w in zip(values, weights) if not _is_null(v)]
    )
    best = 0.0
    mode = NULL
    prev = None
    count = 0.0
    for v, w in pairs:
        if best == 0.0 or v != prev:
            prev = v
            count = 0.0
        count += w
        if count > best:
            best = count
            mode = prev
    return NULL if best == 0.0 else mode


def o_diversity(values):
    vv = set(_valid(values))
    return float(len(vv))


def _o_regression(values, which, weights=None):
    xsum = ysum = 0.0
    count = 0.0
    for i, v in enumerate(values):
        if _is_null(v):
            continue
        w = 1.0 if weights is None else weights[i]
        xsum += i * w
        ysum += v * w
        count += w
    if count < 2:
        return NULL
    xbar = xsum / count
    ybar = ysum / count
    numer = denom = denom2 = 0.0
    for i, v in enumerate(values):
        if _is_null(v):
            continue
        w = 1.0 if weights is None else weights[i]
        numer += i * v * w
        denom += float(i) * i * w
        denom2 += v * v * w
    numer -= count * xbar * ybar
    denom -= count * xbar * xbar
    denom2 -= count * ybar * ybar
    # IEEE double arithmetic like the C code: x/0 -> ±inf, 0/0 -> NaN,
    # sqrt(negative) -> NaN; only a NaN result is nulled (c_reg.c:82-84).
    import numpy as np

    with np.errstate(invalid="ignore", divide="ignore"):
        rsq = np.float64(numer * numer) / np.float64(denom * denom2)
        if which == "slope":
            r = np.float64(numer) / np.float64(denom)
        elif which == "offset":
            r = np.float64(ybar) - np.float64(xbar) * numer / np.float64(denom)
        elif which == "detcoeff":
            r = rsq
        elif which == "tvalue":
            r = np.sqrt(rsq * (count - 2) / np.float64(1 - rsq))
        else:
            raise ValueError(which)
    r = float(r)
    return NULL if _is_null(r) else r


def o_slope(values, weights=None):
    return _o_regression(values, "slope", weights)


def o_offset(values, weights=None):
    return _o_regression(values, "offset", weights)


def o_detcoeff(values, weights=None):
    return _o_regression(values, "detcoeff", weights)


def o_tvalue(values, weights=None):
    return _o_regression(values, "tvalue", weights)


def o_intr(values):
    # lib/stats/c_intr.c: NULL center (raw index n/2) -> NULL
    n = len(values)
    if n == 0 or _is_null(values[n // 2]):
        return NULL
    center = values[n // 2]
    count = 0
    diff = 0
    for v in values:
        if _is_null(v):
            continue
        count += 1
        if v != center:
            diff += 1
    count -= 1
    if count <= 0:
        return 0.0
    return (diff * 100.0 + count // 2) / count + 1


def o_thresh(values, tval=0.0):
    # lib/stats/c_thresh.c: 1-based first index within epsilon=10
    for i, v in enumerate(values):
        if _is_null(v):
            continue
        if abs(tval - v) < 10.0:
            return float(i + 1)
    return NULL


def o_first(values):
    for v in values:
        if not _is_null(v):
            return v
    return NULL


def o_last(values):
    for v in reversed(values):
        if not _is_null(v):
            return v
    return NULL


#: name -> callable(values[, weights]) table; weighted-capable methods
#: accept a ``weights`` kwarg.
ORACLE = {
    "average": o_average,
    "count": o_count,
    "sum": o_sum,
    "minimum": lambda v, weights=None: o_minimum(v),
    "maximum": lambda v, weights=None: o_maximum(v),
    "range": lambda v, weights=None: o_range(v),
    "stddev": o_stddev,
    "variance": o_variance,
    "coeff_var": o_coeff_var,
    "median": o_median,
    "mode": o_mode,
    "diversity": lambda v, weights=None: o_diversity(v),
    "quart1": lambda v, weights=None: o_quantile(v, 0.25, weights),
    "quart3": lambda v, weights=None: o_quantile(v, 0.75, weights),
    "perc90": lambda v, weights=None: o_quantile(v, 0.90, weights),
    "min_raster": lambda v, weights=None: o_min_raster(v),
    "max_raster": lambda v, weights=None: o_max_raster(v),
    "slope": o_slope,
    "offset": o_offset,
    "detcoeff": o_detcoeff,
    "tvalue": o_tvalue,
    "skewness": o_skewness,
    "kurtosis": o_kurtosis,
    "first": lambda v, weights=None: o_first(v),
    "last": lambda v, weights=None: o_last(v),
    "intr": lambda v, weights=None: o_intr(v),
    "thresh": lambda v, weights=None: o_thresh(v),
}


def oracle_reduce(values, methods, weights=None, lo=None, hi=None, propagate_nulls=False):
    """Evaluate every method over one window, reference-literal."""
    vals, had_invalid = _clean(values, lo, hi)
    out = {}
    for m in methods:
        if propagate_nulls and had_invalid:
            out[m] = NULL
        else:
            out[m] = ORACLE[m](vals, weights=weights)
    return out
