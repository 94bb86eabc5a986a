"""Reducer kernels vs the literal oracle + the F1/F2 golden fixtures."""

from __future__ import annotations

import math

import numpy as np
import pytest

from grass_ray.functions.reducers import METHODS, reduce_segments

from .oracle import oracle_reduce

ALL = [m for m in METHODS if m != "quantile"]
WEIGHTED_CAPABLE = [
    "average", "count", "sum", "stddev", "variance", "median", "mode",
    "quart1", "quart3", "perc90", "slope", "offset", "detcoeff", "tvalue",
    "skewness", "kurtosis",
]

NAN = float("nan")


def run_single(values, methods=ALL, **kw):
    """Reduce one segment through the vectorized path."""
    vals = np.array(
        [np.nan if v is None else float(v) for v in values], dtype=np.float64
    )
    weights = kw.pop("weights", None)
    if weights is not None:
        weights = np.asarray(weights, dtype=np.float64)
    res = reduce_segments(
        vals, np.array([len(vals)]), methods, weights=weights, **kw
    )
    return {m: float(res[m][0]) for m in res}


def assert_matches_oracle(values, methods=ALL, weights=None, **kw):
    got = run_single(values, methods, weights=weights, **kw)
    want = oracle_reduce(
        [np.nan if v is None else v for v in values],
        methods,
        weights=list(weights) if weights is not None else None,
        **kw,
    )
    finite = [v for v in values if v is not None and not math.isnan(v)]
    constant_y = len(set(finite)) <= 1
    # absolute floor scales with the VALUE magnitude: a weighted mean
    # of identical values lands one ulp off (eps·|y| ≈ 1.2e-10 at
    # |y|~6e5), so a constant series' two-pass stddev is ~ulp(μ), not
    # exactly 0, in either implementation
    ymax = max((abs(v) for v in finite), default=0.0)
    absol = max(1e-12, 8 * 2.220446049250313e-16 * ymax)
    for m in methods:
        g, w = got[m], want[m]
        if constant_y and m in (
            "tvalue", "skewness", "kurtosis", "detcoeff",
        ):
            # degenerate 0/0 on a zero-variance series: numerator and
            # denominator are both exactly zero only in exact
            # arithmetic — float noise in either formula order decides
            # between 0, ±1, ±inf and NaN (the reference's C double
            # sums are equally noise-dependent), so parity is
            # unspecified here
            continue
        if math.isnan(w):
            assert math.isnan(g), f"{m}: got {g}, want NULL ({values})"
        else:
            # ratio-of-residual statistics (t = slope/SE, R² =
            # ssreg/sstot, standardized moments) are ill-conditioned
            # near constant series: the two cancellations (Σy² −
            # (Σy)²/n, then sstot − ssreg) amplify last-bit
            # formula-order differences by ~Σy²/ss_residual, which is
            # unbounded as hypothesis shrinks toward large
            # nearly-collinear values (3 points at ~6e5 with 0.2%
            # spread reach ~2e-6).  Scale the tolerance by the
            # MEASURED conditioning, floored at 1e-8 and capped at
            # 1e-3 — a genuine formula error diverges by far more
            # than any conditioning bound on this data range.
            if m in (
                "tvalue", "detcoeff", "skewness", "kurtosis",
                "slope", "offset",
            ):
                y = np.asarray(finite, dtype=np.float64)
                mu = y.mean()
                sstot = float(((y - mu) ** 2).sum())
                ssy = float((y**2).sum())
                cond = ssy / sstot if sstot > 0 else float("inf")
                if m in ("tvalue", "detcoeff"):
                    # the regression pair cancels TWICE: Σy²−(Σy)²/n,
                    # then sstot−ssreg — the residual fraction only
                    # enters here, not the standardized moments
                    r2 = want.get("detcoeff", 0.0)
                    resfrac = (
                        max(1.0 - r2, 1e-12)
                        if isinstance(r2, float) and math.isfinite(r2)
                        else 1.0
                    )
                    amp = cond / resfrac
                elif m in ("slope", "offset"):
                    # one cancellation (nΣxy − ΣxΣy): amplification is
                    # the raw-to-centered ratio itself
                    amp = cond
                else:
                    # central moments m3/σ³, m4/σ⁴ cancel by powers of
                    # the same mean-offset ratio
                    amp = cond**2
                if 1e-14 * amp > 1e-3:
                    # beyond ~1e13 amplification float64 carries ZERO
                    # correct digits in EITHER implementation (soak
                    # draw: 3 points at 599166±0.5 diverge 1.7%) —
                    # parity is unspecified, like the constant_y case
                    continue
                rel = max(1e-8, 1e-14 * amp)
            else:
                rel = 1e-12
            assert g == pytest.approx(w, rel=rel, abs=absol), (
                f"{m}: got {g}, want {w} ({values})"
            )


# ---------------------------------------------------------------------------
# F1 — constant-series fixture (≙ raster/r.series/test_suite golden refs)
# ---------------------------------------------------------------------------

F1 = [100.0, 200.0, 300.0, 400.0, 500.0, 600.0]


def test_f1_golden_values():
    got = run_single(F1)
    assert got["average"] == 350.0
    assert got["sum"] == 2100.0
    assert got["count"] == 6.0
    assert got["minimum"] == 100.0
    assert got["maximum"] == 600.0
    assert got["range"] == 500.0
    assert got["median"] == 350.0
    assert got["mode"] == 100.0  # all runs length 1 -> smallest value
    assert got["diversity"] == 6.0
    assert got["min_raster"] == 0.0
    assert got["max_raster"] == 5.0
    assert got["quart1"] == 225.0
    assert got["quart3"] == 475.0
    assert got["perc90"] == 550.0
    assert got["variance"] == pytest.approx(175000 / 6)
    assert got["stddev"] == pytest.approx(math.sqrt(175000 / 6))
    assert got["slope"] == pytest.approx(100.0)
    assert got["offset"] == pytest.approx(100.0)
    assert got["detcoeff"] == pytest.approx(1.0)
    assert got["skewness"] == pytest.approx(0.0, abs=1e-12)
    assert got["kurtosis"] == pytest.approx(-1.2685714285714287)
    assert got["first"] == 100.0
    assert got["last"] == 600.0


def test_f1_oracle_parity():
    assert_matches_oracle(F1)


def test_f1_weighted():
    w = [3.0, 1.5, 1.0, 1.0, 1.0, 1.0]
    assert_matches_oracle(F1, methods=WEIGHTED_CAPABLE, weights=w)
    got = run_single(F1, WEIGHTED_CAPABLE, weights=np.array(w))
    # Σwv/Σw = (300+300+300+400+500+600)/8.5
    assert got["average"] == pytest.approx(2400 / 8.5)
    assert got["count"] == 8.5
    # weighted median: cumweight >= 4.25 first reached at value 200
    assert got["median"] == 200.0


# ---------------------------------------------------------------------------
# F2 — NULL handling
# ---------------------------------------------------------------------------


def test_f2_nulls_mixed():
    vals = [100.0, None, 300.0]
    got = run_single(vals)
    assert got["average"] == 200.0
    assert got["count"] == 2.0
    assert got["sum"] == 400.0
    assert_matches_oracle(vals)


def test_f2_all_null():
    vals = [None, None]
    got = run_single(vals)
    for m in ("average", "sum", "minimum", "maximum", "range", "median",
              "mode", "variance", "stddev", "quart1", "min_raster",
              "slope", "first", "last"):
        assert math.isnan(got[m]), m
    assert got["count"] == 0.0  # count never NULL (c_count.c:14-17)
    assert got["diversity"] == 0.0  # c_divr.c:12-15


def test_f2_propagate_nulls():
    vals = [100.0, None, 300.0]
    got = run_single(vals, propagate_nulls=True)
    for m in ALL:
        assert math.isnan(got[m]), m
    # no nulls -> propagate mode is a no-op
    got = run_single(F1, propagate_nulls=True)
    assert got["average"] == 350.0


def test_f2_range_filter():
    vals = [100.0, 200.0, 999.0]
    got = run_single(vals, lo=0.0, hi=500.0)
    assert got["count"] == 2.0
    assert got["maximum"] == 200.0
    # out-of-range value poisons -n mode (r.series/main.c:573-576)
    got = run_single(vals, lo=0.0, hi=500.0, propagate_nulls=True)
    assert math.isnan(got["average"])


# ---------------------------------------------------------------------------
# tie rules / order-dependence
# ---------------------------------------------------------------------------


def test_mode_tie_smallest():
    assert run_single([5.0, 5.0, 2.0, 2.0, 9.0])["mode"] == 2.0


def test_min_raster_first_occurrence():
    got = run_single([3.0, 1.0, 1.0, 3.0])
    assert got["min_raster"] == 1.0
    assert got["max_raster"] == 0.0


def test_min_raster_null_keeps_index():
    # NULL entries keep their series index (c_minx.c loop over raw i)
    got = run_single([None, 7.0, 1.0])
    assert got["min_raster"] == 2.0


def test_regression_skips_nulls_keeps_x():
    vals = [1.0, None, 3.0, 5.0]
    assert_matches_oracle(vals, methods=["slope", "offset", "detcoeff", "tvalue"])


def test_single_value_regression_null():
    got = run_single([42.0])
    assert math.isnan(got["slope"])  # count < 2 -> NULL (c_reg.c:37-40)
    assert got["average"] == 42.0


def test_constant_values():
    got = run_single([7.0, 7.0, 7.0])
    assert got["variance"] == 0.0
    assert got["mode"] == 7.0
    assert got["diversity"] == 1.0
    assert math.isnan(got["detcoeff"])  # 0/0 -> NaN -> NULL per c_reg guard


# ---------------------------------------------------------------------------
# randomized parity vs oracle, multi-segment layout
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_parity(seed):
    rng = np.random.default_rng(seed)
    for _ in range(25):
        n = int(rng.integers(1, 40))
        vals = rng.integers(-50, 50, size=n).astype(float)
        # inject nulls and duplicates
        mask = rng.random(n) < 0.25
        vals[mask] = np.nan
        assert_matches_oracle(list(vals))


@pytest.mark.parametrize("seed", [10, 11])
def test_random_weighted_parity(seed):
    rng = np.random.default_rng(seed)
    for _ in range(15):
        n = int(rng.integers(1, 25))
        vals = rng.integers(0, 20, size=n).astype(float)
        vals[rng.random(n) < 0.2] = np.nan
        w = rng.integers(1, 5, size=n).astype(float)
        assert_matches_oracle(list(vals), methods=WEIGHTED_CAPABLE, weights=w)


def test_multi_segment_alignment():
    """Segments reduced together must equal segments reduced one-by-one."""
    rng = np.random.default_rng(99)
    segs = []
    for _ in range(30):
        n = int(rng.integers(1, 20))
        v = rng.integers(-10, 10, size=n).astype(float)
        v[rng.random(n) < 0.3] = np.nan
        segs.append(v)
    flat = np.concatenate(segs)
    lengths = np.array([len(s) for s in segs])
    res = reduce_segments(flat, lengths, ALL)
    for i, seg in enumerate(segs):
        single = reduce_segments(seg, np.array([len(seg)]), ALL)
        for m in ALL:
            a, b = res[m][i], single[m][0]
            if math.isnan(b):
                assert math.isnan(a), (m, i)
            else:
                assert a == pytest.approx(b, rel=1e-12), (m, i)


def test_empty_input():
    res = reduce_segments(np.empty(0), np.empty(0, dtype=np.int64), ALL)
    for m in ALL:
        assert len(res[m]) == 0


# ---- property-based parity (hypothesis) -----------------------------------

try:
    from hypothesis import given, settings, strategies as st

    _vals = st.lists(
        st.one_of(
            st.none(),
            st.integers(-1000, 1000).map(float),
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=60,
    )

    @settings(max_examples=40, deadline=None)
    @given(_vals)
    def test_property_parity_all_methods(vals):
        assert_matches_oracle(vals)

    @settings(max_examples=25, deadline=None)
    @given(_vals, st.integers(1, 9))
    def test_property_parity_weighted(vals, wseed):
        rng = np.random.default_rng(wseed)
        w = rng.integers(1, 6, size=len(vals)).astype(float)
        assert_matches_oracle(vals, methods=WEIGHTED_CAPABLE, weights=w)

except ImportError:  # pragma: no cover
    pass
