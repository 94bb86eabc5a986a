"""Windowed z-score anomaly rollup + fixed-width value histogram vs
literal single-node numpy references."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from grass_ray.stages.seriesops import zscore_anomalies
from grass_ray.stages.univar import value_histogram


def _tok_table(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "source": pa.array([r[1] for r in rows]),
            "tokens": pa.array(
                [r[2] for r in rows], type=pa.list_(pa.int32())
            ),
        }
    )


def _ref_zscore(rows, gran, thresh):
    out = []
    for doc, src, toks in rows:
        for w in range(0, (len(toks) + gran - 1) // gran):
            vals = [
                v
                for v in toks[w * gran : (w + 1) * gran]
                if v is not None
            ]
            if not vals:
                continue
            n = len(vals)
            s1 = sum(vals)
            s2 = sum(v * v for v in vals)
            mean = float(s1) / float(n)
            var = max(float(s2) / float(n) - mean * mean, 0.0)
            std = math.sqrt(var)
            n_anom = sum(
                1
                for v in vals
                if std > 0.0 and abs(float(v) - mean) > thresh * std
            )
            out.append((src, doc, w, n, mean, std, n_anom))
    return pd.DataFrame(
        out,
        columns=["source", "doc_id", "window", "n", "mean", "std", "n_anom"],
    )


def test_zscore_anomalies_vs_reference(ray_session):
    import ray.data

    rng = np.random.default_rng(31)
    rows = []
    for d in range(30):
        n = int(rng.integers(1, 25))
        toks = [
            None if rng.random() < 0.15 else int(rng.integers(0, 50))
            for _ in range(n)
        ]
        rows.append((d, f"s{d % 3}", toks))
    # adversarial: constant window (std 0 → no flags), single-point
    # window, an extreme outlier, an all-NULL window
    rows.append((100, "s9", [5, 5, 5, 5, 5, 5, 5, 5]))
    rows.append((101, "s9", [7]))
    rows.append((102, "s9", [1, 1, 1, 1, 1, 1, 1, 1000]))
    rows.append((103, "s9", [None] * 8 + [3, 4]))
    t = _tok_table(rows)
    ref = (
        _ref_zscore(rows, 8, 2.0)
        .sort_values(["source", "doc_id", "window"])
        .reset_index(drop=True)
    )
    for parts in (1, 6):
        got = (
            zscore_anomalies(
                ray.data.from_arrow(t).repartition(parts), 8, thresh=2.0
            )
            .to_pandas()
            .sort_values(["source", "doc_id", "window"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"window": "int64", "n": "int64", "n_anom": "int64"}),
            ref.astype({"window": "int64", "n": "int64", "n_anom": "int64"}),
        )
    # the planted outlier IS flagged, the constant window is NOT
    g = got.set_index("doc_id")
    assert g.loc[102, "n_anom"] == 1
    assert g.loc[100, "n_anom"] == 0 and g.loc[100, "std"] == 0.0
    # doc 103: window 0 (all NULL) dropped, window 1 present
    w103 = got[got["doc_id"] == 103]
    assert w103["window"].tolist() == [1]


def _ref_hist(rows, lo, hi, n_bins):
    width = (hi - lo) / n_bins
    out = {}
    for _d, src, toks in rows:
        for v in toks:
            if v is None:
                continue
            b = int(
                np.clip(np.floor((float(v) - lo) / width), -1, n_bins)
            )
            out[(src, b)] = out.get((src, b), 0) + 1
    return (
        pd.DataFrame(
            [(s, b, n) for (s, b), n in out.items()],
            columns=["source", "bin", "n"],
        )
        .sort_values(["source", "bin"])
        .reset_index(drop=True)
    )


def test_value_histogram_vs_reference(ray_session):
    import ray.data

    rng = np.random.default_rng(37)
    rows = []
    for d in range(40):
        n = int(rng.integers(1, 30))
        toks = [
            None if rng.random() < 0.1 else int(rng.integers(-20, 120))
            for _ in range(n)
        ]
        rows.append((d, f"s{d % 4}", toks))
    t = _tok_table(rows)
    ref = _ref_hist(rows, 0.0, 100.0, 10)
    for parts in (1, 5):
        got = (
            value_histogram(
                ray.data.from_arrow(t).repartition(parts),
                lo=0.0,
                hi=100.0,
                n_bins=10,
            )
            .to_pandas()
            .sort_values(["source", "bin"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"bin": "int64", "n": "int64"}), ref
        )
    # under/overflow bins exercised
    assert (got["bin"] == -1).any() and (got["bin"] == 10).any()


def _ref_regression(groups):
    """Literal c_reg.c-order reference over {key: [(x, y), ...]}."""
    rows = []
    for k, pts in groups.items():
        n = len(pts)
        if n < 2:
            rows.append((k, n, None, None, None, None))
            continue
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        nf = float(n)
        xbar, ybar = sx / nf, sy / nf
        numer = sxy - nf * xbar * ybar
        denom = sxx - nf * xbar * xbar
        denom2 = syy - nf * ybar * ybar
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = np.float64(numer) / denom
            icept = ybar - np.float64(xbar) * numer / denom
            rsq = np.float64(numer * numer) / (denom * denom2)
            tval = np.sqrt(rsq * (nf - 2.0) / (1.0 - rsq))
        vals = [slope, icept, rsq, tval]
        rows.append(
            (k, n, *[None if not np.isfinite(v) else float(v) for v in vals])
        )
    return pd.DataFrame(
        rows, columns=["k", "n", "slope", "icept", "r2", "tval"]
    )


def test_regression_points_vs_reference(ray_session):
    import ray.data

    from grass_ray.stages.grouped import regression_points

    rng = np.random.default_rng(41)
    groups = {}
    for g in range(12):
        n = int(rng.integers(2, 40))
        pts = [
            (int(rng.integers(0, 100)), int(rng.integers(-50, 200)))
            for _ in range(n)
        ]
        groups[f"g{g:02d}"] = pts
    # degenerate groups: single point, constant x, constant y,
    # perfect line (r2 == 1 -> tval NULL), exactly two points
    groups["single"] = [(5, 7)]
    groups["constx"] = [(3, 1), (3, 9), (3, 4)]
    groups["consty"] = [(1, 6), (4, 6), (9, 6)]
    groups["line"] = [(0, 1), (1, 3), (2, 5), (3, 7)]
    groups["two"] = [(2, 10), (7, 30)]
    ks, xs, ys = [], [], []
    for k, pts in groups.items():
        for x, y in pts:
            ks.append(k)
            xs.append(x)
            ys.append(y)
    t = pa.table(
        {
            "k": pa.array(ks),
            "x": pa.array(xs, type=pa.int64()),
            "y": pa.array(ys, type=pa.int64()),
        }
    )
    ref = (
        _ref_regression(groups).sort_values("k").reset_index(drop=True)
    )
    for parts in (1, 6):
        got = (
            regression_points(
                ray.data.from_arrow(t).repartition(parts),
                ["k"],
                x_col="x",
                y_col="y",
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"n": "int64"}), ref.astype({"n": "int64"})
        )
    g = got.set_index("k")
    assert pd.isna(g.loc["single"]).drop("n").all()
    assert pd.isna(g.loc["constx", "slope"])
    assert g.loc["consty", "slope"] == 0.0 and pd.isna(g.loc["consty", "r2"])
    assert g.loc["line", "r2"] == 1.0 and pd.isna(g.loc["line", "tval"])
    assert g.loc["two", "slope"] == 4.0 and g.loc["two", "icept"] == 2.0
