"""Absolute granularity inference + grouped-path weighted reducers.

Granularity cases replicate the reference doctests
(``temporal_granularity.py:339-529``, ``datetime_math.py:507-709``);
weighted parity asserts grouped == salted == row-local (F5 contract
extended to ``w_*``)."""

from __future__ import annotations

from datetime import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa

from grass_ray.functions.topology import (
    compute_datetime_delta,
    infer_granularity_absolute,
)


def test_datetime_delta_doctests():
    # datetime_math.py doctest replicas
    assert compute_datetime_delta(dt(2001, 1, 1, 0, 0, 14), dt(2001, 1, 1, 0, 0, 44))["second"] == 30
    assert compute_datetime_delta(dt(2011, 10, 31, 0, 45), dt(2011, 10, 31, 12, 15))["minute"] == 690
    d = compute_datetime_delta(dt(2011, 11, 1), dt(2011, 12, 1, 1))
    assert d["month"] == 1 and d["hour"] == 721 and d["max_days"] == 30
    d = compute_datetime_delta(dt(2011, 6, 1), dt(2021, 6, 1))
    assert d["year"] == 10 and d["month"] == 120
    d = compute_datetime_delta(dt(2011, 6, 1), dt(2012, 6, 1, 12))
    assert d["hour"] == 8796 and d["max_days"] == 366


def test_absolute_granularity_doctests():
    # temporal_granularity.py doctest replicas
    assert infer_granularity_absolute([dt(2000, 1, 1), dt(2000, 2, 1)]) == "1 month"
    assert (
        infer_granularity_absolute([dt(2000, 1, 1), dt(2000, 1, 2), dt(2000, 1, 3)])
        == "1 day"
    )
    assert (
        infer_granularity_absolute(
            [dt(2000, 1, 1), dt(2000, 1, 2), dt(2000, 5, 4, 0, 5, 30)]
        )
        == "30 seconds"
    )
    assert (
        infer_granularity_absolute(
            [dt(2000, 1, 1), dt(2000, 5, 4, 2)],
            [dt(2000, 5, 2), None],
        )
        == "2 hours"
    )
    assert (
        infer_granularity_absolute(
            [dt(2000, 1, 1), dt(2005, 5, 4, 12)],
            [dt(2000, 2, 1), dt(2007, 5, 20, 6)],
        )
        == "6 hours"
    )


def test_events_time_report(ray_session):
    import ray.data

    from grass_ray.stages.sample import events_time_report

    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 03:00", "2024-01-01 09:00"]
    )
    ds = ray.data.from_pandas(pd.DataFrame({"ts": ts, "value": [1.0, 2.0, 3.0]}))
    rep = events_time_report(ds)
    assert rep["events"] == 3
    assert rep["distinct_times"] == 3
    assert rep["granularity"] == "3 hours"
    assert not rep["distinct_capped"]


def _explode_with_weight(ray, n_docs, gran):
    from grass_ray.sources.corpus import synth_corpus_table
    from grass_ray.stages.rollup import explode_tokens

    t = synth_corpus_table(n_docs, seed=11)
    pts = explode_tokens(ray.data.from_arrow(t))

    def add_w(batch: pa.Table) -> pa.Table:
        pos = batch.column("pos").to_numpy(zero_copy_only=False)
        w = (pos % gran + 1).astype(np.float64)
        return batch.append_column("w", pa.array(w))

    return t, pts.map_batches(add_w, batch_format="pyarrow")


def _rowlocal_weighted(ray, t, gran, methods):
    from grass_ray.stages.rollup import rollup

    wvec = np.arange(1, gran + 1, dtype=np.float64)
    return (
        rollup(ray.data.from_arrow(t), gran, methods, weights=wvec)
        .to_pandas()
        .set_index(["source", "doc_id", "window"])
        .sort_index()
    )


def test_grouped_weighted_parity(ray_session):
    """grouped weighted == salted grouped weighted == row-local weighted
    (count/sum/average) — the F5 contract extended to w_* variants."""
    import ray

    from grass_ray.stages.grouped import rollup_points

    gran = 60
    t, pts = _explode_with_weight(ray, 12, gran)
    pts = pts.materialize()
    want = _rowlocal_weighted(ray, t, gran, ("count", "sum", "average"))
    for salt in (0, 8):
        got = (
            rollup_points(
                pts,
                key_cols=("source", "doc_id"),
                pos_col="pos",
                val_col="token",
                gran=gran,
                methods=("count", "sum", "average"),
                weight_col="w",
                salt=salt,
            )
            .to_pandas()
            .set_index(["source", "doc_id", "window"])
            .sort_index()
        )
        assert len(got) == len(want)
        for col in ("count", "sum", "average"):
            a = got[col].to_numpy(dtype=np.float64)
            b = want[col].to_numpy(dtype=np.float64)
            both_nan = np.isnan(a) & np.isnan(b)
            assert np.allclose(a[~both_nan], b[~both_nan], rtol=1e-12), (salt, col)


def test_grouped_weighted_holistic_median(ray_session):
    """w_median on the point path == row-local weighted median
    (c_percentile.c:54-84 cumulative-weight rule)."""
    import ray

    from grass_ray.stages.grouped import rollup_points_holistic
    from grass_ray.stages.rollup import rollup

    gran = 30
    t, pts = _explode_with_weight(ray, 6, gran)
    wvec = np.arange(1, gran + 1, dtype=np.float64)
    want = (
        rollup(ray.data.from_arrow(t), gran, ("median",), weights=wvec)
        .to_pandas()
        .set_index(["source", "doc_id", "window"])
        .sort_index()
    )
    got = (
        rollup_points_holistic(
            pts,
            key_cols=("source", "doc_id"),
            pos_col="pos",
            val_col="token",
            gran=gran,
            methods=("median",),
            weight_col="w",
        )
        .to_pandas()
        .set_index(["source", "doc_id", "window"])
        .sort_index()
    )
    assert len(got) == len(want)
    a = got["median"].to_numpy(dtype=np.float64)
    b = want["median"].to_numpy(dtype=np.float64)
    both_nan = np.isnan(a) & np.isnan(b)
    assert np.array_equal(a[~both_nan], b[~both_nan])
