"""r.series.interp positions, t.rast.neighbors sliding window, calendar."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from grass_ray.functions.calendar import increment, truncate, window_id, window_start
from grass_ray.stages.interp import interp_positions_batch
from grass_ray.stages.neighbors import neighbors_batch


def nested(rows):
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows]),
            "doc_id": pa.array([r[1] for r in rows]),
            "windows": pa.array([r[2] for r in rows], type=pa.list_(pa.int64())),
            "average": pa.array([r[3] for r in rows], type=pa.list_(pa.float64())),
        }
    )


def corpus(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "tokens": pa.array([r[1] for r in rows], type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[1]) for r in rows], type=pa.int32()),
            "source": pa.array(["s"] * len(rows)),
        }
    )


# ---- r.series.interp ------------------------------------------------------


def test_interp_positions_linear():
    t = nested([("s", "d1", [0, 10], [100.0, 200.0])])
    out = interp_positions_batch(t, [0.0, 2.5, 5.0, 10.0, 15.0]).to_pydict()
    # 15.0 outside -> skipped (r.series.interp main.c:330-335)
    assert out["pos"] == [0.0, 2.5, 5.0, 10.0]
    assert out["value"] == [100.0, 125.0, 150.0, 200.0]


def test_interp_null_endpoint():
    t = nested([("s", "d1", [0, 10, 20], [100.0, None, 300.0])])
    out = interp_positions_batch(t, [5.0, 15.0]).to_pydict()
    assert out["value"] == [None, None]  # either side NULL -> NULL


def test_interp_multi_key():
    t = nested(
        [("s", "d1", [0, 4], [0.0, 4.0]), ("s", "d2", [10, 20], [10.0, 0.0])]
    )
    out = interp_positions_batch(t, [2.0, 15.0]).to_pydict()
    assert out["doc_id"] == ["d1", "d2"]
    assert out["value"] == [2.0, 5.0]


# ---- t.rast.neighbors -----------------------------------------------------


def test_neighbors_mean():
    t = corpus([("d1", [1, 2, 3, 4, 5])])
    out = neighbors_batch(t, size=3, method="average").to_pydict()
    # edges: window truncated (outside values ignored)
    assert out["average_3"] == [[1.5, 2.0, 3.0, 4.0, 4.5]]


def test_neighbors_nulls_and_median():
    t = corpus([("d1", [1, None, 3, 100, 5])])
    out = neighbors_batch(t, size=3, method="median").to_pydict()
    med = out["median_3"][0]
    assert med[0] == 1.0  # window [1, NULL] -> median of {1}
    assert med[1] == 2.0  # [1, NULL, 3] -> (1+3)/2
    assert med[2] == pytest.approx(51.5)  # [NULL,3,100] -> (3+100)/2
    out2 = neighbors_batch(t, size=3, method="count").to_pydict()
    assert out2["count_3"][0] == [1, 2, 2, 3, 2]


def test_neighbors_multirow_no_bleed():
    t = corpus([("d1", [0, 0]), ("d2", [100, 100])])
    out = neighbors_batch(t, size=3, method="maximum").to_pydict()
    assert out["maximum_3"][0] == [0.0, 0.0]  # d2's values never leak in
    assert out["maximum_3"][1] == [100.0, 100.0]


# ---- calendar -------------------------------------------------------------


def test_truncate_units():
    ts = np.array(["2001-01-15T12:05:45.123456"], dtype="datetime64[us]")
    assert truncate(ts, "minutes")[0] == np.datetime64("2001-01-15T12:05:00", "us")
    assert truncate(ts, "hours")[0] == np.datetime64("2001-01-15T12:00:00", "us")
    assert truncate(ts, "days")[0] == np.datetime64("2001-01-15T00:00:00", "us")
    assert truncate(ts, "months")[0] == np.datetime64("2001-01-01T00:00:00", "us")
    assert truncate(ts, "years")[0] == np.datetime64("2001-01-01T00:00:00", "us")
    # 2001-01-15 was a Monday; week truncation keeps it
    assert truncate(ts, "weeks")[0] == np.datetime64("2001-01-15T00:00:00", "us")
    ts2 = np.array(["2001-01-14T10:00:00"], dtype="datetime64[us]")  # Sunday
    assert truncate(ts2, "weeks")[0] == np.datetime64("2001-01-08T00:00:00", "us")


def test_increment_calendar_roll():
    # datetime_math.py doc example: 2001-11-01 + 13 months = 2002-12-01
    ts = np.array(["2001-11-01"], dtype="datetime64[us]")
    assert increment(ts, 13, "months")[0] == np.datetime64("2002-12-01", "us")
    assert increment(ts, 2, "years")[0] == np.datetime64("2003-11-01", "us")


def test_window_id_roundtrip():
    ts = np.array(
        ["2024-01-15T10:30:00", "2024-02-01T00:00:00"], dtype="datetime64[us]"
    )
    wid = window_id(ts, "months")
    assert list(wid) == [(2024 - 1970) * 12 + 0, (2024 - 1970) * 12 + 1]
    assert window_start(wid, "months")[0] == np.datetime64("2024-01-01", "us")
    w3 = window_id(ts, "months", mult=3)  # quarterly
    assert list(w3) == [wid[0] // 3, wid[1] // 3]


def test_events_monthly_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from grass_ray.stages.grouped import rollup_events

    path = "/root/testdata/sf0.001/events.parquet"
    out = rollup_events(
        ray.data.read_parquet(path),
        calendar_unit="months",
        methods=("count", "sum"),
    ).to_pandas()
    want = (
        duckdb.connect()
        .execute(
            f"""
            SELECT event_type,
                   (year(ts) - 1970) * 12 + month(ts) - 1 AS "window",
                   CAST(count(value) AS BIGINT) AS count,
                   sum(value) AS sum
            FROM read_parquet('{path}') GROUP BY 1, 2
            """
        )
        .df()
    )
    g = out.sort_values(["event_type", "window"]).reset_index(drop=True)
    w = want.sort_values(["event_type", "window"]).reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["count"].to_numpy() == w["count"].to_numpy()).all()
    assert np.allclose(g["sum"], w["sum"])


def test_reference_month_aggregation_golden():
    """Pin the reference's published numbers
    (temporal/t.rast.aggregate/testsuite/test_aggregation_absolute.py):
    7 maps valued 100..600+NULL at 14-day intervals from
    2001-01-15 12:05:45, granularity '1 months', sampling=contains,
    method=maximum -> per-month maxima [100, 300, 500] and
    max_max = 500 (the NULL-only April window unregistered)."""
    from grass_ray.functions.calendar import increment, window_id
    from grass_ray.functions.topology import select_by_relations

    start = np.datetime64("2001-01-15T12:05:45", "us")
    starts = [increment(np.array([start]), 14 * k, "days")[0] for k in range(7)]
    ends = [increment(np.array([s]), 14, "days")[0] for s in starts]
    values = [100.0, 200.0, 300.0, 400.0, 500.0, 600.0, np.nan]
    # interval extents in epoch-days (integer time like the reference's
    # relative branch; month windows via calendar window ids)
    s_days = np.array([s.astype("datetime64[D]").view("int64") for s in starts])
    e_days = np.array([e.astype("datetime64[D]").view("int64") for e in ends])
    month_ids = sorted(set(window_id(np.array(starts), "months").tolist()))
    from grass_ray.functions.calendar import window_start

    per_month = {}
    for m in month_ids:
        mstart = int(
            window_start(np.array([m]), "months")[0]
            .astype("datetime64[D]")
            .view("int64")
        )
        mend = int(
            window_start(np.array([m + 1]), "months")[0]
            .astype("datetime64[D]")
            .view("int64")
        )
        idx = select_by_relations(mstart, mend, s_days, e_days, ("contains",))
        vals = [values[i] for i in idx if not np.isnan(values[i])]
        if vals:  # NULL-only windows unregistered (register_null default)
            per_month[m] = max(vals)
    jan2001 = (2001 - 1970) * 12 + 0
    assert per_month == {
        jan2001: 100.0,      # only map 1 fully inside January
        jan2001 + 1: 300.0,  # map 3 inside February
        jan2001 + 2: 500.0,  # map 5 inside March
    }
    assert max(per_month.values()) == 500.0  # the published max_max


def test_suffix_builders_reference_cases():
    from datetime import datetime

    from grass_ray.functions.calendar import (
        numeric_suffix,
        suffix_from_datetime,
        time_suffix,
    )

    t = datetime(2001, 1, 1, 10, 4, 12)
    # datetime_math.py doctest triples
    assert suffix_from_datetime(t, "1 month") == "2001_01"
    assert suffix_from_datetime(t, "1 year 1 month") == "2001"
    assert suffix_from_datetime(t, "6 seconds") == "2001_01_01_10_04_12"
    assert suffix_from_datetime(t, "3 hours") == "2001_01_01_10"
    assert suffix_from_datetime(t, "2 weeks") == "2001_01_01"
    assert time_suffix(t) == "2001_01_01T10_04_12"
    assert (
        time_suffix(datetime(2001, 1, 1), datetime(2001, 2, 1))
        == "2001_01_01T00_00_00_2001_02_01T00_00_00"
    )
    assert numeric_suffix("map", 7) == "map_00007"
    assert numeric_suffix("map", 7, "%3") == "map_007"
    assert numeric_suffix("map", 7, "%03") == "map_007"
    assert numeric_suffix("map", 7, "nope") == "map_00007"
