"""Grouped (shuffle) rollup path: equivalence with row-local + salting (F5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from grass_ray.sources.corpus import synth_corpus_table
from grass_ray.stages.grouped import (
    rollup_events,
    rollup_points,
    rollup_points_holistic,
)
from grass_ray.stages.rollup import explode_tokens, rollup_batch

METHODS = ("count", "sum", "minimum", "maximum", "average")


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data

    t = synth_corpus_table(40, seed=55, skew=0.3)
    return t, ray.data.from_arrow(t)


def test_grouped_equals_rowlocal(corpus):
    t, ds = corpus
    pts = explode_tokens(ds)
    grouped = rollup_points(
        pts,
        key_cols=("source", "doc_id"),
        pos_col="pos",
        val_col="token",
        gran=60,
        methods=METHODS,
    ).to_pandas()
    local = rollup_batch(t, 60, METHODS).to_pandas()
    g = _sorted(grouped, ["doc_id", "window"])[["doc_id", "window", *METHODS]]
    l = _sorted(local, ["doc_id", "window"])[["doc_id", "window", *METHODS]]
    pd.testing.assert_frame_equal(g, l, check_dtype=False)


def test_salted_equals_unsalted(corpus):
    t, ds = corpus
    pts = explode_tokens(ds)
    salted = rollup_points(
        pts,
        key_cols=("source", "doc_id"),
        pos_col="pos",
        val_col="token",
        gran=60,
        methods=METHODS,
        salt=8,
    ).to_pandas()
    local = rollup_batch(t, 60, METHODS).to_pandas()
    g = _sorted(salted, ["doc_id", "window"])[["doc_id", "window", *METHODS]]
    l = _sorted(local, ["doc_id", "window"])[["doc_id", "window", *METHODS]]
    pd.testing.assert_frame_equal(g, l, check_dtype=False)


def test_holistic_grouped(corpus):
    t, ds = corpus
    pts = explode_tokens(ds)
    hol = rollup_points_holistic(
        pts,
        key_cols=("source", "doc_id"),
        pos_col="pos",
        val_col="token",
        gran=60,
        methods=("median", "quart3", "mode", "diversity"),
    ).to_pandas()
    local = rollup_batch(
        t, 60, ("median", "quart3", "mode", "diversity")
    ).to_pandas()
    cols = ["doc_id", "window", "median", "quart3", "mode", "diversity"]
    pd.testing.assert_frame_equal(
        _sorted(hol, ["doc_id", "window"])[cols],
        _sorted(local, ["doc_id", "window"])[cols],
        check_dtype=False,
    )


def test_rollup_events_vs_duckdb(ray_session):
    import duckdb

    import ray.data

    path = "/root/testdata/sf0.001/events.parquet"
    ds = ray.data.read_parquet(path)
    out = rollup_events(
        ds, gran_seconds=3600, methods=("count", "sum", "average")
    ).to_pandas()
    want = (
        duckdb.connect()
        .execute(
            f"""
        SELECT event_type, epoch_us(ts) // 3600000000 AS "window",
               CAST(count(value) AS BIGINT) AS count,
               CAST(sum(value) AS DOUBLE) AS sum,
               avg(value) AS average
        FROM read_parquet('{path}') GROUP BY 1, 2
        """
        )
        .df()
    )
    g = _sorted(out, ["event_type", "window"]).reset_index(drop=True)
    w = _sorted(want, ["event_type", "window"]).reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["count"] == w["count"]).all()
    assert np.allclose(g["sum"], w["sum"])
    assert np.allclose(g["average"], w["average"])


def test_all_null_window_grouped(ray_session):
    import ray.data

    t = pa.table(
        {
            "k": ["a", "a", "a"],
            "pos": [0, 1, 5],
            "v": pa.array([None, None, 2.0], type=pa.float64()),
        }
    )
    out = rollup_points(
        ray.data.from_arrow(t),
        key_cols=("k",),
        pos_col="pos",
        val_col="v",
        gran=4,
        methods=METHODS,
    ).to_pandas()
    out = _sorted(out, ["window"])
    assert list(out["count"]) == [0, 1]
    assert pd.isna(out["sum"][0]) and out["sum"][1] == 2.0


def test_sessionize_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from grass_ray.stages.grouped import sessionize

    path = "/root/testdata/sf0.001/events.parquet"
    out = sessionize(
        ray.data.read_parquet(path),
        key_cols=("user_id",),
        gap_seconds=1800,
    ).to_pandas()
    want = (
        duckdb.connect()
        .execute(
            f"""
        WITH o AS (
            SELECT user_id, ts, value,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
            FROM read_parquet('{path}')
        ),
        s AS (
            SELECT *, CASE WHEN prev IS NULL
                             OR epoch_us(ts) - epoch_us(prev) > 1800 * 1000000
                           THEN 1 ELSE 0 END AS new_sess
            FROM o
        ),
        g AS (
            SELECT *, sum(new_sess) OVER
                      (PARTITION BY user_id ORDER BY ts) - 1 AS session_id
            FROM s
        )
        SELECT user_id, session_id,
               min(ts) AS session_start, max(ts) AS session_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM g GROUP BY 1, 2
        """
        )
        .df()
    )
    g = out.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    w = want.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["n_events"].to_numpy() == w["n_events"].to_numpy()).all()
    assert (g["session_start"].to_numpy() == w["session_start"].to_numpy()).all()
    assert (g["session_end"].to_numpy() == w["session_end"].to_numpy()).all()


def test_kll_sketch_accuracy():
    from grass_ray.functions.sketch import KLLSketch

    rng = np.random.default_rng(3)
    vals = rng.normal(size=50000) * 100
    sk = KLLSketch(256).update_many(vals)
    for q in (0.1, 0.5, 0.9):
        est = sk.quantile(q)
        true = np.quantile(vals, q)
        rank_err = abs((vals <= est).mean() - q)
        assert rank_err < 0.05, (q, est, true, rank_err)
    # merge equivalence: two halves merged ~= whole
    a = KLLSketch(256).update_many(vals[:25000])
    b = KLLSketch(256).update_many(vals[25000:])
    m = a.merge(KLLSketch.from_bytes(b.to_bytes()))
    assert abs((vals <= m.quantile(0.5)).mean() - 0.5) < 0.05
    # serialization round trip preserves answers
    r = KLLSketch.from_bytes(m.to_bytes())
    assert r.quantile(0.5) == m.quantile(0.5)
    assert r.n == 50000


def test_approx_quantiles_grouped(ray_session):
    import ray.data

    from grass_ray.stages.grouped import approx_quantiles
    from grass_ray.stages.rollup import explode_tokens

    t = synth_corpus_table(30, seed=12, n_tok=1440)
    pts = explode_tokens(ray.data.from_arrow(t))
    out = approx_quantiles(
        pts, key_cols=("source",), val_col="token", quantiles=(0.5, 0.9)
    ).to_pandas()
    exact = pts.to_pandas()
    for _, r in out.iterrows():
        grp = exact[exact["source"] == r["source"]]["token"].dropna()
        for q, col in ((0.5, "q50"), (0.9, "q90")):
            rank_err = abs((grp <= r[col]).mean() - q)
            assert rank_err < 0.06, (r["source"], q, rank_err)


def test_bucket_join_vs_pandas(ray_session):
    import ray.data

    from grass_ray.stages.join import bucket_join

    rng = np.random.default_rng(4)
    left = pd.DataFrame(
        {
            "k": [f"k{i % 37}" for i in range(300)],
            "i": np.arange(300),
            "v": rng.normal(size=300),
        }
    )
    right = pd.DataFrame(
        {
            "k": [f"k{i % 41}" for i in range(250)],
            "j": np.arange(250),
            "v": rng.normal(size=250),  # name collision -> suffixed
        }
    )
    out = bucket_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        key_cols=("k",),
        buckets=8,
    ).to_pandas()
    want = left.merge(right, on="k", suffixes=("", "_r"))
    assert len(out) == len(want)
    a = out.sort_values(["k", "i", "j"]).reset_index(drop=True)
    b = want.sort_values(["k", "i", "j"]).reset_index(drop=True)
    assert (a["i"].to_numpy() == b["i"].to_numpy()).all()
    assert (a["j"].to_numpy() == b["j"].to_numpy()).all()
    assert np.allclose(a["v_r"], b["v_r"])


def test_asof_join_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from grass_ray.stages.join import asof_join

    path = "/root/testdata/sf0.001/events.parquet"
    ds = ray.data.read_parquet(path, columns=["user_id", "ts", "event_type", "value"])
    # right side: only 'click'-type events (whatever the first type is)
    import pyarrow.parquet as pq

    first_type = pq.read_table(path, columns=["event_type"]).column(
        "event_type"
    )[0].as_py()
    import pyarrow.compute as pc

    rightf = ray.data.read_parquet(path).map_batches(
        lambda b: b.filter(pc.equal(b.column("event_type"), first_type)).select(
            ["user_id", "ts", "value"]
        ),
        batch_format="pyarrow",
    )
    out = asof_join(
        ds, rightf, key_cols=("user_id",), ts_col="ts", buckets=16
    ).to_pandas()
    want = (
        duckdb.connect()
        .execute(
            f"""
        SELECT a.user_id, a.ts, a.event_type, a.value,
               b.ts AS ts_r, b.value AS value_r
        FROM read_parquet('{path}') a
        ASOF LEFT JOIN (
            SELECT user_id, ts, value FROM read_parquet('{path}')
            WHERE event_type = '{first_type}'
        ) b ON a.user_id = b.user_id AND a.ts >= b.ts
        """
        )
        .df()
    )
    assert len(out) == len(want)
    a = out.sort_values(["user_id", "ts"]).reset_index(drop=True)
    b = want.sort_values(["user_id", "ts"]).reset_index(drop=True)
    # matched right timestamps must agree (NaT where no prior click)
    assert (a["ts_r"].isna() == b["ts_r"].isna()).all()
    m = ~a["ts_r"].isna()
    assert (a.loc[m, "ts_r"].to_numpy() == b.loc[m, "ts_r"].to_numpy()).all()
    assert np.allclose(a.loc[m, "value_r"], b.loc[m, "value_r"])


def test_interval_join_vs_duckdb(ray_session):
    import duckdb
    import ray.data

    from grass_ray.stages.join import interval_join

    rng = np.random.default_rng(9)
    def mk(n, seed_off):
        s = rng.integers(0, 5000, size=n)
        ln = rng.integers(1, 300, size=n)
        return pd.DataFrame(
            {
                "k": [f"k{i % 5}" for i in range(n)],
                "iid": np.arange(n) + seed_off,
                "start": s,
                "end": s + ln,
            }
        )

    a, b = mk(120, 0), mk(90, 1000)
    out = interval_join(
        ray.data.from_pandas(a),
        ray.data.from_pandas(b),
        key_cols=("k",),
        bucket_span=512,
    ).to_pandas()
    con = duckdb.connect()
    con.register("a", a)
    con.register("b", b)
    want = con.execute(
        """
        SELECT a.iid, b.iid AS iid_r FROM a JOIN b
        ON a.k = b.k AND a.start < b."end" AND b.start < a."end"
        """
    ).df()
    got = set(zip(out["iid"], out["iid_r"]))
    exp = set(zip(want["iid"], want["iid_r"]))
    assert got == exp


def test_sessionize_multi_matches_singles(ray_session):
    """One-exchange multi-gap sessionize must be row-identical per
    label to independent single-gap runs."""
    import ray.data

    from grass_ray.stages.grouped import sessionize, sessionize_multi

    rng = np.random.default_rng(5)
    n = 400
    t = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 12, n), type=pa.int64()),
            "ts": pa.array(
                np.sort(rng.integers(0, 100_000, n)).astype("datetime64[us]")
            ),
            "value": pa.array(rng.normal(size=n)),
        }
    )
    ds = ray.data.from_arrow(t)
    multi = sessionize_multi(
        ds, key_cols=("user_id",), gaps={"a": 1800, "b": 300}
    ).to_pandas()
    for label, gap in (("a", 1800), ("b", 300)):
        single = (
            sessionize(ds, key_cols=("user_id",), gap_seconds=gap)
            .to_pandas()
            .sort_values(["user_id", "session_id"])
            .reset_index(drop=True)
        )
        part = (
            multi[multi["gap_label"] == label]
            .drop(columns=["gap_label"])
            .sort_values(["user_id", "session_id"])
            .reset_index(drop=True)
        )
        assert part.equals(single)
