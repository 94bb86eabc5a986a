"""Full temporal-algebra grammar goldens.

Each case replicates a ground truth from the reference testsuite
(``python/grass/temporal/testsuite/unittests_temporal_raster_algebra.py``
and ``unittests_temporal_conditionals.py``) on relative equal-gran
tiers: A = maps 1..4 at windows 0..3, D = A restricted to windows 2..3
— the same layout the reference registers as a1..a4 / d1..d3."""

from __future__ import annotations

import math

import pyarrow as pa
import pytest


def nested(rows, gran=1):
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows]),
            "doc_id": pa.array([r[1] for r in rows]),
            "gran": pa.array([gran] * len(rows), type=pa.int64()),
            "windows": pa.array([r[2] for r in rows], type=pa.list_(pa.int64())),
            "average": pa.array([r[3] for r in rows], type=pa.list_(pa.float64())),
        }
    )


@pytest.fixture()
def tiers(ray_session):
    import ray.data

    a = ray.data.from_arrow(
        nested([("s", "d1", [0, 1, 2, 3], [1.0, 2.0, 3.0, 4.0])])
    )
    d = ray.data.from_arrow(nested([("s", "d1", [2, 3], [3.0, 4.0])]))
    return {"A": a, "D": d}


def _vals(res, col="average"):
    df = res.to_pandas()
    assert len(df) == 1
    row = df.iloc[0]
    return list(row["windows"]), [
        None if v is None or (isinstance(v, float) and math.isnan(v)) else v
        for v in row[col]
    ]


def test_self_sum(tiers):
    # "R = A + A" -> r1..r4 = 2,4,6,8 (raster_algebra_equal_ts.py:84)
    from grass_ray.stages.algebra import algebra

    name, res = algebra("R = A + A", tiers)
    assert name == "R"
    w, v = _vals(res)
    assert w == [0, 1, 2, 3] and v == [2.0, 4.0, 6.0, 8.0]


def test_precedence_chain(tiers):
    # "R = A / A + A*A/A" -> 1 + A (unittests_temporal_raster_algebra.py:459)
    from grass_ray.stages.algebra import algebra

    _, res = algebra("R = A / A + A*A/A", tiers)
    w, v = _vals(res)
    assert v == [2.0, 3.0, 4.0, 5.0]


def test_td_sum(tiers):
    # "R = A + td(A)" -> A + 1 at gran 1 (raster_algebra.py:234)
    from grass_ray.stages.algebra import algebra

    _, res = algebra("R = A + td(A)", tiers)
    _, v = _vals(res)
    assert v == [2.0, 3.0, 4.0, 5.0]


def test_qualified_equal_op(tiers):
    # "R = A {+,equal,l} td(A)" (raster_algebra.py:300): equal relation
    # reduces to the plain operator under aligned granularity
    from grass_ray.stages.algebra import algebra

    _, res = algebra("R = A {+,equal,l} td(A)", tiers)
    _, v = _vals(res)
    assert v == [2.0, 3.0, 4.0, 5.0]


def test_nested_topology_qualifier(tiers):
    # a topo qualifier NESTED inside an expression rewrites to a
    # synthetic tier (temporal_algebra.py:2320-3371 grammar breadth);
    # u/d/i extent modifiers stay statement-level only
    from grass_ray.stages.algebra import algebra

    # A precedes D at windows 1 (a2 meets d at w2 -> 2+3) and 2
    # (a3 meets d at w3 -> 3+4); A + synth intersects to those windows
    _, res = algebra("R = A + (A {+,precedes} D)", dict(tiers))
    w, v = _vals(res)
    assert list(zip(w, v)) == [(1, 7.0), (2, 10.0)]
    # self-during is empty (equal extents are never during-inclusive)
    _, res = algebra("R = A + (A {+,during} A)", dict(tiers))
    assert res.count() == 0
    # nested u: the synthetic is an (empty here) RAGGED tier — the
    # aligned consumer grid-projects it; round-4 removed the guard
    _, res = algebra("R = A + (A {+,during,u} A)", dict(tiers))
    assert res.count() == 0


def test_hash_in_expression(tiers):
    # "R = A + (A {#, equal,l} A)" -> A + 1 (raster_algebra.py:195)
    from grass_ray.stages.algebra import algebra

    _, res = algebra("R = A + (A {#,equal,l} A)", dict(tiers))
    _, v = _vals(res)
    assert v == [2.0, 3.0, 4.0, 5.0]


def test_if_hash_condition(tiers):
    # "R = if({equal}, A#A == 1, A - A)" -> all 0 (raster_algebra.py:388)
    from grass_ray.stages.algebra import algebra

    _, res = algebra("R = if(A # A == 1, A - A)", dict(tiers))
    w, v = _vals(res)
    assert v == [0.0, 0.0, 0.0, 0.0]


def test_temporal_indexing(tiers):
    # "R = A[-1] + A[1]" -> r2 = a1+a3, r3 = a2+a4 (raster_algebra.py:587)
    from grass_ray.stages.algebra import algebra

    _, res = algebra("R = A[-1] + A[1]", tiers)
    w, v = _vals(res)
    assert w == [1, 2] and v == [1.0 + 3.0, 2.0 + 4.0]


def test_selection_and_inverse(tiers):
    # "R = A : D" -> maps at D's windows (raster_algebra.py:699)
    from grass_ray.stages.algebra import algebra

    _, res = algebra("R = A : D", tiers)
    w, v = _vals(res)
    assert w == [2, 3] and v == [3.0, 4.0]
    _, res = algebra("R = A !: D", tiers)
    w, v = _vals(res)
    assert w == [0, 1] and v == [1.0, 2.0]


def test_if_td_condition(tiers):
    # "R = if(td(A) == 1, A)" -> A (unittests_temporal_conditionals.py:170)
    from grass_ray.stages.algebra import algebra

    _, res = algebra("R = if(td(A) == 1, A)", tiers)
    _, v = _vals(res)
    assert v == [1.0, 2.0, 3.0, 4.0]


def test_if_start_time(tiers):
    # "R = if(start_day(A) <= 2, A)" analog on relative time
    # (unittests_temporal_conditionals.py:227): 2-arg if -> NULL branch
    from grass_ray.stages.algebra import algebra

    _, res = algebra("R = if(start_time(A) <= 2, A)", tiers)
    w, v = _vals(res)
    assert w == [0, 1, 2, 3] and v == [1.0, 2.0, 3.0, None]


def test_if_trivalent_null(ray_session):
    import ray.data

    from grass_ray.stages.algebra import algebra

    a = ray.data.from_arrow(
        nested([("s", "d1", [0, 1, 2], [1.0, None, 3.0])])
    )
    _, res = algebra("R = if(A > 1, A, 0 - A)", {"A": a})
    w, v = _vals(res)
    assert w == [0, 1, 2] and v == [-1.0, None, 3.0]


def test_tsnap(ray_session):
    import ray.data

    from grass_ray.stages.algebra import algebra

    a = ray.data.from_arrow(
        nested([("s", "d1", [0, 1, 5, 6], [1.0, 2.0, 3.0, 4.0])])
    )
    _, res = algebra("R = tsnap(A)", {"A": a})
    w, v = _vals(res)
    assert w == [0, 1, 2, 3] and v == [1.0, 2.0, 3.0, 4.0]


def test_mixed_value_columns(ray_session):
    import ray.data

    from grass_ray.stages.algebra import tier_expr

    t = nested([("s", "d1", [0, 1], [1.0, 2.0])])
    t = t.append_column(
        "sum", pa.array([[10.0, 20.0]], type=pa.list_(pa.float64()))
    )
    ds = ray.data.from_arrow(t)
    out = tier_expr(
        "if(A > 1, A, B)",
        {"A": (ds, "average"), "B": (ds, "sum")},
        out_col="v",
    )
    df = out.to_pandas()
    assert list(df.iloc[0]["v"]) == [10.0, 2.0]


def test_multi_key_bucketing(ray_session):
    # several keys spread over buckets: each evaluates independently
    import ray.data

    from grass_ray.stages.algebra import tier_expr

    rows = [
        ("s", f"d{i}", [0, 1, 2], [float(i), float(i + 1), float(i + 2)])
        for i in range(25)
    ]
    ds = ray.data.from_arrow(nested(rows))
    out = tier_expr("A * 2", {"A": ds}).to_pandas().set_index("doc_id")
    for i in range(25):
        assert list(out.loc[f"d{i}", "average"]) == [
            2.0 * i, 2.0 * (i + 1), 2.0 * (i + 2)
        ]


def test_calendar_field_matches_datetime():
    """Vectorized calendar accessors equal Python datetime semantics
    (reference temporal_algebra.py:2024-2085: DOY 1-based, DOW
    isoweekday, WEEK isocalendar) on random epochs across decades."""
    from datetime import datetime, timezone

    import numpy as np

    from grass_ray.stages.algebra import _calendar_field

    rng = np.random.default_rng(7)
    eps = rng.integers(0, 2_000_000_000, size=2000, dtype=np.int64)

    def ref(e, field):
        dt = datetime.fromtimestamp(int(e), tz=timezone.utc)
        if field == "doy":
            return dt.timetuple().tm_yday
        if field == "dow":
            return dt.isoweekday()
        if field == "week":
            return dt.isocalendar()[1]
        return getattr(dt, field)

    for field in (
        "doy", "dow", "year", "month", "week", "day", "hour", "minute",
        "second",
    ):
        got = _calendar_field(eps, field)
        want = np.array([ref(e, field) for e in eps], dtype=np.int64)
        assert np.array_equal(got, want), field


def test_algebra_calendar_accessors(ray_session):
    """start_dow / end_month accessor expressions over a day-granular
    tier (windows are epoch days): the weekday filter and the month
    comparison both reproduce the literal datetime computation."""
    from datetime import datetime, timezone

    import ray.data

    # 14 consecutive days starting 2024-01-01 (a Monday), gran = 86400
    windows = list(range(19723, 19737))  # epoch days
    vals = [float(i) for i in range(len(windows))]
    a = ray.data.from_arrow(nested([("s", "d1", windows, vals)], gran=86400))
    from grass_ray.stages.algebra import tier_expr

    out = tier_expr("if(start_dow(A) <= 5, A)", {"A": a})
    w, v = _vals(out)
    keep = {
        wi: vi
        for wi, vi in zip(windows, vals)
        if datetime.fromtimestamp(wi * 86400, tz=timezone.utc).isoweekday() <= 5
    }
    got = {wi: vi for wi, vi in zip(w, v) if vi is not None}
    assert got == keep

    out2 = tier_expr("if(end_month(A) == 1, A * 10)", {"A": a})
    w2, v2 = _vals(out2)
    keep2 = {
        wi: vi * 10
        for wi, vi in zip(windows, vals)
        if datetime.fromtimestamp((wi + 1) * 86400, tz=timezone.utc).month == 1
    }
    got2 = {wi: vi for wi, vi in zip(w2, v2) if vi is not None}
    assert got2 == keep2


def test_algebra_date_literals(ray_session):
    """Datetime-literal comparisons (reference eval_datetime_str):
    start_date(A) >= date("...") and start_time vs datetime("...")."""
    from datetime import datetime, timezone

    import ray.data

    from grass_ray.stages.algebra import tier_expr

    windows = list(range(19723, 19737))  # 2024-01-01 .. 2024-01-14
    vals = [float(i) for i in range(len(windows))]
    a = ray.data.from_arrow(nested([("s", "d1", windows, vals)], gran=86400))

    out = tier_expr('if(start_date(A) >= date("2024-01-08"), A)', {"A": a})
    w, v = _vals(out)
    cut = int(
        datetime(2024, 1, 8, tzinfo=timezone.utc).timestamp()
    ) // 86400
    got = {wi: vi for wi, vi in zip(w, v) if vi is not None}
    assert got == {wi: vi for wi, vi in zip(windows, vals) if wi >= cut}

    out2 = tier_expr(
        'if(start_time(A) < datetime("2024-01-04 00:00:00"), A + 1)', {"A": a}
    )
    w2, v2 = _vals(out2)
    cut2 = int(datetime(2024, 1, 4, tzinfo=timezone.utc).timestamp())
    got2 = {wi: vi for wi, vi in zip(w2, v2) if vi is not None}
    assert got2 == {
        wi: vi + 1 for wi, vi in zip(windows, vals) if wi * 86400 < cut2
    }

    with pytest.raises(Exception):
        tier_expr('A + "oops"', {"A": a}).materialize()


def test_reference_temporal_conditionals_calendar(ray_session):
    """Reference-testsuite goldens with BARE date-string comparisons
    (unittests_temporal_conditionals.py:146-168, 225-243, 400-424):
    A = values 1..4 daily from 2001-01-01, D = 8,9,10 daily from
    2001-01-03 — the same layout the reference registers."""
    import ray.data

    from grass_ray.stages.algebra import tier_expr

    day0 = 11323  # epoch day of 2001-01-01
    a = ray.data.from_arrow(
        nested(
            [("s", "d1", [day0, day0 + 1, day0 + 2, day0 + 3],
              [1.0, 2.0, 3.0, 4.0])],
            gran=86400,
        )
    )
    d = ray.data.from_arrow(
        nested(
            [("s", "d1", [day0 + 2, day0 + 3, day0 + 4],
              [8.0, 9.0, 10.0])],
            gran=86400,
        )
    )

    # test_temporal_condition_1: 2 maps, min 3, max 4
    w, v = _vals(tier_expr('if(start_date(A) >= "2001-01-03", A)', {"A": a}))
    got = {wi: vi for wi, vi in zip(w, v) if vi is not None}
    assert got == {day0 + 2: 3.0, day0 + 3: 4.0}

    # start_day golden (line 227): day-of-month <= 2 keeps Jan 1-2
    w, v = _vals(tier_expr("if(start_day(A) <= 2, A)", {"A": a}))
    got = {wi: vi for wi, vi in zip(w, v) if vi is not None}
    assert got == {day0: 1.0, day0 + 1: 2.0}

    # test_temporal_condition_else_1: 4 maps, min 1, max 9
    w, v = _vals(
        tier_expr('if(start_date(A) <= "2001-01-03", A, D)', {"A": a, "D": d})
    )
    got = {wi: vi for wi, vi in zip(w, v) if vi is not None}
    assert got == {day0: 1.0, day0 + 1: 2.0, day0 + 2: 3.0, day0 + 3: 9.0}


def test_reference_conditional_topology_golden(ray_session):
    """unittests_temporal_conditionals.py:240-258 — conditional
    topology operator between full comparison terms:
    ``if(td(A) == 1 {||,during} start_date(C) < "2001-01-02", A)``
    keeps exactly the A windows inside C's granule: values 2, 3 on
    Jan 2 - Jan 3 (td in engine units: seconds)."""
    import ray.data

    from grass_ray.stages.algebra import tier_expr

    day0 = 11323  # 2001-01-01
    a = ray.data.from_arrow(
        nested(
            [("s", "d1", [day0, day0 + 1, day0 + 2, day0 + 3],
              [1.0, 2.0, 3.0, 4.0])],
            gran=86400,
        )
    )
    # c1: one 2-day granule starting 2001-01-02
    c = ray.data.from_arrow(
        nested([("s", "d1", [(day0 + 1) // 2], [5.0])], gran=172800)
    )
    out = tier_expr(
        'if(td(A) == 86400 {||,during} start_date(C) < "2001-01-02", A)',
        {"A": a, "C": c},
    )
    w, v = _vals(out)
    got = {wi: vi for wi, vi in zip(w, v) if vi is not None}
    assert got == {day0 + 1: 2.0, day0 + 2: 3.0}


def test_reference_if_relation_golden(ray_session):
    """unittests_temporal_conditionals.py:261-280 (condition_7): the
    relation-qualified conditional
    ``if({over}, start_date(C) == "2001-01-02" {&&,contains} td(A) == 1, B)``
    keeps both B granules (5, 6) — the condition evaluates on C's time
    dimension and B is selected through the over (overlaps|overlapped)
    relation.  B's 1-day-shifted 2-day grid rides on worigin."""
    import ray.data

    from grass_ray.stages.algebra import algebra

    def nested_o(rows, gran, worigin=None):
        t = nested(rows, gran=gran)
        if worigin is not None:
            t = t.append_column(
                "worigin", pa.array([worigin] * t.num_rows, type=pa.int64())
            )
        return t

    day0 = 11323  # 2001-01-01
    a = ray.data.from_arrow(
        nested_o(
            [("s", "d1", [day0 + i for i in range(4)], [1.0, 2.0, 3.0, 4.0])],
            86400,
        )
    )
    b = ray.data.from_arrow(  # b1 Jan1-3, b2 Jan3-5
        nested_o([("s", "d1", [5661, 5662], [5.0, 6.0])], 172800, worigin=86400)
    )
    c = ray.data.from_arrow(  # c1 Jan2-4
        nested_o([("s", "d1", [5662], [7.0])], 172800)
    )
    _nm, out = algebra(
        'R = if({over},start_date(C) == "2001-01-02" {&&,contains} td(A) == 86400, B)',
        {"A": a, "B": b, "C": c},
    )
    df = out.to_pandas()
    assert len(df) == 1
    assert list(df.iloc[0]["windows"]) == [5661, 5662]
    assert list(df.iloc[0]["average"]) == [5.0, 6.0]

    # else arm exists but contributes nothing here: a 1-day TRUE
    # granule never strictly 'over'-relates to a 2-day granule
    # (during/starts/finishes are not overlaps), so the 3-arg form
    # yields an empty result — the populated else path is pinned by
    # test_reference_if_else_relation_golden
    _nm2, out2 = algebra(
        'R = if({over}, td(A) == 86400, B, C)', {"A": a, "B": b, "C": c}
    )
    assert out2.count() == 0


def test_reference_conditional_aggregators_golden(ray_session):
    """unittests_temporal_conditionals.py:281-320 (conditions 8, 9):
    explicit match aggregators in the boolean qualifier —
    {||,over,|} keeps both B maps, {&&,over,&} keeps only b1 (the
    reference's B = 2-day maps from Jan 1 on a worigin-shifted grid,
    E = 2-day maps from Dec 31).  NULL result windows are the engine's
    form of the reference's unregistered maps."""
    import math

    import ray.data

    from grass_ray.stages.algebra import algebra

    def nested_o(rows, gran, worigin=None):
        t = nested(rows, gran=gran)
        if worigin is not None:
            t = t.append_column(
                "worigin", pa.array([worigin] * t.num_rows, type=pa.int64())
            )
        return t

    b = ray.data.from_arrow(
        nested_o([("s", "d1", [5661, 5662], [5.0, 6.0])], 172800, worigin=86400)
    )
    e = ray.data.from_arrow(
        nested_o([("s", "d1", [5661, 5662, 5663], [11.0, 12.0, 13.0])], 172800)
    )

    def run(expr):
        _nm, out = algebra(expr, {"B": b, "E": e})
        df = out.to_pandas()
        assert len(df) == 1
        return {
            w: (None if (isinstance(v, float) and math.isnan(v)) else v)
            for w, v in zip(df.iloc[0]["windows"], df.iloc[0]["average"])
        }

    got8 = run(
        'R = if(start_date(B) <= "2001-01-01" {||,over,|} td(E) == 172800, B)'
    )
    assert {w: v for w, v in got8.items() if v is not None} == {
        5661: 5.0, 5662: 6.0
    }
    got9 = run(
        'R = if(start_date(B) <= "2001-01-01" {&&,over,&} td(E) == 172800, B)'
    )
    assert {w: v for w, v in got9.items() if v is not None} == {5661: 5.0}


def test_mixed_worigin_raises(ray_session):
    """Aligned algebra over operands on different window grids is a
    silent-corruption hazard — it must raise."""
    import ray.data

    from grass_ray.stages.algebra import tier_expr

    a = ray.data.from_arrow(nested([("s", "d1", [0, 1], [1.0, 2.0])], gran=60))
    t2 = nested([("s", "d1", [0, 1], [3.0, 4.0])], gran=60)
    t2 = t2.append_column(
        "worigin", pa.array([30] * t2.num_rows, type=pa.int64())
    )
    b = ray.data.from_arrow(t2)
    with pytest.raises(Exception, match="worigin|grid"):
        tier_expr("A + B", {"A": a, "B": b}).materialize()


def test_reference_if_else_relation_golden(ray_session):
    """unittests_temporal_raster_algebra.py:155-176: the relation-
    qualified conditional WITH else —
    ``if({contains}, B == 5, A - 1, A + 1)`` routes each A day through
    the condition granule that CONTAINS it: days under b1 (TRUE) take
    A-1, days under b2 (FALSE) take A+1 → values 0,1,4,5."""
    import ray.data

    from grass_ray.stages.algebra import algebra

    def nested_o(rows, gran, worigin=None):
        t = nested(rows, gran=gran)
        if worigin is not None:
            t = t.append_column(
                "worigin", pa.array([worigin] * t.num_rows, type=pa.int64())
            )
        return t

    day0 = 11323
    a = ray.data.from_arrow(
        nested_o(
            [("s", "d1", [day0 + i for i in range(4)], [1.0, 2.0, 3.0, 4.0])],
            86400,
        )
    )
    b = ray.data.from_arrow(
        nested_o([("s", "d1", [5661, 5662], [5.0, 6.0])], 172800, worigin=86400)
    )
    _nm, out = algebra(
        "R = if({contains}, B == 5,  A - 1,  A + 1)", {"A": a, "B": b}
    )
    df = out.to_pandas()
    assert len(df) == 1
    assert list(df.iloc[0]["windows"]) == [day0, day0 + 1, day0 + 2, day0 + 3]
    assert list(df.iloc[0]["average"]) == [0.0, 1.0, 4.0, 5.0]


def test_reference_map_tmap_spatial_index(tiers, ray_session):
    """unittests_temporal_raster_algebra.py:598-661: tmap() lifts a
    single registered map, map() broadcasts a time-constant map over
    the other operand's windows, and the spatial index form
    A[0,0,k] is the temporal A[k] (nonzero spatial offsets raise)."""
    import ray.data

    from grass_ray.stages.algebra import algebra

    # A[0,0,-1] + A[0,0,1] == A[-1] + A[1]: 2 maps, 4 and 6
    _, res = algebra("R = A[0,0,-1] + A[0,0,1]", dict(tiers))
    w, v = _vals(res)
    assert w == [1, 2] and v == [4.0, 6.0]
    with pytest.raises(NotImplementedError):
        algebra("R = A[1,0,-1] + A[0,0,1]", dict(tiers))

    single = ray.data.from_arrow(nested([("s", "d1", [0], [99.0])]))
    t2 = dict(tiers)
    t2["S"] = single
    # tmap(S) is the tier itself; +1 gives 100 (testsuite line 632-644)
    _, res = algebra("R = tmap(S) + 1", t2)
    w, v = _vals(res)
    assert w == [0] and v == [100.0]
    # map(M) + A broadcasts: 4 maps 101..104 (testsuite line 649-661)
    t3 = dict(tiers)
    t3["M"] = ray.data.from_arrow(nested([("s", "d1", [0], [100.0])]))
    _, res = algebra("R = map(M) + A", t3)
    w, v = _vals(res)
    assert w == [0, 1, 2, 3] and v == [101.0, 102.0, 103.0, 104.0]


def test_if_relation_review_fixes(ray_session):
    """Review regressions pinned: (a) {before}/{after} invert like
    every other relation (cond BEFORE then selects then-granules AFTER
    the true interval); (b) a qualifier inside the condition of
    if({rel},...) parses (the {op,rel} comma is not an argument
    separator); (c) merging then/else tiers on different window grids
    raises instead of silently relocating granules."""
    import ray.data

    from grass_ray.stages.algebra import algebra, tier_expr

    day = 86400
    # cond TRUE on day 5660; then-tier has days before AND after it
    b = ray.data.from_arrow(nested([("s", "d1", [5660], [5.0])], gran=day))
    t = ray.data.from_arrow(
        nested(
            [("s", "d1", [5657, 5658, 5662, 5663], [1.0, 2.0, 3.0, 4.0])],
            gran=day,
        )
    )
    _nm, out = algebra("R = if({before}, B == 5, T)", {"B": b, "T": t})
    df = out.to_pandas()
    assert len(df) == 1 and list(df.iloc[0]["windows"]) == [5662, 5663]

    # (b): qualifier inside the condition, evaluated via tier_expr
    # directly (the path that runs _rewrite_if_topo first)
    a = ray.data.from_arrow(
        nested([("s", "d1", [11323 + i for i in range(4)],
                 [1.0, 2.0, 3.0, 4.0])], gran=day)
    )
    c = ray.data.from_arrow(nested([("s", "d1", [5662], [7.0])], gran=2 * day))
    out2 = tier_expr(
        'if({over},start_date(C) == "2001-01-02" {&&,contains} td(A) == 86400, B)',
        {"A": a, "B": ray.data.from_arrow(
            nested([("s", "d1", [5661, 5662], [5.0, 6.0])], gran=2 * day)
        ), "C": c},
    )
    out2.materialize()  # must parse and evaluate without error

    # (c): then/else selections landing on DIFFERENT grids raise loudly
    # cond: b1 (2-day, TRUE) and b2 (2-day, FALSE); then = 1-day days
    # during b1, else = the 2-day granule equal to b2
    b2 = ray.data.from_arrow(
        nested([("s", "d1", [5661, 5662], [5.0, 7.0])], gran=2 * day)
    )
    t2 = ray.data.from_arrow(
        nested([("s", "d1", [11322, 11323], [1.0, 2.0])], gran=day)
    )
    e2 = ray.data.from_arrow(nested([("s", "d1", [5662], [9.0])], gran=2 * day))
    with pytest.raises(Exception, match="gran|grid"):
        _n, bad = algebra(
            "R = if({contains|equal}, B == 5, T, E)",
            {"B": b2, "T": t2, "E": e2},
        )
        bad.materialize()


def test_mapcalc_function_vocabulary(ray_session):
    # the raster lexer's full mapcalc_functions set evaluates in both
    # the mapcalc kernel and the algebra expression evaluator
    import numpy as np
    import ray.data

    from grass_ray.stages.algebra import algebra
    from grass_ray.stages.extract import mapcalc_expr

    # r.mapcalc trig is degree-based: sin(90)=1, tan(45)=1,
    # acos(0)=90; sin^2+cos^2 stays 1 in any unit
    fn = mapcalc_expr(
        "int(tan(x)) + float(cos(x) * cos(x) + sin(x) * sin(x))"
    )
    out = fn(np.array([0.0, 45.0, 60.0]))
    assert np.allclose(out, [1.0, 2.0, 2.0])
    fn2 = mapcalc_expr("sin(x) + acos(0.0)")
    assert np.allclose(fn2(np.array([90.0])), [91.0])

    def tier(vals):
        return ray.data.from_arrow(
            pa.table(
                {
                    "source": ["s"],
                    "doc_id": ["d"],
                    "gran": pa.array([60], type=pa.int64()),
                    "windows": pa.array(
                        [list(range(len(vals)))], type=pa.list_(pa.int64())
                    ),
                    "average": pa.array(
                        [[float(v) for v in vals]], type=pa.list_(pa.float64())
                    ),
                }
            )
        )

    _n, out = algebra(
        "R = int(A) + double(sin(A) * sin(A) + cos(A) * cos(A))",
        {"A": tier([0.5, 1.9, -2.7])},
    )
    t = out.to_pandas()
    assert np.allclose(list(t["average"].tolist()[0]), [1.0, 2.0, -1.0])
    _n, out = algebra("R = sin(A)", {"A": tier([90.0, 30.0])})
    t = out.to_pandas()
    assert np.allclose(list(t["average"].tolist()[0]), [1.0, 0.5])
