"""Topology-qualified algebra: A {op, relation[, side]} B across
granularities (temporal_raster_base_algebra.py topology-list semantics:
successive operator application over matching granules).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from grass_ray.stages.algebra import algebra, algebra_program, tier_topo


def _tier(gran, windows, values):
    return ray.data.from_arrow(
        pa.table(
            {
                "source": ["s"],
                "doc_id": ["d1"],
                "gran": pa.array([gran], type=pa.int64()),
                "windows": pa.array([windows], type=pa.list_(pa.int64())),
                "average": pa.array([values], type=pa.list_(pa.float64())),
            }
        )
    )


@pytest.fixture()
def ab(ray_session):
    # A: 6 minute-windows over [0, 360); B: two 3-minute windows
    a = _tier(60, [0, 1, 2, 3, 4, 5], [10.0, 20.0, 30.0, 40.0, 50.0, 60.0])
    b = _tier(180, [0, 1], [100.0, 200.0])
    return a, b


def _vals(out, col="average"):
    t = out.to_pandas()
    got = {}
    for _, r in t.iterrows():
        got.update(dict(zip(r["windows"], r[col])))
    return got


def test_topo_plus_during(ab):
    # the algebra front end expands `during` to the reference builder's
    # inclusive list during|starts|finishes
    # (spatio_temporal_relationships.py:625-655) — full cover here
    a, b = ab
    _n, out = algebra("C = A {+, during} B", {"A": a, "B": b})
    assert _vals(out) == {0: 110.0, 1: 120.0, 2: 130.0, 3: 240.0, 4: 250.0, 5: 260.0}


def test_topo_strict_during_via_tier_topo(ab):
    # direct tier_topo keeps the STRICT Allen predicates (the engine's
    # relation primitives, mirror of functions/topology.py)
    a, b = ab
    out = tier_topo(a, b, "+", ["during"])
    assert _vals(out) == {1: 120.0, 4: 250.0}


def test_topo_plus_full_cover(ab):
    a, b = ab
    _n, out = algebra("C = A {+, starts|during|finishes} B", {"A": a, "B": b})
    assert _vals(out) == {0: 110.0, 1: 120.0, 2: 130.0, 3: 240.0, 4: 250.0, 5: 260.0}


def test_topo_contains_reversed(ab):
    a, b = ab
    # `contains` expands to started|contains|finished at the algebra
    # level; the strict primitive stays available via tier_topo
    _n, out = algebra("C = B {+, contains} A", {"A": a, "B": b})
    assert _vals(out) == {0: 160.0, 1: 350.0}
    out = tier_topo(b, a, "+", ["contains"])
    assert _vals(out) == {0: 120.0, 1: 250.0}
    _n, out = algebra("C = B {+, started|contains|finished} A", {"A": a, "B": b})
    assert _vals(out) == {0: 160.0, 1: 350.0}


def test_topo_hash_counts(ab):
    a, b = ab
    _n, out = algebra("C = B {#, started|contains|finished} A", {"A": a, "B": b})
    assert _vals(out, "hash_count") == {0: 3, 1: 3}
    _n, out = algebra("C = A {#, during} B", {"A": a, "B": b})
    assert _vals(out, "hash_count") == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1}
    out = tier_topo(a, b, "#", ["during"])
    assert _vals(out, "hash_count") == {0: 0, 1: 1, 2: 0, 3: 0, 4: 1, 5: 0}


def test_topo_selection(ab):
    a, b = ab
    _n, out = algebra("C = A {:, starts} B", {"A": a, "B": b})
    assert _vals(out) == {0: 10.0, 3: 40.0}
    _n, out = algebra("C = A {!:, starts|during|finishes} B", {"A": a, "B": b})
    assert _vals(out) == {}


def test_topo_product_and_division(ab):
    a, b = ab
    out = tier_topo(a, b, "*", ["during"])
    assert _vals(out) == {1: 2000.0, 4: 10000.0}
    out = tier_topo(a, b, "/", ["during"])
    assert _vals(out) == {1: 0.2, 4: 0.25}


def test_topo_null_propagates(ray_session):
    a = _tier(60, [0, 1, 2], [10.0, None, 30.0])
    b = _tier(180, [0], [100.0])
    out = tier_topo(a, b, "+", ["starts", "during", "finishes"])
    got = _vals(out)
    assert got[0] == 110.0 and got[2] == 130.0
    assert got[1] is None or np.isnan(got[1])


def test_topo_missing_operand_key(ray_session):
    a = _tier(60, [0, 1], [1.0, 2.0])
    b_other = ray.data.from_arrow(
        pa.table(
            {
                "source": ["s"],
                "doc_id": ["d2"],  # different key: no match for d1
                "gran": pa.array([180], type=pa.int64()),
                "windows": pa.array([[0]], type=pa.list_(pa.int64())),
                "average": pa.array([[9.0]], type=pa.list_(pa.float64())),
            }
        )
    )
    _n, out = algebra("C = A {+, during} B", {"A": a, "B": b_other})
    assert out.count() == 0
    # anti-selection keeps keys with no B row at all
    _n, out = algebra("C = A {!:, during} B", {"A": a, "B": b_other})
    assert _vals(out) == {0: 1.0, 1: 2.0}


def test_topo_side_modifier_r(ab):
    # side 'r': result granules take the (last) matched B extent —
    # nested output on B's grid (temporal_operator.py 'r' semantics)
    a, b = ab
    _n, out = algebra("C = A {+, during, r} B", {"A": a, "B": b})
    t = out.to_pandas()
    assert t["gran"].tolist() == [180]
    # six A windows fold, landing on their B window (duplicates kept)
    w = t["windows"].tolist()[0]
    v = t["average"].tolist()[0]
    assert sorted(zip(w, v)) == [
        (0, 110.0), (0, 120.0), (0, 130.0),
        (1, 240.0), (1, 250.0), (1, 260.0),
    ]


def test_topo_side_modifier_flat_intersection(ab):
    # side 'i': flat interval rows (start, end, value) in position
    # units — for A during B the intersection is A's own extent
    a, b = ab
    _n, out = algebra("C = A {+, during, i} B", {"A": a, "B": b})
    t = out.to_pandas().sort_values("start").reset_index(drop=True)
    assert t["start"].tolist() == [0, 60, 120, 180, 240, 300]
    assert t["end"].tolist() == [60, 120, 180, 240, 300, 360]
    assert t["average"].tolist() == [110.0, 120.0, 130.0, 240.0, 250.0, 260.0]


def test_topo_side_modifier_union(ray_session):
    # overlapping granules with a union side: min start / max end
    # (disjoint pairs leave the extent unchanged — union returns None)
    a = _tier(180, [0], [5.0])
    b = ray.data.from_arrow(
        pa.table(
            {
                "source": ["s"],
                "doc_id": ["d1"],
                "gran": pa.array([180], type=pa.int64()),
                "worigin": pa.array([90], type=pa.int64()),
                "windows": pa.array([[0]], type=pa.list_(pa.int64())),
                "average": pa.array([[7.0]], type=pa.list_(pa.float64())),
            }
        )
    )
    _n, out = algebra("C = A {+, overlaps, u} B", {"A": a, "B": b})
    t = out.to_pandas()
    assert t["start"].tolist() == [0]
    assert t["end"].tolist() == [270]
    assert t["average"].tolist() == [12.0]


def test_equal_relation_still_inline(ab):
    a, _b = ab
    # {op, equal} stays on the aligned fast path (no topo split)
    _n, out = algebra("C = A {+, equal} A", {"A": a})
    assert _vals(out) == {0: 20.0, 1: 40.0, 2: 60.0, 3: 80.0, 4: 100.0, 5: 120.0}


def test_algebra_program_bindings(ab):
    from grass_ray.stages.algebra import algebra_program

    a, b = ab
    env, last = algebra_program(
        """
        C = A {+, starts|during|finishes} B
        D = C * 2
        """,
        {"A": a, "B": b},
    )
    assert set(env) >= {"A", "B", "C", "D"}
    got = _vals(last)
    assert got == {0: 220.0, 1: 240.0, 2: 260.0, 3: 480.0, 4: 500.0, 5: 520.0}


def test_algebra_program_semicolons(ab):
    from grass_ray.stages.algebra import algebra_program

    a, _b = ab
    env, last = algebra_program("X = A + A; Y = X - A", {"A": a})
    assert _vals(last) == {0: 10.0, 1: 20.0, 2: 30.0, 3: 40.0, 4: 50.0, 5: 60.0}


def test_topo_hash_missing_operand_counts_zero(ray_session):
    a = _tier(60, [0, 1], [1.0, 2.0])
    b_other = ray.data.from_arrow(
        pa.table(
            {
                "source": ["s"],
                "doc_id": ["d2"],
                "gran": pa.array([180], type=pa.int64()),
                "windows": pa.array([[0]], type=pa.list_(pa.int64())),
                "average": pa.array([[9.0]], type=pa.list_(pa.float64())),
            }
        )
    )
    _n, out = algebra("C = A {#, during} B", {"A": a, "B": b_other})
    assert _vals(out, "hash_count") == {0: 0, 1: 0}


# ---------------------------------------------------------------------------
# reference-testsuite goldens
# (unittests_temporal_raster_algebra.py map layout: A = a1..a4 (1,2,3,4)
# on days 1..4, B = b1,b2 (5,6) on 2-day granules, C = c1 (7) covering
# [Jan2,Jan4) — a worigin=1 offset on the 2-day grid, D = d1..d3 on
# days 3..5.  Position unit = 1 day, Jan1 = 0.)
# ---------------------------------------------------------------------------


@pytest.fixture()
def ref_maps(ray_session):
    def mk(gran, windows, values, origin=0):
        cols = {
            "source": ["s"],
            "doc_id": ["d1"],
            "gran": pa.array([gran], type=pa.int64()),
            "windows": pa.array([windows], type=pa.list_(pa.int64())),
            "average": pa.array([values], type=pa.list_(pa.float64())),
        }
        if origin:
            cols["worigin"] = pa.array([origin], type=pa.int64())
        return ray.data.from_arrow(pa.table(cols))

    return {
        "A": mk(1, [0, 1, 2, 3], [1.0, 2.0, 3.0, 4.0]),
        "B": mk(2, [0, 1], [5.0, 6.0]),
        "C": mk(2, [0], [7.0], origin=1),
        "D": mk(1, [2, 3, 4], [8.0, 9.0, 10.0]),
    }


def _flat(out):
    t = out.to_pandas().sort_values("start").reset_index(drop=True)
    return list(zip(t["start"], t["end"], t["average"]))


def test_ref_intersection_2(ref_maps):
    # R = A {+,during,i} B -> 4 maps, 6..10 (testsuite:479-491)
    _n, out = algebra("R = A {+,during,i} B", ref_maps)
    assert _flat(out) == [(0, 1, 6.0), (1, 2, 7.0), (2, 3, 9.0), (3, 4, 10.0)]


def test_ref_intersection_3_4_5(ref_maps):
    # R = A {+,starts,i} B -> 2 maps 6, 9 (testsuite:493-505)
    _n, out = algebra("R = A {+,starts,i} B", ref_maps)
    assert _flat(out) == [(0, 1, 6.0), (2, 3, 9.0)]
    # R = A {+,finishes,intersect} B -> 2 maps 7, 10 (testsuite:507-521)
    _n, out = algebra("R = A {+,finishes,intersect} B", ref_maps)
    assert _flat(out) == [(1, 2, 7.0), (3, 4, 10.0)]
    # R = A {+,starts|finishes,i} B -> 4 maps 6..10 (testsuite:523-537)
    _n, out = algebra("R = A {+,starts|finishes,i} B", ref_maps)
    assert _flat(out) == [(0, 1, 6.0), (1, 2, 7.0), (2, 3, 9.0), (3, 4, 10.0)]


def test_ref_intersection_6_7_union(ref_maps):
    # R = B {+,overlaps,u} C -> 1 map 12 on [Jan1,Jan4) (testsuite:539-551)
    _n, out = algebra("R = B {+,overlaps,u} C", ref_maps)
    assert _flat(out) == [(0, 3, 12.0)]
    # R = B {+,overlapped,u} C -> 1 map 13 on [Jan2,Jan5) (testsuite:553-565)
    _n, out = algebra("R = B {+,overlapped,u} C", ref_maps)
    assert _flat(out) == [(1, 4, 13.0)]


def test_ref_temporal_extent1(ref_maps):
    # R = A {:,during,r} C -> 2 maps (2, 3), both on C's [Jan2,Jan4)
    # extent, granularity 2 days, topology check False (testsuite:131-154)
    _n, out = algebra("R = A {:,during,r} C", ref_maps)
    t = out.to_pandas()
    assert t["gran"].tolist() == [2]
    assert t["worigin"].tolist() == [1]
    w = list(t["windows"].tolist()[0])
    v = list(t["average"].tolist()[0])
    assert w == [0, 0] and sorted(v) == [2.0, 3.0]


def test_ref_simple_arith_2_empty(ref_maps):
    # R = A {*,during} A {+,during} A -> empty strds (testsuite:448-456)
    _n, out = algebra("R = A {*, during} A {+, during} A", ref_maps)
    assert out.count() == 0


def test_ref_complex_arith_if(ref_maps):
    # R = if(start_time(A) < 2 && A # A == 1, A{+,starts,l}C, A{+,finishes,l}C)
    # -> 2 maps: 9 = a2+c1 on [Jan2,Jan3), 10 = a3+c1 on [Jan3,Jan4)
    # (testsuite:403-430; start_date < "2001-01-03" == start pos < 2)
    _n, out = algebra(
        "R = if(start_time(A) < 2 && A # A == 1, A{+, starts,l}C, A{+, finishes,l}C)",
        ref_maps,
    )
    t = out.to_pandas()
    assert len(t) == 1
    got = dict(zip(t["windows"].tolist()[0], t["average"].tolist()[0]))
    assert got == {1: 9.0, 2: 10.0}


def test_topo_hash_side_modifier_discarded(ab):
    # p_t_hash2 (temporal_algebra.py:2726-2741) evaluates only the
    # relation list of a hash qualifier; the side modifier is parsed
    # but discarded, so {#,rel,r} == {#,rel,l} == {#,rel}.
    a, b = ab
    base = algebra("C = B {#, started|contains|finished} A", {"A": a, "B": b})[1]
    for side in ("l", "r", "u", "d", "i"):
        _n, out = algebra(
            "C = B {#, started|contains|finished, %s} A" % side,
            {"A": a, "B": b},
        )
        assert _vals(out, "hash_count") == _vals(base, "hash_count")


def test_topo_unknown_side_rejected_in_expression(ab):
    # typo'd side tokens must error in NESTED qualifiers too, not be
    # silently swallowed by the '#' side-discard coercion
    a, b = ab
    import pytest

    with pytest.raises(ValueError, match="side modifier"):
        algebra("C = (B {#, contains, rihgt} A) + A", {"A": a, "B": b})


def test_ref_equal_ts_implicit_aggregation(ray_session):
    # reference testsuite/unittests_temporal_raster_algebra_equal_ts.py:
    # four maps registered at the SAME instant; R = A + A implicitly
    # aggregates — r_i = a_i + (a1+a2+a3+a4) = 11,12,13,14
    def eqtier(vals):
        return ray.data.from_arrow(
            pa.table(
                {
                    "source": ["s"],
                    "doc_id": ["d"],
                    "gran": pa.array([60], type=pa.int64()),
                    "windows": pa.array(
                        [[0] * len(vals)], type=pa.list_(pa.int64())
                    ),
                    "average": pa.array(
                        [[float(v) for v in vals]],
                        type=pa.list_(pa.float64()),
                    ),
                }
            )
        )

    a = eqtier([1, 2, 3, 4])
    for expr in ("R = A + A", "R = A {+, equal, l} A"):
        _n, out = algebra(expr, {"A": a})
        t = out.to_pandas()
        assert list(t["windows"].tolist()[0]) == [0, 0, 0, 0], expr
        assert list(t["average"].tolist()[0]) == [11.0, 12.0, 13.0, 14.0], expr

    # single equal-time map against the aggregate:
    # tmap {+,equal,l} A -> 100 + 10 = 110 for each of the 4 maps
    single = eqtier([100])
    _n, out = algebra("R = S + A", {"S": single, "A": a})
    t = out.to_pandas()
    assert list(t["average"].tolist()[0]) == [110.0]
    # A + S: each a_i + 100
    _n, out = algebra("R = A + S", {"A": a, "S": single})
    t = out.to_pandas()
    assert list(t["average"].tolist()[0]) == [101.0, 102.0, 103.0, 104.0]
    # non-reducible op folds successively per occurrence
    _n, out = algebra("R = A % S", {"A": a, "S": single})
    t = out.to_pandas()
    assert list(t["average"].tolist()[0]) == [1.0, 2.0, 3.0, 4.0]
    # conditionals over equal-ts operands pair per OCCURRENCE when the
    # branch layout matches the condition (if(A>0, A) is per-map)
    _n, out = algebra("R = if(A > 1, A)", {"A": a})
    t = out.to_pandas()
    got = t["average"].tolist()[0]
    # spatial if keeps the false occurrence as NULL (r.mapcalc
    # semantics); the true branch pairs per occurrence
    assert np.isnan(got[0]) and list(got[1:]) == [2.0, 3.0, 4.0]
    # dup-window series combined with an empty sub-result: empty, not
    # an IndexError
    _n, out = algebra("R = A + (A - tshift(A, 1000))", {"A": a})
    assert out.count() == 0 or all(
        len(w) == 0 for w in out.to_pandas()["windows"].tolist()
    )


def test_ref_merge_function(ab):
    # reference p_t_merge: merge(A,D) = maplistA + maplistB (plain
    # concatenation, duplicates allowed); merge composes with
    # qualified sub-expressions (unittests_temporal_algebra.py
    # test_temporal_select_operators / merge tests)
    def tier(windows, vals):
        return ray.data.from_arrow(
            pa.table(
                {
                    "source": ["s"],
                    "doc_id": ["d"],
                    "gran": pa.array([60], type=pa.int64()),
                    "windows": pa.array([windows], type=pa.list_(pa.int64())),
                    "average": pa.array(
                        [[float(v) for v in vals]], type=pa.list_(pa.float64())
                    ),
                }
            )
        )

    a = tier([0, 1, 2, 3], [1, 2, 3, 4])
    d = tier([1, 2], [8, 9])
    _n, out = algebra("R = merge(A, D)", {"A": a, "D": d})
    t = out.to_pandas()
    assert list(t["windows"].tolist()[0]) == [0, 1, 1, 2, 2, 3]
    assert list(t["average"].tolist()[0]) == [1.0, 2.0, 8.0, 3.0, 9.0, 4.0]
    # merge with a qualified sub-expression: at equal granularity no
    # B granule has a (started|contains|finished) match, so !: keeps
    # both and merge interleaves them with A (duplicates allowed)
    b = tier([0, 2], [40, 50])
    _n, out = algebra("R = merge(A, B {!:,contains} A)", {"A": a, "B": b})
    t = out.to_pandas()
    assert list(t["windows"].tolist()[0]) == [0, 0, 1, 2, 2, 3]
    assert list(t["average"].tolist()[0]) == [1.0, 40.0, 2.0, 3.0, 50.0, 4.0]


def test_ref_select_side_modifiers(ray_session):
    # reference unittests_temporal_algebra test_temporal_select_operators
    # 1/4/5/6: A = daily maps 1..4 (days 0..3), C = one 2-day granule
    # covering days [1,3); during-selection with sides l/r/d/u
    def tier(windows, vals, gran, worigin=None):
        cols = {
            "source": ["s"],
            "doc_id": ["d"],
            "gran": pa.array([gran], type=pa.int64()),
            "windows": pa.array([windows], type=pa.list_(pa.int64())),
            "average": pa.array(
                [[float(v) for v in vals]], type=pa.list_(pa.float64())
            ),
        }
        if worigin is not None:
            cols["worigin"] = pa.array([worigin], type=pa.int64())
        return ray.data.from_arrow(pa.table(cols))

    a = tier([0, 1, 2, 3], [1, 2, 3, 4], 1)
    c = tier([0], [7], 2, worigin=1)
    # side l (default): a2,a3 keep their own daily extents
    _n, out = algebra("R = A {:,during} C", {"A": a, "C": c})
    t = out.to_pandas()
    assert list(t["windows"].tolist()[0]) == [1, 2]
    assert list(t["average"].tolist()[0]) == [2.0, 3.0]
    # side r: results take C's extent -> duplicate windows on C's grid
    # (reference: both maps Jan2-Jan4, topology check False)
    _n, out = algebra("R = A {:,during,r} C", {"A": a, "C": c})
    t = out.to_pandas()
    assert int(t["gran"][0]) == 2 and int(t["worigin"][0]) == 1
    assert list(t["windows"].tolist()[0]) == [0, 0]
    assert list(t["average"].tolist()[0]) == [2.0, 3.0]
    # sides d/u: flat interval rows, both spanning [1,3)
    for side in ("d", "u"):
        _n, out = algebra(
            "R = A {:,during,%s} C" % side, {"A": a, "C": c}
        )
        t = out.to_pandas().sort_values("average")
        assert t["start"].tolist() == [1, 1]
        assert t["end"].tolist() == [3, 3]
        assert t["average"].tolist() == [2.0, 3.0]


def test_ref_mixed_stds_type_casts(ab):
    # unittests_temporal_algebra_mixed_stds: stvds()/str3ds()/strds()
    # are parser type casts — identity over the engine's single tier
    # type; mixed-type expressions parse and evaluate verbatim
    a, b = ab
    base = algebra("C = A {:, during} B", {"A": a, "B": b})[1]
    for cast in ("stvds", "str3ds", "strds"):
        _n, out = algebra(
            "C = A {:, during} %s(B)" % cast, {"A": a, "B": b}
        )
        assert _vals(out) == _vals(base), cast
    _n, out = algebra(
        "C = if(A {#, during} stvds(B) == 1, A)", {"A": a, "B": b}
    )
    base2 = algebra("C = if(A {#, during} B == 1, A)", {"A": a, "B": b})[1]
    assert _vals(out) == _vals(base2)


def test_equal_ts_successive_fold_ops(ab):
    # the non-reducible dup-fold branch (**, comparisons) folds
    # successively per occurrence: a ** b then the result ** next b...
    def eqtier(windows, vals):
        return ray.data.from_arrow(
            pa.table(
                {
                    "source": ["s"],
                    "doc_id": ["d"],
                    "gran": pa.array([60], type=pa.int64()),
                    "windows": pa.array([windows], type=pa.list_(pa.int64())),
                    "average": pa.array(
                        [[float(v) for v in vals]], type=pa.list_(pa.float64())
                    ),
                }
            )
        )

    a = eqtier([0, 0], [2.0, 3.0])
    b = eqtier([0, 0], [2.0, 1.0])
    # per left occurrence: ((x ** 2) ** 1) = x^2
    _n, out = algebra("R = A ** B", {"A": a, "B": b})
    t = out.to_pandas()
    assert list(t["average"].tolist()[0]) == [4.0, 9.0]
    # comparison fold: (2 > 2)=0, (0 > 1)=0; (3 > 2)=1, (1 > 1)=0
    _n, out = algebra("R = A > B", {"A": a, "B": b})
    t = out.to_pandas()
    assert list(t["average"].tolist()[0]) == [0.0, 0.0]


def test_nested_udi_ragged(ref_maps):
    """u/d/i side modifiers NESTED inside expressions (round-4): the
    synthetic tier is RAGGED (explicit per-window extents); further
    qualified ops match on those extents, aligned arithmetic
    grid-projects them exactly (the reference's {op,equal,l} default
    for plain operators).  Expectations hand-derived from the
    reference's extent semantics (temporal_operator.py:1-120,
    temporal_extent.py:91-140) over the testsuite fixture tiers."""

    def vals(out, col="average"):
        t = out.to_pandas()
        got = {}
        for _, r in t.iterrows():
            got.update(dict(zip(r["windows"], r[col])))
        return got

    # inner union: b1(5)+c1(7)=12 on [0,3); A granules starts/during/
    # finishes that extent -> 1+12, 2+12, 3+12 on A's grid
    _n, out = algebra("R = A {+,during} (B {+,overlaps,u} C)", dict(ref_maps))
    assert vals(out) == {0: 13.0, 1: 14.0, 2: 15.0}
    # ragged LEFT operand of a hash: [0,3) started/contains/finished
    # covers A granules 0,1,2
    _n, out = algebra("R = (B {+,overlaps,u} C) {#,contains} A", dict(ref_maps))
    assert vals(out, "hash_count") == {0: 3}
    # equal-union extents coincide with B's own grid -> exact remap:
    # aligned arithmetic sees w0=10, w1=12
    _n, out = algebra("R = B + (B {+,equal,u} B)", dict(ref_maps))
    assert vals(out) == {0: 15.0, 1: 18.0}
    # off-grid union extent [0,3) can never EQUAL a gran-2 granule ->
    # aligned intersection is empty (reference: equal-match finds none)
    _n, out = algebra("R = B + (B {+,overlaps,u} C)", dict(ref_maps))
    assert out.count() == 0


def test_all_ragged_extent_alignment(ref_maps):
    """Aligned arithmetic where EVERY operand is ragged (round-4
    closing corner): matching switches from grid projection to
    extent-keyed alignment — two coincident OFF-grid extents match
    (the reference's equal-extent rule for plain {op,equal,l}
    operators, temporal_algebra.py), non-coincident extents drop, and
    the result STAYS ragged so it can feed further topology."""

    def rag(out):
        t = out.to_pandas()
        got = []
        for _, r in t.iterrows():
            got += list(zip(r["wstarts"], r["wends"], r["average"]))
        return sorted(got)

    # coincident off-grid extents: (B{+,overlaps,u}C) is one ragged
    # granule [0,3)=12; adding it to itself doubles it in place —
    # the grid projection would have emptied both sides
    _n, out = algebra(
        "R = (B {+,overlaps,u} C) + (B {+,overlaps,u} C)", dict(ref_maps)
    )
    t = out.to_pandas()
    assert "wstarts" in t.columns  # result is itself ragged
    assert rag(out) == [(0, 3, 24.0)]
    # non-coincident ragged extents never align: [0,2)/[2,4) (equal-
    # union of B with itself) vs [0,3) -> empty intersection
    _n, out = algebra(
        "R = (B {+,equal,u} B) + (B {+,overlaps,u} C)", dict(ref_maps)
    )
    assert out.count() == 0
    # on-grid coincident extents via the ragged path match themselves
    _n, out = algebra(
        "R = (B {+,equal,u} B) * (B {+,equal,u} B)", dict(ref_maps)
    )
    assert rag(out) == [(0, 2, 100.0), (2, 4, 144.0)]
    # the ragged result feeds FURTHER topology: A granules 0,1,2 sit
    # inside [0,3) (starts/during/finishes) -> 1+24, 2+24, 3+24
    prog = (
        "S = (B {+,overlaps,u} C) + (B {+,overlaps,u} C)\n"
        "R = A {+,during} S"
    )
    env, out = algebra_program(prog, dict(ref_maps))
    t = out.to_pandas()
    got = dict(zip(t["windows"].tolist()[0], t["average"].tolist()[0]))
    assert got == {0: 25.0, 1: 26.0, 2: 27.0}
    # a MIX of ragged and grid operands keeps the exact grid
    # projection (an off-grid extent can never equal a grid granule)
    _n, out = algebra("R = B + (B {+,overlaps,u} C)", dict(ref_maps))
    assert out.count() == 0


def test_lazy_ragged_chaining_single_statement(ref_maps):
    """Regression (r4 review finding): ragged PRODUCERS must
    materialize, or the no-execution raggedness probes classify a lazy
    ragged dataset as a grid tier and silently drop/relocate extents.
    The one-statement form routes the ragged arithmetic sub-expression
    straight into a further topology qualifier with no explicit
    materialization anywhere."""
    from grass_ray.stages.algebra import tier_expr

    # S = [0,3)=24 (ragged); S {+,contains} A folds A granules
    # [0,1),[1,2),[2,3) (started/contains/finished) -> 24+1+2+3 = 30
    # on S's OWN ragged extent [0,3)
    _n, out = algebra(
        "R = ((B {+,overlaps,u} C) + (B {+,overlaps,u} C)) {+,contains} A",
        dict(ref_maps),
    )
    t = out.to_pandas()
    assert "wstarts" in t.columns  # the extent survived the chain
    assert list(zip(t["wstarts"][0], t["wends"][0], t["average"][0])) == [
        (0, 3, 30.0)
    ]
    # the explicit two-statement program form must agree
    prog = (
        "S = (B {+,overlaps,u} C) + (B {+,overlaps,u} C)\n"
        "R = S {+,contains} A"
    )
    _env, out2 = algebra_program(prog, dict(ref_maps))
    t2 = out2.to_pandas()
    assert list(zip(t2["wstarts"][0], t2["wends"][0], t2["average"][0])) == [
        (0, 3, 30.0)
    ]
    # direct API: a tier_expr extent-mode result feeds another
    # tier_expr without the caller materializing
    tiers = dict(ref_maps)
    _n, s = algebra("S = (B {+,overlaps,u} C) + (B {+,overlaps,u} C)", tiers)
    out3 = tier_expr("S + S", {"S": s})
    t3 = out3.to_pandas()
    assert list(zip(t3["wstarts"][0], t3["wends"][0], t3["average"][0])) == [
        (0, 3, 48.0)
    ]


def test_if_else_merge_ragged(ref_maps):
    """Relation-qualified if-ELSE over two RAGGED sides (the last
    _merge_nested guard, removed r4): the merge keys on extents —
    then-side wins a COINCIDENT extent, non-coincident extents of both
    sides pass through, output stays ragged.  Ragged/grid mixes still
    raise."""

    def rag(out):
        t = out.to_pandas()
        got = []
        for _, r in t.iterrows():
            got += list(zip(r["wstarts"], r["wends"], r["average"]))
        return sorted(got)

    # T = [0,3)=12; E = [0,3)=24.  cond A>2 true on [2,3),[3,4).
    # user {during} inverts to the contains selection: [0,3)
    # contains-list-relates to BOTH a true ([2,3) finished) and a
    # false ([1,2) strict contains) granule -> lands in res AND esel;
    # the reference rule keeps the THEN value
    # top-level u/d/i statements emit FLAT interval rows, so the
    # ragged bindings go through a scalar-arithmetic identity (extent
    # mode preserves the ragged extents)
    prog = (
        "T = (B {+,overlaps,u} C) + 0\n"
        "E = (B {+,overlaps,u} C) + (B {+,overlaps,u} C)\n"
        "R = if({during}, A > 2, T, E)"
    )
    _env, out = algebra_program(prog, dict(ref_maps))
    assert rag(out) == [(0, 3, 12.0)]
    # disjoint extents: then [2,4)=12 (relates to true), else [0,3)=24
    # (relates to false) -> both pass through
    prog2 = (
        "T = (B {+,equal,u} B) + 0\n"
        "E = (B {+,overlaps,u} C) + (B {+,overlaps,u} C)\n"
        "R = if({during}, A > 2, T, E)"
    )
    _env, out2 = algebra_program(prog2, dict(ref_maps))
    assert rag(out2) == [(0, 3, 24.0), (2, 4, 12.0)]
    # ragged/grid mix still raises loudly
    prog3 = (
        "T = (B {+,overlaps,u} C) + 0\n"
        "R = if({during}, A > 2, T, B)"
    )
    with pytest.raises(Exception, match="RAGGED|ragged"):
        _env, bad = algebra_program(prog3, dict(ref_maps))
        bad.materialize()


def test_all_ragged_extent_alignment_multikey_random(ray_session):
    """Extent-keyed alignment across MANY keys and buckets: two
    randomly-generated ragged tiers (random off-grid extents, partial
    overlap in the coincident set) summed via tier_expr, checked
    against a per-key numpy reference that matches extents by
    equality."""
    from grass_ray.stages.algebra import tier_expr

    rng = np.random.default_rng(21)
    keys = [("s%d" % (i % 3), "d%d" % i) for i in range(12)]

    def mk_ragged(seed_off):
        rows = {"source": [], "doc_id": [], "gran": [], "windows": [],
                "wstarts": [], "wends": [], "average": []}
        truth = {}
        for src, doc in keys:
            n = int(rng.integers(1, 7))
            starts = np.sort(
                rng.choice(np.arange(0, 500, 7) + seed_off, n, replace=False)
            ).astype(np.int64)
            ends = starts + rng.integers(1, 9, n)
            vals = rng.integers(-5, 20, n).astype(float)
            rows["source"].append(src)
            rows["doc_id"].append(doc)
            rows["gran"].append(3)
            rows["windows"].append(list(range(n)))
            rows["wstarts"].append(starts.tolist())
            rows["wends"].append(ends.tolist())
            rows["average"].append(vals.tolist())
            truth[(src, doc)] = {
                (int(s), int(e)): v for s, e, v in zip(starts, ends, vals)
            }
        t = pa.table(
            {
                "source": pa.array(rows["source"]),
                "doc_id": pa.array(rows["doc_id"]),
                "gran": pa.array(rows["gran"], type=pa.int64()),
                "windows": pa.array(rows["windows"], type=pa.list_(pa.int64())),
                "wstarts": pa.array(rows["wstarts"], type=pa.list_(pa.int64())),
                "wends": pa.array(rows["wends"], type=pa.list_(pa.int64())),
                "average": pa.array(rows["average"], type=pa.list_(pa.float64())),
            }
        )
        return ray.data.from_arrow(t).repartition(4).materialize(), truth

    # seed_off=0 for both -> the extent grids intersect; a nonzero
    # value count difference guarantees partial (not total) overlap
    a, ta = mk_ragged(0)
    b, tb = mk_ragged(0)
    out = tier_expr("A + B", {"A": a, "B": b}, buckets=8)
    got = {}
    for _, r in out.to_pandas().iterrows():
        for s, e, v in zip(r["wstarts"], r["wends"], r["average"]):
            got[(r["source"], r["doc_id"], int(s), int(e))] = v
    want = {}
    for k in keys:
        for ext, v in ta[k].items():
            if ext in tb.get(k, {}):
                want[(k[0], k[1], ext[0], ext[1])] = v + tb[k][ext]
    assert len(want) > 0  # the random draw must produce coincidences
    assert got == want


def test_match_aggregator_with_side(ref_maps):
    """{&&,rel,|,r} — match aggregator + extent side modifier
    (round-4): the matched rights pre-fold with the aggregator
    (_topo_fold match_agg), extents follow the side.  CLEAN trivalent
    semantics; the reference testsuite's conditionals 10-12
    expectations encode its buggy recurse_compare evaluator
    (temporal_algebra.py:2278-2294) and are deliberately not
    replicated (ROUND_NOTES round-3 analysis)."""
    import ray.data as rd

    def mk(gran, windows, values, origin=0):
        cols = {
            "source": ["s"],
            "doc_id": ["d1"],
            "gran": pa.array([gran], type=pa.int64()),
            "windows": pa.array([windows], type=pa.list_(pa.int64())),
            "average": pa.array([values], type=pa.list_(pa.float64())),
        }
        if origin:
            cols["worigin"] = pa.array([origin], type=pa.int64())
        return rd.from_arrow(pa.table(cols))

    # function level: B(bool) {&&,over,|,r} C(bool) — both b granules
    # match c, so both land (duplicated) on C's extent; values fold
    # b_i && (c1 | ...) = [1&&1, 0&&1]
    bb = mk(2, [0, 1], [1.0, 0.0])
    cb = mk(2, [0], [1.0], origin=1)
    out = tier_topo(
        bb, cb, "&&", ["overlaps", "overlapped"], side="r", match_agg="|"
    ).to_pandas()
    assert out["gran"].tolist() == [2]
    assert out["worigin"].tolist() == [1]
    assert [list(x) for x in out["windows"]] == [[0, 0]]
    assert [list(x) for x in out["average"]] == [[1.0, 0.0]]
    # expression level (the testsuite-12 SHAPE on the fixture tiers):
    # cond true only for b1 (start 0 < 2), which overlaps c1 -> the
    # condition granule sits on C's extent -> then-side selects c1
    _n, out = algebra(
        "R = if(start_time(B) < 2 {&&,overlaps,|,r} td(C) == 2, C)",
        dict(ref_maps),
    )
    t = out.to_pandas()
    got = dict(zip(t["windows"].tolist()[0], t["average"].tolist()[0]))
    assert got == {0: 7.0}


def test_extent_mode_grid_metadata_mismatch_raises(ray_session):
    """r4 ADVICE: tier_expr's extent mode labels its output with the
    first operand's gran/worigin, and a later MIXED ragged+grid
    consumption grid-projects on that label — ragged operands carrying
    DIFFERENT grid metadata must raise (the _merge_nested ragged-path
    rule), not silently mislabel the result."""
    from grass_ray.stages.algebra import tier_expr

    def mk(gran):
        t = pa.table(
            {
                "source": pa.array(["s"]),
                "doc_id": pa.array(["d"]),
                "gran": pa.array([gran], type=pa.int64()),
                "windows": pa.array([[0]], type=pa.list_(pa.int64())),
                "wstarts": pa.array([[0]], type=pa.list_(pa.int64())),
                "wends": pa.array([[3]], type=pa.list_(pa.int64())),
                "average": pa.array([[1.0]], type=pa.list_(pa.float64())),
            }
        )
        return ray.data.from_arrow(t).materialize()

    with pytest.raises(Exception, match="gran"):
        tier_expr("A + B", {"A": mk(3), "B": mk(5)}).materialize()
    # identical metadata still aligns the coincident extent
    out = tier_expr("A + B", {"A": mk(3), "B": mk(3)})
    t = out.to_pandas()
    assert list(
        zip(t["wstarts"][0], t["wends"][0], t["average"][0])
    ) == [(0, 3, 2.0)]
