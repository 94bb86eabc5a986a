"""Topology-qualified algebra: A {op, relation[, side]} B across
granularities (temporal_raster_base_algebra.py topology-list semantics:
successive operator application over matching granules).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from grass_ray.stages.algebra import algebra, tier_topo


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
    a, b = ab
    _n, out = algebra("C = A {+, during} B", {"A": a, "B": b})
    assert _vals(out) == {1: 120.0, 4: 250.0}


def test_topo_plus_full_cover(ab):
    a, b = ab
    _n, out = algebra("C = A {+, starts|during|finishes} B", {"A": a, "B": b})
    assert _vals(out) == {0: 110.0, 1: 120.0, 2: 130.0, 3: 240.0, 4: 250.0, 5: 260.0}


def test_topo_contains_reversed(ab):
    a, b = ab
    # Allen relations are mutually exclusive: strict `contains` matches
    # only the middle A window; started/finished cover the edge ones
    _n, out = algebra("C = B {+, contains} A", {"A": a, "B": b})
    assert _vals(out) == {0: 120.0, 1: 250.0}
    _n, out = algebra("C = B {+, started|contains|finished} A", {"A": a, "B": b})
    assert _vals(out) == {0: 160.0, 1: 350.0}


def test_topo_hash_counts(ab):
    a, b = ab
    _n, out = algebra("C = B {#, started|contains|finished} A", {"A": a, "B": b})
    assert _vals(out, "hash_count") == {0: 3, 1: 3}
    _n, out = algebra("C = A {#, during} B", {"A": a, "B": b})
    assert _vals(out, "hash_count") == {0: 0, 1: 1, 2: 0, 3: 0, 4: 1, 5: 0}


def test_topo_selection(ab):
    a, b = ab
    _n, out = algebra("C = A {:, starts} B", {"A": a, "B": b})
    assert _vals(out) == {0: 10.0, 3: 40.0}
    _n, out = algebra("C = A {!:, starts|during|finishes} B", {"A": a, "B": b})
    assert _vals(out) == {}


def test_topo_product_and_division(ab):
    a, b = ab
    _n, out = algebra("C = A {*, during} B", {"A": a, "B": b})
    assert _vals(out) == {1: 2000.0, 4: 10000.0}
    _n, out = algebra("C = A {/, during} B", {"A": a, "B": b})
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


def test_topo_side_modifier_raises(ab):
    a, b = ab
    with pytest.raises(NotImplementedError):
        algebra("C = A {+, during, r} B", {"A": a, "B": b})


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
