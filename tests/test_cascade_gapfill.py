"""Tier cascade invariants (F7) and gap-fill golden fixture (F4)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from grass_ray.sources.corpus import synth_corpus_table
from grass_ray.stages.cascade import cascade_batch, explode_nested
from grass_ray.stages.gapfill import find_gaps_batch, gapfill_batch
from grass_ray.stages.rollup import rollup_batch

METHODS = ("count", "sum", "minimum", "maximum", "average")


def nested_table(rows):
    """rows: (doc_id, source, {window: value_or_None})"""
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "source": pa.array([r[1] for r in rows]),
            "gran": pa.array([1] * len(rows), type=pa.int64()),
            "windows": pa.array(
                [sorted(r[2]) for r in rows], type=pa.list_(pa.int64())
            ),
            "average": pa.array(
                [[r[2][w] for w in sorted(r[2])] for r in rows],
                type=pa.list_(pa.float64()),
            ),
        }
    )


# ---------------------------------------------------------------------------
# F7 — cascade invariant: rollup(raw, g*k) == cascade(rollup(raw, g), k)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("factor", [2, 60])
def test_cascade_equals_direct(factor):
    t = synth_corpus_table(30, seed=11)
    fine = rollup_batch(t, 60, METHODS, nested=True)
    casc = cascade_batch(fine, factor)
    direct = rollup_batch(t, 60 * factor, METHODS, nested=True)
    cd, dd = casc.to_pydict(), direct.to_pydict()
    assert cd["doc_id"] == dd["doc_id"]
    assert cd["windows"] == dd["windows"]
    assert cd["gran"] == dd["gran"]
    for m in METHODS:
        assert cd[m] == dd[m], m  # bit-exact for integer-valued tokens


def test_cascade_all_null_window():
    t = pa.table(
        {
            "doc_id": pa.array(["d1"]),
            "source": pa.array(["s"]),
            "tokens": pa.array(
                [[None, None, 5, 7]], type=pa.list_(pa.int32())
            ),
            "n_tok": pa.array([4], type=pa.int32()),
        }
    )
    fine = rollup_batch(t, 2, METHODS, nested=True)
    casc = cascade_batch(fine, 2).to_pydict()
    assert casc["windows"] == [[0]]
    assert casc["sum"] == [[12.0]]
    assert casc["count"] == [[2]]
    # fully-null coarse window
    t2 = pa.table(
        {
            "doc_id": pa.array(["d1"]),
            "source": pa.array(["s"]),
            "tokens": pa.array([[None, None]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([2], type=pa.int32()),
        }
    )
    casc2 = cascade_batch(rollup_batch(t2, 1, METHODS, nested=True), 2).to_pydict()
    assert casc2["sum"] == [[None]]
    assert casc2["count"] == [[0]]
    assert casc2["minimum"] == [[None]]
    assert casc2["average"] == [[None]]


def test_cascade_rejects_holistic():
    t = synth_corpus_table(3, seed=1)
    fine = rollup_batch(
        t, 60, ("count", "sum", "minimum", "maximum", "median"), nested=True
    )
    with pytest.raises(ValueError, match="not decomposable"):
        cascade_batch(fine, 2, extra_methods=("median",))


# ---------------------------------------------------------------------------
# F4 — gap-fill golden (≙ t.rast.gapfill testsuite months 100..400..1200)
# ---------------------------------------------------------------------------


def test_gapfill_golden():
    t = nested_table([("d1", "s", {0: 100.0, 3: 400.0, 11: 1200.0})])
    out = gapfill_batch(t).to_pydict()
    assert out["windows"] == [list(range(12))]
    assert out["average"] == [[100.0 * (i + 1) for i in range(12)]]
    assert out["is_filled"] == [
        [False, True, True, False, True, True, True, True, True, True, True, False]
    ]


def test_gapfill_null_endpoint():
    # either side NULL -> fills NULL (r.series.interp/main.c:435-441)
    t = nested_table([("d1", "s", {0: 100.0, 3: None, 6: 700.0})])
    out = gapfill_batch(t).to_pydict()
    assert out["windows"] == [list(range(7))]
    assert out["average"] == [[100.0, None, None, None, None, None, 700.0]]


def test_gapfill_no_leading_trailing():
    # leading/trailing gaps not filled: output range = [first, last] only
    t = nested_table([("d1", "s", {5: 50.0, 7: 70.0})])
    out = gapfill_batch(t).to_pydict()
    assert out["windows"] == [[5, 6, 7]]
    assert out["average"] == [[50.0, 60.0, 70.0]]


def test_gapfill_dense_noop_and_multirow():
    t = nested_table(
        [
            ("d1", "s", {0: 1.0, 1: 2.0, 2: 3.0}),
            ("d2", "s", {10: 0.0, 12: 4.0}),
            ("d3", "s", {7: 9.0}),
        ]
    )
    out = gapfill_batch(t).to_pydict()
    assert out["windows"] == [[0, 1, 2], [10, 11, 12], [7]]
    assert out["average"] == [[1.0, 2.0, 3.0], [0.0, 2.0, 4.0], [9.0]]


def test_find_gaps():
    t = nested_table([("d1", "s", {0: 1.0, 3: 2.0, 11: 3.0}), ("d2", "s", {1: 1.0, 2: 2.0})])
    out = find_gaps_batch(t).to_pydict()
    assert out["doc_id"] == ["d1", "d1"]
    assert out["gap_start"] == [1, 4]
    assert out["gap_end"] == [2, 10]
    assert out["n_missing"] == [2, 7]


def test_explode_nested(ray_session):
    import ray.data

    t = synth_corpus_table(10, seed=2)
    nested = rollup_batch(t, 60, METHODS, nested=True)
    pts = rollup_batch(t, 60, METHODS)
    ds = ray.data.from_arrow(nested)
    out = (
        explode_nested(ds)
        .to_pandas()
        .sort_values(["doc_id", "window"])
        .reset_index(drop=True)
    )
    ref = pts.to_pandas().sort_values(["doc_id", "window"]).reset_index(drop=True)
    for m in METHODS:
        assert out[m].equals(ref[m]), m


def test_refine_common_granularity_goldens(ray_session):
    # reference unittests_temporal_raster_algebra_grs.py tests 1-2: the
    # -g common-granularity mode resamples every operand to the finest
    # granularity by replication, then evaluates aligned.
    # A monthly 1..6; B 3-month {7,8}; C 6-month {9}.
    import ray.data

    from grass_ray.stages.algebra import algebra
    from grass_ray.stages.cascade import cascade, refine

    def tier(windows, vals, gran):
        return ray.data.from_arrow(
            pa.table(
                {
                    "source": ["s"],
                    "doc_id": ["d"],
                    "gran": pa.array([gran], type=pa.int64()),
                    "windows": pa.array([windows], type=pa.list_(pa.int64())),
                    "average": pa.array(
                        [[float(v) for v in vals]], type=pa.list_(pa.float64())
                    ),
                }
            )
        )

    A = tier([0, 1, 2, 3, 4, 5], [1, 2, 3, 4, 5, 6], 1)
    B3 = tier([0, 1], [7, 8], 3)
    B = refine(B3, 3)
    C = refine(tier([0], [9], 6), 6)
    _n, out = algebra("R = A + B + C", {"A": A, "B": B, "C": C})
    t = out.to_pandas()
    assert list(t["windows"].tolist()[0]) == [0, 1, 2, 3, 4, 5]
    # reference asserts min 17 (=1+7+9) and max 23 (=6+8+9)
    assert list(t["average"].tolist()[0]) == [17.0, 18.0, 19.0, 21.0, 22.0, 23.0]
    _n, out = algebra("R = if(C == 9, A - 1)", {"A": A, "C": C})
    t = out.to_pandas()
    assert list(t["average"].tolist()[0]) == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]

    # round trip: refine then cascade(average) returns the original
    # tier (all sub-values equal -> mean is the value; count scales)
    def add_tier_cols(b):
        ws = b.column("windows").to_pylist()
        vs = b.column("average").to_pylist()
        lst = pa.list_(pa.float64())
        b = b.append_column(
            "count", pa.array([[1.0] * len(w) for w in ws], type=lst)
        )
        for c in ("sum", "minimum", "maximum"):
            b = b.append_column(c, pa.array(vs, type=lst))
        return b

    back = cascade(
        refine(B3, 3).map_batches(add_tier_cols, batch_format="pyarrow"), 3
    ).to_pandas()
    assert int(back["gran"][0]) == 3
    assert list(back["windows"].tolist()[0]) == [0, 1]
    assert list(back["average"].tolist()[0]) == [7.0, 8.0]
