"""univar / extract+mapcalc / what / accumulate / tier_arith operators."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from grass_ray.sources.corpus import synth_corpus_table
from grass_ray.stages.accumulate import accdetect_batch, accumulate_batch
from grass_ray.stages.extract import apply_mapcalc, extract, mapcalc_expr, tier_arith
from grass_ray.stages.rollup import rollup, rollup_batch
from grass_ray.stages.univar import univar_batch
from grass_ray.stages.what import what


def corpus_table(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "tokens": pa.array([r[2] for r in rows], type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[2]) for r in rows], type=pa.int32()),
            "source": pa.array([r[1] for r in rows]),
        }
    )


def test_univar_columns_and_values():
    t = corpus_table([("d1", "s", [1, 2, 3, 4]), ("d2", "s", [None, 5])])
    out = univar_batch(t, extended=True).to_pandas().set_index("doc_id")
    r = out.loc["d1"]
    assert r["n"] == 4 and r["null_cells"] == 0
    assert r["min"] == 1 and r["max"] == 4 and r["range"] == 3
    assert r["mean"] == 2.5 and r["sum"] == 10
    assert r["variance"] == pytest.approx(1.25)
    assert r["stddev"] == pytest.approx(math.sqrt(1.25))
    assert r["coeff_var"] == pytest.approx(100 * math.sqrt(1.25) / 2.5)
    assert r["median"] == 2.5 and r["quart1"] == 1.75
    r2 = out.loc["d2"]
    assert r2["n"] == 1 and r2["null_cells"] == 1 and r2["sum"] == 5


def test_univar_negative_abs():
    # mean_of_abs / sum_abs use |v| (r.univar's mean_of_abs)
    t = pa.table(
        {
            "doc_id": ["d"],
            "tokens": pa.array([[-2, 2, -4]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([3], type=pa.int32()),
            "source": ["s"],
        }
    )
    out = univar_batch(t).to_pandas().iloc[0]
    assert out["mean"] == pytest.approx(-4 / 3)
    assert out["mean_of_abs"] == pytest.approx(8 / 3)
    assert out["sum_abs"] == 8.0


def test_mapcalc_exprs():
    fn = mapcalc_expr("x * 2 + 1")
    assert list(fn(np.array([1.0, 2.0]))) == [3.0, 5.0]
    fn = mapcalc_expr("sqrt(abs(x))")
    assert list(fn(np.array([-4.0]))) == [2.0]
    with pytest.raises(ValueError):
        mapcalc_expr("__import__('os')")
    with pytest.raises(ValueError):
        mapcalc_expr("y + 1")


def test_extract_where_and_expr(ray_session):
    import ray.data

    t = synth_corpus_table(20, seed=3)
    ds = ray.data.from_arrow(t)
    out = extract(
        ds,
        where=lambda b: pc.greater(b.column("n_tok"), 100),
        expr="x * 2",
    )
    df = out.to_pandas()
    assert (df["n_tok"] > 100).all()
    # doubled tokens, nulls preserved
    orig = t.to_pydict()
    want = {
        d: [None if v is None else 2.0 * v for v in toks]
        for d, toks, n in zip(orig["doc_id"], orig["tokens"], orig["n_tok"])
        if n > 100
    }
    for _, row in df.iterrows():
        assert list(row["tokens"]) == pytest.approx(want[row["doc_id"]]) or [
            (a is None and b is None) or a == b
            for a, b in zip(list(row["tokens"]), want[row["doc_id"]])
        ]


def test_mapcalc_if(ray_session):
    import ray.data

    t = corpus_table([("d1", "s", [1, 5, None, 9])])
    out = apply_mapcalc(
        ray.data.from_arrow(t), "if(x > 4, x, 0)"
    ).to_pandas()
    vals = list(out["tokens"][0])
    assert vals[0] == 0.0 and vals[1] == 5.0 and vals[3] == 9.0
    assert vals[2] is None or (isinstance(vals[2], float) and math.isnan(vals[2]))


def test_what_lookup(ray_session):
    import ray.data

    t = corpus_table(
        [("d1", "s", [10, 11, 12]), ("d2", "s", [20, None])]
    )
    out = (
        what(ray.data.from_arrow(t), positions=[0, 1, 5], doc_ids=["d1", "d2"])
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    # pos 5 out of range for both docs -> dropped
    assert list(out["doc_id"]) == ["d1", "d1", "d2", "d2"]
    assert list(out["pos"]) == [0, 1, 0, 1]
    assert out["token"][0] == 10.0 and out["token"][2] == 20.0
    assert pd.isna(out["token"][3])


def test_accumulate_gdd():
    t = corpus_table([("d1", "s", [10, 20, 5, None, 15])])
    nested = rollup_batch(t, 1, ("average", "maximum"), nested=True)
    out = accumulate_batch(nested, method="gdd", lower=8.0).to_pydict()
    # contributions: 2, 12, 0, NULL(0), 7 -> running 2, 14, 14, NULL, 21
    assert out["accum"] == [[2.0, 14.0, 14.0, None, 21.0]]
    out2 = accumulate_batch(nested, method="mean", lower=0.0).to_pydict()
    assert out2["accum"] == [[10.0, 30.0, 35.0, None, 50.0]]
    out3 = accumulate_batch(
        nested, method="bedd", lower=8.0, upper=18.0
    ).to_pydict()
    # clamped avg: 10,18,5,NULL,15 -> contrib 2,10,0,0,7 -> 2,12,12,NULL,19
    assert out3["accum"] == [[2.0, 12.0, 12.0, None, 19.0]]


def test_accdetect():
    t = corpus_table([("d1", "s", [10, 20, 5, 15]), ("d2", "s", [1, 1])])
    nested = rollup_batch(t, 1, ("average", "maximum"), nested=True)
    acc = accumulate_batch(nested, method="mean")
    out = accdetect_batch(acc, range_lo=25.0, range_hi=40.0).to_pydict()
    # d1 accum: 10,30,35,50 -> start at window 1 (30), end at window 3 (50)
    assert out["occurrence_start"] == [1, -1]
    assert out["occurrence_end"] == [3, -1]


def test_tier_arith(ray_session):
    import ray.data

    t = synth_corpus_table(10, seed=4)
    a = rollup(ray.data.from_arrow(t), 60, ("count", "sum", "minimum", "maximum", "average"), nested=True)
    b = rollup(ray.data.from_arrow(t), 60, ("count", "sum", "minimum", "maximum", "average"), nested=True)
    diff = tier_arith(a, b, "-").to_pandas()
    assert len(diff) == 10
    for vals in diff["average"]:
        assert all(v == 0.0 or v is None or (isinstance(v, float) and math.isnan(v)) for v in vals)


def test_tier_select(ray_session):
    import ray.data
    from grass_ray.stages.extract import tier_select

    def nested(rows):
        return pa.table(
            {
                "source": pa.array([r[0] for r in rows]),
                "doc_id": pa.array([r[1] for r in rows]),
                "gran": pa.array([1] * len(rows), type=pa.int64()),
                "windows": pa.array([r[2] for r in rows], type=pa.list_(pa.int64())),
                "average": pa.array([r[3] for r in rows], type=pa.list_(pa.float64())),
            }
        )

    a = ray.data.from_arrow(nested([("s", "d1", [0, 1, 2, 3], [10.0, 11.0, 12.0, 13.0])]))
    b = ray.data.from_arrow(nested([("s", "d1", [1, 3, 9], [0.0, 0.0, 0.0])]))
    sel = tier_select(a, b).to_pandas()
    assert list(sel["windows"][0]) == [1, 3]
    assert list(sel["average"][0]) == [11.0, 13.0]
    inv = tier_select(a, b, invert=True).to_pandas()
    assert list(inv["windows"][0]) == [0, 2]


def test_algebra_statements(ray_session):
    import ray.data
    from grass_ray.stages.algebra import algebra

    t = synth_corpus_table(8, seed=6)
    tier = rollup(
        ray.data.from_arrow(t),
        60,
        ("count", "sum", "minimum", "maximum", "average"),
        nested=True,
    )
    tiers = {"A": tier, "B": tier}
    name, res = algebra("C = A + B", tiers)
    assert name == "C"
    df = res.to_pandas()
    base = tier.to_pandas().set_index("doc_id")
    got = df.set_index("doc_id")
    for d in got.index:
        want = [None if v is None else 2 * v for v in base.loc[d, "average"]]
        have = [None if (v is None or (isinstance(v, float) and math.isnan(v))) else v for v in got.loc[d, "average"]]
        for a, b in zip(have, want):
            assert (a is None and b is None) or a == pytest.approx(b)
    _, shifted = algebra("tshift(A, 5)", tiers)
    sw = shifted.to_pandas().set_index("doc_id")
    for d in sw.index:
        assert list(sw.loc[d, "windows"]) == [w + 5 for w in base.loc[d, "windows"]]
    _, mapped = algebra('map(A, "x * 0 + 7")', tiers)
    mv = mapped.to_pandas().iloc[0]["average"]
    assert all(v == 7.0 or v is None for v in mv)
    _, sel = algebra("A !: B", tiers)
    assert all(len(w) == 0 for w in sel.to_pandas()["windows"])


def test_register_null_drop():
    t = corpus_table([("d1", "s", [100, 200, 300, None, None, None, 700, 800, 900])])
    # default: all-NULL window kept as NULL point
    kept = rollup_batch(t, 3, ("count", "sum")).to_pydict()
    assert kept["window"] == [0, 1, 2]
    assert kept["sum"] == [600.0, None, 2400.0]
    # reference default (-n off): NULL-only windows unregistered -> gap
    dropped = rollup_batch(t, 3, ("count", "sum"), register_null=False).to_pydict()
    assert dropped["window"] == [0, 2]
    assert dropped["sum"] == [600.0, 2400.0]
    # ...which the gap-fill then interpolates across (reference chain)
    from grass_ray.stages.gapfill import gapfill_batch

    nested = rollup_batch(
        t, 3, ("count", "sum", "minimum", "maximum", "average"),
        nested=True, register_null=False,
    )
    filled = gapfill_batch(nested).to_pydict()
    assert filled["windows"] == [[0, 1, 2]]
    assert filled["average"] == [[200.0, 500.0, 800.0]]
    assert filled["is_filled"] == [[False, True, False]]


def test_what_timerow(ray_session):
    import ray.data
    from grass_ray.stages.what import what_timerow

    t = corpus_table([("d1", "s", [10, 11, 12]), ("d2", "s", [20, None])])
    out = (
        what_timerow(ray.data.from_arrow(t), positions=[0, 1, 5])
        .to_pandas()
        .set_index("doc_id")
    )
    assert [None if pd.isna(v) else v for v in out.loc["d1", "values"]] == [10.0, 11.0, None]
    assert [None if pd.isna(v) else v for v in out.loc["d2", "values"]] == [20.0, None, None]


def test_accumulate_cycles():
    t = corpus_table([("d1", "s", [1, 2, 3, 4, 5, 6])])
    nested = rollup_batch(t, 1, ("average", "maximum"), nested=True)
    out = accumulate_batch(nested, method="mean", cycle=3).to_pydict()
    # cycles of 3 windows: [1,3,6], restart: [4,9,15]
    assert out["accum"] == [[1.0, 3.0, 6.0, 4.0, 9.0, 15.0]]
    # no cycle: plain running sum
    out2 = accumulate_batch(nested, method="mean").to_pydict()
    assert out2["accum"] == [[1.0, 3.0, 6.0, 10.0, 15.0, 21.0]]
    # cycle with NULL in the middle
    t2 = corpus_table([("d1", "s", [1, None, 3, 4])])
    n2 = rollup_batch(t2, 1, ("average", "maximum"), nested=True)
    o = accumulate_batch(n2, method="mean", cycle=2).to_pydict()
    assert o["accum"] == [[1.0, None, 3.0, 7.0]]


def test_algebra_hash_and_buff(ray_session):
    import ray.data
    from grass_ray.stages.algebra import algebra

    def nested(rows):
        return pa.table(
            {
                "source": pa.array([r[0] for r in rows]),
                "doc_id": pa.array([r[1] for r in rows]),
                "gran": pa.array([1] * len(rows), type=pa.int64()),
                "windows": pa.array([r[2] for r in rows], type=pa.list_(pa.int64())),
                "average": pa.array([r[3] for r in rows], type=pa.list_(pa.float64())),
            }
        )

    a = ray.data.from_arrow(nested([("s", "d1", [0, 1, 5], [1.0, 2.0, 3.0])]))
    b = ray.data.from_arrow(nested([("s", "d1", [1, 5, 9], [0.0, 0.0, 0.0])]))
    _, h = algebra("A # B", {"A": a, "B": b})
    hc = h.to_pandas().iloc[0]["hash_count"]
    assert list(hc) == [0, 1, 1]
    _, buf = algebra("buff(A, 1)", {"A": a, "B": b})
    bd = buf.to_pandas()
    # windows 0,1 merge into [-1, 3); 5 -> [4, 7)
    assert list(bd["start"]) == [-1, 4]
    assert list(bd["end"]) == [3, 7]


def test_what_col(ray_session):
    import ray.data
    from grass_ray.stages.what import what_col

    t = corpus_table([("d1", "s", [10, 11, 12]), ("d2", "s", [20, None])])
    out = (
        what_col(ray.data.from_arrow(t), positions=[0, 1, 5])
        .to_pandas()
        .set_index("pos")
        .sort_index()
    )
    # one row per position, keys ascending, values aligned (the
    # reference "col" layout: one row per time step, all points)
    assert list(out.index) == [0, 1]  # pos 5 out of range for both
    assert out.loc[0, "n_points"] == 2
    assert list(out.loc[0, "keys"]) == ["s|d1", "s|d2"]
    assert list(out.loc[0, "values"]) == [10.0, 20.0]
    assert out.loc[1, "n_points"] == 2
    v1 = [None if pd.isna(v) else v for v in out.loc[1, "values"]]
    assert v1 == [11.0, None]


def test_what_col_max_keys_guard(ray_session):
    import pytest as _pytest
    import ray.data
    from grass_ray.stages.what import what_col

    t = corpus_table([("d1", "s", [1]), ("d2", "s", [2]), ("d3", "s", [3])])
    with _pytest.raises(ValueError):
        what_col(
            ray.data.from_arrow(t), positions=[0], max_keys=2
        ).to_pandas()


def test_tier_select_cross_grid_extent_exact(ray_session):
    """Selection matches on EXTENTS (the reference's {:,equal,l}
    default), not window ids: a gran-60 window 1 never equals a
    gran-180 window 1, and a worigin shift relocates the grid."""
    import ray.data

    from grass_ray.stages.extract import tier_select

    def nested(rows, gran, worigin=None):
        cols = {
            "source": pa.array([r[0] for r in rows]),
            "doc_id": pa.array([r[1] for r in rows]),
            "gran": pa.array([gran] * len(rows), type=pa.int64()),
            "windows": pa.array([r[2] for r in rows], type=pa.list_(pa.int64())),
            "average": pa.array([r[3] for r in rows], type=pa.list_(pa.float64())),
        }
        if worigin is not None:
            cols["worigin"] = pa.array([worigin] * len(rows), type=pa.int64())
        return ray.data.from_arrow(pa.table(cols))

    a = nested([("s", "d1", [0, 1, 2, 3, 4, 5], [1.0] * 6)], 60)
    b180 = nested([("s", "d1", [0, 1], [0.0, 0.0])], 180)
    # id-matching would wrongly keep windows 0 and 1; no gran-60 cell
    # ever EQUALS a gran-180 cell
    assert sum(len(w) for w in tier_select(a, b180).to_pandas()["windows"]) == 0
    inv = tier_select(a, b180, invert=True).to_pandas()
    assert list(inv["windows"][0]) == [0, 1, 2, 3, 4, 5]
    # a worigin-shifted same-gran grid: A w1 [60,120) == B w0 [60,120)
    bsh = nested([("s", "d1", [0], [0.0])], 60, worigin=60)
    sel = tier_select(a, bsh).to_pandas()
    assert list(sel["windows"][0]) == [1]


def test_tier_select_ragged_extents(ray_session):
    """Ragged operands (explicit wstarts/wends) select by coincident
    extent on either side."""
    import ray.data

    from grass_ray.stages.extract import tier_select

    def ragged(extents, vals):
        return ray.data.from_arrow(
            pa.table(
                {
                    "source": pa.array(["s"]),
                    "doc_id": pa.array(["d1"]),
                    "gran": pa.array([1], type=pa.int64()),
                    "windows": pa.array(
                        [list(range(len(extents)))], type=pa.list_(pa.int64())
                    ),
                    "wstarts": pa.array(
                        [[s for s, _ in extents]], type=pa.list_(pa.int64())
                    ),
                    "wends": pa.array(
                        [[e for _, e in extents]], type=pa.list_(pa.int64())
                    ),
                    "average": pa.array([vals], type=pa.list_(pa.float64())),
                }
            )
        )

    t = ragged([(0, 3), (5, 9)], [12.0, 7.0])
    u = ragged([(5, 9), (10, 11)], [1.0, 1.0])
    sel = tier_select(t, u).to_pandas()
    assert list(zip(sel["wstarts"][0], sel["wends"][0], sel["average"][0])) == [
        (5, 9, 7.0)
    ]
    inv = tier_select(t, u, invert=True).to_pandas()
    assert list(zip(inv["wstarts"][0], inv["wends"][0], inv["average"][0])) == [
        (0, 3, 12.0)
    ]
    # ragged vs grid: [0,3) is off every gran-1 cell... but [5,6) etc.
    # ARE gran-1 cells only when width 1 — [5,9) is not, so nothing
    # coincides with a gran-1 grid B
    def grid(windows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "source": pa.array(["s"]),
                    "doc_id": pa.array(["d1"]),
                    "gran": pa.array([1], type=pa.int64()),
                    "windows": pa.array([windows], type=pa.list_(pa.int64())),
                    "average": pa.array(
                        [[0.0] * len(windows)], type=pa.list_(pa.float64())
                    ),
                }
            )
        )

    assert (
        sum(len(w) for w in tier_select(t, grid([0, 5])).to_pandas()["windows"])
        == 0
    )


def test_tier_arith_cross_grid_raises(ray_session):
    """tier_arith is the SAME-GRID legacy fast path: window-id
    matching across grids would silently relocate granules, so a
    gran/worigin mismatch raises (tier_expr/tier_topo are the
    cross-grain forms)."""
    import ray.data

    from grass_ray.stages.extract import tier_arith

    def nested(gran, windows, vals):
        return ray.data.from_arrow(
            pa.table(
                {
                    "source": pa.array(["s"]),
                    "doc_id": pa.array(["d1"]),
                    "gran": pa.array([gran], type=pa.int64()),
                    "windows": pa.array([windows], type=pa.list_(pa.int64())),
                    "average": pa.array([vals], type=pa.list_(pa.float64())),
                }
            )
        )

    a = nested(60, [0, 1], [1.0, 2.0])
    b = nested(180, [0, 1], [10.0, 20.0])
    with pytest.raises(Exception, match="grid"):
        tier_arith(a, b).materialize()
    # same grid still works
    sel = tier_arith(a, nested(60, [1], [5.0])).to_pandas()
    assert list(sel["windows"][0]) == [1]
    assert list(sel["average"][0]) == [7.0]


def test_tier_select_empty_operands(ray_session):
    """Regression (r4 review): empty/windowless operands must not
    crash — empty B keeps nothing for `:`, everything for `!:`; empty
    A stays empty; and a ragged A result upholds the ragged-producer
    invariant (known schema without execution)."""
    import ray.data

    from grass_ray.stages.algebra import _schema_ragged
    from grass_ray.stages.extract import tier_select

    def nested(rows, gran=1):
        return ray.data.from_arrow(
            pa.table(
                {
                    "source": pa.array([r[0] for r in rows], type=pa.string()),
                    "doc_id": pa.array([r[1] for r in rows], type=pa.string()),
                    "gran": pa.array([gran] * len(rows), type=pa.int64()),
                    "windows": pa.array(
                        [r[2] for r in rows], type=pa.list_(pa.int64())
                    ),
                    "average": pa.array(
                        [r[3] for r in rows], type=pa.list_(pa.float64())
                    ),
                }
            )
        )

    a = nested([("s", "d1", [0, 1], [1.0, 2.0])])
    empty = nested([]).limit(0)
    # empty B
    sel = tier_select(a, empty).to_pandas()
    assert sum(len(w) for w in sel["windows"]) == 0
    inv = tier_select(a, empty, invert=True).to_pandas()
    assert list(inv["windows"][0]) == [0, 1]
    # empty A
    assert tier_select(empty, a).count() == 0
    # windowless B (rows exist, no windows)
    bw = nested([("s", "d1", [], [])])
    assert sum(
        len(w) for w in tier_select(a, bw).to_pandas()["windows"]
    ) == 0
    inv2 = tier_select(a, bw, invert=True).to_pandas()
    assert list(inv2["windows"][0]) == [0, 1]
    # ragged A output carries a known schema WITHOUT execution (the
    # ragged-producer invariant algebra's probes rely on)
    t = ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(["s"]),
                "doc_id": pa.array(["d1"]),
                "gran": pa.array([1], type=pa.int64()),
                "windows": pa.array([[0, 1]], type=pa.list_(pa.int64())),
                "wstarts": pa.array([[0, 5]], type=pa.list_(pa.int64())),
                "wends": pa.array([[3, 9]], type=pa.list_(pa.int64())),
                "average": pa.array([[1.0, 2.0]], type=pa.list_(pa.float64())),
            }
        )
    )
    out = tier_select(t, t)
    assert _schema_ragged(out)
    assert list(out.to_pandas()["wstarts"][0]) == [0, 5]


def test_tier_select_key_values_with_separator_bytes(ray_session):
    """Regression (r4 review): the composite join key is
    length-prefixed, so distinct key TUPLES whose values contain
    separator-ish bytes never collide."""
    import ray.data

    from grass_ray.stages.extract import tier_select

    def nested(src, doc, windows, vals):
        return ray.data.from_arrow(
            pa.table(
                {
                    "source": pa.array([src]),
                    "doc_id": pa.array([doc]),
                    "gran": pa.array([1], type=pa.int64()),
                    "windows": pa.array([windows], type=pa.list_(pa.int64())),
                    "average": pa.array([vals], type=pa.list_(pa.float64())),
                }
            )
        )

    for (s1, d1), (s2, d2) in [
        (("a\x1fb", "c"), ("a", "b\x1fc")),
        (("3:x", "y"), ("3", ":xy")),
        (("", "ab"), ("ab", "")),
    ]:
        a = nested(s1, d1, [0], [1.0])
        b = nested(s2, d2, [0], [9.0])
        kept = sum(len(w) for w in tier_select(a, b).to_pandas()["windows"])
        assert kept == 0, (s1, d1, s2, d2)
        # and a true match still matches
        m = tier_select(a, nested(s1, d1, [0], [5.0])).to_pandas()
        assert sum(len(w) for w in m["windows"]) == 1
