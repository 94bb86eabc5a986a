"""Row-local rollup (t.rast.aggregate analog) vs oracle — FIXTURES F3."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from grass_ray.functions.reducers import METHODS
from grass_ray.sources.corpus import synth_corpus_table
from grass_ray.stages.rollup import rollup, rollup_batch, series_collapse

from .oracle import oracle_reduce

ALL = [m for m in METHODS if m != "quantile"]


def corpus_table(rows):
    """rows: list of (doc_id, source, tokens-with-None)."""
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "tokens": pa.array([r[2] for r in rows], type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[2]) for r in rows], type=pa.int32()),
            "source": pa.array([r[1] for r in rows]),
        }
    )


def test_f3a_map_level():
    t = corpus_table([("d1", "s", [100, 200, 300, 400, 500, 600, None])])
    out = rollup_batch(t, gran=3, methods=["sum", "maximum", "minimum"])
    d = out.to_pydict()
    assert d["window"] == [0, 1, 2]
    assert d["sum"] == [600.0, 1500.0, None]
    assert d["maximum"] == [300.0, 600.0, None]
    assert d["minimum"] == [100.0, 400.0, None]


def test_f3b_per_position():
    toks = []
    for interval in range(7):
        v = None if interval == 6 else 100 * (1 + interval)
        toks.extend([v] * 14)
    t = corpus_table([("d1", "s", toks)])
    # gran=14 → identity per interval
    out = rollup_batch(t, 14, ["average", "count"]).to_pydict()
    assert out["average"] == [100.0, 200.0, 300.0, 400.0, 500.0, 600.0, None]
    assert out["count"] == [14, 14, 14, 14, 14, 14, 0]
    # gran=42 → window sums over 42 positions
    out = rollup_batch(t, 42, ["sum"]).to_pydict()
    assert out["sum"] == [14 * 600.0, 14 * 1500.0, None]


def test_alignment_origin_offset():
    # first position at offset 5 within a window (start not on boundary):
    # floor-aligned windows ≙ adjust_datetime_to_granularity
    t = corpus_table([("d1", "s", [10, 20, 30, 40, 50, 60, 70])])
    out = rollup_batch(t, 4, ["count", "sum"], origin=5).to_pydict()
    # positions 5..11 → windows 1 (pos 5..7: 3 vals), 2 (pos 8..11: 4 vals)
    assert out["window"] == [1, 2]
    assert out["count"] == [3, 4]
    assert out["sum"] == [60.0, 220.0]


def test_every_method_vs_oracle_per_window():
    rng = np.random.default_rng(7)
    docs = []
    for i in range(12):
        n = int(rng.integers(1, 200))
        vals = rng.integers(0, 50, size=n).astype(object)
        for j in range(n):
            if rng.random() < 0.2:
                vals[j] = None
            else:
                vals[j] = int(vals[j])
        docs.append((f"d{i}", f"s{i % 3}", list(vals)))
    t = corpus_table(docs)
    gran = 17
    out = rollup_batch(t, gran, ALL).to_pydict()
    got = {}
    for i in range(len(out["window"])):
        key = (out["doc_id"][i], out["window"][i])
        got[key] = {m: out[m][i] for m in ALL}
    for doc_id, _, toks in docs:
        nwin = (len(toks) + gran - 1) // gran
        for w in range(nwin):
            seg = toks[w * gran : (w + 1) * gran]
            want = oracle_reduce(
                [float("nan") if v is None else float(v) for v in seg], ALL
            )
            for m in ALL:
                g = got[(doc_id, w)][m]
                wv = want[m]
                if math.isnan(wv):
                    assert g is None, (doc_id, w, m, g)
                elif math.isinf(wv):
                    assert g is not None and math.isinf(g), (doc_id, w, m)
                else:
                    assert g == pytest.approx(wv, rel=1e-12), (doc_id, w, m)


def test_nested_matches_points():
    t = synth_corpus_table(20, seed=3)
    pts = rollup_batch(t, 60, ["sum", "count", "minimum", "maximum", "average"])
    nested = rollup_batch(
        t, 60, ["sum", "count", "minimum", "maximum", "average"], nested=True
    )
    nd = nested.to_pydict()
    # re-explode nested and compare
    flat = {"doc_id": [], "window": [], "sum": [], "count": []}
    for i in range(nested.num_rows):
        for j, w in enumerate(nd["windows"][i]):
            flat["doc_id"].append(nd["doc_id"][i])
            flat["window"].append(w)
            flat["sum"].append(nd["sum"][i][j])
            flat["count"].append(nd["count"][i][j])
    pd_ = pts.to_pydict()
    assert flat["doc_id"] == pd_["doc_id"]
    assert flat["window"] == pd_["window"]
    assert flat["sum"] == pd_["sum"]
    assert flat["count"] == pd_["count"]


def test_rollup_dataset_streaming(ray_session):
    import ray.data

    t = synth_corpus_table(50, seed=5)
    ds = ray.data.from_arrow(t)
    out = rollup(ds, 60, ["sum", "count"]).to_pandas()
    # spot-check one doc against batch-level kernel
    ref = rollup_batch(t, 60, ["sum", "count"]).to_pandas()
    out = out.sort_values(["doc_id", "window"]).reset_index(drop=True)
    ref = ref.sort_values(["doc_id", "window"]).reset_index(drop=True)
    assert out.equals(ref)


def test_series_collapse(ray_session):
    import ray.data

    t = corpus_table(
        [("d1", "s", [100, 200, 300]), ("d2", "s", [None, None])]
    )
    ds = ray.data.from_arrow(t)
    out = (
        series_collapse(ds, ["average", "count", "sum"])
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc["d1", "average"] == 200.0
    assert out.loc["d1", "count"] == 3
    assert math.isnan(out.loc["d2", "sum"])


def test_rollup_weights_per_position():
    # weight = window-local position + 1 (r.series per-input weights)
    t = corpus_table([("d1", "s", [10, 20, 30, 40])])
    out = rollup_batch(
        t, 2, ("count", "sum", "average"), weights=np.array([1.0, 3.0])
    ).to_pydict()
    # window 0: w=[1,3] v=[10,20] -> count 4, sum 70, avg 17.5
    # window 1: v=[30,40] -> count 4, sum 150, avg 37.5
    assert out["count"] == [4, 4]
    assert out["sum"] == [70.0, 150.0]
    assert out["average"] == [17.5, 37.5]


def test_per_row_token_array_equality_vs_single_node(ray_session):
    """North-rule per-row invariant: every corpus row's token array from
    the Ray pipeline equals a single-node reference derivation computed
    with plain Python over documents.parquet."""
    import pyarrow.parquet as pq
    import ray.data

    from grass_ray.sources.corpus import (
        NULL_MOD,
        NULL_RESIDUE,
        TOKEN_MOD,
        corpus_from_documents,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        corpus_from_documents(sf)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    ).to_pylist()
    assert len(got) == len(docs)
    for row in docs:
        did, n = row["doc_id"], row["n_chars"]
        # single-node reference: pure python, no numpy, no ray
        want = [
            None
            if (31 * i + did) % NULL_MOD == NULL_RESIDUE
            else (7 * i + did) % TOKEN_MOD
            for i in range(n)
        ]
        key = f"d{did:07d}"
        have = [
            None if (v is None or (isinstance(v, float) and math.isnan(v))) else int(v)
            for v in got.loc[key, "tokens"]
        ]
        assert have == want, key
        assert got.loc[key, "n_tok"] == n
        assert got.loc[key, "source"] == row["source"]
