"""Allen relations, interval sampling, shift/snap, catalog list/merge/export."""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc
import pytest

from grass_ray.functions.topology import (
    infer_granularity,
    relation,
    select_by_relations,
    shift_windows,
    snap_intervals,
)
from grass_ray.pipelines.catalog import (
    export_tier,
    import_tier,
    list_tier,
    merge_tiers,
)
from grass_ray.pipelines.tiers import build_tiers
from grass_ray.sources.corpus import synth_corpus_table
from grass_ray.stages.sample import (
    aggregate_by_intervals,
    sample_intervals,
    topology_report,
)
from grass_ray.stages.rollup import rollup
from grass_ray.state.manifest import TierStore


def test_allen_relations():
    assert relation(0, 10, 0, 10) == "equal"
    assert relation(2, 8, 0, 10) == "during"
    assert relation(0, 10, 2, 8) == "contains"
    assert relation(0, 5, 3, 10) == "overlaps"
    assert relation(3, 10, 0, 5) == "overlapped"
    assert relation(0, 5, 0, 10) == "starts"
    assert relation(0, 10, 0, 5) == "started"
    assert relation(5, 10, 0, 10) == "finishes"
    assert relation(0, 10, 5, 10) == "finished"
    assert relation(0, 5, 5, 10) == "precedes"
    assert relation(5, 10, 0, 5) == "follows"
    assert relation(0, 2, 5, 10) == "before"
    assert relation(5, 10, 0, 2) == "after"
    # instances (end=None) are zero-length
    assert relation(3, None, 0, 10) == "during"


def test_select_by_relations():
    starts = np.array([0, 5, 10, 15])
    ends = np.array([5, 10, 15, 20])
    # window [5, 15): which intervals does it contain?
    idx = select_by_relations(5, 15, starts, ends, ("contains",))
    assert list(idx) == [1, 2]
    idx = select_by_relations(7, 8, starts, ends, ("during",))
    assert list(idx) == [1]


def test_granularity_shift_snap():
    assert infer_granularity(np.array([0, 14, 28, 42])) == 14
    assert infer_granularity(np.array([0, 4, 10])) == 2
    assert list(shift_windows(np.array([1, 2]), 5)) == [6, 7]
    s = np.array([0, 10, 25])
    e = np.array([5, 12, 30])
    snapped = snap_intervals(s, e)
    assert list(snapped) == [10, 25, 30]
    # last interval degenerate -> extended by inferred granularity
    s2 = np.array([0, 10])
    e2 = np.array([5, 10])
    assert list(snap_intervals(s2, e2)) == [10, 10 + infer_granularity(s2)]


def test_aggregate_by_intervals(ray_session):
    import ray.data

    t = synth_corpus_table(8, seed=13, n_tok=100)
    ds = ray.data.from_arrow(t)
    out = aggregate_by_intervals(
        ds, [(0, 0, 50), (1, 50, 100), (2, 90, 200)], methods=("count", "sum")
    ).to_pandas()
    bywin = out.groupby("window")["count"].first()
    assert bywin[0] > 0 and bywin[1] > 0
    # window 2 clipped to [90, 100) -> max 10 positions per doc
    assert (out[out["window"] == 2]["count"] <= 10).all()
    # equals fixed-gran rollup when intervals tile the range
    from grass_ray.stages.rollup import rollup_batch

    direct = rollup_batch(t, 50, ("count", "sum")).to_pandas()
    a = out[out["window"] < 2].sort_values(["doc_id", "window"]).reset_index(drop=True)
    b = direct.sort_values(["doc_id", "window"]).reset_index(drop=True)
    assert list(a["sum"]) == list(b["sum"])


def test_sample_intervals():
    a = [("a1", 0, 5), ("a2", 5, 10), ("a3", 20, 25)]
    b = [("b1", 0, 10), ("b2", 10, 20), ("b3", 20, 30)]
    out = sample_intervals(a, b, relations=("during", "equal", "contains", "starts", "finishes")).to_pylist()
    b1 = [r for r in out if r["b_id"] == "b1"]
    assert {r["a_id"] for r in b1} == {"a1", "a2"}
    b2 = [r for r in out if r["b_id"] == "b2"]
    assert b2[0]["relation"] == "gap"


def test_topology_report(ray_session):
    import ray.data

    t = synth_corpus_table(10, seed=5, n_tok=100)
    nested = rollup(ray.data.from_arrow(t), 10, ("count", "sum", "minimum", "maximum", "average"), nested=True)
    rep = topology_report(nested)
    assert rep["keys"] == 10
    assert rep["windows"] == 100
    assert rep["gaps"] == 0
    assert rep["granularity"] == 1


def test_catalog_list_merge_export(ray_session, tmp_path):
    import ray.data

    root = str(tmp_path / "store")
    t = synth_corpus_table(20, seed=8, n_tok=100)
    build_tiers(
        ray.data.from_arrow(t), root, tier_specs=(("1m", 60),), num_partitions=4
    )
    store = TierStore(root)
    # list with filter + order + formats
    lst = list_tier(store, "1m", where=lambda b: pc.greater(b.column("n_points"), 0))
    assert lst.num_rows == 20
    csv = list_tier(store, "1m", fmt="csv", limit=3)
    assert csv.startswith('"source"') or csv.startswith("source")
    js = list_tier(store, "1m", fmt="json", limit=2)
    assert js.startswith("[")
    # export -> wipe -> import round trip
    exp = export_tier(store, "1m", str(tmp_path / "exported"))
    info_before = store.info("1m")
    store.remove_tier("1m")
    assert store.tiers() == []
    parts = import_tier(store, exp, "1m")
    assert len(parts) > 0
    assert store.info("1m")["n_rows"] == info_before["n_rows"]
    # merge into a new tier: identical source -> same key count (dedup)
    merge_tiers(store, ["1m", "1m"], "merged")
    assert store.info("merged")["n_rows"] == info_before["n_rows"]


def test_export_archive_and_copy(ray_session, tmp_path):
    import ray.data
    from grass_ray.pipelines.catalog import export_tier, import_tier_archive

    root = str(tmp_path / "store2")
    t = synth_corpus_table(10, seed=3, n_tok=100)
    build_tiers(ray.data.from_arrow(t), root, tier_specs=(("1m", 60),))
    store = TierStore(root)
    # tar.gz export -> wipe -> archive import
    arc = export_tier(store, "1m", str(tmp_path / "exp2"), archive=True)
    assert arc.endswith(".tar.gz")
    info = store.info("1m")
    store.remove_tier("1m")
    import_tier_archive(store, arc, "1m")
    assert store.info("1m")["n_rows"] == info["n_rows"]
    # t.copy
    parts = store.copy_tier("1m", "minute_copy")
    assert parts == sorted(store.committed_partitions("1m"))
    assert store.info("minute_copy")["n_rows"] == info["n_rows"]
    with pytest.raises(ValueError):
        store.copy_tier("1m", "minute_copy")


def test_reference_disaggregation_during():
    """test_aggregation_absolute's '2 days' granularity case: windows
    SMALLER than the 14-day maps -> each window samples the map it lies
    inside (relation `during`), replicating the map's value — 49
    two-day windows over 7 maps from the aligned start."""
    import numpy as np

    from grass_ray.functions.topology import select_by_relations

    # 7 maps of 14 days starting at day 14 (aligned origin 14)
    starts = np.array([14 + 14 * k for k in range(7)])
    ends = starts + 14
    values = [100, 200, 300, 400, 500, 600, None]
    out = {}
    for w0 in range(14, 14 + 14 * 7, 2):  # two-day windows
        idx = select_by_relations(
            w0, w0 + 2, starts, ends,
            ("during", "equal", "starts", "started", "finishes", "finished"),
        )
        # a window lying inside exactly one map gets that value
        assert len(idx) == 1, (w0, idx)
        out[w0] = values[int(idx[0])]
    assert len(out) == 49
    assert out[14] == 100 and out[26] == 100
    assert out[28] == 200
    assert out[14 + 14 * 6] is None  # NULL map replicates NULL


def test_merge_tiers_earlier_source_wins(ray_session, tmp_path):
    """t.merge PK semantics: a key already registered by an earlier
    source is skipped — the earlier tier's row (here: its n_points)
    survives, in BOTH merge orders."""
    import ray.data

    from grass_ray.pipelines.catalog import list_tier, merge_tiers
    from grass_ray.pipelines.tiers import build_tiers
    from grass_ray.sources.corpus import synth_corpus_table
    from grass_ray.state.manifest import TierStore

    root = str(tmp_path / "store_mw")
    # same seed => identical (source, doc_id) keys; different n_tok =>
    # distinguishable n_points per key after the 1m rollup
    ta = synth_corpus_table(12, seed=5, n_tok=100)
    tb = synth_corpus_table(12, seed=5, n_tok=200)
    build_tiers(ray.data.from_arrow(ta), root, tier_specs=(("a", 60),), num_partitions=3)
    build_tiers(ray.data.from_arrow(tb), root, tier_specs=(("b", 60),), num_partitions=3)
    store = TierStore(root)

    def keyed(tier):
        t = list_tier(store, tier).to_pandas()
        g = t.groupby(["source", "doc_id"])["n_points"].sum()
        return g.to_dict()

    ka, kb = keyed("a"), keyed("b")
    assert set(ka) == set(kb) and ka != kb
    merge_tiers(store, ["a", "b"], "m_ab")
    merge_tiers(store, ["b", "a"], "m_ba")
    assert keyed("m_ab") == ka
    assert keyed("m_ba") == kb


def test_cli_algebra_common_granularity(ray_session, tmp_path):
    # the t.rast.algebra module UX: expression over two store tiers,
    # -g analog refines the 1h operand onto the 1m grid (own Ray
    # session in a subprocess, like every CLI entry)
    import json
    import subprocess
    import sys

    from grass_ray.pipelines.tiers import build_tiers
    from grass_ray.sources.corpus import corpus_from_documents

    root = str(tmp_path / "store")
    build_tiers(
        corpus_from_documents("/root/testdata/sf0.001"),
        root,
        tier_specs=(("1m", 60), ("1h", 3600)),
        num_partitions=2,
    )
    out = str(tmp_path / "out")
    r = subprocess.run(
        [
            sys.executable, "-m", "grass_ray", "algebra", "R = A + B",
            "--tier", f"A={root}:1m", "--tier", f"B={root}:1h",
            "--out", out, "--common-granularity",
        ],
        capture_output=True, text=True, cwd="/root/repo",
        env={**__import__("os").environ, "RAY_ADDRESS": ""},
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["result"] == "R"
    import duckdb

    n_keys, n_pts = duckdb.sql(
        f"SELECT count(*), sum(len(windows)) "
        f"FROM read_parquet('{out}/*.parquet')"
    ).fetchone()
    assert n_keys == 500 and n_pts == 2803
