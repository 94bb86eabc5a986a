"""Flagship tier pipeline: build → read-back → cascade invariant → resume."""

from __future__ import annotations

import shutil

import numpy as np
import pyarrow as pa
import pytest

from grass_ray.sources.corpus import synth_corpus_table
from grass_ray.stages.codec_stage import DecodeTier, EncodeTier
from grass_ray.stages.rollup import rollup_batch
from grass_ray.pipelines.tiers import build_tiers, read_tier
from grass_ray.state.manifest import TierStore

METHODS = ("count", "sum", "minimum", "maximum", "average")


def test_codec_stage_roundtrip():
    t = synth_corpus_table(25, seed=21)
    nested = rollup_batch(t, 60, METHODS, nested=True)
    enc = EncodeTier(METHODS)(nested)
    assert "windows_enc" in enc.column_names
    dec = DecodeTier(METHODS)(enc)
    nd, dd = nested.to_pydict(), dec.to_pydict()
    assert dd["windows"] == nd["windows"]
    for m in METHODS:
        assert dd[m] == nd[m], m


@pytest.fixture()
def tier_root(tmp_path):
    root = str(tmp_path / "tiers")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_build_tiers_end_to_end(ray_session, tier_root):
    import ray.data

    t = synth_corpus_table(60, seed=33, n_tok=2880)  # 2 "days" of minutes
    ds = ray.data.from_arrow(t)
    res = build_tiers(ds, tier_root, num_partitions=4)
    assert sorted(res) == ["1d", "1h", "1m"]
    store = TierStore(tier_root)
    assert store.tiers() == ["1d", "1h", "1m"]
    info = store.info("1m")
    assert info["n_rows"] == 60
    assert info["n_points"] == 60 * 48  # 2880/60 windows per doc

    # read back the 1d tier (decoded) and compare against direct rollup
    day = (
        read_tier(store, "1d", value_cols=METHODS)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    direct = (
        rollup_batch(t, 60 * 60 * 24, METHODS, nested=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(day["doc_id"]) == list(direct["doc_id"])
    for m in ("sum", "count", "minimum", "maximum", "average"):
        for a, b in zip(day[m], direct[m]):
            assert list(a) == list(b), m


def test_resume_skips_committed(ray_session, tier_root):
    import ray.data

    t = synth_corpus_table(40, seed=7, n_tok=100)
    ds = ray.data.from_arrow(t)
    res1 = build_tiers(
        ds, tier_root, tier_specs=(("1m", 60),), num_partitions=8
    )
    store = TierStore(tier_root)
    committed = store.committed_partitions("1m")
    assert committed == set(res1["1m"])
    info1 = store.info("1m")

    # simulate a partially-failed earlier run: drop 3 partitions' commits
    dropped = sorted(committed)[:3]
    for p in dropped:
        store.unregister_partition("1m", p)

    res2 = build_tiers(
        ds, tier_root, tier_specs=(("1m", 60),), num_partitions=8
    )
    # only the dropped partitions were rebuilt
    assert sorted(res2["1m"]) == dropped
    info2 = store.info("1m")
    assert info2["n_rows"] == info1["n_rows"]  # no double-counting
    assert info2["n_points"] == info1["n_points"]

    # a third run is a no-op
    res3 = build_tiers(
        ds, tier_root, tier_specs=(("1m", 60),), num_partitions=8
    )
    assert res3["1m"] == []


def test_manifest_catalog_ops(ray_session, tier_root):
    import ray.data

    t = synth_corpus_table(10, seed=9, n_tok=100)
    build_tiers(
        ray.data.from_arrow(t), tier_root, tier_specs=(("1m", 60),), num_partitions=2
    )
    store = TierStore(tier_root)
    m = store.manifest("1m")
    assert m.num_rows == len(store.committed_partitions("1m"))
    assert all(m.column("done").to_pylist())
    lineage = m.column("lineage")[0].as_py()
    assert "engine_version" in lineage
    store.rename_tier("1m", "minute")
    assert store.tiers() == ["minute"]
    store.remove_tier("minute")
    assert store.tiers() == []


def test_onepass_partial_tier_resume(ray_session, tier_root):
    """Crash between tier commits: 1m committed, 1h missing for one
    partition -> re-run recomputes that partition, never double-counts."""
    import os

    import ray.data

    t = synth_corpus_table(40, seed=17, n_tok=2880)
    ds = ray.data.from_arrow(t)
    build_tiers(ds, tier_root, docs_per_partition=10)
    store = TierStore(tier_root)
    info_before = {t_: store.info(t_) for t_ in store.tiers()}
    # simulate the crash: remove one partition's 1h+1d commits (1m stays)
    victim = sorted(store.committed_partitions("1h"))[0]
    for tier in ("1h", "1d"):
        store.unregister_partition(tier, victim)
    res = build_tiers(ray.data.from_arrow(t), tier_root, docs_per_partition=10)
    assert res["1h"] == [victim] and res["1d"] == [victim]
    assert res["1m"] == []  # already committed -> skipped
    for tier in ("1m", "1h", "1d"):
        assert store.info(tier) == info_before[tier], tier


def test_incremental_register(ray_session, tier_root):
    """t.register analog: late-arriving docs land in new range partitions;
    a re-run builds only those — incremental ingest with no recompute of
    committed data (register.py:37-470 batched-registration analog)."""
    import ray.data

    first = synth_corpus_table(100, seed=3, n_tok=120)
    build_tiers(ray.data.from_arrow(first), tier_root, docs_per_partition=20)
    store = TierStore(tier_root)
    parts1 = store.committed_partitions("1m")
    n1 = store.info("1m")["n_rows"]
    assert n1 == 100

    # 60 new docs arrive (doc index continues -> new partitions)
    more = synth_corpus_table(60, seed=3, n_tok=120, start_doc=100)
    both = pa.concat_tables([first, more])
    res = build_tiers(ray.data.from_arrow(both), tier_root, docs_per_partition=20)
    new_parts = set(res["1m"])
    assert new_parts == store.committed_partitions("1m") - parts1
    assert store.info("1m")["n_rows"] == 160
    # committed partitions were not touched
    assert parts1 <= store.committed_partitions("1m")


def test_tier_metadata_support(ray_session, tier_root):
    """t.support analog: descriptive tier metadata CRUD."""
    import ray.data

    t = synth_corpus_table(10, seed=2, n_tok=100)
    build_tiers(ray.data.from_arrow(t), tier_root, tier_specs=(("1m", 60),))
    store = TierStore(tier_root)
    store.set_metadata("1m", title="minute tier", semantic_label="tokens")
    assert store.get_metadata("1m")["title"] == "minute tier"
    store.set_metadata("1m", title="renamed")
    md = store.get_metadata("1m")
    assert md["title"] == "renamed" and md["semantic_label"] == "tokens"


def test_parallel_equals_serial(ray_session, tier_root):
    """Reference test strategy (§5: nprocs=4 == serial): identical tier
    results regardless of block structure / parallelism."""
    import ray.data

    t = synth_corpus_table(30, seed=44, n_tok=700)
    one_block = ray.data.from_arrow(t)
    many_blocks = ray.data.from_arrow(t).repartition(8)
    r1 = build_tiers(one_block, tier_root + "_a", docs_per_partition=7)
    r2 = build_tiers(many_blocks, tier_root + "_b", docs_per_partition=7)
    from grass_ray.pipelines.tiers import read_tier
    from grass_ray.state.manifest import TierStore as TS

    for tier in ("1m", "1h", "1d"):
        a = (
            read_tier(TS(tier_root + "_a"), tier)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            read_tier(TS(tier_root + "_b"), tier)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for col in ("windows", "sum", "count", "average"):
            assert [list(x) for x in a[col]] == [list(x) for x in b[col]], (tier, col)
    shutil.rmtree(tier_root + "_a", ignore_errors=True)
    shutil.rmtree(tier_root + "_b", ignore_errors=True)


def test_empty_doc_through_pipeline(ray_session, tier_root):
    t = pa.table(
        {
            "doc_id": pa.array(["d0000000", "d0000001"]),
            "tokens": pa.array([[], [5, 6, 7]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([0, 3], type=pa.int32()),
            "source": pa.array(["s", "s"]),
        }
    )
    import ray.data

    build_tiers(ray.data.from_arrow(t), tier_root, tier_specs=(("1m", 2),))
    store = TierStore(tier_root)
    out = read_tier(store, "1m").to_pandas().set_index("doc_id")
    assert list(out.loc["d0000000", "windows"]) == []
    assert list(out.loc["d0000001", "sum"]) == [11.0, 7.0]


def test_build_tiers_waves_and_kill_resume(ray_session, tier_root, tmp_path):
    """Wave builds commit incrementally; resume skips finished waves."""
    import ray.data
    from grass_ray.pipelines.tiers import build_tiers_waves

    corpus_dir = str(tmp_path / "wavecorpus")
    t = synth_corpus_table(120, seed=77, n_tok=120)
    # write as several files so footer ranges drive wave selection
    ray.data.from_arrow(t).repartition(6).write_parquet(corpus_dir)
    res = build_tiers_waves(
        corpus_dir, tier_root, docs_per_partition=10, partitions_per_wave=4
    )
    store = TierStore(tier_root)
    assert store.info("1m")["n_rows"] == 120
    assert sorted(res["1m"]) == sorted(store.committed_partitions("1m"))

    # drop a mid-range partition (simulated partial wave) and resume
    store.unregister_partition("1m", 5)
    store.unregister_partition("1h", 5)
    store.unregister_partition("1d", 5)
    res2 = build_tiers_waves(
        corpus_dir, tier_root, docs_per_partition=10, partitions_per_wave=4
    )
    assert res2["1m"] == [5]
    assert store.info("1m")["n_rows"] == 120  # no double count
    # direct equality of the repaired partition against fresh rollup
    out = (
        read_tier(store, "1m")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    direct = (
        rollup_batch(t, 60, ("count", "sum", "minimum", "maximum", "average"), nested=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == list(direct["doc_id"])
    for a, b in zip(out["sum"], direct["sum"]):
        assert list(a) == list(b)


def test_read_tier_window_range_prune(ray_session, tier_root):
    """window_range prunes by manifest extents + parquet footer stats."""
    import ray.data

    # two partitions with disjoint window ranges: short docs (1 window)
    # vs long docs (48 windows at 1m over 2880 tokens)
    short = synth_corpus_table(20, seed=1, n_tok=60)
    long = synth_corpus_table(20, seed=1, n_tok=2880, start_doc=2000)
    both = pa.concat_tables([short, long])
    build_tiers(ray.data.from_arrow(both), tier_root, tier_specs=(("1m", 60),), docs_per_partition=100)
    store = TierStore(tier_root)
    full = read_tier(store, "1m").to_pandas()
    assert len(full) == 40
    # only windows >= 10 exist in the long-doc partition
    pruned = read_tier(store, "1m", window_range=(10, 47)).to_pandas()
    assert set(pruned["doc_id"]) == set(
        long.column("doc_id").to_pylist()
    )
    # empty range -> empty dataset, no read
    none = read_tier(store, "1m", window_range=(1000, 2000)).to_pandas()
    assert len(none) == 0


def test_build_tiers_with_holistic_tier0(ray_session, tier_root):
    """median at tier 0 only: cascaded tiers drop it (holistic is
    non-decomposable, F7), schemas promote cleanly in the one-pass."""
    import ray.data

    t = synth_corpus_table(20, seed=6, n_tok=2880)
    build_tiers(
        ray.data.from_arrow(t),
        tier_root,
        methods=("count", "sum", "minimum", "maximum", "average", "median"),
    )
    store = TierStore(tier_root)
    m1 = read_tier(
        store, "1m",
        value_cols=("count", "sum", "minimum", "maximum", "average", "median"),
    ).to_pandas()
    assert all(len(x) > 0 for x in m1["median"])
    direct = rollup_batch(t, 60, ("median",), nested=True).to_pydict()
    got = m1.sort_values("doc_id").reset_index(drop=True)
    assert [list(v) for v in got["median"]] == direct["median"]


def test_retention_policy(ray_session, tier_root):
    """Age out windows below a cutoff: whole-partition drops + boundary
    trims, totals consistent, reads reflect the policy."""
    import ray.data

    from grass_ray.pipelines.retention import apply_retention

    # docs in distinct partitions with distinct window ranges: short docs
    # end at window 0; long docs span windows 0..47
    short = synth_corpus_table(20, seed=1, n_tok=60)
    long = synth_corpus_table(20, seed=1, n_tok=2880, start_doc=2000)
    both = pa.concat_tables([short, long])
    build_tiers(
        ray.data.from_arrow(both), tier_root, tier_specs=(("1m", 60),),
        docs_per_partition=100,
    )
    store = TierStore(tier_root)
    before = store.info("1m")
    assert before["n_points"] == 20 * 1 + 20 * 48

    res = apply_retention(store, "1m", min_window=10)
    # the short-doc partition (all windows 0) drops entirely;
    # the long-doc partition gets trimmed to windows 10..47
    assert len(res["dropped"]) == 1
    assert len(res["trimmed"]) == 1
    after = store.info("1m")
    assert after["n_points"] == 20 * 38
    assert after["window_start"] == 10
    out = read_tier(store, "1m").to_pandas()
    assert len(out) == 20
    for ws in out["windows"]:
        assert min(ws) >= 10
    # values of surviving windows unchanged vs direct rollup
    direct = rollup_batch(long, 60, ("count", "sum", "minimum", "maximum", "average"), nested=True).to_pydict()
    got = out.sort_values("doc_id").reset_index(drop=True)
    for i in range(20):
        assert list(got["sum"][i]) == direct["sum"][i][10:]
    # idempotent second sweep
    res2 = apply_retention(store, "1m", min_window=10)
    assert res2["dropped"] == [] and res2["trimmed"] == []


def test_range_partition_non_numeric_ids(ray_session, tier_root):
    """Foreign corpora with arbitrary doc ids still build (hash fallback)."""
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array(["alpha", "beta", "d12", "weird-id!"]),
            "tokens": pa.array([[1, 2]] * 4, type=pa.list_(pa.int32())),
            "n_tok": pa.array([2] * 4, type=pa.int32()),
            "source": pa.array(["s"] * 4),
        }
    )
    build_tiers(ray.data.from_arrow(t), tier_root, tier_specs=(("1m", 2),))
    store = TierStore(tier_root)
    assert store.info("1m")["n_rows"] == 4
    out = read_tier(store, "1m").to_pandas()
    assert sorted(out["doc_id"]) == ["alpha", "beta", "d12", "weird-id!"]


def test_read_tier_unknown_is_empty(ray_session, tier_root):
    store = TierStore(tier_root)
    out = read_tier(store, "nope").to_pandas()
    assert len(out) == 0


def test_chained_strategy_matches_onepass(ray_session, tier_root):
    """strategy='chained' (tier k read back + decoded from tier k-1)
    produces identical tiers to the one-pass build."""
    import ray.data

    t = synth_corpus_table(30, seed=21, n_tok=2880)
    build_tiers(ray.data.from_arrow(t), tier_root + "_one")
    build_tiers(
        ray.data.from_arrow(t), tier_root + "_ch", strategy="chained",
        num_partitions=4,
    )
    for tier in ("1m", "1h", "1d"):
        a = (
            read_tier(TierStore(tier_root + "_one"), tier)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            read_tier(TierStore(tier_root + "_ch"), tier)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(a["doc_id"]) == list(b["doc_id"]), tier
        for col in ("windows", "count", "sum", "minimum", "maximum", "average"):
            assert [list(x) for x in a[col]] == [list(x) for x in b[col]], (tier, col)
    shutil.rmtree(tier_root + "_one", ignore_errors=True)
    shutil.rmtree(tier_root + "_ch", ignore_errors=True)


def test_retention_policy_sweep(ray_session, tier_root):
    import ray.data

    from grass_ray.pipelines.retention import apply_retention_policy

    t = synth_corpus_table(10, seed=4, n_tok=2880)
    build_tiers(ray.data.from_arrow(t), tier_root)
    store = TierStore(tier_root)
    res = apply_retention_policy(store, {"1m": 24, "1h": 0, "1d": 0})
    assert res["1m"]["trimmed"] or res["1m"]["dropped"]
    assert store.info("1m")["window_start"] == 24
    assert store.info("1h")["window_start"] == 0  # untouched


def test_list_tier_unknown_empty(ray_session, tier_root):
    from grass_ray.pipelines.catalog import list_tier

    store = TierStore(tier_root)
    assert list_tier(store, "ghost").num_rows == 0
    assert list_tier(store, "ghost", fmt="json") == "[]"


def test_compact_tier(ray_session, tier_root):
    """Compaction merges a partition's small files into one; decoded
    points, manifest stats and the resume contract are all unchanged."""
    from grass_ray.pipelines.retention import compact_tier
    from grass_ray.sources.corpus import synth_corpus
    from grass_ray.state.manifest import _parquet_files

    import os

    import pyarrow.parquet as pq

    def corpus():
        return synth_corpus(120, n_tok=120, seed=11, docs_per_block=20)

    build_tiers(
        corpus(), tier_root, tier_specs=(("1m", 60),), docs_per_partition=40
    )
    store = TierStore(tier_root)
    parts = sorted(store.committed_partitions("1m"))
    pdirs = [store.partition_dir("1m", p) for p in parts]
    # fragment two partitions the way multi-block staged writes do:
    # several small parquet files holding disjoint row slices
    for d in pdirs[:2]:
        f = _parquet_files(d)[0]
        t = pq.read_table(f)
        h = t.num_rows // 2
        pq.write_table(t.slice(0, h), os.path.join(d, "frag_a.parquet"))
        pq.write_table(t.slice(h), os.path.join(d, "frag_b.parquet"))
        os.remove(f)
    assert sum(len(_parquet_files(d)) >= 2 for d in pdirs) == 2

    def decoded():
        return (
            read_tier(store, "1m", value_cols=METHODS)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def manifest_by_part():
        m = store.manifest("1m").to_pydict()
        return {
            m["partition"][i]: {
                k: m[k][i]
                for k in (
                    "window_start", "window_end", "n_rows", "n_points",
                    "vmin", "vmax",
                )
            }
            for i in range(len(m["partition"]))
        }

    before, m_before = decoded(), manifest_by_part()
    done = compact_tier(store, "1m")
    assert done, "nothing compacted"
    for d in pdirs:
        assert len(_parquet_files(d)) == 1
    after = decoded()
    assert list(after["doc_id"]) == list(before["doc_id"])
    for col in ("windows",) + METHODS:
        assert [list(x) for x in after[col]] == [
            list(x) for x in before[col]
        ], col
    assert manifest_by_part() == m_before
    # resume still sees every partition committed; re-compact is a no-op
    res = build_tiers(
        corpus(), tier_root, tier_specs=(("1m", 60),),
        docs_per_partition=40, resume=True,
    )
    assert res["1m"] == []
    assert compact_tier(store, "1m") == []


def test_footer_stats_fallback_paths(tmp_path, ray_session, monkeypatch):
    """The footer-statistics stats reader must agree with a naive data
    scan on every regime: uniform n_points (pure-footer shortcut),
    varying n_points (single-column read), all-null stat columns,
    statistics-disabled files (full fallback), and the Ray-task
    fan-out above the file threshold."""
    import os

    import pyarrow.parquet as pq

    import grass_ray.state.manifest as M

    def write(dirname, tables, **kw):
        d = str(tmp_path / dirname)
        os.makedirs(d, exist_ok=True)
        for i, t in enumerate(tables):
            pq.write_table(t, os.path.join(d, f"f{i}.parquet"), **kw)
        return d

    def naive(d):
        t = pa.concat_tables([pq.read_table(f) for f in M._parquet_files(d)])
        import pyarrow.compute as pc

        def agg(col, fn):
            if col not in t.column_names:
                return None
            return fn(t.column(col)).as_py()

        return (
            t.num_rows,
            int(pc.sum(t.column("n_points")).as_py() or 0)
            if "n_points" in t.column_names
            else 0,
            agg("wstart", pc.min),
            agg("wend", pc.max),
            agg("vmin", pc.min),
            agg("vmax", pc.max),
        )

    def folded(d):
        acc = {}
        for f in M._parquet_files(d):
            M._fold_partial(acc, 0, M._file_footer_partial(f))
        return tuple(acc[0])

    uniform = pa.table(
        {
            "wstart": pa.array([0, 0, 1], pa.int64()),
            "wend": pa.array([5, 7, 9], pa.int64()),
            "vmin": pa.array([1.0, -2.0, 0.5]),
            "vmax": pa.array([4.0, 9.0, 2.5]),
            "n_points": pa.array([6, 6, 6], pa.int64()),
        }
    )
    varying = pa.table(
        {
            "wstart": pa.array([2, 3], pa.int64()),
            "wend": pa.array([8, 4], pa.int64()),
            "vmin": pa.array([None, None], pa.float64()),  # all-null
            "vmax": pa.array([1.0, None]),
            "n_points": pa.array([7, 2], pa.int64()),
        }
    )
    d1 = write("uniform", [uniform, uniform])
    assert folded(d1) == naive(d1)
    d2 = write("varying", [varying, uniform])
    assert folded(d2) == naive(d2)
    d3 = write("nostats", [varying, uniform], write_statistics=False)
    assert folded(d3) == naive(d3)

    # Ray fan-out path: force the threshold down so 3 files use it
    monkeypatch.setattr(M, "_FOOTER_STATS_RAY_THRESHOLD", 2)
    fk = [(f, ("t", 0)) for f in M._parquet_files(d2)]
    via_ray = M._footer_stats_by_key(fk)[("t", 0)]
    assert tuple(via_ray) == naive(d2)


def test_partition_swap_recovery(ray_session, tier_root):
    """A crash between the swap renames (old dir moved aside, staged
    not yet in place) must be recoverable: recover_swaps restores the
    old data; when the swap completed, the leftover .old dir is
    garbage-collected.  Readers never see .old dirs (dot-prefixed)."""
    import os
    import shutil

    from grass_ray.sources.corpus import synth_corpus

    build_tiers(
        synth_corpus(40, n_tok=120, seed=3), tier_root,
        tier_specs=(("1m", 60),),
    )
    store = TierStore(tier_root)
    p = sorted(store.committed_partitions("1m"))[0]
    final = store.partition_dir("1m", p)
    before = (
        read_tier(store, "1m", value_cols=METHODS)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    # simulate the crash window: old moved aside, new never arrived
    old = os.path.join(
        os.path.dirname(final), f".old-part={p}-deadbe"
    )
    os.rename(final, old)
    store.recover_swaps("1m")
    assert os.path.isdir(final) and not os.path.isdir(old)
    after = (
        read_tier(store, "1m", value_cols=METHODS)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(after["doc_id"]) == list(before["doc_id"])

    # completed swap: final exists, stale .old is garbage
    shutil.copytree(final, old)
    store.recover_swaps("1m")
    assert os.path.isdir(final) and not os.path.isdir(old)


def test_build_calendar_tier_roundtrip_resume(ray_session, tier_root):
    """Calendar-granularity tier build (round 5): month windows over
    multi-month wall-clock events thread through the SAME committed
    store — nest, encode, footer stats, atomic commits, resume.  The
    decoded read-back must match a numpy month rollup exactly, and a
    re-run must commit nothing new."""
    import ray.data

    from grass_ray.pipelines.tiers import build_calendar_tier

    rng = np.random.default_rng(11)
    n = 4000
    # five months spanning a year boundary: 2023-11 .. 2024-03
    ts = np.datetime64("2023-11-03", "us") + (
        rng.integers(0, 150 * 24 * 3600, n) * 1_000_000
    ).astype("timedelta64[us]")
    vals = rng.integers(-50, 500, n).astype(np.int64)
    et = rng.choice(["a", "b", "c"], n)
    t = pa.table(
        {"event_type": pa.array(et), "ts": pa.array(ts), "value": pa.array(vals)}
    )
    ds = ray.data.from_arrow(t).repartition(4)
    res = build_calendar_tier(
        ds, tier_root, unit="months", methods=METHODS, num_partitions=4
    )
    assert sum(len(v) for v in res.values()) > 0
    store = TierStore(tier_root)
    back = read_tier(
        store, "1months", encoded=True, value_cols=METHODS
    ).to_pandas()
    got = {}
    for _, r in back.iterrows():
        for w, c, s, mn, mx in zip(
            r["windows"], r["count"], r["sum"], r["minimum"], r["maximum"]
        ):
            got[(r["event_type"], int(w))] = (
                int(c), float(s), float(mn), float(mx)
            )
    # numpy reference: months-since-epoch index
    mon = ts.astype("datetime64[M]").astype(np.int64)
    want = {}
    for k in np.unique(et):
        for m in np.unique(mon):
            sel = (et == k) & (mon == m)
            if sel.any():
                v = vals[sel]
                want[(k, int(m))] = (
                    len(v), float(v.sum()), float(v.min()), float(v.max())
                )
    assert got == want
    assert len({w for _, w in got}) >= 5  # really multi-month
    # resume: nothing left to commit
    res2 = build_calendar_tier(
        ds, tier_root, unit="months", methods=METHODS, num_partitions=4
    )
    assert res2 == {"1months": []}


def test_synth_wav_lcg_decode_exact(ray_session):
    """The LCG WAV fixture (round 5 audio exact twin): the stdlib-wave
    decode must hand back exactly the integer LCG sequence, and
    audio_features' rms/zcr/duration must equal the brute-force
    formulas the SQL oracle replays."""
    import ray.data

    from grass_ray.stages.multimodal import (
        DecodeMedia,
        audio_features,
        synth_wav_lcg,
    )

    n, seed = 777, 5
    k = np.arange(n, dtype=np.int64)
    x = ((1103515245 * (k + 7919 * seed) + 12345) % 65536) - 32768
    rows = pa.table(
        {
            "media_id": pa.array([seed], type=pa.int64()),
            "payload": pa.array([synth_wav_lcg(n, seed)], type=pa.binary()),
            "media_type": pa.array(["audio"]),
            "width": pa.array([0], type=pa.int32()),
            "height": pa.array([0], type=pa.int32()),
            "sample_rate": pa.array([0], type=pa.int32()),
            "n_frames": pa.array([0], type=pa.int32()),
        }
    )
    dec = DecodeMedia(fake=False)(rows)
    got = np.asarray(dec.column("samples")[0].as_py(), dtype=np.int64)
    assert np.array_equal(got, x)
    out = audio_features(
        ray.data.from_arrow(rows).map_batches(
            DecodeMedia,
            fn_constructor_kwargs={"fake": False},
            batch_format="pyarrow",
            concurrency=1,
        )
    ).to_pandas()
    assert out["n_frames"][0] == n
    assert out["duration_s"][0] == n / 8000.0
    xf = x.astype(np.float64)
    assert out["rms"][0] == np.sqrt(np.add.reduce(xf * xf) / n)
    assert out["zcr"][0] == float((xf[1:] * xf[:-1] < 0).sum()) / n


def test_resize_images_pil_path():
    """method='pil' is a real resampled resize when Pillow is present,
    and a LOUD ImportError (not a silent fallback) when it is not."""
    from grass_ray.stages.multimodal import DecodeMedia, ResizeImages, synth_media

    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(ImportError, match="Pillow"):
            ResizeImages(method="pil")
        return
    t = synth_media(4, payload_bytes=4096)
    dec = DecodeMedia(fake=True)(t)
    out = ResizeImages(out_w=16, out_h=16, method="pil")(dec)
    assert out.column("resized_w")[0].as_py() == 16
    assert all(len(p) == 256 for p in out.column("pixels_resized").to_pylist())
