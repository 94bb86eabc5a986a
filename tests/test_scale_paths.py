"""Round-2 scale-path tests: distributed dedup/verify/closure plumbing.

Covers the VERDICT r1 'what's wrong' fixes: bucket-stable join schemas,
multi-round distributed connected components, size-capped embedding
buckets, and the centroid-partitioned IVF index."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def test_bucket_join_nullable_int_schema_stable(ray_session):
    """A left join whose int payload has matches in some buckets and not
    others must emit ONE schema: int64 with validity, in every bucket."""
    import ray.data

    from grass_ray.stages.join import bucket_join

    left = pd.DataFrame({"k": list(range(100)), "v": list(range(100))})
    # only even keys match: odd-key rows get null payload in whatever
    # bucket they hash into
    right = pd.DataFrame({"k": list(range(0, 100, 2)), "w": list(range(50))})
    out = bucket_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        key_cols=("k",),
        buckets=8,
        how="left",
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    # schema() on the dataset is also bucket-independent
    assert pa.types.is_integer(out.schema().base_schema.field("w").type)
    df = t.to_pandas()
    assert len(df) == 100
    matched = df[df["k"] % 2 == 0]
    assert (matched.sort_values("k")["w"].to_numpy() == np.arange(50)).all()
    assert df[df["k"] % 2 == 1]["w"].isna().all()


def test_semi_and_anti_join(ray_session):
    import ray.data

    from grass_ray.stages.join import anti_join, semi_join

    ds = ray.data.from_pandas(
        pd.DataFrame({"id": list(range(20)), "x": list(range(20))})
    )
    # duplicate keys on the keys side must not fan out rows
    keys = ray.data.from_pandas(pd.DataFrame({"id": [3, 5, 5, 7, 7, 7]}))
    semi = semi_join(ds, keys, key_cols=("id",)).to_pandas()
    assert sorted(semi["id"]) == [3, 5, 7]
    anti = anti_join(ds, keys, key_cols=("id",)).to_pandas()
    assert sorted(anti["id"]) == [i for i in range(20) if i not in (3, 5, 7)]


def test_connected_components_long_chain(ray_session):
    """Min-label propagation moves a label one edge per round: a 5-node
    chain needs >2 rounds to converge, exercising the distributed
    convergence loop (round-2 requirement)."""
    import ray.data

    from grass_ray.stages.dedup import connected_components

    chain = pa.table(
        {
            "id_a": pa.array([10, 20, 30, 40], type=pa.int64()),
            "id_b": pa.array([20, 30, 40, 50], type=pa.int64()),
        }
    )
    out = (
        connected_components(ray.data.from_arrow(chain))
        .to_pandas()
        .set_index("node")["component"]
        .to_dict()
    )
    assert out == {n: 10 for n in (10, 20, 30, 40, 50)}


def test_connected_components_chain_longer_than_max_iters(ray_session):
    """Pointer jumping makes rounds O(log diameter): a 40-edge chain
    (diameter 40 > max_iters=6 rounds allowed here) must still fully
    converge — plain one-hop propagation could not."""
    import ray.data

    from grass_ray.stages.dedup import connected_components

    n = 41
    chain = pa.table(
        {
            "id_a": pa.array(list(range(n - 1)), type=pa.int64()),
            "id_b": pa.array(list(range(1, n)), type=pa.int64()),
        }
    )
    out = (
        connected_components(ray.data.from_arrow(chain), max_iters=8)
        .to_pandas()
        .set_index("node")["component"]
        .to_dict()
    )
    assert out == {i: 0 for i in range(n)}


def test_embedding_dedup_capped_buckets(ray_session):
    """With target_bucket tiny, projection sub-bucketing kicks in
    (n_bits > 0) and near-identical pairs are still found — the
    bucket-size invariant from VERDICT r1 item 3."""
    import ray.data

    from grass_ray.stages.similarity import embedding_dedup

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    # 3 exact duplicate pairs: ids (0,100), (1,101), (2,102)
    vecs = np.concatenate([base, base[:3]], axis=0)
    ids = list(range(40)) + [100, 101, 102]
    t = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], type=pa.list_(pa.float32())
            ),
        }
    )
    kept, pairs_ds = embedding_dedup(
        ray.data.from_arrow(t),
        threshold=0.999,
        n_clusters=2,
        target_bucket=4,  # forces n_bits > 0 at 43 vectors
    )
    pairs = pairs_ds.to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert {(0, 100), (1, 101), (2, 102)} <= got
    kept_ids = set(kept.to_pandas()["vec_id"])
    assert {100, 101, 102} & kept_ids == set()
    assert {0, 1, 2} <= kept_ids


def test_ivf_build_and_search_prunes(ray_session, tmp_path):
    """ivf_build writes centroid-partitioned vectors; ivf_search reads
    only probed partitions and still finds the exact neighbor for an
    easy query."""
    import os

    import ray.data

    from grass_ray.stages.similarity import ivf_build, ivf_search

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((300, 8)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(list(range(300)), type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], type=pa.list_(pa.float32())
            ),
        }
    )
    idx = str(tmp_path / "ivf")
    cent = ivf_build(ray.data.from_arrow(t), idx, n_clusters=4, sample_size=300)
    assert cent.shape == (4, 8)
    parts = [
        d
        for d in os.listdir(os.path.join(idx, "vectors"))
        if d.startswith("centroid=")
    ]
    assert len(parts) >= 2  # really partitioned by centroid
    # query = an existing vector: its own id must rank first
    res = ivf_search(idx, vecs[17:18], k=5, nprobe=2).to_pandas()
    assert int(res[res["rank"] == 1]["vec_id"].iloc[0]) == 17


def test_exact_dedup_distributed_plan(ray_session):
    """exact_dedup ties (same text, several ids) resolve to the min id
    through the aggregate+semi-join plan, including at a few hundred
    rows spread over blocks."""
    import ray.data

    from grass_ray.stages.dedup import exact_dedup

    n = 300
    texts = [f"text {i % 50}" for i in range(n)]  # 50 groups of 6 dups
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), type=pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = exact_dedup(ray.data.from_arrow(t)).to_pandas()
    assert sorted(out["doc_id"]) == list(range(50))
