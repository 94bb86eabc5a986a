"""Similarity search over an embedding column (``list<float>``).

* :func:`ann_topk` — brute-force cosine top-k: the query matrix is
  broadcast once (``ray.put``); each batch does one normalized matmul
  and emits its local top-k; a tiny driver-side merge keeps the global
  top-k.  Exact baseline.
* :func:`ivf_topk` — the scale path: k-means-lite centroids fitted on a
  sample, every vector assigned to its nearest centroid in a
  ``map_batches`` pass, queries probe only the ``nprobe`` nearest
  centroids' partitions.  Approximate, ~centroids/nprobe× less compute.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    lens = col.value_lengths().to_numpy(zero_copy_only=False)
    dim = int(lens[0]) if len(lens) else 0
    return flat.reshape(-1, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def ann_topk(ds, queries: np.ndarray, k: int = 10, *, id_col="vec_id", vec_col="embedding"):
    """Exact cosine top-k: returns pa.Table (query_id, vec_id, score, rank).

    `queries`: (nq, dim) float array.  Per-batch local top-k bounds the
    driver merge to nq*k rows per block.
    """
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float32))
    qref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        ids = np.asarray(batch.column(id_col).to_pylist())
        m = _normalize(_to_matrix(batch.column(vec_col)))
        scores = qm @ m.T  # (nq, nb)
        kk = min(k, m.shape[0])
        idx = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        out_q, out_v, out_s = [], [], []
        for qi in range(qm.shape[0]):
            sel = idx[qi]
            out_q.extend([qi] * len(sel))
            out_v.extend(ids[sel].tolist())
            out_s.extend(scores[qi, sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_v),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    rows = []
    for qi, grp in cand.groupby("query_id"):
        top = grp.nlargest(k, "score").reset_index(drop=True)
        for rank, r in top.iterrows():
            rows.append((qi, r[id_col], float(r["score"]), rank + 1))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            id_col: pa.array([r[1] for r in rows]),
            "score": pa.array([r[2] for r in rows], type=pa.float64()),
            "rank": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )


def kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8, seed: int = 42):
    """Tiny k-means (driver-side, on a sample) for IVF centroids."""
    rng = np.random.default_rng(seed)
    X = _normalize(sample.astype(np.float32))
    cent = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ cent.T, axis=1)
        for c in range(len(cent)):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    *,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    id_col="vec_id",
    vec_col="embedding",
    seed: int = 42,
):
    """IVF-style approximate top-k: probe only nprobe nearest centroids."""
    import ray

    sample = ds.limit(sample_size).to_pandas()
    X = np.stack(sample[vec_col].to_numpy())
    cent = kmeans_lite(X, n_clusters, seed=seed)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    cref = ray.put((cent, q, probe))

    def local(batch: pa.Table) -> pa.Table:
        cent_, q_, probe_ = ray.get(cref)
        ids = np.asarray(batch.column(id_col).to_pylist())
        m = _normalize(_to_matrix(batch.column(vec_col)))
        assign = np.argmax(m @ cent_.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi in range(q_.shape[0]):
            mask = np.isin(assign, probe_[qi])
            if not mask.any():
                continue
            sub = m[mask]
            scores = sub @ q_[qi]
            kk = min(k, len(scores))
            sel = np.argpartition(-scores, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_v.extend(ids[mask][sel].tolist())
            out_s.extend(scores[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_v),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    cand = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    rows = []
    for qi, grp in cand.groupby("query_id"):
        top = grp.nlargest(k, "score").reset_index(drop=True)
        for rank, r in top.iterrows():
            rows.append((qi, r[id_col], float(r["score"]), rank + 1))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            id_col: pa.array([r[1] for r in rows]),
            "score": pa.array([r[2] for r in rows], type=pa.float64()),
            "rank": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )


def embedding_dedup(ds, *, threshold=0.95, id_col="vec_id", vec_col="embedding", n_clusters=16, seed=42):
    """Embedding-cosine near-dup: bucket by nearest centroid, compare
    within buckets, drop the larger id of any pair above threshold."""
    import ray

    sample = ds.limit(2048).to_pandas()
    X = np.stack(sample[vec_col].to_numpy())
    cent = kmeans_lite(X, n_clusters, seed=seed)
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        cent_ = ray.get(cref)
        m = _normalize(_to_matrix(batch.column(vec_col)))
        a = np.argmax(m @ cent_.T, axis=1).astype(np.int32)
        return batch.append_column("cluster", pa.array(a))

    def pairs(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist())
        m = _normalize(_to_matrix(batch.column(vec_col)))
        s = m @ m.T
        iu = np.triu_indices(len(ids), k=1)
        hit = s[iu] >= threshold
        return pa.table(
            {
                "id_a": pa.array(np.minimum(ids[iu[0][hit]], ids[iu[1][hit]])),
                "id_b": pa.array(np.maximum(ids[iu[0][hit]], ids[iu[1][hit]])),
                "cosine": pa.array(s[iu][hit], type=pa.float64()),
            }
        )

    dup_pairs = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(pairs, batch_format="pyarrow")
    ).to_pandas()
    drop = set(dup_pairs["id_b"]) if len(dup_pairs) else set()
    dref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(dref)
        mask = pa.array([i not in d for i in batch.column(id_col).to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow"), dup_pairs
