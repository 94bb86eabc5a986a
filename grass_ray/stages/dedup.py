"""Deduplication family: exact, MinHash-LSH, SimHash, n-gram Jaccard.

The reference's only dedup is identity-level (duplicate map registration
blocked by the catalog primary key, ``t.merge``/``register_map``,
SURVEY §2.13); a training-data engine needs content-level dedup as a
first-class wide operator:

* **exact**: content hash in a vectorized ``map_batches`` →
  ``groupby(hash)`` keep the smallest doc_id.  One shuffle over
  (hash, id) pairs only.
* **MinHash-LSH**: shingle → minhash signature (vectorized over
  permutations) → band rows → ``groupby(band, band_hash)`` buckets →
  candidate pairs → exact Jaccard verify → survivors = docs not marked
  duplicate of a smaller id.
* **SimHash**: 64-bit weighted sign hash; near-dup = hamming ≤ r via
  band buckets (pigeonhole: 4 bands of 16 bits → any pair with ≤3
  differing bands collides in ≥1 band).
* verification (`jaccard`) is exact on shingle sets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from grass_ray.functions.textstats import WORD_RE, _stable_hash64, jaccard, shingles

# 64-bit odd multipliers for minhash permutations h_i(x) = (a_i*x + b_i)
_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64) | 1
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a.astype(np.uint64), b.astype(np.uint64)


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) minhash signature of a shingle id array (vectorized
    perms × shingles matrix, uint64 wraparound universal hashing)."""
    if len(sh) == 0:
        return np.full(len(a), np.iinfo(np.int64).max, dtype=np.int64)
    x = sh.astype(np.uint64)
    with np.errstate(over="ignore"):
        m = a[:, None] * x[None, :] + b[:, None]
    return (m >> np.uint64(1)).min(axis=1).astype(np.int64)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(ds, col: str = "text", out: str = "content_hash"):
    def kernel(batch: pa.Table) -> pa.Table:
        hashes = [
            _stable_hash64(t) for t in batch.column(col).to_pylist()
        ]
        return batch.append_column(out, pa.array(hashes, type=pa.int64()))

    return ds.map_batches(kernel, batch_format="pyarrow")


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Keep the smallest id per identical content (hash-partition +
    per-group first) — the canonical exact-dedup plan."""
    hashed = add_content_hash(ds, col)

    def first_per_group(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(batch, sort_keys=[(id_col, "ascending")])
        return batch.take(order[:1])

    return hashed.groupby("content_hash").map_groups(
        first_per_group, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup
# ---------------------------------------------------------------------------


class MinHasher:
    """Actor-pool stage: text -> minhash band rows (one per band)."""

    def __init__(self, num_perm=64, bands=16, k_shingle=5, id_col="doc_id", text_col="text"):
        assert num_perm % bands == 0
        self.a, self.b = _perm_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = k_shingle
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_band, out_bh = [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_signature(shingles(t, self.k), self.a, self.b)
            bs = sig.reshape(self.bands, self.rows_per_band)
            for bi in range(self.bands):
                out_id.append(i)
                out_band.append(bi)
                out_bh.append(
                    _stable_hash64(",".join(map(str, bs[bi].tolist())))
                )
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_bh, type=pa.int64()),
            }
        )


def minhash_candidates(ds, *, num_perm=64, bands=16, k_shingle=5, id_col="doc_id", text_col="text"):
    """(id_a < id_b) candidate pairs sharing at least one LSH bucket."""
    band_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, bands=bands, k_shingle=k_shingle,
            id_col=id_col, text_col=text_col,
        ),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 8),
    )

    def pairs(batch: pa.Table) -> pa.Table:
        import itertools

        ids = sorted(set(batch.column(id_col).to_pylist()))
        a_out, b_out = [], []
        for x, y in itertools.combinations(ids, 2):
            a_out.append(x)
            b_out.append(y)
        return pa.table({"id_a": pa.array(a_out), "id_b": pa.array(b_out)})

    cand = band_rows.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pyarrow"
    )
    # dedupe pairs produced by multiple buckets: the candidate set is
    # tiny relative to the corpus (that's the point of LSH), so a
    # driver-side distinct beats a second cluster shuffle
    df = cand.to_pandas().drop_duplicates(["id_a", "id_b"])
    import ray.data

    return ray.data.from_pandas(df.reset_index(drop=True))


def minhash_dedup(ds, *, threshold=0.8, num_perm=64, bands=16, k_shingle=5, id_col="doc_id", text_col="text", components=False):
    """Near-dup removal: verify candidates with exact Jaccard, then drop
    duplicates.  Default drop rule: any doc with a verified smaller-id
    neighbor (1-hop).  ``components=True`` instead closes the verified
    pairs into connected components (min-label propagation) and keeps
    one representative per component — the transitive policy.

    Returns (kept_dataset, verified_pairs_table).  The verify step
    broadcasts the candidate docs' shingle sets (candidate set << corpus;
    the scale path re-reads only candidate rows).
    """
    import ray

    cand = minhash_candidates(
        ds, num_perm=num_perm, bands=bands, k_shingle=k_shingle,
        id_col=id_col, text_col=text_col,
    ).to_pandas()
    need: set = set(cand["id_a"]) | set(cand["id_b"]) if len(cand) else set()
    need_ref = ray.put(need)

    def collect(batch: pa.Table) -> pa.Table:
        want = ray.get(need_ref)
        keep = pa.array(
            [i in want for i in batch.column(id_col).to_pylist()]
        )
        return batch.filter(keep).select([id_col, text_col])

    sh: dict = {}
    if need:
        small = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
        sh = {
            r[id_col]: shingles(r[text_col], k_shingle)
            for _, r in small.iterrows()
        }
    drop = set()
    pairs = []
    for _, r in cand.iterrows():
        j = jaccard(sh.get(r["id_a"], []), sh.get(r["id_b"], []))
        if j >= threshold:
            pairs.append((r["id_a"], r["id_b"], j))
            drop.add(max(r["id_a"], r["id_b"]))
    if components and pairs:
        import ray.data as _rd

        comp = connected_components(
            _rd.from_pandas(
                __import__("pandas").DataFrame(
                    {"id_a": [p[0] for p in pairs], "id_b": [p[1] for p in pairs]}
                )
            )
        ).to_pandas()
        drop = set(comp[comp["node"] != comp["component"]]["node"])
    drop_ref = ray.put(drop)

    def keep_fn(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        keep = pa.array(
            [i not in d for i in batch.column(id_col).to_pylist()]
        )
        return batch.filter(keep)

    kept = ds.map_batches(keep_fn, batch_format="pyarrow")
    pairs_t = pa.table(
        {
            "id_a": pa.array([p[0] for p in pairs]),
            "id_b": pa.array([p[1] for p in pairs]),
            "jaccard": pa.array([p[2] for p in pairs], type=pa.float64()),
        }
    )
    return kept, pairs_t


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word hashes (frequency-weighted)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in WORD_RE.findall(text.lower()):
        h = _stable_hash64(w)
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out & np.uint64(0x7FFFFFFFFFFFFFFF))


class SimHasher:
    def __init__(self, id_col="doc_id", text_col="text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [simhash64(t) for t in batch.column(self.text_col).to_pylist()]
        return batch.append_column("simhash", pa.array(hashes, type=pa.int64()))


def simhash_candidates(ds, *, max_hamming=3, id_col="doc_id", text_col="text"):
    """Near-dup candidate pairs by simhash band collision (pigeonhole:
    bands = max_hamming+1 16-bit slices)."""
    hashed = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 8),
    )
    nbands = max_hamming + 1
    width = 64 // nbands

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sims = np.asarray(batch.column("simhash").to_pylist(), dtype=np.uint64)
        out_id, out_band, out_key, out_sim = [], [], [], []
        mask = np.uint64((1 << width) - 1)
        for bi in range(nbands):
            seg = (sims >> np.uint64(bi * width)) & mask
            out_id.extend(ids)
            out_band.extend([bi] * len(ids))
            out_key.extend(seg.astype(np.int64).tolist())
            out_sim.extend(sims.astype(np.int64).tolist())
        return pa.table(
            {
                id_col: pa.array(out_id),
                "band": pa.array(out_band, type=pa.int32()),
                "band_key": pa.array(out_key, type=pa.int64()),
                "simhash": pa.array(out_sim, type=pa.int64()),
            }
        )

    rows = hashed.map_batches(explode, batch_format="pyarrow")

    def pairs(batch: pa.Table) -> pa.Table:
        import itertools

        recs = sorted(
            set(
                zip(
                    batch.column(id_col).to_pylist(),
                    batch.column("simhash").to_pylist(),
                )
            )
        )
        a_o, b_o, d_o = [], [], []
        for (ia, sa), (ib, sb) in itertools.combinations(recs, 2):
            ham = bin(int(sa) ^ int(sb)).count("1")
            if ham <= max_hamming:
                a_o.append(ia)
                b_o.append(ib)
                d_o.append(ham)
        return pa.table(
            {
                "id_a": pa.array(a_o),
                "id_b": pa.array(b_o),
                "hamming": pa.array(d_o, type=pa.int32()),
            }
        )

    cand = rows.groupby(["band", "band_key"]).map_groups(
        pairs, batch_format="pyarrow"
    )
    df = cand.to_pandas().drop_duplicates(["id_a", "id_b"])
    import ray.data

    return ray.data.from_pandas(df.reset_index(drop=True))


def connected_components(pairs_ds, *, id_a="id_a", id_b="id_b", max_iters=10):
    """Connected components over candidate pairs by iterative min-label
    propagation: each node's label = min(label of self, labels of
    neighbors); repeat with a groupby-min exchange until fixed point.
    Scales as O(E) per round with the component diameter bounding the
    rounds — the distributed closure over near-dup pairs (the
    keep-smallest rule in :func:`minhash_dedup` is its 1-hop
    approximation).  Returns a Dataset of (node, component) rows where
    component = the smallest node id in the component.
    """
    import ray.data
    from ray.data.aggregate import Min

    # initial labels: every endpoint labels itself
    def seed(batch: pa.Table) -> pa.Table:
        a = batch.column(id_a)
        b = batch.column(id_b)
        nodes = pa.concat_arrays([a.combine_chunks(), b.combine_chunks()])
        return pa.table({"node": nodes, "label": nodes})

    labels = pairs_ds.map_batches(seed, batch_format="pyarrow").groupby(
        "node"
    ).aggregate(Min("label", alias_name="label"))

    edges = pairs_ds
    for _ in range(max_iters):
        # join labels onto both endpoints (broadcast: label table is one
        # row per node — small relative to edges; at larger scale swap
        # for bucket_join)
        import ray

        lab = {
            r["node"]: r["label"] for r in labels.to_pandas().to_dict("records")
        }
        ref = ray.put(lab)

        # bind this round's ref via default arg: the dataset is lazy and
        # re-executes earlier rounds' closures, which must not see later
        # rebindings of `ref`
        def propagate(batch: pa.Table, _ref=ref) -> pa.Table:
            l = ray.get(_ref)
            a = batch.column(id_a).to_pylist()
            b = batch.column(id_b).to_pylist()
            out_n, out_l = [], []
            for x, y in zip(a, b):
                m = min(l.get(x, x), l.get(y, y))
                out_n.extend((x, y))
                out_l.extend((m, m))
            return pa.table({"node": pa.array(out_n), "label": pa.array(out_l)})

        prop = edges.map_batches(propagate, batch_format="pyarrow")
        new_labels = (
            prop.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
        )
        old = labels.to_pandas().set_index("node")["label"]
        new = new_labels.to_pandas().set_index("node")["label"]
        labels = new_labels
        if old.sort_index().equals(new.sort_index()):
            break
    return labels.map_batches(
        lambda b: b.rename_columns(["node", "component"]),
        batch_format="pyarrow",
    )
