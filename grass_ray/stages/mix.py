"""Corpus mixing + reproducible global ordering.

Two training-data staples (engine extensions at the SURVEY §2.13
altitude — the reference's sampling analog is `t.sample`'s interval
matrix, not corpus curation):

* :func:`mix_sources` — Dolma/Pile-style domain mixing: down/up-weight
  each source to a target sampling rate with a DETERMINISTIC hash
  threshold (seeded murmur3-fmix32 hash of the doc id), so the
  mix is reproducible across runs, cluster layouts and resumes, and
  exactly expressible in SQL (the driver oracle re-derives it).
  Map-side only — no shuffle, no state.
* :func:`deterministic_shuffle` — seeded reproducible global shuffle
  order for training: rank every doc by its scrambled hash.  The rank
  is a distributed prefix scan over HASH-RANGE partitions (the hash is
  uniform on [0, 2³²), so fixed-width high-bit ranges are balanced):
  per-partition counts → driver prefix-sum of the bounded partition
  row (one row per partition at any corpus size) → broadcast bases +
  in-partition sort.  No driver materialization of the corpus, no
  Ray sort-exchange; same plan shape as ``chunk.doc_offsets``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MIX_M = np.uint64(1 << 32)
_FMIX_C1 = np.uint64(0x85EBCA6B)
_FMIX_C2 = np.uint64(0xC2B2AE35)
_SEED_MIX = np.uint64(40503)


def mix_hash_u32(ids: np.ndarray, seed: int) -> np.ndarray:
    """Seeded 32-bit hash of int ids: the murmur3 fmix32 finalizer
    (xorshift/multiply avalanche) — a plain multiplicative hash is NOT
    enough here (its lattice step A² mod 2³² ≈ 0.9996·2³² leaves a few
    hundred sequential ids in a narrow band, so small strata sample at
    wildly wrong rates).  Bit-for-bit reproducible in DuckDB via
    :func:`mix_sql_expr` (intermediates stay < 2⁶⁴, ``//`` on
    non-negative ints ≡ ``>>``)."""
    h = (ids.astype(np.uint64) + np.uint64(seed) * _SEED_MIX) % _MIX_M
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(16)
        h = (h * _FMIX_C1) % _MIX_M
        h ^= h >> np.uint64(13)
        h = (h * _FMIX_C2) % _MIX_M
        h ^= h >> np.uint64(16)
    return h


def mix_sql_expr(id_col: str, seed: int) -> str:
    """The DuckDB expression matching :func:`mix_hash_u32` bit-for-bit
    (the textual duplication of sub-expressions is fine: the oracle
    computes it once per row in a CTE)."""
    u0 = f"(({id_col} + {seed} * 40503) % 4294967296)"
    h1 = f"xor({u0}, {u0} // 65536)"
    h2 = f"CAST((CAST({h1} AS HUGEINT) * 2246822507) % 4294967296 AS BIGINT)"
    h3 = f"xor({h2}, {h2} // 8192)"
    h4 = f"CAST((CAST({h3} AS HUGEINT) * 3266489909) % 4294967296 AS BIGINT)"
    return f"xor({h4}, {h4} // 65536)"


def rate_threshold(rate: float) -> int:
    """Integer keep-threshold on the u32 hash for a sampling rate."""
    return min(1 << 32, max(0, int(round(float(rate) * (1 << 32)))))


def mix_sources(
    ds,
    rates: dict,
    *,
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    strat_col: str = "source",
    seed: int = 17,
):
    """Deterministically sample each stratum (source/domain) at its
    target rate: keep a row iff ``mix_hash_u32(id, seed) <
    rate·2^32``.  Zero-shuffle, stateless, resume-stable (membership
    depends only on the id), and exact — the thresholds are integers.

    ``rates`` maps stratum value → rate in [0, 1]; strata not listed
    use ``default_rate``.  Rates > capped at 1 (upsampling is a
    separate op — repetition changes row identity)."""
    thr = {k: rate_threshold(v) for k, v in rates.items()}
    thr_default = rate_threshold(default_rate)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        u = mix_hash_u32(ids, seed)
        src = batch.column(strat_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        dict_thr = np.fromiter(
            (thr.get(v, thr_default) for v in enc.dictionary.to_pylist()),
            dtype=np.uint64,
            count=len(enc.dictionary),
        )
        codes = enc.indices.to_numpy(zero_copy_only=False)
        mask = u < dict_thr[codes]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def deterministic_shuffle(
    ds,
    *,
    id_col: str = "doc_id",
    seed: int = 17,
    parts: int = 256,
):
    """(id, shuffle_rank) — the seeded reproducible global shuffle
    order: rank = position of the row when sorted by
    ``(mix_hash_u32(id, seed), id)``.  Distributed prefix scan over
    hash-range partitions (see module docstring); ``parts`` bounds the
    per-group sort size (raise with corpus size — contract parts ≥
    cores×4, like the join bucket count)."""
    import ray
    from ray.data.aggregate import Count

    shift = np.uint64(32 - int(np.log2(parts)))
    if (1 << (32 - int(shift))) != parts:
        raise ValueError("parts must be a power of two")

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        u = mix_hash_u32(ids, seed)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "_u": pa.array(u.astype(np.int64)),
                "_part": pa.array((u >> shift).astype(np.int64)),
            }
        )

    narrow = ds.map_batches(tag, batch_format="pyarrow").materialize()
    totals = (
        narrow.groupby("_part").aggregate(Count(alias_name="_n")).to_pandas()
    )
    totals = totals.sort_values("_part")
    counts = totals["_n"].to_numpy(dtype=np.int64)
    bases = dict(
        zip(
            totals["_part"].astype(int),
            np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64),
        )
    )
    ref = ray.put(bases)

    def rank_part(batch: pa.Table) -> pa.Table:
        b = ray.get(ref)
        part = int(batch.column("_part")[0].as_py())
        u = batch.column("_u").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, u))
        rank = np.empty(len(u), dtype=np.int64)
        rank[order] = np.arange(len(u), dtype=np.int64) + b[part]
        return pa.table(
            {id_col: batch.column(id_col), "shuffle_rank": pa.array(rank)}
        )

    return narrow.groupby("_part").map_groups(rank_part, batch_format="pyarrow")


def split_dataset(
    ds,
    fractions: dict,
    *,
    id_col: str = "doc_id",
    out_col: str = "split",
    seed: int = 17,
):
    """Deterministic train/val/test assignment: the id's u32 hash falls
    into consecutive ranges sized by ``fractions`` (e.g. ``{"train":
    .9, "val": .05, "test": .05}``; must sum to ≤ 1 — any remainder
    maps to the LAST label).  Stateless, shuffle-free, resume-stable,
    and exactly reproducible in SQL via :func:`mix_sql_expr` +
    integer thresholds (:func:`split_thresholds`)."""
    names, bounds = split_thresholds(fractions)

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        u = mix_hash_u32(ids, seed)
        idx = np.searchsorted(bounds, u, side="right")
        idx = np.minimum(idx, len(names) - 1)
        lab = np.array(names, dtype=object)[idx]
        return batch.append_column(out_col, pa.array(lab, type=pa.string()))

    return ds.map_batches(kernel, batch_format="pyarrow")


def split_thresholds(fractions: dict):
    """(names, cumulative integer u32 bounds) for :func:`split_dataset`
    — bounds[i] is the EXCLUSIVE upper hash bound of names[i]; shared
    with the SQL oracle so the two sides cannot drift."""
    names = list(fractions)
    cum = 0.0
    bounds = []
    for n in names:
        cum += float(fractions[n])
        bounds.append(rate_threshold(min(cum, 1.0)))
    return names, np.array(bounds[:-1], dtype=np.uint64)


def plan_mixture(
    ds,
    targets: dict | None = None,
    *,
    weight_col: str = "n_chars",
    strat_col: str = "source",
    budget: float | None = None,
    buckets: int = 64,
):
    """Mixture planner — the Dolma/Pile "mixing calculator": given
    target corpus SHARES per stratum, compute the per-stratum sampling
    rates that realize them by downsampling only (rates ≤ 1; no
    repetition), plus the expected contribution of each stratum.

    ``targets`` maps stratum → share (need not sum to 1 — shares are
    normalized); ``None`` means equal shares over the observed strata.
    ``budget`` is the total weight to plan for; ``None`` picks the
    LARGEST budget achievable without upsampling —
    ``B = min_s(T_s / share_s)`` — at which the scarcest stratum keeps
    rate 1.0 and every other stratum downsamples to proportion.

    Exactness contract: per-stratum totals ``T_s`` are exact int64
    (one partial-sum pass + one ``bucket_agg``); every derived number
    is a FIXED-ORDER IEEE expression on them (share = target/Σtargets,
    B = min of the per-stratum divisions, rate = share·B/T (capped at
    1 by construction when budget=None), expect = T·rate) — so a SQL
    twin spelling the same expressions is bit-identical.

    Returns ``(plan_table, rates_dict)``; feed ``rates_dict`` to
    :func:`mix_sources` to apply the plan (and its fmix32 membership
    is itself exact — ★mix_sources)."""
    from grass_ray.stages.join import bucket_agg

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([strat_col, weight_col])
        m = t.group_by(strat_col, use_threads=False).aggregate(
            [(weight_col, "sum")]
        )
        return m.rename_columns([strat_col, "w"])

    totals = bucket_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        [strat_col],
        [("w", "sum", "w")],
        buckets=buckets,
    ).to_pandas()  # bounded: one row per stratum
    totals = totals.sort_values(strat_col).reset_index(drop=True)
    names = totals[strat_col].tolist()
    T = totals["w"].to_numpy().astype(np.int64)
    if targets is None:
        share = np.full(len(names), 1.0 / len(names))
    else:
        raw = np.array([float(targets.get(s, 0.0)) for s in names])
        tot = float(raw.sum())
        if tot <= 0:
            raise ValueError("targets must contain a positive share")
        share = raw / tot
    ok = share > 0
    with np.errstate(divide="ignore"):
        achievable = np.where(ok, T.astype(np.float64) / share, np.inf)
    B = float(budget) if budget is not None else float(achievable[ok].min())
    with np.errstate(invalid="ignore"):
        rate = np.where(ok, np.minimum(share * B / T.astype(np.float64), 1.0), 0.0)
    expect = T.astype(np.float64) * rate
    plan = pa.table(
        {
            strat_col: pa.array(names),
            "n_weight": pa.array(T, type=pa.int64()),
            "share": pa.array(share, type=pa.float64()),
            "rate": pa.array(rate, type=pa.float64()),
            "expect_weight": pa.array(expect, type=pa.float64()),
        }
    )
    return plan, dict(zip(names, rate.tolist()))


def upsample_sources(
    ds,
    factors: dict,
    *,
    default_factor: float = 1.0,
    id_col: str = "doc_id",
    strat_col: str = "source",
    seed: int = 17,
    epoch_col: str = "epoch",
):
    """Deterministic repetition-based UPsampling — the complement of
    :func:`mix_sources` (whose rates cap at 1): a stratum with factor
    ``f`` emits ``floor(f)`` full copies of every row (``epoch`` =
    0..floor(f)−1) plus one fractional epoch ``floor(f)`` kept iff
    ``mix_hash_u32(id, seed) < (f − floor(f))·2^32`` — the same fmix32
    membership rule as the downsampler, so the whole plan (mixture
    targets → plan_mixture rates ≤ 1 OR upsample factors ≥ 1) is
    deterministic, resume-stable, layout-independent and
    SQL-reproducible bit-for-bit.  The ``epoch`` column keeps repeated
    rows distinguishable downstream (dedup by (id, epoch), shuffling,
    epoch-aware curricula).  Zero-shuffle map stage; fan-out per row is
    ``ceil(f)`` — bounded by the largest factor."""
    full = {}
    tail_thr = {}
    for k, v in factors.items():
        v = float(v)
        if v < 0:
            raise ValueError(f"factor for {k!r} is negative: {v}")
        full[k] = int(np.floor(v))
        tail_thr[k] = rate_threshold(v - np.floor(v))
    d_full = int(np.floor(default_factor))
    d_thr = rate_threshold(default_factor - np.floor(default_factor))

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        u = mix_hash_u32(ids, seed)
        src = batch.column(strat_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        names = enc.dictionary.to_pylist()
        nf = np.fromiter(
            (full.get(v, d_full) for v in names), dtype=np.int64,
            count=len(names),
        )
        thr = np.fromiter(
            (tail_thr.get(v, d_thr) for v in names), dtype=np.uint64,
            count=len(names),
        )
        codes = enc.indices.to_numpy(zero_copy_only=False)
        reps = nf[codes] + (u < thr[codes]).astype(np.int64)
        total = int(reps.sum())
        take = np.repeat(np.arange(batch.num_rows, dtype=np.int64), reps)
        starts = np.cumsum(reps) - reps
        epoch = np.arange(total, dtype=np.int64) - np.repeat(starts, reps)
        return batch.take(pa.array(take)).append_column(
            epoch_col, pa.array(epoch, type=pa.int64())
        )

    return ds.map_batches(kernel, batch_format="pyarrow")
