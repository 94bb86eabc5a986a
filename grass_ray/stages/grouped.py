"""Shuffle-based windowed rollup over point streams (the general path).

The row-local path (:mod:`grass_ray.stages.rollup`) assumes a key's whole
series lives in one row.  When samples arrive as individual points —
the ``events`` table, re-registered late data, or any exploded stream —
the engine needs the classic distributed plan the reference never had
(its "shuffle" was the filesystem, SURVEY §4):

* **decomposable methods** (count/sum/min/max/average): two-stage
  aggregation — vectorized *partial* aggregates per Arrow batch
  (``pyarrow.Table.group_by``), then one small
  ``groupby(keys).aggregate(...)`` shuffle over the partials, then a
  finalize ``map_batches``.  The shuffle moves one row per
  (key, window) per batch, not one per point.
* **holistic methods** (median/quantile/mode/...):
  ``groupby(keys).map_groups`` with a position sort inside the group,
  feeding the same segmented reducer kernels.
* **skew**: optional salting — hot keys fan out to ``salt`` sub-shards
  in stage 1 and re-merge in stage 2 (north rule requires explicit
  salting; FIXTURES F5 asserts salted == unsalted == row-local).
  Holistic methods cannot salt (the group must see every point);
  for skewed holistic workloads use :func:`approx_quantiles` — the
  mergeable-sketch plan bounds every exchange row.

NULL semantics match §2.1: count never NULL (0 allowed), sum of an
all-NULL window is NULL (not 0).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from grass_ray.functions.reducers import reduce_segments

DECOMPOSABLE = ("count", "sum", "minimum", "maximum", "average")


_TS_DIV = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _epoch_seconds(col) -> np.ndarray:
    """Timestamp column -> int64 epoch seconds, honouring the Arrow
    timestamp unit (a hard-coded //1e6 silently mis-scaled ns inputs —
    found by the sessionize brute-force fuzz).  Plain integer columns
    keep the documented microsecond convention."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    div = (
        _TS_DIV[col.type.unit]
        if pa.types.is_timestamp(col.type)
        else 1_000_000
    )
    ints = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return ints // div


def _partial_kernel(keys, window_expr, val_col, salt, weight_col=None):
    def kernel(batch: pa.Table) -> pa.Table:
        batch = window_expr(batch)
        gcols = list(keys) + ["window"]
        if salt and salt > 1:
            # deterministic sub-shard so stage-1 groups of a hot key split
            if "pos" in batch.column_names:
                h = (
                    batch.column("pos")
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False)
                )
            else:
                h = np.arange(batch.num_rows, dtype=np.int64)
            batch = batch.append_column("_salt", pa.array(h % salt))
            gcols.append("_salt")
        v = batch.column(val_col)
        t = batch.select([c for c in gcols if c in batch.column_names])
        t = t.append_column("_v", v)
        aggs = [("_v", "count"), ("_v", "sum"), ("_v", "min"), ("_v", "max")]
        names = ["p_count", "p_sum", "p_min", "p_max"]
        if weight_col is not None:
            # weighted partials (w_* reference variants,
            # r.series/main.c:442-460): Σw over valid values and Σv·w —
            # both decomposable, so the shuffle still moves partials
            vf = v.cast(pa.float64()).to_numpy(zero_copy_only=False)
            w = (
                batch.column(weight_col)
                .cast(pa.float64())
                .to_numpy(zero_copy_only=False)
            )
            with np.errstate(invalid="ignore"):
                vw = vf * w
                wv = np.where(np.isnan(vf), np.nan, w)
            t = t.append_column(
                "_vw", pa.array(vw, type=pa.float64(), mask=np.isnan(vw))
            )
            t = t.append_column(
                "_wv", pa.array(wv, type=pa.float64(), mask=np.isnan(wv))
            )
            aggs += [("_vw", "sum"), ("_wv", "sum")]
            names += ["p_vw", "p_wv"]
        agg = t.group_by(gcols).aggregate(aggs)
        return agg.rename_columns(gcols + names)

    return kernel


def _window_col(pos_col: str, gran: int, origin: int = 0):
    def add(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pos = (
            pc.cast(batch.column(pos_col), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        # integer floor division: exact for the full int64 range (the
        # float-floor shortcut silently loses precision past 2^53)
        w = np.floor_divide(pos + origin, gran)
        return batch.append_column("window", pa.array(w, type=pa.int64()))

    return add


def rollup_points(
    ds,
    *,
    key_cols,
    pos_col: str,
    val_col: str,
    gran: int,
    methods=DECOMPOSABLE,
    salt: int = 0,
    origin: int = 0,
    weight_col: str | None = None,
):
    """Windowed rollup over a point stream; returns per-(key, window) rows.

    Decomposable methods only (for holistic use :func:`rollup_points_holistic`).
    ``weight_col`` switches count/sum/average to the reference's ``w_*``
    semantics (count = Σw over valid, sum = Σv·w, average = Σv·w / Σw)
    while staying fully decomposable — the shuffle still moves partials.
    """
    bad = [m for m in methods if m not in DECOMPOSABLE]
    if bad:
        raise ValueError(
            f"{bad} are holistic — use rollup_points_holistic (they shuffle "
            "raw points, not partials)"
        )
    keys = list(key_cols)
    weighted = weight_col is not None
    partials = ds.map_batches(
        _partial_kernel(
            keys, _window_col(pos_col, gran, origin), val_col, salt, weight_col
        ),
        batch_format="pyarrow",
    )
    from grass_ray.stages.join import bucket_agg

    gcols = keys + ["window"]
    # Merge the partials with the house fixed-bucket exchange
    # (bucket_agg; Ray's sort-aggregate costs ~0.7 s in fixed constants
    # even on a few thousand partial rows).  Every partial of a
    # (key, window) hashes to the same bucket whatever its _salt, and
    # sum/min/max are associative, so the salted and unsalted plans
    # emit identical rows and _salt simply drops out at the merge.
    specs = [
        ("p_count", "sum", "n"),
        ("p_sum", "sum", "s"),
        ("p_min", "min", "mn"),
        ("p_max", "max", "mx"),
    ] + ([("p_vw", "sum", "vw"), ("p_wv", "sum", "wv")] if weighted else [])
    merged = bucket_agg(partials, gcols, specs)

    want = list(methods)

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        n = np.nan_to_num(n, nan=0.0)
        s = batch.column("s").cast(pa.float64()).to_numpy(zero_copy_only=False)
        mn = batch.column("mn").cast(pa.float64()).to_numpy(zero_copy_only=False)
        mx = batch.column("mx").cast(pa.float64()).to_numpy(zero_copy_only=False)
        empty = n == 0
        s = np.where(empty, np.nan, s)
        if weighted:
            vw = batch.column("vw").cast(pa.float64()).to_numpy(zero_copy_only=False)
            wv = batch.column("wv").cast(pa.float64()).to_numpy(zero_copy_only=False)
            wv = np.where(empty, 0.0, np.nan_to_num(wv, nan=0.0))
            vw = np.where(empty, np.nan, vw)
            n_eff, s_eff = wv, vw
        else:
            n_eff, s_eff = n, s
        cols = {k: batch.column(k) for k in gcols if k != "_salt"}
        # count is int64 on both paths (matches _result_array's CELL
        # cast, including the truncation of a fractional Σw)
        out = {
            "count": pa.array(n_eff.astype(np.int64)),
            "sum": pa.array(s_eff, type=pa.float64(), mask=np.isnan(s_eff)),
            "minimum": pa.array(mn, type=pa.float64(), mask=np.isnan(mn)),
            "maximum": pa.array(mx, type=pa.float64(), mask=np.isnan(mx)),
        }
        with np.errstate(invalid="ignore", divide="ignore"):
            avg = s_eff / n_eff
        out["average"] = pa.array(avg, type=pa.float64(), mask=np.isnan(avg))
        for m in want:
            cols[m] = out[m]
        return pa.table(cols)

    return merged.map_batches(finalize, batch_format="pyarrow")


def rollup_points_holistic(
    ds,
    *,
    key_cols,
    pos_col: str,
    val_col: str,
    gran: int,
    methods,
    origin: int = 0,
    quantiles: dict | None = None,
    weight_col: str | None = None,
):
    """Holistic windowed rollup: raw points shuffle to their (key, window)
    group; positions sort inside the group (ordering contract for
    min_raster/slope etc., SURVEY §4 "Ordering assumptions").
    ``weight_col`` feeds per-point weights to the segmented reducers —
    the ``w_median`` / ``w_percentile`` / ``w_mode`` reference variants
    (``lib/stats`` ``w_*``; ``c_percentile.c:54-84``)."""
    keys = list(key_cols)
    with_w = ds.map_batches(
        _window_col(pos_col, gran, origin), batch_format="pyarrow"
    )

    def per_group(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            batch, sort_keys=[(pos_col, "ascending")]
        )
        vals = (
            batch.column(val_col)
            .take(order)
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        weights = None
        if weight_col is not None:
            weights = (
                batch.column(weight_col)
                .take(order)
                .cast(pa.float64())
                .to_numpy(zero_copy_only=False)
            )
        res = reduce_segments(
            vals,
            np.array([len(vals)], dtype=np.int64),
            methods,
            quantiles=quantiles,
            weights=weights,
        )
        cols = {k: batch.column(k).slice(0, 1) for k in keys + ["window"]}
        for m, arr in res.items():
            mask = np.isnan(arr)
            cols[m] = pa.array(arr, type=pa.float64(), mask=mask)
        return pa.table(cols)

    return with_w.groupby(keys + ["window"]).map_groups(
        per_group, batch_format="pyarrow"
    )


def rollup_events(
    ds,
    *,
    gran_seconds: int | None = None,
    calendar_unit: str | None = None,
    calendar_mult: int = 1,
    methods=DECOMPOSABLE,
    key_cols=("event_type",),
    ts_col: str = "ts",
    val_col: str = "value",
    salt: int = 0,
):
    """``t.rast.aggregate.ds``-style rollup of the events stream: windows
    from wall-clock time — either fixed-size (epoch seconds // gran) or
    calendar granules (``calendar_unit`` ∈ months/weeks/years/..., the
    ``adjust_datetime_to_granularity`` semantics) — keys from the event
    type; the true-shuffle demo over the driver's events table."""
    if (gran_seconds is None) == (calendar_unit is None):
        raise ValueError("exactly one of gran_seconds / calendar_unit")

    def add_pos(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if calendar_unit is not None:
            from grass_ray.functions.calendar import window_id

            ts = batch.column(ts_col)
            if isinstance(ts, pa.ChunkedArray):
                ts = ts.combine_chunks()
            wid = window_id(
                ts.to_numpy(zero_copy_only=False), calendar_unit, calendar_mult
            )
            return batch.append_column("pos", pa.array(wid))
        return batch.append_column(
            "pos", pa.array(_epoch_seconds(batch.column(ts_col)))
        )

    pts = ds.map_batches(add_pos, batch_format="pyarrow")
    return rollup_points(
        pts,
        key_cols=key_cols,
        pos_col="pos",
        val_col=val_col,
        gran=1 if calendar_unit is not None else gran_seconds,
        methods=methods,
        salt=salt,
    )


def sessionize(
    ds,
    *,
    key_cols=("user_id",),
    ts_col: str = "ts",
    val_col: str = "value",
    gap_seconds: int = 1800,
    buckets: int = 64,
):
    """Session windows over an event stream (engine extension — the
    streaming-window shape TGRASS lacks): consecutive events of a key
    closer than `gap_seconds` share a session.

    Partitioning: keys hash into ``buckets`` groups (a key's events land
    in ONE bucket); the per-bucket kernel sorts by (keys..., ts) once
    and segments EVERY key in the bucket vectorized (numpy flag +
    reduceat) — group-call count is fixed at B, not one Python dispatch
    per key.  Output: one row per session with
    (key..., session_id, session_start, session_end, n_events,
    sum_value); session ids are 0-based per key in time order.
    """
    out = sessionize_multi(
        ds,
        key_cols=key_cols,
        gaps={"_only": gap_seconds},
        ts_col=ts_col,
        val_col=val_col,
        buckets=buckets,
    )
    return out.map_batches(
        lambda b: b.drop_columns(["gap_label"]), batch_format="pyarrow"
    )


def sessionize_multi(
    ds,
    *,
    key_cols,
    gaps: dict,
    ts_col: str = "ts",
    val_col: str = "value",
    buckets: int = 64,
):
    """Multi-granularity sessionization in ONE exchange: every
    ``gaps[label] = gap_seconds`` granularity is segmented from the
    SAME per-bucket sort (key events land in one bucket; the sort and
    the key-change flags are computed once, each gap derives its
    session boundaries from the shared arrays).  N granularities cost
    one shuffle instead of N — the multi-resolution session analysis
    shape (coarse vs fine session overlap joins).  Output rows carry a
    ``gap_label`` column; per-label content is bit-identical to
    :func:`sessionize` at that gap."""
    from grass_ray.stages.join import _bucket_ids

    keys = list(key_cols)
    items = sorted(gaps.items())  # deterministic label order

    def tag(batch: pa.Table) -> pa.Table:
        if batch.schema.metadata:
            batch = batch.replace_schema_metadata(None)
        return batch.append_column(
            "_bucket", pa.array(_bucket_ids(batch, keys, buckets))
        )

    def per_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            batch,
            sort_keys=[(k, "ascending") for k in keys] + [(ts_col, "ascending")],
        )
        b = batch.take(order)
        n = b.num_rows
        secs = _epoch_seconds(b.column(ts_col))
        changed = np.ones(n, dtype=bool)
        if n > 1:
            same = np.ones(n - 1, dtype=bool)
            for codes in _key_codes(b, keys):
                same &= codes[1:] == codes[:-1]
            changed[1:] = ~same
        v = b.column(val_col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        key_starts = np.flatnonzero(changed)
        tables = []
        for label, gap_s in items:
            new = changed.copy()
            if n > 1:
                new[1:] |= (secs[1:] - secs[:-1]) > gap_s
            sess_starts = np.flatnonzero(new)
            n_sessions = len(sess_starts)
            sess_ends = np.append(sess_starts[1:], n) - 1
            # per-key 0-based numbering: key starts are session starts
            first_sess_of_key = np.searchsorted(sess_starts, key_starts)
            key_of_sess = (
                np.searchsorted(key_starts, sess_starts, side="right") - 1
            )
            session_id = (
                np.arange(n_sessions, dtype=np.int64)
                - first_sess_of_key[key_of_sess]
            )
            vsum = (
                np.add.reduceat(np.where(np.isnan(v), 0.0, v), sess_starts)
                if n_sessions
                else np.empty(0)
            )
            counts = np.diff(np.append(sess_starts, n))
            cols = {k: b.column(k).take(pa.array(sess_starts)) for k in keys}
            cols["session_id"] = pa.array(session_id)
            cols["session_start"] = b.column(ts_col).take(pa.array(sess_starts))
            cols["session_end"] = b.column(ts_col).take(pa.array(sess_ends))
            cols["n_events"] = pa.array(counts.astype(np.int64))
            cols["sum_value"] = pa.array(vsum, type=pa.float64())
            cols["gap_label"] = pa.array([label] * n_sessions)
            tables.append(pa.table(cols))
        return pa.concat_tables(tables)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def _key_codes(t: pa.Table, keys):
    """Per-key-column dictionary codes (equal codes ⇔ equal values) —
    the vectorized building block for adjacent-row group detection."""
    out = []
    for k in keys:
        col = t.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out.append(
            col.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    return out


def _sorted_group_ranks(t: pa.Table, keys) -> np.ndarray:
    """Per-row rank within its key group (rows already key-sorted) —
    sort_indices + run-length segmentation instead of a pandas
    groupby round trip (r3 VERDICT cleanup #3)."""
    n = t.num_rows
    if n == 0:
        return np.empty(0, dtype=np.int64)
    same = np.ones(n - 1, dtype=bool)
    for codes in _key_codes(t, keys):
        same &= codes[1:] == codes[:-1]
    starts = np.concatenate([[0], np.flatnonzero(~same) + 1])
    counts = np.diff(np.append(starts, n))
    return np.arange(n, dtype=np.int64) - np.repeat(starts, counts)


def _key_group_slices(batch: pa.Table, keys):
    """(order, starts, ends): rows sorted by the key columns (stable
    Arrow C++ sort) with run-length group boundaries — per-batch
    partial kernels segment key groups without pandas."""
    import pyarrow.compute as pc

    n = batch.num_rows
    z = np.empty(0, dtype=np.int64)
    if n == 0:
        return z, z, z
    kt = batch.select(list(keys))
    order = (
        pc.sort_indices(kt, sort_keys=[(k, "ascending") for k in keys])
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    same = np.ones(n - 1, dtype=bool)
    for codes in _key_codes(kt, keys):
        c = codes[order]
        same &= c[1:] == c[:-1]
    starts = np.concatenate([[0], np.flatnonzero(~same) + 1]).astype(np.int64)
    ends = np.append(starts[1:], n)
    return order, starts, ends


def topk_per_group(
    ds,
    *,
    key_cols,
    val_col: str,
    k: int = 3,
    tie_cols=(),
):
    """Top-k rows per key by ``val_col`` (descending; ties broken by
    ``tie_cols`` ascending for determinism).

    Decomposable plan: every batch emits its LOCAL per-key top-k
    (vectorized pandas groupby-head), so the shuffle moves at most
    k rows per key per batch; the final per-key trim runs in
    ``map_groups`` over ≤ k·n_batches rows per key — never the raw
    stream.  The classic heavy-hitters shape for training-data stats."""
    keys = list(key_cols)
    ties = list(tie_cols)

    def local_topk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sort_keys = (
            [(c, "ascending") for c in keys]
            + [(val_col, "descending")]
            + [(c, "ascending") for c in ties]
        )
        t = batch.take(pc.sort_indices(batch, sort_keys=sort_keys))
        rank = _sorted_group_ranks(t, keys)
        return t.filter(pa.array(rank < k))

    partials = ds.map_batches(local_topk, batch_format="pyarrow")

    def final_topk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sort_keys = [(val_col, "descending")] + [
            (c, "ascending") for c in ties
        ]
        idx = pc.sort_indices(batch, sort_keys=sort_keys)
        return batch.take(idx[:k])

    return partials.groupby(keys).map_groups(final_topk, batch_format="pyarrow")


def hop_windows(
    ds,
    *,
    key_cols,
    pos_col: str,
    val_col: str,
    size: int,
    hop: int,
    methods=("count", "sum"),
    salt: int = 0,
):
    """Sliding (hopping) window aggregate: windows of length ``size``
    every ``hop`` positions (``size % hop == 0``; size == hop degrades
    to the tumbling :func:`rollup_points`).

    Plan: each point replicates to its ``size // hop`` covering windows
    in a vectorized ``map_batches`` (bounded fan-out — the streaming
    window shape), then the standard two-stage partial-aggregate
    shuffle.  Output window id w covers positions
    ``[w*hop, w*hop + size)``."""
    if size % hop != 0:
        raise ValueError("size must be a multiple of hop")
    fan = size // hop

    def replicate(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pos = (
            pc.cast(batch.column(pos_col), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        n = len(pos)
        take = pa.array(np.tile(np.arange(n, dtype=np.int64), fan))
        j = np.repeat(np.arange(fan, dtype=np.int64), n)
        w = np.floor_divide(np.tile(pos, fan), hop) - j
        t = pa.table(
            {c: batch.column(c).take(take) for c in batch.column_names}
        )
        t = t.append_column("_hopw", pa.array(w * hop))
        # keep only windows that really cover the position (exact when
        # size % hop == 0, but the guard also handles negative starts)
        keep = (np.tile(pos, fan) >= w * hop) & (np.tile(pos, fan) < w * hop + size)
        return t.filter(pa.array(keep))

    pts = ds.map_batches(replicate, batch_format="pyarrow")
    out = rollup_points(
        pts,
        key_cols=key_cols,
        pos_col="_hopw",
        val_col=val_col,
        gran=1,
        methods=methods,
        salt=salt,
    )

    def name_window(batch: pa.Table) -> pa.Table:
        # rollup_points emitted window = _hopw // 1 = window start
        return batch.rename_columns(
            ["window_start" if c == "window" else c for c in batch.column_names]
        )

    return out.map_batches(name_window, batch_format="pyarrow")


def approx_quantiles(
    ds,
    *,
    key_cols,
    val_col: str,
    quantiles=(0.5,),
    k_cap: int = 256,
):
    """Approximate grouped quantiles via mergeable KLL-lite sketches:
    one bounded-size sketch per key per batch (map_batches), a tiny
    ``groupby(key)`` over serialized sketches, merge + query in
    ``map_groups``.  The shuffle moves sketches, not points — the
    scale plan for holistic methods (exact path:
    :func:`rollup_points_holistic`)."""
    from grass_ray.functions.sketch import KLLSketch

    keys = list(key_cols)

    def partial(batch: pa.Table) -> pa.Table:
        order, starts, ends = _key_group_slices(batch, keys)
        vals = (
            batch.column(val_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)[order]
        )
        reps, blobs = [], []
        for g in range(len(starts)):
            sk = KLLSketch(k_cap).update_many(vals[starts[g] : ends[g]])
            reps.append(order[starts[g]])
            blobs.append(sk.to_bytes())
        idx = pa.array(np.asarray(reps, dtype=np.int64))
        cols = {k: batch.column(k).take(idx) for k in keys}
        cols["sketch"] = pa.array(blobs, type=pa.binary())
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        sk = None
        for blob in batch.column("sketch").to_pylist():
            s = KLLSketch.from_bytes(blob)
            sk = s if sk is None else sk.merge(s)
        cols = {k: batch.column(k).slice(0, 1) for k in keys}
        cols["n"] = pa.array([sk.n], type=pa.int64())
        for q in quantiles:
            cols[f"q{int(q * 100):02d}"] = pa.array(
                [sk.quantile(q)], type=pa.float64()
            )
        # a sketch that never compacted holds every point at level 0 —
        # its quantiles are EXACT rank statistics (the oracle-checkable
        # regime, like vocab_heavy's err == 0 contract)
        cols["exact"] = pa.array(
            [all(len(a) == 0 for a in sk.levels[1:])], type=pa.bool_()
        )
        return pa.table(cols)

    return partials.groupby(keys).map_groups(merge, batch_format="pyarrow")


def approx_distinct(
    ds,
    *,
    key_cols,
    val_col: str,
    p: int = 12,
):
    """Approximate per-group distinct count via mergeable HyperLogLog
    sketches: one fixed 2^p-byte sketch per key per batch (map_batches
    partial over vectorized 64-bit value hashes), a tiny ``groupby``
    over serialized sketches, max-merge + estimate in ``map_groups``.
    The shuffle moves 4 KB sketches, not values — the scale plan for
    distinct counts (exact path: `join.distinct_keys` + count).
    Standard error ≈ 1.04/sqrt(2^p) (p=12 → ~1.6%)."""
    from grass_ray.functions.sketch import HyperLogLog

    keys = list(key_cols)
    partials = _hll_partials(ds, keys, val_col, p)

    def merge(batch: pa.Table) -> pa.Table:
        sk = None
        for blob in batch.column("sketch").to_pylist():
            s = HyperLogLog.from_bytes(blob)
            sk = s if sk is None else sk.merge(s)
        cols = {k: batch.column(k).slice(0, 1) for k in keys}
        # floor(x + 0.5), not round(): Python round() is banker's,
        # SQL round() is half-away — floor+0.5 is identical in both
        cols["approx_distinct"] = pa.array(
            [int(math.floor(sk.estimate() + 0.5))], type=pa.int64()
        )
        return pa.table(cols)

    return partials.groupby(keys).map_groups(merge, batch_format="pyarrow")


def _hll_partials(ds, keys, val_col: str, p: int):
    """Shared HLL partial stage: one serialized 2^p-byte sketch per key
    per Arrow batch (the only thing the downstream groupby moves)."""
    from grass_ray.functions.sketch import HyperLogLog
    from grass_ray.stages.join import _hash_rows

    def partial(batch: pa.Table) -> pa.Table:
        h = _hash_rows(batch, [val_col]).astype(np.int64)
        order, starts, ends = _key_group_slices(batch, keys)
        hs = h[order]
        reps, blobs = [], []
        for g in range(len(starts)):
            sk = HyperLogLog(p).add_many(hs[starts[g] : ends[g]])
            reps.append(order[starts[g]])
            blobs.append(sk.to_bytes())
        idx = pa.array(np.asarray(reps, dtype=np.int64))
        cols = {k: batch.column(k).take(idx) for k in keys}
        cols["sketch"] = pa.array(blobs, type=pa.binary())
        return pa.table(cols)

    return ds.map_batches(partial, batch_format="pyarrow")


def hll_register_table(
    ds,
    *,
    key_cols,
    val_col: str,
    p: int = 12,
):
    """Per-key HLL REGISTER table: (key..., reg_idx, max_rank), one row
    per non-zero register — the sketch itself as rows.

    The register contents are a pure deterministic function of the
    value multiset (``join._hash_rows`` fingerprint + the add_many
    avalanche + per-register max), so the entire distributed chain —
    batch hash kernel, per-batch partial sketches, shuffle max-merge —
    is exactly SQL-checkable: the DuckDB oracle replicates every
    multiply/xor-shift step in HUGEINT mod-2^64 arithmetic and the
    float64 leading-zero rank including its round-to-nearest edge (see
    ``__ray_entry__._hll_register_sql``).  ``approx_distinct`` reuses
    the same partials; only its final ln-based estimate is float."""
    from grass_ray.functions.sketch import HyperLogLog

    keys = list(key_cols)
    partials = _hll_partials(ds, keys, val_col, p)

    def merge(batch: pa.Table) -> pa.Table:
        sk = None
        for blob in batch.column("sketch").to_pylist():
            s = HyperLogLog.from_bytes(blob)
            sk = s if sk is None else sk.merge(s)
        idxs = np.nonzero(sk.registers)[0]
        cols = {
            k: pa.array([batch.column(k)[0].as_py()] * len(idxs))
            for k in keys
        }
        cols["reg_idx"] = pa.array(idxs.astype(np.int64), type=pa.int64())
        cols["max_rank"] = pa.array(
            sk.registers[idxs].astype(np.int64), type=pa.int64()
        )
        return pa.table(cols)

    return partials.groupby(keys).map_groups(merge, batch_format="pyarrow")


def regression_points(ds, key_cols, *, x_col, y_col, buckets: int = 64):
    """Grouped OLS of ``y`` on ``x`` — the ``r.regression.line`` analog
    over a point stream (reference: ``raster/r.regression.line``,
    formula order ``lib/stats/c_reg.c`` — identical to
    :func:`grass_ray.functions.reducers._regression` and the
    ★rollup_regression oracle convention).

    Inputs must be int64-exact (the house cents/seconds convention):
    per-batch power-sum partials ``(n, Σx, Σy, Σxy, Σx², Σy²)`` are
    exact int64 (one Acero hash-aggregate per batch — the combiner),
    fold through ONE ``bucket_agg`` exchange, and the finals are
    FIXED-ORDER IEEE expressions on the exact sums — so a SQL twin
    spelling the same formulas is bit-identical.  Non-finite results
    (zero-variance x or y) and ``n < 2`` groups emit NULL, matching
    DuckDB's NULL-on-/0.  The caller guarantees the power sums fit
    int64 (bound: ``n · max(|x|,|y|)² < 2^63`` — window-local x and
    cents-scale y satisfy it by construction).

    Returns (keys..., n, slope, icept, r2, tval)."""
    from grass_ray.stages.join import bucket_agg

    keys = list(key_cols)

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        t = pa.table(
            {
                **{k: batch.column(k) for k in keys},
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
            }
        )
        m = t.group_by(keys, use_threads=False).aggregate(
            [("sx", "sum"), ("sy", "sum"), ("sxy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ([], "count_all")]
        )
        return m.rename_columns(keys + ["sx", "sy", "sxy", "sxx", "syy", "n"])

    sums = bucket_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys,
        [("n", "sum", "n"), ("sx", "sum", "sx"), ("sy", "sum", "sy"),
         ("sxy", "sum", "sxy"), ("sxx", "sum", "sxx"),
         ("syy", "sum", "syy")],
        buckets=buckets,
    )

    def final(batch: pa.Table) -> pa.Table:
        nn = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        f = {
            c: batch.column(c).to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            for c in ("sx", "sy", "sxy", "sxx", "syy")
        }
        n = nn.astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            xbar = f["sx"] / n
            ybar = f["sy"] / n
            numer = f["sxy"] - n * xbar * ybar
            denom = f["sxx"] - n * xbar * xbar
            denom2 = f["syy"] - n * ybar * ybar
            slope = numer / denom
            icept = ybar - xbar * numer / denom
            rsq = (numer * numer) / (denom * denom2)
            tval = np.sqrt(rsq * (n - 2.0) / (1.0 - rsq))
        cols = {k: batch.column(k) for k in keys}
        cols["n"] = pa.array(nn, type=pa.int64())
        too_few = nn < 2
        for name, arr in (
            ("slope", slope), ("icept", icept), ("r2", rsq), ("tval", tval)
        ):
            mask = too_few | ~np.isfinite(arr)
            cols[name] = pa.array(arr, type=pa.float64(), mask=mask)
        return pa.table(cols)

    return sums.map_batches(final, batch_format="pyarrow")
