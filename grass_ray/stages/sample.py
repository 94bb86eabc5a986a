"""Interval sampling & topology reports — t.sample / t.rast.aggregate.ds /
t.topology analogs.

``sample_by_dataset`` (``abstract_space_time_dataset.py:627-851``)
samples dataset A by the granules of dataset B: for every B-interval,
the A-samples related to it by the requested Allen relations.  Window
boundaries are a *small* table → broadcast (``ray.put``) and matched
inside ``map_batches``; no shuffle (SURVEY §2.10).

``aggregate_by_intervals`` is the ``t.rast.aggregate.ds`` analog:
windows come from an interval table instead of a fixed granularity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from grass_ray.functions.reducers import reduce_segments
from grass_ray.functions.topology import relation


def aggregate_by_intervals(
    ds,
    intervals,
    methods=("count", "sum", "minimum", "maximum", "average"),
    *,
    key_cols=("source", "doc_id"),
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    relations=("contains",),
):
    """Rollup with windows from an explicit interval table.

    `intervals`: list of (win_id, start, end) half-open [start, end)
    position ranges (may overlap, may leave gaps).  Each key's tokens
    are sampled per interval by the Allen relation (`contains` keeps
    positions fully inside — for per-position instants that is simply
    start <= pos < end).
    """
    import ray

    iv = sorted(intervals, key=lambda r: r[1])
    ref = ray.put(iv)

    def kernel(batch: pa.Table) -> pa.Table:
        ivs = ray.get(ref)
        col = batch.column(tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = np.asarray(col.value_lengths().to_numpy(zero_copy_only=False)).astype(np.int64)
        flat = col.flatten().cast(pa.float64()).to_numpy(zero_copy_only=False)
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        seg_vals = []
        seg_lens = []
        out_row = []
        out_win = []
        for i in range(batch.num_rows):
            row = flat[starts[i] : starts[i] + lens[i]]
            for win_id, s, e in ivs:
                s2, e2 = max(0, s), min(len(row), e)
                if e2 <= s2:
                    continue
                seg_vals.append(row[s2:e2])
                seg_lens.append(e2 - s2)
                out_row.append(i)
                out_win.append(win_id)
        if seg_vals:
            values = np.concatenate(seg_vals)
            res = reduce_segments(
                values, np.array(seg_lens, dtype=np.int64), methods
            )
        else:
            res = {m: np.empty(0) for m in methods}
        take = pa.array(np.array(out_row, dtype=np.int64))
        cols = {k: batch.column(k).take(take) for k in key_cols}
        cols["window"] = pa.array(np.array(out_win, dtype=np.int64))
        for m, arr in res.items():
            mask = np.isnan(arr)
            cols[m] = pa.array(arr, type=pa.float64(), mask=mask)
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow", batch_size=256)


def sample_intervals(a_intervals, b_intervals, relations=("during", "equal", "contains")):
    """`t.sample`-style matrix: for each B granule, the related A
    intervals with distance-from-begin (driver-side; both sides small
    metadata tables like the reference's map lists).

    a_intervals/b_intervals: (id, start, end) triples.
    Output rows: (b_id, a_id|None, relation, interval_length,
    distance_from_begin).
    """
    rows = []
    b_sorted = sorted(b_intervals, key=lambda r: r[1])
    origin = b_sorted[0][1] if b_sorted else 0
    for b_id, bs, be in b_sorted:
        hits = []
        for a_id, s, e in a_intervals:
            rel = relation(s, e, bs, be)
            if rel in relations:
                hits.append((a_id, rel, s, e))
        if hits:
            for a_id, rel, s, e in hits:
                rows.append(
                    {
                        "b_id": b_id,
                        "a_id": a_id,
                        "relation": rel,
                        "interval_length": e - s,
                        "distance_from_begin": bs - origin,
                    }
                )
        else:
            rows.append(
                {
                    "b_id": b_id,
                    "a_id": None,
                    "relation": "gap",
                    "interval_length": be - bs,
                    "distance_from_begin": bs - origin,
                }
            )
    return pa.Table.from_pylist(rows) if rows else pa.table({})


def topology_report(nested_ds) -> dict:
    """`t.topology`-style summary over a nested tier: window counts,
    inferred granularity, gap totals."""
    from grass_ray.functions.topology import infer_granularity

    n_keys = 0
    n_windows = 0
    n_gaps = 0
    total_missing = 0
    wmin, wmax = None, None
    grans = set()
    for batch in nested_ds.iter_batches(batch_format="pyarrow"):
        wcol = batch.column("windows")
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        for ws in wcol.to_pylist():
            n_keys += 1
            n_windows += len(ws)
            if ws:
                wmin = min(wmin, ws[0]) if wmin is not None else ws[0]
                wmax = max(wmax, ws[-1]) if wmax is not None else ws[-1]
                arr = np.asarray(ws)
                d = np.diff(arr)
                n_gaps += int((d > 1).sum())
                total_missing += int((d[d > 1] - 1).sum())
                grans.add(infer_granularity(arr))
    return {
        "keys": n_keys,
        "windows": n_windows,
        "gaps": n_gaps,
        "missing_windows": total_missing,
        "window_start": wmin,
        "window_end": wmax,
        "granularity": min(grans) if grans else None,
    }


def events_time_report(ds, *, ts_col: str = "ts", max_distinct: int = 100_000) -> dict:
    """`t.topology`-style summary for a wall-clock event stream:
    span, event count, and the mixed-unit absolute granularity
    (``compute_absolute_time_granularity`` semantics — month/year kept
    separate from day-based units, ``temporal_granularity.py:339-529``).

    Distinct timestamps are reduced distributedly (pre-combined Count
    aggregate) before the driver-side GCD; ``max_distinct`` bounds the
    driver set for degenerate streams (every event its own microsecond)
    — hitting the cap is reported, never silent."""
    import pandas as pd

    from grass_ray.functions.topology import infer_granularity_absolute
    from grass_ray.stages.join import distinct_keys

    distinct = distinct_keys(
        ds.map_batches(
            lambda b: pa.table({ts_col: b.column(ts_col)}),
            batch_format="pyarrow",
        ),
        (ts_col,),
    )
    n_events = ds.count()
    distinct = distinct.materialize()
    if distinct.count() <= max_distinct:
        # common path: the driver sorts the bounded set itself — no
        # Ray sort exchange just to cut a prefix that isn't needed
        ts = distinct.to_pandas()[ts_col]
        capped = False
    else:
        # degenerate stream (every event its own microsecond): sort
        # before the cap so the capped report is the deterministic
        # earliest-timestamp prefix, not a block-order subset
        ts = distinct.sort(ts_col).limit(max_distinct).to_pandas()[ts_col]
        capped = True
    times = sorted(t.to_pydatetime() for t in pd.to_datetime(ts))
    gran = infer_granularity_absolute(times) if len(times) > 1 else None
    return {
        "events": n_events,
        "distinct_times": len(times),
        "distinct_capped": capped,
        "time_start": times[0].isoformat() if times else None,
        "time_end": times[-1].isoformat() if times else None,
        "granularity": gran,
    }
