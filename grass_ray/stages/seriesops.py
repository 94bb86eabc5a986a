"""Per-series stream transforms: successive difference (delta / rate)
and forward-fill — the PromQL ``delta()``/``rate()`` and
``last_over_time`` analogs over the corpus token stream, windowed to
the tier granularity.

Both are row-local (a document's token list is one row), shuffle-free
``map_batches`` kernels, fully vectorized over the flattened batch
stream: positions are already ordered within each document, so every
per-window aggregate is a ``reduceat`` over contiguous segments — no
sort, no Python loop.

NULL semantics mirror the SQL window functions the oracle uses:

* delta: ``dv[i] = v[i] − v[i−lag]``, NULL when either side is NULL or
  ``i < lag`` (``lag()`` over the doc partition);
* ffill: ``last_value(v IGNORE NULLS)`` over the doc partition — NULL
  until the first non-NULL value, then the last seen value.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _flat_batch(batch: pa.Table, tokens_col: str):
    """(values float64, is_null, doc_row_of, pos_in_doc, lens)."""
    col = batch.column(tokens_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = np.asarray(col.value_lengths().to_numpy(zero_copy_only=False)).astype(
        np.int64
    )
    flat = col.flatten()
    null = flat.is_null().to_numpy(zero_copy_only=False)
    import pyarrow.compute as pc

    v = (
        pc.fill_null(flat.cast(pa.int64()), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    total = int(lens.sum())
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    return v, null, row_of, pos, lens, starts


def _window_frame(lens, gran):
    """Output key arrays: every (doc, window) the series covers, in
    stream order; returns (doc_take, window_ids, wbase, n_out)."""
    nw = -(-lens // gran)  # windows per doc (ceil)
    n_out = int(nw.sum())
    wbase = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(nw[:-1], out=wbase[1:])
    win = np.arange(n_out, dtype=np.int64) - np.repeat(wbase, nw)
    doc_take = np.repeat(np.arange(len(lens), dtype=np.int64), nw)
    return doc_take, win, wbase, n_out


def _segment_agg(seg_of, valid, dv, n_out):
    """(cnt, sum, min, max) per output segment over the valid entries —
    ``seg_of`` is non-decreasing, so one boundary scan + reduceat."""
    cnt = np.zeros(n_out, dtype=np.int64)
    s = np.zeros(n_out, dtype=np.int64)
    mn = np.zeros(n_out, dtype=np.int64)
    mx = np.zeros(n_out, dtype=np.int64)
    has = np.zeros(n_out, dtype=bool)
    vsel = np.flatnonzero(valid)
    if len(vsel):
        segs = seg_of[vsel]
        vals = dv[vsel]
        b = np.flatnonzero(np.diff(segs)) + 1
        startsb = np.concatenate([[0], b])
        seg_u = segs[startsb]
        cnt_u = np.diff(np.concatenate([startsb, [len(segs)]]))
        cnt[seg_u] = cnt_u
        s[seg_u] = np.add.reduceat(vals, startsb)
        mn[seg_u] = np.minimum.reduceat(vals, startsb)
        mx[seg_u] = np.maximum.reduceat(vals, startsb)
        has[seg_u] = True
    return cnt, s, mn, mx, has


def delta_rollup(
    ds,
    gran: int,
    *,
    lag: int = 1,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    source_col: str = "source",
):
    """Windowed successive-difference rollup (PromQL ``delta`` /
    ``increase`` family): per series, ``dv[i] = v[i] − v[i−lag]``
    (NULL-propagating, no cross-series leakage), aggregated per
    ``window = pos // gran`` as (cnt_d, sum_d, min_d, max_d) — all
    exact int64."""

    def kernel(batch: pa.Table) -> pa.Table:
        v, null, row_of, pos, lens, starts = _flat_batch(batch, tokens_col)
        dv = np.zeros(len(v), dtype=np.int64)
        invalid = np.ones(len(v), dtype=bool)
        if len(v):
            ok = pos >= lag
            src = np.arange(len(v), dtype=np.int64) - lag
            srcc = np.where(ok, src, 0)
            dv = v - v[srcc]
            invalid = ~ok | null | null[srcc]
        doc_take, win, wbase, n_out = _window_frame(lens, gran)
        seg_of = wbase[row_of] + pos // gran
        cnt, s, mn, mx, has = _segment_agg(seg_of, ~invalid, dv, n_out)
        take = pa.array(doc_take)
        return pa.table(
            {
                source_col: batch.column(source_col).take(take),
                id_col: batch.column(id_col).take(take),
                "window": pa.array(win),
                "cnt_d": pa.array(cnt),
                "sum_d": pa.array(s, mask=~has),
                "min_d": pa.array(mn, mask=~has),
                "max_d": pa.array(mx, mask=~has),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def ffill_rollup(
    ds,
    gran: int,
    *,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    source_col: str = "source",
):
    """Forward-fill (``last_value IGNORE NULLS`` over the series) then
    windowed (cnt_f, sum_f) rollup — the gap-carrying retention-tier
    read path (positions before the first observation stay NULL)."""

    def kernel(batch: pa.Table) -> pa.Table:
        v, null, row_of, pos, lens, starts = _flat_batch(batch, tokens_col)
        n = len(v)
        filled = np.zeros(n, dtype=np.int64)
        fnull = np.ones(n, dtype=bool)
        if n:
            idx = np.where(~null, np.arange(n, dtype=np.int64), -1)
            run = np.maximum.accumulate(idx)
            doc_start = np.repeat(starts, lens)
            ok = run >= doc_start  # filled from within this doc
            filled = v[np.where(ok, run, 0)]
            fnull = ~ok
        doc_take, win, wbase, n_out = _window_frame(lens, gran)
        seg_of = wbase[row_of] + pos // gran
        cnt, s, _mn, _mx, has = _segment_agg(seg_of, ~fnull, filled, n_out)
        take = pa.array(doc_take)
        return pa.table(
            {
                source_col: batch.column(source_col).take(take),
                id_col: batch.column(id_col).take(take),
                "window": pa.array(win),
                "cnt_f": pa.array(cnt),
                "sum_f": pa.array(s, mask=~has),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def zscore_anomalies(
    ds,
    gran: int,
    *,
    thresh: float = 2.0,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    source_col: str = "source",
):
    """Windowed z-score anomaly detection (the PromQL
    ``stddev_over_time`` alert-rule analog): per ``window = pos //
    gran`` compute the population mean/std of the non-NULL values and
    count the points with ``|v − mean| > thresh·std`` (only when
    ``std > 0``, so constant windows flag nothing).

    Exactness contract: the int64 power sums ``S1 = Σv`` and
    ``S2 = Σv²`` are exact; every float is a FIXED-ORDER IEEE
    expression on them — ``mean = S1/n``, ``var = S2/n − mean·mean``
    (clamped at 0), ``std = sqrt(var)`` (correctly-rounded on both
    numpy and DuckDB), and the flag comparison multiplies
    (``|v − mean| > thresh·std``) instead of dividing — so a SQL twin
    spelling the SAME expressions is bit-identical with NO rounding
    contract.  Row-local, shuffle-free, one reduceat pass per batch.
    Windows with no valid points are dropped (mean/std undefined)."""

    def kernel(batch: pa.Table) -> pa.Table:
        v, null, row_of, pos, lens, starts = _flat_batch(batch, tokens_col)
        doc_take, win, wbase, n_out = _window_frame(lens, gran)
        seg_of = wbase[row_of] + pos // gran
        valid = ~null
        cnt = np.zeros(n_out, dtype=np.int64)
        s1 = np.zeros(n_out, dtype=np.int64)
        s2 = np.zeros(n_out, dtype=np.int64)
        n_anom = np.zeros(n_out, dtype=np.int64)
        vsel = np.flatnonzero(valid)
        if len(vsel):
            segs = seg_of[vsel]
            vals = v[vsel]
            b = np.flatnonzero(np.diff(segs)) + 1
            startsb = np.concatenate([[0], b])
            seg_u = segs[startsb]
            cnt[seg_u] = np.diff(np.concatenate([startsb, [len(segs)]]))
            s1[seg_u] = np.add.reduceat(vals, startsb)
            s2[seg_u] = np.add.reduceat(vals * vals, startsb)
            with np.errstate(invalid="ignore", divide="ignore"):
                nf = cnt.astype(np.float64)
                mean = s1.astype(np.float64) / nf
                var = s2.astype(np.float64) / nf - mean * mean
                std = np.sqrt(np.maximum(var, 0.0))
            flag = (
                np.abs(vals.astype(np.float64) - mean[segs])
                > thresh * std[segs]
            ) & (std[segs] > 0.0)
            n_anom += np.bincount(segs[flag], minlength=n_out).astype(
                np.int64
            )
        keep = cnt > 0
        take = pa.array(doc_take[keep])
        nf = cnt[keep].astype(np.float64)
        mean = s1[keep].astype(np.float64) / nf
        var = s2[keep].astype(np.float64) / nf - mean * mean
        std = np.sqrt(np.maximum(var, 0.0))
        return pa.table(
            {
                source_col: batch.column(source_col).take(take),
                id_col: batch.column(id_col).take(take),
                "window": pa.array(win[keep]),
                "n": pa.array(cnt[keep]),
                "mean": pa.array(mean, type=pa.float64()),
                "std": pa.array(std, type=pa.float64()),
                "n_anom": pa.array(n_anom[keep]),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")
