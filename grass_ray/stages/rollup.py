"""Windowed rollup — the ``t.rast.aggregate`` / ``r.series`` analog.

The reference rolls a stack of timestamped maps into granularity windows
(``temporal/t.rast.aggregate/t.rast.aggregate.py:150-185`` builds the
windows, ``raster/r.series/main.c:501-620`` reduces each window's stack
per cell).  Here the per-key series is a ``tokens: list<int32>`` column
— token position = sample time — so ``window = pos // gran`` and, since
a document's whole series lives in one row, the windowed reduction is
**row-local**: a stateless zero-copy ``map_batches`` over Arrow batches
with **no shuffle at all**.  This is the engine's fast path and the
reason the tier build scales linearly: every block is independent.

The general path (:mod:`grass_ray.stages.grouped`) covers inputs where a
key's samples span rows (point streams, the events table) and needs the
hash shuffle + salting that the reference never had to think about.

Window semantics matched to the reference:

* floor alignment of the first window (``adjust_datetime_to_granularity``
  → integer positions degenerate to ``window = (pos + origin) // gran``,
  SURVEY §2.12).
* every reducer from §2.1 via :mod:`grass_ray.functions.reducers`,
  multiple methods evaluated in one pass over the same exploded stack
  (≙ multiple outputs per pass, ``r.series/main.c:584-603``).
* ``-n`` propagate-nulls, ``range=lo,hi`` filter, weighted variants.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from grass_ray.functions.reducers import (
    INT_OUTPUT_METHODS,
    reduce_segments,
)

DEFAULT_METHODS = ("count", "sum", "minimum", "maximum", "average")

#: explode budget per kernel invocation (~32M values ≈ 256 MB of f64
#: working set) — the reference's `bufrows` memory budgeting analog
_MAX_EXPLODE_VALUES = 32_000_000


def _flat_tokens_f64(tokens: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<int32> column -> flat float64 values with NaN at nulls."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    flat = tokens.flatten()
    return flat.cast(pa.float64()).to_numpy(zero_copy_only=False)


def _window_layout(n_tok: np.ndarray, gran: int, origin: int):
    """Per-row window segmentation for contiguous positions 0..n-1.

    Returns (seg_row, seg_window, seg_lengths, nwin_per_row).  With
    origin != 0 the first window of each row may be partial on the left
    (floor alignment — SURVEY §2.12).
    """
    n_tok = n_tok.astype(np.int64)
    first_w = origin // gran
    last_w = (origin + np.maximum(n_tok, 1) - 1) // gran
    nwin = np.where(n_tok > 0, last_w - first_w + 1, 0)
    total = int(nwin.sum())
    seg_row = np.repeat(np.arange(len(n_tok), dtype=np.int64), nwin)
    wstarts = np.zeros(len(n_tok), dtype=np.int64)
    np.cumsum(nwin[:-1], out=wstarts[1:])
    win_local = np.arange(total, dtype=np.int64) - np.repeat(wstarts, nwin)
    seg_window = first_w + win_local
    # element range of window w within a row: positions
    # [w*gran - origin, (w+1)*gran - origin) clipped to [0, n)
    lo = np.maximum(seg_window * gran - origin, 0)
    hi = np.minimum((seg_window + 1) * gran - origin, n_tok[seg_row])
    seg_lengths = hi - lo
    return seg_row, seg_window, seg_lengths, nwin


def rollup_batch(
    batch: pa.Table,
    gran: int,
    methods=DEFAULT_METHODS,
    *,
    origin: int = 0,
    lo: float | None = None,
    hi: float | None = None,
    propagate_nulls: bool = False,
    quantiles: dict | None = None,
    thresh: float | None = None,
    weights=None,
    nested: bool = False,
    register_null: bool = True,
    key_cols: tuple = ("source", "doc_id"),
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
) -> pa.Table:
    """Roll one Arrow corpus batch into per-(key, window) points.

    nested=False -> one output row per (key, window):
        (key_cols..., window:int64, <method>:float64 ...)
    nested=True  -> one output row per key with parallel list columns:
        (key_cols..., gran:int64, windows:list<int64>, <method>:list<f64>)
    The nested form keeps the tier cascade, gap-fill and codec row-local.

    Memory guard (≙ the reference's ``bufrows`` budgeting,
    ``r.series/main.c:414-432``): when a batch would explode more than
    ~32M values (very wide rows), it is processed in row chunks and the
    outputs concatenated, bounding peak working-set regardless of
    ``batch_size`` × ``n_tok``.

    register_null=False drops all-NULL windows entirely — the
    reference's default (NULL-only outputs are not registered unless
    ``-n``, ``aggregation.py:199-206``), turning them into *gaps* that
    ``gapfill`` will interpolate across.  Default True keeps them as
    explicit NULL points (poisoning interpolation like a NULL map).
    """
    n_tok = batch.column(n_tok_col).to_numpy(zero_copy_only=False)
    total_vals = int(n_tok.astype(np.int64).sum())
    if total_vals > _MAX_EXPLODE_VALUES and batch.num_rows > 1:
        # chunk rows so each sub-batch stays under the explode budget
        csum = np.cumsum(n_tok.astype(np.int64))
        outs = []
        start = 0
        while start < batch.num_rows:
            base = int(csum[start] - n_tok[start])
            end = int(np.searchsorted(csum, base + _MAX_EXPLODE_VALUES, side="right"))
            end = max(end, start + 1)
            outs.append(
                rollup_batch(
                    batch.slice(start, end - start),
                    gran,
                    methods,
                    origin=origin,
                    lo=lo,
                    hi=hi,
                    propagate_nulls=propagate_nulls,
                    quantiles=quantiles,
                    thresh=thresh,
                    weights=weights,
                    nested=nested,
                    register_null=register_null,
                    key_cols=key_cols,
                    tokens_col=tokens_col,
                    n_tok_col=n_tok_col,
                )
            )
            start = end
        return pa.concat_tables(outs)
    seg_row, seg_window, seg_lengths, nwin = _window_layout(
        n_tok, gran, origin
    )
    fast_ok = (
        weights is None
        and lo is None
        and hi is None
        and not propagate_nulls
        and not quantiles
        and thresh is None
        and set(methods) <= {"count", "sum", "minimum", "maximum", "average", "range"}
        and pa.types.is_integer(batch.column(tokens_col).type.value_type)
    )
    if fast_ok:
        results = _fast_int_reduce(batch.column(tokens_col), seg_lengths, methods)
        if not register_null:
            seg_row, seg_window, nwin, results = _drop_null_windows(
                batch.column(tokens_col), seg_lengths, seg_row, seg_window,
                len(n_tok), results,
            )
        return _emit(
            batch, results, seg_row, seg_window, nwin, nested, key_cols, n_tok, gran
        )
    values = _flat_tokens_f64(batch.column(tokens_col))
    elem_weights = None
    if weights is not None:
        # one weight per window-local position (the r.series per-input
        # weight, main.c:442-460): broadcast the length-`gran` vector to
        # every element by its position within the window
        wvec = np.asarray(weights, dtype=np.float64)
        if len(wvec) != gran:
            raise ValueError("weights must have length == gran")
        total = int(n_tok.astype(np.int64).sum())
        starts = np.zeros(len(n_tok), dtype=np.int64)
        np.cumsum(n_tok[:-1].astype(np.int64), out=starts[1:])
        pos = (
            np.arange(total, dtype=np.int64)
            - np.repeat(starts, n_tok.astype(np.int64))
            + origin
        )
        elem_weights = wvec[pos % gran]
    results = reduce_segments(
        values,
        seg_lengths,
        methods,
        weights=elem_weights,
        lo=lo,
        hi=hi,
        propagate_nulls=propagate_nulls,
        quantiles=quantiles,
        thresh=thresh,
    )
    if not register_null:
        seg_row, seg_window, nwin, results = _drop_null_windows(
            batch.column(tokens_col), seg_lengths, seg_row, seg_window,
            len(n_tok), results,
        )
    return _emit(
        batch, results, seg_row, seg_window, nwin, nested, key_cols, n_tok, gran
    )


def _drop_null_windows(tokens, seg_lengths, seg_row, seg_window, nrows, results):
    """Drop segments with zero valid values (register_null=False)."""
    import pyarrow.compute as pc

    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    valid = pc.is_valid(tokens.flatten()).to_numpy(zero_copy_only=False)
    starts = np.zeros(len(seg_lengths), dtype=np.int64)
    np.cumsum(seg_lengths[:-1], out=starts[1:])
    cnt = (
        np.add.reduceat(valid.astype(np.int64), starts)
        if len(starts)
        else np.empty(0, np.int64)
    )
    keep = cnt > 0
    seg_row = seg_row[keep]
    seg_window = seg_window[keep]
    nwin = np.bincount(seg_row, minlength=nrows).astype(np.int64)
    results = {k: v[keep] for k, v in results.items()}
    return seg_row, seg_window, nwin, results


def _fast_int_reduce(tokens, seg_lengths, methods) -> dict[str, np.ndarray]:
    """Decomposable reducers straight on int32 tokens + validity —
    ~3x less memory traffic than the float64 path, same results
    (integer sums are exact in both)."""
    import pyarrow.compute as pc

    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    flat = tokens.flatten()
    no_nulls = flat.null_count == 0
    if no_nulls:
        # gap-free fast path: the validity bitmap, fill_null copy and
        # the masked min/max temporaries all drop out, and the count
        # IS the segment length
        valid = None
        vals = flat.to_numpy(zero_copy_only=False)
    else:
        valid = pc.is_valid(flat).to_numpy(zero_copy_only=False)
        vals = flat.fill_null(0).to_numpy(zero_copy_only=False)
    starts = np.zeros(len(seg_lengths), dtype=np.int64)
    np.cumsum(seg_lengths[:-1], out=starts[1:])
    n = len(vals)
    empty_seg = len(starts) == 0
    if empty_seg:
        cnt = np.empty(0, np.int64)
    elif no_nulls:
        cnt = np.asarray(seg_lengths, dtype=np.int64)
    else:
        cnt = np.add.reduceat(valid, starts, dtype=np.int64)
    out: dict[str, np.ndarray] = {}
    zero = cnt == 0
    need = set(methods)
    if {"sum", "average"} & need:
        s = (
            np.add.reduceat(vals, starts, dtype=np.int64)
            if not empty_seg
            else np.empty(0, np.int64)
        ).astype(np.float64)
        s[zero] = np.nan
        if "sum" in need:
            out["sum"] = s
        if "average" in need:
            with np.errstate(invalid="ignore", divide="ignore"):
                out["average"] = s / cnt
    if {"minimum", "range"} & need:
        info = np.iinfo(vals.dtype)
        mn = (
            np.minimum.reduceat(
                vals if no_nulls else np.where(valid, vals, info.max), starts
            )
            if not empty_seg
            else np.empty(0, vals.dtype)
        ).astype(np.float64)
        mn[zero] = np.nan
    if {"maximum", "range"} & need:
        info = np.iinfo(vals.dtype)
        mx = (
            np.maximum.reduceat(
                vals if no_nulls else np.where(valid, vals, info.min), starts
            )
            if not empty_seg
            else np.empty(0, vals.dtype)
        ).astype(np.float64)
        mx[zero] = np.nan
    ordered: dict[str, np.ndarray] = {}
    for m in methods:
        if m == "count":
            ordered["count"] = cnt.astype(np.float64)
        elif m == "sum":
            ordered["sum"] = out["sum"]
        elif m == "average":
            ordered["average"] = out["average"]
        elif m == "minimum":
            ordered["minimum"] = mn
        elif m == "maximum":
            ordered["maximum"] = mx
        elif m == "range":
            ordered["range"] = mx - mn
    return ordered


def _emit(batch, results, seg_row, seg_window, nwin, nested, key_cols, n_tok, gran):
    out_names = list(results.keys())
    if not nested:
        cols: dict[str, pa.Array] = {}
        for k in key_cols:
            cols[k] = batch.column(k).take(pa.array(seg_row))
        cols["window"] = pa.array(seg_window, type=pa.int64())
        for name in out_names:
            cols[name] = _result_array(name, results[name])
        return pa.table(cols)
    # nested: pack segments back into one row per input row
    offsets = pa.array(
        np.concatenate([[0], np.cumsum(nwin)]).astype(np.int32)
    )
    cols = {k: batch.column(k) for k in key_cols}
    cols["gran"] = pa.array(
        np.full(len(n_tok), gran, dtype=np.int64)
    )
    cols["windows"] = pa.ListArray.from_arrays(
        offsets, pa.array(seg_window, type=pa.int64())
    )
    for name in out_names:
        cols[name] = pa.ListArray.from_arrays(
            offsets, _result_array(name, results[name])
        )
    return pa.table(cols)


def _result_array(name: str, arr: np.ndarray) -> pa.Array:
    """float64 results -> Arrow, NaN becoming real nulls; integer-typed
    methods (count/diversity/*_raster — CELL outputs in the reference
    method table, r.series/main.c:40-65) stay int64 where non-null."""
    mask = np.isnan(arr)
    if name in INT_OUTPUT_METHODS:
        ints = np.where(mask, 0, arr).astype(np.int64)
        return pa.array(ints, type=pa.int64(), mask=mask)
    return pa.array(arr, type=pa.float64(), mask=mask)


def rollup(
    ds,
    gran: int,
    methods=DEFAULT_METHODS,
    *,
    nested: bool = False,
    batch_size: int | None = 512,
    **kw,
):
    """Dataset-level rollup: corpus -> per-(source, doc_id, window) points.

    Pure streaming ``map_batches`` (no shuffle): windows never span rows,
    so each block reduces independently — the Ray Data analog of one
    ``r.series`` process per granule window
    (``aggregation.py:269-389``) without the process queue.
    """
    return ds.map_batches(
        lambda b: rollup_batch(b, gran, methods, nested=nested, **kw),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def series_collapse(
    ds,
    methods=DEFAULT_METHODS,
    *,
    batch_size: int | None = 512,
    **kw,
):
    """Whole-series collapse — the ``t.rast.series`` analog
    (``temporal/t.rast.series/t.rast.series.py:90-214``): one window per
    key covering the entire series (gran = +inf ⇒ window 0)."""

    def kernel(batch: pa.Table) -> pa.Table:
        n_tok = batch.column("n_tok").to_numpy(zero_copy_only=False)
        gran = int(max(1, n_tok.max() if len(n_tok) else 1))
        t = rollup_batch(batch, gran, methods, **kw)
        return t.drop_columns(["window"])

    return ds.map_batches(kernel, batch_format="pyarrow", batch_size=batch_size)


def explode_tokens(
    ds,
    *,
    batch_size: int | None = 512,
    key_cols: tuple = ("source", "doc_id"),
):
    """corpus -> flat (key..., pos:int64, token:float64-nullable) points.

    The generic entry into the grouped/shuffle path and the shape the
    DuckDB oracle uses (UNNEST).  Zero-copy on the token values.
    """

    def kernel(batch: pa.Table) -> pa.Table:
        tokens = batch.column("tokens")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        n_tok = batch.column("n_tok").to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(n_tok.sum())
        row_of = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        starts = np.zeros(len(n_tok), dtype=np.int64)
        np.cumsum(n_tok[:-1], out=starts[1:])
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, n_tok)
        cols = {
            k: batch.column(k).take(pa.array(row_of)) for k in key_cols
        }
        cols["pos"] = pa.array(pos)
        cols["token"] = tokens.flatten()
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow", batch_size=batch_size)
