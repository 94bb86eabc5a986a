"""Temporal-algebra front end (t.rast.algebra lite).

The reference compiles a PLY-parsed algebra
(``python/grass/temporal/temporal_algebra.py:552-596, 2320-3371``) down
to per-granule map jobs.  The engine keeps the same shape at survey
altitude: the algebra is a *planner* over the primitives —

* arithmetic ``A + B``, ``A - B``, ``A * B``, ``A / B`` →
  :func:`grass_ray.stages.extract.tier_arith` (inner window match);
* selection ``A : B`` / ``A !: B`` →
  :func:`grass_ray.stages.extract.tier_select`;
* ``tshift(A, n)`` → window shift
  (:func:`grass_ray.functions.topology.shift_windows`);
* per-value map expressions via ``map(A, "x*2+1")`` →
  the mapcalc compiler applied to a tier value column.

``algebra("C = A + B", tiers={"A": ds_a, "B": ds_b})`` returns the
result Dataset (and the name it was bound to).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from grass_ray.stages.extract import mapcalc_expr, tier_arith, tier_select

_BINOP = re.compile(
    r"^\s*(\w+)\s*(\+|\-|\*|/|!:|:)\s*(\w+)\s*$"
)
_TSHIFT = re.compile(r"^\s*tshift\(\s*(\w+)\s*,\s*(-?\d+)\s*\)\s*$")
_BUFF = re.compile(r"^\s*buff\(\s*(\w+)\s*,\s*(\d+)\s*\)\s*$")
_HASH = re.compile(r"^\s*(\w+)\s*#\s*(\w+)\s*$")
_MAP = re.compile(r"^\s*map\(\s*(\w+)\s*,\s*\"(.+)\"\s*\)\s*$")


def _tshift(ds, n: int):
    def kernel(batch: pa.Table) -> pa.Table:
        col = batch.column("windows")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        w = col.flatten().to_numpy(zero_copy_only=False) + n
        offsets = pa.array(
            np.concatenate(
                [[0], np.cumsum(col.value_lengths().to_numpy(zero_copy_only=False))]
            ).astype(np.int32)
        )
        idx = batch.column_names.index("windows")
        return batch.set_column(
            idx, "windows", pa.ListArray.from_arrays(offsets, pa.array(w))
        )

    return ds.map_batches(kernel, batch_format="pyarrow", batch_size=256)


def _map_expr(ds, expr: str, value_col: str = "average"):
    fn = mapcalc_expr(expr)

    def kernel(batch: pa.Table) -> pa.Table:
        col = batch.column(value_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.flatten().cast(pa.float64()).to_numpy(zero_copy_only=False)
        res = fn(v)
        offsets = pa.array(
            np.concatenate(
                [[0], np.cumsum(col.value_lengths().to_numpy(zero_copy_only=False))]
            ).astype(np.int32)
        )
        idx = batch.column_names.index(value_col)
        return batch.set_column(
            idx,
            value_col,
            pa.ListArray.from_arrays(
                offsets, pa.array(res, type=pa.float64(), mask=np.isnan(res))
            ),
        )

    return ds.map_batches(kernel, batch_format="pyarrow", batch_size=256)


def algebra(statement: str, tiers: dict, value_col: str = "average"):
    """Evaluate one algebra statement over named nested tiers.

    Returns (bound_name | None, result_dataset).
    """
    if "=" in statement and not statement.split("=")[0].strip().startswith(("tshift", "map")):
        name, rhs = statement.split("=", 1)
        name = name.strip()
    else:
        name, rhs = None, statement
    rhs = rhs.strip()

    m = _TSHIFT.match(rhs)
    if m:
        return name, _tshift(tiers[m.group(1)], int(m.group(2)))
    m = _BUFF.match(rhs)
    if m:
        return name, buffer_windows(tiers[m.group(1)], int(m.group(2)))
    m = _HASH.match(rhs)
    if m:
        return name, tier_hash(tiers[m.group(1)], tiers[m.group(2)])
    m = _MAP.match(rhs)
    if m:
        return name, _map_expr(tiers[m.group(1)], m.group(2), value_col)
    m = _BINOP.match(rhs)
    if m:
        a, op, b = m.group(1), m.group(2), m.group(3)
        if op == ":":
            return name, tier_select(tiers[a], tiers[b])
        if op == "!:":
            return name, tier_select(tiers[a], tiers[b], invert=True)
        return name, tier_arith(tiers[a], tiers[b], op, value_col=value_col)
    raise ValueError(f"cannot parse algebra statement: {statement!r}")


def tier_hash(ds_a, ds_b, *, key_cols=("source", "doc_id")):
    """`A # B` — the algebra hash operator: per A window, the count of
    B windows it matches (``temporal_operator.py`` hash semantics;
    aligned granularities ⇒ equal-window counts).  B broadcast."""
    import ray

    b_rows: dict = {}
    for batch in ds_b.iter_batches(batch_format="pyarrow"):
        d = batch.to_pydict()
        for i in range(len(d[key_cols[0]])):
            key = tuple(d[k][i] for k in key_cols)
            cnt = b_rows.setdefault(key, {})
            for w in d["windows"][i]:
                cnt[w] = cnt.get(w, 0) + 1
    ref = ray.put(b_rows)

    def kernel(batch: pa.Table) -> pa.Table:
        side = ray.get(ref)
        d = batch.to_pydict()
        out_counts = []
        for i in range(batch.num_rows):
            key = tuple(d[k][i] for k in key_cols)
            cnt = side.get(key, {})
            out_counts.append([cnt.get(w, 0) for w in d["windows"][i]])
        cols = {k: batch.column(k) for k in (*key_cols, "gran", "windows") if k in batch.column_names}
        cols["hash_count"] = pa.array(out_counts, type=pa.list_(pa.int64()))
        return pa.table(cols)

    return ds_a.map_batches(kernel, batch_format="pyarrow", batch_size=256)


def buffer_windows(ds, n: int, *, key_cols=("source", "doc_id")):
    """`buff_t(A, n)` — widen every window's temporal extent by ±n and
    merge overlaps: output one row per merged interval
    (key..., start, end) (``temporal_algebra.py`` buff_t semantics on
    relative time)."""

    def kernel(batch: pa.Table) -> pa.Table:
        d = batch.to_pydict()
        out_key = {k: [] for k in key_cols}
        out_s, out_e = [], []
        for i in range(batch.num_rows):
            ws = sorted(d["windows"][i])
            if not ws:
                continue
            start = ws[0] - n
            end = ws[0] + n + 1
            for w in ws[1:]:
                if w - n <= end:
                    end = max(end, w + n + 1)
                else:
                    for k in key_cols:
                        out_key[k].append(d[k][i])
                    out_s.append(start)
                    out_e.append(end)
                    start, end = w - n, w + n + 1
            for k in key_cols:
                out_key[k].append(d[k][i])
            out_s.append(start)
            out_e.append(end)
        cols = {k: pa.array(out_key[k]) for k in key_cols}
        cols["start"] = pa.array(out_s, type=pa.int64())
        cols["end"] = pa.array(out_e, type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow", batch_size=256)
