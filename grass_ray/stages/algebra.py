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
