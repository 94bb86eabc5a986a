"""Filter + per-record expression transforms — t.rast.extract / t.rast.mapcalc.

* :func:`extract` ≙ ``t.rast.extract`` (``python/grass/temporal/extract.py:115+``):
  subset the corpus by a predicate over key/metadata columns, optionally
  applying an ``r.mapcalc``-style arithmetic expression to every
  selected series.
* :func:`mapcalc_expr` compiles a tiny arithmetic expression over the
  token array (``x`` = token value, NULL-preserving), the per-record
  analog of ``r.mapcalc`` inside ``t.rast.mapcalc``
  (``python/grass/temporal/mapcalc.py:34-300``).
* :func:`tier_arith` ≙ ``t.rast.algebra``-lite: element-wise arithmetic
  between two co-partitioned *nested tiers* aligned on (key, window) —
  the "zip-aligned map_batches arithmetic over co-partitioned tiers"
  plan from SURVEY §2.9.  Alignment is an inner interval match: only
  windows present in both sides survive (the algebra's implicit
  temporal intersection).
"""

from __future__ import annotations

import ast

import numpy as np
import pyarrow as pa

_ALLOWED_NODES = (
    ast.Expression,
    ast.BinOp,
    ast.UnaryOp,
    ast.Num,
    ast.Constant,
    ast.Name,
    ast.Load,
    ast.Add,
    ast.Sub,
    ast.Mult,
    ast.Div,
    ast.FloorDiv,
    ast.Mod,
    ast.Pow,
    ast.USub,
    ast.UAdd,
    ast.Call,
    ast.Compare,
    ast.Gt,
    ast.GtE,
    ast.Lt,
    ast.LtE,
    ast.Eq,
    ast.NotEq,
    ast.IfExp,
)

_FUNCS = {
    "abs": np.abs,
    "sqrt": np.sqrt,
    "exp": np.exp,
    "log": np.log,
    "min": np.minimum,
    "max": np.maximum,
    # r.mapcalc trig is DEGREE-based; int() truncates toward zero
    "sin": lambda v: np.sin(np.deg2rad(v)),
    "cos": lambda v: np.cos(np.deg2rad(v)),
    "tan": lambda v: np.tan(np.deg2rad(v)),
    "asin": lambda v: np.rad2deg(np.arcsin(v)),
    "acos": lambda v: np.rad2deg(np.arccos(v)),
    "int": np.trunc,
    "float": np.asarray,
    "double": np.asarray,
    "if": None,  # handled via IfExp-style call: if(cond, a, b)
    "isnull": np.isnan,
    "null": lambda: np.nan,
}


_CMP_OPS = {
    ast.Gt: ">",
    ast.GtE: ">=",
    ast.Lt: "<",
    ast.LtE: "<=",
    ast.Eq: "==",
    ast.NotEq: "!=",
}


def _nan_cmp(op: str, a, b):
    """Trivalent comparison: NULL operand -> NULL result (r.mapcalc rule).

    Returns float64 1.0/0.0/NaN so if() can propagate the null.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        res = {
            ">": a > b,
            ">=": a >= b,
            "<": a < b,
            "<=": a <= b,
            "==": a == b,
            "!=": a != b,
        }[op].astype(np.float64)
    bad = np.isnan(a) | np.isnan(b)
    return np.where(bad, np.nan, res)


def _nan_where(c, a, b):
    """if(cond, a, b): NULL condition -> NULL (r.mapcalc trivalent if)."""
    c = np.asarray(c, dtype=np.float64)
    out = np.where(c != 0, a, b).astype(np.float64)
    return np.where(np.isnan(c), np.nan, out)


class _CmpRewriter(ast.NodeTransformer):
    def visit_Compare(self, node):
        self.generic_visit(node)
        if len(node.ops) != 1:
            raise ValueError("chained comparisons not supported")
        return ast.Call(
            func=ast.Name(id="_cmp", ctx=ast.Load()),
            args=[
                ast.Constant(_CMP_OPS[type(node.ops[0])]),
                node.left,
                node.comparators[0],
            ],
            keywords=[],
        )


def mapcalc_expr(expr: str):
    """Compile `expr` (over variable ``x``) into a vectorized fn.

    Supported: + - * / // % **, unary -, comparisons, ``if(cond, a, b)``,
    abs/sqrt/exp/log/min/max/isnull/null() — the r.mapcalc subset the
    temporal framework's expressions actually use.  NULL (NaN)
    propagates through arithmetic, comparisons and if(); ``isnull(x)``
    returns 0/1 (never NULL) so the replace-null idiom
    ``if(isnull(x), 0, x)`` works like the reference.
    """
    rewritten = expr.replace("if(", "where(")  # `if` is a Python keyword
    tree = ast.parse(rewritten, mode="eval")
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValueError(
                f"disallowed syntax in expression: {ast.dump(node)[:60]}"
            )
        if (
            isinstance(node, ast.Name)
            and node.id not in ("x", "where")
            and node.id not in _FUNCS
        ):
            raise ValueError(f"unknown name {node.id!r} in expression")
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or (
                node.func.id not in _FUNCS and node.func.id != "where"
            ):
                raise ValueError("only whitelisted functions allowed")
    tree = ast.fix_missing_locations(_CmpRewriter().visit(tree))
    code = compile(tree, "<mapcalc>", "eval")

    def fn(x: np.ndarray) -> np.ndarray:
        env = {k: v for k, v in _FUNCS.items() if v is not None}
        env.update(
            {
                "x": x,
                "_cmp": _nan_cmp,
                "where": _nan_where,
                "isnull": lambda v: np.isnan(v).astype(np.float64),
            }
        )
        with np.errstate(all="ignore"):
            return np.asarray(
                eval(code, {"__builtins__": {}}, env), dtype=np.float64
            )

    return fn


def apply_mapcalc(ds, expr: str, *, tokens_col: str = "tokens", out_col: str | None = None):
    """Apply an expression to every token (NULL in -> NULL out), keeping
    int32 tokens when the result is integral, else float64."""
    fn = mapcalc_expr(expr)
    out_col = out_col or tokens_col

    def kernel(batch: pa.Table) -> pa.Table:
        col = batch.column(tokens_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().cast(pa.float64()).to_numpy(zero_copy_only=False)
        res = fn(flat)
        mask = np.isnan(res)
        offsets = pa.array(
            np.concatenate(
                [[0], np.cumsum(col.value_lengths().to_numpy(zero_copy_only=False))]
            ).astype(np.int32)
        )
        arr = pa.ListArray.from_arrays(
            offsets, pa.array(res, type=pa.float64(), mask=mask)
        )
        idx = batch.column_names.index(tokens_col) if out_col == tokens_col else None
        if idx is not None:
            return batch.set_column(idx, out_col, arr)
        return batch.append_column(out_col, arr)

    return ds.map_batches(kernel, batch_format="pyarrow", batch_size=512)


def extract(ds, *, where=None, expr: str | None = None):
    """``t.rast.extract``: predicate subset + optional expression.

    `where` is a pyarrow-compute predicate fn(batch)->BooleanArray over
    metadata columns (the engine analog of the SQL map-view where clause,
    ``abstract_space_time_dataset.py:1919-1932``).
    """
    out = ds
    if where is not None:
        out = out.map_batches(
            lambda b: b.filter(where(b)), batch_format="pyarrow"
        )
    if expr:
        out = apply_mapcalc(out, expr)
    return out


def tier_arith(ds_a, ds_b, op: str = "+", value_col: str = "average", key_cols=("source", "doc_id")):
    """Element-wise arithmetic between two nested tiers (A op B per
    (key, window), inner window intersection).

    Requires co-partitioned inputs: both sides keyed by the same
    (source, doc_id) — the engine's standing partition contract.  The
    small-side is realized as a broadcast dict {key: (windows, values)}
    via ``ray.put`` (B is typically a coarser/derived tier), read once
    per task — no shuffle join.
    """
    import ray

    b_rows: dict = {}
    for batch in ds_b.iter_batches(batch_format="pyarrow"):
        d = batch.to_pydict()
        for i in range(len(d[key_cols[0]])):
            key = tuple(d[k][i] for k in key_cols)
            b_rows[key] = (
                np.asarray(d["windows"][i], dtype=np.int64),
                np.array(
                    [np.nan if v is None else v for v in d[value_col][i]],
                    dtype=np.float64,
                ),
            )
    ref = ray.put(b_rows)
    ops = {
        "+": np.add,
        "-": np.subtract,
        "*": np.multiply,
        "/": np.divide,
    }
    fn = ops[op]

    def kernel(batch: pa.Table) -> pa.Table:
        side = ray.get(ref)
        d = batch.to_pydict()
        out = {k: [] for k in (*key_cols, "gran", "windows", value_col)}
        for i in range(batch.num_rows):
            key = tuple(d[k][i] for k in key_cols)
            if key not in side:
                continue
            wa = np.asarray(d["windows"][i], dtype=np.int64)
            va = np.array(
                [np.nan if v is None else v for v in d[value_col][i]],
                dtype=np.float64,
            )
            wb, vb = side[key]
            common, ia, ib = np.intersect1d(wa, wb, return_indices=True)
            with np.errstate(all="ignore"):
                res = fn(va[ia], vb[ib])
            for k in key_cols:
                out[k].append(d[k][i])
            out["gran"].append(d.get("gran", [0] * batch.num_rows)[i])
            out["windows"].append(common.tolist())
            out[value_col].append(
                [None if np.isnan(v) else float(v) for v in res]
            )
        return pa.table(
            {
                **{k: pa.array(out[k]) for k in key_cols},
                "gran": pa.array(out["gran"], type=pa.int64()),
                "windows": pa.array(out["windows"], type=pa.list_(pa.int64())),
                value_col: pa.array(out[value_col], type=pa.list_(pa.float64())),
            }
        )

    return ds_a.map_batches(kernel, batch_format="pyarrow", batch_size=256)


def tier_select(ds_a, ds_b, *, invert: bool = False, key_cols=("source", "doc_id")):
    """Temporal selection — `A : B` / `A !: B` of t.rast.algebra
    (``python/grass/temporal/temporal_algebra.py`` selection operators):
    keep A's windows where B has (or, inverted, lacks) the same window
    for the same key.  B's (key -> window set) is broadcast (small side).
    """
    import ray

    b_rows: dict = {}
    for batch in ds_b.iter_batches(batch_format="pyarrow"):
        d = batch.to_pydict()
        for i in range(len(d[key_cols[0]])):
            key = tuple(d[k][i] for k in key_cols)
            b_rows.setdefault(key, set()).update(d["windows"][i])
    ref = ray.put(b_rows)

    def kernel(batch: pa.Table) -> pa.Table:
        side = ray.get(ref)
        d = batch.to_pydict()
        list_cols = [
            k
            for k in batch.column_names
            if isinstance(batch.column(k).type, pa.ListType)
        ]
        out = {k: [] for k in batch.column_names}
        for i in range(batch.num_rows):
            key = tuple(d[k][i] for k in key_cols)
            bw = side.get(key, set())
            ws = d["windows"][i]
            keep = [
                j
                for j, w in enumerate(ws)
                if (w in bw) != invert
            ]
            for k in batch.column_names:
                if k in list_cols:
                    out[k].append([d[k][i][j] for j in keep])
                else:
                    out[k].append(d[k][i])
        arrays = {}
        for k in batch.column_names:
            if k in list_cols:
                arrays[k] = pa.array(out[k], type=batch.column(k).type)
            else:
                arrays[k] = pa.array(out[k], type=batch.schema.field(k).type)
        return pa.table(arrays)

    return ds_a.map_batches(kernel, batch_format="pyarrow", batch_size=256)
