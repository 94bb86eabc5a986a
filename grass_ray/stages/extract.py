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
    per task — no shuffle join.  Both sides must share a window GRID
    (same gran and worigin per key) — window-id matching across grids
    would silently relocate granules, so a mismatch raises; the
    general cross-grain form is ``stages/algebra.tier_expr`` /
    ``tier_topo``.
    """
    import ray

    b_rows: dict = {}
    for batch in ds_b.iter_batches(batch_format="pyarrow"):
        if "wstarts" in batch.column_names:
            raise NotImplementedError(
                "tier_arith over a RAGGED tier — positional window ids "
                "are not comparable even on equal grids; use tier_expr"
            )
        d = batch.to_pydict()
        for i in range(len(d[key_cols[0]])):
            key = tuple(d[k][i] for k in key_cols)
            b_rows[key] = (
                np.asarray(d["windows"][i], dtype=np.int64),
                np.array(
                    [np.nan if v is None else v for v in d[value_col][i]],
                    dtype=np.float64,
                ),
                int(d.get("gran", [0] * batch.num_rows)[i] or 0),
                int((d.get("worigin") or [0] * batch.num_rows)[i] or 0),
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
        if "wstarts" in batch.column_names:
            raise NotImplementedError(
                "tier_arith over a RAGGED tier — positional window ids "
                "are not comparable even on equal grids; use tier_expr"
            )
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
            wb, vb, gb, ob = side[key]
            ga = int(d.get("gran", [0] * batch.num_rows)[i] or 0)
            oa = int((d.get("worigin") or [0] * batch.num_rows)[i] or 0)
            if (ga, oa) != (gb, ob):
                raise ValueError(
                    f"tier_arith across different window grids "
                    f"(gran/worigin {ga}/{oa} vs {gb}/{ob} for key "
                    f"{key}) — window ids are not comparable; use "
                    "tier_expr/tier_topo or cascade to a common grid"
                )
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


_SE_DTYPE = np.dtype([("s", "<i8"), ("e", "<i8")])


def _pack_se(s: np.ndarray, e: np.ndarray) -> np.ndarray:
    """(start, end) pairs as a sortable/searchable structured array."""
    a = np.empty(len(s), dtype=_SE_DTYPE)
    a["s"] = s
    a["e"] = e
    return a


def _row_extents(batch: pa.Table):
    """(offsets, starts, ends) flat views of each row's window EXTENTS:
    explicit ``wstarts``/``wends`` when present (ragged tier), else the
    grid formula worigin + w·gran."""

    def combine(c):
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    wcol = combine(batch.column("windows"))
    lens = wcol.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    if "wstarts" in batch.column_names:
        s = combine(batch.column("wstarts")).flatten()
        e = combine(batch.column("wends")).flatten()
        return (
            offs,
            s.to_numpy(zero_copy_only=False).astype(np.int64),
            e.to_numpy(zero_copy_only=False).astype(np.int64),
        )
    wflat = wcol.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    gran = batch.column("gran").to_numpy(zero_copy_only=False).astype(np.int64)
    if "worigin" in batch.column_names:
        import pyarrow.compute as pc

        orig = (
            pc.fill_null(batch.column("worigin"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    else:
        orig = np.zeros(batch.num_rows, dtype=np.int64)
    g_el = np.repeat(gran, lens)
    s = np.repeat(orig, lens) + wflat * g_el
    return offs, s, s + g_el


def tier_select(
    ds_a,
    ds_b,
    *,
    invert: bool = False,
    key_cols=("source", "doc_id"),
    buckets: int = 64,
):
    """Temporal selection — `A : B` / `A !: B` of t.rast.algebra
    (``python/grass/temporal/temporal_algebra.py`` selection operators,
    default ``{:,equal,l}``): keep A's windows whose EXTENT coincides
    with (or, inverted, differs from every) B extent for the same key.
    Matching on extents rather than window ids makes cross-grid and
    RAGGED operands exact — a gran-60 window 1 never equals a gran-180
    window 1, and u/d/i extents match only when coincident.

    Distributed shape: B explodes to per-key extent lists WITHIN each
    block (one Acero group-by per batch — the combiner, honoring the
    bucket-exchange pre-combined-rows contract), one bucket exchange
    concatenates them per key, and an Arrow-native ``attach_column``
    index join (broadcast small / exchange large; list payloads ride
    zero-copy, no pandas round trip) lands each key's packed extent
    list next to its A rows; the filter itself is one vectorized
    searchsorted per row.  Nothing is collected driver-side.  The
    payload packs starts+ends as ONE list (first half starts) so a
    single attach suffices; keys pack into one composite string.
    Ragged A output is materialized (the ragged-producer invariant,
    see ``algebra._schema_ragged``).
    """
    import pyarrow.compute as pc

    from grass_ray.stages.join import _bucket_ids, attach_column

    keys = list(key_cols)
    a_sch = ds_a.schema()
    if a_sch is None:
        return ds_a  # empty A: nothing to select either way
    a_names = list(a_sch.names)
    a_ragged = "wstarts" in a_names

    def composite(batch: pa.Table) -> pa.Array:
        # length-prefixed parts ("3:foo7:bar\x1fbaz...") — immune to
        # separator characters inside key values (no tuple collision)
        parts: list = []
        for k in keys:
            c = batch.column(k)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            c = c.cast(pa.string())
            parts.append(pc.binary_length(c).cast(pa.string()))
            parts.append(":")
            parts.append(c)
        return pc.binary_join_element_wise(*parts, "")

    def explode_combine(batch: pa.Table) -> pa.Table:
        # flat (key, s, e) rows, block-locally combined to one row per
        # key with list columns (C++ hash group-by — the combiner)
        offs, s, e = _row_extents(batch)
        rep = pa.array(
            np.repeat(np.arange(batch.num_rows), np.diff(offs)),
            type=pa.int64(),
        )
        t = pa.table(
            {
                "_k": composite(batch).take(rep),
                "_bs": pa.array(s, type=pa.int64()),
                "_be": pa.array(e, type=pa.int64()),
            }
        )
        m = t.group_by(["_k"], use_threads=False).aggregate(
            [("_bs", "list"), ("_be", "list")]
        )
        m = m.rename_columns(["_k", "_bs", "_be"])
        return m.append_column(
            "_bucket", pa.array(_bucket_ids(m, ["_k"], buckets))
        )

    def merge_bucket(batch: pa.Table) -> pa.Table:
        # concatenate each key's per-block extent lists into ONE packed
        # list [s..., e...] (equal halves); grouping/views via the
        # shared algebra helpers (runtime import — algebra imports
        # this module at load time, the reverse edge must be lazy)
        from grass_ray.stages.algebra import _key_groups, _list_views

        kcol = batch.column("_k")
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        order, starts, ends = _key_groups(batch, ["_k"])
        so, sf = _list_views(batch.column("_bs"), floats=False)
        eo, ef = _list_views(batch.column("_be"), floats=False)
        reps: list[int] = []
        parts: list[np.ndarray] = []
        for g in range(len(starts)):
            rows = order[starts[g] : ends[g]]
            s_cat = np.concatenate([sf[so[r] : so[r + 1]] for r in rows])
            e_cat = np.concatenate([ef[eo[r] : eo[r + 1]] for r in rows])
            reps.append(int(rows[0]))
            parts.append(np.concatenate([s_cat, e_cat]))
        lens = np.fromiter(
            (len(p) for p in parts), dtype=np.int64, count=len(parts)
        )
        offs = pa.array(
            np.concatenate([[0], np.cumsum(lens)]).astype(np.int32),
            type=pa.int32(),
        )
        flat = (
            np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        )
        return pa.table(
            {
                "_k": kcol.take(pa.array(np.asarray(reps, dtype=np.int64))),
                "_bse": pa.ListArray.from_arrays(
                    offs, pa.array(flat, type=pa.int64())
                ),
            }
        )

    lookup = (
        ds_b.map_batches(explode_combine, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
        .materialize()
    )
    if lookup.schema() is None or lookup.count() == 0:
        # windowless B: `:` keeps no windows, `!:` keeps everything
        if invert:
            return ds_a
        lookup = None  # keyed kernel below sees empty sets everywhere

    def add_key(batch: pa.Table) -> pa.Table:
        return batch.append_column("_sel_key", composite(batch))

    if lookup is None:
        joined = ds_a.map_batches(
            lambda b: b.append_column(
                "_bse", pa.nulls(b.num_rows, type=pa.list_(pa.int64()))
            ),
            batch_format="pyarrow",
        )
    else:
        joined = attach_column(
            ds_a.map_batches(add_key, batch_format="pyarrow"),
            lookup,
            key_col="_sel_key",
            lookup_key="_k",
            value_col="_bse",
            out_col="_bse",
            how="left",
            buckets=buckets,
        )

    def kernel(batch: pa.Table) -> pa.Table:
        offs, s, e = _row_extents(batch)

        def combine(c):
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        bse = combine(batch.column("_bse"))
        blens = (
            pc.fill_null(pc.list_value_length(bse), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        boffs = np.concatenate([[0], np.cumsum(blens)]).astype(np.int64)
        b_flat = bse.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.zeros(offs[-1], dtype=bool)
        for i in range(batch.num_rows):
            seg = slice(offs[i], offs[i + 1])
            nb = blens[i] // 2  # packed [s..., e...] halves
            if nb == 0:
                hit = np.zeros(offs[i + 1] - offs[i], dtype=bool)
            else:
                lo = boffs[i]
                arr = np.sort(
                    _pack_se(b_flat[lo : lo + nb], b_flat[lo + nb : lo + 2 * nb])
                )
                needles = _pack_se(s[seg], e[seg])
                idx = np.searchsorted(arr, needles)
                idxc = np.minimum(idx, nb - 1)
                hit = (idx < nb) & (arr[idxc] == needles)
            keep[seg] = hit != invert  # XOR with the !: inversion
        kept_lens = np.zeros(batch.num_rows, dtype=np.int64)
        row_of = np.repeat(np.arange(batch.num_rows), np.diff(offs))
        if keep.any():
            np.add.at(kept_lens, row_of[keep], 1)
        new_offs = pa.array(
            np.concatenate([[0], np.cumsum(kept_lens)]).astype(np.int32),
            type=pa.int32(),
        )
        sel = pa.array(np.flatnonzero(keep), type=pa.int64())
        cols = {}
        for k in a_names:
            c = combine(batch.column(k))
            if isinstance(c.type, pa.ListType):
                cols[k] = pa.ListArray.from_arrays(
                    new_offs, c.flatten().take(sel)
                )
            else:
                cols[k] = c
        return pa.table(cols)

    out = joined.map_batches(kernel, batch_format="pyarrow")
    if a_ragged:
        # ragged producers materialize (see algebra._schema_ragged)
        out = out.materialize()
    return out
