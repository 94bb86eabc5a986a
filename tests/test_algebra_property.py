"""Property-based parity for the algebra expression evaluator.

Random expression trees over two tiers + scalars are evaluated by
`compile_tier_expr` (the engine's compiled form) and by a literal
recursive numpy oracle built alongside the random tree — any divergence
in alignment, NULL propagation, or operator semantics fails."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from grass_ray.stages.algebra import _Series, compile_tier_expr

GRAN = {"A": 1, "B": 1}


def _mk_series(windows, values):
    return _Series(np.asarray(windows, dtype=np.int64), np.asarray(values, dtype=np.float64))


@st.composite
def exprs(draw, depth=0):
    """(expression string, oracle fn(env)->(wset, fn(w)->val))."""
    if depth >= 3 or draw(st.booleans()) and depth > 0:
        choice = draw(st.sampled_from(["A", "B", "lit"]))
        if choice == "lit":
            v = draw(st.integers(min_value=-4, max_value=4))
            return str(v), ("scalar", float(v))
        return choice, ("tier", choice)
    op = draw(st.sampled_from(["+", "-", "*", "if", "cmp"]))
    if op == "if":
        c, co = draw(exprs(depth=depth + 1))
        a, ao = draw(exprs(depth=depth + 1))
        b, bo = draw(exprs(depth=depth + 1))
        return f"if({c} > 0, {a}, {b})", ("if", co, ao, bo)
    if op == "cmp":
        a, ao = draw(exprs(depth=depth + 1))
        b, bo = draw(exprs(depth=depth + 1))
        return f"({a} <= {b})", ("<=", ao, bo)
    a, ao = draw(exprs(depth=depth + 1))
    b, bo = draw(exprs(depth=depth + 1))
    return f"({a} {op} {b})", (op, ao, bo)


def _oracle_eval(node, env):
    """Literal evaluator: returns (windows|None, value-lookup)."""
    kind = node[0]
    if kind == "scalar":
        return None, (lambda w, _v=node[1]: _v)
    if kind == "tier":
        s = env[node[1]]
        table = dict(zip(s.w.tolist(), s.v.tolist()))
        return set(s.w.tolist()), (lambda w, _t=table: _t[w])
    if kind == "if":
        # every condition this grammar generates reads bare tier VALUES,
        # so it is the reference's *spatial* conditional: one mapcalc
        # over the topological join of ALL series operands — a window
        # survives only where cond AND every series branch have a value
        # (unittests_temporal_raster_conditionals.py:223-238)
        wc, fc = _oracle_eval(node[1], env)
        wa, fa = _oracle_eval(node[2], env)
        wb, fb = _oracle_eval(node[3], env)
        if wc is None:
            c = fc(0)
            if np.isnan(c):
                return None, (lambda w: float("nan"))
            return (wa, fa) if c > 0 else (wb, fb)
        keep = {
            w
            for w in wc
            if (wa is None or w in wa) and (wb is None or w in wb)
        }

        def f(w):
            c = fc(w)
            if np.isnan(c):
                return float("nan")
            # the generated expression wraps the condition as `c > 0`
            return fa(w) if c > 0 else fb(w)

        return keep, f
    op = kind
    wa, fa = _oracle_eval(node[1], env)
    wb, fb = _oracle_eval(node[2], env)
    ws = [x for x in (wa, wb) if x is not None]
    inter = set.intersection(*ws) if ws else None

    def f(w):
        a, b = fa(w), fb(w)
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "<=":
            if np.isnan(a) or np.isnan(b):
                return float("nan")
            return float(a <= b)
        raise AssertionError(op)

    return inter, f


series_st = st.builds(
    lambda ws, vs: (sorted(set(ws)), vs),
    st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=6),
    st.lists(
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        min_size=6,
        max_size=6,
    ),
)


@settings(max_examples=120, deadline=None)
@given(exprs(), series_st, series_st)
def test_expr_parity(expr_pair, sa, sb):
    expr, oracle_node = expr_pair
    if oracle_node[0] == "scalar":
        return  # scalar-only expressions are rejected by tier_expr
    wa, va_raw = sa
    wb, vb_raw = sb
    va = [float("nan") if v is None else float(v) for v in va_raw[: len(wa)]]
    vb = [float("nan") if v is None else float(v) for v in vb_raw[: len(wb)]]
    env = {"A": _mk_series(wa, va), "B": _mk_series(wb, vb)}
    fn, names = compile_tier_expr(expr, ("A", "B"), GRAN)
    got = fn({n: env[n] for n in names})
    want_w, want_f = _oracle_eval(oracle_node, env)
    if want_w is None:
        # expression reduced to a scalar (no tier operand survived)
        expect = want_f(0)
        if np.isnan(expect):
            assert np.isnan(got)
        else:
            assert float(got) == pytest.approx(expect)
        return
    assert isinstance(got, _Series)
    assert set(got.w.tolist()) == want_w
    for w, v in zip(got.w.tolist(), got.v.tolist()):
        expect = want_f(w)
        if np.isnan(expect):
            assert np.isnan(v), (expr, w, v, expect)
        else:
            assert v == pytest.approx(expect), (expr, w)
