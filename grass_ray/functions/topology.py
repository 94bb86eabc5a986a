"""Allen interval relations + granularity inference — pure batch functions.

The reference classifies every pair of temporal extents into one of 13
Allen relations (``python/grass/temporal/temporal_extent.py:431-968``)
and uses them to select window inputs (``aggregation.py:294-320``).
Instances (end is NULL) are treated as zero-length intervals, matching
the reference's special cases.

Also: granularity inference = GCD of interval lengths and gap lengths
(``temporal_granularity.py:184-333`` relative form — our positions are
integers, so only the relative form applies).
"""

from __future__ import annotations

import math

import numpy as np

RELATIONS = (
    "equal",
    "during",
    "contains",
    "overlaps",
    "overlapped",
    "starts",
    "started",
    "finishes",
    "finished",
    "precedes",
    "follows",
    "before",
    "after",
)


def relation(a_start, a_end, b_start, b_end) -> str:
    """Allen relation of interval A vs B (ends may be None = instance).

    Mirrors temporal_extent.py's predicate set: `precedes` = A ends
    exactly where B starts (meets), `before` = strictly earlier with a
    gap; `follows`/`after` symmetric.
    """
    ae = a_start if a_end is None else a_end
    be = b_start if b_end is None else b_end
    if a_start == b_start and ae == be:
        return "equal"
    if a_start > b_start and ae < be:
        return "during"
    if a_start < b_start and ae > be:
        return "contains"
    if a_start == b_start and ae < be:
        return "starts"
    if a_start == b_start and ae > be:
        return "started"
    if ae == be and a_start > b_start:
        return "finishes"
    if ae == be and a_start < b_start:
        return "finished"
    if ae == b_start:
        return "precedes"
    if be == a_start:
        return "follows"
    if a_start < b_start and ae > b_start and ae < be:
        return "overlaps"
    if a_start > b_start and a_start < be and ae > be:
        return "overlapped"
    if ae < b_start:
        return "before"
    return "after"


def relations_vector(a_start, a_end, b_start, b_end) -> np.ndarray:
    """Vectorized Allen classification for aligned pairs (int64 arrays)."""
    out = np.empty(len(a_start), dtype=object)
    for i in range(len(a_start)):
        out[i] = relation(
            int(a_start[i]), int(a_end[i]), int(b_start[i]), int(b_end[i])
        )
    return out


def select_by_relations(
    win_start: int,
    win_end: int,
    starts: np.ndarray,
    ends: np.ndarray,
    wanted=("contains",),
) -> np.ndarray:
    """Indices of intervals matching any wanted relation vs the window —
    vectorized for the relations t.rast.aggregate actually samples with
    (``aggregation.py:294-320``: equal/during/contains/overlaps/
    overlapped/starts/started/finishes/finished).

    NOTE the direction: sampling asks "window <relation> map", so
    `contains` keeps maps fully inside the window.
    """
    keep = np.zeros(len(starts), dtype=bool)
    for w in wanted:
        if w == "contains":
            keep |= (starts >= win_start) & (ends <= win_end)
        elif w == "during":
            keep |= (starts < win_start) & (ends > win_end)
        elif w == "equal":
            keep |= (starts == win_start) & (ends == win_end)
        elif w == "overlaps":
            keep |= (win_start < starts) & (win_end > starts) & (win_end < ends)
        elif w == "overlapped":
            keep |= (win_start > starts) & (win_start < ends) & (win_end > ends)
        elif w == "starts":
            keep |= (starts == win_start) & (ends > win_end)
        elif w == "started":
            keep |= (starts == win_start) & (ends < win_end)
        elif w == "finishes":
            keep |= (ends == win_end) & (starts < win_start)
        elif w == "finished":
            keep |= (ends == win_end) & (starts > win_start)
        else:
            raise ValueError(f"unsupported sampling relation {w!r}")
    return np.flatnonzero(keep)


def infer_granularity(starts: np.ndarray, ends: np.ndarray | None = None) -> int:
    """Relative-granularity inference: GCD of interval lengths and gaps
    (``compute_relative_time_granularity``)."""
    starts = np.sort(np.asarray(starts, dtype=np.int64))
    g = 0
    if ends is not None:
        ends = np.asarray(ends, dtype=np.int64)
        for d in (ends - starts):
            if d > 0:
                g = math.gcd(g, int(d))
    for d in np.diff(starts):
        if d > 0:
            g = math.gcd(g, int(d))
    return g if g else 1


def shift_windows(windows: np.ndarray, gran: int) -> np.ndarray:
    """`t.shift`: add one granule to every window id
    (``abstract_space_time_dataset.py:1953-2096`` relative branch)."""
    return np.asarray(windows, dtype=np.int64) + gran


def snap_intervals(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """`t.snap`: each end time becomes the next start; the last interval
    keeps its length if positive, else extends by the inferred
    granularity (``abstract_space_time_dataset.py:2098-2215``)."""
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64).copy()
    order = np.argsort(starts)
    s, e = starts[order], ends[order]
    new_e = e.copy()
    new_e[:-1] = s[1:]
    if len(s) > 1 and new_e[-1] <= s[-1]:
        new_e[-1] = s[-1] + infer_granularity(s)
    out = np.empty_like(ends)
    out[order] = new_e
    return out
