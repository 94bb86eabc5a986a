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


_DELTA_UNITS = ("second", "minute", "hour", "max_days", "day", "month", "year")


def compute_datetime_delta(start, end) -> dict:
    """Accumulated calendar delta between two datetimes.

    Faithful re-derivation of the reference's decomposition
    (``datetime_math.py:507-709``): each unit holds the TOTAL delta
    expressed in that unit when the unit's own component differs (or a
    larger unit carries it), 0 when both endpoints sit on the unit's
    origin; ``max_days`` is the plain day span."""
    day_diff = (end - start).days
    comp = {
        "year": end.year - start.year,
        "month": 0,
        "day": 0,
        "hour": 0,
        "minute": 0,
        "second": 0,
        "max_days": day_diff,
    }
    if start.month == 1 and end.month == 1:
        comp["month"] = 0
    elif start.day == 1 and end.day == 1:
        d = end.month - start.month
        if d < 0:
            d += 12 * comp["year"]
        elif d == 0:
            d = 12 * comp["year"]
        comp["month"] = d
    comp["day"] = 0 if start.day == 1 and end.day == 1 else day_diff
    if not (start.hour == 0 and end.hour == 0):
        d = end.hour - start.hour
        d += 24 + 24 * day_diff if d < 0 else 24 * day_diff
        comp["hour"] = d
    if not (start.minute == 0 and end.minute == 0):
        d = end.minute - start.minute
        if d != 0:
            d += 60 * comp["hour"] if comp["hour"] else 24 * 60 * day_diff
        else:
            d = 60 * comp["hour"] if comp["hour"] else 24 * 60 * day_diff
        comp["minute"] = d
    if not (start.second == 0 and end.second == 0):
        d = end.second - start.second
        if d != 0:
            if comp["minute"]:
                d += 60 * comp["minute"]
            elif comp["hour"]:
                d += 3600 * comp["hour"]
            else:
                d += 24 * 60 * 60 * day_diff
        elif comp["minute"]:
            d = 60 * comp["minute"]
        elif comp["hour"]:
            d = 3600 * comp["hour"]
        else:
            d = 24 * 60 * 60 * day_diff
        comp["second"] = d
    return comp


_ABS_MULTIPLIERS = {
    "second": {"minute": 60, "hour": 3600, "day": 24 * 3600, "max_days": 24 * 3600},
    "minute": {"hour": 60, "day": 24 * 60, "max_days": 24 * 60},
    "hour": {"day": 24, "max_days": 24},
    "day": {"max_days": 1},
    "month": {"year": 12},
}


def infer_granularity_absolute(starts, ends=None) -> str | None:
    """Mixed-unit absolute granularity — the
    ``compute_absolute_time_granularity`` algorithm
    (``temporal_granularity.py:339-529``): per interval/gap, record the
    smallest non-zero unit of its calendar delta (month/year kept
    separate from day-based units — a month is not a fixed number of
    days); the answer is the GCD over the smallest recorded unit, with
    larger uniform units converted in.

    ``starts``/``ends`` are sequences of ``datetime`` (ends entries may
    be None for instances).  Returns e.g. ``'6 hours'`` / ``'1 month'``
    or None for a single instant.
    """
    starts = list(starts)
    ends = list(ends) if ends is not None else [None] * len(starts)
    order = sorted(range(len(starts)), key=lambda i: starts[i])
    units: dict[str, set] = {u: set() for u in _DELTA_UNITS}

    def record(delta: dict):
        for u in _DELTA_UNITS:
            if delta.get(u, 0) > 0:
                units[u].add(delta[u])
                if u != "max_days":
                    break

    prev_start = starts[order[0]]
    prev_end = ends[order[0]]
    for i in order:
        s, e = starts[i], ends[i]
        if e is not None:
            record(compute_datetime_delta(s, e))
        after_prev = s > (prev_end if prev_end is not None else prev_start)
        if after_prev:
            record(
                compute_datetime_delta(
                    prev_end if prev_end is not None else prev_start, s
                )
            )
        prev_start, prev_end = s, e

    assigned = None
    for u in _DELTA_UNITS:
        if units[u] and u != "max_days":
            assigned = u
            break
    if assigned is None:
        return None
    dlist = set(units[assigned])
    for unit, factor in _ABS_MULTIPLIERS.get(assigned, {}).items():
        if units[unit]:
            dlist.update(v * factor for v in units[unit])
    if not dlist:
        return None
    g = 0
    for v in dlist:
        g = math.gcd(g, int(v))
    plural = "s" if g > 1 else ""
    return f"{g} {assigned}{plural}"


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
