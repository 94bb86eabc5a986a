"""Calendar granularity math — month/year windows for absolute time.

The integer-position MVP degenerates all of ``datetime_math.py`` to
``window = pos // gran`` (SURVEY §2.12); when real timestamps are
attached (the events table) the calendar-aware pieces come back:

* :func:`truncate` ≙ ``adjust_datetime_to_granularity``
  (``python/grass/temporal/datetime_math.py:355-488``): truncate to the
  granularity's *unit* — minutes zero seconds, hours zero min/sec, days
  zero time, weeks back to Monday, months day 1, years Jan 1.
* :func:`window_id` — integer window index per unit (months since
  epoch, ISO weeks since epoch Monday, etc.), the granule id used for
  grouping.
* :func:`increment` ≙ ``increment_datetime_by_string`` month/year
  rolling (``datetime_math.py:128-199``): 2001-11-01 + 13 months =
  2002-12-01.

All vectorized over numpy ``datetime64[us]`` arrays; numpy's calendar
casts implement exactly the truncation semantics (``datetime64[M]`` is
months-since-1970, ``datetime64[W]`` weeks starting Thursday — week
truncation is adjusted to Monday like the reference).
"""

from __future__ import annotations

import numpy as np

UNITS = ("seconds", "minutes", "hours", "days", "weeks", "months", "years")

_NP_UNIT = {
    "seconds": "s",
    "minutes": "m",
    "hours": "h",
    "days": "D",
    "months": "M",
    "years": "Y",
}


def _as_us(ts) -> np.ndarray:
    return np.asarray(ts, dtype="datetime64[us]")


def truncate(ts, unit: str) -> np.ndarray:
    """Truncate timestamps to the granularity unit (datetime64[us] out)."""
    t = _as_us(ts)
    if unit == "weeks":
        # numpy weeks anchor on Thursday; shift so weeks start Monday
        days = t.astype("datetime64[D]")
        dow = (days.view("int64") + 3) % 7  # 1970-01-01 was a Thursday
        return (days - dow.astype("timedelta64[D]")).astype("datetime64[us]")
    if unit not in _NP_UNIT:
        raise ValueError(f"unknown unit {unit!r}")
    return t.astype(f"datetime64[{_NP_UNIT[unit]}]").astype("datetime64[us]")


def window_id(ts, unit: str, mult: int = 1) -> np.ndarray:
    """Integer granule index: floor(units-since-epoch / mult).

    Months/years roll on real calendar boundaries; weeks start Monday.
    """
    t = _as_us(ts)
    if unit == "weeks":
        days = t.astype("datetime64[D]").view("int64")
        wid = (days + 3) // 7
    elif unit in _NP_UNIT:
        wid = t.astype(f"datetime64[{_NP_UNIT[unit]}]").view("int64")
    else:
        raise ValueError(f"unknown unit {unit!r}")
    if mult != 1:
        wid = np.floor_divide(wid, mult)
    return wid.astype(np.int64)


def window_start(wid, unit: str, mult: int = 1) -> np.ndarray:
    """Inverse of :func:`window_id`: the window's start timestamp."""
    wid = np.asarray(wid, dtype=np.int64) * mult
    if unit == "weeks":
        days = wid * 7 - 3
        return days.astype("timedelta64[D]") + np.datetime64(0, "D")
    return (wid.astype(f"timedelta64[{_NP_UNIT[unit]}]") + np.datetime64(0, _NP_UNIT[unit])).astype("datetime64[us]")


def increment(ts, n: int, unit: str) -> np.ndarray:
    """Calendar-aware increment (month/year roll via calendar units)."""
    t = _as_us(ts)
    if unit in ("months", "years"):
        u = _NP_UNIT[unit]
        base = t.astype(f"datetime64[{u}]")
        frac = t - base.astype("datetime64[us]")
        return (base + np.timedelta64(n, u)).astype("datetime64[us]") + frac
    if unit == "weeks":
        return t + np.timedelta64(7 * n, "D")
    return t + np.timedelta64(n, _NP_UNIT[unit])


# ---------------------------------------------------------------------------
# suffix builders — map/partition naming helpers
# (`datetime_math.py:925-1008` semantics: the LARGEST granularity unit
# decides how many datetime fields the suffix carries)
# ---------------------------------------------------------------------------

_SUFFIX_PARTS = ["%Y", "%m", "%d", "%H", "%M", "%S"]
_SUFFIX_DEPTH = {
    "year": 1, "month": 2, "week": 3, "day": 3,
    "hour": 4, "minute": 5, "second": 6,
}


def suffix_from_datetime(start_time, granularity: str) -> str:
    """Granularity-truncated datetime suffix for generated names.

    >>> from datetime import datetime
    >>> t = datetime(2001, 1, 1, 10, 4, 12)
    >>> suffix_from_datetime(t, "1 month")
    '2001_01'
    >>> suffix_from_datetime(t, "1 year 1 month")
    '2001'
    >>> suffix_from_datetime(t, "6 seconds")
    '2001_01_01_10_04_12'
    """
    unit = granularity.split()[1].rstrip("s")
    depth = _SUFFIX_DEPTH[unit]
    return start_time.strftime("_".join(_SUFFIX_PARTS[:depth]))


def time_suffix(start_time, end_time=None) -> str:
    """Full ISO suffix (``:``/``-`` folded to ``_``), optionally with an
    end time appended.

    >>> from datetime import datetime
    >>> time_suffix(datetime(2001, 1, 1, 10, 4, 12))
    '2001_01_01T10_04_12'
    >>> time_suffix(datetime(2001, 1, 1), datetime(2001, 2, 1))
    '2001_01_01T00_00_00_2001_02_01T00_00_00'
    """
    def iso(t):
        return t.isoformat().replace(":", "_").replace("-", "_")

    if end_time is not None:
        return f"{iso(start_time)}_{iso(end_time)}"
    return iso(start_time)


def numeric_suffix(base: str, count: int, zeros: str = "%05") -> str:
    """``base_00042``-style numeric suffix; ``zeros`` follows the
    reference's ``%0N`` option grammar with its fallback rules.

    >>> numeric_suffix("tier", 42)
    'tier_00042'
    >>> numeric_suffix("tier", 42, "%3")
    'tier_042'
    >>> numeric_suffix("tier", 42, "bogus")
    'tier_00042'
    """
    width = "05"
    parts = zeros.split("%")
    if len(parts) == 2 and parts[1].isdigit():
        width = parts[1] if parts[1][0] == "0" else "0" + parts[1]
    return ("{b}_{i:" + width + "d}").format(b=base, i=count)
