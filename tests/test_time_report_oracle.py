"""The events_time_report DuckDB oracle's granularity derivation must
track `infer_granularity_absolute` on calendar shapes the driver data
never exercises (hour / day / month / year gaps, mixed units, DST-less
calendar arithmetic), not just the second-level synthetic stream."""

from __future__ import annotations

from datetime import datetime as dt

import duckdb
import pytest

from grass_ray.functions.topology import infer_granularity_absolute


def _oracle_granularity(times) -> str | None:
    import __ray_entry__ as E

    sql = E.oracle_sql()["events_time_report"]
    con = duckdb.connect()
    con.execute("CREATE TABLE events (ts TIMESTAMP)")
    con.executemany("INSERT INTO events VALUES (?)", [(t,) for t in times])
    cols = [d[0] for d in con.execute(sql).description]
    row = con.execute(sql).fetchone()
    return dict(zip(cols, row))["granularity"]


CASES = [
    # seconds
    [dt(2000, 1, 1, 0, 0, 10), dt(2000, 1, 1, 0, 0, 40), dt(2000, 1, 1, 0, 1, 30)],
    # minutes
    [dt(2000, 1, 1, 0, 10), dt(2000, 1, 1, 0, 30), dt(2000, 1, 1, 1, 40)],
    # hours (crossing midnight)
    [dt(2000, 1, 1, 6), dt(2000, 1, 1, 18), dt(2000, 1, 2, 6)],
    # days
    [dt(2000, 1, 2), dt(2000, 1, 5), dt(2000, 1, 11)],
    # months (all day-1)
    [dt(2000, 1, 1), dt(2000, 3, 1), dt(2000, 9, 1)],
    # years (all jan-1)
    [dt(2000, 1, 1), dt(2002, 1, 1), dt(2006, 1, 1)],
    # mixed minute+hour converts hours into minutes
    [dt(2000, 1, 1, 0, 30), dt(2000, 1, 1, 2, 30), dt(2000, 1, 1, 2, 45)],
    # mixed second + day-span gap
    [dt(2000, 1, 1, 0, 0, 30), dt(2000, 1, 3, 0, 0, 30), dt(2000, 1, 3, 0, 1, 0)],
    # month + year mix -> months
    [dt(2000, 2, 1), dt(2000, 8, 1), dt(2002, 8, 1)],
    # microsecond-only gaps record nothing
    [dt(2000, 1, 1, 0, 0, 0, 100), dt(2000, 1, 1, 0, 0, 0, 900)],
    # single instant
    [dt(2000, 1, 1, 12, 0, 0)],
    # irregular seconds -> gcd 1
    [dt(2000, 1, 1, 0, 0, 1), dt(2000, 1, 1, 0, 0, 8), dt(2000, 1, 1, 0, 0, 20)],
]


@pytest.mark.parametrize("times", CASES, ids=range(len(CASES)))
def test_oracle_granularity_matches_engine(times):
    eng = infer_granularity_absolute(times) if len(times) > 1 else None
    assert _oracle_granularity(times) == eng
