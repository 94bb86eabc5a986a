"""Driver-style correctness harness: run queries() vs oracle_sql() at a
given sf and compare row count, schema (column names), and an
order-insensitive value hash.  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    # normalize dtypes: ints stay ints, floats to repr, bools to int
    rows = []
    for _, row in df.iterrows():
        parts = []
        for v in row:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                parts.append("NULL")
            elif isinstance(v, (bool, np.bool_)):
                parts.append(str(int(v)))
            elif isinstance(v, (int, np.integer)):
                parts.append(str(int(v)))
            elif isinstance(v, (float, np.floating)):
                parts.append(repr(float(v)))
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_df(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(mine)} rows, cols={sorted(mine.columns)})")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            failures += 1
            continue
        ok_rows = len(mine) == len(want)
        ok_cols = sorted(mine.columns) == sorted(want.columns)
        h1 = value_hash(mine) if ok_rows and ok_cols else ""
        h2 = value_hash(want) if ok_rows and ok_cols else ""
        if ok_rows and ok_cols and h1 == h2:
            print(f"ok   {name}: {len(mine)} rows, hash {h1}")
        else:
            failures += 1
            print(
                f"FAIL {name}: rows {len(mine)} vs {len(want)}, cols "
                f"{sorted(mine.columns)} vs {sorted(want.columns)}, "
                f"hash {h1} vs {h2}"
            )
            if ok_rows and ok_cols:
                m = mine[sorted(mine.columns)].sort_values(sorted(mine.columns)).reset_index(drop=True)
                w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
                diff = ~(m.eq(w) | (m.isna() & w.isna()))
                bad = diff.any(axis=1)
                print("  first diffs:")
                print(pd.concat([m[bad].head(3), w[bad].head(3)], keys=["mine", "want"]))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
