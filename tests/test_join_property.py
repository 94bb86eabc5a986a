"""Property-based parity for the two-regime join machinery.

Ground truth is a plain pandas merge; both the broadcast and the
exchange regimes must produce the same multiset of rows (the Acero
per-bucket merge replaced pandas this round — this guards the swap).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from grass_ray.stages.join import anti_join, attach_column, bucket_join, semi_join

_ikeys = st.lists(st.integers(0, 6), min_size=0, max_size=12)
_skeys = st.lists(st.sampled_from(["k1", "k2", "k3", "k9"]), min_size=0, max_size=12)


def _table(keys, payload_name):
    n = len(keys)
    rng = np.random.default_rng(n + 7)
    if keys and isinstance(keys[0], str):
        karr = pa.array(keys, type=pa.string())
    else:
        karr = pa.array([int(k) for k in keys], type=pa.int64())
    pay = rng.integers(0, 100, size=n)
    return pa.table({"k": karr, payload_name: pa.array(pay, type=pa.int64())})


def _sorted_records(df: pd.DataFrame, cols=("k", "x", "y")):
    cols = list(cols)
    if df.empty and not all(c in df.columns for c in cols):
        return []  # an empty Dataset's to_pandas loses the schema
    return sorted(
        map(tuple, df[cols].fillna(-999).astype(str).values.tolist())
    )


@settings(max_examples=20, deadline=None)
@given(lk=_ikeys, rk=_ikeys, how=st.sampled_from(["inner", "left"]))
def test_bucket_join_int_keys(ray_session, lk, rk, how):
    if not lk:
        return
    l_t, r_t = _table(lk, "x"), _table(rk, "y")
    want = l_t.to_pandas().merge(r_t.to_pandas(), on="k", how=how)
    for thresh in (500_000, 0):  # broadcast vs exchange regime
        got = bucket_join(
            ray.data.from_arrow(l_t),
            ray.data.from_arrow(r_t),
            key_cols=("k",),
            how=how,
            broadcast_threshold=thresh,
            buckets=4,
        ).to_pandas()
        assert _sorted_records(got) == _sorted_records(want), (lk, rk, how, thresh)


@settings(max_examples=15, deadline=None)
@given(lk=_skeys, rk=_skeys)
def test_bucket_join_string_keys(ray_session, lk, rk):
    if not lk:
        return
    l_t, r_t = _table(lk, "x"), _table(rk, "y")
    want = l_t.to_pandas().merge(r_t.to_pandas(), on="k", how="inner")
    for thresh in (500_000, 0):
        got = bucket_join(
            ray.data.from_arrow(l_t),
            ray.data.from_arrow(r_t),
            key_cols=("k",),
            broadcast_threshold=thresh,
            buckets=4,
        ).to_pandas()
        assert _sorted_records(got) == _sorted_records(want), (lk, rk, thresh)


def _col(df, name):
    return df[name].tolist() if name in df.columns else []


@settings(max_examples=20, deadline=None)
@given(
    lk=st.lists(st.integers(0, 8), min_size=1, max_size=14),
    rk=st.lists(st.integers(0, 8), min_size=0, max_size=10),
)
def test_semi_anti_join_matches_isin(ray_session, lk, rk):
    l_t, r_t = _table(lk, "x"), _table(rk, "y")
    keep = set(rk)
    want_semi = [k for k in lk if k in keep]
    want_anti = [k for k in lk if k not in keep]
    for thresh in (2_000_000, 0):
        semi = semi_join(
            ray.data.from_arrow(l_t),
            ray.data.from_arrow(r_t),
            key_cols=("k",),
            broadcast_threshold=thresh,
            buckets=4,
        ).to_pandas()
        assert sorted(_col(semi, "k")) == sorted(want_semi), (lk, rk, thresh)
    anti = anti_join(
        ray.data.from_arrow(l_t), ray.data.from_arrow(r_t), key_cols=("k",)
    ).to_pandas()
    assert sorted(_col(anti, "k")) == sorted(want_anti)


@settings(max_examples=15, deadline=None)
@given(
    lk=st.lists(st.integers(0, 6), min_size=1, max_size=12),
    rk=st.lists(st.integers(0, 6), min_size=1, max_size=8),
)
def test_attach_column_matches_lookup(ray_session, lk, rk):
    rk = sorted(set(rk))  # lookup side: one row per key
    l_t = _table(lk, "x")
    lookup = pa.table(
        {
            "k": pa.array(rk, type=pa.int64()),
            "v": pa.array([[k, k + 1] for k in rk], type=pa.list_(pa.int64())),
        }
    )
    for thresh in (500_000, 0):
        got = attach_column(
            ray.data.from_arrow(l_t),
            ray.data.from_arrow(lookup),
            key_col="k",
            lookup_key="k",
            value_col="v",
            out_col="v",
            broadcast_threshold=thresh,
            buckets=4,
        ).to_pandas()
        want = [(k, [k, k + 1]) for k in lk if k in set(rk)]
        got_pairs = sorted(
            (int(r["k"]), list(r["v"])) for _i, r in got.iterrows()
        )
        assert got_pairs == sorted(want), (lk, rk, thresh)


@settings(max_examples=10, deadline=None)
@given(
    lk=st.lists(st.integers(0, 9), min_size=1, max_size=14),
    rk=st.lists(st.integers(0, 9), min_size=1, max_size=14),
    how=st.sampled_from(["right", "outer"]),
)
def test_bucket_join_outer_schema_stable(ray_session, lk, rk, how):
    """Outer/right joins produce join nulls in int payload columns in
    SOME buckets only — every bucket must still emit the same wire
    schema (Arrow int64 with validity, never a per-bucket float64
    upcast), and the merged values must match pandas."""
    l_t, r_t = _table(lk, "x"), _table(rk, "y")
    ds = bucket_join(
        ray.data.from_arrow(l_t),
        ray.data.from_arrow(r_t),
        key_cols=("k",),
        how=how,
        buckets=4,
    )
    tbl = pa.concat_tables(
        ds.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    assert tbl.schema.field("x").type == pa.int64()
    assert tbl.schema.field("y").type == pa.int64()
    want = l_t.to_pandas().merge(r_t.to_pandas(), on="k", how=how)
    assert _sorted_records(tbl.to_pandas()) == _sorted_records(want)
