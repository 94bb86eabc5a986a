"""F6 — Gorilla / delta-of-delta codec bit-exact round trips."""

from __future__ import annotations

import numpy as np
import pytest

from grass_ray.functions.codec import (
    decode_floats,
    decode_windows,
    encode_floats,
    encode_windows,
)


def roundtrip_f(vals):
    arr = np.asarray(vals, dtype=np.float64)
    out = decode_floats(encode_floats(arr))
    assert len(out) == len(arr)
    # bit-exact comparison (NaN patterns included)
    assert np.array_equal(out.view(np.uint64), arr.view(np.uint64))
    return out


def roundtrip_w(vals):
    arr = np.asarray(vals, dtype=np.int64)
    out = decode_windows(encode_windows(arr))
    assert np.array_equal(out, arr)
    return out


def test_floats_edge_cases():
    roundtrip_f([])
    roundtrip_f([0.0])
    roundtrip_f([1.5, 1.5, 1.5, 1.5])  # constant run: XOR=0 path
    roundtrip_f([1.0, -1.0, 2.0, -2.0])  # sign flips
    roundtrip_f([np.nan, 1.0, np.nan, np.nan, 2.0])  # NULL markers
    roundtrip_f([np.inf, -np.inf, 0.0, -0.0])
    roundtrip_f([3.1415926535, 3.1415926536, 3.14159])  # tiny xors


def test_floats_random():
    rng = np.random.default_rng(0)
    for n in (1, 2, 7, 100, 5000):
        vals = rng.normal(size=n) * 10.0 ** rng.integers(-5, 6, size=n)
        vals[rng.random(n) < 0.1] = np.nan
        roundtrip_f(vals)
    # integer-valued doubles (our token sums) compress well & round-trip
    vals = rng.integers(0, 32003, size=2000).astype(np.float64)
    enc = encode_floats(vals)
    assert len(enc) < 8 * len(vals)  # actually compresses
    roundtrip_f(vals)


def test_windows_edge_cases():
    roundtrip_w([])
    roundtrip_w([5])
    roundtrip_w([0, 1])
    roundtrip_w([0, 1, 2, 3, 4, 5])  # dod=0 path
    roundtrip_w([0, 10, 11, 12, 40, 41, 100])  # irregular gaps
    roundtrip_w([-5, -3, 0, 1000000, 1000001])  # negative + large jump
    roundtrip_w([7, 7, 7])  # repeated (delta 0)


def test_windows_random():
    rng = np.random.default_rng(1)
    for n in (1, 2, 50, 3000):
        deltas = rng.integers(1, 10000, size=n)
        w = np.cumsum(deltas) - 50
        roundtrip_w(w)
    # regular windows compress to ~1 bit/value after the first two
    w = np.arange(10000, dtype=np.int64)
    enc = encode_windows(w)
    assert len(enc) < 4 + 16 + 2 + len(w) // 8 + 16


def test_compression_ratio_regular_series():
    # a typical rolled-up tier stream: dense windows, smooth values
    w = np.arange(1440, dtype=np.int64)
    v = np.linspace(0, 100, 1440)
    ew, ev = encode_windows(w), encode_floats(v)
    raw = 1440 * 16
    assert len(ew) + len(ev) < raw * 0.9
    assert np.array_equal(decode_windows(ew), w)
    assert np.array_equal(
        decode_floats(ev).view(np.uint64), v.view(np.uint64)
    )


def test_batched_encoders_match_single():
    from grass_ray.functions.codec import (
        encode_floats_batched,
        encode_windows_batched,
    )

    rng = np.random.default_rng(5)
    rows_f = [
        rng.integers(0, 1000, size=n).astype(np.float64)
        for n in (1, 3, 24, 100, 2, 7)
    ]
    rows_f[2][5] = np.nan
    flat = np.concatenate(rows_f)
    lens = np.array([len(r) for r in rows_f])
    blobs = encode_floats_batched(flat, lens)
    assert len(blobs) == len(rows_f)
    for blob, row in zip(blobs, rows_f):
        out = decode_floats(blob)
        assert np.array_equal(out.view(np.uint64), row.view(np.uint64))

    rows_w = [np.sort(rng.choice(5000, size=n, replace=False)).astype(np.int64) for n in (1, 2, 24, 77)]
    flatw = np.concatenate(rows_w)
    lensw = np.array([len(r) for r in rows_w])
    for blob, row in zip(encode_windows_batched(flatw, lensw), rows_w):
        assert np.array_equal(decode_windows(blob), row)


def test_batched_empty_rows():
    from grass_ray.functions.codec import encode_floats_batched

    blobs = encode_floats_batched(
        np.array([1.0, 2.0]), np.array([0, 2, 0])
    )
    assert np.array_equal(decode_floats(blobs[0]), np.empty(0))
    assert np.array_equal(decode_floats(blobs[1]), np.array([1.0, 2.0]))
    assert np.array_equal(decode_floats(blobs[2]), np.empty(0))


# ---- property-based round trips (hypothesis) ------------------------------

try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.floats(allow_nan=True, allow_infinity=True, width=64),
                st.integers(-(2**40), 2**40).map(float),
            ),
            min_size=0,
            max_size=200,
        )
    )
    def test_floats_roundtrip_property(vals):
        arr = np.asarray(vals, dtype=np.float64)
        out = decode_floats(encode_floats(arr))
        assert np.array_equal(out.view(np.uint64), arr.view(np.uint64))

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.integers(-(2**50), 2**50), min_size=0, max_size=200
        )
    )
    def test_windows_roundtrip_property(vals):
        arr = np.asarray(vals, dtype=np.int64)
        out = decode_windows(encode_windows(arr))
        assert np.array_equal(out, arr)

except ImportError:  # pragma: no cover
    pass


def test_windows_batched_empty_rows():
    from grass_ray.functions.codec import encode_windows_batched

    blobs = encode_windows_batched(
        np.array([3, 9], dtype=np.int64), np.array([0, 2, 0])
    )
    assert np.array_equal(decode_windows(blobs[0]), np.empty(0, dtype=np.int64))
    assert np.array_equal(decode_windows(blobs[1]), np.array([3, 9]))
    assert np.array_equal(decode_windows(blobs[2]), np.empty(0, dtype=np.int64))


def test_assemble_bits_matches_per_bit_reference():
    """The word-wise sort-free assembler equals a trivial per-bit
    reference on random variable-length fields (hypothesis)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from grass_ray.functions.codec import _assemble_bits

    def per_bit(lengths, payloads):
        bits = []
        for ln, v in zip(lengths, payloads):
            for k in range(int(ln) - 1, -1, -1):
                bits.append((int(v) >> k) & 1)
        out = bytearray((len(bits) + 7) // 8)
        for i, b in enumerate(bits):
            if b:
                out[i // 8] |= 0x80 >> (i % 8)
        return bytes(out)

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=64),
                st.integers(min_value=0, max_value=(1 << 64) - 1),
            ),
            min_size=1,
            max_size=80,
        )
    )
    def check(fields):
        lengths = np.array([ln for ln, _ in fields], dtype=np.int64)
        payloads = np.array(
            [v & ((1 << ln) - 1 if ln < 64 else (1 << 64) - 1) for ln, v in fields],
            dtype=np.uint64,
        )
        assert _assemble_bits(lengths, payloads) == per_bit(lengths, payloads)

    check()


def test_batched_decoders_match_single():
    """decode_*_batched ≡ per-blob decode_* — including empty rows,
    single-value rows, NaN patterns and every dod bucket."""
    from grass_ray.functions.codec import (
        decode_floats_batched,
        decode_windows_batched,
        encode_floats_batched,
        encode_windows_batched,
    )

    rng = np.random.default_rng(11)
    rows_f = [
        rng.integers(0, 1000, size=n).astype(np.float64)
        for n in (1, 0, 24, 3, 100, 0, 2)
    ]
    rows_f[2][5] = np.nan
    rows_f[4][::7] = np.inf
    flat = np.concatenate([r for r in rows_f if len(r)])
    lens = np.array([len(r) for r in rows_f])
    blobs = encode_floats_batched(flat, lens)
    got_flat, got_lens = decode_floats_batched(blobs)
    ref = np.concatenate([decode_floats(b) for b in blobs])
    assert np.array_equal(got_lens, lens)
    assert np.array_equal(got_flat.view(np.uint64), ref.view(np.uint64))

    # windows: exercise all four dod buckets + the raw-64 escape
    rows_w = [
        np.array([0], dtype=np.int64),
        np.cumsum(rng.integers(1, 60, size=24)).astype(np.int64),
        np.array([5, 10, 15, 80, 81, 400, 3000, 3001], dtype=np.int64),
        np.array([0, 1, 2**40, 2**40 + 7], dtype=np.int64),
        np.empty(0, dtype=np.int64),
        np.array([7, 8], dtype=np.int64),
    ]
    flatw = np.concatenate([r for r in rows_w if len(r)])
    lensw = np.array([len(r) for r in rows_w])
    wblobs = encode_windows_batched(flatw, lensw)
    got_w, got_wlens = decode_windows_batched(wblobs)
    ref_w = np.concatenate([decode_windows(b) for b in wblobs])
    assert np.array_equal(got_wlens, lensw)
    assert np.array_equal(got_w, ref_w)
    assert np.array_equal(got_w, flatw)


try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.one_of(
                    st.floats(allow_nan=True, allow_infinity=True, width=64),
                    st.integers(-(2**40), 2**40).map(float),
                ),
                min_size=0,
                max_size=40,
            ),
            min_size=1,
            max_size=12,
        )
    )
    def test_batched_float_decode_property(rows):
        from grass_ray.functions.codec import (
            decode_floats_batched,
            encode_floats_batched,
        )

        arrs = [np.asarray(r, dtype=np.float64) for r in rows]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        flat = (
            np.concatenate([a for a in arrs if len(a)])
            if lens.sum()
            else np.empty(0)
        )
        blobs = encode_floats_batched(flat, lens)
        got, glens = decode_floats_batched(blobs)
        assert np.array_equal(glens, lens)
        assert np.array_equal(got.view(np.uint64), flat.view(np.uint64))

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.integers(-(2**55), 2**55), min_size=0, max_size=40
            ),
            min_size=1,
            max_size=12,
        )
    )
    def test_batched_window_decode_property(rows):
        from grass_ray.functions.codec import (
            decode_windows_batched,
            encode_windows_batched,
        )

        arrs = [np.asarray(r, dtype=np.int64) for r in rows]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        flat = (
            np.concatenate([a for a in arrs if len(a)])
            if lens.sum()
            else np.empty(0, dtype=np.int64)
        )
        blobs = encode_windows_batched(flat, lens)
        got, glens = decode_windows_batched(blobs)
        assert np.array_equal(glens, lens)
        assert np.array_equal(got, flat)

except ImportError:  # pragma: no cover
    pass


def test_decode_tier_derived_and_null_blobs():
    """DecodeTier over a derive=True tier equals the derive=False
    decode bit-for-bit, and NULL value blobs decode to all-NULL."""
    import pyarrow as pa

    from grass_ray.stages.codec_stage import DecodeTier, EncodeTier

    methods = ("count", "sum", "minimum", "maximum", "average")
    rng = np.random.default_rng(3)
    rows = []
    for i in range(20):
        nw = int(rng.integers(1, 30))
        w = np.cumsum(rng.integers(1, 5, size=nw)).astype(np.int64)
        cnt = rng.integers(1, 60, size=nw).astype(np.float64)
        s = rng.integers(0, 5000, size=nw).astype(np.float64)
        mn = rng.integers(0, 100, size=nw).astype(np.float64)
        mx = mn + rng.integers(0, 100, size=nw)
        with np.errstate(invalid="ignore"):
            avg = s / cnt
        rows.append((f"k{i}", w, cnt, s, mn, mx, avg))
    nested = pa.table(
        {
            "key": pa.array([r[0] for r in rows]),
            "windows": pa.array([r[1].tolist() for r in rows], type=pa.list_(pa.int64())),
            "count": pa.array([r[2].tolist() for r in rows], type=pa.list_(pa.float64())),
            "sum": pa.array([r[3].tolist() for r in rows], type=pa.list_(pa.float64())),
            "minimum": pa.array([r[4].tolist() for r in rows], type=pa.list_(pa.float64())),
            "maximum": pa.array([r[5].tolist() for r in rows], type=pa.list_(pa.float64())),
            "average": pa.array([r[6].tolist() for r in rows], type=pa.list_(pa.float64())),
        }
    )
    enc_d = EncodeTier(methods)(nested)
    enc_f = EncodeTier(methods, derive=False)(nested)
    assert "average_enc" not in enc_d.column_names
    assert "average_enc" in enc_f.column_names
    dec_d = DecodeTier(methods)(enc_d)
    dec_f = DecodeTier(methods)(enc_f)
    assert dec_d.equals(dec_f)

    # NULL blob on a value column -> all-NULL decoded values
    idx = enc_f.column_names.index("sum_enc")
    blobs = enc_f.column("sum_enc").to_pylist()
    blobs[3] = None
    blobs[7] = None
    enc_null = enc_f.set_column(
        idx, "sum_enc", pa.array(blobs, type=pa.binary())
    )
    dec_n = DecodeTier(methods)(enc_null)
    sums = dec_n.column("sum").to_pylist()
    assert all(v is None for v in sums[3]) and all(v is None for v in sums[7])
    assert sums[2] == dec_f.column("sum").to_pylist()[2]
