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
