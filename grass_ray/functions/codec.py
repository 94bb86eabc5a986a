"""Gorilla-style XOR float compression + delta-of-delta window encoding.

The engine analog of the reference's raster row compression
(``lib/gis/compress.h:4-12`` — RLE/ZLIB/LZ4/BZIP2/ZSTD per row): rolled
up (window, value) streams are bit-packed per key before hitting the
tier Parquet, per the north rule ("Gorilla XOR + delta-of-delta
compression of rolled-up points").

Format notes (self-describing for our decoder; lossless for arbitrary
float64 bit patterns including the canonical NaN used as NULL):

* **values** (XOR scheme, Facebook Gorilla §4.1.2 control bits without
  the previous-block-reuse path so the encoder stays fully vectorized):
  first value = 64 raw bits; then per value
  ``0``                        if XOR with predecessor is 0,
  ``1 | lz:5 | (sig-1):6 | sig bits``  otherwise (lz capped at 31).
* **windows** (delta-of-delta, Gorilla §4.1.1 buckets): first window =
  64 raw bits, first delta = 64 raw bits, then per dod
  ``0`` (dod=0), ``10|7b`` (−63..64), ``110|9b`` (−255..256),
  ``1110|12b`` (−2047..2048), ``1111|64b``.

Encoding is one vectorized NumPy pass (the variable-length bitstream is
assembled word-wise: every field ORs into at most two uint64 words,
grouped by two boundary-scan ``bitwise_or.reduceat`` passes — the field
order already sorts the word indices, so no sort is needed); decoding
is a tight sequential parse over the unpacked bit array.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_floats",
    "decode_floats",
    "encode_windows",
    "decode_windows",
]


#: big-endian bit-position shifts for fast field reads in the decoders
_SHIFTS = np.arange(63, -1, -1, dtype=np.uint64)


def _assemble_bits(lengths: np.ndarray, payloads: np.ndarray) -> bytes:
    """Concatenate variable-length big-endian bit fields -> packed bytes.

    lengths: bit lengths (1..64); payloads: uint64 values held in the
    low `length` bits.

    Word-wise algorithm: each field lands in at most two 64-bit words of
    the output stream; the word-0 and spill contributions are each
    already in non-decreasing word order (fields are laid out in stream
    order), so two boundary-scan ``bitwise_or.reduceat`` passes merge
    them with no sort — O(fields) memory traffic instead of O(bits)
    (the per-bit expansion was the pipeline's bandwidth hog).
    """
    lengths = lengths.astype(np.int64)
    payloads = payloads.astype(np.uint64)
    total = int(lengths.sum())
    if total == 0:
        return b""
    ends = np.cumsum(lengths)
    offs = ends - lengths  # start bit of each field
    nwords = (total + 63) // 64
    w0 = offs >> 6
    bitpos = (offs & 63).astype(np.int64)
    # left shift to align the field's MSB at stream bit `bitpos` of word0
    sh0 = 64 - bitpos - lengths
    pos_sh = sh0 >= 0
    c0 = np.where(
        pos_sh,
        payloads << np.where(pos_sh, sh0, 0).astype(np.uint64),
        payloads >> np.where(pos_sh, 0, -sh0).astype(np.uint64),
    )
    words = np.zeros(nwords, dtype=np.uint64)
    # w0 is non-decreasing (fields are in stream order), so the word-0
    # contributions group with one boundary scan — no sort needed
    boundary = np.ones(len(w0), dtype=bool)
    boundary[1:] = w0[1:] != w0[:-1]
    starts = np.flatnonzero(boundary)
    words[w0[starts]] = np.bitwise_or.reduceat(c0, starts)
    spill = ~pos_sh
    if spill.any():
        # spill word indices (w0+1) are non-decreasing too; OR into the
        # already-filled words
        sh1 = (128 - bitpos - lengths)[spill].astype(np.uint64)
        c1 = payloads[spill] << sh1
        w1 = w0[spill] + 1
        b1 = np.ones(len(w1), dtype=bool)
        b1[1:] = w1[1:] != w1[:-1]
        s1 = np.flatnonzero(b1)
        words[w1[s1]] |= np.bitwise_or.reduceat(c1, s1)
    return words.byteswap().tobytes()[: (total + 7) // 8]


def _bitlen64(a: np.ndarray) -> np.ndarray:
    """Bit length (position of highest set bit, 1..64) of uint64 > 0.

    One float64 conversion + frexp, with a single correction step for
    values the conversion rounds up across a power-of-two boundary.
    """
    bl = np.frexp(a.astype(np.float64))[1].astype(np.int64)
    np.minimum(bl, 64, out=bl)
    over = (a >> np.minimum(bl - 1, 63).astype(np.uint64)) == 0
    bl[over] -= 1
    return bl


def encode_floats(values: np.ndarray) -> bytes:
    """float64[n] (NaN = NULL) -> Gorilla-XOR packed bytes (with n header)."""
    values = np.ascontiguousarray(values, dtype=np.float64)
    n = len(values)
    head = np.uint32(n).tobytes()
    if n == 0:
        return head
    u = values.view(np.uint64)
    xor = np.empty(n, dtype=np.uint64)
    xor[0] = u[0]
    xor[1:] = u[1:] ^ u[:-1]
    zero = np.zeros(n, dtype=bool)
    zero[1:] = xor[1:] == 0
    # leading zeros of xor (64 for xor==0, irrelevant there)
    nz = ~zero
    lz = np.zeros(n, dtype=np.uint64)
    tz = np.zeros(n, dtype=np.uint64)
    sig = np.ones(n, dtype=np.uint64)
    if nz.any():
        x = xor[nz]
        bitlen = _bitlen64(x)
        lz_nz = np.minimum(64 - bitlen, 31)  # 5-bit field caps at 31
        # trailing zeros: bit_length of the lowest set bit, minus 1
        low = x & (np.uint64(0) - x)
        tz_nz = _bitlen64(low) - 1
        sig_nz = 64 - lz_nz - tz_nz  # meaningful bits, >= 1
        lz[nz] = lz_nz.astype(np.uint64)
        tz[nz] = tz_nz.astype(np.uint64)
        sig[nz] = sig_nz.astype(np.uint64)
    # per-value fields in stream order: first value raw 64 bits; then for
    # each value [ctrl:1] and, when ctrl=1, [lz:5|sig-1:6] + [sig bits]
    ctrl_len = np.ones(n, dtype=np.int64)
    ctrl_val = nz.astype(np.uint64)
    hdr_len = np.where(nz, 11, 0)
    hdr_val = np.where(nz, (lz << np.uint64(6)) | (sig - np.uint64(1)), 0)
    pay_len = np.where(nz, sig.astype(np.int64), 0)
    mask_sig = np.where(
        sig >= 64, np.uint64(0xFFFFFFFFFFFFFFFF), (np.uint64(1) << sig) - np.uint64(1)
    )
    pay_val = np.where(nz, (xor >> tz) & mask_sig, 0)
    all_len = np.empty(1 + 3 * (n - 1), dtype=np.int64)
    all_val = np.empty(1 + 3 * (n - 1), dtype=np.uint64)
    all_len[0] = 64
    all_val[0] = u[0]
    if n > 1:
        all_len[1::3] = ctrl_len[1:]
        all_val[1::3] = ctrl_val[1:]
        all_len[2::3] = hdr_len[1:]
        all_val[2::3] = hdr_val[1:]
        all_len[3::3] = pay_len[1:]
        all_val[3::3] = pay_val[1:]
    keep = all_len > 0
    return head + _assemble_bits(all_len[keep], all_val[keep])


def _extract_fields(words: np.ndarray, offs: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized big-endian bit-field extraction (inverse of
    :func:`_assemble_bits`): field i = `lens[i]` bits at stream bit
    offset `offs[i]`."""
    w0 = (offs >> 6).astype(np.int64)
    bitpos = (offs & 63).astype(np.uint64)
    lens_u = lens.astype(np.uint64)
    # take two consecutive words (second clamped at the end)
    hi = words[w0]
    w1 = np.minimum(w0 + 1, len(words) - 1)
    lo = words[w1]
    left = np.where(
        bitpos > 0, hi << bitpos, hi
    )  # shift out leading bits of word0
    # bits spilling into word1
    right = np.where(
        bitpos > 0, lo >> (np.uint64(64) - bitpos), np.uint64(0)
    )
    merged = left | right
    return merged >> (np.uint64(64) - lens_u)


def decode_floats(data: bytes) -> np.ndarray:
    """Inverse of :func:`encode_floats` — bit-exact round trip.

    Two-pass: a light sequential scan reads the control/header bits to
    locate every payload, then one vectorized gather extracts all
    payloads and a ``bitwise_xor.accumulate`` rebuilds the values.
    """
    n = int(np.frombuffer(data[:4], dtype=np.uint32)[0])
    if n == 0:
        return np.empty(0, dtype=np.float64)
    body = data[4:]
    pad = (-len(body)) % 8
    if pad:
        body = body + b"\x00" * pad
    words = np.frombuffer(body, dtype=">u8").astype(np.uint64)
    bits = np.unpackbits(np.frombuffer(data[4:], dtype=np.uint8))
    offs = np.empty(n, dtype=np.int64)
    lens = np.empty(n, dtype=np.int64)
    tzs = np.empty(n, dtype=np.uint64)
    # precompute the 11-bit header value at EVERY bit offset (11 shifted
    # adds, no 2-D materialization) so the walk below is pure int lookups
    if len(bits) >= 11:
        m = len(bits) - 10
        hdr_at = np.zeros(m, dtype=np.uint16)
        b16 = bits.astype(np.uint16)
        for k in range(11):
            hdr_at += b16[k : m + k] << np.uint16(10 - k)
        hdr_list = memoryview(hdr_at.tobytes()).cast("H")
    else:
        hdr_list = memoryview(b"").cast("H")
    bit_list = memoryview(bits.tobytes())
    # pass 1: walk ctrl/hdr bits (payload positions depend on prior sigs)
    pos = 64
    offs[0], lens[0], tzs[0] = 0, 64, 0
    for i in range(1, n):
        if bit_list[pos] == 0:
            pos += 1
            offs[i], lens[i], tzs[i] = 0, 0, 0
            continue
        hdr = hdr_list[pos + 1]
        sig = (hdr & 0x3F) + 1
        tzs[i] = 64 - (hdr >> 6) - sig
        offs[i] = pos + 12
        lens[i] = sig
        pos += 12 + sig
    # pass 2: vectorized extraction + xor prefix
    has = lens > 0
    xors = np.zeros(n, dtype=np.uint64)
    if has.any():
        xors[has] = _extract_fields(words, offs[has], lens[has]) << tzs[has]
    return np.bitwise_xor.accumulate(xors).view(np.float64)


_DOD_BUCKETS = (
    (64, 2, 0b10, 7),       # |dod| small: -63..64 stored in 7 bits
    (256, 3, 0b110, 9),
    (2048, 4, 0b1110, 12),
)


def encode_windows(windows: np.ndarray) -> bytes:
    """int64[n] ascending window ids -> delta-of-delta packed bytes."""
    w = np.ascontiguousarray(windows, dtype=np.int64)
    n = len(w)
    head = np.uint32(n).tobytes()
    if n == 0:
        return head
    fields_len = [64]
    fields_val = [np.uint64(w[0]) & np.uint64(0xFFFFFFFFFFFFFFFF)]
    if n >= 2:
        d = np.diff(w)
        fields_len.append(64)
        fields_val.append(np.uint64(d[0] % (1 << 64)))
        dod = np.diff(d)
        m = len(dod)
        ctrl_len = np.empty(m, dtype=np.int64)
        ctrl_val = np.empty(m, dtype=np.uint64)
        pay_len = np.zeros(m, dtype=np.int64)
        pay_val = np.zeros(m, dtype=np.uint64)
        done = dod == 0
        ctrl_len[done] = 1
        ctrl_val[done] = 0
        rem = ~done
        for hi, cl, cv, pl in _DOD_BUCKETS:
            sel = rem & (dod >= -(hi - 1)) & (dod <= hi)
            ctrl_len[sel] = cl
            ctrl_val[sel] = cv
            pay_len[sel] = pl
            pay_val[sel] = (dod[sel] + (hi - 1)).astype(np.uint64)
            rem &= ~sel
        ctrl_len[rem] = 4
        ctrl_val[rem] = 0b1111
        pay_len[rem] = 64
        pay_val[rem] = dod[rem].astype(np.uint64)
        all_len = np.empty(2 * m, dtype=np.int64)
        all_val = np.empty(2 * m, dtype=np.uint64)
        all_len[0::2] = ctrl_len
        all_val[0::2] = ctrl_val
        all_len[1::2] = pay_len
        all_val[1::2] = pay_val
        keep = all_len > 0
        fl = np.concatenate([np.array(fields_len), all_len[keep]])
        fv = np.concatenate(
            [np.array(fields_val, dtype=np.uint64), all_val[keep]]
        )
        return head + _assemble_bits(fl, fv)
    return head + _assemble_bits(
        np.array(fields_len), np.array(fields_val, dtype=np.uint64)
    )


def decode_windows(data: bytes) -> np.ndarray:
    """Inverse of :func:`encode_windows`.

    Sequential control-bit walk (memoryview lookups) to locate the
    delta-of-delta payloads, then vectorized extraction and a double
    cumulative sum to rebuild the window ids.
    """
    n = int(np.frombuffer(data[:4], dtype=np.uint32)[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    body = data[4:]
    pad = (-len(body)) % 8
    if pad:
        body = body + b"\x00" * pad
    words = np.frombuffer(body, dtype=">u8").astype(np.uint64)
    bits = np.unpackbits(np.frombuffer(data[4:], dtype=np.uint8))
    bl = memoryview(bits.tobytes())
    offs = np.zeros(n, dtype=np.int64)
    lens = np.zeros(n, dtype=np.int64)
    bias = np.zeros(n, dtype=np.int64)
    offs[0], lens[0] = 0, 64
    pos = 64
    if n >= 2:
        offs[1], lens[1] = 64, 64
        pos = 128
    for i in range(2, n):
        if bl[pos] == 0:
            pos += 1
            continue
        if bl[pos + 1] == 0:
            offs[i], lens[i], bias[i] = pos + 2, 7, -63
            pos += 9
        elif bl[pos + 2] == 0:
            offs[i], lens[i], bias[i] = pos + 3, 9, -255
            pos += 12
        elif bl[pos + 3] == 0:
            offs[i], lens[i], bias[i] = pos + 4, 12, -2047
            pos += 16
        else:
            offs[i], lens[i] = pos + 4, 64
            pos += 68
    has = lens > 0
    raw = np.zeros(n, dtype=np.uint64)
    raw[has] = _extract_fields(words, offs[has], lens[has])
    out = np.zeros(n, dtype=np.int64)
    out[0] = raw[0].astype(np.int64) if n else 0
    if n == 1:
        return out[:1]
    # element 1 is the raw first delta; elements >= 2 are dod values
    dod = raw.view(np.int64).copy()
    small = has & (lens < 64)
    dod[small] = raw[small].astype(np.int64) + bias[small]
    dod[~has] = 0
    deltas = dod.copy()
    deltas[0] = 0
    np.cumsum(deltas[1:], out=deltas[1:])  # delta_i for i>=1
    out[1:] = out[0] + np.cumsum(deltas[1:])
    return out



# ---------------------------------------------------------------------------
# batched (multi-row) encode — one vectorized pass over a whole column
# ---------------------------------------------------------------------------


def _split_rows(buf: bytes, lengths: np.ndarray, row_bits: np.ndarray) -> list[bytes]:
    """Cut the shared padded bitstream into per-row blobs with n headers."""
    byte_off = np.concatenate([[0], np.cumsum(row_bits // 8)])
    heads = np.ascontiguousarray(lengths, dtype="<u4").tobytes()
    return [
        heads[4 * i : 4 * i + 4] + buf[int(byte_off[i]) : int(byte_off[i + 1])]
        for i in range(len(lengths))
    ]


def _split_rows_arrow(buf: bytes, lengths: np.ndarray, row_bits: np.ndarray):
    """Like :func:`_split_rows` but emits a zero-python-loop Arrow
    BinaryArray: one contiguous output buffer built with two vectorized
    byte scatters (headers, payloads) + offsets."""
    import pyarrow as pa

    nrows = len(lengths)
    row_bytes = (row_bits // 8).astype(np.int64)
    blob_lens = row_bytes + 4
    out_off = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(blob_lens, out=out_off[1:])
    total = int(out_off[-1])
    out = np.empty(total, dtype=np.uint8)
    # headers: 4 little-endian bytes at each row start
    heads = np.ascontiguousarray(lengths, dtype="<u4").view(np.uint8).reshape(-1, 4)
    head_pos = out_off[:-1]
    for k in range(4):
        out[head_pos + k] = heads[:, k]
    # payloads: source bytes are contiguous; destination index is the
    # source index shifted by 4*(row_index+1)
    src_arr = np.frombuffer(buf, dtype=np.uint8)[: int(row_bytes.sum())]
    if len(src_arr):
        row_of = np.repeat(np.arange(nrows, dtype=np.int64), row_bytes)
        dst = np.arange(len(src_arr), dtype=np.int64) + 4 * (row_of + 1)
        out[dst] = src_arr
    return pa.Array.from_buffers(
        pa.binary(),
        nrows,
        [None, pa.py_buffer(out_off.astype(np.int32).tobytes()), pa.py_buffer(out.tobytes())],
    )


def _encode_floats_core(flat: np.ndarray, lengths: np.ndarray):
    """Shared body of the batched float encoders: returns the packed
    shared bitstream + per-row (byte-aligned) bit lengths."""
    flat = np.ascontiguousarray(flat, dtype=np.float64)
    lengths = np.asarray(lengths, dtype=np.int64)
    n = len(flat)
    nrows = len(lengths)
    if n == 0:
        return b"", np.zeros(nrows, dtype=np.int64)
    starts = np.zeros(nrows, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    is_first = np.zeros(n, dtype=bool)
    is_first[starts[lengths > 0]] = True
    u = flat.view(np.uint64)
    xor = np.empty(n, dtype=np.uint64)
    xor[0] = 0
    xor[1:] = u[1:] ^ u[:-1]
    xor[is_first] = 0  # row-first values are stored raw
    zero = (xor == 0) & ~is_first
    nz = ~zero & ~is_first

    lz = np.zeros(n, dtype=np.uint64)
    tz = np.zeros(n, dtype=np.uint64)
    sig = np.ones(n, dtype=np.uint64)
    if nz.any():
        x = xor[nz]
        bitlen = _bitlen64(x)
        lz_nz = np.minimum(64 - bitlen, 31)
        low = x & (np.uint64(0) - x)
        tz_nz = _bitlen64(low) - 1
        sig_nz = 64 - lz_nz - tz_nz
        lz[nz] = lz_nz.astype(np.uint64)
        tz[nz] = tz_nz.astype(np.uint64)
        sig[nz] = sig_nz.astype(np.uint64)

    mask_sig = np.where(
        sig >= 64, np.uint64(0xFFFFFFFFFFFFFFFF), (np.uint64(1) << sig) - np.uint64(1)
    )
    # 3 field slots per element + 1 pad slot per row, in stream order
    slot_of = 3 * np.arange(n, dtype=np.int64) + np.repeat(
        np.arange(nrows, dtype=np.int64), lengths
    )
    total_slots = 3 * n + nrows
    all_len = np.zeros(total_slots, dtype=np.int64)
    all_val = np.zeros(total_slots, dtype=np.uint64)
    # slot 0: ctrl (1 bit) or raw-64 for row firsts
    all_len[slot_of] = np.where(is_first, 64, 1)
    all_val[slot_of] = np.where(is_first, u, nz.astype(np.uint64))
    # slot 1: header (11 bits when nz)
    all_len[slot_of + 1] = np.where(nz, 11, 0)
    all_val[slot_of + 1] = np.where(
        nz, (lz << np.uint64(6)) | (sig - np.uint64(1)), 0
    )
    # slot 2: payload (sig bits when nz)
    all_len[slot_of + 2] = np.where(nz, sig.astype(np.int64), 0)
    all_val[slot_of + 2] = np.where(nz, (xor >> tz) & mask_sig, 0)
    # pad slots sit after each row's last element's fields
    pad_slot = 3 * (starts + lengths) + np.arange(nrows, dtype=np.int64)
    # bits per row before padding: per-element totals formed directly
    # (ctrl/raw + header + payload), no gathers over the slot arrays
    elem_bits = np.where(
        is_first, 64, np.where(nz, 12 + sig.astype(np.int64), 1)
    )
    row_bits = np.zeros(nrows, dtype=np.int64)
    has = lengths > 0
    if has.any():
        row_bits[has] = np.add.reduceat(elem_bits, starts[has])
    pad = (-row_bits) % 8
    all_len[pad_slot] = pad
    row_bits_padded = row_bits + pad
    keep = all_len > 0
    buf = _assemble_bits(all_len[keep], all_val[keep])
    return buf, row_bits_padded


def _encode_windows_core(flat: np.ndarray, lengths: np.ndarray):
    """Shared body of the batched window encoders."""
    flat = np.ascontiguousarray(flat, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    n = len(flat)
    nrows = len(lengths)
    if n == 0:
        return b"", np.zeros(nrows, dtype=np.int64)
    starts = np.zeros(nrows, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    pos_in_row = np.arange(n, dtype=np.int64) - np.repeat(starts, lengths)
    d = np.zeros(n, dtype=np.int64)
    d[1:] = flat[1:] - flat[:-1]
    dod = np.zeros(n, dtype=np.int64)
    dod[1:] = d[1:] - d[:-1]
    ctrl_len = np.zeros(n, dtype=np.int64)
    ctrl_val = np.zeros(n, dtype=np.uint64)
    pay_len = np.zeros(n, dtype=np.int64)
    pay_val = np.zeros(n, dtype=np.uint64)
    first = pos_in_row == 0
    second = pos_in_row == 1
    rest = ~first & ~second
    # first: raw 64-bit window; second: raw 64-bit delta
    ctrl_len[first] = 64
    ctrl_val[first] = flat[first].astype(np.uint64)
    ctrl_len[second] = 64
    ctrl_val[second] = d[second].astype(np.uint64)
    done = rest & (dod == 0)
    ctrl_len[done] = 1
    ctrl_val[done] = 0
    rem = rest & ~done
    for hi, cl, cv, pl in _DOD_BUCKETS:
        sel = rem & (dod >= -(hi - 1)) & (dod <= hi)
        ctrl_len[sel] = cl
        ctrl_val[sel] = cv
        pay_len[sel] = pl
        pay_val[sel] = (dod[sel] + (hi - 1)).astype(np.uint64)
        rem &= ~sel
    ctrl_len[rem] = 4
    ctrl_val[rem] = 0b1111
    pay_len[rem] = 64
    pay_val[rem] = dod[rem].astype(np.uint64)
    slot_of = 2 * np.arange(n, dtype=np.int64) + np.repeat(
        np.arange(nrows, dtype=np.int64), lengths
    )
    total_slots = 2 * n + nrows
    all_len = np.zeros(total_slots, dtype=np.int64)
    all_val = np.zeros(total_slots, dtype=np.uint64)
    all_len[slot_of] = ctrl_len
    all_val[slot_of] = ctrl_val
    all_len[slot_of + 1] = pay_len
    all_val[slot_of + 1] = pay_val
    pad_slot = 2 * (starts + lengths) + np.arange(nrows, dtype=np.int64)
    elem_bits = ctrl_len + pay_len
    row_bits = np.zeros(nrows, dtype=np.int64)
    has = lengths > 0
    if has.any():
        row_bits[has] = np.add.reduceat(elem_bits, starts[has])
    pad = (-row_bits) % 8
    all_len[pad_slot] = pad
    keep = all_len > 0
    buf = _assemble_bits(all_len[keep], all_val[keep])
    return buf, row_bits + pad


def encode_floats_batched(flat, lengths) -> list[bytes]:
    """Batched float encode -> list of per-row blobs (see core)."""
    buf, row_bits = _encode_floats_core(flat, lengths)
    return _split_rows(buf, np.asarray(lengths, dtype=np.int64), row_bits)


def encode_floats_columns(flat, lengths):
    """Batched float encode -> Arrow BinaryArray (no per-row Python)."""
    buf, row_bits = _encode_floats_core(flat, lengths)
    return _split_rows_arrow(buf, np.asarray(lengths, dtype=np.int64), row_bits)


def encode_windows_batched(flat, lengths) -> list[bytes]:
    """Batched window encode -> list of per-row blobs (see core)."""
    buf, row_bits = _encode_windows_core(flat, lengths)
    return _split_rows(buf, np.asarray(lengths, dtype=np.int64), row_bits)


def encode_windows_column(flat, lengths):
    """Batched window encode -> Arrow BinaryArray."""
    buf, row_bits = _encode_windows_core(flat, lengths)
    return _split_rows_arrow(buf, np.asarray(lengths, dtype=np.int64), row_bits)


# ---------------------------------------------------------------------------
# batched (multi-row) decode — one unpack + one header table for a whole
# column of blobs.  The per-blob decoders above pay ~50µs of numpy setup
# (unpackbits, the 11-bit header precompute, allocations) per call; for
# tier rows of a few dozen windows that setup dwarfs the walk, so the
# batched forms amortize it across the column (measured ~5-8x on the
# standard 2500-row / 24-window partition decode).
# ---------------------------------------------------------------------------


def _concat_blob_bodies(blobs):
    """(counts, start_bit_per_blob, words, bit_memoryview, total_bits)."""
    nb = len(blobs)
    counts = np.empty(nb, dtype=np.int64)
    blens = np.empty(nb, dtype=np.int64)
    for i, b in enumerate(blobs):
        counts[i] = int.from_bytes(b[:4], "little")
        blens[i] = len(b) - 4
    big = b"".join(b[4:] for b in blobs)
    pad = (-len(big)) % 8
    body = big + b"\x00" * pad if pad else big
    words = np.frombuffer(body, dtype=">u8").astype(np.uint64)
    bits = np.unpackbits(np.frombuffer(big, dtype=np.uint8))
    start_bits = np.zeros(nb, dtype=np.int64)
    np.cumsum(blens[:-1] * 8, out=start_bits[1:])
    return counts, start_bits, words, bits


def _seg_cumsum(x: np.ndarray, starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-segment inclusive cumsum of ``x`` (segments given by
    starts/counts over a flat layout), fully vectorized."""
    g = np.cumsum(x)
    prev = np.zeros(len(starts), dtype=x.dtype)
    nz = starts > 0
    prev[nz] = g[starts[nz] - 1]
    return g - np.repeat(prev, counts)


def decode_floats_batched(blobs) -> tuple[np.ndarray, np.ndarray]:
    """Decode a column of :func:`encode_floats` blobs in one pass.

    Returns ``(flat_values, counts)`` — the concatenated float64 values
    and the per-blob value counts.  Bit-exact with per-blob
    :func:`decode_floats` (parity-tested)."""
    nb = len(blobs)
    if nb == 0:
        return np.empty(0, dtype=np.float64), np.empty(0, dtype=np.int64)
    counts, start_bits, words, bits = _concat_blob_bodies(blobs)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.float64), counts
    # 11-bit header value at every bit offset (shared across blobs)
    if len(bits) >= 11:
        m = len(bits) - 10
        hdr_at = np.zeros(m, dtype=np.uint16)
        b16 = bits.astype(np.uint16)
        for k in range(11):
            hdr_at += b16[k : m + k] << np.uint16(10 - k)
        hdr_list = memoryview(hdr_at.tobytes()).cast("H")
    else:
        hdr_list = memoryview(b"").cast("H")
    bit_list = memoryview(bits.tobytes())
    offs = np.empty(total, dtype=np.int64)
    lens = np.empty(total, dtype=np.int64)
    tzs = np.empty(total, dtype=np.uint64)
    k = 0
    for j in range(nb):
        n = int(counts[j])
        if n == 0:
            continue
        pos = int(start_bits[j])
        offs[k], lens[k], tzs[k] = pos, 64, 0
        pos += 64
        k += 1
        for _ in range(n - 1):
            if bit_list[pos] == 0:
                pos += 1
                offs[k], lens[k], tzs[k] = 0, 0, 0
            else:
                hdr = hdr_list[pos + 1]
                sig = (hdr & 0x3F) + 1
                tzs[k] = 64 - (hdr >> 6) - sig
                offs[k] = pos + 12
                lens[k] = sig
                pos += 12 + sig
            k += 1
    has = lens > 0
    xors = np.zeros(total, dtype=np.uint64)
    if has.any():
        xors[has] = _extract_fields(words, offs[has], lens[has]) << tzs[has]
    # global xor prefix + per-blob boundary fixup: within blob j,
    # v_i = g_i ^ g_{start_j - 1} (the blob's first value is raw, so
    # the fixup cancels everything before the blob)
    g = np.bitwise_xor.accumulate(xors)
    starts = np.zeros(nb, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    nz = counts > 0
    prev = np.zeros(nb, dtype=np.uint64)
    pnz = nz & (starts > 0)
    prev[pnz] = g[starts[pnz] - 1]
    vals = g ^ np.repeat(prev[nz], counts[nz])
    return vals.view(np.float64), counts


def decode_windows_batched(blobs) -> tuple[np.ndarray, np.ndarray]:
    """Decode a column of :func:`encode_windows` blobs in one pass.

    Returns ``(flat_windows, counts)``; bit-exact with per-blob
    :func:`decode_windows` (parity-tested)."""
    nb = len(blobs)
    if nb == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    counts, start_bits, words, bits = _concat_blob_bodies(blobs)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), counts
    bl = memoryview(bits.tobytes())
    offs = np.zeros(total, dtype=np.int64)
    lens = np.zeros(total, dtype=np.int64)
    bias = np.zeros(total, dtype=np.int64)
    k = 0
    for j in range(nb):
        n = int(counts[j])
        if n == 0:
            continue
        pos = int(start_bits[j])
        offs[k], lens[k] = pos, 64
        pos += 64
        if n >= 2:
            offs[k + 1], lens[k + 1] = pos, 64
            pos += 64
        for i in range(2, n):
            kk = k + i
            if bl[pos] == 0:
                pos += 1
                continue
            if bl[pos + 1] == 0:
                offs[kk], lens[kk], bias[kk] = pos + 2, 7, -63
                pos += 9
            elif bl[pos + 2] == 0:
                offs[kk], lens[kk], bias[kk] = pos + 3, 9, -255
                pos += 12
            elif bl[pos + 3] == 0:
                offs[kk], lens[kk], bias[kk] = pos + 4, 12, -2047
                pos += 16
            else:
                offs[kk], lens[kk] = pos + 4, 64
                pos += 68
        k += n
    has = lens > 0
    raw = np.zeros(total, dtype=np.uint64)
    if has.any():
        raw[has] = _extract_fields(words, offs[has], lens[has])
    starts = np.zeros(nb, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    pos_in = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    first = pos_in == 0
    second = pos_in == 1
    # dod for elements >= 2 (bucket bias applied); 0 elsewhere
    dod = raw.view(np.int64).copy()
    small = has & (lens < 64)
    dod[small] = raw[small].astype(np.int64) + bias[small]
    dod[~has] = 0
    dod[first | second] = 0
    # delta_i (i>=1) = raw_first_delta + per-segment cumsum of dod
    d1 = np.zeros(nb, dtype=np.int64)
    nz1 = counts >= 2
    d1[nz1] = raw[starts[nz1] + 1].view(np.int64)
    deltas = _seg_cumsum(dod, starts, counts) + np.repeat(d1, counts)
    deltas[first] = 0
    # w_i = w0 + per-segment cumsum of delta
    w0 = np.zeros(nb, dtype=np.int64)
    nz0 = counts >= 1
    w0[nz0] = raw[starts[nz0]].view(np.int64)
    out = _seg_cumsum(deltas, starts, counts) + np.repeat(w0, counts)
    return out, counts
