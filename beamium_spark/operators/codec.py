"""Time-series block codec: delta-of-delta timestamps + Gorilla-style
XOR values, fully numpy-vectorized in both directions.

Background (public): Facebook's Gorilla TSDB (Pelkonen et al., VLDB 2015)
compresses timestamps as delta-of-delta with variable-width buckets and
values as XOR against the previous value, storing only the meaningful
bits. The classic bitstream is inherently sequential (each value's width
is only known after reading it), which would force per-row Python here —
forbidden by BASELINE.json input_hint.

This codec keeps both insights but packs **per miniblock of 128 values**
(the same trick as Parquet's DELTA_BINARY_PACKED): one width byte + one
shift byte per block, then fixed-width bit-packing of

- zigzag(delta-of-delta(ts))          for timestamps,
- (value XOR previous) >> trailing0   for float64 values,

where width = bits needed for the block max and shift = common trailing
zeros (Gorilla's leading/trailing-zero windows, hoisted to block scope).
Fixed width per block makes encode *and* decode pure numpy: bit matrices
via shifts + ``np.packbits``/``np.unpackbits``, XOR undone with
``np.bitwise_xor.accumulate``, deltas with ``np.cumsum``.

Typical ratios on the synthetic fixture: near-constant series ~1 bit/point
for timestamps on regular grids, ~1 byte/point for slowly-varying values —
the regimes Gorilla targets.

Layout (little-endian):

    ts block:  u8 magic 0xB1 | u32 n | i64 first | i64 first_delta |
               blocks of 128: u8 width, u8 pad, packed bits (dod[2:])
    val block: u8 magic 0xB2 | u32 n | u64 first |
               blocks of 128: u8 width, u8 shift, packed bits (xor[1:])
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC_TS = 0xB1
_MAGIC_VAL = 0xB2
MINIBLOCK = 128


def _zigzag(x: np.ndarray) -> np.ndarray:
    return ((x << 1) ^ (x >> 63)).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(np.int64)


def _pack_u64(vals: np.ndarray, width: int) -> bytes:
    """Pack each value into ``width`` bits, MSB-first, vectorized."""
    if width == 0:
        return b""
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((vals[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def _unpack_u64(buf: memoryview, n: int, width: int) -> np.ndarray:
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    nbits = n * width
    raw = np.frombuffer(buf[: (nbits + 7) // 8], dtype=np.uint8)
    bits = np.unpackbits(raw)[:nbits].reshape(n, width).astype(np.uint64)
    weights = np.uint64(1) << np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (bits * weights).sum(axis=1, dtype=np.uint64)


def _encode_stream(u: np.ndarray, use_shift: bool) -> bytes:
    """uint64 stream → miniblock-packed bytes."""
    out = []
    for lo in range(0, len(u), MINIBLOCK):
        blk = u[lo : lo + MINIBLOCK]
        ored = np.bitwise_or.reduce(blk) if len(blk) else np.uint64(0)
        shift = 0
        if use_shift and ored != 0:
            o = int(ored)
            shift = (o & -o).bit_length() - 1  # trailing zeros
        shifted = blk >> np.uint64(shift)
        m = np.bitwise_or.reduce(shifted) if len(shifted) else np.uint64(0)
        width = int(m).bit_length()
        out.append(struct.pack("<BB", width, shift))
        out.append(_pack_u64(shifted, width))
    return b"".join(out)


def _decode_stream(buf: memoryview, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    pos = 0
    done = 0
    while done < n:
        width, shift = struct.unpack_from("<BB", buf, pos)
        pos += 2
        cnt = min(MINIBLOCK, n - done)
        vals = _unpack_u64(buf[pos:], cnt, width)
        pos += (cnt * width + 7) // 8
        out[done : done + cnt] = vals << np.uint64(shift)
        done += cnt
    return out


def encode_timestamps(ts_us: np.ndarray) -> bytes:
    """int64 µs timestamps (sorted) → delta-of-delta block."""
    ts = np.asarray(ts_us, dtype=np.int64)
    n = len(ts)
    head = struct.pack("<BI", _MAGIC_TS, n)
    if n == 0:
        return head
    if n == 1:
        return head + struct.pack("<q", int(ts[0]))
    d = np.diff(ts)
    head += struct.pack("<qq", int(ts[0]), int(d[0]))
    if n == 2:
        return head
    dod = np.diff(d)
    return head + _encode_stream(_zigzag(dod), use_shift=False)


def decode_timestamps(buf: bytes) -> np.ndarray:
    mv = memoryview(buf)
    magic, n = struct.unpack_from("<BI", mv, 0)
    assert magic == _MAGIC_TS, "not a ts block"
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.array([struct.unpack_from("<q", mv, 5)[0]], dtype=np.int64)
    first, first_delta = struct.unpack_from("<qq", mv, 5)
    if n == 2:
        return np.array([first, first + first_delta], dtype=np.int64)
    dod = _unzigzag(_decode_stream(mv[21:], n - 2))
    deltas = np.empty(n - 1, dtype=np.int64)
    deltas[0] = first_delta
    deltas[1:] = dod
    np.cumsum(deltas, out=deltas)  # dod → per-step deltas
    np.cumsum(deltas, out=deltas)  # per-step deltas → offsets from first
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    out[1:] = first + deltas
    return out


def encode_values(vals: np.ndarray) -> bytes:
    """float64 values → XOR block."""
    v = np.ascontiguousarray(np.asarray(vals, dtype=np.float64)).view(np.uint64)
    n = len(v)
    head = struct.pack("<BI", _MAGIC_VAL, n)
    if n == 0:
        return head
    head += struct.pack("<Q", int(v[0]))
    if n == 1:
        return head
    x = v[1:] ^ v[:-1]
    return head + _encode_stream(x, use_shift=True)


def decode_values(buf: bytes) -> np.ndarray:
    mv = memoryview(buf)
    magic, n = struct.unpack_from("<BI", mv, 0)
    assert magic == _MAGIC_VAL, "not a val block"
    if n == 0:
        return np.empty(0, dtype=np.float64)
    first = struct.unpack_from("<Q", mv, 5)[0]
    if n == 1:
        return np.array([first], dtype=np.uint64).view(np.float64)
    x = _decode_stream(mv[13:], n - 1)
    words = np.empty(n, dtype=np.uint64)
    words[0] = first
    words[1:] = x
    return np.bitwise_xor.accumulate(words).view(np.float64)
