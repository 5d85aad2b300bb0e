"""Delta-gap + varint (LEB128) block codec, vectorized in numpy.

Full-text analog of T-Torch's posting compression
(``base/invertedIndex/InvertedIndex.java:26-27,116-117,141-142``):
sorted docIDs get delta + varint (analog of JavaFastPFOR's
``IntegratedIntCompressor`` = delta + IntegratedBinaryPacking + VByte);
unsorted payloads (tf / positions) get plain varint (analog of
``IntCompressor`` = FastPFOR + VByte).

Roundtrip property ``decode(encode(x)) == x`` mirrors the reference's only
meaningful test (``InvertedIndexTest.java:90-147``) — asserted here with
Hypothesis in tests/test_codec.py.

Everything operates on whole numpy arrays — no per-element Python in the
encode/decode hot path beyond a loop over *byte positions* (<= 10).
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # ceil(64 / 7)
_THRESHOLDS = [np.uint64(1) << np.uint64(7 * i) for i in range(1, _MAX_VARINT_BYTES)]


def encode_u64(values: np.ndarray) -> bytes:
    """Varint-encode a uint64 array (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    nbytes = np.ones(n, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += v >= t
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=starts[1:])
    out = np.zeros(int(starts[-1] + nbytes[-1]), dtype=np.uint8)
    for j in range(int(nbytes.max())):
        sel = nbytes > j
        chunk = (v[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[sel] - 1 > j).astype(np.uint8) << 7
        out[starts[sel] + j] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def decode_u64(buf: bytes) -> np.ndarray:
    """Decode varint bytes back to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lengths)
    parts = (b & 0x7F).astype(np.uint64) << (7 * pos).astype(np.uint64)
    return np.add.reduceat(parts, starts)


def encode_sorted(values: np.ndarray) -> bytes:
    """Delta-gap + varint for a non-decreasing int array (docIDs)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    gaps = np.empty_like(v)
    gaps[0] = v[0]
    np.subtract(v[1:], v[:-1], out=gaps[1:])
    return encode_u64(gaps)


def decode_sorted(buf: bytes) -> np.ndarray:
    """Inverse of encode_sorted; returns int64 array."""
    gaps = decode_u64(buf)
    return np.cumsum(gaps, dtype=np.uint64).astype(np.int64)


def encode_u32s(values: np.ndarray) -> bytes:
    """Plain varint for small unsorted payloads (tfs / positions)."""
    return encode_u64(np.ascontiguousarray(values, dtype=np.uint64))


def decode_u32s(buf: bytes) -> np.ndarray:
    return decode_u64(buf).astype(np.int64)
