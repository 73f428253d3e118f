"""Delta + VByte posting-list codec (numpy-vectorized, pure Python).

The north rule requires delta-encoded, VByte-compressed postings (the
reference serializes RoaringBitmaps instead —
``src/lib/internal/segments/immutable-segment.ts:257-283`` — bitmaps
carry no term frequencies, which BM25 needs, so the classic IR codec
is used here).

Format: little-endian base-128 varints, MSB = continuation. Doc-id
lists are strictly increasing u64; we store ``[v0, v1-v0-1, ...]``
(gap-1 for the tail, so dense runs compress to single 0x00 bytes).
Term frequencies are stored as ``tf-1`` varints (tf >= 1).

Both directions are vectorized: encode loops over at most 10 byte
positions, decode reconstructs all values with one pass over byte
groups — no per-value Python loop.
"""

from __future__ import annotations

import numpy as np


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a u64 array as concatenated LEB128 varints."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bitlength/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 7
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits // 7, 1)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    maxlen = int(nbytes.max())
    rem = v.copy()
    for k in range(maxlen):
        mask = nbytes > k
        pos = starts[mask] + k
        byte = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[pos] = byte | cont
        rem[mask] >>= np.uint64(7)
    return out.tobytes()


def vbyte_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode concatenated LEB128 varints back to a u64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    n = ends.size
    if count is not None and count != n:
        raise ValueError(f"corrupt varint stream: {n} values, expected {count}")
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    values = np.zeros(n, dtype=np.uint64)
    maxlen = int(lengths.max())
    payload = (b & 0x7F).astype(np.uint64)
    for k in range(maxlen):
        mask = lengths > k
        values[mask] |= payload[starts[mask] + k] << np.uint64(7 * k)
    return values


def delta_encode_docs(doc_ids: np.ndarray) -> bytes:
    """Strictly-increasing u64 doc ids → gap-1 varint stream."""
    d = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    if d.size == 0:
        return b""
    gaps = np.empty_like(d)
    gaps[0] = d[0]
    gaps[1:] = d[1:] - d[:-1] - np.uint64(1)
    return vbyte_encode(gaps)


def delta_decode_docs(buf: bytes, count: int | None = None) -> np.ndarray:
    gaps = vbyte_decode(buf, count)
    if gaps.size == 0:
        return gaps
    gaps[1:] += np.uint64(1)
    return np.cumsum(gaps, dtype=np.uint64)


def encode_tfs(tfs: np.ndarray) -> bytes:
    t = np.ascontiguousarray(tfs, dtype=np.uint64)
    return vbyte_encode(t - np.uint64(1))


def decode_tfs(buf: bytes, count: int | None = None) -> np.ndarray:
    return vbyte_decode(buf, count) + np.uint64(1)
