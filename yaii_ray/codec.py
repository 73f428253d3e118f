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


def vbyte_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode a u64 array as concatenated LEB128 varints.

    Returns ``(payload, nbytes)`` where ``nbytes[i]`` is the encoded
    width of ``values[i]`` — callers slice the payload into per-group
    binary cells without re-encoding (the build pipeline encodes an
    entire batch of posting groups in one call).
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
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
    return out.tobytes(), nbytes


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a u64 array as concatenated LEB128 varints."""
    return vbyte_encode_with_lengths(values)[0]


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


# --- segmented (multi-group) helpers -------------------------------
#
# The build pipeline encodes/decodes THOUSANDS of posting groups per
# batch. Doing that one group at a time would be a Python loop in the
# hot path, so these helpers operate on a single concatenated value
# array plus group boundaries, in O(batch) numpy ops.


def segmented_gaps(values: np.ndarray, group_starts: np.ndarray) -> np.ndarray:
    """Per-group delta encoding of concatenated sorted u64 groups.

    ``values`` is the concatenation of strictly-increasing groups;
    ``group_starts`` are the start indices. Output: first element of
    each group stays absolute, the rest become ``gap-1``.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return v
    gaps = np.empty_like(v)
    gaps[0] = v[0]
    gaps[1:] = v[1:] - v[:-1] - np.uint64(1)
    gaps[group_starts] = v[group_starts]
    return gaps


def segmented_undelta(gaps: np.ndarray, group_starts: np.ndarray) -> np.ndarray:
    """Inverse of :func:`segmented_gaps` (segmented cumulative sum)."""
    g = gaps.astype(np.uint64, copy=True)
    if g.size == 0:
        return g
    is_start = np.zeros(g.shape, dtype=bool)
    is_start[group_starts] = True
    g[~is_start] += np.uint64(1)
    c = np.cumsum(g, dtype=np.uint64)
    # subtract, within each group, the cumsum accumulated before it
    base = c[group_starts] - g[group_starts]
    lengths = np.diff(np.concatenate([group_starts, [g.size]]))
    return c - np.repeat(base, lengths)


def binary_cells_from_lengths(
    payload: bytes, nbytes: np.ndarray, group_starts: np.ndarray
) -> "pa.LargeBinaryArray":
    """Zero-copy split of one varint payload into per-group binary cells.

    ``nbytes`` is the per-value byte width from
    :func:`vbyte_encode_with_lengths`; ``group_starts`` index into the
    value array. Returns a ``large_binary`` Arrow array with one cell
    per group, built directly from offset/data buffers (no per-group
    Python slicing).
    """
    import pyarrow as pa

    byte_ends = np.cumsum(nbytes, dtype=np.int64)
    total = int(byte_ends[-1]) if nbytes.size else 0
    # extended so a group_start equal to len(values) (an empty tail
    # group) maps to the end of the payload
    byte_starts_ext = np.concatenate([byte_ends - nbytes, [total]])
    ngroups = group_starts.size
    offsets = np.empty(ngroups + 1, dtype=np.int64)
    offsets[:-1] = byte_starts_ext[group_starts]
    offsets[-1] = total
    return pa.Array.from_buffers(
        pa.large_binary(),
        ngroups,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(payload)],
    )


def concat_binary_column(col) -> bytes:
    """Concatenate all cells of a (large_)binary Arrow column into one
    contiguous byte string without per-cell Python slicing."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        chunks = col.chunks
    else:
        chunks = [col]
    parts = []
    for ch in chunks:
        if len(ch) == 0:
            continue
        off_width = 8 if pa.types.is_large_binary(ch.type) else 4
        dtype = np.int64 if off_width == 8 else np.int32
        raw = np.frombuffer(ch.buffers()[1], dtype=dtype)
        offs = raw[ch.offset : ch.offset + len(ch) + 1]
        data = ch.buffers()[2]
        parts.append(bytes(memoryview(data)[offs[0] : offs[-1]]) if data is not None else b"")
    return b"".join(parts)


def encode_tfs(tfs: np.ndarray) -> bytes:
    t = np.ascontiguousarray(tfs, dtype=np.uint64)
    return vbyte_encode(t - np.uint64(1))


def decode_tfs(buf: bytes, count: int | None = None) -> np.ndarray:
    return vbyte_decode(buf, count) + np.uint64(1)
