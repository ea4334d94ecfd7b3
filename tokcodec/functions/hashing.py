"""Deterministic string hashing shared by dedup / tokenize stages.

Python's builtin hash() is salted per process — useless for distributed
dedup — so everything uses FNV-1a.  `hash_str` is the scalar reference;
`fnv1a_batch` is the vectorized form used on hot paths: one numpy Horner
pass over the Arrow string buffer (words sorted by length so each byte
position touches only still-active strings — total work O(total bytes),
no per-string Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_OFFSET = 14695981039346656037
_FNV_PRIME = 1099511628211


def hash_str(s: str) -> int:
    """Deterministic 64-bit FNV-1a (scalar reference implementation)."""
    h = _FNV_OFFSET
    for c in s.encode():
        h = ((h ^ c) * _FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a_spans(
    data: np.ndarray, starts: np.ndarray, lengths: np.ndarray
) -> np.ndarray:
    """FNV-1a of n byte spans (``data[starts[i] : starts[i]+lengths[i]]``)
    → uint64[n], value-identical to ``hash_str`` per span.

    Vectorized: spans sorted by length, then one in-place numpy pass per
    byte position over the still-active suffix (take → xor → mul, all
    with preallocated buffers, int32 gather indices) — O(total bytes)
    work and O(n) memory, no per-span Python.
    """
    n = len(starts)
    h = np.full(n, np.uint64(_FNV_OFFSET), dtype=np.uint64)
    if n == 0 or len(data) == 0:
        return h
    prime = np.uint64(_FNV_PRIME)
    order = np.argsort(lengths, kind="stable")
    ls = lengths[order]
    max_len = int(ls[-1])
    if max_len == 0:
        return h
    idx_dt = np.int32 if len(data) < (1 << 31) - 1 else np.int64
    idx = starts[order].astype(idx_dt)
    row = np.empty(n, dtype=np.uint8)
    with np.errstate(over="ignore"):
        for i in range(max_len):
            j0 = int(np.searchsorted(ls, i, side="right"))
            np.take(data, idx[j0:], out=row[j0:])
            np.bitwise_xor(h[j0:], row[j0:], out=h[j0:])
            np.multiply(h[j0:], prime, out=h[j0:])
            idx[j0:] += 1
    out = np.empty(n, dtype=np.uint64)
    out[order] = h
    return out


def fnv1a_batch(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """FNV-1a of every string/binary in `arr` → uint64[n], value-identical
    to ``hash_str`` per element (nulls hash like the empty string).
    Zero-copy: spans come straight from the Arrow offsets/data buffers."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    b = arr.cast(pa.large_binary())
    if b.null_count:
        import pyarrow.compute as pc

        b = pc.fill_null(b, b"")
    bufs = b.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int64)[b.offset : b.offset + len(b) + 1]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    return fnv1a_spans(data, off[:-1], np.diff(off))
