"""Bit-packing primitives: fixed-width little-endian bit packing.

Pure numpy, vectorized, chunked so intermediates stay bounded.  These are
the lowest-level kernels every integer codec (FoR, delta, RLE, dict codes)
bottoms out in — the analog of parquet-mr's RLE/bit-packed hybrid that the
reference relies on implicitly (reference types only annotate, see
/root/reference/parquet-tensorflow/src/main/java/me/lyh/parquet/tensorflow/Schema.java:155-161).
"""

from __future__ import annotations

import numpy as np

# Chunk of values processed at once; multiple of 8 so each chunk's packed bits
# are byte-aligned and chunks concatenate losslessly.
_CHUNK = 1 << 20


def bit_width(max_val: int) -> int:
    """Bits needed to represent max_val (non-negative). 0 for max_val == 0."""
    if max_val < 0:
        raise ValueError(f"bit_width requires non-negative input, got {max_val}")
    return int(max_val).bit_length()


def _narrow_uint(bits: int) -> np.dtype:
    """Smallest little-endian uint dtype holding `bits` bits."""
    if bits <= 8:
        return np.dtype("<u1")
    if bits <= 16:
        return np.dtype("<u2")
    if bits <= 32:
        return np.dtype("<u4")
    return np.dtype("<u8")


def pack(vals: np.ndarray, bits: int) -> np.ndarray | bytes:
    """Pack non-negative integers into `bits` bits each, LSB-first.

    Implementation rides numpy's C-speed unpackbits: narrow the values to
    the smallest uint dtype, explode to a (n, dtype_bits) little-endian
    bit matrix, keep the low `bits` columns, re-pack.
    """
    n = len(vals)
    if bits == 0 or n == 0:
        return b""
    if bits > 64:
        raise ValueError(f"bits must be <= 64, got {bits}")
    dt = _narrow_uint(bits)
    if bits == 8 * dt.itemsize:  # byte-aligned width: plain narrow cast
        # uint8 view, no tobytes copy: consumers use the buffer protocol
        return np.ascontiguousarray(vals.astype(dt, copy=False)).view(np.uint8).reshape(-1)
    v = vals.astype(dt, copy=False)
    nb = dt.itemsize
    out = []
    for s in range(0, n, _CHUNK):
        c = np.ascontiguousarray(v[s : s + _CHUNK])
        bitmat = np.unpackbits(
            c.view(np.uint8).reshape(len(c), nb), axis=1, bitorder="little"
        )[:, :bits]
        out.append(np.packbits(bitmat.ravel(), bitorder="little"))
    return out[0] if len(out) == 1 else np.concatenate(out)


def unpack(buf: bytes, bits: int, n: int, dtype=np.uint64) -> np.ndarray:
    """Inverse of pack(): recover n values of `bits` bits each.

    Bits → zero-padded (n, 8*nb) bit matrix → packbits per row → view as
    the narrow uint dtype; all C-speed.  ``dtype=None`` returns the
    natural narrow uint dtype with NO widening copy (the fast path for
    decoders that finish in a narrow target dtype anyway)."""
    if dtype is None:
        dtype = _narrow_uint(bits if bits else 1)
    if bits == 0 or n == 0:
        return np.zeros(n, dtype=dtype)
    dt = _narrow_uint(bits)
    if bits == 8 * dt.itemsize:  # byte-aligned width: zero-copy view
        return np.frombuffer(buf, dtype=dt)[:n].astype(dtype, copy=False)
    raw = np.frombuffer(buf, dtype=np.uint8)
    nb = dt.itemsize
    out = np.empty(n, dtype=dt)
    bytes_per_chunk = _CHUNK * bits // 8
    for i, s in enumerate(range(0, n, _CHUNK)):
        cn = min(_CHUNK, n - s)
        chunk = raw[i * bytes_per_chunk : i * bytes_per_chunk + (cn * bits + 7) // 8]
        bitsarr = np.unpackbits(chunk, count=cn * bits, bitorder="little").reshape(cn, bits)
        if bits % (8 * nb):
            padded = np.zeros((cn, 8 * nb), dtype=np.uint8)
            padded[:, :bits] = bitsarr
        else:
            padded = bitsarr
        out[s : s + cn] = (
            np.packbits(padded, axis=1, bitorder="little").view(dt).ravel()
        )
    return out.astype(dtype, copy=False)


def zigzag(vals: np.ndarray) -> np.ndarray:
    """Map signed int64 → uint64 so small-magnitude values stay small."""
    v = vals.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def unzigzag(vals: np.ndarray) -> np.ndarray:
    v = vals.astype(np.uint64, copy=False)
    return ((v >> np.uint64(1)).view(np.int64)) ^ -((v & np.uint64(1)).view(np.int64))
