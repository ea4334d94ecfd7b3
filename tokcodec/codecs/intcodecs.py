"""Integer (and float) codecs: plain, bit-pack, frame-of-reference, delta,
RLE, dictionary — each with encode/decode and a sampled-size auto-selector.

All intermediates are int64/uint64 so int32 token ids can't overflow
(SURVEY.md §7 "hard parts": dtype discipline for bit-identical decode).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tokcodec.codecs import bitpack
from tokcodec.codecs.util import zstd_lazy

# Deterministic contiguous sample size used for codec selection.  A strided
# sample would destroy runs and bias against RLE, so we take a prefix.
SAMPLE = 8192


def _node(c: str, m: dict, p: list[bytes] | None = None, k: dict | None = None) -> dict:
    return {"c": c, "m": m, "p": p or [], "k": k or {}}


# ---------------------------------------------------------------- plain ----


def _enc_plain(arr: np.ndarray) -> dict:
    return _node("plain", {"dt": arr.dtype.str, "n": len(arr)}, [np.ascontiguousarray(arr).view(np.uint8).reshape(-1)])


def _dec_plain(enc: dict) -> np.ndarray:
    m = enc["m"]
    return np.frombuffer(enc["p"][0], dtype=np.dtype(m["dt"]))[: m["n"]]


# -------------------------------------------------------------- bitpack ----


def _enc_bitpack(arr: np.ndarray) -> dict | None:
    """Non-negative values only; None if not applicable."""
    if len(arr) == 0:
        return _node("bp", {"dt": arr.dtype.str, "n": 0, "b": 0})
    lo = int(arr.min())
    if lo < 0:
        return None
    bits = bitpack.bit_width(int(arr.max()))
    return _node(
        "bp",
        {"dt": arr.dtype.str, "n": len(arr), "b": bits},
        [bitpack.pack(arr, bits)],
    )


def _dec_bitpack(enc: dict) -> np.ndarray:
    m = enc["m"]
    if m["n"] == 0:
        return np.empty(0, dtype=np.dtype(m["dt"]))
    return bitpack.unpack(enc["p"][0], m["b"], m["n"], dtype=np.dtype(m["dt"]))


# ----------------------------------------------------- frame of reference ----


def _enc_for(arr: np.ndarray) -> dict:
    if len(arr) == 0:
        return _node("for", {"dt": arr.dtype.str, "n": 0, "ref": 0, "b": 0})
    a64 = arr.astype(np.int64, copy=False)
    ref = int(a64.min())
    deltas = (a64 - ref).view(np.uint64)  # non-negative after min-subtract
    bits = bitpack.bit_width(int(deltas.max()))
    return _node(
        "for",
        {"dt": arr.dtype.str, "n": len(arr), "ref": ref, "b": bits},
        [bitpack.pack(deltas, bits)],
    )


def _dec_for(enc: dict) -> np.ndarray:
    m = enc["m"]
    if m["n"] == 0:
        return np.empty(0, dtype=np.dtype(m["dt"]))
    target = np.dtype(m["dt"])
    # unpack at the natural narrow width, widen ONCE straight into the
    # target dtype (no uint64 intermediate — that was 3x the memory
    # traffic for int32 tokens).  ref + delta wraps mod 2^bits in the
    # target's width, which is exact because the results ARE the
    # original target-dtype values.
    deltas = bitpack.unpack(enc["p"][0], m["b"], m["n"], dtype=None)
    out = deltas.astype(target, copy=False)
    if m["ref"]:
        if out is deltas or not out.flags.writeable:
            out = out.copy()
        # array-cast the ref (silent mod-2^N wrap): target.type(negative)
        # on an unsigned target deprecation-warns on numpy 1.x and raises
        # on numpy 2.x — e.g. uint64 columns with values >= 2^63
        ref_t = np.array(m["ref"], dtype=np.int64).astype(target, copy=False)
        with np.errstate(over="ignore"):
            out += ref_t
    return out


# ---------------------------------------------------------------- delta ----
# For near-monotonic sequences (list offsets, row ids): zigzag(diff) then
# FoR+bitpack the zigzagged deltas.


def _enc_delta(arr: np.ndarray) -> dict:
    if len(arr) == 0:
        return _node("delta", {"dt": arr.dtype.str, "n": 0, "first": 0})
    a64 = arr.astype(np.int64, copy=False)
    first = int(a64[0])
    z = bitpack.zigzag(np.diff(a64))
    child = _enc_for(z.view(np.int64)) if len(z) else _enc_for(np.empty(0, np.int64))
    return _node(
        "delta", {"dt": arr.dtype.str, "n": len(arr), "first": first}, k={"z": child}
    )


def _dec_delta(enc: dict) -> np.ndarray:
    m = enc["m"]
    n = m["n"]
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out.astype(np.dtype(m["dt"]))
    out[0] = m["first"]
    if n > 1:
        z = _dec_for(enc["k"]["z"]).view(np.uint64)
        np.cumsum(bitpack.unzigzag(z), out=out[1:])
        out[1:] += m["first"]
    return out.astype(np.dtype(m["dt"]), copy=False)


# ------------------------------------------------------------------ rle ----


def _runs(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n = len(arr)
    if n == 0:
        return arr[:0], np.empty(0, np.int64)
    change = np.flatnonzero(arr[1:] != arr[:-1])
    starts = np.concatenate(([0], change + 1))
    lengths = np.diff(np.concatenate((starts, [n])))
    return arr[starts], lengths


def _enc_rle(arr: np.ndarray) -> dict:
    vals, lengths = _runs(arr)
    return _node(
        "rle",
        {"dt": arr.dtype.str, "n": len(arr)},
        k={
            "v": _best_int(vals, allow_rle=False, allow_dict=False, allow_vrank=False),
            # run length >= 1 always; store length-1 for tighter bit width
            "l": _enc_for(lengths - 1),
        },
    )


def _dec_rle(enc: dict) -> np.ndarray:
    m = enc["m"]
    vals = decode_int(enc["k"]["v"])
    lengths = _dec_for(enc["k"]["l"]).astype(np.int64) + 1
    out = np.repeat(vals, lengths)
    return out.astype(np.dtype(m["dt"]), copy=False)[: m["n"]]


# ----------------------------------------------------------------- dict ----


def _enc_dict(arr: np.ndarray) -> dict:
    uniq, codes = np.unique(arr, return_inverse=True)
    return _node(
        "dict",
        {"dt": arr.dtype.str, "n": len(arr)},
        k={
            "codes": _best_int(codes.astype(np.int64), allow_dict=False, allow_vrank=False),
            "values": _best_int(uniq, allow_dict=False, allow_rle=False, allow_vrank=False),
        },
    )


def _dec_dict(enc: dict) -> np.ndarray:
    uniq = decode_int(enc["k"]["values"])
    codes = decode_int(enc["k"]["codes"])
    return uniq[codes].astype(np.dtype(enc["m"]["dt"]), copy=False)


# ------------------------------------------------------ byte-plane split ----


def _enc_bps(arr: np.ndarray) -> dict | None:
    """Min-subtract, cast to the smallest byte-aligned uint width, then
    split the cast stream into per-byte planes — ONE PAYLOAD PER PLANE,
    so the container zstd-compresses each plane independently and
    `_est_z` scores each plane's homogeneous entropy accurately.  For
    e.g. 16-bit token ids the skewed high byte stops sharing an entropy
    table with the uniform low byte: measured 1.110 -> 1.074 B/token
    post-zstd on the bench corpus, and the compressor runs ~20% faster
    on the split layout."""
    n = len(arr)
    if n == 0:
        return None
    a64 = arr.astype(np.int64, copy=False)
    ref = int(a64.min())
    deltas = (a64 - ref).view(np.uint64)
    bits = bitpack.bit_width(int(deltas.max()))
    if bits <= 8:
        return None  # single plane == FoR at 8 bits; no split to exploit
    w = bitpack._narrow_uint(bits).itemsize
    cast = deltas.astype(np.dtype(f"<u{w}"), copy=False)
    b2 = np.ascontiguousarray(cast).view(np.uint8).reshape(n, w)
    planes = [np.ascontiguousarray(b2[:, i]) for i in range(w)]
    return _node("bps", {"dt": arr.dtype.str, "n": n, "ref": ref, "w": w}, planes)


def _dec_bps(enc: dict) -> np.ndarray:
    m = enc["m"]
    target = np.dtype(m["dt"])
    n, w = m["n"], m["w"]
    b2 = np.empty((n, w), dtype=np.uint8)
    for i, p in enumerate(enc["p"]):
        b2[:, i] = np.frombuffer(p, dtype=np.uint8)[:n]
    cast = b2.reshape(-1).view(np.dtype(f"<u{w}"))[:n]
    out = cast.astype(target, copy=False)
    if m["ref"]:
        if out is cast or not out.flags.writeable:
            out = out.copy()
        ref_t = np.array(m["ref"], dtype=np.int64).astype(target, copy=False)
        with np.errstate(over="ignore"):
            out += ref_t
    return out


# ------------------------------------------------- variable-length rank ----

_VRANK_MAX = 1 << 22  # bincount bound: token vocabularies, ids, categories
_VRANK_ESC = 255


def _enc_vrank(arr: np.ndarray) -> dict | None:
    """Escape-coded frequency rank: remap values to their per-partition
    frequency rank (0 = most common), store ``min(rank, 255)`` as a
    1-byte stream and ``rank - 255`` for escaped values as two byte
    planes, plus the rank-ordered value table.  For zipf-ish token ids
    the top-255 ranks cover ~80% of positions, so most tokens cost ONE
    pre-zstd byte whose Huffman code then approaches its true
    probability — measured 1.074 -> 0.966 B/token on the bench corpus,
    within 1.7% of the zero-order entropy floor (0.949).  Rank order is
    deterministic (stable argsort on counts over value-sorted uniques)
    so resumes stay byte-identical."""
    n = len(arr)
    if n < 1024:
        return None
    a64 = arr.astype(np.int64, copy=False)
    lo = int(a64.min())
    if lo < 0 or int(a64.max()) >= _VRANK_MAX:
        return None
    cnt = np.bincount(a64)
    uniq = np.flatnonzero(cnt)
    if len(uniq) <= 1:
        return None  # constant column: rle/dict territory
    order = np.argsort(-cnt[uniq], kind="stable")  # ties: smaller value first
    rank_of = np.full(len(cnt), -1, dtype=np.int64)
    rank_of[uniq[order]] = np.arange(len(uniq))
    # the hot gather runs over a vocab-sized uint8 LUT (min(rank,255)),
    # not the int64 rank table — 8x less gather traffic on the n-sized
    # pass; the escaped minority re-gathers through the full table
    lut8 = np.minimum(rank_of, _VRANK_ESC).astype(np.uint8)
    b0 = lut8[a64]
    esc = b0 == _VRANK_ESC
    # np.compress beats boolean fancy-indexing ~1.7x on this extraction
    # (numpy's a[mask] path re-counts and re-scans the mask)
    ext = (rank_of[np.compress(esc, a64)] - _VRANK_ESC).astype(np.uint32)
    if len(uniq) - _VRANK_ESC <= 1 << 16:
        eb = np.ascontiguousarray(ext.astype("<u2")).view(np.uint8).reshape(len(ext), 2)
    else:
        eb = np.ascontiguousarray(ext.astype("<u4")).view(np.uint8).reshape(len(ext), 4)
    planes = [b0] + [np.ascontiguousarray(eb[:, i]) for i in range(eb.shape[1])]
    return _node(
        "vrank",
        {"dt": arr.dtype.str, "n": n, "ne": len(ext), "ew": eb.shape[1]},
        planes,
        k={"values": _best_int(uniq[order].astype(np.int64), allow_dict=False, allow_vrank=False)},
    )


_VTOP_SAMPLE = 1 << 21  # prefix rows used to pick the top-255 value set


def _enc_vtop(arr: np.ndarray) -> dict | None:
    """Sampled top-value remap — the large-array sibling of ``vrank``.

    vrank's exact frequency ranking needs a full-array bincount plus a
    rank re-gather for the escaped minority (~55% of encode core time on
    token columns).  vtop instead picks the top-255 VALUES from a
    deterministic 2M-row prefix sample (for zipf-shaped columns the
    top-255 set is stable at that sample size) and stores the escaped
    minority as raw values minus the column min, byte-plane split so the
    container zstd squeezes the near-constant high planes.  The encode
    therefore makes exactly one O(n) LUT gather plus one gather over the
    escaped ~20%; only the 2M-row sample is counted.  Rank order inside
    the top set still follows (count desc, value asc) on the sample, so
    byte-plane entropy matches vrank's on the kept majority; the escaped
    tail loses the rank canonicalization, which measured <0.1% of block
    size on the bench corpus (escaped values are the rare tail either
    way).  Deterministic (prefix sample, stable argsort) so resumed runs
    re-encode byte-identically."""
    n = len(arr)
    if n < 1024:
        return None
    lo = int(arr.min())
    hi = int(arr.max())
    if lo < 0 or hi >= _VRANK_MAX:
        return None
    samp = arr[:_VTOP_SAMPLE] if n > _VTOP_SAMPLE else arr
    # bincount refuses uint64 (not safely castable to intp); values are
    # already bounded by _VRANK_MAX, so an int64 view of the sample is safe
    if samp.dtype == np.uint64:
        samp = samp.astype(np.int64)
    cnt = np.bincount(samp, minlength=hi + 1)
    uniq = np.flatnonzero(cnt)
    if len(uniq) <= 1:
        return None  # constant column: rle/dict territory
    order = np.argsort(-cnt[uniq], kind="stable")  # ties: smaller value first
    top = uniq[order[:_VRANK_ESC]].astype(np.int64)
    lut8 = np.full(hi + 1, _VRANK_ESC, dtype=np.uint8)
    lut8[top] = np.arange(len(top), dtype=np.uint8)
    # Arrow kernels for the two O(n) passes: pc.take indexes the 256-entry
    # LUT with the array's NATIVE dtype (numpy's lut8[arr] first stages an
    # n*8-byte intp index buffer — pure memory traffic on a path that is
    # bandwidth-bound at 32-way), and pc.filter streams the bit-packed
    # mask once (np.compress re-materializes a byte mask).  Measured ~30%
    # off both passes on 16M-token blocks; results are bit-identical.
    arr_pa = pa.array(np.ascontiguousarray(arr))
    b0_pa = pc.take(pa.array(lut8), arr_pa)
    b0 = b0_pa.to_numpy(zero_copy_only=True)  # uint8, no nulls possible
    # NB: the comparison scalar must be TYPED (uint8) — a bare Python int
    # makes pc.equal promote the whole column and costs 16x (90ms vs 5.5ms
    # on a 16M block)
    esc_mask = pc.equal(b0_pa, pa.scalar(_VRANK_ESC, pa.uint8()))
    ext = pc.filter(arr_pa, esc_mask).to_numpy(
        zero_copy_only=True
    )  # native-width gather of the escaped ~20%
    if lo:
        ext = ext - arr.dtype.type(lo)
    ne = len(ext)
    span = hi - lo
    ew = 1 if span < (1 << 8) else 2 if span < (1 << 16) else 4
    eb = ext.astype(f"<u{ew}").view(np.uint8).reshape(ne, ew)
    planes = [b0] + [np.ascontiguousarray(eb[:, i]) for i in range(ew)]
    return _node(
        "vtop",
        {"dt": arr.dtype.str, "n": n, "ne": ne, "ew": ew, "lo": lo,
         "nt": len(top)},
        planes,
        k={"values": _best_int(top, allow_dict=False, allow_vrank=False)},
    )


def _dec_vtop(enc: dict) -> np.ndarray:
    m = enc["m"]
    target = np.dtype(m["dt"])
    n, ne, ew, lo, nt = m["n"], m["ne"], m["ew"], m["lo"], m["nt"]
    b0 = np.frombuffer(enc["p"][0], dtype=np.uint8)[:n]
    table = np.zeros(256, dtype=target)
    table[:nt] = decode_int(enc["k"]["values"]).astype(target, copy=False)
    # numpy's uint8-indexed gather beats pc.take + copy here (the take
    # result is immutable Arrow memory, so the scatter below would force
    # a full-width copy; table[b0] is writable from birth) — measured
    # ~5% on the 52M-token partition at a 19% escape rate.  np.place
    # pairs the k-th escape value with the k-th set mask bit and beats
    # boolean fancy-assignment ~1.5x at that density (np.putmask is NOT
    # usable: it pairs by absolute array position).
    out = table[b0]
    if ne:
        eb = np.empty((ne, ew), dtype=np.uint8)
        for i in range(ew):
            eb[:, i] = np.frombuffer(enc["p"][1 + i], dtype=np.uint8)[:ne]
        ext = eb.reshape(-1).view(np.dtype(f"<u{ew}"))[:ne].astype(np.int64)
        if lo:
            ext += lo
        np.place(out, b0 == _VRANK_ESC, ext.astype(target, copy=False))
    return out


def _dec_vrank(enc: dict) -> np.ndarray:
    m = enc["m"]
    target = np.dtype(m["dt"])
    n, ne, ew = m["n"], m["ne"], m["ew"]
    b0 = np.frombuffer(enc["p"][0], dtype=np.uint8)[:n]
    # narrow the SMALL rank table before the n-sized gather so the big
    # pass reads/writes the target width, not int64
    values = decode_int(enc["k"]["values"]).astype(target, copy=False)
    # same hybrid as _dec_vtop: gather the whole column through the
    # uint8 plane (escape rows land on values[_VRANK_ESC], a harmless
    # placeholder), then scatter the ne true escape values with
    # np.place — avoids the n-sized int64 `codes` staging array
    # entirely (measured ~1.4x on a 52M-token partition at 8% escapes)
    out = values[b0]
    if ne:
        eb = np.empty((ne, ew), dtype=np.uint8)
        for i in range(ew):
            eb[:, i] = np.frombuffer(enc["p"][1 + i], dtype=np.uint8)[:ne]
        # widen before the +ESC shift: a python-int + uint8 add stays
        # uint8 under NEP 50 weak promotion and would wrap past 255
        ext = eb.reshape(-1).view(np.dtype(f"<u{ew}"))[:ne].astype(np.int64)
        np.place(out, b0 == _VRANK_ESC, values[_VRANK_ESC + ext])
    return out


# ---------------------------------------------------------- auto select ----

_INT_DECODERS = {
    "plain": _dec_plain,
    "bp": _dec_bitpack,
    "for": _dec_for,
    "delta": _dec_delta,
    "rle": _dec_rle,
    "dict": _dec_dict,
    "bps": _dec_bps,
    "vrank": _dec_vrank,
    "vtop": _dec_vtop,
}


def _candidates(
    allow_rle: bool = True,
    allow_dict: bool = True,
    allow_delta: bool = True,
    allow_vrank: bool = True,
):
    cands = [_enc_plain, _enc_bitpack, _enc_for, _enc_bps]
    if allow_vrank:
        cands.append(_enc_vrank)
    if allow_delta:
        cands.append(_enc_delta)
    if allow_rle:
        cands.append(_enc_rle)
    if allow_dict:
        cands.append(_enc_dict)
    return cands


def _size(enc: dict) -> int:
    total = sum(len(p) for p in enc["p"])
    for ch in enc["k"].values():
        total += _size(ch)
    return total


def _est_z(enc: dict) -> float:
    """Estimated *post-container* size: the container zstd-compresses each
    payload, so codec selection must score compressed bytes, not raw bytes
    (bp+zstd routinely beats dict pre-zstd).  Large payloads are estimated
    from a compressed prefix."""
    _zstd1 = zstd_lazy.get()
    total = 0.0
    for p in enc["p"]:
        n = len(p)
        if n < 128:
            total += n
        else:
            pref = p if n <= (1 << 18) else p[: 1 << 18]
            ratio = len(_zstd1.compress(pref, asbytes=True)) / len(pref)
            total += min(1.0, ratio) * n
    for ch in enc["k"].values():
        total += _est_z(ch)
    return total


def _best_int(
    arr: np.ndarray,
    allow_rle: bool = True,
    allow_dict: bool = True,
    allow_delta: bool = True,
    allow_vrank: bool = True,
) -> dict:
    """Pick the smallest (post-zstd-estimated) encoding: estimate on a
    prefix sample for large arrays, encode the full array with the winner,
    and guard sample-biased winners (dict/rle/delta) against a cheap
    full-array FoR encode."""
    cands = _candidates(allow_rle, allow_dict, allow_delta, allow_vrank)
    if len(arr) > 4 * SAMPLE:
        sample = arr[:SAMPLE]
        if allow_dict and len(np.unique(sample)) > SAMPLE // 4:
            # cardinality grows with n; sampled dict estimates are biased low
            cands = [fn for fn in cands if fn is not _enc_dict]
        # large arrays take the sampled-rank path (vtop) via the explicit
        # comparison below; a sample win for exact vrank would otherwise
        # trigger a full-array bincount + rank re-gather
        cands = [fn for fn in cands if fn is not _enc_vrank]
        scored = []
        for ci, enc_fn in enumerate(cands):
            e = enc_fn(sample)
            if e is not None:
                # tie-break on candidate ORDER (deterministic across
                # processes — id() would break byte-identical resume)
                scored.append((_est_z(e), ci, enc_fn))
        scored.sort(key=lambda t: (t[0], t[1]))
        best_fn = scored[0][2]
        if allow_vrank and best_fn in (_enc_bitpack, _enc_bps, _enc_for):
            # vrank's sample bias runs the OTHER way: a small sample's
            # top-255 ranks cover far less than the full array's (each
            # value seen ~once), so the sampled score rejects it even
            # when it wins on the full column — e.g. token ids, where
            # full-array vrank is ~10% under bps.  Compare its full-array
            # estimate against the winner's sample estimate SCALED to n
            # (exact for fixed-width bp/bps/for) so the loser is never
            # encoded; the applicability guards (non-negative, max <
            # 2^22) skip non-token-shaped columns before the O(n) remap.
            # Large arrays use vtop, the sampled-rank variant: same
            # escape-coded layout, but the top-255 set comes from a 2M
            # prefix so the encode never bincounts the full array.
            vr = _enc_vtop(arr)
            if vr is not None and _est_z(vr) < scored[0][0] * (len(arr) / len(sample)):
                return vr
        best = best_fn(arr)
        if best is not None:
            if best_fn not in (_enc_plain, _enc_bitpack, _enc_for, _enc_bps):
                # sample-biased winners (dict/rle/delta grow with n) must
                # beat a cheap full-array stable encode to survive
                for alt_fn in (_enc_for, _enc_bps):
                    alt = alt_fn(arr)
                    if alt is not None and _est_z(alt) <= _est_z(best):
                        best = alt
            return best
    encs = [e for e in (fn(arr) for fn in cands) if e is not None]
    return min(encs, key=_est_z)


def encode_int_auto(arr: np.ndarray, choice: str | None = None) -> dict:
    """Encode an integer array, auto-selecting the codec (or forcing one)."""
    if choice is not None:
        return encode_int(arr, choice)
    return _best_int(arr)


def encode_int(arr: np.ndarray, codec: str) -> dict:
    fn = {
        "plain": _enc_plain,
        "bp": _enc_bitpack,
        "for": _enc_for,
        "delta": _enc_delta,
        "rle": _enc_rle,
        "dict": _enc_dict,
    }[codec]
    enc = fn(arr)
    if enc is None:
        raise ValueError(f"codec {codec} not applicable to this array")
    return enc


def decode_int(enc: dict) -> np.ndarray:
    return _INT_DECODERS[enc["c"]](enc)


# ---------------------------------------------------------------- float ----


def _enc_bss(arr: np.ndarray) -> dict:
    """Byte-stream split (Parquet's BYTE_STREAM_SPLIT idea): transpose the
    per-value byte planes so the container zstd sees all exponent bytes
    together — high-entropy mantissa bytes stop poisoning the compressible
    sign/exponent stream.  Bit-identical (pure byte permutation)."""
    bytes2d = np.ascontiguousarray(arr).view(np.uint8).reshape(len(arr), arr.dtype.itemsize)
    planes = np.ascontiguousarray(bytes2d.T).reshape(-1)
    return _node("fbss", {"dt": arr.dtype.str, "n": len(arr)}, [planes])


def _dec_bss(enc: dict) -> np.ndarray:
    m = enc["m"]
    dt = np.dtype(m["dt"])
    n = m["n"]
    planes = np.frombuffer(enc["p"][0], dtype=np.uint8)[: n * dt.itemsize]
    bytes2d = np.ascontiguousarray(planes.reshape(dt.itemsize, n).T)
    return bytes2d.reshape(-1).view(dt)[:n]


def encode_float_auto(arr: np.ndarray) -> dict:
    """Floats: plain, byte-stream split, or dict when cardinality is low
    (bit-identical via viewing the raw bits as integers so NaN payloads
    survive).  plain-vs-bss is scored on estimated post-container zstd
    size from a prefix sample, same policy as `_best_int`."""
    n = len(arr)
    view = arr.view(np.uint32 if arr.dtype == np.float32 else np.uint64)
    if n > 16:
        uniq = np.unique(view[: min(n, 4 * SAMPLE)])
        if len(uniq) <= max(16, n // 8):
            full_uniq, codes = np.unique(view, return_inverse=True)
            enc = _node(
                "fdict",
                {"dt": arr.dtype.str, "n": n},
                k={
                    "codes": _best_int(codes.astype(np.int64), allow_dict=False, allow_vrank=False),
                    "values": _enc_plain(full_uniq),
                },
            )
            if _size(enc) < arr.nbytes:
                return enc
    sample = arr[: 4 * SAMPLE] if n > 4 * SAMPLE else arr
    plain_est = _est_z(_node("fplain", {"dt": arr.dtype.str, "n": len(sample)},
                             [np.ascontiguousarray(sample).view(np.uint8).reshape(-1)]))
    # score bss per byte-plane: a whole-buffer prefix ratio lands on the
    # random mantissa planes and extrapolates wrongly, while each plane is
    # homogeneous, so one prefix ratio per plane is accurate (the container
    # compresses the single concatenated payload to ~the sum of the planes)
    sbytes = np.ascontiguousarray(sample).view(np.uint8).reshape(len(sample), arr.dtype.itemsize)
    bss_est = _est_z(_node("fbss", {"dt": arr.dtype.str, "n": len(sample)},
                           [np.ascontiguousarray(sbytes[:, i]) for i in range(arr.dtype.itemsize)]))
    if bss_est < plain_est:
        return _enc_bss(arr)
    return _node("fplain", {"dt": arr.dtype.str, "n": n}, [np.ascontiguousarray(arr).view(np.uint8).reshape(-1)])


def decode_float(enc: dict) -> np.ndarray:
    m = enc["m"]
    dt = np.dtype(m["dt"])
    if enc["c"] == "fplain":
        return np.frombuffer(enc["p"][0], dtype=dt)[: m["n"]]
    if enc["c"] == "fbss":
        return _dec_bss(enc)
    uniq = _dec_plain(enc["k"]["values"])
    codes = decode_int(enc["k"]["codes"])
    return uniq[codes].view(dt)
