"""FSST-style string compression, from scratch (per the public FSST paper:
"FSST: Fast Random Access String Compression", Boncz/Neumann/Leis, VLDB'20).

Design (all numpy-vectorized; no per-byte Python loops):

* Symbol table: built on a bounded sample with BPE-style pair merging
  (symbols capped at 8 bytes, table capped at 255 codes; code 255 is the
  escape marker followed by a literal byte).
* Encode: for every byte position compute the longest table symbol
  starting there (one uint64 "next 8 bytes" key per position, matched per
  length via sorted-key searchsorted), then walk the per-string greedy
  chains *in parallel across strings* — the loop count is the max
  symbols-per-string, each iteration vectorized over all active strings.
* Decode: escape/literal disambiguation via run-parity over maximal runs
  of 0xFF (broken at string starts), then one gather through a flat
  symbol table extended with 256 literal entries.

Deterministic given input (no RNG) so resumed runs re-encode identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tokcodec.codecs.intcodecs import _best_int, _node, decode_int
from tokcodec.codecs.util import arr_to_np, np_to_arr, type_name

ESCAPE = 255
MAX_SYMBOLS = 255  # codes 0..254
MAX_SYM_LEN = 8
SAMPLE_BYTES = 1 << 15  # 32 KB: same compression as 64 KB, ~40% faster build
MAX_STR_LEN = 4096
MAX_MATRIX = 1 << 28  # n_strings * max_len guard for the chain-walk matrix


# ------------------------------------------------------------ table build ----


def _build_table(lengths: np.ndarray, data: np.ndarray) -> list[bytes]:
    """BPE-style merge on (lengths, data) sample → list of symbol byte
    strings (≤255 of them, each 1..8 bytes), most useful first."""
    # seq: int32 codes with -1 separators between strings
    n_strings = len(lengths)
    total = int(lengths.sum())
    seq = np.full(total + n_strings, -1, dtype=np.int32)
    # positions for data bytes: offset by one separator per preceding string
    str_id = np.repeat(np.arange(n_strings), lengths)
    within = np.arange(total) - np.repeat(np.cumsum(lengths) - lengths, lengths)
    pos = np.repeat(np.cumsum(lengths + 1) - (lengths + 1), lengths) + within
    seq[pos] = data
    sym_bytes: dict[int, bytes] = {b: bytes([b]) for b in range(256)}
    next_code = 256
    banned: set[int] = set()
    # Batched BPE: each round counts pairs ONCE, then applies up to 8
    # merges whose codes are mutually disjoint.  Disjointness makes the
    # stale counts exact (merging (a,b) can only change the count of a
    # pair sharing a or b), so the result matches what 8 sequential
    # rounds with re-counting would pick — at 1/8th the np.unique +
    # argsort cost, which dominated table build (~55 ms/partition).
    for _ in range(300):
        if next_code >= 256 + 254:
            break
        a = seq[:-1]
        b = seq[1:]
        valid = (a >= 0) & (b >= 0)
        keys = a.astype(np.int64) * 1024 + b
        uniq, counts = np.unique(keys[valid], return_counts=True)
        order = np.argsort(counts, kind="stable")[::-1]
        used: set[int] = set()
        accepted: list[tuple[int, int, int]] = []
        for oi in order:
            if int(counts[oi]) < 4 or len(accepted) >= 8:
                break
            key = int(uniq[oi])
            if key in banned:
                continue
            ka, kb = key // 1024, key % 1024
            if ka in used or kb in used:
                continue  # next round sees exact counts for this pair
            if len(sym_bytes[ka]) + len(sym_bytes[kb]) > MAX_SYM_LEN:
                banned.add(key)
                continue
            used.update((ka, kb))
            accepted.append((ka, kb, key))
            if next_code + len(accepted) >= 256 + 254:
                break
        if not accepted:
            break
        for ka, kb, _key in accepted:
            # non-overlapping greedy-left replace of (ka, kb) on the
            # CURRENT seq (indices shift as earlier merges splice it)
            a = seq[:-1]
            b = seq[1:]
            p = np.flatnonzero((a == ka) & (b == kb))
            if ka == kb:
                # drop every second position inside runs of consecutive matches
                keep = np.ones(len(p), dtype=bool)
                if len(p) > 1:
                    run_break = np.concatenate(([True], np.diff(p) > 1))
                    run_id = np.cumsum(run_break) - 1
                    run_start = p[run_break][run_id]
                    keep = ((p - run_start) % 2) == 0
                p = p[keep]
            if not len(p):
                continue
            code = next_code
            next_code += 1
            sym_bytes[code] = sym_bytes[ka] + sym_bytes[kb]
            seq[p] = code
            mask = np.ones(len(seq), dtype=bool)
            mask[p + 1] = False
            seq = seq[mask]
    # final selection: rank by gain vs escape-everything baseline
    cnt = np.bincount(seq[seq >= 0], minlength=next_code)
    gains = []
    for code in range(next_code):
        c = int(cnt[code]) if code < len(cnt) else 0
        if c == 0:
            continue
        L = len(sym_bytes[code])
        gains.append((c * (2 * L - 1), code))
    gains.sort(key=lambda t: (-t[0], t[1]))
    return [sym_bytes[code] for _, code in gains[:MAX_SYMBOLS]]


# ---------------------------------------------------------------- encode ----


def _sym_keys(table: list[bytes]):
    """Per-length sorted uint64 keys + codes for longest-match lookup."""
    by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for L in range(1, MAX_SYM_LEN + 1):
        pairs = [
            (int.from_bytes(s, "little"), i) for i, s in enumerate(table) if len(s) == L
        ]
        if pairs:
            pairs.sort()
            keys = np.array([k for k, _ in pairs], dtype=np.uint64)
            codes = np.array([c for _, c in pairs], dtype=np.uint8)
            by_len[L] = (keys, codes)
    return by_len


def try_fsst(arr: pa.Array, table: list[bytes] | None = None) -> dict | None:
    """Encode a null-free binary/string array with FSST; None when FSST is
    not applicable (huge strings, empty input, runaway matrix).  Pass a
    pre-built `table` to skip the sample build (codec selection builds it
    once on the sample and reuses it for the full encode)."""
    n = len(arr)
    if n == 0:
        return None
    lengths, data = arr_to_np(arr)
    n_bytes = len(data)
    if n_bytes == 0:
        return None
    max_len = int(lengths.max())
    if max_len > MAX_STR_LEN or n * max_len > MAX_MATRIX:
        return None

    # ---- table from a prefix sample (unless supplied)
    if table is None:
        take = int(np.searchsorted(np.cumsum(lengths), SAMPLE_BYTES)) + 1
        table = _build_table(lengths[:take], data[: int(lengths[:take].sum())])
    if not table:
        return None
    S = len(table)
    sym_lens = np.array([len(s) for s in table], dtype=np.int64)

    # ---- longest-match per byte position
    pad = np.zeros(n_bytes + MAX_SYM_LEN, dtype=np.uint8)
    pad[:n_bytes] = data
    key8 = np.zeros(n_bytes, dtype=np.uint64)
    for i in range(MAX_SYM_LEN):
        key8 |= pad[i : i + n_bytes].astype(np.uint64) << np.uint64(8 * i)
    offsets = np.empty(n + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(lengths, out=offsets[1:])
    rem = np.repeat(offsets[1:], lengths) - np.arange(n_bytes)
    token = np.full(n_bytes, -1, dtype=np.int16)  # <0 = unmatched so far
    mlen = np.ones(n_bytes, dtype=np.int64)
    by_len = _sym_keys(table)
    for L in range(MAX_SYM_LEN, 0, -1):
        if L not in by_len:
            continue
        keys, codes = by_len[L]
        mask_l = (np.uint64(1) << np.uint64(8 * L)) - np.uint64(1) if L < 8 else np.uint64(0xFFFFFFFFFFFFFFFF)
        cand = np.flatnonzero((token < 0) & (rem >= L))
        if len(cand) == 0:
            continue
        wk = key8[cand] & mask_l
        idx = np.searchsorted(keys, wk)
        idx[idx >= len(keys)] = 0
        hit = keys[idx] == wk
        hits = cand[hit]
        token[hits] = codes[idx[hit]]
        mlen[hits] = L
    # unmatched bytes → escaped literal (2 output bytes), token = 256+byte
    esc = token < 0
    token[esc] = 256 + data[esc].astype(np.int16)

    # ---- parallel chain walk across strings
    cur = offsets[:-1].copy()
    ends = offsets[1:]
    active = cur < ends
    cols = []
    while active.any():
        col = np.full(n, -1, dtype=np.int16)
        ca = cur[active]
        col[active] = token[ca]
        cur[active] = ca + mlen[ca]
        cols.append(col)
        active = cur < ends
    M = np.stack(cols, axis=1) if cols else np.empty((n, 0), dtype=np.int16)
    valid = M >= 0
    toks = M[valid]  # row-major → per-string order preserved
    ntok_per_str = valid.sum(axis=1)

    # ---- byte stream
    is_esc_tok = toks >= 256
    out_len = np.where(is_esc_tok, 2, 1).astype(np.int64)
    starts = np.cumsum(out_len) - out_len
    stream = np.empty(int(out_len.sum()), dtype=np.uint8)
    stream[starts] = np.where(is_esc_tok, ESCAPE, toks).astype(np.uint8)
    e = np.flatnonzero(is_esc_tok)
    stream[starts[e] + 1] = (toks[e] - 256).astype(np.uint8)
    tok_sid = np.repeat(np.arange(n), ntok_per_str)
    slen = np.bincount(tok_sid, weights=out_len, minlength=n).astype(np.int64)

    table_blob = b"".join(table)
    return _node(
        "fsst",
        {
            "pa": type_name(arr.type),
            "n": n,
            "s": S,
            "sl": [int(x) for x in sym_lens],
        },
        [table_blob, np.ascontiguousarray(stream)],
        {"slen": _best_int(slen, allow_delta=False)},
    )


def table_of(enc: dict) -> list[bytes]:
    """Recover the symbol table from an encoded node (for reuse)."""
    blob = enc["p"][0]
    out, pos = [], 0
    for L in enc["m"]["sl"]:
        out.append(blob[pos : pos + L])
        pos += L
    return out


# ---------------------------------------------------------------- decode ----


def decode_fsst(enc: dict) -> pa.Array:
    m = enc["m"]
    n = m["n"]
    sym_lens = np.array(m["sl"], dtype=np.int64)
    table_blob = np.frombuffer(enc["p"][0], dtype=np.uint8)
    stream = np.frombuffer(enc["p"][1], dtype=np.uint8)
    slen = decode_int(enc["k"]["slen"]).astype(np.int64)
    nb = len(stream)

    # string-start positions in the stream (break escape runs there)
    soff = np.concatenate(([0], np.cumsum(slen)))
    is_start = np.zeros(nb + 1, dtype=bool)
    is_start[soff[:-1][slen > 0]] = True
    is_start = is_start[:nb]

    mask255 = stream == ESCAPE
    prev255 = np.concatenate(([False], mask255[:-1]))
    run_start = mask255 & (~prev255 | is_start)
    # escape iff even offset within its maximal 0xFF run
    is_esc = np.zeros(nb, dtype=bool)
    p255 = np.flatnonzero(mask255)
    if len(p255):
        rs = run_start[p255]
        run_id = np.cumsum(rs) - 1
        run_first = p255[rs][run_id]
        is_esc[p255] = ((p255 - run_first) % 2) == 0
    is_lit = np.concatenate(([False], is_esc[:-1]))

    tok_pos = np.flatnonzero(~is_esc)
    tok_byte = stream[tok_pos].astype(np.int64)
    tok_lit = is_lit[tok_pos]

    # extended flat table: symbols then 256 single-byte literal entries
    ext_lens = np.concatenate((sym_lens, np.ones(256, dtype=np.int64)))
    ext_flat = np.concatenate((table_blob, np.arange(256, dtype=np.uint8)))
    ext_offs = np.concatenate(([0], np.cumsum(ext_lens)))
    idx = np.where(tok_lit, m["s"] + tok_byte, tok_byte)

    out_lens = ext_lens[idx]
    total = int(out_lens.sum())
    starts = np.cumsum(out_lens) - out_lens
    j = np.arange(total) - np.repeat(starts, out_lens)
    src = np.repeat(ext_offs[idx], out_lens) + j
    out = ext_flat[src]

    # per-string decoded lengths
    sid_per_byte = np.repeat(np.arange(n), slen)
    tok_sid = sid_per_byte[tok_pos]
    dec_len = np.bincount(tok_sid, weights=out_lens, minlength=n).astype(np.int64)
    return np_to_arr(dec_len, out, m["pa"])
