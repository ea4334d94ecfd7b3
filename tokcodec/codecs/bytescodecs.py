"""Binary/string codecs: plain (lengths + blob), dictionary, FSST.

Operate on pyarrow Binary/String arrays (zero-copy buffer access in,
exact Arrow array reconstruction out).  Nulls are handled one level up
(blocks.py strips/reapplies validity); arrays here are null-free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tokcodec.codecs.fsst import decode_fsst, table_of, try_fsst
from tokcodec.codecs.intcodecs import _best_int, _est_z, _node, decode_int
from tokcodec.codecs.util import _PA_TYPES, arr_to_np, np_to_arr, type_name

_type_name = type_name  # back-compat alias

# FSST is worthwhile on short-ish strings; guard against pathological
# per-string loop counts on huge documents (SURVEY.md §7 hard parts).
FSST_MAX_AVG_LEN = 512


# ---------------------------------------------------------------- plain ----


def _enc_plain_bytes(arr: pa.Array) -> dict:
    lengths, data = arr_to_np(arr)
    return _node(
        "pbytes",
        {"pa": type_name(arr.type), "n": len(arr)},
        [np.ascontiguousarray(data)],
        {"len": _best_int(lengths, allow_delta=False)},
    )


def _dec_plain_bytes(enc: dict) -> pa.Array:
    m = enc["m"]
    lengths = decode_int(enc["k"]["len"]).astype(np.int64)
    data = np.frombuffer(enc["p"][0], dtype=np.uint8)
    return np_to_arr(lengths, data, m["pa"])


# ----------------------------------------------------------------- dict ----


def _enc_dict_bytes(arr: pa.Array, fsst_values: bool = True) -> dict:
    d = pc.dictionary_encode(arr)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uvals = d.dictionary
    # encode the (usually small) unique-value blob; FSST it when it helps
    venc = try_fsst(uvals) if fsst_values else None
    if venc is None:
        venc = _enc_plain_bytes(uvals)
    return _node(
        "dbytes",
        {"pa": type_name(arr.type), "n": len(arr)},
        k={"codes": _best_int(codes, allow_dict=False), "uvals": venc},
    )


def _dec_dict_bytes(enc: dict) -> pa.Array:
    m = enc["m"]
    uvals = decode_bytes(enc["k"]["uvals"])
    codes = decode_int(enc["k"]["codes"])
    return pc.take(uvals, pa.array(codes)).cast(_PA_TYPES[m["pa"]])


# ---------------------------------------------------------- auto select ----


def encode_bytes_auto(arr: pa.Array, choice: str | None = None) -> dict:
    if choice is not None:
        return encode_bytes(arr, choice)
    n = len(arr)
    if n <= 4096:
        # small array: the "sample" is the whole array — return the winner
        cands = [_enc_plain_bytes(arr)]
        if n:
            d = _enc_dict_bytes(arr)
            cands.append(d)
            # ≤64 distinct values: dict (≤6-bit codes + tiny value blob)
            # always beats FSST's ≥1 code byte per string — skip the
            # symbol-table build, the costliest step for low-card columns
            if d["k"]["uvals"]["m"]["n"] > 64:
                f = try_fsst(arr)
                if f is not None:
                    cands.append(f)
        return min(cands, key=_est_z)
    # cap the trial sample by BYTES, not rows: the FSST symbol-table
    # build is O(sample bytes) and dominated encode profiling at 4096
    # rows x ~16 B (~80 ms/partition, ~19% of encode core time); the
    # VLDB'20 reference builds its table from a ~16 KB sample, which
    # loses almost nothing in pick quality.  8 KB decides identically to
    # 16 KB on every corpus column (plain-vs-fsst margins are ~2x) at
    # half the trial cost; the row floor of 128 keeps the >64-uniques
    # dict-vs-fsst gate meaningful (a 64-row sample could never exceed
    # it) while capping long-string trial samples at ~128 rows instead
    # of 256.  Winners still build their real table from up to
    # SAMPLE_BYTES (32 KB) of data inside try_fsst, so a smaller trial
    # only changes which columns pay the full build, not its quality
    # when the sample carries >= 32 KB.
    avg_len = max(1, (arr.nbytes - 8 * n) // max(1, n))
    rows = max(128, min(4096, 8192 // avg_len))
    sample = arr.slice(0, rows)
    dict_cand = _enc_dict_bytes(sample, fsst_values=False)
    cands = [_enc_plain_bytes(sample), dict_cand]
    fs = None
    if dict_cand["k"]["uvals"]["m"]["n"] > 64:  # see small-array shortcut
        fs = try_fsst(sample)
    if fs is not None:
        cands.append(fs)
    best = min(cands, key=_est_z)["c"]
    if best == "fsst":
        enc = try_fsst(arr, table=table_of(fs))  # reuse the sample-built table
        return enc if enc is not None else _enc_dict_bytes(arr)
    return encode_bytes(arr, {"pbytes": "plain", "dbytes": "dict"}[best])


def encode_bytes(arr: pa.Array, codec: str) -> dict | None:
    if codec == "plain":
        return _enc_plain_bytes(arr)
    if codec == "dict":
        return _enc_dict_bytes(arr)
    if codec == "fsst":
        return try_fsst(arr)
    raise KeyError(codec)


def decode_bytes(enc: dict) -> pa.Array:
    if enc["c"] == "pbytes":
        return _dec_plain_bytes(enc)
    if enc["c"] == "dbytes":
        return _dec_dict_bytes(enc)
    if enc["c"] == "fsst":
        return decode_fsst(enc)
    raise KeyError(enc["c"])
