"""Block container round-trip tests: every supported Arrow type, nulls,
bit-identical floats, and the size criterion vs parquet-zstd
(BASELINE.json line 6)."""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tokcodec.blocks import decode_table, encode_table, read_header
from tokcodec.synth import make_table


def _assert_tables_equal(a: pa.Table, b: pa.Table):
    assert a.schema == b.schema
    for name in a.column_names:
        ca = a.column(name).combine_chunks()
        cb = b.column(name).combine_chunks()
        if pa.types.is_floating(ca.type):
            w = np.uint32 if ca.type == pa.float32() else np.uint64
            na = ca.to_numpy(zero_copy_only=False)
            nb = cb.to_numpy(zero_copy_only=False)
            mask_a = np.asarray(pa.compute.is_null(ca))
            mask_b = np.asarray(pa.compute.is_null(cb))
            assert (mask_a == mask_b).all()
            va = np.nan_to_num(na[~mask_a], nan=0.0)
            vb = np.nan_to_num(nb[~mask_b], nan=0.0)
            # bit-level where finite; NaN payload check done in codec tests
            assert (va == vb).all()
        else:
            assert ca.equals(cb), name


def test_tokenized_table_roundtrip_bit_identical():
    t = make_table(3000, seed=42)
    blob = encode_table(t, meta={"part": 7})
    back, meta = decode_table(blob)
    assert meta == {"part": 7}
    assert back.equals(t)  # token arrays bit-identical (no floats involved)


def test_mixed_types_roundtrip():
    rng = np.random.default_rng(1)
    n = 2000
    t = pa.table({
        "i64": pa.array(rng.integers(-(2**40), 2**40, n), type=pa.int64()),
        "i32_null": pa.array([None if i % 7 == 0 else i for i in range(n)], type=pa.int32()),
        "f32": pa.array(rng.random(n).astype(np.float32)),
        "bool": pa.array([i % 3 == 0 for i in range(n)]),
        "s_null": pa.array([f"name-{i % 50}" if i % 5 else None for i in range(n)]),
        "bin": pa.array([bytes([i % 256])*3 for i in range(n)], type=pa.binary()),
        "ts": pa.array(np.arange(n) * 1_000_000, type=pa.timestamp("us")),
        "lst": pa.array([[1, 2, 3] if i % 2 else [] for i in range(n)], type=pa.list_(pa.int64())),
        "lst_null": pa.array([None if i % 11 == 0 else [i, i+1] for i in range(n)], type=pa.list_(pa.int32())),
        "st": pa.array([{"a": i, "b": f"x{i % 10}"} for i in range(n)],
                        type=pa.struct([("a", pa.int64()), ("b", pa.string())])),
        "lst_str": pa.array([["a", "bb"] if i % 2 else ["ccc"] for i in range(n)],
                            type=pa.list_(pa.string())),
    })
    back, _ = decode_table(encode_table(t))
    _assert_tables_equal(t, back)


def test_empty_table_roundtrip():
    t = make_table(50, seed=1).slice(0, 0)
    back, _ = decode_table(encode_table(t))
    assert back.num_rows == 0 and back.schema == t.schema


def test_decode_empty_projection_preserves_row_count():
    """columns=[] is a count-only read: it must report the block's real
    row count (parquet semantics), not a silent 0-row table."""
    import pyarrow as pa

    from tokcodec.blocks import decode_table, encode_table

    blob = encode_table(pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]}))
    t, _ = decode_table(blob, columns=[])
    assert t.num_rows == 3 and t.num_columns == 0


def test_size_beats_parquet_zstd():
    """BASELINE.json size criterion: encoded bytes <= reference Parquet
    (zstd) bytes on the same table."""
    t = make_table(4000, seed=42)
    blob = encode_table(t)
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="zstd")
    assert len(blob) <= buf.tell(), (len(blob), buf.tell())


def test_header_readable_without_decode():
    t = make_table(100, seed=2)
    blob = encode_table(t, meta={"lineage": {"file": "x.parquet"}})
    h = read_header(blob)
    assert h["n_rows"] == 100
    assert {c["name"] for c in h["columns"]} == {"doc_id", "tokens", "n_tok", "source"}
    assert h["meta"]["lineage"]["file"] == "x.parquet"


def test_unsupported_type_raises():
    t = pa.table({"m": pa.array([[(1, 2)]], type=pa.map_(pa.int32(), pa.int32()))})
    with pytest.raises(TypeError):
        encode_table(t)
