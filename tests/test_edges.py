"""Edge-input gauntlet: empty / single-row / all-null / non-ASCII inputs
through every operator family (container, tokenizer, langid, hashes,
sketch) — regressions here surface as worker crashes mid-pipeline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tokcodec.blocks import decode_table, encode_table
from tokcodec.functions import dedup, text
from tokcodec.functions.sketch import _batch_registers


def test_container_empty_and_allnull_roundtrip():
    t0 = pa.table({"a": pa.array([], pa.int64()), "s": pa.array([], pa.string())})
    back, _ = decode_table(encode_table(t0))
    assert back.equals(t0)
    t1 = pa.table(
        {
            "a": pa.array([None], pa.int64()),
            "s": pa.array([None], pa.string()),
            "l": pa.array([None], pa.list_(pa.int32())),
        }
    )
    back, _ = decode_table(encode_table(t1))
    assert back.equals(t1)


@pytest.mark.parametrize("texts", [[], [""], [None], ["   "], ["☃☃☃"]])
def test_tokenize_edge_batches(texts):
    b = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["s"] * len(texts)),
        }
    )
    out = text.tokenize(b)
    assert out.num_rows == len(texts)
    assert all(v == 0 for v in out.column("n_tok").to_pylist())


@pytest.mark.parametrize("texts", [[], [None], [""]])
def test_langid_edge_batches(texts):
    b = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    assert text.LangId()(b).num_rows == len(texts)


@pytest.mark.parametrize("texts", [[], [None, ""]])
def test_hash_stages_edge_batches(texts):
    b = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    assert text.rolling_hash(b).num_rows == len(texts)
    assert dedup.simhash_batch(b).num_rows == len(texts)
    dedup.minhash_band_rows(b)  # must not raise


def test_hll_empty_batch_registers():
    assert _batch_registers(np.empty(0, np.uint64), 12).sum() == 0


# ---- extended column types: every Arrow type an LLM-data table plausibly
# ---- carries must round-trip bit-identical through the block codec


def _rt(t: pa.Table) -> pa.Table:
    back, _ = decode_table(encode_table(t.combine_chunks()))
    return back


@pytest.mark.parametrize(
    "name,table",
    [
        (
            "dict_string",
            pa.table({"d": pa.array(["x", "y", None, "x", "z"] * 25).dictionary_encode()}),
        ),
        (
            "dict_int",
            pa.table({"d": pa.array([10, 20, 10, None] * 10, pa.int64()).dictionary_encode()}),
        ),
        (
            "fixed_size_list_float",
            pa.table(
                {"emb": pa.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], None], pa.list_(pa.float32(), 3))}
            ),
        ),
        (
            "fsl_nested",
            pa.table({"m": pa.array([[[1, 2], [3, 4]], None], pa.list_(pa.list_(pa.int32(), 2), 2))}),
        ),
        (
            "fixed_size_binary",
            pa.table(
                {"h": pa.array([b"0123456789abcdef", None, b"fedcba9876543210"], pa.binary(16))}
            ),
        ),
        (
            "decimal128",
            pa.table(
                {
                    "dec": pa.array(
                        [None, __import__("decimal").Decimal("1.23"), __import__("decimal").Decimal("-4.56")],
                        pa.decimal128(10, 2),
                    )
                }
            ),
        ),
        ("duration", pa.table({"d": pa.array([5, None, -10], pa.duration("ms"))})),
        ("null_type", pa.table({"n": pa.array([None, None], pa.null())})),
        (
            "float16_bits",
            pa.table({"h": pa.array(np.array([1.5, 2.5, np.nan, -0.0], np.float16))}),
        ),
        ("float16_null", pa.table({"h": pa.array([np.float16(1.5), None], pa.float16())})),
    ],
)
def test_extended_type_roundtrip(name, table):
    assert _rt(table).equals(table.combine_chunks())


def test_extended_types_sliced_offsets():
    """Fixed-width encode paths index the raw buffer by arr.offset — a
    sliced (non-zero-offset) input must round-trip the window exactly."""
    big = pa.table(
        {
            "emb": pa.array([[float(i), float(i + 1)] for i in range(100)], pa.list_(pa.float64(), 2)),
            "fb": pa.array([bytes([i % 256]) * 4 for i in range(100)], pa.binary(4)),
            "h": pa.array(np.arange(100, dtype=np.float16)),
        }
    )
    window = big.slice(13, 40).combine_chunks()
    assert _rt(window).equals(window)


def test_duplicate_column_names_fail_fast():
    t = pa.Table.from_arrays([pa.array([1]), pa.array([2])], names=["a", "a"])
    with pytest.raises(ValueError, match="duplicate column names"):
        encode_table(t)


def test_dictionary_column_keeps_zone_map_stats():
    """Dict-encoded inputs must not lose predicate-pruning stats: the
    zone map is computed over the logical values."""
    from tokcodec.blocks import read_header

    t = pa.table({"src": pa.array(["a", "b", "c", "b", None] * 10).dictionary_encode()})
    st = read_header(encode_table(t.combine_chunks()))["columns"][0]["stats"]
    assert st["min"] == "a" and st["nulls"] == 10 and st["n"] == 50
