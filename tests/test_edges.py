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
