"""Regression tests for code-review findings (round 1)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tokcodec.blocks import decode_table, encode_table
from tokcodec.codecs.intcodecs import decode_int, encode_int
from tokcodec.functions.dedup import _word_shingles, simhash_batch
from tokcodec.projection import Projection


def test_projection_preserves_null_list_slots():
    t = pa.table(
        {
            "id": [1, 2, 3],
            "tags": pa.array(
                [[{"k": "a", "v": 1}], None, [{"k": "b", "v": 2}]],
                type=pa.list_(pa.struct([("k", pa.string()), ("v", pa.int64())])),
            ),
        }
    )
    out = Projection(["id", "tags.k"]).project_table(t)
    col = out.column("tags").combine_chunks()
    assert col.null_count == 1 and col.is_null()[1].as_py()
    assert col.to_pylist() == [[{"k": "a"}], None, [{"k": "b"}]]


@pytest.mark.parametrize("codec", ["plain", "bp", "for", "delta", "rle", "dict"])
def test_forced_codec_empty_array_decodes(codec):
    a = np.array([], dtype=np.int64)
    dec = decode_int(encode_int(a, codec))
    assert len(dec) == 0 and dec.dtype == a.dtype


def test_empty_batch_shingles_and_simhash():
    d, h = _word_shingles([])
    assert len(d) == 0 and len(h) == 0
    t = pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    out = simhash_batch(t)
    assert out.num_rows == 0 and "simhash" in out.column_names


def test_decode_table_column_pruning():
    t = pa.table({"a": [1, 2], "b": ["x", "y"], "c": [0.5, 1.5]})
    blob = encode_table(t)
    out, _ = decode_table(blob, columns=["c", "a"])
    assert out.column_names == ["a", "c"]  # file order preserved
    assert out.column("a").to_pylist() == [1, 2]
    with pytest.raises(ValueError, match="Invalid fields"):
        decode_table(blob, columns=["nope"])


def test_datasink_dir_decodes_via_decode_dataset(ray_session, fixture_parquet, tmp_path):
    import ray.data

    from tokcodec.pipelines import decode_dataset
    from tokcodec.sources.sink import TokbDatasink

    out = str(tmp_path / "sink2")
    ray.data.read_parquet(fixture_parquet).write_datasink(TokbDatasink(out))
    # manifests have no 'pid'; decode_dataset must still work
    ds = decode_dataset(out, columns=["doc_id"])
    assert ds.count() == 5000


def test_brute_force_handles_empty_blocks(ray_session):
    import ray.data

    from tokcodec.functions.ann import brute_force_topk

    rng = np.random.default_rng(1)
    m = rng.standard_normal((20, 8)).astype(np.float32)
    offs = np.arange(0, 21 * 8, 8, dtype=np.int32)
    t = pa.table({
        "vec_id": pa.array(range(20), type=pa.int64()),
        "embedding": pa.ListArray.from_arrays(
            pa.array(offs), pa.array(m.reshape(-1), type=pa.float32())
        ),
    })
    # over-partitioned so some blocks may be empty after a filter
    ds = ray.data.from_arrow(t).repartition(8).filter(
        expr="vec_id < 5"
    )
    rows = brute_force_topk(ds, m[:1].astype(np.float64), k=3)
    assert {r["vec_id"] for r in rows} <= set(range(5))
    assert any(r["vec_id"] == 0 for r in rows)
