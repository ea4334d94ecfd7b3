"""TokbDatasink tests: streaming write path + read back."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest


def test_datasink_round_trip(ray_session, fixture_parquet, tmp_path):
    import ray.data

    from tokcodec.sources.sink import TokbDatasink, _read_summary, read_tokb

    out = str(tmp_path / "sink")
    ds = ray.data.read_parquet(fixture_parquet)
    ds.write_datasink(TokbDatasink(out))
    summary = _read_summary(out)
    n = pq.read_metadata(fixture_parquet).num_rows
    assert summary["rows"] == n
    assert os.path.exists(os.path.join(out, "_SUCCESS"))

    back = read_tokb(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = pq.read_table(fixture_parquet).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (back["doc_id"] == orig["doc_id"]).all()
    for a, b in zip(back["tokens"], orig["tokens"]):
        assert (a == b).all()


def test_read_tokb_empty_dir_raises(ray_session, tmp_path):
    import pytest

    from tokcodec.sources.sink import read_tokb

    with pytest.raises(ValueError, match="no .tokb blocks"):
        read_tokb(str(tmp_path))


def test_sink_write_side_schema_validation(ray_session, tmp_path):
    """Malformed tables must fail AT WRITE with field context
    (ExampleParquetWriter.java:46-52 + Schema.java:171-174 semantics),
    not encode silently."""
    import pyarrow as pa
    import ray.data

    from tokcodec.schema import Schema, Type
    from tokcodec.sources.sink import TokbDatasink

    schema = (
        Schema.Builder().required("doc_id", Type.INT64).named("doc")
    )
    bad = pa.table({"doc_id": pa.array([1, None, 3], pa.int64())})
    out = str(tmp_path / "bad")
    with pytest.raises(Exception, match="doc_id"):
        ray.data.from_arrow(bad).write_datasink(TokbDatasink(out, schema=schema))


def test_encode_stream_schema_validation(ray_session):
    import pyarrow as pa
    import ray.data

    from tokcodec.pipelines import encode_stream
    from tokcodec.schema import Schema, Type

    schema = Schema.Builder().required("x", Type.INT64).named("t")
    good = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    assert encode_stream(ray.data.from_arrow(good), schema=schema).count() >= 1
    bad = pa.table({"x": pa.array([1, None, 3], pa.int64())})
    with pytest.raises(Exception, match="x"):
        encode_stream(ray.data.from_arrow(bad), schema=schema).count()


def test_encode_dataset_schema_validation(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokcodec.pipelines import encode_dataset
    from tokcodec.schema import Schema, Type

    src = str(tmp_path / "src.parquet")
    pq.write_table(pa.table({"x": pa.array([1, None, 3], pa.int64())}), src)
    schema = Schema.Builder().required("x", Type.INT64).named("t")
    with pytest.raises(Exception, match="Required field x"):
        encode_dataset(
            src, str(tmp_path / "out"), token_col=None, schema=schema
        )
