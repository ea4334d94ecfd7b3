"""TokbDatasink tests: streaming write path + read back."""

from __future__ import annotations

import os

import pyarrow.parquet as pq


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
