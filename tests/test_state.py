"""Broadcast helper + stage catalog smoke tests."""

from __future__ import annotations

import pyarrow as pa


def test_broadcast_without_ray():
    from tokcodec.state import Broadcast

    bc = Broadcast.put({"a": 1})
    assert bc.value == {"a": 1}


def test_broadcast_with_ray(ray_session):
    import ray

    from tokcodec.state import Broadcast

    bc = Broadcast.put({"k": [1, 2, 3]})
    assert bc.value == {"k": [1, 2, 3]}

    @ray.remote
    def use(b: Broadcast):
        return b.value["k"][-1]

    assert ray.get(use.remote(bc)) == 3


def test_stage_catalog_importable():
    from tokcodec import stages

    batch = pa.table({"text": ["hello world"], "doc_id": [1]})
    out = stages.add_token_count(batch)
    assert out.column("n_words").to_pylist() == [2]
    assert callable(stages.LangId) and callable(stages.EncodeWorker)
