"""Deterministic epoch shuffle (functions/shuffle.py): permutation
property, run-to-run and partitioning-independence determinism, seed
sensitivity, md5-mode reference parity."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from tokcodec.functions.shuffle import epoch_shuffle


def _table(n: int) -> pa.Table:
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})


def _positions(ds) -> dict[int, int]:
    return {r["doc_id"]: r["epoch_pos"] for r in ds.take_all()}


def test_positions_are_a_permutation(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_table(3000)).repartition(7)
    pos = _positions(epoch_shuffle(ds, seed=1))
    assert len(pos) == 3000
    assert sorted(pos.values()) == list(range(3000))


def test_deterministic_and_partition_independent(ray_session):
    import ray.data

    a = _positions(epoch_shuffle(ray.data.from_arrow(_table(2000)).repartition(3), seed=5))
    b = _positions(epoch_shuffle(ray.data.from_arrow(_table(2000)).repartition(11), seed=5))
    assert a == b


def test_seed_changes_order(ray_session):
    import ray.data

    a = _positions(epoch_shuffle(ray.data.from_arrow(_table(1000)), seed=1))
    b = _positions(epoch_shuffle(ray.data.from_arrow(_table(1000)), seed=2))
    assert a != b
    # both are full permutations
    assert sorted(a.values()) == sorted(b.values()) == list(range(1000))


def test_md5_mode_matches_reference(ray_session):
    import ray.data

    n, seed = 500, 9
    ds = ray.data.from_arrow(_table(n)).repartition(4)
    pos = _positions(epoch_shuffle(ds, seed=seed, method="md5"))

    def h(i: int) -> int:
        d = hashlib.md5(f"{seed}-{i}".encode()).digest()
        return struct.unpack("<Q", d[8:])[0]

    order = sorted(range(n), key=lambda i: (h(i), i))
    want = {doc: p for p, doc in enumerate(order)}
    assert pos == want
