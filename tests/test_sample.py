"""Tests for deterministic corpus-mix operators (functions/sample.py):
hash-threshold sampling, stratified splits, per-group mass quotas."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from tokcodec.functions import sample


def _docs_table(n=400, n_groups=4, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "source": pa.array([f"g{i % n_groups}" for i in range(n)]),
            "mass": pa.array(rng.integers(10, 200, n), type=pa.int64()),
        }
    )


def _ds(t):
    import ray.data

    return ray.data.from_arrow(t).repartition(7)


# ------------------------------ hashing -----------------------------------


def test_md5_lower_matches_duckdb():
    import duckdb

    keys = pa.array(["0", "17", "abc", ""])
    mine = sample.md5_lower_u64(keys)
    ref = [
        duckdb.sql(f"SELECT md5_number_lower('{k}')").fetchone()[0]
        for k in keys.to_pylist()
    ]
    assert mine.tolist() == ref
    # and against hashlib directly (last 8 digest bytes, little-endian)
    assert mine[2] == struct.unpack("<Q", hashlib.md5(b"abc").digest()[8:])[0]


def test_key_hash_casts_ints_to_decimal_text():
    ints = pa.array([7, 42], type=pa.int64())
    strs = pa.array(["7", "42"])
    for m in ("fnv", "md5"):
        assert sample.key_hash_u64(ints, m).tolist() == sample.key_hash_u64(strs, m).tolist()


# ------------------------------ sampling ----------------------------------


@pytest.mark.parametrize("method", ["fnv", "md5"])
def test_sample_rate_and_determinism(ray_session, method):
    t = _docs_table(n=2000)
    kept = sample.sample_dataset(_ds(t), 0.3, method=method).take_all()
    frac = len(kept) / 2000
    assert 0.22 < frac < 0.38  # Bernoulli(0.3) at n=2000
    again = sample.sample_dataset(_ds(t), 0.3, method=method).take_all()
    assert sorted(r["doc_id"] for r in kept) == sorted(r["doc_id"] for r in again)


def test_sample_nested_across_rates(ray_session):
    """Threshold sampling gives nested samples: every row kept at a low
    rate is kept at every higher rate (mixture weights can move without
    reshuffling prior selections)."""
    t = _docs_table(n=1000)
    low = {r["doc_id"] for r in sample.sample_dataset(_ds(t), 0.2).take_all()}
    high = {r["doc_id"] for r in sample.sample_dataset(_ds(t), 0.5).take_all()}
    assert low <= high


def test_sample_partition_independent(ray_session):
    import ray.data

    t = _docs_table(n=1000)
    a = {r["doc_id"] for r in sample.sample_dataset(ray.data.from_arrow(t), 0.4).take_all()}
    b = {
        r["doc_id"]
        for r in sample.sample_dataset(ray.data.from_arrow(t).repartition(13), 0.4).take_all()
    }
    assert a == b


# ------------------------------ split -------------------------------------


def test_split_fractions_and_coverage(ray_session):
    t = _docs_table(n=3000)
    out = sample.split_dataset(_ds(t), {"train": 0.8, "val": 0.1, "test": 0.1}).take_all()
    assert len(out) == 3000  # every row labeled exactly once
    counts = {}
    for r in out:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 3000 < 0.85
    assert 0.06 < counts["val"] / 3000 < 0.14


def test_split_last_bucket_takes_remainder(ray_session):
    # fractions that don't float-sum to 1.0 must still label every row
    t = _docs_table(n=500)
    out = sample.split_dataset(_ds(t), {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}).take_all()
    assert len(out) == 500
    assert all(r["split"] in ("a", "b", "c") for r in out)


# ------------------------------ quota -------------------------------------


def _quota_reference(t: pa.Table, budget: int, method: str) -> set[int]:
    """Single-process reference: SUM(mass) OVER (PARTITION BY source
    ORDER BY hash, key) <= budget."""
    u = sample.key_hash_u64(t.column("doc_id"), method)
    key = np.array([str(x) for x in t.column("doc_id").to_pylist()])
    src = np.array(t.column("source").to_pylist())
    mass = t.column("mass").to_numpy()
    kept = set()
    for g in np.unique(src):
        idx = np.where(src == g)[0]
        order = idx[np.lexsort((key[idx], u[idx]))]
        cum = np.cumsum(mass[order])
        kept.update(int(t.column("doc_id")[i].as_py()) for i in order[cum <= budget])
    return kept


@pytest.mark.parametrize("method", ["fnv", "md5"])
def test_quota_matches_reference(ray_session, method):
    t = _docs_table(n=400)
    budget = 3000  # cuts every group roughly in half
    out = sample.group_quota(
        _ds(t), group_col="source", mass_col="mass", budget=budget, method=method
    ).take_all()
    got = {r["doc_id"] for r in out}
    assert got == _quota_reference(t, budget, method)
    # schema: helper columns dropped
    assert set(out[0]) == {"doc_id", "source", "mass"}


def test_quota_budget_exceeds_total_keeps_all(ray_session):
    t = _docs_table(n=100)
    out = sample.group_quota(
        _ds(t), group_col="source", mass_col="mass", budget=10**9
    ).take_all()
    assert len(out) == 100


def test_quota_tiny_budget(ray_session):
    """Budget smaller than any single doc: every group keeps zero or the
    cheapest-by-hash prefix that fits (possibly empty)."""
    t = _docs_table(n=100)
    out = sample.group_quota(
        _ds(t), group_col="source", mass_col="mass", budget=9
    ).take_all()
    assert {r["doc_id"] for r in out} == _quota_reference(t, 9, "fnv")


def test_quota_partition_independent(ray_session):
    import ray.data

    t = _docs_table(n=300)
    a = {
        r["doc_id"]
        for r in sample.group_quota(
            ray.data.from_arrow(t), "source", "mass", 2000
        ).take_all()
    }
    b = {
        r["doc_id"]
        for r in sample.group_quota(
            ray.data.from_arrow(t).repartition(11), "source", "mass", 2000
        ).take_all()
    }
    assert a == b


# ------------------------------ grouped top-k ------------------------------


def _topk_reference(t: pa.Table, k: int) -> list[tuple]:
    import pandas as pd

    df = t.to_pandas().sort_values(
        ["source", "mass", "doc_id"], ascending=[True, False, True]
    )
    df["rank"] = df.groupby("source").cumcount()
    kept = df[df["rank"] < k]
    return sorted(zip(kept["doc_id"], kept["source"], kept["mass"]))


def test_grouped_topk_matches_reference(ray_session):
    t = _docs_table(n=500, n_groups=6)
    out = sample.grouped_topk(
        _ds(t), group_col="source", order_col="mass", k=7, tie_col="doc_id"
    ).take_all()
    got = sorted((r["doc_id"], r["source"], r["mass"]) for r in out)
    assert got == _topk_reference(t, 7)


def test_grouped_topk_skewed_and_small_groups(ray_session):
    # one group holds 90% of rows; another has fewer rows than k
    n = 1000
    src = ["hot"] * 900 + ["mid"] * 97 + ["tiny"] * 3
    t = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "source": pa.array(src),
            "mass": pa.array(
                np.random.default_rng(5).integers(0, 50, n), type=pa.int64()
            ),
        }
    )
    out = sample.grouped_topk(
        _ds(t), group_col="source", order_col="mass", k=10, tie_col="doc_id"
    ).take_all()
    got = sorted((r["doc_id"], r["source"], r["mass"]) for r in out)
    assert got == _topk_reference(t, 10)
    assert sum(1 for r in out if r["source"] == "tiny") == 3  # whole group kept


def test_grouped_topk_ascending(ray_session):
    t = _docs_table(n=300, n_groups=3)
    out = sample.grouped_topk(
        _ds(t), group_col="source", order_col="mass", k=4, tie_col="doc_id",
        descending=False,
    ).take_all()
    import pandas as pd

    df = t.to_pandas().sort_values(
        ["source", "mass", "doc_id"], ascending=[True, True, True]
    )
    df["rank"] = df.groupby("source").cumcount()
    ref = sorted(
        zip(*(df[df["rank"] < 4][c] for c in ("doc_id", "source", "mass")))
    )
    assert sorted((r["doc_id"], r["source"], r["mass"]) for r in out) == ref


# ------------------------------ source mixing ------------------------------


def test_mix_sources_nested_and_exact(ray_session):
    t = _docs_table(n=2000, n_groups=5)  # sources g0..g4
    rates1 = {"g0": 1.0, "g1": 0.3, "g2": 0.1}          # g3/g4 drop
    rates2 = {"g0": 1.0, "g1": 0.6, "g2": 0.1}          # g1 raised
    kept1 = {
        r["doc_id"]
        for r in sample.mix_sources(_ds(t), rates1, key_col="doc_id").take_all()
    }
    kept2 = {
        r["doc_id"]
        for r in sample.mix_sources(_ds(t), rates2, key_col="doc_id").take_all()
    }
    assert kept1 <= kept2  # nested: raising one rate only ADDS rows
    # exact per-row semantics vs scalar reference
    ids = t.column("doc_id").to_pylist()
    srcs = t.column("source").to_pylist()
    hashes = sample.key_hash_u64(t.column("doc_id"), "fnv")
    ref = {
        i
        for i, s, h in zip(ids, srcs, hashes)
        if h < sample.rate_threshold(rates1.get(s, 0.0))
    }
    assert kept1 == ref
    assert not any(s in ("g3", "g4") for i, s in zip(ids, srcs) if i in kept1)


def test_mix_sources_partition_independent(ray_session):
    t = _docs_table(n=1500, n_groups=4)
    rates = {"g0": 0.5, "g1": 0.2, "g2": 0.9, "g3": 0.05}
    a = {r["doc_id"] for r in sample.mix_sources(_ds(t), rates).take_all()}
    import ray.data

    b = {
        r["doc_id"]
        for r in sample.mix_sources(ray.data.from_arrow(t).repartition(2), rates).take_all()
    }
    assert a == b


def test_mix_sources_oversample_rate_clamps_to_keep_all(ray_session):
    # a group rate > 1.0 (an oversample weight) keeps the whole group,
    # as the docstring promises — rate_threshold itself rejects > 1.0
    t = _docs_table(n=1000, n_groups=3)
    kept = {
        r["doc_id"]
        for r in sample.mix_sources(
            _ds(t), {"g0": 1.2, "g1": 0.5}, key_col="doc_id"
        ).take_all()
    }
    ids = t.column("doc_id").to_pylist()
    srcs = t.column("source").to_pylist()
    g0 = {i for i, s in zip(ids, srcs) if s == "g0"}
    assert g0 <= kept  # every g0 row survives
    assert not any(s == "g2" for i, s in zip(ids, srcs) if i in kept)


def test_null_group_and_null_key_rows(ray_session):
    import pyarrow as pa
    import ray.data

    # null group -> default_rate (drop here); null key -> dropped like
    # SQL's hash(NULL) < thr (NULL -> not kept); no crash either way
    t = pa.table(
        {
            "doc_id": pa.array(["a", "b", None, "d"]),
            "source": pa.array(["g0", None, "g0", "g0"]),
        }
    )
    ds = ray.data.from_arrow(t)
    kept = sample.mix_sources(ds, {"g0": 1.0}, key_col="doc_id").take_all()
    ids = {r["doc_id"] for r in kept}
    assert ids == {"a", "d"}  # null-source b and null-key row dropped
    # sample_dataset at rate<1 with a null key must not crash
    out = sample.sample_dataset(ds, 0.5, key_col="doc_id").take_all()
    assert all(r["doc_id"] is not None for r in out)
