"""Per-block Bloom filters: no false negatives, bounded false positives,
equality/isin block skipping through the TOKB predicate path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tokcodec.bloom import build_bloom, might_contain


def test_no_false_negatives_strings():
    vals = [f"doc{i:05d}" for i in range(5000)]
    b = build_bloom(pa.array(vals + [None]))
    assert all(might_contain(b, v) for v in vals)


def test_false_positive_rate_bounded():
    b = build_bloom(pa.array([f"doc{i:05d}" for i in range(5000)]))
    fp = sum(might_contain(b, f"absent{i}") for i in range(10000)) / 10000
    assert fp < 0.03  # 10 bits/key, k=6 → ~1% expected


def test_int_blooms_cover_all_widths_and_signs():
    ints = list(range(-2500, 2500))
    for t in (pa.int16(), pa.int32(), pa.int64()):
        b = build_bloom(pa.array(ints, t))
        assert all(might_contain(b, v) for v in ints)
        assert sum(might_contain(b, v) for v in range(10**6, 10**6 + 2000)) < 100


def test_any_hit_equals_or_of_scalar_probes():
    """The vectorized any-hit probe (incdedup shard-file skipping) must
    be EXACTLY the OR of scalar might_contain over the probe set — both
    sides share the same hash pair, so this is an equivalence pin, not
    a statistical bound."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tokcodec.bloom import any_might_contain_ints

    i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)

    @settings(max_examples=60, deadline=None)
    @given(
        members=st.lists(i64, min_size=1, max_size=200, unique=True),
        probes=st.lists(i64, min_size=0, max_size=50),
        pick=st.integers(0, 10**9),
    )
    def _case(members, probes, pick):
        b = build_bloom(pa.array(members, pa.int64()))
        want = any(might_contain(b, v) for v in probes)
        got = any_might_contain_ints(b, pa.array(probes, pa.int64()))
        assert got == want
        # a probe set containing any member can never be skippable
        withmem = probes + [members[pick % len(members)]]
        assert any_might_contain_ints(b, pa.array(withmem, pa.int64()))

    _case()


def test_type_domain_mismatch_is_conservative():
    bs = build_bloom(pa.array(["a", "b"]))
    bi = build_bloom(pa.array([1, 2]))
    assert might_contain(bs, 42) is True
    assert might_contain(bi, "x") is True
    assert might_contain(bs, None) is True
    assert might_contain(bi, True) is True  # bool is not an int probe


def test_unsupported_and_allnull_return_none():
    assert build_bloom(pa.array([1.5, 2.5])) is None
    assert build_bloom(pa.array([None, None], pa.string())) is None
    assert build_bloom(pa.array([], pa.string())) is None


def test_dictionary_and_binary_columns():
    bd = build_bloom(pa.array(["a", "b", "a"]).dictionary_encode())
    assert might_contain(bd, "a") and might_contain(bd, "b")
    bb = build_bloom(pa.array([b"\x00\x01", b"xyz"], pa.binary()))
    assert might_contain(bb, b"\x00\x01") and might_contain(bb, b"xyz")


def test_probe_matches_vectorized_build_exactly():
    """The scalar probe must be value-identical to the vectorized build
    hashes — a drift here silently turns into false negatives."""
    rng = np.random.default_rng(7)
    vals = ["".join(chr(97 + c) for c in rng.integers(0, 26, rng.integers(0, 40))) for _ in range(500)]
    b = build_bloom(pa.array(vals))
    assert all(might_contain(b, v) for v in vals)
    ints = rng.integers(-(2**62), 2**62, 500).tolist()
    bi = build_bloom(pa.array(ints, pa.int64()))
    assert all(might_contain(bi, v) for v in ints)


def test_block_skipping_equality_and_isin():
    """End-to-end: encode blocks with a doc_id bloom, point-lookup skips
    every non-matching block at the header read."""
    from tokcodec.blocks import encode_table, header_stats, read_header
    from tokcodec.predicate import col

    blocks = []
    for part in range(4):
        ids = [f"p{part}_d{i:04d}" for i in range(500)]
        t = pa.table({"doc_id": pa.array(ids), "v": pa.array(range(500), pa.int64())})
        blocks.append(encode_table(t, bloom_cols=["doc_id"]))

    expr = col("doc_id") == "p2_d0123"
    matches = [
        expr.stats_may_match(header_stats(read_header(b))) for b in blocks
    ]
    assert matches[2] is True
    assert sum(matches) <= 2  # others pruned (tiny FP allowance)

    expr2 = col("doc_id").isin(["p0_d0001", "p3_d0002"])
    m2 = [expr2.stats_may_match(header_stats(read_header(b))) for b in blocks]
    assert m2[0] and m2[3]

    # a range predicate still uses min/max, bloom doesn't interfere
    expr3 = col("v") > 1000
    assert not any(
        expr3.stats_may_match(header_stats(read_header(b))) for b in blocks
    )


def test_bloom_roundtrips_decode_unchanged():
    from tokcodec.blocks import decode_table, encode_table

    t = pa.table({"doc_id": pa.array([f"d{i}" for i in range(100)]),
                  "n": pa.array(range(100), pa.int32())})
    back, _ = decode_table(encode_table(t, bloom_cols=["doc_id", "n"]))
    assert back.equals(t)


def test_unknown_bloom_col_fails_fast():
    """A typo'd bloom column must raise, not silently skip — the user
    would believe point lookups are pruned forever."""
    from tokcodec.blocks import encode_table

    t = pa.table({"doc_id": pa.array(["a", "b"])})
    with pytest.raises(ValueError, match="bloom_cols not in table"):
        encode_table(t, bloom_cols=["doc_idd"])


def test_uint64_above_int63_no_crash_no_false_negative():
    """64-bit hash-id columns (the natural bloom use case) must build
    and probe across the full uint64 domain."""
    vals = [2**63 + 5, 2**64 - 1, 7, 0]
    b = build_bloom(pa.array(vals, pa.uint64()))
    assert all(might_contain(b, v) for v in vals)
    assert might_contain(b, 2**70) is True  # beyond any 64-bit domain: no claim
    misses = sum(might_contain(b, v) for v in range(10**6, 10**6 + 2000))
    assert misses < 100


def test_encode_dataset_bloom_prunes_point_lookups(ray_session, fixture_parquet, tmp_path):
    """Planned encode with bloom_cols: a doc_id point lookup skips every
    non-matching block at the header read, and the fingerprint changes
    so resume can't skip re-encoding when blooms are requested later."""
    import pyarrow.parquet as pq

    from tokcodec.pipelines.encode import (
        count_prunable_blocks,
        decode_dataset,
        encode_dataset,
        plan_partitions,
    )
    from tokcodec.predicate import col

    out = str(tmp_path / "enc")
    res = encode_dataset(fixture_parquet, out, target_tokens=1_000_000,
                         bloom_cols=["doc_id"])
    nblocks = len(res["metrics"])
    assert nblocks >= 3

    target = pq.read_table(fixture_parquet, columns=["doc_id"]).column("doc_id")[37].as_py()
    skip, total = count_prunable_blocks(out, col("doc_id") == target)
    assert total == nblocks and skip >= total - 2  # FP allowance

    got = decode_dataset(out, predicate=col("doc_id") == target).to_pandas()
    assert list(got["doc_id"]) == [target]

    # absent id: every block prunes, zero rows decode
    skip2, _ = count_prunable_blocks(out, col("doc_id") == "no_such_doc")
    assert skip2 == total

    # fingerprint covers the bloom config
    p1 = plan_partitions(fixture_parquet, target_tokens=1_000_000)
    p2 = plan_partitions(fixture_parquet, target_tokens=1_000_000, bloom_cols=["doc_id"])
    assert p1["fingerprint"] != p2["fingerprint"]
