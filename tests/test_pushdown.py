"""TOKB zone-map predicate pushdown + nested predicate paths
(VERDICT round-1 items 5 and 6; mirrors the reference reader's
FilterPredicate-over-row-group-stats role, ExampleReadSupport.java:55-74,
and Common.scala:26-52 nested getter chains)."""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tokcodec.blocks import (
    column_stats,
    decode_file,
    encode_table,
    header_stats,
    read_header,
    read_header_file,
)
from tokcodec.predicate import col


@pytest.fixture(scope="module")
def stats_table():
    return pa.table(
        {
            "i": pa.array([1, 2, 3, None], pa.int64()),
            "f": pa.array([1.5, 2.5, None, 0.5], pa.float64()),
            "s": pa.array(["b", "a", "c", None]),
            "ts": pa.array(
                [
                    datetime.datetime(1995, 1, 1),
                    datetime.datetime(1996, 6, 1),
                    None,
                    datetime.datetime(1994, 3, 2),
                ],
                pa.timestamp("us"),
            ),
            "allnull": pa.array([None] * 4, pa.int64()),
            "lst": pa.array([[1], [2], [3], [4]], pa.list_(pa.int64())),
        }
    )


def test_block_header_carries_stats(stats_table):
    st = header_stats(read_header(encode_table(stats_table)))
    assert st["i"] == {"nulls": 1, "n": 4, "min": 1, "max": 3}
    assert st["allnull"] == {"nulls": 4, "n": 4}
    assert "lst" not in st  # non-orderable: no stats
    assert st["ts"]["min"] == datetime.datetime(1994, 3, 2)  # serde round-trip
    assert st["s"] == {"nulls": 1, "n": 4, "min": "a", "max": "c"}


def test_zone_map_semantics(stats_table):
    st = header_stats(read_header(encode_table(stats_table)))
    assert (col("i") > 2).stats_may_match(st)
    assert not (col("i") > 3).stats_may_match(st)
    assert not (col("i") < 1).stats_may_match(st)
    assert (col("i") == 2).stats_may_match(st)
    assert not (col("i") == 9).stats_may_match(st)
    assert not (col("allnull") == 5).stats_may_match(st)  # all-null: no cmp match
    assert col("allnull").is_null().stats_may_match(st)
    assert not col("allnull").is_valid().stats_may_match(st)
    assert (col("ts") < datetime.datetime(1995, 1, 1)).stats_may_match(st)
    assert not (col("ts") > datetime.datetime(1997, 1, 1)).stats_may_match(st)
    assert (col("s").isin(["a", "zz"])).stats_may_match(st)
    assert not (col("s").isin(["zz"])).stats_may_match(st)
    assert not ((col("i") > 3) & (col("f") > 0)).stats_may_match(st)
    assert ((col("i") > 3) | (col("f") > 0)).stats_may_match(st)
    assert (~(col("i") > 99)).stats_may_match(st)  # NOT: conservative
    assert (col("nope") == 5).stats_may_match(st)  # unknown column
    assert (col("i") > "zzz").stats_may_match(st)  # incomparable literal


def test_nan_column_gets_no_minmax():
    t = pa.table({"f": pa.array([float("nan"), 1.0])})
    s = column_stats(t.column("f").combine_chunks())
    assert "min" not in s  # NaN poisons ordering: no pruning claims


def test_decode_file_skips_and_filters(tmp_path):
    lo = pa.table({"x": pa.array(range(0, 100), pa.int64())})
    hi = pa.table({"x": pa.array(range(1000, 1100), pa.int64())})
    p_lo, p_hi = str(tmp_path / "lo.tokb"), str(tmp_path / "hi.tokb")
    open(p_lo, "wb").write(encode_table(lo))
    open(p_hi, "wb").write(encode_table(hi))
    e = col("x") >= 1050
    t, _ = decode_file(p_lo, predicate=e)
    assert t.num_rows == 0 and t.schema.names == ["x"]  # skipped, schema kept
    t, _ = decode_file(p_hi, predicate=e)
    assert t.column("x").to_pylist() == list(range(1050, 1100))  # residual filter


def test_decode_dataset_pruned_equals_full_filter(ray_session, tmp_path):
    from tokcodec.pipelines.encode import (
        count_prunable_blocks,
        decode_dataset,
        encode_dataset,
    )

    src = str(tmp_path / "sorted.parquet")
    n = 10_000
    t = pa.table(
        {
            "k": pa.array(np.arange(n), pa.int64()),
            "v": pa.array(np.arange(n) % 7, pa.int64()),
        }
    )
    pq.write_table(t, src, row_group_size=500)
    out = str(tmp_path / "enc")
    encode_dataset(src, out, target_tokens=1000, token_col=None)
    e = col("k") >= 9000
    skipped, total = count_prunable_blocks(out, e)
    assert total >= 5 and skipped > 0  # real block skipping
    pruned = decode_dataset(out, predicate=e).to_pandas().sort_values("k")
    full = decode_dataset(out).to_pandas()
    want = full[full["k"] >= 9000].sort_values("k")
    assert pruned.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_read_tokb_predicate(ray_session, tmp_path):
    import ray.data

    from tokcodec.sources.sink import TokbDatasink, read_tokb

    t = pa.table({"k": pa.array(range(1000), pa.int64())})
    out = str(tmp_path / "sink")
    ray.data.from_arrow(t).repartition(4).write_datasink(TokbDatasink(out))
    got = read_tokb(out, predicate=col("k") < 10).to_pandas()
    assert sorted(got["k"]) == list(range(10))


# ------------------------------------------------ nested predicate paths ----


@pytest.fixture()
def nested_table():
    return pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "addr": pa.array(
                [
                    {"zip": 10, "city": "x"},
                    {"zip": 20, "city": "y"},
                    {"zip": 30, "city": "z"},
                ]
            ),
        }
    )


def test_nested_predicate_residual(nested_table):
    assert (col("addr.zip") >= 20).filter_table(nested_table).column(
        "id"
    ).to_pylist() == [2, 3]
    e = (col("addr.city") == "x") | (col("addr.zip") == 30)
    assert e.filter_table(nested_table).column("id").to_pylist() == [1, 3]
    assert (~(col("addr.zip") > 10)).filter_table(nested_table).column(
        "id"
    ).to_pylist() == [1]


def test_nested_predicate_pushdown_form(nested_table):
    expr = (col("addr.zip") >= 20).dataset_filter()
    import pyarrow.dataset as pads

    got = pads.dataset(nested_table).to_table(filter=expr)
    assert got.column("id").to_pylist() == [2, 3]


def test_nested_non_struct_traversal_errors(nested_table):
    with pytest.raises(TypeError, match="non-struct"):
        (col("id.x") == 1).filter_table(nested_table)


def test_nested_missing_field_errors(nested_table):
    with pytest.raises(KeyError):
        (col("addr.nope") == 1).filter_table(nested_table)
    with pytest.raises(KeyError, match="Invalid fields"):
        (col("nope.zip") == 1).filter_table(nested_table)


def test_nested_column_vs_column(nested_table):
    t = nested_table.append_column("zip2", pa.array([10, 25, 30], pa.int64()))
    got = (col("addr.zip") == col("zip2")).filter_table(t)
    assert got.column("id").to_pylist() == [1, 3]


# --------------------------- round-2 code-review regression fixes ----


def test_nan_block_not_pruned():
    """A NaN-bearing float column publishes no min/max, but that must
    mean 'no claim', NOT 'all null' — comparison predicates must keep
    the block and let the residual filter decide."""
    t = pa.table({"f": pa.array([1.0, float("nan"), 2.0], pa.float64())})
    st = header_stats(read_header(encode_table(t)))
    e = col("f") == 1.0
    assert e.stats_may_match(st)  # was wrongly False (silent data loss)
    assert col("f").isin([2.0]).stats_may_match(st)
    # truly all-null still prunes comparisons
    t2 = pa.table({"f": pa.array([None, None], pa.float64())})
    st2 = header_stats(read_header(encode_table(t2)))
    assert not (col("f") == 1.0).stats_may_match(st2)


def test_word_spans_on_sliced_array():
    from tokcodec.functions.text import split_words

    arr = pa.array(["hello world", "foo bar", "baz qux", "last doc"])
    flat, doc_idx, n = split_words(arr.slice(1, 2))
    assert n == 2
    assert flat.to_pylist() == ["foo", "bar", "baz", "qux"]
    assert doc_idx.tolist() == [0, 0, 1, 1]


def test_decode_file_predicate_outside_projection(tmp_path):
    """Filtering on a column excluded from the projection decodes that
    column for the filter, then drops it — pruned and surviving blocks
    return the same schema."""
    lo = pa.table({"a": pa.array([1, 2]), "b": pa.array([10, 20])})
    hi = pa.table({"a": pa.array([3, 4]), "b": pa.array([100, 200])})
    p_lo, p_hi = str(tmp_path / "lo.tokb"), str(tmp_path / "hi.tokb")
    open(p_lo, "wb").write(encode_table(lo))
    open(p_hi, "wb").write(encode_table(hi))
    e = col("b") > 20
    t1, _ = decode_file(p_lo, columns=["a"], predicate=e)  # zone-pruned
    t2, _ = decode_file(p_hi, columns=["a"], predicate=e)  # survives
    assert t1.schema.names == ["a"] and t1.num_rows == 0
    assert t2.schema.names == ["a"] and t2.column("a").to_pylist() == [3, 4]


def test_string_stats_truncated_and_sound():
    from tokcodec.blocks import _STR_STAT_MAX

    big_lo = "a" * 5000
    big_hi = "z" * 5000 + "tail"
    t = pa.table({"s": pa.array([big_lo, "mmm", big_hi])})
    header = read_header(encode_table(t))
    assert len(__import__("json").dumps(header)) < 20_000  # bounded header
    st = header_stats(header)
    s = st["s"]
    assert len(s["min"]) <= _STR_STAT_MAX
    assert len(s["max"]) <= _STR_STAT_MAX
    # bounds remain SOUND: min <= every value <= max
    assert s["min"] <= big_lo and s["min"] <= "mmm"
    assert big_hi <= s["max"] and "mmm" <= s["max"]
    # and pruning decisions using them stay conservative
    assert (col("s") == "mmm").stats_may_match(st)
    assert (col("s") == big_hi).stats_may_match(st)
    assert not (col("s") == chr(0x10FFFF) * 3).stats_may_match(st)


def test_window_events_null_ts(ray_session):
    import ray.data

    from tokcodec.pipelines.queries import window_events  # noqa: F401  (shape only)

    # exercise the add_win body via a dataset with a null timestamp
    import datetime

    t = pa.table(
        {
            "event_type": pa.array(["a", "a", "b"]),
            "ts": pa.array(
                [datetime.datetime(2020, 1, 1), None, datetime.datetime(1960, 1, 1)],
                pa.timestamp("us"),
            ),
        }
    )
    import pyarrow.parquet as pq_

    import tempfile, os

    d = tempfile.mkdtemp()
    pq_.write_table(t, os.path.join(d, "events.parquet"))
    out = window_events(d).to_pandas()
    # 3 groups: (a, win2020), (a, NULL), (b, negative win floored toward -inf)
    assert len(out) == 3
    neg = out[out["event_type"] == "b"]["win"].iloc[0]
    assert neg == (int(datetime.datetime(1960, 1, 1).timestamp() * 1e6) // 3_600_000_000)
    assert out["win"].isna().sum() == 1


# ---------------------- nested zone maps + child-only decode (r3) ----------


def _nested_table(lo: int, hi: int, with_nulls: bool = False) -> pa.Table:
    n = hi - lo
    inner = pa.StructArray.from_arrays(
        [pa.array([float(i) for i in range(lo, hi)], pa.float64())],
        names=["score"],
    )
    mask = pa.array([with_nulls and i % 5 == 0 for i in range(n)])
    meta = pa.StructArray.from_arrays(
        [
            pa.array(range(lo, hi), pa.int64()),
            pa.array([f"s{i % 3}" for i in range(lo, hi)]),
            inner,
        ],
        names=["size", "src", "inner"],
        mask=mask if with_nulls else None,
    )
    return pa.table(
        {"doc_id": pa.array(range(lo, hi), pa.int64()), "meta": meta}
    )


def test_nested_struct_child_stats_in_header():
    st = header_stats(read_header(encode_table(_nested_table(10, 60))))
    assert st["meta.size"] == {"nulls": 0, "n": 50, "min": 10, "max": 59}
    assert st["meta.src"]["min"] == "s0" and st["meta.src"]["max"] == "s2"
    assert st["meta.inner.score"]["max"] == 59.0


def test_nested_child_stats_count_parent_nulls():
    st = header_stats(read_header(encode_table(_nested_table(0, 10, with_nulls=True))))
    # rows 0 and 5 have a NULL parent struct: the child sees those as null
    assert st["meta.size"]["nulls"] == 2
    assert st["meta.size"]["min"] == 1 and st["meta.size"]["max"] == 9


def test_nested_zone_map_prunes_blocks(tmp_path):
    from tokcodec.predicate import col as c

    p_lo = str(tmp_path / "lo.tokb")
    p_hi = str(tmp_path / "hi.tokb")
    open(p_lo, "wb").write(encode_table(_nested_table(0, 100)))
    open(p_hi, "wb").write(encode_table(_nested_table(1000, 1100)))
    e = c("meta.size") >= 1050
    t, _ = decode_file(p_lo, predicate=e)
    assert t.num_rows == 0 and t.schema.names == ["doc_id", "meta"]
    t, _ = decode_file(p_hi, predicate=e)
    assert t.num_rows == 50
    assert t.column("meta").combine_chunks().field("size").to_pylist() == list(
        range(1050, 1100)
    )
    # pruned-projection form: skipped block returns the PRUNED schema
    t, _ = decode_file(p_lo, columns=["meta.size"], predicate=e)
    assert t.num_rows == 0
    assert t.schema.field("meta").type == pa.struct([pa.field("size", pa.int64())])


def test_nested_decode_child_only_never_touches_siblings():
    """columns=["meta.size"] must not read the sibling child's payload:
    corrupting meta.src's segments leaves the size-only decode intact."""
    from tokcodec.blocks import MAGIC, decode_table

    t = _nested_table(0, 50)
    blob = bytearray(encode_table(t, zstd=False))
    header = read_header(bytes(blob))
    hlen = int.from_bytes(blob[len(MAGIC) : len(MAGIC) + 8], "little")
    base = len(MAGIC) + 8 + hlen
    meta_spec = next(c for c in header["columns"] if c["name"] == "meta")

    def seg_ids(node):
        out = list(node["ps"])
        for ch in node["k"].values():
            out += seg_ids(ch)
        return out

    for sid in seg_ids(meta_spec["enc"]["k"]["f1"]):  # f1 == src
        s = header["segments"][sid]
        for j in range(s["o"], s["o"] + s["l"]):
            blob[base + j] ^= 0xFF
    got, _ = decode_table(bytes(blob), columns=["doc_id", "meta.size"])
    assert got.column("doc_id").to_pylist() == list(range(50))
    assert got.column("meta").combine_chunks().field("size").to_pylist() == list(
        range(50)
    )
    assert got.schema.field("meta").type == pa.struct([pa.field("size", pa.int64())])
    # whereas decoding the corrupted child itself must NOT silently match
    try:
        full, _ = decode_table(bytes(blob), columns=["meta.src"])
        vals = full.column("meta").combine_chunks().field("src").to_pylist()
        assert vals != t.column("meta").combine_chunks().field("src").to_pylist()
    except Exception:
        pass  # raising on corrupt payload is equally acceptable


def test_nested_decode_full_absorbs_child_request():
    t = _nested_table(0, 20, with_nulls=True)
    blob = encode_table(t)
    from tokcodec.blocks import decode_table

    got, _ = decode_table(blob, columns=["meta.size", "meta"])
    assert got.column("meta").combine_chunks().equals(
        t.column("meta").combine_chunks()
    )  # full column wins, parent validity intact
    got2, _ = decode_table(blob, columns=["meta.inner.score"])
    sc = got2.column("meta").combine_chunks()
    assert sc.type == pa.struct(
        [pa.field("inner", pa.struct([pa.field("score", pa.float64())]))]
    )
    assert sc.is_null().to_pylist() == t.column("meta").combine_chunks().is_null().to_pylist()


def test_nested_decode_bad_child_path_fails_fast():
    blob = encode_table(_nested_table(0, 5))
    from tokcodec.blocks import decode_table

    with pytest.raises(ValueError):
        decode_table(blob, columns=["meta.nope"])
    with pytest.raises(ValueError):
        decode_table(blob, columns=["doc_id.x"])


def test_decode_file_nested_projection_with_sibling_predicate(tmp_path):
    """Predicate on meta.src while projecting meta.size: the filter
    column is widened in, then the output re-projects to just size."""
    from tokcodec.predicate import col as c

    p = str(tmp_path / "b.tokb")
    open(p, "wb").write(encode_table(_nested_table(0, 30)))
    t, _ = decode_file(p, columns=["doc_id", "meta.size"], predicate=c("meta.src") == "s1")
    assert t.column("doc_id").to_pylist() == [i for i in range(30) if i % 3 == 1]
    assert t.schema.field("meta").type == pa.struct([pa.field("size", pa.int64())])
