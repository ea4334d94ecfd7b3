"""Projection / predicate / scanner tests mirroring the reference suites
(ProjectionTest.scala:11-44, PredicateTest.scala:19-222,
ExampleScannerTest.scala:40-108)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from tokcodec.predicate import build, col, read_parquet_filtered
from tokcodec.projection import Projection, project_schema, resolve_path
from tokcodec.scanner import merge_stats, batch_stats, scan_schema, scan_table
from tokcodec.schema import Repetition, Type

# F5-style nested schema (schema.avsc User analog)
USER = pa.schema(
    [
        pa.field("id", pa.int32(), nullable=False),
        pa.field("last_name", pa.string(), nullable=False),
        pa.field("email", pa.string(), nullable=False),
        pa.field(
            "accounts",
            pa.list_(
                pa.struct(
                    [("id", pa.int32()), ("type", pa.string()), ("amount", pa.int32())]
                )
            ),
        ),
        pa.field(
            "address",
            pa.struct([("street1", pa.string()), ("city", pa.string()), ("zip", pa.string())]),
        ),
    ]
)


def _user_table() -> pa.Table:
    return pa.table(
        {
            "id": pa.array([1, 2, 3], type=pa.int32()),
            "last_name": ["a", "b", "c"],
            "email": ["a@x", "b@x", "c@x"],
            "accounts": pa.array(
                [
                    [{"id": 1, "type": "checking", "amount": 10}],
                    [],
                    [{"id": 2, "type": "savings", "amount": 20},
                     {"id": 3, "type": "checking", "amount": 30}],
                ],
                type=USER.field("accounts").type,
            ),
            "address": pa.array(
                [
                    {"street1": "s1", "city": "NY", "zip": "10001"},
                    {"street1": "s2", "city": "SF", "zip": "94xxx"},
                    {"street1": "s3", "city": "LA", "zip": "90xxx"},
                ],
                type=USER.field("address").type,
            ),
        },
        schema=USER,
    )


# ----------------------------- projection --------------------------------


def test_resolve_paths():
    assert resolve_path(USER, "id") == pa.int32()
    assert resolve_path(USER, "address.zip") == pa.string()
    assert resolve_path(USER, "accounts.amount") == pa.int32()
    with pytest.raises(ValueError, match="Invalid field"):
        resolve_path(USER, "nope")
    with pytest.raises(ValueError, match="Invalid field"):
        resolve_path(USER, "address.nope")
    with pytest.raises(ValueError, match="Unsupported type"):
        resolve_path(USER, "id.sub")


def test_project_schema_nested():
    """Projected fields structurally equal the source schema fields
    (ProjectionTest.scala:11-44)."""
    s = project_schema(USER, ["id", "address.zip", "accounts.amount"])
    assert s.names == ["id", "accounts", "address"]  # declaration order kept
    assert s.field("id") == USER.field("id")
    acc = s.field("accounts").type
    assert pa.types.is_list(acc) and acc.value_type.num_fields == 1
    assert acc.value_type.field(0).name == "amount"
    assert s.field("address").type == pa.struct([("zip", pa.string())])


def test_project_table_values():
    t = _user_table()
    out = Projection(["id", "address.zip", "accounts.amount"]).project_table(t)
    assert out.column("address").to_pylist() == [
        {"zip": "10001"}, {"zip": "94xxx"}, {"zip": "90xxx"}
    ]
    assert out.column("accounts").to_pylist() == [
        [{"amount": 10}], [], [{"amount": 20}, {"amount": 30}]
    ]


def test_projection_dataset(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_user_table())
    proj = Projection(["id", "address.city"])
    out = proj.apply(ds).take_all()
    assert out[0]["address"] == {"city": "NY"}
    assert set(out[0].keys()) == {"id", "address"}


def test_projection_top_level_pushdown_columns():
    p = Projection(["id", "address.zip", "address.city"])
    assert p.top_columns == ["id", "address"]


# ----------------------------- predicate ---------------------------------


def _flat_table():
    return pa.table(
        {
            "int_field": pa.array([0, 1, 2, 3, None], type=pa.int32()),
            "long_field": pa.array([10, 20, 30, 40, 50], type=pa.int64()),
            "float_field": pa.array([0.5, 1.5, 2.5, 3.5, 4.5], type=pa.float32()),
            "boolean_field": [True, False, True, False, True],
            "string_field": ["a", "b", "c", "d", "e"],
        }
    )


def test_comparisons_native():
    t = _flat_table()
    assert (col("long_field") > 20).filter_table(t).num_rows == 3
    assert (col("long_field") <= 20).filter_table(t).num_rows == 2
    assert (col("string_field") == "c").filter_table(t).num_rows == 1
    assert (col("string_field") != "c").filter_table(t).num_rows == 4
    assert (col("float_field") < 2.0).filter_table(t).num_rows == 2


def test_logical_ops_and_not():
    t = _flat_table()
    e = (col("long_field") > 10) & (col("long_field") < 40)
    assert e.filter_table(t).num_rows == 2
    e = (col("long_field") == 10) | (col("long_field") == 50)
    assert e.filter_table(t).num_rows == 2
    e = ~(col("long_field") > 10)
    assert e.filter_table(t).num_rows == 1


def test_null_handling():
    t = _flat_table()
    assert (col("int_field") == None).filter_table(t).num_rows == 1  # noqa: E711
    assert (col("int_field") != None).filter_table(t).num_rows == 4  # noqa: E711
    assert col("int_field").is_null().filter_table(t).num_rows == 1


def test_implicit_boolean():
    t = _flat_table()
    assert col("boolean_field").true_().filter_table(t).num_rows == 3
    assert (~col("boolean_field").true_()).filter_table(t).num_rows == 2


def test_operand_flipping():
    """`10 < col` normalizes via Python reflected dunders — the analog of
    the reference's gt/lt flip (Predicate.scala:98-112)."""
    t = _flat_table()
    assert (20 < col("long_field")).filter_table(t).num_rows == 3  # noqa: SIM300
    assert (20 >= col("long_field")).filter_table(t).num_rows == 2  # noqa: SIM300
    # flipped == unflipped
    a = (30 > col("long_field")).filter_table(t)
    b = (col("long_field") < 30).filter_table(t)
    assert a.num_rows == b.num_rows == 2


def test_type_coercion_int_literal_to_float_column():
    t = _flat_table()
    # int literal against float column (PredicateTest.scala:102-134)
    assert (col("float_field") > 2).filter_table(t).num_rows == 3
    # float literal against int column
    assert (col("long_field") > 15.0).filter_table(t).num_rows == 4


def test_dataset_filter_matches_native(tmp_path):
    import pyarrow.parquet as pq

    t = _flat_table()
    p = str(tmp_path / "flat.parquet")
    pq.write_table(t, p)
    e = (col("long_field") > 10) & (col("boolean_field") == True)  # noqa: E712
    pushed = pads.dataset(p).to_table(filter=e.dataset_filter())
    native = e.filter_table(t)
    assert pushed.num_rows == native.num_rows == 2


def test_dual_predicate_build():
    pr = build(col("long_field") >= 30)
    assert pr.native(_flat_table()).num_rows == 3
    assert isinstance(pr.parquet, pads.Expression)


def test_read_parquet_filtered(ray_session, tmp_path):
    import pyarrow.parquet as pq

    t = _flat_table()
    p = str(tmp_path / "flat2.parquet")
    pq.write_table(t, p)
    ds = read_parquet_filtered(p, col("long_field") > 20, columns=["long_field"])
    rows = ds.take_all()
    assert sorted(r["long_field"] for r in rows) == [30, 40, 50]


# ------------------------------ scanner ----------------------------------


def test_scan_required_optional_repeated():
    t = pa.table(
        {
            "req": pa.array([1, 2, 3], type=pa.int64()),
            "opt": pa.array([1.0, None, 3.0], type=pa.float32()),
            "rep": pa.array([[b"a"], [], [b"b", b"c"]], type=pa.list_(pa.binary())),
        }
    )
    s = scan_table(t)
    assert [f.name for f in s.fields] == ["req", "opt", "rep"]
    assert s.fields[0].repetition is Repetition.REQUIRED
    assert s.fields[0].type is Type.INT64
    assert s.fields[1].repetition is Repetition.OPTIONAL
    assert s.fields[1].type is Type.FLOAT
    assert s.fields[2].repetition is Repetition.REPEATED
    assert s.fields[2].type is Type.BYTES


def test_scan_single_value_lists_required():
    # every row exactly one value → REQUIRED even when stored as lists
    t = pa.table({"l": pa.array([[1], [2]], type=pa.list_(pa.int64()))})
    s = scan_table(t)
    assert s.fields[0].repetition is Repetition.REQUIRED


def test_scan_empty_list_means_optional():
    t = pa.table({"l": pa.array([[1], []], type=pa.list_(pa.int64()))})
    assert scan_table(t).fields[0].repetition is Repetition.OPTIONAL


def test_merge_type_conflict_errors():
    a = batch_stats(pa.table({"x": pa.array([1], type=pa.int64())})).to_pylist()
    b = batch_stats(pa.table({"x": pa.array(["s"])})).to_pylist()
    with pytest.raises(ValueError, match="Conflicting types for field x"):
        merge_stats(a + b)


def test_scan_schema_distributed(ray_session):
    import ray.data

    from tokcodec.synth import make_table

    ds = ray.data.from_arrow(make_table(2000, seed=3)).repartition(4)
    s = scan_schema(ds)
    by_name = {f.name: f for f in s.fields}
    assert by_name["tokens"].repetition is Repetition.REPEATED
    assert by_name["doc_id"].repetition is Repetition.REQUIRED
    assert by_name["n_tok"].type is Type.INT64
