"""Schema system tests mirroring the reference suites:
builder/serde (SchemaTest.scala:24-59), repetition validation
(Schema.java:95-128), projection fail-fast (ParquetExampleTest.scala:328-338),
and the evolution matrix (ParquetExampleTest.scala:263-326)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tokcodec.schema import Field, Repetition, Schema, Type


def _prim_schema():
    return (
        Schema.new_builder()
        .required("long", Type.INT64)
        .required("float", Type.FLOAT)
        .required("bytes", Type.BYTES)
        .named("primitive")
    )


def test_builder_and_json_roundtrip():
    s = _prim_schema()
    assert Schema.from_json(s.to_json()) == s


def test_duplicate_names_rejected():
    with pytest.raises(ValueError, match="Duplicate"):
        Schema.new_builder().required("x", Type.INT64).optional("x", Type.FLOAT).build()


def test_arrow_roundtrip():
    s = (
        Schema.new_builder()
        .required("r", Type.INT64)
        .optional("o", Type.FLOAT)
        .repeated("l", Type.BYTES)
        .build()
    )
    arrow = s.to_arrow()
    assert arrow.field("r").nullable is False
    assert arrow.field("o").nullable is True
    assert pa.types.is_list(arrow.field("l").type)
    assert Schema.from_arrow(arrow) == s


def test_from_arrow_rejects_nested():
    arrow = pa.schema([("s", pa.struct([("a", pa.int64())]))])
    with pytest.raises(ValueError, match="Only primitive fields"):
        Schema.from_arrow(arrow)


def test_projection_preserves_order_and_fails_fast():
    s = _prim_schema()
    p = s.project({"bytes", "long"})
    assert [f.name for f in p.fields] == ["long", "bytes"]  # file order kept
    with pytest.raises(ValueError, match="Invalid fields"):
        s.project({"long", "nope"})


def test_required_validation():
    s = Schema.new_builder().required("x", Type.INT64).build()
    ok = pa.table({"x": pa.array([1, 2, 3], type=pa.int64())})
    s.validate_table(ok)
    bad = pa.table({"x": pa.array([1, None, 3], type=pa.int64())})
    with pytest.raises(ValueError, match="Required field x has 0 values in row 1"):
        s.validate_table(bad)


def test_optional_validation_allows_nulls():
    s = Schema.new_builder().optional("x", Type.FLOAT).build()
    s.validate_table(pa.table({"x": pa.array([1.0, None], type=pa.float32())}))


def test_repeated_accepts_any_count():
    s = Schema.new_builder().repeated("l", Type.INT64).build()
    s.validate_table(
        pa.table({"l": pa.array([[], [1], [1, 2, 3]], type=pa.list_(pa.int64()))})
    )
    with pytest.raises(ValueError, match="must be a list"):
        s.validate_table(pa.table({"l": pa.array([1, 2], type=pa.int64())}))


# ------------------------- evolution matrix ------------------------------


def _file_tbl():
    return pa.table(
        {"r": pa.array([1, 2, 3], type=pa.int64())},
        schema=pa.schema([pa.field("r", pa.int64(), nullable=False)]),
    )


def test_evolution_widening_ok():
    file_s = Schema.new_builder().required("r", Type.INT64).build()
    t = _file_tbl()
    # required → optional
    opt = Schema.new_builder().optional("r", Type.INT64).build()
    out = opt.read_table(t)
    assert out.column("r").null_count == 0 and out.schema.field("r").nullable
    # required → repeated (values wrapped in single-element lists)
    rep = Schema.new_builder().repeated("r", Type.INT64).build()
    out = rep.read_table(t)
    assert out.column("r").combine_chunks().to_pylist() == [[1], [2], [3]]
    del file_s


def test_evolution_narrowing_fails():
    t = pa.table(
        {"o": pa.array([1, None], type=pa.int64())}
    )  # file schema: optional
    req = Schema.new_builder().required("o", Type.INT64).build()
    with pytest.raises(ValueError, match="narrowing"):
        req.read_table(t)


def test_evolution_new_optional_and_repeated_read_as_absent():
    t = _file_tbl()
    s = (
        Schema.new_builder()
        .required("r", Type.INT64)
        .optional("new_o", Type.FLOAT)
        .repeated("new_l", Type.BYTES)
        .build()
    )
    out = s.read_table(t)
    assert out.column("new_o").null_count == 3
    assert out.column("new_l").combine_chunks().to_pylist() == [[], [], []]


def test_evolution_new_required_fails():
    s = Schema.new_builder().required("r", Type.INT64).required("new_r", Type.INT64).build()
    with pytest.raises(ValueError, match="missing from the file schema"):
        s.read_table(_file_tbl())


def test_evolution_type_change_fails():
    s = Schema.new_builder().required("r", Type.FLOAT).build()
    with pytest.raises(ValueError, match="Incompatible type change"):
        s.read_table(_file_tbl())


def test_optional_to_repeated_wraps_and_skips_nulls():
    t = pa.table({"o": pa.array([1, None, 3], type=pa.int64())})
    rep = Schema.new_builder().repeated("o", Type.INT64).build()
    out = rep.read_table(t)
    assert out.column("o").combine_chunks().to_pylist() == [[1], [], [3]]


def test_check_counts_vectorized_matches_reference_messages():
    with pytest.raises(ValueError, match="Required field f has 2 values"):
        Repetition.REQUIRED.check_counts(np.array([1, 2]), "f")
    with pytest.raises(ValueError, match="Optional field f has 3 values"):
        Repetition.OPTIONAL.check_counts(np.array([0, 1, 3]), "f")
    Repetition.REPEATED.check_counts(np.array([0, 5, 100]), "f")


def test_field_accessors():
    f = Field("x", Type.BYTES, Repetition.OPTIONAL)
    assert f.arrow.type == pa.binary() and f.arrow.nullable
