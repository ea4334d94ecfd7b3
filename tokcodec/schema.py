"""Three-type schema system with repetition, mirroring the reference's
`Schema` (Schema.java:18-128 in /root/reference/parquet-tensorflow — types
INT64/FLOAT/BYTES; repetitions REQUIRED/OPTIONAL/REPEATED), re-expressed
over Arrow:

    REQUIRED  → non-nullable field of the primitive type
    OPTIONAL  → nullable field
    REPEATED  → list<primitive> (any count, incl. empty)

Because our batches are columnar, repetition is a *vectorized constraint
check* at encode/decode time (the reference checks per record via
``Repetition.checkSize``, Schema.java:96-111 / ExampleConverter.java:79-131),
not a structural type.

Also carries: builder with duplicate-name rejection (Schema.java:208-213),
JSON round-trip (Schema.java:261-273), structural equality via the Arrow
form (Schema.java:283-293), field-set projection that preserves file order
and fails fast on unmatched names (ExampleReadSupport.java:76-90), and the
schema-evolution compatibility matrix (ParquetExampleTest.scala:263-326).
"""

from __future__ import annotations

import enum
import json
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class Type(enum.Enum):
    INT64 = "int64"
    FLOAT = "float"
    BYTES = "bytes"

    @property
    def arrow(self) -> pa.DataType:
        return {
            Type.INT64: pa.int64(),
            Type.FLOAT: pa.float32(),
            Type.BYTES: pa.binary(),
        }[self]


_ARROW_TO_TYPE = {
    pa.int64(): Type.INT64,
    pa.float32(): Type.FLOAT,
    pa.binary(): Type.BYTES,
    # pragmatic widening when reading foreign tables (testdata uses these)
    pa.int32(): Type.INT64,
    pa.float64(): Type.FLOAT,
    pa.string(): Type.BYTES,
    pa.large_string(): Type.BYTES,
    pa.large_binary(): Type.BYTES,
    # narrow ints the scanner (scanner._TYPE_MAP) accepts must round-trip
    # through Schema.from_arrow too, or infer-then-read breaks on the very
    # data the schema was inferred from
    pa.int8(): Type.INT64,
    pa.int16(): Type.INT64,
    pa.uint32(): Type.INT64,
}


class Repetition(enum.Enum):
    REQUIRED = "required"
    OPTIONAL = "optional"
    REPEATED = "repeated"

    def check_counts(self, counts: np.ndarray, field: str) -> None:
        """Vectorized analog of Repetition.checkSize (Schema.java:96-111):
        counts[i] = number of values for this field in row i."""
        if self is Repetition.REQUIRED:
            bad = counts != 1
            if bad.any():
                i = int(np.flatnonzero(bad)[0])
                raise ValueError(
                    f"Required field {field} has {int(counts[i])} values in row {i}"
                )
        elif self is Repetition.OPTIONAL:
            bad = counts > 1
            if bad.any():
                i = int(np.flatnonzero(bad)[0])
                raise ValueError(
                    f"Optional field {field} has {int(counts[i])} values in row {i}"
                )
        # REPEATED: any count is fine (Schema.java:108-111)


@dataclass(frozen=True)
class Field:
    name: str
    type: Type
    repetition: Repetition

    @property
    def arrow(self) -> pa.Field:
        if self.repetition is Repetition.REPEATED:
            return pa.field(self.name, pa.list_(self.type.arrow), nullable=False)
        return pa.field(
            self.name, self.type.arrow, nullable=self.repetition is Repetition.OPTIONAL
        )


class Schema:
    def __init__(self, fields: list[Field], name: str = "schema"):
        names = [f.name for f in fields]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            # mirrors duplicate-name rejection, Schema.java:208-213
            raise ValueError(f"Duplicate field names: {sorted(dupes)}")
        self.fields = list(fields)
        self.name = name
        self._by_name = {f.name: f for f in fields}

    # ------------------------------------------------------------ builder --
    class Builder:
        def __init__(self, name: str = "schema"):
            self._fields: list[Field] = []
            self._name = name

        def required(self, name: str, type: Type) -> "Schema.Builder":
            self._fields.append(Field(name, type, Repetition.REQUIRED))
            return self

        def optional(self, name: str, type: Type) -> "Schema.Builder":
            self._fields.append(Field(name, type, Repetition.OPTIONAL))
            return self

        def repeated(self, name: str, type: Type) -> "Schema.Builder":
            self._fields.append(Field(name, type, Repetition.REPEATED))
            return self

        def named(self, name: str) -> "Schema":
            return Schema(self._fields, name)

        def build(self) -> "Schema":
            return Schema(self._fields, self._name)

    @staticmethod
    def new_builder(name: str = "schema") -> "Schema.Builder":
        return Schema.Builder(name)

    # ------------------------------------------------------------- serde --
    def to_json(self) -> str:
        return json.dumps(
            {
                "name": self.name,
                "fields": [
                    {"name": f.name, "type": f.type.value, "repetition": f.repetition.value}
                    for f in self.fields
                ],
            }
        )

    @staticmethod
    def from_json(s: str) -> "Schema":
        d = json.loads(s)
        return Schema(
            [
                Field(f["name"], Type(f["type"]), Repetition(f["repetition"]))
                for f in d["fields"]
            ],
            d.get("name", "schema"),
        )

    def to_arrow(self) -> pa.Schema:
        return pa.schema([f.arrow for f in self.fields])

    @staticmethod
    def from_arrow(s: pa.Schema, name: str = "schema") -> "Schema":
        fields = []
        for f in s:
            t = f.type
            if pa.types.is_list(t) or pa.types.is_large_list(t):
                vt = t.value_type
                if vt not in _ARROW_TO_TYPE:
                    raise ValueError(f"Only primitive fields are supported: {f.name}")
                fields.append(Field(f.name, _ARROW_TO_TYPE[vt], Repetition.REPEATED))
            elif t in _ARROW_TO_TYPE:
                rep = Repetition.OPTIONAL if f.nullable else Repetition.REQUIRED
                fields.append(Field(f.name, _ARROW_TO_TYPE[t], rep))
            else:
                # mirrors Field.fromParquet's rejection, Schema.java:163-169
                raise ValueError(f"Only primitive fields are supported: {f.name}")
        return Schema(fields, name)

    # --------------------------------------------------------- equality --
    def __eq__(self, other) -> bool:  # structural, via the Arrow form
        return isinstance(other, Schema) and self.to_arrow() == other.to_arrow()

    def __hash__(self) -> int:
        return hash(str(self.to_arrow()))

    def __repr__(self) -> str:
        return f"Schema({self.name}, {self.fields})"

    # ------------------------------------------------------- projection --
    def project(self, field_names: list[str] | set[str]) -> "Schema":
        """Keep file field order; fail on unmatched names
        (ExampleReadSupport.java:76-90)."""
        want = set(field_names)
        kept = [f for f in self.fields if f.name in want]
        missing = want - {f.name for f in kept}
        if missing:
            raise ValueError(f"Invalid fields: {sorted(missing)}")
        return Schema(kept, self.name)

    # ------------------------------------------------------- validation --
    def validate_table(self, table: pa.Table) -> None:
        """Encode-time repetition validation, vectorized
        (analog of Type.write → repetition.checkSize, Schema.java:171-174)."""
        for f in self.fields:
            if f.name not in table.column_names:
                raise ValueError(f"Missing field {f.name}")
            col = table.column(f.name)
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            if f.repetition is Repetition.REPEATED:
                if not (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)):
                    raise ValueError(f"Repeated field {f.name} must be a list column")
                vt = arr.type.value_type
                if _ARROW_TO_TYPE.get(vt) is not f.type:
                    raise ValueError(
                        f"Repeated field {f.name} expects {f.type.name} values, "
                        f"got list<{vt}>"
                    )
            else:
                # a list column for a non-repeated field is a repetition
                # violation (>1 value per row), not just a type mismatch —
                # the reference rejects this at write via checkSize
                if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
                    raise ValueError(
                        f"{f.repetition.value} field {f.name} must hold one "
                        f"value per row, got a list column"
                    )
                if _ARROW_TO_TYPE.get(arr.type) is not f.type:
                    raise ValueError(
                        f"Field {f.name} expects {f.type.name}, got {arr.type}"
                    )
                counts = pc.is_valid(arr).to_numpy(zero_copy_only=False).astype(np.int64)
                f.repetition.check_counts(counts, f.name)

    def check_read_compat(self, read_schema: "Schema") -> None:
        """Schema-evolution matrix (ParquetExampleTest.scala:263-326):
        self = file schema, read_schema = requested schema.

        - same type + widening repetition (required→optional→repeated): OK
        - narrowing repetition: error
        - field only in read schema: OK iff optional/repeated (absent →
          null/empty); required: error
        - type change: error
        """
        order = {Repetition.REQUIRED: 0, Repetition.OPTIONAL: 1, Repetition.REPEATED: 2}
        for rf in read_schema.fields:
            ff = self._by_name.get(rf.name)
            if ff is None:
                if rf.repetition is Repetition.REQUIRED:
                    raise ValueError(
                        f"Required field {rf.name} is missing from the file schema"
                    )
                continue
            if ff.type is not rf.type:
                raise ValueError(
                    f"Incompatible type change for field {rf.name}: "
                    f"{ff.type.value} -> {rf.type.value}"
                )
            if order[rf.repetition] < order[ff.repetition]:
                raise ValueError(
                    f"Incompatible repetition narrowing for field {rf.name}: "
                    f"{ff.repetition.value} -> {rf.repetition.value}"
                )

    def read_table(self, table: pa.Table) -> pa.Table:
        """Apply this schema as a *read schema* to a decoded table whose own
        schema may differ (evolution): validates compatibility, projects,
        widens repetition, and materializes absent optional/repeated fields
        as nulls / empty lists."""
        file_schema = Schema.from_arrow(table.schema)
        file_schema.check_read_compat(self)
        n = table.num_rows
        cols = []
        for rf in self.fields:
            if rf.name in table.column_names:
                col = table.column(rf.name)
                arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                target = rf.arrow
                if arr.type != target.type:
                    if rf.repetition is Repetition.REPEATED and not (
                        pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)
                    ):
                        # required/optional → repeated widening: wrap scalars
                        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
                        lengths = valid.astype(np.int32)
                        offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int32)
                        values = arr.drop_null().cast(rf.type.arrow)
                        arr = pa.ListArray.from_arrays(pa.array(offsets), values)
                    else:
                        arr = arr.cast(target.type)
                cols.append(arr)
            else:
                if rf.repetition is Repetition.OPTIONAL:
                    cols.append(pa.nulls(n, rf.type.arrow))
                else:  # REPEATED → empty lists
                    offsets = pa.array(np.zeros(n + 1, dtype=np.int32))
                    cols.append(
                        pa.ListArray.from_arrays(offsets, pa.array([], type=rf.type.arrow))
                    )
        return pa.Table.from_arrays(cols, schema=self.to_arrow())
