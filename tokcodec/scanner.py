"""Schema inference by scanning data: the distributed analog of the
reference's `ExampleScanner` (ExampleScanner.java:11-90).

The reference streams records one-by-one through a mutable scanner that
tracks, per field: the value type (conflict → error), how many records
had ≥1 value, and the max per-record count; then derives repetition
(ExampleScanner.java:69-89):

    REQUIRED  iff every record has exactly 1 value
    OPTIONAL  iff ≤1 value everywhere (some records missing it)
    REPEATED  iff any record has >1 value

Here that becomes the classic Ray Data partial+final aggregate
(SURVEY.md §2 #17): a vectorized per-batch stats pass (`map_batches`)
emits one tiny stats row per block — a mergeable monoid — and the
driver folds them.  Order of first appearance is preserved across
blocks like the reference's insertion-ordered map.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tokcodec.schema import Field, Repetition, Schema, Type

_TYPE_MAP = {
    "int64": Type.INT64,
    "int32": Type.INT64,
    "int16": Type.INT64,
    "int8": Type.INT64,
    "uint32": Type.INT64,
    "float": Type.FLOAT,
    "double": Type.FLOAT,
    "string": Type.BYTES,
    "large_string": Type.BYTES,
    "binary": Type.BYTES,
    "large_binary": Type.BYTES,
}


def _leaf_type(t: pa.DataType) -> Type:
    s = str(t)
    if s not in _TYPE_MAP:
        raise ValueError(f"Unsupported type: {t}")
    return _TYPE_MAP[s]


def batch_stats(batch: pa.Table) -> pa.Table:
    """Per-block partial stats: one row per column (mergeable)."""
    rows = []
    for name in batch.column_names:
        arr = batch.column(name)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        t = arr.type
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            typ = _leaf_type(t.value_type)
            lengths = pc.list_value_length(arr)
            lengths = pc.fill_null(lengths, 0)
            counts = lengths.to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            typ = _leaf_type(t)
            counts = pc.is_valid(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        rows.append(
            {
                "field": name,
                "type": typ.value,
                "rows": len(arr),
                "with_value": int((counts > 0).sum()),
                "max_count": int(counts.max()) if len(counts) else 0,
                "min_count": int(counts.min()) if len(counts) else 1,
            }
        )
    return pa.Table.from_pylist(rows)


def merge_stats(stats_rows: list[dict]) -> Schema:
    """Fold partial stats → Schema; type conflicts error like
    ExampleScanner.java:48-57."""
    order: list[str] = []
    agg: dict[str, dict] = {}
    for r in stats_rows:
        f = r["field"]
        if f not in agg:
            order.append(f)
            agg[f] = dict(r)
            continue
        a = agg[f]
        if a["type"] != r["type"]:
            raise ValueError(
                f"Conflicting types for field {f}: {a['type']} vs {r['type']}"
            )
        a["rows"] += r["rows"]
        a["with_value"] += r["with_value"]
        a["max_count"] = max(a["max_count"], r["max_count"])
        a["min_count"] = min(a["min_count"], r["min_count"])
    fields = []
    for f in order:
        a = agg[f]
        if a["max_count"] > 1:
            rep = Repetition.REPEATED
        elif a["with_value"] == a["rows"] and a["min_count"] >= 1:
            rep = Repetition.REQUIRED
        else:
            rep = Repetition.OPTIONAL
        fields.append(Field(f, Type(a["type"]), rep))
    return Schema(fields, "inferred")


def scan_schema(ds) -> Schema:
    """Infer the reference-style 3-type schema of a Dataset by scanning
    every block (distributed partial stats, driver-side tiny fold)."""
    parts = ds.map_batches(batch_stats, batch_format="pyarrow").take_all()
    if not parts:
        raise ValueError("cannot infer a schema from an empty dataset")
    return merge_stats(parts)


def scan_table(table: pa.Table) -> Schema:
    """Single-table form (unit tests / small inputs)."""
    return merge_stats(batch_stats(table).to_pylist())
