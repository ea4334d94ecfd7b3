"""tokcodec — a Ray-Data-native per-column lightweight-compression engine.

Built from scratch over `ray.data.Dataset` + zero-copy Arrow batches.
Capability surface mirrors `nevillelyh/parquet-extra` (schema system with
repetition, projection pushdown, predicate pushdown, schema inference,
round-trip encode/decode equality — see SURVEY.md §2) re-expressed in
idiomatic Ray Data, plus the codec engine itself (dictionary, RLE, FSST,
bit-packing, frame-of-reference with auto-selection) that the reference
delegated to parquet-mr internals.

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (driver, bench.py, CLI, test fixture).
"""

__version__ = "0.1.0"

from tokcodec.schema import Schema, Field, Repetition, Type  # noqa: F401
