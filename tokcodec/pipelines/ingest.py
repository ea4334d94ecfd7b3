"""Document ingestion: raw text corpora → tokenized TOKB blocks.

The reference repo's value proposition is reading/writing many record
formats through one schema layer (parquet-avro / parquet-types /
parquet-tensorflow modules); this is the Ray-Data analog for the text
corpus formats an LLM-data pipeline actually receives: JSONL, CSV, and
parquet document tables, all funneled into the north-rule tokenized
schema (doc_id, tokens, n_tok, source) and encoded as TOKB blocks.

One streaming pass, no shuffle: read → tokenize (vectorized
`functions.text.tokenize`, no per-row Python) → `TokbDatasink`.  Each
format maps to the matching `ray.data.read_*` reader so column pruning
and block-parallel reads come from Ray's native datasources.  At 100 TB
the pipeline is read-bound; blocks stream through the object store with
backpressure and the sink writes each encoded block + manifest
atomically.
"""

from __future__ import annotations

import pyarrow as pa


_FORMATS = ("jsonl", "csv", "parquet")


def _reader(fmt: str):
    import ray.data

    return {
        "jsonl": ray.data.read_json,
        "csv": ray.data.read_csv,
        "parquet": ray.data.read_parquet,
    }[fmt]


def ingest_documents(
    input_paths,
    out_dir: str,
    fmt: str = "jsonl",
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    zstd: bool = True,
    batch_size: int | None = None,
):
    """Read a document corpus (`fmt` in jsonl/csv/parquet), tokenize it
    with the deterministic hash-vocabulary tokenizer, and write TOKB
    blocks to `out_dir`.  Returns the sink's _SUCCESS summary
    ({"blocks", "rows", "bytes_out"}) — the pipeline executes exactly
    once (a Dataset.count() here would re-run the whole read+tokenize).

    Documents missing `source_col` get source="unknown"; `id_col` must
    exist (ids are the dedup/lineage key downstream — refuse to invent
    them silently).
    """
    from tokcodec.functions.text import tokenize
    from tokcodec.sources.sink import TokbDatasink

    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    import os

    if os.path.isdir(out_dir):
        stale = [f for f in os.listdir(out_dir) if f.endswith(".tokb")]
        if stale:
            # block names key on executor task ids, which differ between
            # runs — a re-ingest over a used dir would leave the earlier
            # run's extra blocks in place and decode would concatenate
            # both corpora with no error
            raise ValueError(
                f"{out_dir} already holds {len(stale)} block(s) "
                f"(e.g. {stale[0]}); ingest into a fresh directory"
            )
    ds = _reader(fmt)(input_paths)

    names = ds.schema().names
    for col in (id_col, text_col):
        if col not in names:
            raise ValueError(f"input is missing required column {col!r} (has {names})")

    def _tok(batch: pa.Table) -> pa.Table:
        # csv/json readers may surface ids as ints — the north-rule
        # schema wants doc_id:string
        if not pa.types.is_string(batch.schema.field(id_col).type):
            idx = batch.column_names.index(id_col)
            batch = batch.set_column(
                idx, id_col, batch.column(id_col).cast(pa.string())
            )
        return tokenize(batch, text_col=text_col, id_col=id_col, source_col=source_col)

    kw = {"batch_format": "pyarrow"}
    if batch_size is not None:
        kw["batch_size"] = batch_size
    tokenized = ds.map_batches(_tok, **kw)
    tokenized.write_datasink(TokbDatasink(out_dir, zstd=zstd))
    import json
    import os

    with open(os.path.join(out_dir, "_SUCCESS")) as f:
        return json.load(f)
