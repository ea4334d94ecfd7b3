"""Ray-native Datasink for TOKB blocks: ``ds.write_datasink(TokbDatasink(dir))``.

The streaming counterpart of the planned `encode_dataset` path — blocks
arrive from the streaming executor with backpressure, each write task
encodes its blocks and writes `part-<task>-<seq>.tokb` + manifest
atomically, and `on_write_complete` drops a `_SUCCESS` summary.  Unlike
the planned path, partition identity follows executor task ids (stable
only per execution), so resume semantics are at-least-once per run
rather than cross-run; use `encode_dataset` when cross-run resume
matters.  This is the analog of the reference's MR output format
(ExampleParquetOutputFormat.java:7-14) in idiomatic Ray Data.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

import pyarrow as pa
from ray.data import Datasink

from tokcodec import manifest as mf
from tokcodec.blocks import encode_table


class TokbDatasink(Datasink):
    """Pass to ``ds.write_datasink(TokbDatasink(dir))``.

    With `schema` (a tokcodec.schema.Schema), every incoming block is
    validated before encoding — the reference writer's schema
    enforcement (ExampleParquetWriter.java:46-52 resolves the schema,
    Schema.java:171-174 checks each record's repetition at write)."""

    def __init__(self, out_dir: str, zstd: bool = True, schema=None,
                 bloom_cols: list[str] | None = None):
        self.out_dir = out_dir
        self.zstd = zstd
        self.schema = schema
        self.bloom_cols = bloom_cols

    def on_write_start(self):
        os.makedirs(self.out_dir, exist_ok=True)

    @property
    def supports_distributed_writes(self) -> bool:
        return True

    @property
    def min_rows_per_write(self):
        return None

    def get_name(self) -> str:
        return "TOKB"

    def write(self, blocks: Iterable, ctx) -> list[dict]:
        out = []
        for seq, block in enumerate(blocks):
            t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
            if t.num_rows == 0:
                continue
            if self.schema is not None:
                self.schema.validate_table(t)  # fail fast, with field context
            name = f"part-{ctx.task_idx:05d}-{seq:03d}"
            blob = encode_table(
                t, meta={"task": ctx.task_idx, "seq": seq}, zstd=self.zstd,
                bloom_cols=self.bloom_cols,
            )
            path = os.path.join(self.out_dir, name + ".tokb")
            mf.atomic_write_bytes(path, blob)
            import hashlib

            man = {
                "block": name + ".tokb",
                "rows": t.num_rows,
                "bytes_out": len(blob),
                "bytes_in": int(t.nbytes),
                # parity with the planned path's manifests: lets sidecar
                # staleness checks (and any integrity audit) use content
                # identity, not just size
                "checksum": hashlib.sha256(blob).hexdigest(),
            }
            mf.atomic_write_json(os.path.join(self.out_dir, name + ".manifest.json"), man)
            out.append(man)
        return out

    def on_write_complete(self, write_result) -> None:
        all_manifests = [m for task in write_result.write_returns for m in task]
        summary = {
            "blocks": len(all_manifests),
            "rows": sum(m["rows"] for m in all_manifests),
            "bytes_out": sum(m["bytes_out"] for m in all_manifests),
        }
        mf.atomic_write_json(os.path.join(self.out_dir, "_SUCCESS"), summary)

    def on_write_failed(self, error: Exception) -> None:
        with open(os.path.join(self.out_dir, "_FAILED"), "w") as f:
            f.write(str(error))


def read_tokb(out_dir: str, columns: list[str] | None = None, predicate=None):
    """Dataset over a TokbDatasink/encode_dataset output dir (streaming
    decode; one task per block file).  `predicate` enables zone-map
    block skipping + residual filtering (see blocks.decode_file).

    Delegates to decode_dataset when the dir carries manifests, so the
    stale-plan / completeness guards apply here too — a raw *.tokb scan
    would silently concatenate leftover blocks from an earlier plan (the
    exact row-duplication case the manifest guard exists for).  Dirs
    without manifests (hand-assembled blocks) fall back to the raw scan."""
    import ray.data

    from tokcodec import manifest as mf
    from tokcodec.blocks import decode_file

    if mf.list_manifests(out_dir):
        from tokcodec.pipelines.encode import decode_dataset

        return decode_dataset(out_dir, columns=columns, predicate=predicate)

    names = sorted(
        n for n in os.listdir(out_dir) if n.endswith(".tokb")
    )
    if not names:
        raise ValueError(f"no .tokb blocks under {out_dir}")
    items = [{"path": os.path.join(out_dir, n)} for n in names]

    def _decode(batch: pa.Table) -> pa.Table:
        tables = []
        for row in batch.to_pylist():
            t, _ = decode_file(row["path"], columns=columns, predicate=predicate)
            tables.append(t)
        return pa.concat_tables(tables)

    return ray.data.from_items(items).map_batches(
        _decode, batch_size=1, batch_format="pyarrow"
    )


def _read_summary(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "_SUCCESS")) as f:
        return json.load(f)
