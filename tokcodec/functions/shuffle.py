"""Deterministic epoch shuffle: seeded, reproducible global ordering for
training-data pipelines.

`ray.data.Dataset.random_shuffle` gives a different order every run —
useless for resumable training (a restarted epoch must replay the SAME
order) and unverifiable.  This operator defines epoch order as

    sort by (hash(seed || '-' || key), key)

which is (a) deterministic given (data, seed), (b) a fresh permutation
per seed/epoch, (c) partition-independent (the hash ignores block
layout), and (d) exactly SQL-expressible in md5 mode, so the driver
oracle checks every row's epoch position.

Ray-Data shape: one `map_batches` adds the seeded hash, one `sort`
(the only shuffle) orders globally, then global positions are assigned
with the same O(blocks) driver-stitch pattern as functions/sessionize.py
and pipelines/pack.py: each sorted block reports (first key, row count),
the driver prefix-sums the counts into per-block bases — O(blocks) rows,
never corpus rows — and a broadcast map lets every block number its own
rows with one `np.arange`.

No reference-repo counterpart; a training/data-loading extra per the
round brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tokcodec.functions.sample import key_hash_u64


def epoch_shuffle(
    ds,
    key_col: str = "doc_id",
    seed: int = 0,
    method: str = "fnv",
    pos_col: str = "epoch_pos",
):
    """Add `pos_col`: the row's 0-based position in the seeded epoch
    order.  `method="md5"` matches DuckDB ``md5_number_lower(CAST(seed
    || '-' || key AS VARCHAR))`` for oracle parity; ``"fnv"`` is the
    vectorized scale path (same algebraic shape, no per-row Python).

    Requires UNIQUE keys (the norm for doc/chunk ids): the sort order,
    the tie-break, and the per-block base map are all keyed by
    (hash, key), so duplicate keys would make positions within the
    duplicate group block-layout-dependent and could collide two
    blocks' base-map tags."""
    import ray

    prefix = f"{seed}-"

    def add_hash(t: pa.Table) -> pa.Table:
        keyed = pc.binary_join_element_wise(
            prefix, pc.cast(t.column(key_col), pa.string()), ""
        )
        h = key_hash_u64(keyed, method)
        return t.append_column("_shuffle_key", pa.array(h, pa.uint64()))

    sorted_ds = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .sort(["_shuffle_key", key_col])
        .materialize()  # consumed twice: block summaries + numbering;
        # stitching relies on batch boundaries == block boundaries
    )

    key_type = ds.schema().base_schema.field(key_col).type

    def block_info(t: pa.Table) -> pa.Table:
        # id0 keeps the key's NATIVE type: the dataset sort tie-breaks on
        # the native key, so a stringified tie-break would order a u64
        # hash collision between two blocks' first rows differently
        # (e.g. '10' < '9') and swap their base offsets
        if t.num_rows == 0:
            return pa.table(
                {"k0": pa.array([], pa.uint64()),
                 "id0": pa.array([], key_type),
                 "n": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "k0": pa.array([t.column("_shuffle_key")[0].as_py()], pa.uint64()),
                "id0": t.column(key_col).combine_chunks().slice(0, 1),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    infos = sorted_ds.map_batches(
        block_info, batch_format="pyarrow", batch_size=None
    ).take_all()  # O(blocks) rows — driver-safe
    # block order == order of each block's first (hash, key); firsts are
    # unique because keys are unique within the sort order
    infos.sort(key=lambda r: (r["k0"], r["id0"]))
    bases: dict = {}
    acc = 0
    for r in infos:
        bases[(r["k0"], r["id0"])] = acc
        acc += int(r["n"])
    bases_ref = ray.put(bases)

    def number(t: pa.Table) -> pa.Table:
        t2 = t.drop_columns(["_shuffle_key"])
        if t.num_rows == 0:
            return t2.append_column(pos_col, pa.array([], pa.int64()))
        b = ray.get(bases_ref)
        k0 = t.column("_shuffle_key")[0].as_py()
        id0 = t.column(key_col)[0].as_py()
        base = b[(k0, id0)]
        pos = np.arange(base, base + t.num_rows, dtype=np.int64)
        return t2.append_column(pos_col, pa.array(pos, pa.int64()))

    return sorted_ds.map_batches(number, batch_format="pyarrow", batch_size=None)
