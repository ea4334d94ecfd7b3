"""Join operators Ray Data's Dataset API lacks, built as compositions
(the brief's custom-operator tier (a): map_batches + union +
groupby().map_groups — one hash exchange, no driver-side state).

`asof_join`: for each left row, match the single right row with the
same key and the greatest right timestamp <= the left timestamp
(direction='backward') — the event-to-latest-state join every
training-data/session pipeline needs.  Partitioning assumption: rows
co-locate by the join KEY (the groupby's hash exchange provides it);
each key group must fit one worker's heap — at 100 TB salt hot keys by
time range first.

Group frames use batch_format="pyarrow" throughout: payload columns
keep their exact Arrow types (a pandas group frame would promote
nullable int64 to float64, corrupting ids >= 2^53).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _tag_sides(left, right, left_key, right_key, left_ts, right_ts, left_cols):
    """Project both sides to one (k, t, side, l_<payload>...) schema —
    payload columns carry their LEFT-side Arrow types on both sides (the
    right side holds typed nulls) — and union them."""
    lsch = left.schema()
    types = dict(zip(lsch.names, lsch.types))

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {
            "k": pc.cast(batch.column(left_key), pa.int64()),
            "t": pc.cast(batch.column(left_ts), pa.int64()),
            "side": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
        }
        for c in left_cols:
            cols[f"l_{c}"] = batch.column(c)
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {
            "k": pc.cast(batch.column(right_key), pa.int64()),
            "t": pc.cast(batch.column(right_ts), pa.int64()),
            "side": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
        }
        for c in left_cols:
            cols[f"l_{c}"] = pa.nulls(batch.num_rows, type=types[c])
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    return lt.union(rt), types


def _split_sides(g: pa.Table) -> tuple[pa.Table, pa.Table]:
    side = g.column("side")
    return g.filter(pc.equal(side, 1)), g.filter(pc.equal(side, 0))


def _empty_result(types: dict, left_cols: list[str], extra: str, extra_type) -> pa.Table:
    cols = {c: pa.nulls(0, type=types[c]) for c in left_cols}
    cols[extra] = pa.nulls(0, type=extra_type)
    return pa.table(cols)


def asof_join(
    left,
    right,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    out_ts: str = "asof_ts",
):
    """Backward as-of join (inner): rows of `left` that have a right
    match emit `left_cols` + `out_ts` (the matched right timestamp,
    timestamp[us]).  Semantics match DuckDB's
    ``ASOF JOIN right ON left_key = right_key AND right_ts <= left_ts``.

    Composition: both sides project to a common (key, t, side, payload)
    schema, union, ONE groupby(key) hash exchange, then a vectorized
    sorted-merge (np.searchsorted) per key group.
    """
    tagged, types = _tag_sides(
        left, right, left_key, right_key, left_ts, right_ts, left_cols
    )

    def merge(g: pa.Table) -> pa.Table:
        le, ri = _split_sides(g)
        if le.num_rows == 0 or ri.num_rows == 0:
            return _empty_result(types, left_cols, out_ts, pa.timestamp("us"))
        rts = np.sort(ri.column("t").to_numpy(zero_copy_only=False))
        lts = le.column("t").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(rts, lts, side="right") - 1
        ok = idx >= 0
        if not ok.any():
            return _empty_result(types, left_cols, out_ts, pa.timestamp("us"))
        sel = pa.array(ok)
        cols = {c: le.column(f"l_{c}").filter(sel) for c in left_cols}
        cols[out_ts] = pa.array(rts[idx[ok]], type=pa.int64()).cast(
            pa.timestamp("us")
        )
        return pa.table(cols)

    return tagged.groupby("k").map_groups(merge, batch_format="pyarrow")


def band_join_count(
    left,
    right,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    lo_offset_us: int,
    hi_offset_us: int,
    out: str = "n",
):
    """Band (range) join, aggregated: for each left row, the COUNT of
    right rows with the same key and right_ts in
    ``[left_ts + lo_offset, left_ts + hi_offset]`` (inclusive); rows
    with zero matches are dropped (inner semantics).  Same co-group
    composition as asof_join — one hash exchange, per-group vectorized
    interval counting via two searchsorted passes."""
    tagged, types = _tag_sides(
        left, right, left_key, right_key, left_ts, right_ts, left_cols
    )

    def merge(g: pa.Table) -> pa.Table:
        le, ri = _split_sides(g)
        if le.num_rows == 0 or ri.num_rows == 0:
            return _empty_result(types, left_cols, out, pa.int64())
        rts = np.sort(ri.column("t").to_numpy(zero_copy_only=False))
        lts = le.column("t").to_numpy(zero_copy_only=False)
        n = (
            np.searchsorted(rts, lts + hi_offset_us, side="right")
            - np.searchsorted(rts, lts + lo_offset_us, side="left")
        )
        ok = n > 0
        if not ok.any():
            return _empty_result(types, left_cols, out, pa.int64())
        sel = pa.array(ok)
        cols = {c: le.column(f"l_{c}").filter(sel) for c in left_cols}
        cols[out] = pa.array(n[ok], type=pa.int64())
        return pa.table(cols)

    return tagged.groupby("k").map_groups(merge, batch_format="pyarrow")
