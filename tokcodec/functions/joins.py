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
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


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
            cols[f"l_{c}"] = pa.nulls(batch.num_rows)
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        le = g[g["side"] == 1]
        ri = g[g["side"] == 0]
        empty = pd.DataFrame(
            {**{c: pd.Series(dtype=le[f"l_{c}"].dtype) for c in left_cols},
             out_ts: pd.Series(dtype="int64")}
        )
        if le.empty or ri.empty:
            return empty
        rts = np.sort(ri["t"].to_numpy())
        lts = le["t"].to_numpy()
        idx = np.searchsorted(rts, lts, side="right") - 1
        ok = idx >= 0
        if not ok.any():
            return empty
        out = {c: le[f"l_{c}"].to_numpy()[ok] for c in left_cols}
        out[out_ts] = rts[idx[ok]]
        return pd.DataFrame(out)

    joined = lt.union(rt).groupby("k").map_groups(merge, batch_format="pandas")

    def finish(batch: pa.Table) -> pa.Table:
        ts = batch.column(out_ts).cast(pa.timestamp("us"))
        return batch.drop_columns([out_ts]).append_column(out_ts, ts)

    return joined.map_batches(finish, batch_format="pyarrow")


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
            cols[f"l_{c}"] = pa.nulls(batch.num_rows)
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        le = g[g["side"] == 1]
        ri = g[g["side"] == 0]
        empty = pd.DataFrame(
            {**{c: pd.Series(dtype=le[f"l_{c}"].dtype) for c in left_cols},
             out: pd.Series(dtype="int64")}
        )
        if le.empty or ri.empty:
            return empty
        rts = np.sort(ri["t"].to_numpy())
        lts = le["t"].to_numpy()
        n = (
            np.searchsorted(rts, lts + hi_offset_us, side="right")
            - np.searchsorted(rts, lts + lo_offset_us, side="left")
        )
        ok = n > 0
        if not ok.any():
            return empty
        res = {c: le[f"l_{c}"].to_numpy()[ok] for c in left_cols}
        res[out] = n[ok]
        return pd.DataFrame(res)

    return lt.union(rt).groupby("k").map_groups(merge, batch_format="pandas")
