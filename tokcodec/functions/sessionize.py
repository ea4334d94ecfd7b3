"""Gap-based sessionization without per-user Python: one global sort,
then a fully vectorized per-BLOCK pass, then O(blocks) driver stitching.

The classic formulation (`groupby(user).map_groups`) invokes a Python
callable per user — 10^9 calls at 10^9 users.  Here the only shuffle is
``sort([user, ts])``; after it every block is a contiguous slice of the
global (user, ts) order, so each block computes its sessions with numpy
(one boolean diff + cumsum, no loop) and only the block's FIRST and
LAST sessions can merge with a neighbouring block.  Those ≤2 edge
sessions per block are stitched on the driver (O(blocks) rows — the
same ragged-edge pattern as pipelines/pack.py), which also derives each
block's per-user session-id base; interior sessions are renumbered
distributedly with that tiny broadcast map.

Semantics match the SQL window oracle: a new session starts when the
gap to the user's previous event exceeds ``gap`` (strictly), session_id
is the 0-based per-user session rank by time, output is one row per
session ``(user_id, session_id, n_events)``.

No reference-repo counterpart: one of the training/analytics extras the
round brief asks for beyond parquet-extra's operator surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_GAP_US = 1800 * 1_000_000  # 30 min


def _ts_i64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us")).cast(pa.int64())
    return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _sessions_schema(user_type: pa.DataType) -> pa.Schema:
    return pa.schema(
        [
            ("user_id", user_type),
            ("start", pa.int64()),
            ("end", pa.int64()),
            ("n_events", pa.int64()),
            ("local", pa.int64()),
            ("is_first", pa.bool_()),
            ("is_last", pa.bool_()),
            ("blk_user", user_type),
            ("blk_ts", pa.int64()),
        ]
    )


def _block_sessions(batch: pa.Table, user_col: str, ts_col: str, gap_us: int) -> pa.Table:
    """All sessions of one sorted block, vectorized; emits per-session
    rows plus the block tag (its first (user, ts)) and edge flags."""
    ucol = batch.column(user_col)
    ucol = ucol.combine_chunks() if isinstance(ucol, pa.ChunkedArray) else ucol
    schema = _sessions_schema(ucol.type)
    n = batch.num_rows
    if n == 0:
        return schema.empty_table()
    if ucol.null_count or batch.column(ts_col).null_count:
        # fail fast: a NULL user would make the driver stitch's block-tag
        # sort compare None against real ids (TypeError), and a NULL ts
        # turns into an undefined int64 that silently corrupts the gap
        # computation — there is no meaningful session for either
        raise ValueError(
            f"sessionize: {user_col}/{ts_col} contain nulls; filter or "
            "fill upstream"
        )
    u = ucol.to_numpy(zero_copy_only=False)
    ts = _ts_i64(batch.column(ts_col))

    new = np.ones(n, dtype=bool)
    new[1:] = (u[1:] != u[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], n)
    m = len(starts)
    s_user = u[starts]
    # 0-based session index within (user, block): sessions of one user
    # are contiguous, so it's arange minus the user's first session pos
    user_break = np.ones(m, dtype=bool)
    user_break[1:] = s_user[1:] != s_user[:-1]
    grp_start = np.maximum.accumulate(np.where(user_break, np.arange(m), 0))
    local = np.arange(m, dtype=np.int64) - grp_start
    is_first = np.zeros(m, dtype=bool)
    is_first[0] = True
    is_last = np.zeros(m, dtype=bool)
    is_last[-1] = True
    return pa.table(
        {
            "user_id": pa.array(s_user, ucol.type),
            "start": pa.array(ts[starts], pa.int64()),
            "end": pa.array(ts[ends - 1], pa.int64()),
            "n_events": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "local": pa.array(local, pa.int64()),
            "is_first": pa.array(is_first),
            "is_last": pa.array(is_last),
            "blk_user": pa.array(np.full(m, u[0]), ucol.type),
            "blk_ts": pa.array(np.full(m, ts[0], dtype=np.int64), pa.int64()),
        },
        schema=schema,
    )


def _stitch_edges(edge_rows: list[dict], gap_us: int):
    """Walk blocks in global order, merging boundary sessions whose gap
    closes across the cut.  Returns (finalized edge sessions with their
    global per-user ids, per-block adjust map {(blk_user, blk_ts):
    (base, merged)} consumed by the interior renumbering pass)."""
    blocks: dict[tuple, list[dict]] = {}
    for r in edge_rows:
        blocks.setdefault((r["blk_user"], r["blk_ts"]), []).append(r)

    # block order == order of the block's minimal (user, ts); identical
    # keys only happen for degenerate all-same-(user,ts) blocks, whose
    # processing is order-independent (gap 0 merges, n sums commute)
    order = sorted(blocks)
    finalized: list[dict] = []
    adjust: dict[tuple, tuple[int, bool]] = {}
    pending: dict | None = None  # last session of the previous block

    def flush():
        nonlocal pending
        if pending is not None:
            finalized.append(
                {"user_id": pending["user"], "session_id": pending["id"],
                 "n_events": pending["n"]}
            )
            pending = None

    def one_block(f: dict, l: dict | None, key: tuple):
        """f = block's first session row, l = last (None when same)."""
        nonlocal pending
        u = f["user_id"]
        same_user = pending is not None and pending["user"] == u
        merged = bool(same_user and f["start"] - pending["end"] <= gap_us)
        base = (pending["id"] + 1) if same_user else 0
        adjust[key] = (base, merged)
        if merged:
            pending["end"] = max(pending["end"], f["end"])
            pending["n"] += f["n_events"]
        else:
            flush()
            pending = {"user": u, "end": f["end"], "n": f["n_events"], "id": base}
        if l is not None:
            # ≥2 sessions in the block: f's session cannot also merge
            # forward, finalize it; l becomes the new pending
            flush()
            if l["user_id"] == u:
                l_id = base + l["local"] - (1 if merged else 0)
            else:
                l_id = l["local"]
            pending = {"user": l["user_id"], "end": l["end"],
                       "n": l["n_events"], "id": int(l_id)}

    for key in order:
        rows = blocks[key]
        singles = [r for r in rows if r["is_first"] and r["is_last"]]
        firsts = [r for r in rows if r["is_first"] and not r["is_last"]]
        lasts = [r for r in rows if r["is_last"] and not r["is_first"]]
        for s in sorted(singles, key=lambda r: (r["start"], r["end"])):
            one_block(s, None, key)
        if firsts:
            one_block(firsts[0], lasts[0], key)
    flush()
    return finalized, adjust


def sessionize(
    ds,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = DEFAULT_GAP_US,
):
    """events Dataset → sessions Dataset ``(user_id, session_id,
    n_events)``; one sort shuffle, vectorized per-block session pass,
    O(blocks) driver stitching — no per-user Python anywhere."""
    import ray
    import ray.data

    sess = (
        ds.sort([user_col, ts_col])
        .map_batches(
            lambda b: _block_sessions(b, user_col, ts_col, gap_us),
            batch_format="pyarrow",
            batch_size=None,  # one batch per sorted block — stitching
            # relies on batch boundaries == block boundaries
        )
        .materialize()  # consumed twice (edges + interiors); sessions
        # are ≤1 row per event and usually far fewer — cheap to hold
    )

    edge_rows = [
        r
        for b in sess.map_batches(
            lambda t: t.filter(
                pa.compute.or_(t.column("is_first"), t.column("is_last"))
            ),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
        for r in pa.table(b).to_pylist()
    ]  # ≤ 2 per block — driver-safe
    finalized, adjust = _stitch_edges(edge_rows, gap_us)
    adjust_ref = ray.put(adjust)

    def renumber(t: pa.Table) -> pa.Table:
        t = t.filter(
            pa.compute.and_(
                pa.compute.invert(t.column("is_first")),
                pa.compute.invert(t.column("is_last")),
            )
        )
        amap = ray.get(adjust_ref)
        bu = t.column("blk_user").to_numpy(zero_copy_only=False)
        bt = t.column("blk_ts").to_numpy(zero_copy_only=False)
        uu = t.column("user_id").to_numpy(zero_copy_only=False)
        sid = t.column("local").to_numpy(zero_copy_only=False).astype(np.int64, copy=True)
        # adjustment applies only to sessions of the block's first user;
        # group rows by block tag (few distinct per batch) and shift
        if len(sid):
            tags = np.flatnonzero(
                np.concatenate(([True], (bu[1:] != bu[:-1]) | (bt[1:] != bt[:-1])))
            )
            bounds = np.append(tags, len(sid))
            for i, s in enumerate(tags):
                e = bounds[i + 1]
                base, merged = amap.get((bu[s], bt[s]), (0, False))
                if base or merged:
                    mask = uu[s:e] == bu[s]
                    sid[s:e][mask] += base - (1 if merged else 0)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "session_id": pa.array(sid, pa.int64()),
                "n_events": t.column("n_events"),
            }
        )

    interiors = sess.map_batches(renumber, batch_format="pyarrow")
    if finalized:
        # type the stitched rows from the interior schema — inferring from
        # python scalars would widen e.g. an int32 user column to int64 and
        # union blocks with mismatched schemas
        utype = sess.schema().base_schema.field("user_id").type
        edge_tbl = pa.table(
            {
                "user_id": pa.array([r["user_id"] for r in finalized], utype),
                "session_id": pa.array(
                    [r["session_id"] for r in finalized], pa.int64()
                ),
                "n_events": pa.array([r["n_events"] for r in finalized], pa.int64()),
            }
        )
        return interiors.union(ray.data.from_arrow(edge_tbl))
    return interiors
