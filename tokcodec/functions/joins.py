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
    salt_width_us: int | None = None,
):
    """Backward as-of join (inner): rows of `left` that have a right
    match emit `left_cols` + `out_ts` (the matched right timestamp,
    timestamp[us]).  Semantics match DuckDB's
    ``ASOF JOIN right ON left_key = right_key AND right_ts <= left_ts``.

    Composition: both sides project to a common (key, t, side, payload)
    schema, union, ONE groupby(key) hash exchange, then a vectorized
    sorted-merge (np.searchsorted) per key group.

    `salt_width_us` — HOT-KEY SALTING (the 100 TB path): groups become
    (key, time-bucket) so one dominant key no longer lands on a single
    worker.  Phase 1 matches in-bucket and emits (a) finished rows,
    (b) unmatched lefts, (c) ONE max-right-ts summary row per bucket;
    phase 2 regroups ONLY (b)+(c) by key — any right in an earlier
    bucket satisfies rt <= lt by construction, so the answer for an
    unmatched left is the prefix-max summary over earlier buckets.
    Output is identical to the unsalted plan."""
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

    if salt_width_us is None:
        return tagged.groupby("k").map_groups(merge, batch_format="pyarrow")
    return _asof_join_salted(tagged, types, left_cols, out_ts, salt_width_us)


def _asof_join_salted(tagged, types, left_cols, out_ts, width_us: int):
    """Two-phase salted as-of merge (see asof_join docstring)."""
    w = np.int64(max(int(width_us), 1))

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = batch.column("t").to_numpy(zero_copy_only=False)
        return batch.append_column("b", pa.array(t // w, pa.int64()))

    def _mid(kind, k, b, t, asof, le=None, sel=None, n=1):
        """One phase-1 output table in the common mid schema."""
        cols = {
            "kind": pa.array(np.full(n, kind, np.int8)),
            "k": pa.array(np.asarray(k, np.int64)),
            "b": pa.array(np.asarray(b, np.int64)),
            "t": pa.array(np.asarray(t, np.int64)),
            "asof": asof if isinstance(asof, pa.Array) else pa.array(
                np.asarray(asof, np.int64), pa.int64()
            ),
        }
        for c in left_cols:
            if le is None:
                cols[f"l_{c}"] = pa.nulls(n, type=types[c])
            else:
                cols[f"l_{c}"] = le.column(f"l_{c}").filter(sel) if sel is not None else le.column(f"l_{c}")
        return pa.table(cols)

    def merge1(g: pa.Table) -> pa.Table:
        le, ri = _split_sides(g)
        key = g.column("k")[0].as_py()
        bkt = g.column("b")[0].as_py()
        parts = []
        if ri.num_rows:
            rmax = int(
                np.max(ri.column("t").to_numpy(zero_copy_only=False))
            )
            parts.append(_mid(2, [key], [bkt], [rmax], [rmax]))
        if le.num_rows:
            lts = le.column("t").to_numpy(zero_copy_only=False)
            if ri.num_rows:
                rts = np.sort(ri.column("t").to_numpy(zero_copy_only=False))
                idx = np.searchsorted(rts, lts, side="right") - 1
                ok = idx >= 0
            else:
                ok = np.zeros(len(lts), dtype=bool)
            if ok.any():
                sel = pa.array(ok)
                parts.append(
                    _mid(
                        0,
                        np.full(int(ok.sum()), key),
                        np.full(int(ok.sum()), bkt),
                        lts[ok],
                        pa.array(rts[idx[ok]], pa.int64()),
                        le,
                        sel,
                        int(ok.sum()),
                    )
                )
            if (~ok).any():
                sel = pa.array(~ok)
                n = int((~ok).sum())
                parts.append(
                    _mid(
                        1,
                        np.full(n, key),
                        np.full(n, bkt),
                        lts[~ok],
                        pa.nulls(n, pa.int64()),
                        le,
                        sel,
                        n,
                    )
                )
        if not parts:
            return _mid(2, np.empty(0, np.int64), [], [], pa.array([], pa.int64()), n=0)
        return pa.concat_tables(parts)

    def merge2(g: pa.Table) -> pa.Table:
        kind = g.column("kind").to_numpy(zero_copy_only=False)
        pend = g.filter(pa.array(kind == 1))
        summ = g.filter(pa.array(kind == 2))
        if pend.num_rows == 0 or summ.num_rows == 0:
            return _empty_result(types, left_cols, out_ts, pa.timestamp("us"))
        sb = summ.column("b").to_numpy(zero_copy_only=False)
        st = summ.column("t").to_numpy(zero_copy_only=False)
        order = np.argsort(sb)
        sb, st = sb[order], st[order]
        pmax = np.maximum.accumulate(st)
        pb = pend.column("b").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sb, pb, side="left") - 1  # latest bucket < pb
        ok = pos >= 0
        if not ok.any():
            return _empty_result(types, left_cols, out_ts, pa.timestamp("us"))
        sel = pa.array(ok)
        cols = {c: pend.column(f"l_{c}").filter(sel) for c in left_cols}
        cols[out_ts] = pa.array(pmax[pos[ok]], pa.int64()).cast(pa.timestamp("us"))
        return pa.table(cols)

    mid = (
        tagged.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["k", "b"])
        .map_groups(merge1, batch_format="pyarrow")
        .materialize()  # consumed twice below; sized like the join output
    )

    def finals(t: pa.Table) -> pa.Table:
        sel = pc.equal(t.column("kind"), 0)
        cols = {c: t.column(f"l_{c}").filter(sel) for c in left_cols}
        cols[out_ts] = t.column("asof").filter(sel).cast(pa.timestamp("us"))
        return pa.table(cols)

    done = mid.map_batches(finals, batch_format="pyarrow")
    rest = mid.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("kind"), 0)),
        batch_format="pyarrow",
    )
    late = rest.groupby("k").map_groups(merge2, batch_format="pyarrow")
    return done.union(late)


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
    salt_width_us: int | None = None,
):
    """Band (range) join, aggregated: for each left row, the COUNT of
    right rows with the same key and right_ts in
    ``[left_ts + lo_offset, left_ts + hi_offset]`` (inclusive); rows
    with zero matches are dropped (inner semantics).  Same co-group
    composition as asof_join — one hash exchange, per-group vectorized
    interval counting via two searchsorted passes.

    `salt_width_us` — HOT-KEY SALTING: groups become (key, left-bucket);
    each right row replicates to every bucket whose lefts could see it
    (bucket width is floored at the window span, so the fan-out is at
    most 2×).  Every candidate (left, right) pair lands in exactly one
    group — the left's own bucket — so counts are exact, no merge phase
    needed; output is identical to the unsalted plan."""
    if hi_offset_us < lo_offset_us:
        # fail fast with a clear error: the unsalted path would silently
        # return empty while the salted path crashes in np.repeat
        raise ValueError(
            f"empty band: hi_offset_us ({hi_offset_us}) < lo_offset_us "
            f"({lo_offset_us})"
        )
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

    if salt_width_us is None:
        return tagged.groupby("k").map_groups(merge, batch_format="pyarrow")

    w = np.int64(max(int(salt_width_us), int(hi_offset_us - lo_offset_us), 1))

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = batch.column("t").to_numpy(zero_copy_only=False)
        side = batch.column("side").to_numpy(zero_copy_only=False)
        if batch.num_rows == 0:
            return batch.append_column("b", pa.array([], pa.int64()))
        # left rows live in their own bucket; right rows replicate to
        # every bucket of a left that could count them:
        # lt in [rt - hi, rt - lo]  =>  bucket range of that interval
        b_lo = np.where(side == 1, t // w, (t - hi_offset_us) // w)
        b_hi = np.where(side == 1, t // w, (t - lo_offset_us) // w)
        reps = (b_hi - b_lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), reps)
        excl = np.concatenate(([0], np.cumsum(reps)[:-1]))
        intra = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(excl, reps)
        buckets = np.repeat(b_lo, reps) + intra
        rep = batch.take(pa.array(idx))
        return rep.append_column("b", pa.array(buckets, pa.int64()))

    return (
        tagged.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["k", "b"])
        .map_groups(merge, batch_format="pyarrow")
    )
