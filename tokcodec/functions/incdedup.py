"""Incremental exact dedup against a persisted hash index.

At 100 TB the corpus is not deduplicated once: batches keep arriving
(daily crawls, new sources) and each must be deduped against EVERYTHING
already accepted — without rescanning the accepted corpus.  The minimal
persisted state is the 128-bit content hashes of accepted docs
(`text.fnv128`, the same key exact_dedup uses), hash-partitioned into
``n_buckets`` directories: ``index_dir/bucket=K/`` holds parquet files
of (h1, h2) int64 pairs, K = h1's top ``log2(n_buckets)`` bits.

``dedup_against_index`` is one `map_batches` + one bucket exchange:

1. per input block: fnv128 + per-(h1,h2) MIN(id) partial + bucket id —
   at most one candidate row per distinct content per block shuffles;
2. `groupby(bucket).map_groups` (pyarrow frames; groups == buckets, a
   BOUNDED count, so the per-group-Python overhead pattern the rest of
   the package avoids for near-unique keys is the right tool here):
   each group folds cross-block minima, reads ONLY its own bucket's
   index shard (1/n_buckets of the index), drops known hashes with one
   native `left anti` join, and — with ``update_index`` — appends the
   survivors' hashes as ONE new file named by ``run_id``;
3. the returned Dataset holds the accepted (id, h1, h2) rows.

Durability/idempotence: shard files are written atomically (temp +
rename) and the anti-join EXCLUDES files of the current ``run_id``, so
a crashed batch re-runs to the identical result — its own half-written
state can never mask its docs.  ``run_id`` is REQUIRED and validated
(distinct per batch; reusing one re-adjudicates the earlier batch's
docs as new and overwrites its shard files); one writer at a time per
index (the usual ingest-job contract).

Storage contract: ``index_dir`` must be visible at the same path from
every Ray worker node — shared filesystem or a fuse/NFS mount of the
object store — exactly like the encode pipeline's block dirs.  On a
single-node sandbox the local filesystem satisfies this; on a real
cluster a node-local path would silently fragment the index per node.  Sizing: a shard is read whole per group, so pick
``n_buckets`` such that accepted_docs × 16 B / n_buckets fits a worker
heap (10^12 docs at 64 Ki buckets → ~244 MB/shard).  ``compact_index``
folds each bucket's KNOWN-COMPLETE run files into one (distinct) file,
bounding per-run file growth; a run becomes foldable only when the
CALLER records it via ``mark_run_complete`` after durably consuming
its accepted output — unmarked runs (crashed, or output not yet
persisted) keep their shard files so a same-run_id retry's own-run
exclusion keeps working (``fold_all=True`` is the
nothing-pending/legacy escape hatch).

No reference-repo counterpart: one of the training-pipeline extras the
round brief asks for beyond parquet-extra's operator surface; the
within-batch semantics match functions/dedup.py::exact_dedup.

``near_dup_against_index`` is the NEAR-duplicate sibling over the same
shard machinery: state = MinHash band keys of accepted docs, verdict =
"any band collides" (see its docstring for the one-exchange contract).
"""

from __future__ import annotations

import io
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from tokcodec.bloom import any_might_contain_ints, build_bloom
from tokcodec.functions.dedup import fnv_min_partial, minhash_band_rows
from tokcodec.functions.sortagg import sorted_group_reduce
from tokcodec.manifest import atomic_write_bytes, atomic_write_json

_META = "index.json"

# shard files are named <run_id>.parquet; "compact" is compact_index's
# reserved fold-file name, and anything outside this charset could
# escape the shard dir or defeat the run-scoped exclusion
_RUN_ID_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$")


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, _META)


def _shard_dir(index_dir: str, bucket: int) -> str:
    return os.path.join(index_dir, f"bucket={bucket:05d}")


def _ensure_meta(
    index_dir: str, n_buckets: int, key: str = "fnv128", params: dict | None = None
) -> int:
    """Create-or-validate the index config.  n_buckets, the key kind
    (exact fnv128 vs minhash bands) and the signature params are all
    part of the on-disk layout — a mismatched run would look up the
    wrong shards (or compare incomparable hashes) and silently
    re-accept known docs, so every mismatch fails fast instead."""
    if n_buckets & (n_buckets - 1) or n_buckets < 2:
        # >= 2 keeps the bucket shift inside [0, 63] (a 64-bit shift is
        # undefined for numpy uint64)
        raise ValueError(f"n_buckets must be a power of two >= 2, got {n_buckets}")
    import json

    p = _meta_path(index_dir)
    want = {"n_buckets": n_buckets, "key": key}
    if params:
        want["params"] = params
    if os.path.exists(p):
        with open(p) as f:
            meta = json.load(f)
        for field in ("n_buckets", "key", "params"):
            if meta.get(field) != want.get(field):
                raise ValueError(
                    f"index at {index_dir} was built with "
                    f"{field}={meta.get(field)!r}, got {want.get(field)!r}"
                )
        return n_buckets
    os.makedirs(index_dir, exist_ok=True)
    atomic_write_json(p, want)
    return n_buckets


def mark_run_complete(index_dir: str, run_id: str) -> None:
    """Record ``run_id`` as complete in index.json.  THE CALLER invokes
    this after the run's accepted output has been durably consumed
    (written out, counted, success recorded) — i.e. at the point where
    a retry of ``run_id`` will never be needed.  Only then may
    `compact_index` fold the run's shard files: folding strips the
    run_id from its hashes, so a retry after folding would anti-join
    against its own earlier hashes and wrongly drop its docs as
    'already present'.  The dedup functions deliberately do NOT mark
    their own runs — their materialize() barrier proves the shard
    writes executed, not that the caller kept the verdicts.
    Driver-side, single-writer-per-index contract (same as the shard
    writes themselves)."""
    import json

    p = _meta_path(index_dir)
    with open(p) as f:
        meta = json.load(f)
    done = meta.get("completed_runs", [])
    if run_id not in done:
        meta["completed_runs"] = done + [run_id]
        atomic_write_json(p, meta)


def _shard_files(sd: str, exclude_run: str | None = None) -> list[str]:
    if not os.path.isdir(sd):
        return []
    out = []
    for name in sorted(os.listdir(sd)):
        if not name.endswith(".parquet"):
            continue
        if exclude_run is not None and name == f"{exclude_run}.parquet":
            continue
        out.append(os.path.join(sd, name))
    return out


def _bloom_path(parquet_path: str) -> str:
    return parquet_path[: -len(".parquet")] + ".bloom"


# per-worker-process cache of parsed bloom sidecars keyed by
# (path, mtime_ns, size): sidecars are immutable once atomically
# renamed (a same-run_id retry overwrite changes the mtime), and the
# cached dict also retains its decoded "_bits" after the first probe —
# repeat probes of the same shard across batches skip both the json
# load and the base64 decode.  Bounded: each entry is ~bloom bytes;
# evicted wholesale past the cap (simple and rare — caps only matter
# for very wide n_buckets).
_BLOOM_CACHE: dict = {}
_BLOOM_CACHE_MAX = 8192


def _file_bloom(path: str) -> dict | None:
    """Read a shard file's bloom SIDECAR (None when absent).  The bloom
    lives next to the parquet file, not in its footer metadata: an
    embedded footer bloom taxes EVERY read of the file ~17% extra open
    cost (measured: 2048 opens 0.83 s plain vs 0.97 s with embedded
    blooms) while the sidecar costs only the probes that ask for it."""
    import json

    p = _bloom_path(path)
    try:
        st = os.stat(p)
    except FileNotFoundError:
        return None
    key = (p, st.st_mtime_ns, st.st_size)
    bl = _BLOOM_CACHE.get(key)
    if bl is None:
        with open(p) as f:
            bl = json.load(f)
        if len(_BLOOM_CACHE) >= _BLOOM_CACHE_MAX:
            _BLOOM_CACHE.clear()
        _BLOOM_CACHE[key] = bl
    return bl


# Above this many candidates the probe is pure overhead: with the
# bloom's ~1% per-candidate false-positive rate, P(a file proves
# no-overlap) = 0.99^c — under 8% at c=256 — so the sidecar reads and
# k·c bit tests almost never save a file read (measured 0.67× on a
# 200k-doc trickle batch without the gate; 1.26× at 20k docs where
# c ≈ 78 per bucket clears it).
_PROBE_MAX_CANDIDATES = 256


def _read_shard(
    sd: str,
    exclude_run: str | None = None,
    probe: tuple[str, pa.Array] | None = None,
) -> pa.Table | None:
    """Concat-read a bucket's shard files.  With ``probe`` = (col,
    candidate values), files carrying a bloom sidecar over `col` are
    probed first (vectorized any-hit) and skipped when they provably
    contain none of the candidates — a tiny sidecar read instead of the
    full file.  Files without a bloom (or over a different column) are
    always read, and probing disengages when the candidate count makes
    a skip implausible (see _PROBE_MAX_CANDIDATES)."""
    files = _shard_files(sd, exclude_run)
    if probe is not None and len(probe[1]) > _PROBE_MAX_CANDIDATES:
        probe = None
    if probe is not None and files:
        col, arr = probe
        kept = []
        for f in files:
            bl = _file_bloom(f)
            if bl is not None and bl.get("col") == col and not any_might_contain_ints(
                bl, arr
            ):
                continue
            kept.append(f)
        files = kept
    if not files:
        return None
    return pa.concat_tables(pq.read_table(f, columns=["h1", "h2"]) for f in files)


def _write_shard_file(
    sd: str, run_id: str, t: pa.Table, bloom_col: str | None = None
) -> None:
    os.makedirs(sd, exist_ok=True)
    t = t.select(["h1", "h2"])
    target = os.path.join(sd, f"{run_id}.parquet")
    bl = None
    if bloom_col is not None and t.num_rows:
        bl = build_bloom(t.column(bloom_col).combine_chunks())
        if bl is not None:
            bl = {k: v for k, v in bl.items() if k != "_bits"}
            bl["col"] = bloom_col
    if bl is not None:
        import json

        # sidecar BEFORE the parquet rename: a reader that sees the
        # parquet either finds a matching sidecar or none (no-skip —
        # conservative); an orphan sidecar from a crash is overwritten
        # or removed on the next write of this run_id
        atomic_write_bytes(_bloom_path(target), json.dumps(bl).encode())
    elif os.path.exists(_bloom_path(target)):
        os.remove(_bloom_path(target))  # stale sidecar from a prior mode
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="zstd")
    atomic_write_bytes(target, buf.getvalue())


def dedup_against_index(
    ds,
    index_dir: str,
    run_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    update_index: bool = True,
    file_blooms: bool = False,
):
    """Drop every row whose content hash is already in the index (or
    duplicated within `ds` — MIN(id) wins, as in exact_dedup); return
    the accepted rows as a Dataset of (id_col, h1, h2).  With
    ``update_index`` the accepted hashes are appended to the index
    under ``run_id`` (atomic, retry-idempotent — see module docstring).
    ``run_id`` must be unique per batch: retrying a crashed batch
    reuses it, a NEW batch must not (see module docstring).

    ``file_blooms``: write a bloom sidecar over h1 next to each shard file
    and probe existing files' blooms before reading — a shard file that
    provably holds none of the bucket's candidate hashes is never
    opened.  Pays off in the trickle regime (small batch vs a
    many-run index: few candidates per bucket → high skip odds); a
    no-op on files written without blooms.  Measured numbers in
    SCALE.md (the trickle section of tools/bench_incdedup.py, which
    runs blooms-on vs blooms-off legs automatically)."""
    if not _RUN_ID_RE.match(run_id) or run_id == "compact":
        raise ValueError(
            f"run_id must match {_RUN_ID_RE.pattern} and not be the "
            f"reserved name 'compact', got {run_id!r}"
        )
    _ensure_meta(index_dir, n_buckets)
    shift = np.uint64(64 - int(n_buckets).bit_length() + 1)

    def _partial(batch: pa.Table) -> pa.Table:
        t = fnv_min_partial(batch, text_col, id_col)
        h1u = t.column("h1").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.add_column(
            0, "bucket", pa.array((h1u >> shift).astype(np.int64), pa.int64())
        )

    def _resolve(t: pa.Table) -> pa.Table:
        b = t.column("bucket")[0].as_py()
        agg = t.group_by(["h1", "h2"]).aggregate([(id_col, "min")])
        cand = pa.table(
            {
                "h1": agg.column("h1"),
                "h2": agg.column("h2"),
                id_col: agg.column(f"{id_col}_min"),
            }
        )
        sd = _shard_dir(index_dir, int(b))
        idx = _read_shard(
            sd,
            exclude_run=run_id if update_index else None,
            probe=("h1", cand.column("h1")) if file_blooms else None,
        )
        if idx is not None:
            cand = cand.join(idx, keys=["h1", "h2"], join_type="left anti")
        if update_index:
            # empty runs still write (an empty file), so a retry that
            # lands AFTER a sibling run added these hashes can't flip
            # this run's verdicts: exclusion is by name, not content
            _write_shard_file(
                sd, run_id, cand, bloom_col="h1" if file_blooms else None
            )
        return cand.select([id_col, "h1", "h2"])

    out = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_resolve, batch_format="pyarrow")
    )
    if update_index:
        # Datasets are lazy: an unconsumed (or twice-consumed) result
        # would skip (or repeat) the shard writes.  Materializing pins
        # exactly-once index updates; the accepted rows are a narrow
        # (id, h1, h2) projection of the batch — they fit the object
        # store and spill if not (the corpus text never materializes).
        out = out.materialize()
    return out


def compact_index(index_dir: str, fold_all: bool = False) -> dict:
    """Fold every bucket's KNOWN-COMPLETE run files into one
    distinct-hash file (named ``compact.parquet``) and remove the
    folded per-run files — bounds file count growth across runs.  Only
    runs the caller recorded via `mark_run_complete` are folded: an
    unmarked run (crashed, or completed but its output not yet durably
    consumed) keeps its shard files, so a retry — which excludes files
    named by its own run_id — still re-adjudicates correctly; folding
    them would strip the run_id from those hashes and the retry would
    wrongly drop its own docs as 'already present'.  One Ray task per
    bucket; safe to run any time between dedup runs, including while a
    batch is pending retry.

    ``fold_all=True`` folds EVERY file regardless of completion records
    — the escape hatch for (a) indexes created before completion
    records existed and (b) operators who know no batch is pending
    retry (the 'run it between batches' contract).  Returns
    {"buckets", "hashes"}."""
    import json

    import ray.data

    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    done = set(meta.get("completed_runs", []))
    dirs = [
        os.path.join(index_dir, d)
        for d in sorted(os.listdir(index_dir))
        if d.startswith("bucket=")
    ]

    def _fold(batch: pa.Table) -> pa.Table:
        out = []
        for sd in batch.column("dir").to_pylist():
            files = [
                f
                for f in _shard_files(sd)
                if fold_all
                or os.path.basename(f)[: -len(".parquet")] in done
                or os.path.basename(f) == "compact.parquet"
            ]
            if not files:
                out.append(0)
                continue
            if len(files) == 1 and os.path.basename(files[0]) == "compact.parquet":
                # nothing new to fold: rewriting the (largest) file for
                # zero state change would make a no-op compact read and
                # rewrite the whole index
                out.append(pq.read_metadata(files[0]).num_rows)
                continue
            merged = pa.concat_tables(
                pq.read_table(f, columns=["h1", "h2"]) for f in files
            )
            distinct = merged.group_by(["h1", "h2"]).aggregate([])
            # folding must not lose the skip capability: if any folded
            # file carried a bloom sidecar, the compact file gets one
            # over the same column
            bloom_col = next(
                (
                    bl["col"]
                    for bl in (_file_bloom(f) for f in files)
                    if bl is not None and "col" in bl
                ),
                None,
            )
            _write_shard_file(sd, "compact", distinct, bloom_col=bloom_col)
            for f in files:
                if os.path.basename(f) != "compact.parquet":
                    os.remove(f)
                    if os.path.exists(_bloom_path(f)):
                        os.remove(_bloom_path(f))
            out.append(distinct.num_rows)
        return pa.table({"hashes": pa.array(out, pa.int64())})

    if not dirs:
        return {"buckets": 0, "hashes": 0, "n_buckets": meta["n_buckets"]}
    res = (
        ray.data.from_items([{"dir": d} for d in dirs])
        .map_batches(_fold, batch_size=1, batch_format="pyarrow")
        .take_all()
    )
    # the folded runs' files are gone everywhere; prune their ids so
    # completed_runs stays bounded across compact cycles (reusing a
    # run_id was already forbidden by contract, so no exclusion is lost)
    if done:
        with open(_meta_path(index_dir)) as f:
            meta = json.load(f)
        meta["completed_runs"] = [
            r for r in meta.get("completed_runs", []) if r not in done
        ]
        atomic_write_json(_meta_path(index_dir), meta)
    return {
        "buckets": len(dirs),
        "hashes": int(sum(r["hashes"] for r in res)),
        "n_buckets": meta["n_buckets"],
    }


def near_dup_against_index(
    ds,
    index_dir: str,
    run_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    update_index: bool = True,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    seed: int = 7,
    shingle: str = "word",
    file_blooms: bool = False,
):
    """Incremental NEAR-duplicate filter: flag each batch doc whose
    MinHash band set collides with the accepted corpus (any band in the
    index) or with a smaller-id doc in the same batch (any shared
    band); return the accepted doc ids as a Dataset of (id_col,).

    State is the accepted docs' band keys — ``bands`` × 16 B per doc,
    two int64 lanes per key (h1 = band id, h2 = band hash), in the same
    bucket-sharded layout,
    atomic run-scoped appends and retry idempotence as
    `dedup_against_index`; the signature params are pinned in the index
    meta, and an exact-dedup index dir is rejected (different key kind).

    One-exchange contract: verdicts AND appends both happen inside the
    single bucket `groupby` — a doc rejected globally (flagged in some
    bucket) may still leave band keys in OTHER buckets whose local
    view looked clean.  Those extra keys can only INCREASE future
    flagging recall (the doc they shadow was itself near-identical to
    an accepted doc), which is the right trade for a probabilistic
    filter: exact-membership semantics are `dedup_against_index`'s
    job, and this keeps the whole operator one shuffle at 10^12-doc
    scale instead of three (flag → global verdict → re-shuffle bands).
    """
    if not _RUN_ID_RE.match(run_id) or run_id == "compact":
        raise ValueError(
            f"run_id must match {_RUN_ID_RE.pattern} and not be the "
            f"reserved name 'compact', got {run_id!r}"
        )
    params = {"num_perm": num_perm, "bands": bands, "k": k, "seed": seed,
              "shingle": shingle}
    _ensure_meta(index_dir, n_buckets, key="minhash-band", params=params)
    shift = np.uint64(64 - int(n_buckets).bit_length() + 1)

    def _rows(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "h1": pa.array([], pa.int64()),
                "h2": pa.array([], pa.int64()),
                id_col: pa.array([], batch.schema.field(id_col).type),
            }
        )
        if batch.num_rows == 0:
            return empty
        t = minhash_band_rows(
            batch, text_col, id_col, num_perm=num_perm, bands=bands, k=k,
            seed=seed, shingle=shingle,
        )
        h2u = t.column("band_hash").to_numpy(zero_copy_only=False).view(np.uint64)
        return pa.table(
            {
                "bucket": pa.array((h2u >> shift).astype(np.int64), pa.int64()),
                "h1": t.column("band").cast(pa.int64()),
                "h2": t.column("band_hash"),
                id_col: t.column(id_col),
            }
        )

    def _flag(t: pa.Table) -> pa.Table:
        b = t.column("bucket")[0].as_py()
        sd = _shard_dir(index_dir, int(b))
        # file blooms go over h2 (the band hash, uniform) — h1 is the
        # band id, bands distinct values, useless as a filter key
        idx = _read_shard(
            sd,
            exclude_run=run_id if update_index else None,
            probe=("h2", t.column("h2")) if file_blooms else None,
        )
        if idx is not None:
            # distinct keys + hit marker; the outer join may reorder, so
            # every downstream mask is computed AFTER the re-sort below
            idx = idx.group_by(["h1", "h2"]).aggregate([])
            idx = idx.append_column("_hit", pa.array(np.ones(idx.num_rows, np.int8)))
            t = t.join(idx, keys=["h1", "h2"], join_type="left outer")
        t = t.sort_by(
            [("h1", "ascending"), ("h2", "ascending"), (id_col, "ascending")]
        ).combine_chunks()
        h1 = t.column("h1").to_numpy(zero_copy_only=False)
        h2 = t.column("h2").to_numpy(zero_copy_only=False)
        if len(h1) > 1:
            # identical (h1, h2, id) triples collapse to ONE occurrence:
            # a batch row duplicated upstream (retry/union) must not flag
            # its own doc as a within-batch near-dup of itself
            ids_np = t.column(id_col).to_numpy(zero_copy_only=False)
            dup = np.zeros(len(h1), dtype=bool)
            dup[1:] = (
                (h1[1:] == h1[:-1]) & (h2[1:] == h2[:-1]) & (ids_np[1:] == ids_np[:-1])
            )
            if dup.any():
                t = t.filter(pa.array(~dup)).combine_chunks()
                h1 = t.column("h1").to_numpy(zero_copy_only=False)
                h2 = t.column("h2").to_numpy(zero_copy_only=False)
        n = len(h1)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        if idx is not None:
            hit = pc.fill_null(t.column("_hit"), 0).to_numpy(
                zero_copy_only=False
            ).astype(bool)
        else:
            hit = np.zeros(n, dtype=bool)
        flagged = hit | ~first
        if update_index:
            keep = first & ~hit  # bucket-locally-clean keys enter the index
            _write_shard_file(
                sd,
                run_id,
                t.filter(pa.array(keep)).select(["h1", "h2"]),
                bloom_col="h2" if file_blooms else None,
            )
        ids = t.column(id_col)
        out_ids = [pc.unique(ids.filter(pa.array(flagged)))]
        flags = [np.ones(len(out_ids[0]), np.int8)]
        # band-0 rows carry the per-doc presence marker: exactly one per
        # doc globally, so the max-flag reduce sees every doc once
        base = ids.filter(pa.array(h1 == 0))
        out_ids.append(base)
        flags.append(np.zeros(len(base), np.int8))
        return pa.table(
            {
                id_col: pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                     for a in out_ids]
                ),
                "flag": pa.array(np.concatenate(flags), pa.int8()),
            }
        )

    marks = (
        ds.map_batches(_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_flag, batch_format="pyarrow")
    )
    if update_index:
        # exactly-once appends under Dataset laziness (see
        # dedup_against_index); the mark table is 1 + flagged-bands
        # rows per doc, far narrower than the corpus
        marks = marks.materialize()
    verdict = sorted_group_reduce(marks, [id_col], [("flag", "max", "flag")])
    return verdict.map_batches(
        lambda t: t.filter(pc.equal(t.column("flag"), 0)).select([id_col]),
        batch_format="pyarrow",
    )
