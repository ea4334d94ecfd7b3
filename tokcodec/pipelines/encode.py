"""Ray-Data encode/decode pipelines.

Two shapes, both idiomatic Ray Data:

1. **Planned, resumable** (`plan_partitions` → `encode_dataset`): a cheap
   distributed pass over the `n_tok` column builds skew-balanced
   partitions of ~equal token mass (pure function of input + config →
   deterministic, resumable).  The encode stage is a Dataset of
   partition specs mapped through a *stateful actor pool*
   (`map_batches(EncodeWorker, concurrency=N)`); each actor reads its
   row ranges straight from storage (columns pruned), encodes with the
   codec engine, and writes block + manifest atomically.  This is the
   100 TB path: data moves storage→worker→storage exactly once, nothing
   transits the object store, and a dead run resumes by skipping
   complete manifests.

2. **Streaming** (`encode_stream` / `decode_stream`): pure
   `Dataset.map_batches` stages (Arrow in, one encoded-blob row out /
   blob in, Arrow out) for composing with other Dataset transforms.

The reference's only distribution story is Hadoop MR input/output
formats with the schema in the job conf
(/root/reference/parquet-tensorflow/.../ExampleParquetInputFormat.java:10-31);
here the "job conf" is the plan manifest and Ray Data owns scheduling.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tokcodec import manifest as mf
from tokcodec.blocks import (
    codec_summary,
    decode_file,
    decode_table,
    encode_table,
    read_header,
)

DEFAULT_TARGET_TOKENS = 32_000_000  # ~64 MB of int32 tokens per partition

# Partition cuts snap to the nearest parquet row-group boundary when the
# token-mass deviation stays within the snap tolerance.  A cut in
# the middle of a row group forces BOTH neighbouring partitions to decode
# that row group (~2x read amplification when row-group mass ~ target
# mass); aligned cuts decode every row group exactly once.  Monster rows /
# row groups still get exact in-group cuts because their deviation
# exceeds the tolerance — skew balancing is preserved where it matters.
DEFAULT_SNAP_FRAC = 0.4

# The tolerance is also floored at 0.6x the file's MEAN row-group mass,
# capped at 0.55x target (exact integer ratios 3/5 and 11/20): when
# target_tokens ~ row-group mass, the distance from an ideal cut to the
# nearest row-group boundary is uniform in [0, rg_mass/2], so a tolerance
# of snap_frac * target alone leaves a large fraction of cuts
# mid-row-group (measured 103/389 at target 8M over 8.4M-mass row groups
# -> ~27% extra row-group decodes).  0.6x mean covers every boundary
# deviation for near-uniform row groups; the 0.55x-target cap keeps the
# floor from swallowing skew balancing when row groups are HUGE relative
# to target (a single-row-group file would otherwise snap every cut to
# the file edges) — worst-case partition mass stays < ~2.1x target, and
# a genuinely monster row group still gets exact in-group cuts.
# Expressed as integer ratios so the serial and distributed planners
# compute bit-identical tolerances.
_RG_SNAP_NUM, _RG_SNAP_DEN = 3, 5
_RG_CAP_NUM, _RG_CAP_DEN = 11, 20


def _snap_tolerance(snap_frac: float, target_tokens: int, total: int, n_rgs: int) -> int:
    """Snap tolerance for one file: max(snap_frac * target, min(0.6 *
    mean row-group mass, 0.55 * target)), in exact integer arithmetic
    (identical in the serial and distributed planners).  snap_frac == 0
    disables snapping."""
    tol = int(snap_frac * target_tokens)
    if tol > 0 and n_rgs > 0:
        floor = min(
            (_RG_SNAP_NUM * total) // (_RG_SNAP_DEN * n_rgs),
            (_RG_CAP_NUM * target_tokens) // _RG_CAP_DEN,
        )
        tol = max(tol, floor)
    return tol


# ------------------------------------------------------------- planning ----


def _ntok_chunk(
    path: str, rg_lo: int, rg_hi: int, token_col: str, pf=None
) -> np.ndarray:
    """Token-mass array for row groups [rg_lo, rg_hi) of one file — the
    unit of the parallel 'stats pass' (reads ONE small column).  Null
    token counts contribute ZERO mass (the row still encodes; it just
    doesn't steer balancing) — without the fill, Arrow's null→NaN→int64
    cast lands on int64-min and one bad row poisons the cumulative-mass
    cuts for its whole file.  ``pf``: pass an already-open ParquetFile
    to reuse its parsed footer (footer deserialization dominates
    per-task metadata cost on files with thousands of row groups)."""
    f = pf if pf is not None else pq.ParquetFile(path)
    t = f.read_row_groups(list(range(rg_lo, rg_hi)), columns=[token_col], use_threads=False)
    if t.column(0).null_count:
        t = t.set_column(0, t.schema.field(0), pa.compute.fill_null(t.column(0), 0))
    return np.abs(t.column(0).to_numpy(zero_copy_only=False).astype(np.int64))


def _chunk_total(path: str, rg_lo: int, rg_hi: int, token_col: str) -> int:
    """Stats wave 1: ONE scalar per chunk back to the driver (never the
    raw mass array — at 10^12 rows that array is driver-killing)."""
    return int(_ntok_chunk(path, rg_lo, rg_hi, token_col).sum())


def _snap_row(
    bl: int, cum: np.ndarray, base_mass: int, rg_bounds: np.ndarray, v: int, snap_tol: int
) -> int:
    """Snap an exact cut row `bl` (local) to the nearest row-group
    boundary whose cumulative-mass deviation from the ideal cut value `v`
    is within `snap_tol`; else keep the exact row.  Deterministic: on a
    deviation tie the earlier boundary wins.  Used identically by the
    serial and distributed planners so their plans stay bit-identical."""
    if snap_tol <= 0 or len(rg_bounds) == 0:
        return bl
    j = int(np.searchsorted(rg_bounds, bl))
    best_row, best_dev = bl, None
    for c in (
        ([int(rg_bounds[j - 1])] if j > 0 else [])
        + ([int(rg_bounds[j])] if j < len(rg_bounds) else [])
    ):
        mass_at = base_mass + (int(cum[c - 1]) if c > 0 else 0)
        dev = abs(mass_at - int(v))
        if dev > snap_tol:
            continue
        if best_dev is None or dev < best_dev or (dev == best_dev and c < best_row):
            best_row, best_dev = c, dev
    return best_row


def _chunk_cut_rows(
    path: str,
    rg_lo: int,
    rg_hi: int,
    token_col: str,
    row_offset: int,
    base_mass: int,
    cut_vals: list[int],
    snap_tol: int = 0,
) -> list[tuple[int, int]]:
    """Stats wave 2: for each global integer cut value v assigned to this
    chunk, return (global boundary row b, global cum-mass at b-1).
    Exactly replicates ``searchsorted(global_cum, v)`` because
    global_cum[i] = base_mass + local_cum[i - row_offset] within the
    chunk, and all arithmetic is integer-exact.  With snap_tol > 0 the
    exact row snaps to an adjacent row-group boundary within tolerance —
    the same prev/next candidates the serial planner sees, because chunk
    edges are themselves row-group boundaries.

    Known bit-identity exception (degenerate): when the exact cut lands
    on this chunk's FIRST row and a run of zero-mass rows makes the
    previous chunk's trailing row-group boundary tie on deviation, the
    serial planner's 'earlier boundary wins' tie-break picks that
    earlier row, which this chunk-local task cannot see.  Both plans
    remain valid, deterministic and equal-mass; they differ only in
    which of two mass-identical boundary rows hosts the cut.  Fixing it
    would need cross-chunk boundary-mass exchange for a case that
    requires n_tok == 0 rows exactly at a tied row-group edge."""
    pf = pq.ParquetFile(path)  # one footer parse per task, shared below
    mass = _ntok_chunk(path, rg_lo, rg_hi, token_col, pf=pf)
    cum = np.cumsum(mass)
    rg_bounds = np.empty(0, dtype=np.int64)
    if snap_tol > 0:
        md = pf.metadata
        rg_rows = [md.row_group(i).num_rows for i in range(rg_lo, rg_hi)]
        rg_bounds = np.concatenate(([0], np.cumsum(rg_rows, dtype=np.int64)))
    out = []
    for v in cut_vals:
        bl = int(np.searchsorted(cum, int(v) - base_mass))
        bl = min(bl, len(cum))
        bl = _snap_row(bl, cum, base_mass, rg_bounds, int(v), snap_tol)
        cum_bm1 = base_mass + (int(cum[bl - 1]) if bl > 0 else 0)
        out.append((row_offset + bl, cum_bm1))
    return out


def _file_token_plan(
    path: str,
    target_tokens: int,
    token_col: str | None,
    snap_frac: float = DEFAULT_SNAP_FRAC,
) -> list[dict]:
    """Split one parquet file into row ranges of ~target token mass.

    Reads only the token-count column (or just row counts when absent) —
    the ~0.1% 'stats pass' that buys deterministic skew-balanced
    partitioning (SURVEY.md §4 'Skew / stragglers').  Cuts snap to
    row-group boundaries within snap_frac * target_tokens so each row
    group decodes in exactly one partition (see DEFAULT_SNAP_FRAC).
    """
    f = pq.ParquetFile(path)
    n_rows = f.metadata.num_rows
    if n_rows == 0:
        return []
    if token_col is not None and token_col in f.schema_arrow.names:
        mass = _ntok_chunk(path, 0, f.metadata.num_row_groups, token_col, pf=f)
    else:
        mass = np.ones(n_rows, dtype=np.int64)
        target_tokens = max(1, min(target_tokens, 1_000_000))
    cum = np.cumsum(mass)
    total = int(cum[-1])
    n_parts = max(1, round(total / target_tokens))
    snap_tol = _snap_tolerance(
        snap_frac, target_tokens, total, f.metadata.num_row_groups
    )
    rg_bounds = np.empty(0, dtype=np.int64)
    if snap_tol > 0:
        rg_rows = [
            f.metadata.row_group(i).num_rows for i in range(f.metadata.num_row_groups)
        ]
        rg_bounds = np.concatenate(([0], np.cumsum(rg_rows, dtype=np.int64)))
    # equal-mass boundaries; a single monster row stays alone in its part.
    # Cut values are EXACT integers (ceil in int arithmetic): identical
    # to searchsorted-against-float for in-range masses, and still exact
    # past float64's 2^53 where k*total/n_parts would round
    bounds = [0]
    for k in range(1, n_parts):
        cut = -((-k * total) // n_parts)
        b = int(np.searchsorted(cum, cut))
        b = _snap_row(b, cum, 0, rg_bounds, cut, snap_tol)
        if b > bounds[-1]:
            bounds.append(b)
    if bounds[-1] != n_rows:
        bounds.append(n_rows)
    specs = []
    for row_start, row_end in zip(bounds[:-1], bounds[1:]):
        specs.append(
            {
                "file": os.path.abspath(path),
                "row_start": int(row_start),
                "row_end": int(row_end),
                "n_tok": int(cum[row_end - 1] - (cum[row_start - 1] if row_start else 0)),
            }
        )
    return specs


_PLAN_CHUNK_RGS = 64  # row groups per stats task


def _plan_distributed(
    files: list[str],
    target_tokens: int,
    token_col: str | None,
    snap_frac: float = DEFAULT_SNAP_FRAC,
) -> list[list[dict]]:
    """Two-wave distributed stats pass with O(chunks + partitions) driver
    memory (never the raw n_tok arrays — the round-1 design shipped every
    file's mass array to the driver, terabytes at 10^12 rows):

    wave 1: each chunk task returns ONE int (its token mass).  The driver
    derives per-file totals, partition counts and the equal-mass cut
    values, and assigns each cut to the first chunk whose cumulative mass
    reaches it.
    wave 2: each chunk with assigned cuts re-reads its (tiny) token
    column and returns the exact boundary row + cum-mass per cut.

    Produces partitions bit-identical to the serial `_file_token_plan`
    (same searchsorted semantics); the token column is read twice —
    ~0.2% of the data, the price of O(1) driver memory.
    """
    import ray

    total_task = ray.remote(num_cpus=0.5)(_chunk_total)
    cuts_task = ray.remote(num_cpus=0.5)(_chunk_cut_rows)

    # chunk layout per file: (rg_lo, rg_hi, row_offset)
    chunks: dict[int, list[tuple[int, int, int]]] = {}
    n_rows_of: dict[int, int] = {}
    wave1: list[tuple[int, int, object]] = []  # (fi, chunk_idx, ref)
    for fi, p in enumerate(files):
        f = pq.ParquetFile(p)
        md = f.metadata
        n_rows_of[fi] = md.num_rows
        if token_col is None or token_col not in f.schema_arrow.names:
            continue
        rg_rows = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        row_off = 0
        cl = []
        for lo in range(0, md.num_row_groups, _PLAN_CHUNK_RGS):
            hi = min(md.num_row_groups, lo + _PLAN_CHUNK_RGS)
            cl.append((lo, hi, row_off))
            row_off += sum(rg_rows[lo:hi])
        chunks[fi] = cl
        for ci, (lo, hi, _) in enumerate(cl):
            wave1.append((fi, ci, total_task.remote(p, lo, hi, token_col)))
    totals: dict[tuple[int, int], int] = {}
    for (fi, ci, _), tot in zip(wave1, ray.get([w[2] for w in wave1])):
        totals[(fi, ci)] = tot

    # assign cuts to chunks, launch wave 2
    wave2: list[tuple[int, object]] = []  # (fi, ref)
    file_cfg: dict[int, dict] = {}
    for fi, p in enumerate(files):
        if fi not in chunks or n_rows_of[fi] == 0:
            continue
        cl = chunks[fi]
        chunk_tot = [totals[(fi, ci)] for ci in range(len(cl))]
        ends = np.cumsum(chunk_tot)
        total = int(ends[-1]) if len(ends) else 0
        n_parts = max(1, round(total / target_tokens))
        cut_vals = [-((-k * total) // n_parts) for k in range(1, n_parts)]
        file_cfg[fi] = {"total": total}
        per_chunk: dict[int, list[int]] = {}
        for v in cut_vals:
            ci = int(np.searchsorted(ends, v))  # first chunk with end >= v
            ci = min(ci, len(cl) - 1)
            per_chunk.setdefault(ci, []).append(v)
        snap_tol = _snap_tolerance(snap_frac, target_tokens, total, cl[-1][1])
        for ci, vals in sorted(per_chunk.items()):
            lo, hi, row_off = cl[ci]
            base = int(ends[ci - 1]) if ci > 0 else 0
            wave2.append(
                (fi, cuts_task.remote(p, lo, hi, token_col, row_off, base, vals, snap_tol))
            )

    bounds_of: dict[int, list[tuple[int, int]]] = {fi: [] for fi in file_cfg}
    for (fi, _), res in zip(wave2, ray.get([w[1] for w in wave2])):
        bounds_of[fi].extend(res)

    per_file: list[list[dict]] = []
    for fi, p in enumerate(files):
        if fi not in file_cfg:
            # no token column (or empty): serial fallback reads no data
            per_file.append(_file_token_plan(p, target_tokens, token_col, snap_frac=snap_frac))
            continue
        n_rows = n_rows_of[fi]
        total = file_cfg[fi]["total"]
        bounds = [0]
        cums = [0]  # global cum-mass at bound-1 (0 for bound 0)
        for b, cum_bm1 in sorted(bounds_of[fi]):
            if b > bounds[-1]:
                bounds.append(int(b))
                cums.append(int(cum_bm1))
        if bounds[-1] != n_rows:
            bounds.append(n_rows)
            cums.append(total)
        else:
            cums[-1] = total
        specs = []
        for j in range(len(bounds) - 1):
            specs.append(
                {
                    "file": os.path.abspath(p),
                    "row_start": bounds[j],
                    "row_end": bounds[j + 1],
                    "n_tok": cums[j + 1] - cums[j],
                }
            )
        per_file.append(specs)
    return per_file


def plan_partitions(
    input_paths: str | list[str],
    target_tokens: int = DEFAULT_TARGET_TOKENS,
    token_col: str | None = "n_tok",
    columns: list[str] | None = None,
    parallel: bool = True,
    snap_frac: float = DEFAULT_SNAP_FRAC,
    bloom_cols: list[str] | None = None,
) -> dict:
    """Build the deterministic partition plan.

    Returns {"fingerprint", "config", "partitions": [spec, ...]} where each
    spec is {pid, file, row_start, row_end, n_tok}.  Per-file token scans
    run as parallel Ray tasks when a Ray session is active.
    """
    if isinstance(input_paths, str):
        if os.path.isdir(input_paths):
            files = sorted(
                os.path.join(input_paths, n)
                for n in os.listdir(input_paths)
                if n.endswith(".parquet")
            )
        else:
            files = [input_paths]
    else:
        files = sorted(input_paths)
    if not files:
        raise ValueError(f"no parquet files under {input_paths!r}")

    import ray

    if parallel and ray.is_initialized():
        per_file = _plan_distributed(files, target_tokens, token_col, snap_frac)
    else:
        per_file = [
            _file_token_plan(p, target_tokens, token_col, snap_frac=snap_frac)
            for p in files
        ]

    partitions = []
    for specs in per_file:
        for s in specs:
            s["pid"] = len(partitions)
            partitions.append(s)
    config = {
        "target_tokens": target_tokens,
        "token_col": token_col,
        "columns": columns,
        "snap_frac": snap_frac,
        "files": [os.path.abspath(p) for p in files],
        # content stamp: a regenerated input file (same path, new bytes)
        # must invalidate prior manifests, not silently resume over them
        "file_stats": [
            [os.path.abspath(p), os.path.getsize(p), os.stat(p).st_mtime_ns]
            for p in files
        ],
        "format": "TOKB1",
    }
    if bloom_cols:
        # part of the output contract: adding/removing blooms must
        # invalidate prior manifests (resume would otherwise skip
        # re-encoding blocks that lack the requested filters); omitted
        # when unset so existing fingerprints stay stable
        config["bloom_cols"] = sorted(bloom_cols)
    return {"fingerprint": mf.fingerprint(config), "config": config, "partitions": partitions}


# ------------------------------------------------------------ encoding ----


def _read_rows(path: str, row_start: int, row_end: int, columns: list[str] | None) -> pa.Table:
    """Read [row_start, row_end) from a parquet file touching only the
    overlapping row groups (never the whole file).  Local files are
    memory-mapped: page-cache-resident source bytes then feed the zstd
    decompressor without an extra read()+copy (~9% on the tokens column;
    non-local paths fall back to the filesystem reader)."""
    try:
        src = pa.memory_map(path)
    except (OSError, pa.lib.ArrowInvalid):
        src = path
    f = pq.ParquetFile(src)
    md = f.metadata
    offs = [0]
    for i in range(md.num_row_groups):
        offs.append(offs[-1] + md.row_group(i).num_rows)
    rgs = [
        i
        for i in range(md.num_row_groups)
        if offs[i + 1] > row_start and offs[i] < row_end
    ]
    t = f.read_row_groups(rgs, columns=columns, use_threads=False)
    base = offs[rgs[0]] if rgs else 0
    return t.slice(row_start - base, row_end - row_start)


_METRIC_KEYS = (
    "pid", "rows", "n_tok", "bytes_in", "bytes_out", "read_s", "encode_s", "resumed",
)


class EncodeWorker:
    """Stateful actor-pool stage: one call encodes one (or a few)
    partition specs end-to-end.  State (output dir, plan fingerprint,
    column list) is bound once per actor in __init__ — the analog of the
    reference's per-writer schema+buffer state
    (ExampleWriteSupport.java:14-15) without any cross-partition sharing."""

    def __init__(
        self,
        out_dir: str,
        fp: str,
        columns: list[str] | None,
        zstd: bool = True,
        schema=None,
        bloom_cols: list[str] | None = None,
    ):
        self.out_dir = out_dir
        self.fp = fp
        self.columns = columns
        self.zstd = zstd
        self.bloom_cols = bloom_cols
        # write-side schema enforcement (ExampleParquetWriter.java:46-52
        # + Schema.java:171-174): validate every table before encoding
        self.schema = schema

    def encode_one(self, spec: dict) -> dict:
        pid = int(spec["pid"])
        man = mf.load_if_complete(self.out_dir, pid, self.fp)
        if man is not None:
            # .get at BOTH levels: a complete manifest from an older
            # metrics layout must resume, not KeyError the run (the plan
            # fingerprint covers config, not code version)
            metrics = man.get("metrics") or {}
            m = {k: metrics.get(k) for k in _METRIC_KEYS}
            m["pid"] = pid  # always known from the spec, even when the
            # manifest's metrics dict is absent/foreign
            m["resumed"] = True
            return m
        t0 = time.monotonic()
        table = _read_rows(spec["file"], int(spec["row_start"]), int(spec["row_end"]), self.columns)
        t_read = time.monotonic() - t0
        if self.schema is not None:
            self.schema.validate_table(table)
        t0 = time.monotonic()
        lineage = {
            "file": spec["file"],
            "row_start": int(spec["row_start"]),
            "row_end": int(spec["row_end"]),
        }
        blob = encode_table(
            table, meta={"pid": pid, "lineage": lineage}, zstd=self.zstd,
            bloom_cols=self.bloom_cols,
        )
        t_enc = time.monotonic() - t0
        metrics = {
            "pid": pid,
            "rows": table.num_rows,
            "n_tok": int(spec.get("n_tok", 0)),
            "bytes_in": int(table.nbytes),
            "bytes_out": len(blob),
            "read_s": round(t_read, 4),
            "encode_s": round(t_enc, 4),
            "resumed": False,
        }
        mf.write_partition(
            self.out_dir, pid, blob, lineage, metrics, self.fp,
            codecs=codec_summary(read_header(blob)),
        )
        return metrics

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self.encode_one(spec) for spec in batch.to_pylist()]
        return pa.Table.from_pylist(out)


def _encode_specs(
    batch: pa.Table, out_dir: str, fp: str, columns, zstd: bool, schema=None,
    bloom_cols=None,
) -> pa.Table:
    w = EncodeWorker(out_dir, fp, columns, zstd, schema=schema, bloom_cols=bloom_cols)
    return w(batch)


def encode_dataset(
    input_paths: str | list[str],
    out_dir: str,
    target_tokens: int = DEFAULT_TARGET_TOKENS,
    columns: list[str] | None = None,
    token_col: str | None = "n_tok",
    concurrency: int | tuple[int, int] | None = None,
    zstd: bool = True,
    compute: str = "tasks",
    schema=None,
    snap_frac: float = DEFAULT_SNAP_FRAC,
    bloom_cols: list[str] | None = None,
) -> dict:
    """Plan → encode all partitions (skipping complete ones) → summary.

    compute="tasks" (default): plain map_batches tasks — the encoder's
    only cross-batch state is its config (dictionaries / FSST symbol
    tables are per-partition and travel inside each block), so tasks
    reuse Ray's warm worker pool instead of paying actor-pool spin-up
    per run.  compute="actors" keeps the stateful actor-pool form for
    deployments that add per-actor state (e.g. a codec-plan cache).

    Returns {"plan", "metrics": list of per-partition dicts, "out_dir"}.
    """
    import ray
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    plan = plan_partitions(
        input_paths, target_tokens, token_col, columns, snap_frac=snap_frac,
        bloom_cols=bloom_cols,
    )
    mf.atomic_write_json(os.path.join(out_dir, "plan.json"), plan)
    # drop leftovers of a DIFFERENT plan over this out_dir (same-plan
    # manifests survive untouched — that's the resume path)
    purged = mf.purge_stale(out_dir, plan["fingerprint"])

    specs = plan["partitions"]
    ds = ray.data.from_items(specs)
    kw = dict(batch_size=1, batch_format="pyarrow", num_cpus=1)
    if compute == "actors":
        if concurrency is None:
            ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
            concurrency = max(1, min(len(specs), ncpu - 1))
        out = ds.map_batches(
            EncodeWorker,
            fn_constructor_kwargs={
                "out_dir": out_dir, "fp": plan["fingerprint"],
                "columns": columns, "zstd": zstd, "schema": schema,
                "bloom_cols": bloom_cols,
            },
            concurrency=concurrency,
            **kw,
        )
    else:
        if concurrency is not None:
            # honor the cap on the tasks path too (bounds memory / storage
            # pressure); without this only compute="actors" respected it.
            # Ray rejects a (min, max) tuple for plain-function
            # map_batches — the tuple form is an actor-pool concept, so
            # on tasks the upper bound IS the cap
            kw["concurrency"] = (
                concurrency[1] if isinstance(concurrency, tuple) else concurrency
            )
        out = ds.map_batches(
            _encode_specs,
            fn_kwargs={
                "out_dir": out_dir, "fp": plan["fingerprint"],
                "columns": columns, "zstd": zstd, "schema": schema,
                "bloom_cols": bloom_cols,
            },
            **kw,
        )
    metrics = out.take_all()  # small: one metrics row per partition
    return {"plan": plan, "metrics": metrics, "out_dir": out_dir, "purged": purged}


# ------------------------------------------------------------ decoding ----


def decode_dataset(
    out_dir: str,
    columns: list[str] | None = None,
    predicate=None,
    allow_partial: bool = False,
):
    """Encoded dir → ray.data.Dataset of decoded rows (streaming: one
    block decodes per task; nothing materializes on the driver).

    With `predicate` (a tokcodec.predicate.Expr), each task reads the
    block HEADER first and skips the payload entirely when the
    per-column zone-map stats prove no row can match (the reference
    reader's FilterPredicate-over-row-group-stats role,
    ExampleReadSupport.java:55-74); surviving blocks decode then
    re-filter residually — exact WHERE semantics."""
    import ray.data

    mans = mf.list_manifests(out_dir)
    if not mans:
        raise ValueError(f"no manifests under {out_dir}")
    # Planned dirs carry plan.json: refuse to decode a dir whose blocks
    # mix plan fingerprints (stale leftovers of an earlier run with a
    # different plan would silently duplicate rows).  encode_dataset
    # purges these; this guards hand-assembled or tampered dirs.  Sink
    # dirs (TokbDatasink) have no plan.json/fingerprints and skip the
    # check.
    plan_path = os.path.join(out_dir, "plan.json")
    if os.path.exists(plan_path):
        import json as _json

        with open(plan_path) as f:
            plan = _json.load(f)
        expect_fp = plan["fingerprint"]
        # STRICT match: a fingerprint-less manifest in a planned dir is a
        # foreign block (e.g. a sink manifest copied in), the exact silent
        # row-duplication case this guard exists for — purge_stale treats
        # missing fingerprints as stale for the same reason
        stale = [m["block"] for m in mans if m.get("fingerprint") != expect_fp]
        if stale:
            raise ValueError(
                f"{out_dir} holds {len(stale)} block(s) from a different plan "
                f"(e.g. {stale[0]}); re-run encode_dataset (which purges stale "
                "blocks) or remove them before decoding"
            )
        missing = {int(p["pid"]) for p in plan.get("partitions", [])} - {
            int(m["pid"]) for m in mans if "pid" in m
        }
        if missing and not allow_partial:
            raise ValueError(
                f"{out_dir} is an incomplete encode: {len(missing)} of "
                f"{len(plan.get('partitions', []))} planned partition(s) have no "
                f"manifest (e.g. pid {sorted(missing)[0]}); resume encode_dataset "
                "to finish it, or pass allow_partial=True to decode what exists"
            )
    # 'pid' exists on planned-path manifests; TokbDatasink manifests are
    # positional — both layouts decode fine
    items = [
        {"path": os.path.join(out_dir, m["block"]), "pid": m.get("pid", i)}
        for i, m in enumerate(mans)
    ]

    def _decode(batch: pa.Table) -> pa.Table:
        tables = []
        for row in batch.to_pylist():
            t, _ = decode_file(row["path"], columns=columns, predicate=predicate)
            tables.append(t)
        return pa.concat_tables(tables)

    return ray.data.from_items(items).map_batches(
        _decode, batch_size=1, batch_format="pyarrow"
    )


def count_prunable_blocks(out_dir: str, predicate) -> tuple[int, int]:
    """(skippable, total) blocks under `out_dir` for a predicate — the
    zone-map check only (header reads, no payload); used by tests and
    for plan introspection."""
    from tokcodec.blocks import header_stats, read_header_file

    mans = mf.list_manifests(out_dir)
    skip = 0
    for m in mans:
        header = read_header_file(os.path.join(out_dir, m["block"]))
        if not predicate.stats_may_match(header_stats(header)):
            skip += 1
    return skip, len(mans)


# ------------------------------------------------------- streaming form ----


def encode_stream(
    ds, zstd: bool = True, meta_cols: tuple[str, ...] = ("n_tok",), schema=None
):
    """Pure Dataset transform: each Arrow block → one row
    {data: binary blob, rows, n_tok, bytes_in, bytes_out}; `n_tok` is the
    SUM over all matching meta_cols.  With `schema`, each batch is
    validated before encoding (write-side enforcement,
    ExampleParquetWriter.java:46-52 + Schema.java:171-174)."""

    def _enc(batch: pa.Table) -> pa.Table:
        if schema is not None:
            schema.validate_table(batch)
        blob = encode_table(batch, zstd=zstd)
        ntok = 0
        for c in meta_cols:
            if c in batch.column_names:
                ntok += int(pa.compute.sum(batch.column(c)).as_py() or 0)
        return pa.Table.from_pylist(
            [
                {
                    "data": blob,
                    "rows": batch.num_rows,
                    "n_tok": ntok,
                    "bytes_in": int(batch.nbytes),
                    "bytes_out": len(blob),
                }
            ]
        )

    return ds.map_batches(_enc, batch_format="pyarrow", zero_copy_batch=True)


def decode_stream(ds):
    """Inverse of encode_stream: rows of {data: blob} → decoded rows."""

    def _dec(batch: pa.Table) -> pa.Table:
        tables = [decode_table(b.as_py())[0] for b in batch.column("data")]
        return pa.concat_tables(tables)

    return ds.map_batches(_dec, batch_format="pyarrow")
