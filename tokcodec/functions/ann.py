"""Similarity search over an embedding column (list<float>).

- `brute_force_topk`: the exact baseline — broadcast the (q, d) query
  matrix once via `ray.put`, each batch does one numpy matmul and emits
  its LOCAL top-k per query (partial), a tiny driver fold merges
  partials.  Data moved: one matrix broadcast + (q × k) rows per block.
- `lsh_topk`: the scale path — seeded random-hyperplane signatures
  bucket both corpus and queries; only matching buckets are scored.
  Same output schema; approximate.
- `embedding_near_dups`: cosine-above-threshold pairs via the LSH
  buckets (near-dup dedup on embeddings).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

from tokcodec.functions.sortagg import group_slices, sorted_group_apply


def _empty_topk(id_col: str) -> pa.Table:
    return pa.table(
        {"query": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
         "sim": pa.array([], pa.float64())}
    )


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    values = np.asarray(arr.values, dtype=np.float64)
    n = len(arr)
    return values.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _merge_topk(partials: list[dict], k: int, id_col: str) -> list[dict]:
    """Fold per-block partial top-k rows into the global per-query top-k
    (ties broken by (-sim, id); sims rounded to 4dp) — the single
    definition of the output contract for every *_topk operator."""
    byq: dict[int, list] = {}
    for r in partials:
        byq.setdefault(r["query"], []).append((-r["sim"], r[id_col]))
    out = []
    for qi in sorted(byq):
        for negs, vid in heapq.nsmallest(k, sorted(byq[qi])):
            out.append({"query": qi, id_col: vid, "sim": round(-negs, 4)})
    return out


def brute_force_topk(ds, query: np.ndarray, k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding"):
    """Exact top-k cosine neighbors for each query row.  The query matrix
    is broadcast ONCE via ray.put; each task ray.gets it (zero-copy from
    the local plasma store — never re-shipped per batch).  Returns a list
    of {query, vec_id, sim} dicts, ties broken by (−sim, vec_id)."""
    import ray

    qn = _normalize(np.asarray(query, dtype=np.float64))
    qref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk(id_col)
        q = ray.get(qref)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = m @ q.T  # (n, q)
        ids = np.asarray(batch.column(id_col))
        kk = min(k, len(ids))
        out = []
        for qi in range(q.shape[0]):
            s = sims[:, qi]
            top = np.argpartition(-s, kk - 1)[:kk]
            out.extend(
                {"query": qi, id_col: int(ids[i]), "sim": float(s[i])} for i in top
            )
        return pa.Table.from_pylist(out)

    partials = ds.map_batches(score, batch_format="pyarrow").take_all()  # tiny: q×k rows per block
    return _merge_topk(partials, k, id_col)


def _signatures(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) >= 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.uint64))
    return (bits.astype(np.uint64) * weights).sum(axis=1)


def lsh_topk(ds, query: np.ndarray, k: int = 10, n_planes: int = 4,
             n_tables: int = 24, seed: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """Approximate top-k via MULTI-TABLE random-hyperplane LSH: a vector
    is scored iff its b-bit signature matches some query's in ANY of the
    L tables (standard (b, L) amplification — recall 1-(1-p^b)^L for
    per-bit collision prob p).  On clustered real-world embeddings the
    bucket check prunes most of the corpus; on near-uniform vectors (low
    neighbor cosine) the union of buckets approaches a full scan — an
    inherent LSH property, not an implementation artifact."""
    import ray

    q = _normalize(np.asarray(query, dtype=np.float64))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, q.shape[1]))
    qsigs = [set(_signatures(q, planes[t]).tolist()) for t in range(n_tables)]
    qref = ray.put(q)
    planes_ref = ray.put(planes)
    qsig_arrs = [np.fromiter(s, dtype=np.uint64) for s in qsigs]

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk(id_col)
        qm = ray.get(qref)
        pl = ray.get(planes_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        keep = np.zeros(len(m), dtype=bool)
        for t in range(pl.shape[0]):
            keep |= np.isin(_signatures(m, pl[t]), qsig_arrs[t])
        if not keep.any():
            return pa.Table.from_pylist([])
        m = m[keep]
        ids = np.asarray(batch.column(id_col))[keep]
        sims = m @ qm.T
        out = []
        kk = min(k, len(ids))
        for qi in range(qm.shape[0]):
            top = np.argpartition(-sims[:, qi], kk - 1)[:kk]
            out.extend(
                {"query": qi, id_col: int(ids[i]), "sim": float(sims[i, qi])}
                for i in top
            )
        return pa.Table.from_pylist(out)

    partials = ds.map_batches(score, batch_format="pyarrow").take_all()
    return _merge_topk(partials, k, id_col)


def ivf_build(ds, k: int = 16, sample_rows: int = 4096, iters: int = 10,
              seed: int = 11, vec_col: str = "embedding") -> np.ndarray:
    """Train IVF centroids: k-means on a bounded sample (driver-side numpy —
    the sample is small by construction), deterministic given seed."""
    sample = ds.limit(sample_rows).take_all()
    m = _normalize(np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample]))
    rng = np.random.default_rng(seed)
    cents = m[rng.choice(len(m), size=min(k, len(m)), replace=False)]
    for _ in range(iters):
        assign = (m @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = m[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_topk(ds, centroids: np.ndarray, query: np.ndarray, k: int = 10,
             n_probe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF search: per batch, score only vectors whose nearest centroid is
    among each query's n_probe closest centroids.  At 100 TB the corpus
    would be *pre-partitioned by centroid* (one groupby at build time) so
    probing reads only matching partitions; here the pruning is
    compute-side within the single streaming scan."""
    import ray

    q = _normalize(np.asarray(query, dtype=np.float64))
    probes = np.argsort(-(q @ centroids.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    cref = ray.put(centroids)
    qref = ray.put(q)
    pref = ray.put(probes)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk(id_col)
        cents, qm, prb = ray.get(cref), ray.get(qref), ray.get(pref)
        m = _normalize(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch.column(id_col))
        assign = (m @ cents.T).argmax(axis=1)
        out = []
        for qi in range(qm.shape[0]):
            keep = np.isin(assign, prb[qi])
            if not keep.any():
                continue
            sims = m[keep] @ qm[qi]
            kk = min(k, keep.sum())
            top = np.argpartition(-sims, kk - 1)[:kk]
            kept_ids = ids[keep]
            out.extend(
                {"query": qi, id_col: int(kept_ids[i]), "sim": float(sims[i])}
                for i in top
            )
        return pa.Table.from_pylist(out)

    partials = ds.map_batches(score, batch_format="pyarrow").take_all()
    return _merge_topk(partials, k, id_col)


def ivf_partition(ds, centroids: np.ndarray, out_dir: str,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> None:
    """Build-time IVF partitioning: assign every vector to its nearest
    centroid inside map_batches and write hive-partitioned parquet
    (`cent=<c>/` directories).  This is the real IVF scale path — the
    one all-to-all happens ONCE at build, and every later query reads
    only its probed partitions' files instead of scanning the corpus."""
    import ray

    cref = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("cent", pa.array([], pa.int32()))
        cents = ray.get(cref)
        m = _normalize(_batch_matrix(batch, vec_col))
        a = (m @ cents.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("cent", pa.array(a))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["cent"]
    )


def ivf_topk_partitioned(out_dir: str, centroids: np.ndarray, query: np.ndarray,
                         k: int = 10, n_probe: int = 4,
                         id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF search over an `ivf_partition` layout: ONLY the probed
    centroids' partition directories are read (partition pruning at the
    file listing — the corpus outside the probe set costs nothing);
    within a batch each query scores just its own probed centroids'
    vectors.  Same output contract as ivf_topk."""
    import os

    import ray
    import ray.data

    q = _normalize(np.asarray(query, dtype=np.float64))
    cents = _normalize(np.asarray(centroids, dtype=np.float64))
    probes = np.argsort(-(q @ cents.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    needed = sorted({int(c) for row in probes for c in row})
    paths = []
    for c in needed:
        d = f"{out_dir}/cent={c}"
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    if not paths:
        return []
    qref = ray.put(q)
    pref = ray.put(probes)
    cref = ray.put(cents)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk(id_col)
        qm, prb, cm = ray.get(qref), ray.get(pref), ray.get(cref)
        m = _normalize(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch.column(id_col))
        # re-derive the centroid assignment (identical to build time —
        # cheaper than depending on hive-key inference for subdir reads)
        cent = (m @ cm.T).argmax(axis=1)
        out = []
        for qi in range(qm.shape[0]):
            keep = np.isin(cent, prb[qi])
            if not keep.any():
                continue
            sims = m[keep] @ qm[qi]
            kk = min(k, int(keep.sum()))
            top = np.argpartition(-sims, kk - 1)[:kk]
            kept_ids = ids[keep]
            out.extend(
                {"query": qi, id_col: int(kept_ids[i]), "sim": float(sims[i])}
                for i in top
            )
        return pa.Table.from_pylist(out) if out else _empty_topk(id_col)

    ds = ray.data.read_parquet(paths, columns=[id_col, vec_col])
    partials = ds.map_batches(score, batch_format="pyarrow").take_all()
    return _merge_topk(partials, k, id_col)


# all-pairs cap per signature bucket: a degenerate bucket (identical /
# zero vectors) otherwise makes the m @ m.T quadratic.  Oversized buckets
# are split by sorted id into chunks of this size and the drop is logged.
MAX_SIG_BUCKET = 1024


def embedding_near_dups(ds, tau: float = 0.95, n_planes: int = 10, seed: int = 5,
                        id_col: str = "vec_id", vec_col: str = "embedding"):
    """Cosine-near-duplicate pairs: bucket by hyperplane signature
    (one native sort — the one shuffle), exact cosine within buckets
    (bounded by MAX_SIG_BUCKET per chunk).  Bucket frames stay Arrow
    end to end: the embedding matrix is a zero-copy reshape of the list
    values buffer (_batch_matrix), never an object-dtype np.stack.
    Buckets are walked via `sorted_group_apply` changepoint slices —
    singleton buckets (the vast majority) never reach Python, and
    there's no per-group map_groups call overhead."""
    import logging

    planes_holder = {}

    def add_sig(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, vec_col))
        if "p" not in planes_holder:
            r = np.random.default_rng(seed)
            planes_holder["p"] = r.standard_normal((n_planes, m.shape[1]))
        sigs = _signatures(m, planes_holder["p"]).view(np.int64)
        return batch.append_column("sig", pa.array(sigs))

    def chunk_dups(m: np.ndarray, ids: np.ndarray):
        sims = m @ m.T
        ii, jj = np.triu_indices(len(ids), k=1)
        s = sims[ii, jj]  # gather the ~n^2/2 triangle once, reuse below
        keep = s >= tau
        return (
            np.minimum(ids[ii[keep]], ids[jj[keep]]),
            np.maximum(ids[ii[keep]], ids[jj[keep]]),
            np.round(s[keep], 4),
        )

    def emit_dups(t: pa.Table) -> pa.Table:
        """Exact cosine pairs for every signature bucket in a key-sorted
        table: changepoint group slices (singleton buckets never reach
        Python), per-bucket blocked matmul with the MAX_SIG_BUCKET cap."""
        id_arr = t.column(id_col)
        id_arr = id_arr.combine_chunks() if isinstance(id_arr, pa.ChunkedArray) else id_arr
        empty = pa.table(
            {"a": pa.array([], id_arr.type), "b": pa.array([], id_arr.type),
             "sim": pa.array([], pa.float64())}
        )
        if t.num_rows < 2:
            return empty
        sig = t.column("sig").to_numpy(zero_copy_only=False)
        starts, ends = group_slices([sig])
        if not len(starts):
            return empty
        all_ids = id_arr.to_numpy(zero_copy_only=False)
        mm = _normalize(_batch_matrix(t, vec_col))
        parts = []
        for s, e in zip(starts.tolist(), ends.tolist()):
            ids = all_ids[s:e]
            order = np.argsort(ids, kind="stable")
            m = mm[s:e][order]
            ids = ids[order]
            n = len(ids)
            if n > MAX_SIG_BUCKET:
                logging.getLogger(__name__).warning(
                    "signature bucket of %d vectors split into %d-vector chunks: "
                    "cross-chunk pairs dropped", n, MAX_SIG_BUCKET,
                )
            parts.extend(
                chunk_dups(m[i : i + MAX_SIG_BUCKET], ids[i : i + MAX_SIG_BUCKET])
                for i in range(0, n, MAX_SIG_BUCKET)
            )
        if not parts:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate([p[0] for p in parts]), id_arr.type),
                "b": pa.array(np.concatenate([p[1] for p in parts]), id_arr.type),
                "sim": pa.array(np.concatenate([p[2] for p in parts]), pa.float64()),
            }
        )

    sig_ds = ds.map_batches(add_sig, batch_format="pyarrow")
    return sorted_group_apply(sig_ds, ["sig"], emit_dups)
