"""Deterministic synthetic tokenized-sequence tables (FIXTURES.md F1).

North-rule input shape: (doc_id:string, tokens:list<int32>, n_tok:int32,
source:string).  Seeded numpy generation — same args → bit-identical
table — so tests, benchmarks and resume checks all agree on the input.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50257
SOURCES = ["web", "books", "code", "wiki", "news", "forums", "papers", "social"]


def make_table(n_rows: int, seed: int = 42, heavy_tail: bool = True) -> pa.Table:
    """Zipfian token ids; lognormal lengths (median ~500) with a 1% heavy
    tail up to ~50k tokens so skew-balancing is actually exercised."""
    rng = np.random.default_rng(seed)
    lengths = rng.lognormal(mean=np.log(500.0), sigma=0.8, size=n_rows)
    if heavy_tail and n_rows >= 100:
        tail = rng.random(n_rows) < 0.01
        lengths[tail] = rng.uniform(20_000, 50_000, size=int(tail.sum()))
    lengths = np.clip(lengths, 0, 60_000).astype(np.int32)
    total = int(lengths.sum())
    # Zipf over the vocab (rejection-free: inverse-CDF on a truncated zipf)
    ranks = rng.zipf(1.3, size=total)
    tokens = ((ranks - 1) % VOCAB).astype(np.int32)
    offsets = np.concatenate(([0], np.cumsum(lengths, dtype=np.int64))).astype(np.int32)
    tok_arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(tokens, type=pa.int32()))
    src_ids = rng.integers(0, len(SOURCES), size=n_rows)
    doc_id = pa.array(
        [f"src{int(s)}-doc{i:08d}" for i, s in enumerate(src_ids)], type=pa.string()
    )
    source = pa.array([SOURCES[int(s)] for s in src_ids], type=pa.string())
    return pa.Table.from_arrays(
        [doc_id, tok_arr, pa.array(lengths, type=pa.int32()), source],
        names=["doc_id", "tokens", "n_tok", "source"],
    )


def write_fixture(
    path: str,
    n_rows: int,
    seed: int = 42,
    row_group_size: int = 2048,
    heavy_tail: bool = True,
) -> str:
    """Write the fixture as Parquet (zstd, like the reference comparison
    anchor) if not already present; returns the path."""
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        t = make_table(n_rows, seed=seed, heavy_tail=heavy_tail)
        tmp = path + ".tmp"
        pq.write_table(t, tmp, compression="zstd", row_group_size=row_group_size)
        os.rename(tmp, path)
    return path
