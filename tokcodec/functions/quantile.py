"""Exact distributed quantiles WITHOUT a sort: iterative histogram
selection.  Each pass scans the (pruned) column once and moves only a
bins-sized count vector per block to the driver; the value range narrows
by ~1/bins per pass until the surviving candidate set is small enough to
gather and select exactly.  O(passes) streaming scans, O(bins) driver
state — the scale-correct alternative to `ds.sort()` for rank queries.

Rank semantics match DuckDB's ``quantile_disc``: the element at
0-indexed rank max(0, ceil(q*n) - 1) of the ascending multiset, with the
ceil computed in exact integer arithmetic (float q*n rounds wrong at
exact multiples).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pyarrow as pa

_BINS = 4096
_MAX_GATHER = 65536
_MAX_PASSES = 64


def _col_values(batch: pa.Table, column: str) -> np.ndarray:
    col = batch.column(column)
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if col.null_count:
        import pyarrow.compute as pc

        col = pc.drop_null(col)
    v = col.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    if np.isnan(v).any():  # DuckDB quantile_disc excludes NaN, like NULL
        v = v[~np.isnan(v)]
    return v


def _histogram(ds, column: str, edges: np.ndarray) -> np.ndarray:
    def hist_partial(batch: pa.Table, _edges=edges) -> pa.Table:
        v = _col_values(batch, column)
        v = v[(v >= _edges[0]) & (v <= _edges[-1])]
        counts, _ = np.histogram(v, bins=_edges)
        return pa.table({"c": pa.array([counts.tobytes()], pa.binary())})

    counts = np.zeros(len(edges) - 1, dtype=np.int64)
    for r in ds.map_batches(hist_partial, batch_format="pyarrow").take_all():
        counts += np.frombuffer(r["c"], dtype=np.int64)
    return counts


def _gather_select(ds, column: str, lo: float, hi: float, last: bool, rank: int) -> float:
    """Candidate set is bounded: gather ONLY the surviving bin's values
    (same binning predicate as the histogram) and select exactly."""

    def gather(batch: pa.Table, _lo=lo, _hi=hi, _last=last) -> pa.Table:
        v = _col_values(batch, column)
        keep = (v >= _lo) & ((v <= _hi) if _last else (v < _hi))
        return pa.table({"v": pa.array(v[keep], pa.float64())})

    rows = ds.map_batches(gather, batch_format="pyarrow").take_all()
    vals = np.sort(np.array([r["v"] for r in rows], dtype=np.float64))
    return float(vals[rank])


def _step(counts: np.ndarray, edges: np.ndarray, rank: int):
    """One refinement: → (new_rank, new_lo, new_hi, in_bin, last)."""
    cum = np.cumsum(counts)
    j = int(np.searchsorted(cum, rank + 1))
    rank -= int(cum[j - 1]) if j > 0 else 0
    return rank, float(edges[j]), float(edges[j + 1]), int(counts[j]), j == len(counts) - 1


def quantiles_disc(ds, column: str, qs: list[float]) -> list[float]:
    """Exact discrete quantiles of a numeric column (nulls and NaN
    excluded, like DuckDB quantile_disc).  The q-independent base pass
    and the first histogram are computed ONCE and shared across all qs
    (they use the same full-range window); refinement/gather then runs
    per quantile.  Values must be exactly representable in float64."""

    def base_partial(batch: pa.Table) -> pa.Table:
        v = _col_values(batch, column)
        if len(v) == 0:
            return pa.table(
                {"n": pa.array([0], pa.int64()),
                 "lo": pa.array([np.inf]), "hi": pa.array([-np.inf])}
            )
        return pa.table(
            {"n": pa.array([len(v)], pa.int64()),
             "lo": pa.array([float(v.min())]), "hi": pa.array([float(v.max())])}
        )

    rows = ds.map_batches(base_partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    if n == 0:
        raise ValueError(f"quantile of empty column {column}")
    lo0 = min(r["lo"] for r in rows)
    hi0 = max(r["hi"] for r in rows)
    edges0 = np.linspace(lo0, hi0, _BINS + 1)
    counts0 = _histogram(ds, column, edges0) if lo0 != hi0 else None

    out = []
    for q in qs:
        fq = Fraction(str(q))
        rank = max(0, -((-fq.numerator * n) // fq.denominator) - 1)  # exact ceil-1
        lo, hi = lo0, hi0
        counts, edges = counts0, edges0
        done = False
        for _ in range(_MAX_PASSES):
            if lo == hi:
                out.append(lo)
                done = True
                break
            if counts is None:
                edges = np.linspace(lo, hi, _BINS + 1)
                counts = _histogram(ds, column, edges)
            rank, new_lo, new_hi, in_bin, last = _step(counts, edges, rank)
            if in_bin <= _MAX_GATHER or (new_lo, new_hi) == (lo, hi):
                out.append(_gather_select(ds, column, new_lo, new_hi, last, rank))
                done = True
                break
            lo, hi = new_lo, new_hi
            counts = None  # next window needs a fresh histogram
        if not done:
            raise RuntimeError("quantile selection did not converge")
    return out


def quantile_disc(ds, column: str, q: float) -> float:
    """Single-quantile convenience wrapper over quantiles_disc."""
    return quantiles_disc(ds, column, [q])[0]
