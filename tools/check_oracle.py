"""Local mimic of the driver's correctness gate: run every queries()
entry at a given sf_dir, compare to oracle_sql() via DuckDB with
row-count + order-insensitive value comparison.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(np.asarray(v).tolist()))
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(mine: pd.DataFrame, ref: pd.DataFrame) -> str:
    if len(mine) != len(ref):
        return f"ROWS {len(mine)} vs {len(ref)}"
    if sorted(mine.columns) != sorted(ref.columns):
        return f"COLS {sorted(mine.columns)} vs {sorted(ref.columns)}"
    a, b = canon(mine), canon(ref)
    # dtype-strict: the driver HASHES values, so int64-vs-float64 (e.g.
    # DuckDB HUGEINT sums) mismatches even when values compare equal —
    # catch that class locally (round-1's only red cells)
    for c in a.columns:
        da, db = str(a[c].dtype), str(b[c].dtype)
        if da != db and not (len(a) == 0):
            return f"DTYPE column {c}: {da} vs {db}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            ok = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
            exact = ok
            if not exact:
                return f"VALUES column {c} (float mismatch)"
        else:
            if not av.equals(bv):
                bad = (av != bv)
                return f"VALUES column {c} ({int(bad.sum())} rows differ; e.g. {av[bad].iloc[0]!r} vs {bv[bad].iloc[0]!r})"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"{name:32s} ERROR {type(ex).__name__}: {ex}")
            fails += 1
            continue
        if name in oracles:
            try:
                ref = con.execute(oracles[name]).df()
            except Exception as ex:
                print(f"{name:32s} ORACLE-ERROR {ex}")
                fails += 1
                continue
            verdict = compare(mine, ref)
            if verdict != "OK":
                fails += 1
            print(f"{name:32s} {verdict}")
        else:
            print(f"{name:32s} rows-only ({len(mine)} rows)")
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
