"""Local stand-in for the driver's correctness harness.

Runs every ``queries()`` entry via Ray and its ``oracle_sql()`` twin via
DuckDB on the same sf dir; compares row count, column names, and an
order-insensitive value hash (rows sorted, columns sorted by name).

Usage: python tools/check_oracles.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filt = sys.argv[2] if len(sys.argv) > 2 else ""

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if filt and filt not in name:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(mine)} (rows-only, no oracle)")
            continue
        try:
            theirs = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failures += 1
            continue
        if len(mine) != len(theirs):
            print(f"FAIL {name}: rows {len(mine)} vs {len(theirs)}")
            failures += 1
            continue
        if list(mine.columns) != list(theirs.columns):
            print(f"FAIL {name}: cols {list(mine.columns)} vs {list(theirs.columns)}")
            failures += 1
            continue
        eq = True
        for c in mine.columns:
            a, b = mine[c], theirs[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    import numpy as np

                    if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                        eq = False
                elif not a.astype(str).equals(b.astype(str)):
                    eq = False
            except Exception:
                eq = False
            if not eq:
                print(f"FAIL {name}: value mismatch in col {c}")
                print("  mine:", a.head(3).tolist(), "\n  oracle:", b.head(3).tolist())
                failures += 1
                break
        if eq:
            print(f"ok   {name}: rows={len(mine)}")
    print(f"\n{failures} failures")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
