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
        elif df[c].dtype.kind == "M":
            # timestamp unit (ns vs us) is provenance noise, not semantics
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype.kind in "iu":
            # driver evidence (r2): int32-vs-int64 hashes EQUAL
            # (ev_rule_engine green) while int-vs-float hashes DIFFER
            # (ev_asof_join red) — so widths canonicalize, kinds don't
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def strict_diff(mine: pd.DataFrame, theirs: pd.DataFrame) -> str | None:
    """Driver-strength comparison: exact dtypes, exact values.

    The r2 driver hash failures (`ev_asof_join`, `ev_range_join`) were
    int64-vs-float64 dtype drift with identical values — invisible to
    the old astype(str)/allclose canon. This compares exactly what the
    driver hashes: dtype per column, then bit-exact values (no
    tolerance, including floats)."""
    for c in mine.columns:
        a, b = mine[c], theirs[c]
        if str(a.dtype) != str(b.dtype):
            return f"dtype mismatch in col {c}: mine={a.dtype} oracle={b.dtype}"
        try:
            pd.testing.assert_series_equal(a, b, check_exact=True,
                                           check_names=False)
        except AssertionError as e:
            return f"value mismatch in col {c}: {str(e).splitlines()[-1]}"
    return None


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
        err = strict_diff(mine, theirs)
        if err:
            print(f"FAIL {name}: {err}")
            c = err.split(" in col ", 1)[-1].split(":")[0] if " in col " in err else mine.columns[0]
            print("  mine:", mine[c].head(3).tolist(), mine[c].dtype,
                  "\n  oracle:", theirs[c].head(3).tolist(), theirs[c].dtype)
            failures += 1
        else:
            print(f"ok   {name}: rows={len(mine)}")
    print(f"\n{failures} failures")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
