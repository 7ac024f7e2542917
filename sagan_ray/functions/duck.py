"""Shared in-process DuckDB batch kernels.

A handful of hot-path functions (md5 digests, JSON path extraction)
must match the DuckDB oracles bit-for-bit, and DuckDB itself is the
fastest vectorized implementation of them available in-process — one
C++ pass over a zero-copy-registered Arrow batch, no per-row Python.
Each worker process builds ONE connection lazily and reuses it across
batches; ``threads=1`` so a 1-cpu Ray worker stays a single thread.
"""

from __future__ import annotations

import pyarrow as pa

_CON = None


def connection():
    global _CON
    if _CON is None:
        import duckdb

        con = duckdb.connect()
        con.execute("SET threads=1")
        _CON = con
    return _CON


def project(tbl: pa.Table, sql: str, params: list | None = None) -> pa.Table:
    """Run ``sql`` with the batch registered as table ``b`` -> Arrow.

    Row order is preserved (single thread, insertion-order preserving
    connection), so projections stay positionally aligned with the
    input batch.
    """
    con = connection()
    con.register("b", tbl)
    try:
        return con.execute(sql, params).arrow()
    finally:
        con.unregister("b")


def md5_hex(values: pa.Array | pa.ChunkedArray | list) -> pa.Array:
    """Vectorized md5 hex digest of a string column (null -> null)."""
    if isinstance(values, list):
        values = pa.array(values, type=pa.string())
    res = project(pa.table({"t": values}), "SELECT md5(t) AS h FROM b")
    return res.column("h").combine_chunks().cast(pa.string())
