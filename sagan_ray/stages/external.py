"""External-program sink (reference ``src/output-plugins/external.c``:
fork/exec a program per alert with the alert text on stdin).

Re-expressed batch-wise: each alert BLOCK spawns one subprocess and
streams its alerts as EVE-style NDJSON lines to the program's stdin —
one fork per block instead of one per alert (the per-alert fork is the
reference's biggest output bottleneck; batching is the fix the Ray
execution model gives for free). The program is the user's own hook;
failures are counted, never fatal to the pipeline (upstream logs and
drops too).
"""

from __future__ import annotations

import subprocess

import pyarrow as pa

from .route import format_eve_lines


def make_external_writer(argv: list[str], timeout_s: float = 30.0):
    def write_block(batch: pa.Table) -> pa.Table:
        n_ok = 0
        n_fail = 0
        if batch.num_rows:
            lines = format_eve_lines(batch)
            try:
                proc = subprocess.run(
                    argv,
                    input=("\n".join(lines) + "\n").encode(),
                    timeout=timeout_s,
                    capture_output=True,
                )
                if proc.returncode == 0:
                    n_ok = len(lines)
                else:
                    n_fail = len(lines)
            except (OSError, subprocess.TimeoutExpired):
                n_fail = batch.num_rows
        return pa.table(
            {"n_ok": pa.array([n_ok], type=pa.int64()),
             "n_fail": pa.array([n_fail], type=pa.int64())}
        )

    return write_block


def external_sink(alerts_ds, argv: list[str], timeout_s: float = 30.0) -> dict:
    """Stream every alert block through the external program; returns
    {'n_ok': ..., 'n_fail': ...} totals."""
    stats = (
        alerts_ds.map_batches(
            make_external_writer(argv, timeout_s), batch_format="pyarrow"
        )
        .to_pandas()
        .sum()
    )
    return {"n_ok": int(stats["n_ok"]), "n_fail": int(stats["n_fail"])}
