"""Per-partition lineage + checkpoint/resume.

Reference analogue: Sagan persists correlation state in mmap'd IPC files
across restarts (``src/ipc.c`` IPC_Init) but cannot replay its input (a
FIFO is gone once read). We strengthen this to exactly-once per
partition: the EXPENSIVE stage (parse+match over raw input) checkpoints
its alert output per input-file partition with a lineage record; a
resumed run replays only unfinished partitions. The cheap downstream
stage (correlate+route over the checkpointed alerts, orders of magnitude
smaller than the input) always re-runs from checkpoints, so correlation
groups that span partitions stay globally correct — deterministically,
because every stage is a pure function of its input and event time.

Layout under ``run_dir``::

    ckpt/part_id=<pid>/*.parquet      # checkpointed alerts per partition
    _lineage/part-<pid>.json          # {partition_id, input_file, rows_in,
                                      #  alerts, status}
    sinks/classification=<cls>/...    # routed output (stage B)
    manifest.json                     # per-sink counts

A partition id is deterministic: sha1 of the input file path (8 hex) —
replay-stable across runs and machines.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil


def partition_id(input_file: str) -> str:
    """sha1 of the full NORMALIZED path (12 hex): hive layouts routinely
    repeat basenames (day=01/part-0.parquet, day=02/part-0.parquet), so
    a basename hash would merge distinct partitions — checkpoints would
    collide and clear_stale_partition could delete a sibling's alerts."""
    norm = os.path.normpath(os.path.abspath(input_file))
    return hashlib.sha1(norm.encode()).hexdigest()[:12]


def lineage_dir(run_dir: str) -> str:
    return os.path.join(run_dir, "_lineage")


def completed_partitions(run_dir: str) -> dict[str, dict]:
    d = lineage_dir(run_dir)
    done: dict[str, dict] = {}
    if not os.path.isdir(d):
        return done
    for f in os.listdir(d):
        if f.startswith("part-") and f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                rec = json.load(fh)
            if rec.get("status") == "done":
                done[rec["partition_id"]] = rec
    return done


def record_partition(run_dir: str, rec: dict) -> None:
    d = lineage_dir(run_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".part-{rec['partition_id']}.tmp")
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(d, f"part-{rec['partition_id']}.json"))


def clear_stale_partition(run_dir: str, pid: str) -> None:
    """Remove a half-written checkpoint dir so replay is idempotent."""
    p = os.path.join(run_dir, "ckpt", f"part_id={pid}")
    if os.path.isdir(p):
        shutil.rmtree(p)
