"""Run state: per-partition lineage records and checkpoint/resume."""
