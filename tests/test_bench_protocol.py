"""The bench harness's steal-window protocol (no Ray needed).

BENCH/BASELINE.md round-5: every judged per-op number is the min over
reps spread across labeled passes; a fixed single-thread probe brackets
each pass, and an op whose EVERY rep ran between contended probes gets
one redo. These tests pin the decision rule itself — the part a judge
relies on when reading BENCH_r{N}.json — without running a benchmark.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import Recorder, _fully_shadowed, _probe_once  # noqa: E402


def test_recorder_min_and_pass_tracking():
    rec = Recorder()
    rec.set_pass("q1")
    rec.add("op", 5.0)
    rec.set_pass("q2")
    rec.add("op", 3.25)
    rec.add("other", 1.0)
    assert rec.timings["op"] == 3.25  # judged number is the min
    assert rec.samples["op"] == [5.0, 3.25]  # raw reps kept in order
    assert rec.pass_of["op"] == ["q1", "q2"]
    assert rec.pass_of["other"] == ["q2"]


QUIET = [["start", 0.15], ["flag_early", 0.15], ["q1", 0.15],
         ["q2", 0.15], ["llm1", 0.15], ["flag_late", 0.15],
         ["llm2", 0.15], ["end", 0.15], ["final", 0.15]]


def _with(overrides: dict) -> list:
    return [[lab, overrides.get(lab, p)] for lab, p in QUIET]


def test_quiet_run_triggers_no_redo():
    pass_of = {"dedup_against": ["llm1", "llm2"]}
    assert not _fully_shadowed("dedup_against", pass_of, QUIET)


def test_one_clean_rep_suppresses_redo():
    # llm2 contended, llm1 clean: the llm1 rep's min is trustworthy
    probes = _with({"llm2": 0.40})
    pass_of = {"dedup_against": ["llm1", "llm2"]}
    assert not _fully_shadowed("dedup_against", pass_of, probes)


def test_window_covering_both_passes_triggers_redo():
    # the observed r5 failure: a steal window outlasting the spread —
    # probes around BOTH llm passes contended -> redo
    probes = _with({"llm1": 0.40, "flag_late": 0.45, "llm2": 0.40,
                    "end": 0.38})
    pass_of = {"dedup_against": ["llm1", "llm2"]}
    assert _fully_shadowed("dedup_against", pass_of, probes)


def test_bracketing_probe_counts_either_side():
    # q2's PRE probe is clean but its POST probe (llm1) is contended:
    # the pass is suspect (the window may have opened mid-pass)
    probes = _with({"q1": 0.40, "llm1": 0.40})
    pass_of = {"tpch_q1": ["q1", "q2"]}
    assert _fully_shadowed("tpch_q1", pass_of, probes)


def test_threshold_is_relative_to_best_probe():
    # uniformly slow probes (every probe 2x quiet) = a uniformly slower
    # machine, not a window: nothing is contended relative to the best
    probes = [[lab, p * 2] for lab, p in QUIET]
    pass_of = {"op": ["llm1", "llm2"]}
    assert not _fully_shadowed("op", pass_of, probes)


def test_unknown_op_never_redoes():
    assert not _fully_shadowed("nope", {}, QUIET)


def test_probe_runs_and_is_fast():
    dt = _probe_once()
    assert 0.0 < dt < 30.0
