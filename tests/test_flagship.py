"""Golden end-to-end + resume idempotence (SURVEY.md §5.3–5.4)."""

import os
import shutil

import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from sagan_ray.pipelines.flagship import load_default_rules, run_flagship, run_streaming
from sagan_ray.sources.webpages import webpages_from_documents

SF = "/root/testdata/sf0.001"

# Frozen golden per-sink counts for the sf0.001-derived webpages run.
# Independently cross-checked against the DuckDB oracle (run
# `python tools/check_oracles.py /root/testdata/sf0.001 wp_route_counts`).
# Any change here is a semantics change.
GOLDEN = {
    "attempted-recon": 58,
    "bad-unknown": 465,
    "correlated-attack": 557,  # after count 1 (sid 1000008) + xbits (1000011)
    "misc-activity": 218,
    "policy-violation": 152,
    "suspicious-traffic": 381,
    "web-application-activity": 542,
}


@pytest.fixture()
def part_files(tmp_path):
    t = pq.read_table(f"{SF}/documents.parquet")
    files = []
    for i in range(4):
        f = str(tmp_path / f"docs_{i}.parquet")
        pq.write_table(t.slice(i * 125, 125), f)
        files.append(f)
    return files


def _sorted_rowset(sink_dir):
    t = pads.dataset(sink_dir, partitioning="hive").to_table()
    cols = ["url", "sid", "classification"]
    return t.select(cols).sort_by([(c, "ascending") for c in cols])


def test_golden_counts(ray_session, tmp_path):
    out = str(tmp_path / "run")
    ds = webpages_from_documents(SF)
    manifest = run_streaming(ds, load_default_rules(), out)
    assert manifest["sinks"] == GOLDEN


def test_text_byte_identical_per_url(ray_session, tmp_path):
    """The judged per-row invariant: every routed row's text equals the
    input row's text for the same url, byte for byte."""
    out = str(tmp_path / "run")
    ds = webpages_from_documents(SF)
    run_streaming(ds, load_default_rules(), out)
    routed = pads.dataset(os.path.join(out, "sinks"), partitioning="hive").to_table()
    # ONE to_pandas() call: evaluating the Dataset once per column would
    # zip urls from one run against texts from another, and Ray's block
    # order is not stable across runs
    pdf = webpages_from_documents(SF).select_columns(["url", "text"]).to_pandas()
    orig = dict(zip(pdf["url"], pdf["text"]))
    for u, t in zip(routed["url"].to_pylist(), routed["text"].to_pylist()):
        assert t == orig[u]


def test_resume_idempotence(ray_session, part_files, tmp_path):
    run_a = str(tmp_path / "a")
    run_b = str(tmp_path / "b")
    rules = load_default_rules()
    m_a = run_flagship(part_files, run_a, rules)

    with pytest.raises(RuntimeError, match="injected failure"):
        run_flagship(part_files, run_b, rules, fail_after_partitions=2)
    # only 2 lineage records so far
    recs = [f for f in os.listdir(os.path.join(run_b, "_lineage")) if f.endswith(".json")]
    assert len(recs) == 2
    m_b = run_flagship(part_files, run_b, rules)
    assert m_a == m_b
    assert _sorted_rowset(os.path.join(run_a, "sinks")).equals(
        _sorted_rowset(os.path.join(run_b, "sinks"))
    )


def test_rerun_skips_completed(ray_session, part_files, tmp_path):
    run_dir = str(tmp_path / "r")
    rules = load_default_rules()
    m1 = run_flagship(part_files, run_dir, rules)
    # second run: all partitions complete -> stage A does nothing, stage B
    # rebuilds from checkpoints; manifest identical
    ckpt_mtime = {
        d: os.path.getmtime(os.path.join(run_dir, "ckpt", d))
        for d in os.listdir(os.path.join(run_dir, "ckpt"))
    }
    m2 = run_flagship(part_files, run_dir, rules)
    assert m1 == m2
    for d, mt in ckpt_mtime.items():
        assert os.path.getmtime(os.path.join(run_dir, "ckpt", d)) == mt
