"""Golden artifact files (FIXTURES.md §5): committed per-sink counts and
an order-insensitive routed-row-set hash; EVE sink; regenerated each run
and compared to the committed copies."""

import hashlib
import json
import os

import pyarrow.dataset as pads
import pytest

from sagan_ray.engine import EngineConfig
from sagan_ray.pipelines.flagship import load_default_rules, run_streaming
from sagan_ray.sources.webpages import webpages_from_documents

SF = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def routed_hash(sink_dir: str) -> str:
    t = pads.dataset(sink_dir, partitioning="hive").to_table()
    rows = sorted(zip(t["url"].to_pylist(), t["sid"].to_pylist()))
    h = hashlib.sha256()
    for u, s in rows:
        h.update(f"{u}\x1f{s}\n".encode())
    return h.hexdigest()


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("golden_run"))
    ds = webpages_from_documents(SF)
    run_streaming(ds, load_default_rules(), out)
    return out


def test_manifest_matches_committed(run_dir):
    with open(os.path.join(GOLDEN_DIR, "manifest.json")) as f:
        golden = json.load(f)
    with open(os.path.join(run_dir, "manifest.json")) as f:
        got = json.load(f)
    assert got == golden


def test_routed_hash_matches_committed(run_dir):
    with open(os.path.join(GOLDEN_DIR, "routed_hash.json")) as f:
        golden = json.load(f)
    assert routed_hash(os.path.join(run_dir, "sinks")) == golden["sha256"]


def test_eve_ndjson_sink(ray_session, tmp_path):
    cfg = EngineConfig(write_eve=True)
    out = str(tmp_path / "eve_run")
    manifest = cfg.run(webpages_from_documents(SF), out)
    eve_dir = os.path.join(out, "eve")
    lines = 0
    for f in os.listdir(eve_dir):
        with open(os.path.join(eve_dir, f)) as fh:
            for line in fh:
                rec = json.loads(line)
                assert "sid" in rec and "url" in rec and "classification" in rec
                lines += 1
    assert lines == manifest["total"]


def test_fast_log_sink(ray_session, tmp_path):
    import ray.data as rd

    from sagan_ray.stages.route import write_fast_log

    sink = pads.dataset  # noqa: F841 (imported at module top)
    # reuse the routed parquet from a tiny streaming run
    out = str(tmp_path / "r")
    ds = webpages_from_documents(SF)
    manifest = run_streaming(ds, load_default_rules(), out)
    alerts = rd.read_parquet(os.path.join(out, "sinks"))
    fast_dir = str(tmp_path / "fast")
    write_fast_log(alerts, fast_dir)
    lines = []
    for f in os.listdir(fast_dir):
        with open(os.path.join(fast_dir, f)) as fh:
            lines.extend(fh.read().splitlines())
    assert len(lines) == manifest["total"]
    assert "[**]" in lines[0] and "[Classification:" in lines[0]
