"""Regression tests for the round-3 package-wide review findings over
the judged core (match/correlate/route)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sagan_ray.rules import parse_rules


def _mk_rule(body: str):
    txt = ('alert any any any -> any any (msg:"t"; sid:7001; rev:1; '
           f'classtype:misc-activity; {body})')
    return parse_rules(txt)[0]


def _webpages(hours, hosts=None, texts=None):
    n = len(hours)
    return pa.table({
        "url": pa.array([f"https://h{i}.example/p{i}" for i in range(n)]),
        "warc_ts": pa.array(
            [pd.Timestamp(f"2024-03-06 {h:02d}:30:00") for h in hours],
            type=pa.timestamp("us")),
        "host": pa.array(hosts or [f"h{i}.example" for i in range(n)]),
        "lang": pa.array(["en"] * n),
        "text": pa.array(texts or ["attack marker here"] * n),
    })


def test_alert_time_wraps_midnight(ray_session):
    """hours 2200-0600 (the canonical night window) must match 23:30
    and 03:30 but not 12:30 — the old mask was always-false."""
    import ray.data as rd

    from sagan_ray.stages.match import match_alerts

    rules = _mk_rule('content:"attack"; alert_time: days 0123456, '
                     'hours 2200-0600;')
    t = _webpages([23, 3, 12, 22, 6])
    out = match_alerts(rd.from_arrow(t), rules).to_pandas()
    got_hours = sorted(pd.to_datetime(out["warc_ts"]).dt.hour.tolist())
    assert got_hours == [3, 22, 23]


def test_fast_log_survives_null_fields(ray_session, tmp_path):
    import os

    import ray.data as rd

    from sagan_ray.stages.route import write_fast_log

    t = pa.table({
        "warc_ts": pa.array([pd.Timestamp("2024-01-01"), None],
                            type=pa.timestamp("us")),
        "sid": pa.array([1, 2], type=pa.int64()),
        "rev": pa.array([1, 1], type=pa.int64()),
        "msg": pa.array(["m1", None]),
        "classification": pa.array(["c", "c"]),
        "host": pa.array([None, "h2"]),
        "url": pa.array(["u1", None]),
    })
    d = str(tmp_path / "fast")
    write_fast_log(rd.from_arrow(t), d)
    lines = []
    for p in os.listdir(d):
        with open(os.path.join(d, p)) as f:
            lines += [ln for ln in f.read().splitlines() if ln]
    assert len(lines) == 2  # the null-field row still logs (with '-')
    assert any("{HOST} -" in ln for ln in lines)


@pytest.mark.parametrize("fused", [True, False])
def test_noalert_isset_rule_never_routes(ray_session, fused):
    """A noalert rule with an xbits TEST evaluates but routes nothing
    (flagship contract); the set-side rule still routes its own alert."""
    import ray.data as rd

    from sagan_ray.stages.correlate import (
        apply_correlation_fused,
        apply_xbits,
    )
    from sagan_ray.stages.match import match_alerts

    txt = """
alert any any any -> any any (msg:"setter"; sid:8001; rev:1; classtype:misc-activity; content:"stage one"; xbits:set,chain,track by_host,expire 3600;)
alert any any any -> any any (msg:"probe"; sid:8002; rev:1; classtype:misc-activity; content:"stage two"; xbits:isset,chain,track by_host; noalert;)
"""
    rules = parse_rules(txt)[0]
    t = _webpages(
        [10, 11], hosts=["same.example", "same.example"],
        texts=["stage one here", "stage two here"])
    alerts = match_alerts(rd.from_arrow(t), rules).materialize()
    assert sorted(alerts.to_pandas()["sid"]) == [8001, 8002]
    gated = (apply_correlation_fused(alerts, rules) if fused
             else apply_xbits(alerts, rules))
    sids = sorted(gated.to_pandas()["sid"]) if gated.count() else []
    assert sids == [8001]  # the isset match fired internally but noalert


def test_missing_track_column_keys_to_empty_both_engines(ray_session):
    """track by_username with no username column: one '' group in BOTH
    xbits engines (the _track_col contract; the old fallback used host,
    splitting state per host)."""
    import ray.data as rd

    from sagan_ray.stages.correlate import (
        apply_correlation_fused,
        apply_xbits,
    )
    from sagan_ray.stages.match import match_alerts

    txt = """
alert any any any -> any any (msg:"s"; sid:8101; rev:1; classtype:misc-activity; content:"stage one"; xbits:set,u,track by_username,expire 7200;)
alert any any any -> any any (msg:"p"; sid:8102; rev:1; classtype:misc-activity; content:"stage two"; xbits:isset,u,track by_username;)
"""
    rules = parse_rules(txt)[0]
    # set on host A, probe on host B: with the '' group they correlate
    t = _webpages([10, 11], hosts=["a.example", "b.example"],
                  texts=["stage one", "stage two"])
    alerts = match_alerts(rd.from_arrow(t), rules).materialize()
    for engine in (apply_correlation_fused, apply_xbits):
        got = sorted(engine(alerts, rules).to_pandas()["sid"])
        assert got == [8101, 8102], engine.__name__


def test_eve_tee_filenames_are_content_addressed(ray_session, tmp_path):
    import os

    import ray.data as rd

    from sagan_ray.stages.route import route_alerts

    t = pa.table({
        "url": pa.array(["u1", "u2"]),
        "warc_ts": pa.array([pd.Timestamp("2024-01-01")] * 2,
                            type=pa.timestamp("us")),
        "sid": pa.array([1, 1], type=pa.int64()),
        "rev": pa.array([1, 1], type=pa.int64()),
        "msg": pa.array(["m", "m"]),
        "classification": pa.array(["c", "c"]),
        "host": pa.array(["h", "h"]),
        "lang": pa.array(["en", "en"]),
        "text": pa.array(["x", "y"]),
    })
    d1, d2 = str(tmp_path / "r1"), str(tmp_path / "r2")
    route_alerts(rd.from_arrow(t), d1, write_eve=True)
    route_alerts(rd.from_arrow(t), d2, write_eve=True)

    def lines(d):
        out = []
        for f in os.listdir(os.path.join(d, "eve")):
            with open(os.path.join(d, "eve", f)) as fh:
                out.extend(fh.read().splitlines())
        return sorted(out)

    # round-4 contract: filenames mix in a task-lineage discriminator
    # (identical-content blocks must not collide), so names are NOT
    # stable across runs — CONTENT is, and a re-route to the same dir
    # clears stale files first (no double count).
    l1, l2 = lines(d1), lines(d2)
    assert l1 == l2 and len(l1) == 2
    route_alerts(rd.from_arrow(t), d1, write_eve=True)  # re-route
    assert lines(d1) == l1


def test_read_parquet_clean_hive_partition_schema(ray_session, tmp_path):
    """Round-5 review finding: over a hive-partitioned dir the footer-
    derived schema hint omitted the partition column, so the declared
    schema disagreed with the blocks (the exact divergence the helper
    exists to prevent). The hint is skipped for hive layouts."""
    import os

    import pyarrow.parquet as pq

    from sagan_ray.sources import read_parquet_clean

    root = tmp_path / "sinks"
    for cls in ("alpha", "beta"):
        d = root / f"classification={cls}"
        os.makedirs(d)
        pq.write_table(pa.table({"sid": pa.array([1, 2], pa.int64()),
                                 "msg": pa.array(["a", "b"])}),
                       str(d / "part.parquet"))
    ds = read_parquet_clean(str(root))
    names = set(ds.schema().names)
    assert "classification" in names  # declared schema == block schema
    out = ds.to_pandas()
    assert set(out["classification"]) == {"alpha", "beta"}
    assert len(out) == 4
