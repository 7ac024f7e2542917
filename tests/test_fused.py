"""Differential test: the fused single-shuffle correlator must produce
EXACTLY the same routed row set as the two-phase path, for random alert
streams (hypothesis) — the fused path is a pure physical optimization."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sagan_ray.pipelines.flagship import coalesce_alerts
from sagan_ray.rules import parse_rules
from sagan_ray.stages.correlate import (
    apply_correlation,
    apply_correlation_fused,
    apply_xbits,
    can_fuse,
)

RULES_TEXT = """
alert any any any -> any any (msg:"plain"; sid:1; content:"aa"; classtype:misc-activity;)
alert any any any -> any any (msg:"lim"; sid:2; content:"bb"; classtype:bad-unknown; threshold: type limit, track by_host, count 2, seconds 100;)
alert any any any -> any any (msg:"aft"; sid:3; content:"cc"; classtype:bad-unknown; after: track by_host, count 1, seconds 100;)
alert any any any -> any any (msg:"sup"; sid:4; content:"dd"; classtype:misc-activity; threshold: type suppress, track by_host, count 3, seconds 100;)
alert any any any -> any any (msg:"set"; sid:5; content:"ee"; classtype:not-suspicious; xbits:set,b1,track by_host,expire 150;)
alert any any any -> any any (msg:"iss"; sid:6; content:"ff"; classtype:correlated-attack; xbits:isset,b1,track by_host;)
alert any any any -> any any (msg:"nots"; sid:7; content:"gg"; classtype:misc-activity; xbits:isnotset,b1,track by_host;)
"""
RULES, _ = parse_rules(RULES_TEXT)
assert can_fuse(RULES)
SID_META = {r.sid: r for r in RULES}


def alerts_table(rows):
    """rows: (sid, host, ts_sec) triples."""
    n = len(rows)
    return pa.table(
        {
            "url": pa.array([f"u{i:04d}" for i in range(n)]),
            "warc_ts": pa.array(
                [r[2] * 1_000_000 for r in rows], type=pa.timestamp("us")
            ),
            "host": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * n),
            "text": pa.array(["t"] * n),
            "sid": pa.array([r[0] for r in rows], type=pa.int64()),
            "rev": pa.array([1] * n, type=pa.int32()),
            "msg": pa.array([SID_META[r[0]].msg for r in rows]),
            "classification": pa.array([SID_META[r[0]].classtype for r in rows]),
            "priority": pa.array([2] * n, type=pa.int32()),
        }
    )


def routed_set(ds):
    pdf = ds.to_pandas()
    if pdf.empty or "url" not in pdf.columns:
        return []
    return sorted(zip(pdf["url"], pdf["sid"]))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=7),
            st.sampled_from(["h1", "h2"]),
            st.integers(min_value=0, max_value=400),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_fused_equals_two_phase(ray_session, rows):
    import ray.data as rd

    alerts = rd.from_arrow(alerts_table(rows)).materialize()
    two_phase = apply_xbits(
        apply_correlation(alerts, RULES).materialize(), RULES
    )
    fused = apply_correlation_fused(alerts, RULES)
    assert routed_set(two_phase) == routed_set(fused)


def test_fused_large_random(ray_session):
    """One bigger randomized instance across many hosts/batches."""
    import ray.data as rd

    rng = np.random.RandomState(11)
    n = 3000
    rows = [
        (int(rng.randint(1, 8)), f"h{rng.randint(0, 20)}", int(rng.randint(0, 5000)))
        for _ in range(n)
    ]
    alerts = (
        rd.from_arrow(alerts_table(rows))
        .map_batches(lambda t: t, batch_size=128, batch_format="pyarrow")
        .materialize()
    )
    alerts = coalesce_alerts(alerts).materialize()
    two_phase = apply_xbits(
        apply_correlation(alerts, RULES).materialize(), RULES
    )
    fused = apply_correlation_fused(alerts, RULES)
    assert routed_set(two_phase) == routed_set(fused)
