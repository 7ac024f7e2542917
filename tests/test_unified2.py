"""unified2 binary sink (stages/unified2.py): spec-shaped records,
vectorized block pack, retry-idempotent spool files, round-trip read."""
import os

import numpy as np
import pyarrow as pa


def _alerts(n=8):
    return pa.table({
        "url": [f"https://h.example.com/d/{i}" for i in range(n)],
        "warc_ts": pa.array(
            [1_700_000_000_000_000 + i * 1_500_000 for i in range(n)],
            type=pa.int64()).cast(pa.timestamp("us")),
        "sid": pa.array([1000001 + (i % 3) for i in range(n)],
                        type=pa.int64()),
        "rev": pa.array([2] * n, type=pa.int32()),
        "classification": ["misc-activity" if i % 2 else "bad-unknown"
                           for i in range(n)],
        "priority": pa.array([1 + (i % 3) for i in range(n)],
                             type=pa.int32()),
        "src_ip": [f"10.0.{i}.1" for i in range(n)],
        "dst_ip": ["203.0.113.7"] * (n - 1) + [None],
        "src_port": pa.array([1000 + i for i in range(n)],
                             type=pa.int32()),
        "proto": (["tcp", "udp", "icmp", "other"] * (n // 4 + 1))[:n],
    })


def test_pack_is_spec_shaped():
    from sagan_ray.stages.unified2 import U2_IDS_EVENT, pack_unified2

    payload, cls_map = pack_unified2(_alerts(8))
    assert len(payload) == 8 * 60  # (8B header + 52B record) per event
    # first record header: type 7, length 52, big-endian
    assert int.from_bytes(payload[0:4], "big") == U2_IDS_EVENT
    assert int.from_bytes(payload[4:8], "big") == 52
    assert set(cls_map) == {"misc-activity", "bad-unknown"}


def test_round_trip_fields(tmp_path):
    from sagan_ray.stages.unified2 import pack_unified2, read_unified2

    t = _alerts(8)
    payload, _ = pack_unified2(t)
    p = str(tmp_path / "u2.log")
    with open(p, "wb") as f:
        f.write(payload)
    evs = read_unified2(p)
    assert len(evs) == 8
    assert [e["signature_id"] for e in evs] == t["sid"].to_pylist()
    assert evs[0]["ip_source"] == "10.0.0.1"
    assert evs[0]["ip_destination"] == "203.0.113.7"
    assert evs[-1]["ip_destination"] == "0.0.0.0"  # null -> 0.0.0.0
    assert [e["protocol"] for e in evs[:4]] == [6, 17, 1, 0]
    assert evs[3]["sport_itype"] == 1003
    # event time: seconds + microseconds reconstruct the us timestamp
    us = evs[1]["event_second"] * 1_000_000 + evs[1]["event_microsecond"]
    assert us == 1_700_000_001_500_000
    # replay-stable event ids: same input -> same ids
    evs2 = read_unified2(p)
    assert [e["event_id"] for e in evs] == [e["event_id"] for e in evs2]
    assert len({e["event_id"] for e in evs}) == 8  # distinct per url


def test_unified2_sink_end_to_end(ray_session, tmp_path):
    import ray.data as rd

    from sagan_ray.stages.unified2 import read_unified2, unified2_sink

    u2 = str(tmp_path / "u2")
    stats = unified2_sink(rd.from_arrow(_alerts(8)), u2)
    assert stats["n_events"] == 8 and stats["n_files"] >= 1
    files = [f for f in os.listdir(u2) if f.startswith("unified2-")]
    assert len(files) == stats["n_files"]
    evs = []
    for f in files:
        evs.extend(read_unified2(os.path.join(u2, f)))
    assert sorted(e["sport_itype"] for e in evs) == list(range(1000, 1008))
    # classification sidecar maps every emitted id
    side = open(os.path.join(u2, "classification.map")).read()
    ids = {e["classification_id"] for e in evs}
    for cid in ids:
        assert f"{cid}: " in side
    # re-running into the same dir is idempotent in CONTENT
    stats2 = unified2_sink(rd.from_arrow(_alerts(8)), u2)
    assert stats2["n_events"] == 8


def test_ipv6_and_garbage_ips_become_zero():
    from sagan_ray.stages.unified2 import _ipv4_u32

    col = pa.array(["2001:db8::1", "not-an-ip", "999.1.1.1", "1.2.3.4",
                    None])
    out = _ipv4_u32(col, 5)
    assert out.tolist() == [0, 0, 0, (1 << 24) | (2 << 16) | (3 << 8) | 4,
                            0]
    assert out.dtype == np.uint32


def test_unified2_rerun_clears_stale_spool(ray_session, tmp_path):
    """Re-running into the same spool dir must not leave the previous
    run's differently-named files behind (consumers would double-count
    — the route_alerts fresh-fan-out rule)."""
    import ray.data as rd

    from sagan_ray.stages.unified2 import read_unified2, unified2_sink

    u2 = str(tmp_path / "u2")
    unified2_sink(rd.from_arrow(_alerts(8)), u2)
    unified2_sink(rd.from_arrow(_alerts(8)), u2)
    files = [f for f in os.listdir(u2) if f.startswith("unified2-")]
    total = sum(len(read_unified2(os.path.join(u2, f))) for f in files)
    assert total == 8  # not 16


def test_unified2_ns_timestamps_normalize():
    """ns-provenance timestamp blocks must not wrap the uint32 seconds
    field — cast to us first."""
    from sagan_ray.stages.unified2 import pack_unified2, read_unified2

    t = _alerts(2)
    t = t.set_column(t.column_names.index("warc_ts"), "warc_ts",
                     t["warc_ts"].cast(pa.timestamp("ns")))
    payload, _ = pack_unified2(t)
    import io, tempfile
    with tempfile.NamedTemporaryFile(suffix=".log", delete=False) as f:
        f.write(payload)
        p = f.name
    evs = read_unified2(p)
    os.unlink(p)
    us = evs[0]["event_second"] * 1_000_000 + evs[0]["event_microsecond"]
    assert us == 1_700_000_000_000_000


def test_unified2_pack_read_fuzz():
    """Property fuzz: arbitrary alert field values survive the binary
    round-trip (clamps and zero-fills included)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sagan_ray.stages.unified2 import pack_unified2, read_unified2

    @settings(max_examples=30, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(0, 2**31 - 1),          # sid
                  st.integers(-5, 80000),             # src_port (clamped)
                  st.sampled_from(["tcp", "udp", "icmp", "", "x"]),
                  st.one_of(st.none(), st.ip_addresses(v=4).map(str),
                            st.just("bogus"))),
        min_size=1, max_size=20))
    def prop(rows):
        import tempfile

        t = pa.table({
            "url": [f"u{i}" for i in range(len(rows))],
            "sid": pa.array([r[0] for r in rows], type=pa.int64()),
            "src_port": pa.array([r[1] for r in rows], type=pa.int32()),
            "proto": [r[2] for r in rows],
            "src_ip": pa.array([r[3] for r in rows],
                               type=pa.string()),
        })
        payload, _ = pack_unified2(t)
        with tempfile.NamedTemporaryFile(suffix=".log",
                                         delete=False) as f:
            f.write(payload)
            p = f.name
        evs = read_unified2(p)
        os.unlink(p)
        assert len(evs) == len(rows)
        for ev, r in zip(evs, rows):
            assert ev["signature_id"] == r[0]
            assert ev["sport_itype"] == min(max(r[1], 0), 65535)
            exp_proto = {"tcp": 6, "udp": 17, "icmp": 1}.get(r[2], 0)
            assert ev["protocol"] == exp_proto
            if r[3] is None or r[3] == "bogus":
                assert ev["ip_source"] == "0.0.0.0"
            else:
                assert ev["ip_source"] == r[3]

    prop()
