"""syslog / SMTP re-emit sinks (stages/emit.py) — round-4 closures of
the two declared network-sink gaps: syslog is driven end-to-end over
loopback UDP (a real socket listener collects the datagrams), SMTP over
the injectable transport."""
import re
import socket
import threading

import pyarrow as pa


def _alerts(n=6):
    return pa.table({
        "url": [f"https://h.example.com/d/{i}" for i in range(n)],
        "sid": pa.array([1000001 + (i % 2) for i in range(n)],
                        type=pa.int64()),
        "rev": pa.array([1] * n, type=pa.int32()),
        "msg": [f"alert {i}" for i in range(n)],
        "classification": ["misc-activity"] * n,
        "priority": pa.array([1 + (i % 3) for i in range(n)],
                             type=pa.int32()),
    })


def test_format_syslog_lines_rfc3164():
    from sagan_ray.stages.emit import format_syslog_lines

    lines = format_syslog_lines(_alerts(3), facility=13)
    assert len(lines) == 3
    # priority 1 -> severity 1 (PRI 105), 2 -> 4 (108), 3 -> 5 (109)
    pris = [int(re.match(rb"<(\d+)>", ln).group(1)) for ln in lines]
    assert pris == [105, 108, 109]
    assert b"[1000001:1] alert 0 [misc-activity] " in lines[0]
    # RFC3164 header shape: <PRI>Mmm dd hh:mm:ss host app:
    assert re.match(
        rb"<\d+>[A-Z][a-z]{2} [ \d]\d \d\d:\d\d:\d\d ray-node sagan_ray: ",
        lines[0])


def test_syslog_sink_over_loopback_udp(ray_session):
    import ray.data as rd

    from sagan_ray.stages.emit import syslog_sink

    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    recv.settimeout(5.0)
    port = recv.getsockname()[1]
    got: list[bytes] = []

    def collect():
        while len(got) < 6:
            try:
                got.append(recv.recvfrom(65536)[0])
            except socket.timeout:
                return

    t = threading.Thread(target=collect)
    t.start()
    stats = syslog_sink(rd.from_arrow(_alerts(6)), host="127.0.0.1",
                        port=port, concurrency=1)
    t.join()
    recv.close()
    assert stats == {"n_ok": 6, "n_fail": 0}
    assert len(got) == 6
    sids = sorted(int(re.search(rb"\[(\d+):", g).group(1)) for g in got)
    assert sids == sorted([1000001, 1000002] * 3)


def test_smtp_sink_with_injected_transport(ray_session):
    import ray
    import ray.data as rd

    from sagan_ray.stages.emit import smtp_sink

    # collect messages through a named actor: the transport closure runs
    # inside map_batches actors, so a plain list would stay worker-local
    @ray.remote
    class Box:
        def __init__(self):
            self.msgs = []

        def add(self, ms):
            self.msgs.extend(ms)
            return len(ms)

        def all(self):
            return self.msgs

    box = Box.options(name="smtp_box_test").remote()

    def transport(messages):
        return ray.get(box.add.remote(messages))

    # min_priority=1: only the two priority-1 alerts mail
    stats = smtp_sink(rd.from_arrow(_alerts(6)), transport=transport,
                      min_priority=1, concurrency=1)
    msgs = ray.get(box.all.remote())
    ray.kill(box)
    assert stats == {"n_ok": 2, "n_fail": 0}
    assert len(msgs) == 2
    assert all(b"Subject: [sagan_ray] [" in m for m in msgs)
    assert all(b"classification: misc-activity" in m for m in msgs)


def test_smtp_sink_transport_failure_counts(ray_session):
    import ray.data as rd

    from sagan_ray.stages.emit import smtp_sink

    def broken(messages):
        raise ConnectionError("no MTA here")

    stats = smtp_sink(rd.from_arrow(_alerts(4)), transport=broken,
                      min_priority=None, concurrency=1)
    assert stats == {"n_ok": 0, "n_fail": 4}


def test_engine_config_syslog_re_emit(ray_session, tmp_path):
    """EngineConfig.run with a syslog sink configured: the routed
    parquet sinks stay authoritative and every routed alert re-emits
    over loopback UDP (manifest carries the emit counts)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from sagan_ray.engine import EngineConfig
    from sagan_ray.sources.webpages import derive_batch

    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 8 << 20)
    recv.bind(("127.0.0.1", 0))
    recv.settimeout(5.0)
    port = recv.getsockname()[1]
    got: list[bytes] = []

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    ds = rd.from_arrow(t.slice(0, 120)).map_batches(
        derive_batch, batch_format="pyarrow")
    cfg = EngineConfig(syslog={"host": "127.0.0.1", "port": port,
                               "concurrency": 1})

    def collect():
        while True:
            try:
                got.append(recv.recvfrom(65536)[0])
            except socket.timeout:
                return

    th = threading.Thread(target=collect)
    th.start()
    manifest = cfg.run(ds, str(tmp_path / "run"))
    th.join()
    recv.close()
    n_routed = sum(manifest["sinks"].values())
    assert n_routed > 0
    # every datagram SENT successfully; UDP delivery itself is lossy by
    # protocol (the sink's documented fire-and-forget contract), and a
    # loaded suite can overflow even a large loopback RCVBUF — assert
    # substantial arrival, not exactness
    assert manifest["syslog"] == {"n_ok": n_routed, "n_fail": 0}
    # upper bound stays exact: loopback UDP never duplicates, so a
    # double-emitting sink regression still fails here
    assert n_routed // 2 <= len(got) <= n_routed
    assert all(b"ray-node sagan_ray:" in g for g in got[:20])


def test_per_rule_email_routing(ray_session):
    """Two rules with distinct `email:` options fan their alerts to two
    addresses; sids without an entry fall back to mail_to — verified
    through the injected transport's To headers."""
    import ray
    import ray.data as rd

    from sagan_ray.rules import parse_rule
    from sagan_ray.stages.emit import smtp_sink

    r1 = parse_rule(
        'alert any any any -> any any (msg:"one"; content:"x"; '
        'email:"soc@example.com"; sid:1000001; rev:1;)')
    r2 = parse_rule(
        'alert any any any -> any any (msg:"two"; content:"y"; '
        'email:ops@example.com; sid:1000002; rev:1;)')
    assert r1.email == "soc@example.com"
    assert r2.email == "ops@example.com"
    email_by_sid = {r.sid: r.email for r in (r1, r2) if r.email}

    @ray.remote
    class Box:
        def __init__(self):
            self.msgs = []

        def add(self, ms):
            self.msgs.extend(ms)
            return len(ms)

        def all(self):
            return self.msgs

    box = Box.options(name="smtp_email_box").remote()

    def transport(messages):
        return ray.get(box.add.remote(messages))

    alerts = pa.table({
        "url": ["u1", "u2", "u3"],
        "sid": pa.array([1000001, 1000002, 9999999], type=pa.int64()),
        "msg": ["a", "b", "c"],
        "classification": ["misc-activity"] * 3,
        "priority": pa.array([1, 1, 1], type=pa.int32()),
    })
    stats = smtp_sink(rd.from_arrow(alerts), transport=transport,
                      min_priority=1, concurrency=1,
                      email_by_sid=email_by_sid)
    msgs = ray.get(box.all.remote())
    ray.kill(box)
    assert stats == {"n_ok": 3, "n_fail": 0}
    tos = sorted(re.search(rb"^To: (.+)$", m, re.M).group(1) for m in msgs)
    assert tos == [b"ops@example.com", b"root@localhost",
                   b"soc@example.com"]
