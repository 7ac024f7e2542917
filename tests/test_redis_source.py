"""Redis list source (sources/redis.py): RESP protocol unit tests plus
a loopback end-to-end drive — a fake RESP server on a real TCP socket
feeds syslog lines through drain_list -> parse_syslog_batch -> a
facility/program gate, the upstream src/redis.c consumption shape."""
import io
import socket
import threading

import pyarrow as pa
import pytest

from sagan_ray.sources.redis import (RedisClient, RespError, drain_list,
                                     resp_encode, resp_read)


def test_resp_encode_command_form():
    assert resp_encode("LPOP", "k") == b"*2\r\n$4\r\nLPOP\r\n$1\r\nk\r\n"
    # bytes pass through, numbers stringify (BLPOP timeout arg)
    assert b"$3\r\n0.5\r\n" in resp_encode("BLPOP", b"k", 0.5)


def test_resp_read_all_reply_types():
    buf = io.BytesIO(
        b"+OK\r\n"
        b":42\r\n"
        b"$5\r\nhello\r\n"
        b"$-1\r\n"
        b"*2\r\n$1\r\na\r\n$1\r\nb\r\n"
        b"*-1\r\n"
    )
    assert resp_read(buf) == "OK"
    assert resp_read(buf) == 42
    assert resp_read(buf) == b"hello"
    assert resp_read(buf) is None
    assert resp_read(buf) == [b"a", b"b"]
    assert resp_read(buf) is None
    with pytest.raises(RespError):
        resp_read(io.BytesIO(b"-ERR nope\r\n"))
    with pytest.raises(ConnectionError):
        resp_read(io.BytesIO(b"$5\r\nhel"))  # truncated bulk


class FakeRedisServer:
    """One-connection RESP server over real loopback TCP serving a
    fixed list: BLPOP/LPOP/LLEN/AUTH. Speaks the same wire protocol a
    real Redis would, so the client's socket path is fully exercised."""

    def __init__(self, items: list[bytes], password: str | None = None):
        self.items = list(items)
        self.password = password
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self) -> None:
        conn, _ = self.srv.accept()
        rd = conn.makefile("rb")
        try:
            while True:
                try:
                    cmd = resp_read(rd)
                except (ConnectionError, ValueError):
                    return
                if not cmd:
                    return
                op = cmd[0].upper()
                if op == b"AUTH":
                    ok = (self.password is not None
                          and cmd[1].decode() == self.password)
                    conn.sendall(b"+OK\r\n" if ok
                                 else b"-ERR invalid password\r\n")
                elif op in (b"BLPOP", b"LPOP"):
                    if self.items:
                        it = self.items.pop(0)
                        if op == b"BLPOP":
                            key = cmd[1]
                            conn.sendall(
                                b"*2\r\n$%d\r\n%s\r\n$%d\r\n%s\r\n"
                                % (len(key), key, len(it), it))
                        else:
                            conn.sendall(b"$%d\r\n%s\r\n" % (len(it), it))
                    else:
                        conn.sendall(b"*-1\r\n" if op == b"BLPOP"
                                     else b"$-1\r\n")
                elif op == b"LLEN":
                    conn.sendall(b":%d\r\n" % len(self.items))
                else:
                    conn.sendall(b"-ERR unknown command\r\n")
        finally:
            rd.close()
            conn.close()

    def close(self) -> None:
        self.srv.close()


def test_client_ops_against_fake_server():
    srv = FakeRedisServer([b"one", b"two"])
    try:
        with RedisClient(port=srv.port) as cli:
            assert cli.llen("q") == 2
            assert cli.blpop("q") == b"one"
            assert cli.lpop("q") == b"two"
            assert cli.lpop("q") is None
            assert cli.blpop("q", 0.1) is None
    finally:
        srv.close()


def test_auth_and_bad_password():
    srv = FakeRedisServer([b"x"], password="sekrit")
    try:
        with RedisClient(port=srv.port, password="sekrit") as cli:
            assert cli.blpop("q") == b"x"
    finally:
        srv.close()
    srv2 = FakeRedisServer([], password="sekrit")
    try:
        with pytest.raises(RespError):
            RedisClient(port=srv2.port, password="wrong")
    finally:
        srv2.close()


SYSLOG_LINES = [
    b"<34>Oct 11 22:14:15 web1 sshd[230]: Failed password for root",
    b"<13>Oct 11 22:14:16 web2 nginx[11]: GET /index.html 200",
    b"<34>Oct 11 22:14:17 web3 sshd[231]: Failed password for admin",
    b"<999>Oct 11 22:14:18 bad0 x[1]: invalid PRI must drop",
]


def test_drain_list_end_to_end_through_parse_and_gate(ray_session):
    """Loopback wire -> drain_list -> parse_syslog_batch -> program
    gate, matching upstream's redis -> liblognorm -> rule flow."""
    from sagan_ray.sources.readers import parse_syslog_batch
    from sagan_ray.sources.redis import read_redis_list

    srv = FakeRedisServer(list(SYSLOG_LINES))
    try:
        tab = drain_list("logs", max_items=100, port=srv.port,
                         block_s=0.1)
    finally:
        srv.close()
    assert tab["text"].to_pylist() == [
        line.decode() for line in SYSLOG_LINES]

    parsed = parse_syslog_batch(tab)
    assert parsed.num_rows == 3  # bad PRI dropped, batch survives
    hosts = parsed["host"].to_pylist()
    assert hosts == ["web1", "web2", "web3"]
    # gate on program (the `program: sshd` prefilter shape)
    import pyarrow.compute as pc

    sshd = parsed.filter(pc.equal(parsed["program"], "sshd"))
    assert sshd.num_rows == 2

    # the Dataset form distributes from the same drain
    srv2 = FakeRedisServer(list(SYSLOG_LINES))
    try:
        ds = read_redis_list("logs", max_items=100, port=srv2.port,
                             block_s=0.1)
    finally:
        srv2.close()
    assert ds.count() == 4
    assert ds.schema().names == ["text"]


def test_drain_respects_max_items():
    srv = FakeRedisServer([b"a", b"b", b"c"])
    try:
        tab = drain_list("q", max_items=2, port=srv.port, block_s=0.1)
    finally:
        srv.close()
    assert tab.num_rows == 2
