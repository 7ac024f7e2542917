"""Redis list input — a stdlib-socket RESP client (no redis-py).

Upstream Sagan's redis input (public tree: ``src/redis.c``) BLPOPs log
lines off a Redis list and feeds them into the same pipeline as the
FIFO reader. This module re-creates that surface with ~100 lines of
RESP2 over a plain socket (the protocol is length-prefixed and trivial
to speak), behind the same injectable-transport seam as the SMTP /
Bluedot stages: pass ``connect=`` a socket factory to test against a
fake server, or let it dial ``host:port`` for a real one.

Scale shape: a Redis list is a SINGLE-endpoint queue, so the drain is
inherently one consumer (upstream is single-threaded here too) — the
driver drains bounded batches and hands them to Ray Data, which
distributes the parse/match stages. For sustained multi-node ingest,
shard across keys (one ``drain_list`` per shard) exactly as upstream
scales by running multiple instances.
"""

from __future__ import annotations

import socket

import pyarrow as pa

_CRLF = b"\r\n"


def resp_encode(*args) -> bytes:
    """RESP array of bulk strings — the client->server command form."""
    out = [b"*%d" % len(args), _CRLF]
    for a in args:
        b = a if isinstance(a, bytes) else str(a).encode()
        out += [b"$%d" % len(b), _CRLF, b, _CRLF]
    return b"".join(out)


class RespError(RuntimeError):
    """Server-side ``-ERR ...`` reply."""


def resp_read(rd) -> object:
    """Parse ONE reply from a buffered binary reader: simple string,
    error (raised), integer, bulk string (bytes | None), array
    (list | None). Recursion depth is reply nesting depth (tiny)."""
    line = rd.readline()
    if not line.endswith(_CRLF):
        raise ConnectionError("short RESP reply")
    kind, body = line[:1], line[1:-2]
    if kind == b"+":
        return body.decode()
    if kind == b"-":
        raise RespError(body.decode())
    if kind == b":":
        return int(body)
    if kind == b"$":
        n = int(body)
        if n < 0:
            return None
        data = rd.read(n + 2)
        if len(data) != n + 2:
            raise ConnectionError("short RESP bulk")
        return data[:-2]
    if kind == b"*":
        n = int(body)
        if n < 0:
            return None
        return [resp_read(rd) for _ in range(n)]
    raise ConnectionError(f"bad RESP type byte {kind!r}")


class RedisClient:
    """Minimal RESP2 client: ``command()`` plus the list ops the
    source needs. ``connect``: injectable socket factory
    ``() -> socket-like`` (needs ``sendall``/``makefile``/``close``);
    default dials ``host:port`` with ``timeout``."""

    def __init__(self, host: str = "127.0.0.1", port: int = 6379,
                 timeout: float = 5.0, password: str | None = None,
                 connect=None):
        if connect is None:
            self._sock = socket.create_connection((host, port),
                                                  timeout=timeout)
        else:
            self._sock = connect()
        self._rd = self._sock.makefile("rb")
        if password is not None:
            self.command("AUTH", password)

    def command(self, *args):
        self._sock.sendall(resp_encode(*args))
        return resp_read(self._rd)

    def lpop(self, key: str):
        """One item off the left of ``key`` (bytes), or None if empty."""
        return self.command("LPOP", key)

    def blpop(self, key: str, timeout_s: float = 1.0):
        """Blocking pop: bytes, or None on timeout. Upstream's loop
        shape (``src/redis.c`` BLPOPs forever; we bound per call)."""
        rep = self.command("BLPOP", key, timeout_s)
        return None if rep is None else rep[1]

    def llen(self, key: str) -> int:
        return int(self.command("LLEN", key))

    def close(self) -> None:
        try:
            self._rd.close()
        finally:
            self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def drain_list(key: str, max_items: int, host: str = "127.0.0.1",
               port: int = 6379, block_s: float = 0.2,
               password: str | None = None, connect=None,
               timeout: float | None = None) -> pa.Table:
    """Drain up to ``max_items`` lines from list ``key`` via BLPOP —
    stops early when the queue stays empty ``block_s`` seconds (the
    bounded-batch form of upstream's endless BLPOP loop). Returns an
    Arrow table ``(text: string)`` — the FIFO line-batch shape, ready
    for ``parse_fifo_batch`` / ``parse_syslog_batch``.

    The socket timeout must OUTLAST the server-side BLPOP block, else
    the recv times out mid-pop and desyncs the connection — default:
    ``block_s`` plus a 5 s network margin."""
    lines: list[str] = []
    with RedisClient(host, port, password=password, connect=connect,
                     timeout=(timeout if timeout is not None
                              else block_s + 5.0)) as cli:
        while len(lines) < max_items:
            item = cli.blpop(key, block_s)
            if item is None:
                break
            lines.append(item.decode("utf-8", "replace"))
    return pa.table({"text": pa.array(lines, type=pa.string())})


def read_redis_list(key: str, max_items: int = 1_000_000, **kwargs):
    """``drain_list`` as a Ray Dataset (the daemon wave shape: one
    bounded drain per wave; parse/match/route distribute from there)."""
    import ray.data as rd

    return rd.from_arrow(drain_list(key, max_items, **kwargs))
