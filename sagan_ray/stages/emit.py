"""Network re-emit sinks: syslog (UDP/RFC3164) and SMTP.

Reference semantics: ``src/output-plugins/alert-syslog.c`` (re-emit
every alert through syslog(3)) and ``src/output-plugins/esmtp.c`` (one
mail per alert at or above a priority threshold). Ray-Data-first shape:
both are terminal ``map_batches`` stages over the routed-alert stream —
formatting is vectorized per block, the network handle is per-ACTOR
state (one socket / one SMTP session per actor, ``__init__``-owned, not
per batch), and each block reduces to an (n_ok, n_fail) pair so the
driver sees counts, never rows.

Delivery contract: fire-and-forget like upstream (syslog is UDP; a
dropped datagram is dropped). These sinks do NOT participate in the
retry-idempotent file-sink protocol — a Ray task retry re-emits its
block, exactly as a crashed upstream Sagan re-emits on replay of its
FIFO. Keep the authoritative record in the parquet sinks; these are
notification fan-outs.

SMTP transport is injectable (``transport(messages) -> n_sent``) so the
operator is testable and usable without a reachable MTA — the same
injectable-transport pattern as the Bluedot enrichment actor. The
default transport speaks real ``smtplib`` to ``host:port``.
"""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.compute as pc

_MON = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
        "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def _severity(priority_col) -> list[int]:
    """Upstream alert-syslog maps rule priority -> syslog severity;
    clamp 1..3+ into alert(1)/warning(4)/notice(5)."""
    out = []
    for p in priority_col.to_pylist():
        p = 3 if p is None else int(p)
        out.append(1 if p <= 1 else 4 if p == 2 else 5)
    return out


def format_syslog_lines(batch: pa.Table, facility: int = 13,
                        app: str = "sagan_ray",
                        hostname: str = "ray-node") -> list[bytes]:
    """RFC3164 datagrams for an alert block:
    ``<PRI>Mmm dd hh:mm:ss host app: [sid:rev] msg [classification]
    url`` — PRI = facility*8 + severity(priority). The syslog header
    timestamp is EMIT time (upstream behavior: syslog(3) stamps at call
    time); the event time stays inside the message via the url row."""
    n = batch.num_rows
    if n == 0:
        return []
    now = time.localtime()
    stamp = "%s %2d %02d:%02d:%02d" % (
        _MON[now.tm_mon - 1], now.tm_mday, now.tm_hour, now.tm_min,
        now.tm_sec)
    sev = _severity(batch["priority"]) if "priority" in batch.column_names \
        else [5] * n
    sids = batch["sid"].to_pylist()
    revs = (batch["rev"].to_pylist() if "rev" in batch.column_names
            else [1] * n)
    msgs = (pc.fill_null(batch["msg"], "").to_pylist()
            if "msg" in batch.column_names else [""] * n)
    cls = (pc.fill_null(batch["classification"], "").to_pylist()
           if "classification" in batch.column_names else [""] * n)
    urls = pc.fill_null(batch["url"], "").to_pylist()
    return [
        (f"<{facility * 8 + sev[i]}>{stamp} {hostname} {app}: "
         f"[{sids[i]}:{revs[i]}] {msgs[i]} [{cls[i]}] {urls[i]}"
         ).encode("utf-8", "replace")
        for i in range(n)
    ]


class SyslogEmitter:
    """Actor-pool UDP emitter: one socket per actor, one ``sendto`` per
    alert (syslog is datagram-per-message by protocol — there is no
    batched framing to vectorize; the format pass IS vectorized)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 514,
                 facility: int = 13, app: str = "sagan_ray",
                 hostname: str = "ray-node"):
        import socket

        self.addr = (host, port)
        self.facility, self.app, self.hostname = facility, app, hostname
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_ok = n_fail = 0
        for line in format_syslog_lines(batch, self.facility, self.app,
                                        self.hostname):
            try:
                self.sock.sendto(line[:65000], self.addr)
                n_ok += 1
            except OSError:
                n_fail += 1
        return pa.table({"n_ok": pa.array([n_ok], type=pa.int64()),
                         "n_fail": pa.array([n_fail], type=pa.int64())})


def syslog_sink(alerts_ds, host: str = "127.0.0.1", port: int = 514,
                facility: int = 13, concurrency: int = 2,
                app: str = "sagan_ray", hostname: str = "ray-node") -> dict:
    """Re-emit every routed alert as an RFC3164 UDP datagram; returns
    {'n_ok': ..., 'n_fail': ...}. Size ``concurrency`` to the receiving
    collector, not the cluster — the collector is the bottleneck."""
    stats = alerts_ds.map_batches(
        SyslogEmitter, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs=dict(host=host, port=port,
                                   facility=facility, app=app,
                                   hostname=hostname),
    ).to_pandas().sum()
    return {"n_ok": int(stats["n_ok"]), "n_fail": int(stats["n_fail"])}


def format_alert_mail(batch: pa.Table, mail_from: str,
                      mail_to: str,
                      email_by_sid: dict | None = None) -> list[bytes]:
    """One RFC822 message per alert (upstream esmtp.c: subject is the
    rule msg, body carries the alert detail). ``email_by_sid`` routes
    per RULE (upstream's per-rule ``email:`` option): an alert whose
    sid has an entry mails to that address, others to ``mail_to``."""
    from email.message import EmailMessage

    email_by_sid = email_by_sid or {}
    out = []
    sids = batch["sid"].to_pylist()
    msgs = (pc.fill_null(batch["msg"], "").to_pylist()
            if "msg" in batch.column_names else [""] * batch.num_rows)
    cls = (pc.fill_null(batch["classification"], "").to_pylist()
           if "classification" in batch.column_names
           else [""] * batch.num_rows)
    urls = pc.fill_null(batch["url"], "").to_pylist()
    ts = (batch["warc_ts"].to_pylist() if "warc_ts" in batch.column_names
          else [None] * batch.num_rows)
    def hdr(s: str) -> str:
        # EmailMessage raises ValueError on CR/LF in header values — a
        # rule msg with an embedded newline must degrade to a space,
        # not kill the batch (flag-and-keep contract)
        return s.replace("\r", " ").replace("\n", " ")

    for i in range(batch.num_rows):
        m = EmailMessage()
        m["From"] = mail_from
        m["To"] = hdr(email_by_sid.get(sids[i], mail_to))
        m["Subject"] = hdr(f"[sagan_ray] [{sids[i]}] {msgs[i]}")
        m.set_content(
            f"sid: {sids[i]}\nclassification: {cls[i]}\n"
            f"event_time: {ts[i]}\nurl: {urls[i]}\n")
        out.append(m.as_bytes())
    return out


def make_smtp_transport(host: str, port: int = 25,
                        mail_from: str = "sagan@localhost",
                        mail_to: str = "root@localhost",
                        timeout_s: float = 10.0):
    """Default transport: one smtplib session per CALL (i.e. per block
    when used via smtp_sink's actor — the actor holds the transport,
    the session re-dials per block so a dead MTA never wedges an
    actor)."""
    def send(messages: list[bytes]) -> int:
        import smtplib
        from email.parser import BytesHeaderParser

        # envelope rcpt comes from each message's To header, so
        # per-rule `email:` routing rides the same transport contract
        # (list[bytes] -> n_sent) the injectable fakes use
        parser = BytesHeaderParser()
        n = 0
        with smtplib.SMTP(host, port, timeout=timeout_s) as s:
            for msg in messages:
                # per-message failure isolation: one rejected recipient
                # must not abort the rest of the block nor zero the
                # count of mails already delivered
                try:
                    rcpt = parser.parsebytes(msg)["To"] or mail_to
                    s.sendmail(mail_from, [rcpt], msg)
                    n += 1
                except smtplib.SMTPServerDisconnected:
                    break  # session dead: nothing further can send
                except smtplib.SMTPException:
                    continue
        return n

    return send


class SmtpEmitter:
    """Actor-pool mail emitter over an injectable transport."""

    def __init__(self, transport, mail_from: str, mail_to: str,
                 min_priority: int | None = None,
                 email_by_sid: dict | None = None):
        self.transport = transport
        self.mail_from, self.mail_to = mail_from, mail_to
        self.min_priority = min_priority
        self.email_by_sid = email_by_sid

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.min_priority is not None and "priority" in batch.column_names:
            # upstream esmtp: only alerts AT OR ABOVE the threshold
            # (priority 1 is highest, so keep <= min_priority)
            batch = batch.filter(pc.less_equal(
                pc.fill_null(batch["priority"], 99), self.min_priority))
        msgs = format_alert_mail(batch, self.mail_from, self.mail_to,
                                 self.email_by_sid)
        n_ok = n_fail = 0
        if msgs:
            try:
                n_ok = int(self.transport(msgs))
                n_fail = len(msgs) - n_ok
            except Exception:
                n_fail = len(msgs)
        return pa.table({"n_ok": pa.array([n_ok], type=pa.int64()),
                         "n_fail": pa.array([n_fail], type=pa.int64())})


def smtp_sink(alerts_ds, transport=None, host: str = "127.0.0.1",
              port: int = 25, mail_from: str = "sagan@localhost",
              mail_to: str = "root@localhost",
              min_priority: int | None = 1, concurrency: int = 2,
              email_by_sid: dict | None = None) -> dict:
    """Mail each alert at or above ``min_priority`` (1 = highest; None
    = all); returns {'n_ok': ..., 'n_fail': ...}. Pass ``transport``
    (callable: list[bytes] -> n_sent) to use anything but a real MTA.
    ``email_by_sid`` (sid -> address) implements the per-rule
    ``email:`` option: those alerts mail to the rule's address, the
    rest to ``mail_to``; the engine builds it from the parsed ruleset.
    Keep ``min_priority`` tight — mailing 10^12 alerts is a self-DoS;
    upstream gates the same way."""
    transport = transport or make_smtp_transport(host, port, mail_from,
                                                 mail_to)
    stats = alerts_ds.map_batches(
        SmtpEmitter, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs=dict(transport=transport,
                                   mail_from=mail_from, mail_to=mail_to,
                                   min_priority=min_priority,
                                   email_by_sid=email_by_sid),
    ).to_pandas().sum()
    return {"n_ok": int(stats["n_ok"]), "n_fail": int(stats["n_fail"])}
