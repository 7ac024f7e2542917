"""Log-line sources beyond Parquet: FIFO-format text, NDJSON, CSV.

Reference: Sagan's FIFO carries PIPE-DELIMITED lines
(``host|facility|priority|level|tag|date|time|program|message`` — see
upstream ``src/parsers/syslog-handler.c``); 2.x optionally accepts JSON
lines (``parse-json-message``). We re-derive both as vectorized batch
parsers over ``ray.data.read_text`` / ``read_json`` / ``read_csv``.

Our compact FIFO dialect (5 fields, the ones the engine uses):
``host|facility|level|program|message``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

FIFO_FIELDS = ["host", "facility", "level", "program", "message"]


def parse_fifo_batch(batch: pa.Table, line_col: str = "text") -> pa.Table:
    """Vectorized pipe-split of FIFO lines into syslog-event columns.

    Lines with fewer than 5 fields are dropped (the reference logs and
    skips malformed lines rather than crashing the worker)."""
    parts = pc.split_pattern(batch[line_col], "|", max_splits=4)
    n_fields = pc.list_value_length(parts)
    ok = pc.greater_equal(n_fields, 5)
    parts = parts.filter(ok) if isinstance(parts, pa.ChunkedArray) else pc.filter(parts, ok)
    cols = {
        name: pc.list_element(parts, i) for i, name in enumerate(FIFO_FIELDS)
    }
    return pa.table(cols)


def read_fifo_text(paths) -> "object":
    """read_text -> parsed syslog-event Dataset."""
    import ray.data as rd

    ds = rd.read_text(paths)
    return ds.map_batches(parse_fifo_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# RFC3164 / RFC5424 syslog line parsers (upstream: syslog-handler.c BSD
# and IETF formats). One vectorized RE2 extract_regex per batch; lines
# that match neither dialect are dropped (the reference skips malformed
# lines). facility/level names derive from PRI (pri>>3, pri&7) via
# vectorized table takes.
# ---------------------------------------------------------------------------

_RFC3164_RE = (
    r"^<(?P<pri>\d{1,3})>"
    r"(?P<ts>[A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) "
    r"(?P<host>\S+) (?P<program>[^:\[\s]+)(?:\[(?P<pid>\d+)\])?: "
    r"(?P<message>.*)$"
)
_RFC5424_RE = (
    r"^<(?P<pri>\d{1,3})>\d+ (?P<ts>\S+) (?P<host>\S+) "
    r"(?P<program>\S+) (?P<procid>\S+) (?P<msgid>\S+) "
    # structured-data: '-' or one-or-more [..] elements, matched
    # non-greedily so a ']' inside the free-form message is not eaten
    r"(?:-|(?:\[[^\]]*\])+) ?(?P<message>.*)$"
)

_FACILITIES = pa.array(
    "kern user mail daemon auth syslog lpr news uucp cron authpriv ftp "
    "ntp audit alert clock local0 local1 local2 local3 local4 local5 "
    "local6 local7".split()
)
_LEVELS = pa.array(
    "emerg alert crit err warning notice info debug".split()
)


def _pri_names(pri: pa.Array) -> tuple[pa.Array, pa.Array]:
    p = pc.cast(pri, pa.int32())
    fac = pc.take(_FACILITIES, pc.shift_right(p, 3))
    lvl = pc.take(_LEVELS, pc.bit_wise_and(p, 7))
    return fac, lvl


def _valid_pri_mask(pri: pa.Array) -> pa.Array:
    """PRI is 0..191 (24 facilities × 8 levels). The regex admits up to
    999; anything above 191 is a malformed line and must be DROPPED,
    not crash the facility-table take (one hostile '<999>...' line
    would otherwise kill the whole batch task)."""
    return pc.less_equal(pc.cast(pri, pa.int32()), 191)


def parse_syslog_batch(batch: pa.Table, line_col: str = "text",
                       assume_year: int = 2024) -> pa.Table:
    """BSD (RFC3164) and IETF (RFC5424) lines -> one unified event table
    (host, facility, level, program, message, ts [timestamp], format).

    Both dialects parse in the same pass — two RE2 extracts over the
    whole batch, rows matching neither are dropped. RFC3164 timestamps
    carry no year: ``assume_year`` fills it (the reference assumes the
    current year at receive time)."""
    lines = batch[line_col]
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    out_parts = []
    for fmt, rx, ts_fmts in (
        ("rfc5424", _RFC5424_RE,
         ["%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S"]),
        ("rfc3164", _RFC3164_RE, ["%Y %b %d %H:%M:%S"]),
    ):
        m = pc.extract_regex(lines, rx)
        ok = pc.is_valid(m)
        if not pc.any(ok).as_py():
            continue
        sub = m.filter(ok)
        sub = sub.filter(_valid_pri_mask(sub.field("pri")))
        if not len(sub):
            continue
        fac, lvl = _pri_names(sub.field("pri"))
        raw_ts = sub.field("ts")
        if fmt == "rfc5424":
            # Arrow strptime has no %f: drop fractional seconds (the
            # engine correlates at second granularity anyway)
            raw_ts = pc.replace_substring_regex(raw_ts, r"\.\d+", "")
        if fmt == "rfc3164":
            # RFC3164 day-of-month may be space-padded; normalize and
            # prepend the assumed year
            raw_ts = pc.replace_substring_regex(raw_ts, r"  ", " ")
            raw_ts = pc.binary_join_element_wise(
                pa.scalar(f"{assume_year} "), raw_ts, ""
            )
        ts = pa.nulls(len(sub), type=pa.timestamp("us"))
        for f in ts_fmts:
            parsed = pc.strptime(raw_ts, format=f, unit="us",
                                 error_is_null=True)
            ts = pc.coalesce(ts, parsed)
        out_parts.append(pa.table({
            "host": sub.field("host"),
            "facility": fac,
            "level": lvl,
            "program": sub.field("program"),
            "message": sub.field("message"),
            "ts": ts,
            "format": pa.array([fmt] * len(sub), type=pa.string()),
        }))
    if not out_parts:
        return pa.table({
            "host": pa.array([], type=pa.string()),
            "facility": pa.array([], type=pa.string()),
            "level": pa.array([], type=pa.string()),
            "program": pa.array([], type=pa.string()),
            "message": pa.array([], type=pa.string()),
            "ts": pa.array([], type=pa.timestamp("us")),
            "format": pa.array([], type=pa.string()),
        })
    return pa.concat_tables(out_parts)


def read_syslog_text(paths, assume_year: int = 2024):
    """read_text -> parsed RFC3164/RFC5424 syslog-event Dataset."""
    import ray.data as rd

    ds = rd.read_text(paths)
    return ds.map_batches(
        lambda t: parse_syslog_batch(t, assume_year=assume_year),
        batch_format="pyarrow",
    )


def syslog_as_events(ds):
    """Parsed syslog Dataset -> canonical engine schema: message becomes
    ``text``, ts becomes ``warc_ts``, a synthetic ``url`` keys each line
    (host + running hash), facility/level/program ride along for the
    rule gates."""
    def adapt(t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        joined = pc.binary_join_element_wise(
            t["host"], pc.cast(t["ts"], pa.string()), t["message"], "|"
        )
        h = pd.util.hash_array(
            np.asarray(joined.to_pandas(), dtype=object)
        )
        key = pc.binary_join_element_wise(
            pa.scalar("syslog://"), t["host"], pa.scalar("/"),
            pa.array([format(x, "016x") for x in h], type=pa.string()), ""
        )
        return pa.table({
            "url": key,
            "warc_ts": t["ts"],
            "host": t["host"],
            "lang": t["facility"],
            "text": t["message"],
            "facility": t["facility"],
            "level": t["level"],
            "program": t["program"],
        })

    return ds.map_batches(adapt, batch_format="pyarrow")


def read_ndjson_logs(paths):
    import ray.data as rd

    return rd.read_json(paths)


def read_csv_logs(paths, **kwargs):
    import ray.data as rd

    return rd.read_csv(paths, **kwargs)
