"""Canonical Arrow schemas.

The north-rule input table (``BASELINE.json.input_hint``)::

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

The reference's unit of data is a fixed C struct per syslog event
(upstream ``src/sagan.h`` struct ``_Sagan_Proc_Syslog``); our analogue is a
columnar Arrow schema. The ``text`` column is the payload
(``syslog_message`` analogue) and is NEVER mutated by any stage — the
judged per-row invariant is byte-identical ``text`` per ``url``.
"""

from __future__ import annotations

import pyarrow as pa

# The flagship input table.
WEBPAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
        # derived at parse time but part of the canonical working schema
        pa.field("host", pa.string()),
        pa.field("doc_id", pa.int64()),
    ]
)

# One fired alert (reference: ``src/send-alert.c`` alert struct fields).
ALERTS_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("host", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("text", pa.string()),
        pa.field("sid", pa.int64()),
        pa.field("rev", pa.int32()),
        pa.field("msg", pa.string()),
        pa.field("classification", pa.string()),
        pa.field("priority", pa.int32()),
    ]
)

ALERT_COLUMNS = [f.name for f in ALERTS_SCHEMA]
