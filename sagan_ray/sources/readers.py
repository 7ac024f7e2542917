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


def read_ndjson_logs(paths):
    import ray.data as rd

    return rd.read_json(paths)


def read_csv_logs(paths, **kwargs):
    import ray.data as rd

    return rd.read_csv(paths, **kwargs)
