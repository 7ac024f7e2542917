"""Adapter: the ``events`` stream table → engine event schema.

Demonstrates that the engine runs over any log/telemetry stream, not
just webpages: map a (ts, user, type, props) event stream onto the
canonical columns (url/warc_ts/host/lang/text [+props]) and every rule
family — including ``json_content`` on the raw props payload and
threshold correlation tracked by the synthetic host — applies as-is.

The mapping is SQL-expressible (see EVENTS_AS_LOG_SQL) so rule matches
get exact DuckDB oracles.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

EVENTS_AS_LOG_SQL = """
SELECT 'evt://' || CAST(event_id AS VARCHAR) AS url,
       ts AS warc_ts,
       'u' || CAST(user_id AS VARCHAR) AS host,
       event_type AS lang,
       'ev ' || event_type || ' k=' || json_extract_string(props, '$.k') AS text,
       props
FROM events
"""


def adapt_batch(batch: pa.Table) -> pa.Table:
    from .jsonmap import _extract_paths

    # vectorized $.k extraction (DuckDB json kernel — no per-row loop at
    # input scale); empty/missing props render as "" like the reference's
    # empty-field posture
    ks = pc.fill_null(_extract_paths(batch["props"], [".k"])[0], "")
    eid = pc.cast(batch["event_id"], pa.string())
    url = pc.binary_join_element_wise(pa.scalar("evt://"), eid, "")
    host = pc.binary_join_element_wise(
        pa.scalar("u"), pc.cast(batch["user_id"], pa.string()), ""
    )
    text = pc.binary_join_element_wise(
        pa.scalar("ev "), batch["event_type"], pa.scalar(" k="), ks, ""
    )
    return pa.table(
        {
            "url": url,
            "warc_ts": pc.cast(batch["ts"], pa.timestamp("us")),
            "host": host,
            "lang": batch["event_type"],
            "text": text,
            "props": batch["props"],
            # numeric id passthrough so event_id-gated rules apply
            "event_id": pc.cast(batch["event_id"], pa.int64()),
        }
    )


def events_as_log(sf_dir: str):
    from sagan_ray.sources import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/events.parquet")
    return ds.map_batches(adapt_batch, batch_format="pyarrow")
