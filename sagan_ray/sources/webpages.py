"""Webpages sources.

Two ways to obtain the north-rule input table
``(url, warc_ts, html, text, lang)``:

1. :func:`webpages_from_documents` — a DETERMINISTIC, SQL-expressible
   derivation from the driver-provided ``documents`` table. Because the
   derivation is expressible in ANSI SQL (see :data:`WEBPAGES_SQL`), every
   downstream pipeline stage gets an exact DuckDB oracle in
   ``__ray_entry__.oracle_sql``.

2. :func:`sagan_ray.synth.generate_webpages` — a seeded synthetic
   generator with planted pattern rates, used for golden e2e tests and
   the benchmark table (documents is too small for bench).

The reference ingests newline-delimited syslog lines from a FIFO
(upstream ``src/sagan.c`` main loop); at-most-once with drops under
overload. Here the streaming executor's backpressure replaces drops and
Parquet blocks replace the pipe — a semantic upgrade (dropped=0 always).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Microseconds of 2024-01-01T00:00:00 UTC since the epoch.
_EPOCH_2024_US = 1_704_067_200 * 1_000_000
# Seconds between consecutive doc timestamps (spreads docs across hours
# of day so alert_time windows discriminate).
_TS_STRIDE_S = 137

# The derivation, as a DuckDB subquery over the pre-registered
# ``documents`` view. MUST stay in lock-step with derive_batch below:
# the driver hashes Ray output vs oracle output value-by-value.
WEBPAGES_SQL = """
SELECT
  'https://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR) AS url,
  TIMESTAMP '2024-01-01' + INTERVAL (doc_id * 137) SECOND AS warc_ts,
  encode('<html><body>' || text || '</body></html>') AS html,
  text,
  lang,
  source || '.example.com' AS host,
  doc_id
FROM documents
"""


def derive_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> webpages batch (vectorized, zero-copy where possible)."""
    doc_id = batch["doc_id"]
    text = batch["text"]
    source = batch["source"]
    doc_id_str = pc.cast(doc_id, pa.string())
    host = pc.binary_join_element_wise(source, pa.scalar(".example.com"), "")
    url = pc.binary_join_element_wise(
        pa.scalar("https://"), source, pa.scalar(".example.com/d/"), doc_id_str, ""
    )
    html_str = pc.binary_join_element_wise(
        pa.scalar("<html><body>"), text, pa.scalar("</body></html>"), ""
    )
    html = pc.cast(html_str, pa.binary())
    ids = pc.cast(doc_id, pa.int64()).combine_chunks()
    id_np = np.asarray(ids, dtype=np.int64)
    ts = pa.array(
        _EPOCH_2024_US + id_np * (_TS_STRIDE_S * 1_000_000), type=pa.timestamp("us")
    )
    cols = {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": text,
        "lang": batch["lang"],
        "host": host,
        "doc_id": pc.cast(doc_id, pa.int64()),
    }
    if "part_id" in batch.column_names:  # lineage partition tag passthrough
        cols["part_id"] = batch["part_id"]
    return pa.table(cols)


def webpages_from_documents(sf_dir: str, include_html: bool = True):
    """Read ``{sf_dir}/documents.parquet`` and derive the webpages Dataset.

    ``include_html=False`` prunes the (wide) html column for pipelines
    that never touch raw bytes — project early, shuffle less.
    """
    from sagan_ray.sources import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet")
    ds = ds.map_batches(derive_batch, batch_format="pyarrow")
    if not include_html:
        ds = ds.select_columns(["url", "warc_ts", "text", "lang", "host", "doc_id"])
    return ds
