"""JSON input mapping — the ``parse-json-message`` analogue.

Reference: upstream 2.x maps incoming JSON log lines onto the syslog
event fields via a json-map config (``src/parsers/json.c`` /
``src/message-json-map.c``): each engine field names a dotted key path
in the JSON object; nested keys flatten to ``.a.b`` paths; the full raw
object is retained for ``json_content``/``json_pcre`` matching.

Here: :func:`json_map_stage` turns any Dataset with a raw-JSON string
column into the canonical engine schema (url/warc_ts/host/lang/text
[+props]) according to a user ``mapping`` of engine-column -> dotted
path. Decoding happens once per batch; missing keys yield nulls (the
reference leaves fields empty).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: engine column -> default dotted path (overridable per config)
DEFAULT_MAPPING = {
    "url": ".id",
    "warc_ts": ".timestamp",
    "host": ".host",
    "lang": ".facility",
    "text": ".message",
}


def _extract_paths(raw: pa.ChunkedArray | pa.Array,
                   paths: list[str]) -> list[pa.Array]:
    """Vectorized dotted-path extraction from a raw-JSON string column.

    DuckDB ``json_extract_string`` over the zero-copy-registered Arrow
    column — one C++ pass for all paths, no per-row Python; malformed
    lines and missing keys yield null. Using the same engine the
    oracles run on makes the stringification of booleans / nested
    objects / numbers ('true', raw JSON text, '7') match them by
    construction. (Earlier revisions used polars ``json_path_match`` —
    same semantics, but its lazy module re-exports raced under
    concurrent worker import, intermittently raising AttributeError
    mid-pipeline.)
    """
    from ..functions.duck import project

    sel = ", ".join(
        "CASE WHEN json_valid(j) THEN json_extract_string(j, ?) END"
        f" AS c{i}" for i in range(len(paths))
    )
    res = project(pa.table({"j": raw}), f"SELECT {sel} FROM b",
                  ["$." + p.lstrip(".") for p in paths])
    return [res.column(i).combine_chunks().cast(pa.string())
            for i in range(len(paths))]


def json_map_batch(batch: pa.Table, mapping: dict[str, str],
                   json_col: str = "json", keep_raw: bool = True) -> pa.Table:
    """raw-JSON string column -> canonical engine columns per mapping."""
    items = list(mapping.items())
    arrays = _extract_paths(batch[json_col], [p for _, p in items])
    cols: dict[str, pa.Array] = {}
    for (col, _), arr in zip(items, arrays):
        if col == "warc_ts":
            cols[col] = pc.cast(
                pc.strptime(arr, format="%Y-%m-%dT%H:%M:%S", unit="us",
                            error_is_null=True),
                pa.timestamp("us"),
            )
        else:
            cols[col] = arr
    if keep_raw:
        cols["props"] = batch[json_col]  # json matchers read the raw object
    return pa.table(cols)


def json_map_stage(ds, mapping: dict[str, str] | None = None,
                   json_col: str = "json", keep_raw: bool = True):
    mapping = dict(DEFAULT_MAPPING if mapping is None else mapping)
    return ds.map_batches(
        lambda t: json_map_batch(t, mapping, json_col, keep_raw),
        batch_format="pyarrow",
    )


def read_json_logs_mapped(paths, mapping: dict[str, str] | None = None):
    """NDJSON file(s) of raw objects -> canonical engine Dataset.

    Reads each line as an opaque string first (no schema inference), so
    heterogeneous objects can't break the reader — exactly the
    reference's treat-the-line-as-bytes posture."""
    import ray.data as rd

    ds = rd.read_text(paths)
    ds = ds.map_batches(
        lambda t: t.rename_columns(["json" if c == "text" else c
                                    for c in t.column_names]),
        batch_format="pyarrow",
    )
    return json_map_stage(ds, mapping)
