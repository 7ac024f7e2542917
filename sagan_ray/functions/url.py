"""URL canonicalization — the key-prep step for URL-level dedup.

Webtext pipelines dedup by canonical URL before any content pass (the
cheapest dedup tier: no text ever moves). Canonical form here:

1. scheme + host lowercased,
2. explicit default ports dropped (``:80`` http, ``:443`` https),
3. fragment (``#...``) dropped,
4. tracking query params dropped (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``), the ``?`` removed if nothing survives,
5. trailing ``/`` dropped from non-root paths.

Every rewrite is ONE RE2 pass over the whole column
(``pyarrow.compute`` kernels — no per-row Python), and each regex is
RE2-compatible so DuckDB's ``regexp_replace(..., 'g')`` restates the
kernel verbatim — the differential test pins byte-equality.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (pattern, replacement) pairs applied IN ORDER — order matters: the
# query-param strip must run before the dangling-"?" cleanup.
CANON_RULES: list[tuple[str, str]] = [
    # 1. lowercase scheme://host (authority only; path stays cased)
    #    handled separately below (needs a case kernel, not a rewrite)
    # 2. default ports
    (r"^(https?://[^/:?#]+):80(/|\?|#|$)", r"\1\2"),
    (r"^(https://[^/:?#]+):443(/|\?|#|$)", r"\1\2"),
    # 3. fragment
    (r"#.*$", ""),
    # 4. tracking params, in three ?-preserving steps: strip
    #    "&name=value" anywhere, then a LEADING "?name=value&" keeps
    #    the "?" for the surviving params, and a lone "?name=value"
    #    drops entirely. (An earlier revision stripped "[?&]name=value"
    #    and then promoted any surviving "&" to "?" unconditionally —
    #    which corrupted query-less URLs whose PATH contains "&",
    #    colliding distinct documents in URL dedup.)
    (r"&(?:utm_[A-Za-z0-9_]+|fbclid|gclid|ref)=[^&#]*", ""),
    (r"\?(?:utm_[A-Za-z0-9_]+|fbclid|gclid|ref)=[^&#]*&", "?"),
    (r"\?(?:utm_[A-Za-z0-9_]+|fbclid|gclid|ref)=[^&#]*$", ""),
    # dangling "?" with nothing after it
    (r"\?$", ""),
    # 5. trailing slash on a non-root path
    (r"^(https?://[^/]+/.+?)/$", r"\1"),
]

_AUTH_RE = r"^(?i)(https?)://([^/?#]*)"
# pc.extract_regex demands NAMED groups; DuckDB regexp_extract wants
# numbered ones — same pattern, two spellings
_AUTH_RE_NAMED = r"^(?i)(?P<scheme>https?)://(?P<host>[^/?#]*)"


def canonicalize_urls(urls) -> pa.Array:
    """Vectorized canonical form of a string array/ChunkedArray of URLs."""
    arr = urls if isinstance(urls, (pa.Array, pa.ChunkedArray)) else pa.array(urls)
    # lowercase scheme+host: split into (authority, rest), lower the
    # authority, re-concat — three column kernels, no row loop
    auth = pc.extract_regex(arr, _AUTH_RE_NAMED)
    scheme = pc.utf8_lower(pc.struct_field(auth, "scheme"))
    host = pc.utf8_lower(pc.struct_field(auth, "host"))
    rest = pc.replace_substring_regex(arr, _AUTH_RE, "", max_replacements=1)
    out = pc.binary_join_element_wise(
        scheme, pa.scalar("://"), host, rest, pa.scalar("")
    )
    # rows that did not look like a URL at all: keep verbatim
    out = pc.if_else(pc.is_valid(pc.struct_field(auth, "scheme")), out, arr)
    for pat, rep in CANON_RULES:
        out = pc.replace_substring_regex(out, pat, rep)
    return out if isinstance(out, pa.ChunkedArray) else out


def canonical_url_sql(col: str = "url") -> str:
    """The SAME canonicalization as a DuckDB SQL expression (for oracle
    parity and ad-hoc cross-checks)."""
    expr = (
        f"CASE WHEN regexp_matches({col}, '{_AUTH_RE}') THEN "
        f"lower(regexp_extract({col}, '{_AUTH_RE}', 1)) || '://' || "
        f"lower(regexp_extract({col}, '{_AUTH_RE}', 2)) || "
        f"regexp_replace({col}, '{_AUTH_RE}', '') ELSE {col} END"
    )
    for pat, rep in CANON_RULES:
        sql_rep = rep.replace("\\1", "\\1").replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat}', '{sql_rep}', 'g')"
    return expr


def canonicalize_stage(ds, url_col: str = "url",
                       out_col: str = "canonical_url"):
    """Append the canonical-URL column (map-only)."""
    def fn(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, canonicalize_urls(t[url_col]))

    return ds.map_batches(fn, batch_format="pyarrow")


def url_dedup(ds, url_col: str = "url", id_col: str = "doc_id"):
    """URL-level dedup: one row per canonical URL (keeper = min id).

    The cheapest dedup tier — only (canonical_url, id) rides the
    shuffle, never text/html; the reduce is
    ``dedup.grouped_min_count`` (URL keys are corpus-cardinality —
    SCALE.md's groupby-aggregate rule)."""
    from ..stages.dedup import grouped_min_count

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "canonical_url": canonicalize_urls(t[url_col]),
                id_col: t[id_col],
            }
        )

    return grouped_min_count(
        ds.map_batches(project, batch_format="pyarrow"),
        "canonical_url", id_col, "keeper_doc_id", "n")
