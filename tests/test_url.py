"""URL canonicalization: hand cases + DuckDB restatement differential."""
import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from sagan_ray.functions.url import (
    canonical_url_sql,
    canonicalize_urls,
    url_dedup,
)

CASES = [
    ("HTTP://Example.COM/Path", "http://example.com/Path"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:80/", "http://a.com/"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),  # non-default kept
    ("https://a.com/x#frag", "https://a.com/x"),
    ("https://a.com/x?utm_source=tw&q=1", "https://a.com/x?q=1"),
    ("https://a.com/x?utm_source=tw", "https://a.com/x"),
    ("https://a.com/x?q=1&fbclid=abc", "https://a.com/x?q=1"),
    ("https://a.com/path/", "https://a.com/path"),
    ("https://a.com/", "https://a.com/"),  # root slash kept
    ("not a url", "not a url"),
    ("https://B.com/Y?ref=z&utm_x=1#f", "https://b.com/Y"),
]


def test_canonicalize_hand_cases():
    got = canonicalize_urls([c[0] for c in CASES]).to_pylist()
    assert got == [c[1] for c in CASES]


def test_canonicalize_matches_duckdb_restatement():
    urls = [c[0] for c in CASES] + [
        f"https://Site{i}.org:443/a/b{i}/?utm_campaign=x&id={i}#sec"
        for i in range(200)
    ]
    ours = canonicalize_urls(urls).to_pylist()
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"url": urls}))
    theirs = con.sql(
        f"SELECT {canonical_url_sql('url')} AS c FROM t"
    ).df()["c"].tolist()
    assert ours == theirs


def test_url_dedup_counts(ray_session):
    import ray.data as rd

    t = pa.table({
        "doc_id": list(range(6)),
        "url": [
            "https://a.com/x?utm_source=1",
            "https://A.com/x",
            "https://a.com/x/",
            "https://b.com/y",
            "HTTP://b.com:80/y",
            "https://c.com/z",
        ],
    })
    out = url_dedup(rd.from_arrow(t)).to_pandas().sort_values(
        "canonical_url").reset_index(drop=True)
    assert out["canonical_url"].tolist() == [
        "http://b.com/y", "https://a.com/x", "https://b.com/y",
        "https://c.com/z",
    ]
    # min-id keeper per canonical url
    assert out.set_index("canonical_url")["keeper_doc_id"].to_dict() == {
        "https://a.com/x": 0, "https://b.com/y": 3,
        "http://b.com/y": 4, "https://c.com/z": 5,
    }


def test_ampersand_in_queryless_path_is_preserved(ray_session):
    """Regression (review finding): a '&' in a query-less path must NOT
    be promoted to '?' — distinct URLs were colliding in URL dedup."""
    from sagan_ray.functions.url import canonicalize_urls

    got = canonicalize_urls([
        "https://example.com/a&b",        # & in path, no query
        "https://example.com/a?b",        # real query
        "http://x.com/p&q=1",             # &-separated path junk
        "https://e.com/p?utm_a=1&x=2",    # leading tracker + survivor
        "https://e.com/p?x=2&utm_a=1",    # trailing tracker
        "https://e.com/p?utm_a=1",        # lone tracker
        "https://e.com/p?utm_a=1&utm_b=2",  # only trackers
    ]).to_pylist()
    assert got == [
        "https://example.com/a&b",
        "https://example.com/a?b",
        "http://x.com/p&q=1",
        "https://e.com/p?x=2",
        "https://e.com/p?x=2",
        "https://e.com/p",
        "https://e.com/p",
    ]
