"""Oracle-parity under pytest (north-rule verification channel): a fast
subset of the queries() registry compared against oracle_sql() in DuckDB
at sf0.001 — same canonicalization as tools/check_oracles.py."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# fast, representative subset (one per operator family)
SUBSET = [
    "wp_parse",
    "wp_content_match",
    "wp_pcre_match",
    "wp_threshold_limit",
    "wp_xbits",
    "wp_content_chain",
    "wp_route_counts",
    "wp_rawbytes",
    "wp_enrich_join",
    "wp_suppress",
    "wp_flow_header",
    "wp_parse_proto",
    "wp_dns_cache",
    "wp_sample",
    "ev_json_decode",
    "ev_threshold",
    "ev_sessionize",
    "ev_rule_engine",
    "tpch_q1",
    "tpch_join_agg",
    "tpch_topk",
    "tpch_semi_anti",
    "tpch_set_ops",
    "ev_asof_join",
    "ev_range_join",
    "dedup_exact",
    "dedup_minhash",
    "dedup_embedding",
    "doc_textstats",
    "doc_langid",
    "mm_decode",
    "dedup_cluster",
    "emb_ann_topk",
    "src_fifo_parse",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v
            )
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, duck, name):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    res = fn(SF)
    mine = canon(res.to_pandas() if hasattr(res, "to_pandas") else res)
    theirs = canon(duck.sql(sql).df())
    assert len(mine) == len(theirs), f"{name}: {len(mine)} vs {len(theirs)} rows"
    assert list(mine.columns) == list(theirs.columns)
    for c in mine.columns:
        a, b = mine[c], theirs[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            import numpy as np

            assert np.allclose(
                a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True
            ), f"{name}.{c}"
        else:
            assert a.astype(str).equals(b.astype(str)), f"{name}.{c}"


def test_doc_textstats_irregular_whitespace(ray_session, tmp_path):
    """Review finding (r5): the TF-IDF trio tokenizes like Python
    str.split() (whitespace RUNS, empties dropped); the oracle's toks
    CTE must mirror that exactly — double spaces, tabs, newlines,
    leading/trailing space and empty docs all agree."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sagan_ray.pipelines.queries import ORACLES, q_doc_textstats

    docs = [
        (0, "a  b"),                      # double space
        (1, " leading and trailing "),    # edge spaces
        (2, "tab\tsep\nand newline"),     # tabs + newlines
        (3, ""),                          # empty doc
        (4, "   "),                       # whitespace-only doc
        (5, "a the the a unique terms"),  # repeats + stopwords
        (6, "vt\x0bsep and nbsp\xa0sep"),  # non-ASCII-\s whitespace
        (7, "ideo　graphic line"),  # Zs/Zl separators
    ]
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
        "text": pa.array([s for _, s in docs]),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, str(sf / "documents.parquet"))

    got = canon(q_doc_textstats(str(sf)).to_pandas())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
    want = canon(con.sql(ORACLES["doc_textstats"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
