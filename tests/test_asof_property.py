"""Property test: asof_join == the scalar SQL restatement of ASOF LEFT
JOIN under SQL NULL-comparison semantics, over random frames with null
keys, null timestamps, duplicate timestamps and empty sides.

The pinned contract (round-5 review): a NULL ts or NULL by-key never
matches — unmatchable left rows survive with null right payload,
unmatchable right rows match nothing. The reference is a DuckDB
correlated subquery (NOT DuckDB's ASOF operator, which matches a NULL
left ts to the last right row — a sort artifact)."""
import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=1, max_value=3)),  # key
    st.one_of(st.none(), st.integers(min_value=0, max_value=20)),  # ts s
    st.integers(min_value=0, max_value=10_000),  # payload
)


def _frame(rows, pay):
    ts0 = pd.Timestamp("2024-01-01")
    return pd.DataFrame({
        "k": pd.array([r[0] for r in rows], dtype="Int64"),
        # explicit dtype: an EMPTY list comprehension infers object,
        # which DuckDB binds as a non-timestamp
        "ts": pd.Series(
            [pd.NaT if r[1] is None
             else ts0 + pd.Timedelta(seconds=r[1]) for r in rows],
            dtype="datetime64[ns]"),
        pay: pd.Series([float(r[2]) for r in rows], dtype="float64"),
    })


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    st.lists(row, min_size=0, max_size=25),
    st.lists(row, min_size=0, max_size=25),
)
def test_asof_join_matches_scalar_sql(ray_session, lrows, rrows):
    import ray.data as rd

    from sagan_ray.stages.window import asof_join

    left = _frame(lrows, "lv")
    # unique left identity so the multiset compare is per-row exact
    left["lv"] = left["lv"] + left.index * 100_000
    right = _frame(rrows, "rv")
    # asof ties on (k, ts) resolve to the max-payload right row in BOTH
    # implementations (sort order / ORDER BY rv DESC) — dedupe instead
    # of encoding the tiebreak twice
    right = right.drop_duplicates(subset=["k", "ts"], keep="first")

    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    keys=["k"], ts_col="ts").to_pandas()
    if not len(left):
        # Ray artifact: to_pandas drops columns on any empty Dataset
        assert len(out) == 0
        return
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    ref = con.execute(
        "SELECT l.lv, (SELECT r.rv FROM r WHERE r.k = l.k "
        "AND r.ts <= l.ts ORDER BY r.ts DESC LIMIT 1) AS rv "
        "FROM l").df()
    got = sorted((float(a), None if pd.isna(b) else float(b))
                 for a, b in zip(out["lv"], out["rv"]))
    want = sorted((float(a), None if pd.isna(b) else float(b))
                  for a, b in zip(ref["lv"], ref["rv"]))
    assert len(out) == len(left)
    assert got == want


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
