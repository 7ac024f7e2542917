"""Property tests for the selection engines: cap_per_key (both
engines) and select_top_tokens against exact pure-Python references,
over randomized sizes / skews / caps / budgets.

Ray datasets are deliberately small per example (the properties target
the DRIVER-side refinement state machine — interval narrowing, level
switches, boundary cuts — not throughput), with a randomized block
layout so partition boundaries move too."""
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sagan_ray.stages.pack import (
    _desc_score_key,
    _shuffle_key,
    cap_per_key,
    select_top_tokens,
)


def _mk_ds(t: pa.Table, n_blocks: int):
    import ray.data as rd

    ds = rd.from_arrow(t)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


@given(
    n=st.integers(2, 120),
    n_keys=st.integers(1, 6),
    cap=st.integers(1, 12),
    seed=st.integers(0, 2**20),
    n_blocks=st.integers(1, 5),
    use_order=st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_cap_per_key_threshold_matches_mirror(ray_session, n, n_keys, cap,
                                              seed, n_blocks, use_order):
    rng = np.random.RandomState(seed % 100_000)
    keys = np.array([f"k{v}" for v in rng.randint(0, n_keys, size=n)],
                    dtype=object)
    order_vals = rng.randint(0, 7, size=n).astype(np.int64)  # heavy ties
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "host": pa.array(keys, type=pa.string()),
        "ord": pa.array(order_vals),
    })
    got = sorted(
        cap_per_key(_mk_ds(t, n_blocks), "host", cap,
                    order_col="ord" if use_order else None, seed=seed,
                    method="threshold")
        .to_pandas()["doc_id"])
    # mirror: rank per key by (order, id), keep rank < cap
    ids = np.arange(n, dtype=np.int64)
    o = (order_vals if use_order
         else _shuffle_key(ids, seed).astype(np.float64))
    import pandas as pd

    df = pd.DataFrame({"k": keys, "o": o, "i": ids})
    exp = sorted(df.sort_values(["o", "i"]).groupby("k").head(cap)["i"])
    assert got == exp


@given(
    n=st.integers(1, 150),
    budget_frac=st.floats(0.0, 1.2),
    seed=st.integers(0, 2**20),
    n_blocks=st.integers(1, 5),
    tie_all=st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_select_top_tokens_matches_mirror(ray_session, n, budget_frac,
                                          seed, n_blocks, tie_all):
    rng = np.random.RandomState(seed % 100_000)
    scores = (np.full(n, 0.5) if tie_all else rng.rand(n))
    toks = rng.randint(1, 60, size=n).astype(np.int64)
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "score": pa.array(scores),
        "n_tokens": pa.array(toks),
    })
    budget = int(toks.sum() * budget_frac)
    out = select_top_tokens(_mk_ds(t, n_blocks), budget, "score",
                            seed=seed, exact_cap=8, n_buckets=16)
    got = sorted(out.to_pandas()["doc_id"]) if out.count() else []
    ids = np.arange(n, dtype=np.int64)
    k2 = _shuffle_key(ids, seed)
    order = np.lexsort((k2, _desc_score_key(scores)))
    fits = np.cumsum(toks[order]) <= budget
    exp = sorted(ids[order][fits].tolist())
    assert got == exp


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
