"""Hot-key salting for the window-family joins (window.py).

A Zipf-hot probe key whose rows dwarf a partition must spread across
salt shards (its history replicated per shard) and still produce output
identical to the unsalted join — the round-4 verdict item #3 contract.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _skewed_sides():
    """Left: one hot key 'h' with 5_000 rows + 20 cold keys with 10
    each; right: 25 history rows per key."""
    rng = np.random.RandomState(7)
    keys = ["h"] * 5000 + [f"c{i}" for i in range(20) for _ in range(10)]
    n = len(keys)
    base = pd.Timestamp("2026-01-01")
    lts = base + pd.to_timedelta(rng.randint(0, 86_400, n), unit="s")
    left = pa.table({
        "k": pa.array(keys, type=pa.string()),
        "ts": pa.array(lts).cast(pa.timestamp("us")),
        "lval": pa.array(np.arange(n, dtype=np.int64)),
    })
    rkeys = [k for k in ["h"] + [f"c{i}" for i in range(20)]
             for _ in range(25)]
    m = len(rkeys)
    rts = base + pd.to_timedelta(rng.randint(0, 86_400, m), unit="s")
    right = pa.table({
        "k": pa.array(rkeys, type=pa.string()),
        "ts": pa.array(rts).cast(pa.timestamp("us")),
        "rval": pa.array(np.arange(m, dtype=np.int64) * 100),
    })
    return left, right


_LTYPES = {"k": pa.string(), "ts": pa.timestamp("us"), "lval": pa.int64()}
_RTYPES = {"k": pa.string(), "ts": pa.timestamp("us"), "rval": pa.int64()}


def _sorted(df, cols):
    return (df.sort_values(cols, kind="mergesort")
            .reset_index(drop=True)[cols])


def test_approx_hot_keys_finds_the_hot_key(ray_session):
    import ray.data as rd

    from sagan_ray.stages.window import approx_hot_keys

    left, _ = _skewed_sides()
    # blocks small enough that the detector must merge partials
    ds = rd.from_arrow(left).repartition(8)
    hot = approx_hot_keys(ds, ["k"], min_count=1000)
    assert hot == [("h",)]


def test_salt_fn_spreads_probe_and_replicates_history():
    from sagan_ray.stages.window import _salt_fn

    left, right = _skewed_sides()
    t = pa.concat_tables([
        left.append_column("side", pa.array([0] * left.num_rows,
                                            type=pa.int8())),
        right.drop_columns(["rval"]).append_column(
            "lval", pa.array([0] * right.num_rows, type=pa.int64())
        ).append_column("side", pa.array([1] * right.num_rows,
                                         type=pa.int8())),
    ], promote_options="default")
    out = _salt_fn(["k"], "ts", [("h",)], 4)(t)
    pdf = out.to_pandas()
    hot_left = pdf[(pdf["k"] == "h") & (pdf["side"] == 0)]
    # probe rows spread over every shard
    assert set(hot_left["_salt"]) == {0, 1, 2, 3}
    # history replicated: 25 right rows -> 25 per shard
    hot_right = pdf[(pdf["k"] == "h") & (pdf["side"] == 1)]
    assert sorted(hot_right.groupby("_salt").size()) == [25] * 4
    # cold keys untouched (salt 0, no replication)
    cold = pdf[pdf["k"] != "h"]
    assert (cold["_salt"] == 0).all()
    assert len(cold) == (left.num_rows - 5000) + (right.num_rows - 25)


def test_salted_asof_equals_unsalted(ray_session):
    import ray.data as rd

    from sagan_ray.stages.window import asof_join

    left, right = _skewed_sides()
    lds, rds = rd.from_arrow(left), rd.from_arrow(right)
    cols = ["k", "ts", "lval", "rval"]
    plain = asof_join(lds, rds, ["k"], "ts", left_types=_LTYPES,
                      right_types=_RTYPES).to_pandas()
    salted = asof_join(lds, rds, ["k"], "ts", left_types=_LTYPES,
                       right_types=_RTYPES, hot_keys=[("h",)],
                       n_salts=4).to_pandas()
    pd.testing.assert_frame_equal(_sorted(plain, cols),
                                  _sorted(salted, cols))
    # auto detection path produces the same thing
    auto = asof_join(lds, rds, ["k"], "ts", left_types=_LTYPES,
                     right_types=_RTYPES, hot_keys="auto",
                     hot_key_min_count=1000, n_salts=4).to_pandas()
    pd.testing.assert_frame_equal(_sorted(plain, cols),
                                  _sorted(auto, cols))


def test_salted_range_join_equals_unsalted(ray_session):
    import ray.data as rd

    from sagan_ray.stages.window import range_join

    left, right = _skewed_sides()
    lds, rds = rd.from_arrow(left), rd.from_arrow(right)
    lo, hi = pd.Timedelta(seconds=0), pd.Timedelta(hours=2)
    cols = ["k", "ts", "lval", "ts_r", "rval"]
    plain = range_join(lds, rds, ["k"], "ts", lo, hi,
                       left_types=_LTYPES,
                       right_types=_RTYPES).to_pandas()
    salted = range_join(lds, rds, ["k"], "ts", lo, hi,
                        left_types=_LTYPES, right_types=_RTYPES,
                        hot_keys=[("h",)], n_salts=4).to_pandas()
    assert len(plain) == len(salted)  # no duplicate pairs from shards
    pd.testing.assert_frame_equal(_sorted(plain, cols),
                                  _sorted(salted, cols))


def test_auto_without_min_count_raises(ray_session):
    import ray.data as rd

    from sagan_ray.stages.window import asof_join

    left, right = _skewed_sides()
    with pytest.raises(ValueError, match="hot_key_min_count"):
        asof_join(rd.from_arrow(left), rd.from_arrow(right), ["k"], "ts",
                  left_types=_LTYPES, right_types=_RTYPES,
                  hot_keys="auto")
