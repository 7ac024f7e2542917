"""Windowed / per-key stream operators over coarse co-location buckets.

``grouped_apply`` is the scale-shaped replacement for
``groupby(keys).map_groups(fn_per_group)``: logical keys are hashed into
``N_GROUP_BUCKETS`` coarse partitions (one shuffle) and the caller's
function runs ONCE per partition with vectorized pandas groupby inside —
no per-tiny-group Python call overhead (the same fix that made the
correlation gate scale; see correlate.py).

All fns must be pure + deterministic given the partition frame (sorted
explicitly inside) so task retries replay identically.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import pyarrow as pa

from .correlate import N_GROUP_BUCKETS, _attach_gb


def grouped_apply(ds, keys: list[str], fn: Callable[[pd.DataFrame], pd.DataFrame],
                  output_cols: list[str] | None = None):
    """fn receives ONE co-location partition (many logical groups, all
    rows of each group co-located) and must group by ``keys`` itself
    (vectorized)."""

    def tag(t: pa.Table) -> pa.Table:
        pdf = _attach_gb(t.to_pandas(), keys)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def run(g: pd.DataFrame) -> pd.DataFrame:
        out = fn(g.drop(columns=["gb"]))
        return out

    out = tagged.groupby("gb").map_groups(run, batch_format="pandas")
    out = out.map_batches(lambda t: t, batch_format="pyarrow")
    if output_cols:
        out = out.select_columns(output_cols)
    return out


# ---- vectorized per-partition kernels (each groups by its keys) ----


def windowed_rank_filter(keys: list[str], order: list[str], count: int,
                         mode: str) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """limit: keep first `count` per group; after: keep beyond `count`."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return g
        g = g.sort_values(keys + order, kind="mergesort")
        rn = g.groupby(keys, sort=False).cumcount()
        return g[rn < count] if mode == "limit" else g[rn >= count]

    return fn


def sessionize_fn(keys: list[str], ts_col: str, order: list[str],
                  gap: pd.Timedelta) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """-> one row per logical group: keys + n_sessions."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return g[keys].iloc[0:0].assign(n_sessions=pd.Series(dtype="int64"))
        g = g.sort_values(keys + order, kind="mergesort")
        grp = g.groupby(keys, sort=False)
        new_sess = (grp[ts_col].diff() > gap).astype("int64")
        out = new_sess.groupby([g[k] for k in keys], sort=False).sum() + 1
        out = out.rename("n_sessions").reset_index()
        return out

    return fn


def rolling_sum_fn(keys: list[str], order: list[str], value_col: str,
                   window: int, out_col: str,
                   round_to: int = 2) -> Callable[[pd.DataFrame], pd.DataFrame]:
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return g.assign(**{out_col: pd.Series(dtype="float64")})
        g = g.sort_values(keys + order, kind="mergesort")
        g[out_col] = (
            g.groupby(keys, sort=False)[value_col]
            .rolling(window, min_periods=1)
            .sum()
            .round(round_to)
            .reset_index(drop=True)
            .to_numpy()
        )
        return g

    return fn


def top1_fn(keys: list[str], order_desc: str, tiebreak: str) -> Callable:
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return g
        g = g.sort_values([*keys, order_desc, tiebreak],
                          ascending=[True] * len(keys) + [False, True],
                          kind="mergesort")
        return g.groupby(keys, sort=False).head(1)

    return fn
