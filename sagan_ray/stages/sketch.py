"""Mergeable sketch aggregates for 100-TB-scale reporting.

The reference has no approximate operators (SURVEY §2.5 "sketches /
approx: none"); these are the extension layer a web-scale training-data
pipeline needs when exact ``groupby``/``sort`` answers would force an
all-to-all shuffle of every row just to report one number:

* ``hll_distinct``      — HyperLogLog distinct count (2^p registers).
* ``approx_topk``       — heavy hitters via per-batch top-M partials.
* ``log_histogram`` / ``histogram_quantile`` — mergeable log-spaced
                          histogram + quantile lookup.
* ``sample_k_min_hash`` — deterministic uniform k-sample (min-wise
                          hashing): the k rows with the smallest seeded
                          hash of their id, identical on every run and
                          every cluster size.

Scale shape (all four): ``map_batches`` computes a FIXED-SIZE partial
per input block (16 KiB registers / top-M counts / bin counts / local
k-minima), and the merge step touches only those partials — never a row
of the input again. The merge rides a constant-key ``map_groups`` (one
task, ``num_blocks`` tiny rows), the same combine pattern Ray Data's
own AggregateFn uses; input rows are never collected.

Hashing is pandas' siphash (``pd.util.hash_array``, fixed key) — vector
C speed, deterministic per environment; same trade documented for the
minhash/simhash signatures in ``dedup.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _hash_col(t: pa.Table, col: str) -> np.ndarray:
    vals = t[col].to_pylist()
    return pd.util.hash_array(np.array(vals, dtype=object))


def _hll_partial(hashes: np.ndarray, p: int) -> np.ndarray:
    """(n,) uint64 hashes -> (2^p,) uint8 register maxima."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not len(hashes):
        return regs
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)  # top 64-p bits in play
    # rho = leading zeros of `rest` + 1, capped at 64-p+1 (rest == 0)
    nz = rest != 0
    lz = np.full(len(hashes), 64 - p, dtype=np.uint8)
    if nz.any():
        # float64 mantissa trick is lossy at 64 bits; do it by halving
        r = rest[nz]
        cnt = np.zeros(r.shape, dtype=np.uint8)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r < (np.uint64(1) << np.uint64(64 - shift))
            cnt[mask] += shift
            r[mask] <<= np.uint64(shift)
        lz[nz] = np.minimum(cnt, 64 - p)
    rho = (lz + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for small range
    return float(est)


def hll_distinct(ds, col: str, p: int = 14):
    """Approximate COUNT(DISTINCT col): 1-row Dataset (approx_distinct).

    Standard error ~= 1.04/sqrt(2^p) (~0.8% at p=14). Each input block
    contributes one 2^p-byte register row; the constant-key merge takes
    elementwise maxima — commutative, so block order / retries / cluster
    width cannot change the answer.
    """

    def partial(t: pa.Table) -> pa.Table:
        regs = _hll_partial(_hash_col(t, col), p)
        return pa.table(
            {"k": pa.array([0], type=pa.int32()),
             "regs": pa.array([regs], type=pa.list_(pa.uint8()))}
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(1 << p, dtype=np.uint8)
        for r in g["regs"]:
            np.maximum(regs, np.asarray(r, dtype=np.uint8), out=regs)
        return pd.DataFrame({"approx_distinct": [_hll_estimate(regs)]})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("k").map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# heavy hitters (per-batch top-M partial counts)
# ---------------------------------------------------------------------------


def approx_topk(ds, col: str, k: int = 10, local_m: int | None = None):
    """Heavy hitters: (value, count) for the ~k most frequent values.

    Per-batch partial ``value_counts`` truncated to the local top-M
    (M = max(8k, 64)) -> groupby(value).sum -> global top-k. A value's
    reported count undercounts by at most (per-batch rank-M count) x
    n_blocks — exact for values that are hot in the blocks where they
    appear, which is what a Zipf head is. Shuffles at most M rows per
    block, never the input.
    """
    from ray.data.aggregate import Sum

    m = local_m or max(8 * k, 64)

    def partial(t: pa.Table) -> pa.Table:
        s = pd.Series(t[col].to_pylist()).value_counts()
        top = s.iloc[:m]
        return pa.table(
            {col: pa.array(top.index.tolist()),
             "partial_n": pa.array(top.to_numpy(dtype=np.int64))}
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(col)
        .aggregate(Sum("partial_n", alias_name="count"))
    )
    return merged.sort("count", descending=True).limit(k)


# ---------------------------------------------------------------------------
# mergeable log-spaced histogram + quantiles
# ---------------------------------------------------------------------------

_HIST_SUB = 16  # sub-bins per octave -> ~4.4% relative bin width


def _hist_bin(vals: np.ndarray) -> np.ndarray:
    """Non-negative values -> bin index. Bin 0 is exactly 0; v >= 1 maps
    to floor(log2(v) * SUB) + 1; (0,1) clamps to bin 0 boundary region."""
    idx = np.zeros(len(vals), dtype=np.int64)
    posmask = vals >= 1
    if posmask.any():
        idx[posmask] = np.floor(np.log2(vals[posmask]) * _HIST_SUB).astype(np.int64) + 1
    return idx


def _hist_edge(idx: np.ndarray) -> np.ndarray:
    """Representative value (geometric bin center) per bin index."""
    out = np.zeros(len(idx), dtype=np.float64)
    pos = idx >= 1
    out[pos] = np.exp2((idx[pos] - 1 + 0.5) / _HIST_SUB)
    return out


def log_histogram(ds, col: str):
    """Mergeable histogram: Dataset of (bin, n, lo, hi) rows.

    Per-batch ``np.bincount`` partials -> groupby(bin).sum — the shuffle
    carries at most ~1000 bin rows per block regardless of input size.
    Values must be non-negative (lengths, counts, latencies).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        vals = vals[~np.isnan(vals)]
        idx = _hist_bin(vals)
        if len(idx):
            counts = np.bincount(idx)
            bins = np.flatnonzero(counts)
            ns = counts[bins]
        else:
            bins = np.array([], dtype=np.int64)
            ns = np.array([], dtype=np.int64)
        return pa.table(
            {"bin": pa.array(bins.astype(np.int64)),
             "partial_n": pa.array(ns.astype(np.int64))}
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("partial_n", alias_name="n"))
    )

    def edges(t: pa.Table) -> pa.Table:
        b = t["bin"].to_numpy(zero_copy_only=False)
        lo = np.where(b == 0, 0.0, np.exp2((b - 1) / _HIST_SUB))
        hi = np.where(b == 0, 1.0, np.exp2(b / _HIST_SUB))
        return pa.table(
            {"bin": t["bin"], "n": t["n"],
             "lo": pa.array(lo), "hi": pa.array(hi)}
        )

    return merged.map_batches(edges, batch_format="pyarrow")


def histogram_quantile(hist_rows: list[dict], q: float) -> float:
    """Quantile from ``log_histogram`` rows (driver-side on the tiny
    merged histogram). Relative error <= one bin width (~4.4%)."""
    if not hist_rows:
        return float("nan")
    rows = sorted(hist_rows, key=lambda r: r["bin"])
    bins = np.array([r["bin"] for r in rows], dtype=np.int64)
    ns = np.array([r["n"] for r in rows], dtype=np.float64)
    cum = np.cumsum(ns)
    target = q * cum[-1]
    i = int(np.searchsorted(cum, target, side="left"))
    i = min(i, len(bins) - 1)
    return float(_hist_edge(bins[i : i + 1])[0])


# ---------------------------------------------------------------------------
# deterministic uniform k-sample (min-wise hashing)
# ---------------------------------------------------------------------------


def sample_k_min_hash(ds, k: int, id_col: str = "doc_id"):
    """The k rows whose seeded id-hash is globally smallest — a uniform
    without-replacement sample that is deterministic across runs,
    retries, and cluster widths (unlike ``random_sample``).

    Per-batch local k-minima partial (rows + skey), then a sort+limit
    over <= k x n_blocks partial rows — the input itself never sorts.
    """

    def partial(t: pa.Table) -> pa.Table:
        h = _hash_col(t, id_col).view(np.int64)
        tt = t.append_column("skey", pa.array(h))
        if tt.num_rows <= k:
            return tt
        order = np.argsort(h, kind="stable")[:k]
        return tt.take(np.sort(order))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort("skey")
        .limit(k)
    )
