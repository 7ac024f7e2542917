"""Similarity search over an embedding column (list<float>).

* :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``); every batch does one numpy matmul against
  it and emits only its LOCAL top-k per query; a final tiny groupby
  merges the partials (combiner pattern — the full similarity matrix
  never materializes).
* :class:`IVFIndex` / :func:`ivf_topk` — scale path: deterministic
  k-means (fixed init, fixed iterations) over a driver-side sample
  builds centroids; batches route vectors to their nearest centroid
  (hash-partition by cluster); queries probe the ``nprobe`` nearest
  clusters only.
"""

from __future__ import annotations

import numpy as np

from ..functions.vectors import vec_matrix
import pandas as pd
import pyarrow as pa


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(ds, query_vecs: np.ndarray, query_ids: list[int], k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id"):
    """-> Dataset(query_id, vec_id, rank) — rank 1..k by cosine desc,
    ties broken by vec_id asc (fully deterministic)."""
    import ray

    q = _unit(np.asarray(query_vecs, dtype=np.float64))
    qref = ray.put((q, list(query_ids)))

    def local_topk(t: pa.Table) -> pa.Table:
        qm, qids = ray.get(qref)
        vecs = vec_matrix(t[vec_col])
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        sims = _unit(vecs) @ qm.T  # (n, Q)
        out_q, out_v, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            # local top-k with (sim desc, id asc) determinism
            order = np.lexsort((ids, -col))[:kk]
            out_q.extend([qids[qi]] * len(order))
            out_v.extend(ids[order].tolist())
            out_s.extend(col[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "vec_id", "rank"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def ivf_bits_topk(ds, query_vecs: np.ndarray, query_ids: list[int], k: int = 10,
                  n_bits: int = 4, vec_col: str = "embedding",
                  id_col: str = "vec_id"):
    """Inverted-file ANN with a bit-sampling coarse quantizer, nprobe=1.

    Bucket id = sign bits of the first ``n_bits`` raw coordinates
    (bit-sampling LSH for cosine on zero-centered data). Each query
    scans ONLY its own bucket (~n/2^n_bits of the corpus) with exact
    cosine, then local top-k partials merge per query — the same
    combiner shape as :func:`brute_force_topk`.

    Unlike the k-means IVF (:func:`ivf_topk`), the quantizer here is a
    pure sign test on stored floats, identical in numpy and SQL — so
    the whole operator has an exact DuckDB oracle (bucket equality via
    ``embedding[i] > 0``, in-bucket top-k via list_cosine_similarity).
    At scale the bucket column doubles as the shuffle/placement key:
    co-partitioning by bucket turns probe into a map-side lookup."""
    import ray

    qv = np.asarray(query_vecs, dtype=np.float64)
    q = _unit(qv)
    qbuckets = ((qv[:, :n_bits] > 0).astype(np.int64)
                << np.arange(n_bits, dtype=np.int64)[None, :]).sum(axis=1)
    qref = ray.put((q, list(query_ids), qbuckets))

    def local_topk(t: pa.Table) -> pa.Table:
        qm, qids, qb = ray.get(qref)
        vecs = vec_matrix(t[vec_col])
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        buckets = ((vecs[:, :n_bits] > 0).astype(np.int64)
                   << np.arange(n_bits, dtype=np.int64)[None, :]).sum(axis=1)
        u = _unit(vecs)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids)):
            mask = buckets == qb[qi]
            if not mask.any():
                continue
            sub_ids = ids[mask]
            sims = u[mask] @ qm[qi]
            kk = min(k, len(sub_ids))
            order = np.lexsort((sub_ids, -sims))[:kk]
            out_q.extend([qids[qi]] * len(order))
            out_v.extend(sub_ids[order].tolist())
            out_s.extend(sims[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "vec_id", "rank"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def kmeans_fit(sample: np.ndarray, n_clusters: int, n_iter: int = 10,
               seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd's k-means on unit vectors (cosine ≈ L2)."""
    rng = np.random.RandomState(seed)
    x = _unit(sample.astype(np.float64))
    idx = rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)
    cent = x[np.sort(idx)].copy()
    for _ in range(n_iter):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            m = x[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
        cent = _unit(cent)
    return cent


def ivf_topk(ds, query_vecs: np.ndarray, query_ids: list[int], k: int = 10,
             n_clusters: int = 16, nprobe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             sample_size: int = 2048):
    """IVF approximate top-k: probe only the nprobe nearest clusters.

    Centroids come from a deterministic HASH-FILTER sample — each batch
    keeps rows with ``(id * 2654435761) % modulus == 0`` — so sampling
    is one embarrassingly-parallel filter pass (no global sort, no
    shuffle) and the sample is stable under any partitioning."""
    import ray

    n_total = ds.count()  # parquet metadata — no scan
    modulus = max(1, n_total // max(1, sample_size))
    knuth = np.uint64(2654435761)

    def hash_sample(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64).view(np.uint64)
        keep = (ids * knuth) % np.uint64(modulus) == 0 if modulus > 1 else np.ones(len(ids), bool)
        return t.select([id_col, vec_col]).filter(pa.array(keep))

    sample_df = ds.map_batches(hash_sample, batch_format="pyarrow").to_pandas()
    # keep the sample bounded + deterministic regardless of modulus rounding
    sample_df = sample_df.sort_values(id_col).head(sample_size)
    cent = kmeans_fit(np.array(sample_df[vec_col].tolist()), n_clusters)
    q = _unit(np.asarray(query_vecs, dtype=np.float64))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    ref = ray.put((cent, q, list(query_ids), probe))

    def local(t: pa.Table) -> pa.Table:
        c, qm, qids, pr = ray.get(ref)
        vecs = vec_matrix(t[vec_col])
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64())})
        u = _unit(vecs)
        assign = np.argmax(u @ c.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids)):
            mask = np.isin(assign, pr[qi])
            if not mask.any():
                continue
            sub_ids = ids[mask]
            sims = u[mask] @ qm[qi]
            kk = min(k, len(sub_ids))
            order = np.lexsort((sub_ids, -sims))[:kk]
            out_q.extend([qids[qi]] * len(order))
            out_v.extend(sub_ids[order].tolist())
            out_s.extend(sims[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = ds.map_batches(local, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "vec_id", "rank"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")
