"""SemDeDup (dedup.semdedup / semdedup_losers) — distributed result
must equal a local pure-numpy mirror of the published rule: within each
k-means cluster, order by (cosine-to-centroid ASC, id ASC) and drop any
point whose cosine to an EARLIER point is >= 1 - eps."""
import numpy as np
import pyarrow as pa
import pytest


def _corpus(seed=5):
    """4 well-separated clusters; each holds 10 spread points plus a
    planted triple of near-copies (pairwise cosine ~0.999)."""
    rng = np.random.RandomState(seed)
    dirs = np.eye(16)[:4] * 10.0
    vecs, ids = [], []
    nid = 0
    for c in range(4):
        for _ in range(10):
            v = dirs[c] + rng.randn(16) * 1.2
            vecs.append(v / np.linalg.norm(v))
            ids.append(nid); nid += 1
        base = dirs[c] + rng.randn(16) * 1.2
        for _ in range(3):
            v = base + rng.randn(16) * 0.01
            vecs.append(v / np.linalg.norm(v))
            ids.append(nid); nid += 1
    return np.stack(vecs), np.array(ids, dtype=np.int64)


_KW = dict(eps=0.02, n_clusters=4, sample_size=52, seed=42)


def _mirror_losers(vecs, ids, eps, n_clusters, seed):
    """Local reference: same centroids (kmeans_fit is deterministic),
    same assignment, same ordered pairwise rule — brute force."""
    from sagan_ray.stages.similarity import _unit, kmeans_fit

    v = _unit(vecs.astype(np.float64))
    cent = kmeans_fit(v, n_clusters, seed=seed)
    sims = v @ cent.T
    cl = np.argmax(sims, axis=1)
    csim = sims[np.arange(len(v)), cl]
    losers = []
    for c in np.unique(cl):
        m = np.flatnonzero(cl == c)
        order = m[np.lexsort((ids[m], csim[m]))]
        for i in order:
            if any(float(v[i] @ v[j]) >= 1 - eps for j in
                   order[:np.flatnonzero(order == i)[0]]):
                losers.append(int(ids[i]))
    return sorted(losers)


def test_semdedup_matches_local_mirror(ray_session):
    import ray.data as rd

    from sagan_ray.stages.dedup import semdedup, semdedup_losers

    vecs, ids = _corpus()
    t = pa.table({
        "id": pa.array(ids),
        "vec": pa.array([v.tolist() for v in vecs],
                        type=pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t).repartition(4)
    expected = _mirror_losers(vecs, ids, _KW["eps"], _KW["n_clusters"],
                              _KW["seed"])
    # each planted triple loses exactly 2 of its 3 members
    assert len(expected) == 8
    losers = sorted(semdedup_losers(ds, vec_col="vec", id_col="id",
                                    **_KW).to_pandas()["id"].tolist())
    assert losers == expected
    kept = semdedup(ds, vec_col="vec", id_col="id", **_KW).to_pandas()
    assert sorted(kept["id"].tolist()) == sorted(
        set(ids.tolist()) - set(expected))
    # replay-stable: a second run returns the identical keeper set
    kept2 = semdedup(ds, vec_col="vec", id_col="id", **_KW).to_pandas()
    assert sorted(kept2["id"].tolist()) == sorted(kept["id"].tolist())


def test_semdedup_no_dups_is_identity(ray_session):
    import ray.data as rd

    from sagan_ray.stages.dedup import semdedup

    rng = np.random.RandomState(11)
    v = rng.randn(30, 8)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    t = pa.table({"id": pa.array(np.arange(30, dtype=np.int64)),
                  "vec": pa.array([x.tolist() for x in v],
                                  type=pa.list_(pa.float64()))})
    out = semdedup(rd.from_arrow(t), vec_col="vec", id_col="id",
                   eps=0.0005, n_clusters=3, sample_size=30)
    assert sorted(out.to_pandas()["id"].tolist()) == list(range(30))


def test_semdedup_row_chunking_is_invariant(ray_session):
    """row_chunk only bounds memory — the loser set must not change."""
    import ray.data as rd

    from sagan_ray.stages.dedup import semdedup_losers

    vecs, ids = _corpus(seed=9)
    t = pa.table({"id": pa.array(ids),
                  "vec": pa.array([v.tolist() for v in vecs],
                                  type=pa.list_(pa.float64()))})
    ds = rd.from_arrow(t)
    a = sorted(semdedup_losers(ds, vec_col="vec", id_col="id",
                               row_chunk=2, **_KW)
               .to_pandas()["id"].tolist())
    b = sorted(semdedup_losers(ds, vec_col="vec", id_col="id",
                               row_chunk=4096, **_KW)
               .to_pandas()["id"].tolist())
    assert a == b and len(a) == 8


def test_semdedup_join_fallback_matches_broadcast(ray_session):
    """broadcast_limit=0 forces the binary-packed anti-join path; the
    keeper set and vec column must round-trip identically."""
    import ray.data as rd

    from sagan_ray.stages.dedup import semdedup

    vecs, ids = _corpus(seed=13)
    t = pa.table({"id": pa.array(ids),
                  "vec": pa.array([v.tolist() for v in vecs],
                                  type=pa.list_(pa.float64()))})
    ds = rd.from_arrow(t)
    a = semdedup(ds, vec_col="vec", id_col="id", **_KW).to_pandas()
    b = semdedup(ds, vec_col="vec", id_col="id", broadcast_limit=0,
                 **_KW).to_pandas()
    assert sorted(a["id"]) == sorted(b["id"])
    av = {r["id"]: r["vec"] for _, r in a.iterrows()}
    bv = {r["id"]: r["vec"] for _, r in b.iterrows()}
    for k in av:
        np.testing.assert_array_equal(np.asarray(av[k]),
                                      np.asarray(bv[k]))


def test_semdedup_survives_empty_blocks(ray_session):
    """Ray routinely delivers empty blocks (fully-filtered upstream);
    the assign stage must pass them through, not crash on a (0,0)
    matmul."""
    import ray.data as rd

    from sagan_ray.stages.dedup import semdedup

    vecs, ids = _corpus(seed=21)
    t = pa.table({"id": pa.array(ids),
                  "vec": pa.array([v.tolist() for v in vecs],
                                  type=pa.list_(pa.float64()))})
    # filter inside map_batches so some blocks come out empty
    ds = rd.from_arrow(t).repartition(8).map_batches(
        lambda b: b.filter(pa.compute.less(b["id"], 26)),
        batch_format="pyarrow")
    out = semdedup(ds, vec_col="vec", id_col="id", **_KW).to_pandas()
    assert 0 < len(out) < 26


def test_semdedup_null_id_raises(ray_session):
    """Review finding (r5): a null id would round-trip through float64
    NaN into an arbitrary int64 in the zero-copy sample hash and
    silently corrupt the output — it must raise instead."""
    import ray
    import ray.data as rd

    from sagan_ray.stages.dedup import semdedup_losers

    vecs, ids = _corpus()
    id_list = ids.tolist()
    id_list[3] = None
    t = pa.table({
        "id": pa.array(id_list, type=pa.int64()),
        "vec": pa.array([v.tolist() for v in vecs],
                        type=pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t).repartition(2)
    with pytest.raises((TypeError, ray.exceptions.RayTaskError),
                       match="null"):
        semdedup_losers(ds, vec_col="vec", id_col="id", **_KW).count()
