"""Global token-budget selection (pack.select_top_tokens) vs an exact
pandas reference: order by (score DESC, splitmix64(id, seed) ASC), keep
while the running token total stays within budget."""
import numpy as np
import pyarrow as pa
import pytest

from sagan_ray.stages.pack import (
    _desc_score_key,
    _shuffle_key,
    select_top_tokens,
)


def ref_select(ids, scores, toks, budget, seed=42):
    k2 = _shuffle_key(ids.astype(np.int64), seed)
    order = np.lexsort((k2, _desc_score_key(scores)))
    fits = np.cumsum(toks[order].astype(np.int64)) <= budget
    return sorted(ids[order][fits].tolist())


def _table(n=2000, seed=3, tie_frac=0.0):
    rng = np.random.RandomState(seed)
    scores = rng.rand(n)
    if tie_frac:
        scores[: int(n * tie_frac)] = 0.5
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "score": pa.array(scores),
        "n_tokens": pa.array(rng.randint(1, 500, size=n).astype(np.int64)),
    })


def _got(t, budget, **kw):
    import ray.data as rd

    out = select_top_tokens(rd.from_arrow(t), budget, "score", **kw)
    return sorted(out.to_pandas()["doc_id"].tolist()) if out.count() else []


@pytest.mark.parametrize("budget_frac", [0.0, 0.01, 0.37, 0.9, 1.5])
def test_matches_reference(ray_session, budget_frac):
    t = _table()
    toks = t["n_tokens"].to_numpy()
    budget = int(toks.sum() * budget_frac)
    exp = ref_select(t["doc_id"].to_numpy(), t["score"].to_numpy(),
                     toks, budget)
    assert _got(t, budget) == exp


def test_small_exact_cap_forces_refinement_rounds(ray_session):
    t = _table(n=3000, seed=9)
    toks = t["n_tokens"].to_numpy()
    budget = int(toks.sum() * 0.5)
    exp = ref_select(t["doc_id"].to_numpy(), t["score"].to_numpy(),
                     toks, budget)
    got = _got(t, budget, exact_cap=20, n_buckets=16)
    assert got == exp


def test_massive_score_tie_uses_tiebreak_level(ray_session):
    # every row shares one score: the cut is decided entirely by the
    # uniform splitmix64 tiebreak (level-1 refinement)
    n = 1500
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "score": pa.array(np.full(n, 0.25)),
        "n_tokens": pa.array(np.full(n, 10, dtype=np.int64)),
    })
    budget = 10 * 400  # exactly 400 docs
    exp = ref_select(t["doc_id"].to_numpy(), t["score"].to_numpy(),
                     t["n_tokens"].to_numpy(), budget)
    got = _got(t, budget, exact_cap=50)
    assert len(got) == 400
    assert got == exp


def test_nan_scores_sort_last(ray_session):
    t = pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "score": pa.array([0.9, np.nan, 0.8, np.nan, 0.7, 0.6]),
        "n_tokens": pa.array(np.full(6, 5, dtype=np.int64)),
    })
    got = _got(t, 20)  # room for 4 docs
    assert got == [0, 2, 4, 5]  # NaN rows dropped first


def test_block_layout_invariance(ray_session):
    import ray.data as rd

    t = _table(n=1200, seed=21, tie_frac=0.3)
    toks = t["n_tokens"].to_numpy()
    budget = int(toks.sum() * 0.4)
    base = _got(t, budget)
    re = select_top_tokens(rd.from_arrow(t).repartition(9), budget, "score")
    assert sorted(re.to_pandas()["doc_id"].tolist()) == base


def test_degenerate_budgets(ray_session):
    t = _table(n=50)
    assert _got(t, 0) == []
    all_ids = sorted(t["doc_id"].to_pylist())
    assert _got(t, int(t["n_tokens"].to_numpy().sum())) == all_ids


# ---------------------------------------------------------------------------
# document chunking
# ---------------------------------------------------------------------------


def ref_chunks(texts, chunk_tokens, overlap):
    stride = chunk_tokens - overlap
    out = []
    for i, t in enumerate(texts):
        ws = (t or "").split()
        chunks = []
        c = 0
        while True:
            seg = ws[c * stride: c * stride + chunk_tokens]
            if c > 0 and not seg:
                break
            if c > 0 and len(seg) <= overlap:
                break  # fully covered by the previous chunk
            chunks.append(" ".join(seg))
            if c * stride + chunk_tokens >= len(ws):
                break
            c += 1
        out.append(chunks)
    return out


def test_chunk_documents_matches_reference(ray_session):
    import ray.data as rd

    from sagan_ray.stages.pack import chunk_documents

    rng = np.random.RandomState(8)
    texts = [" ".join(f"w{j}" for j in range(rng.randint(0, 40)))
             for _ in range(60)]
    texts += ["", "one", " ".join(f"w{j}" for j in range(12))]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
    })
    got = (chunk_documents(rd.from_arrow(t), chunk_tokens=12, overlap=4)
           .to_pandas().sort_values(["doc_id", "chunk_id"]))
    exp = ref_chunks(texts, 12, 4)
    for did, grp in got.groupby("doc_id"):
        assert grp["text"].tolist() == exp[did], f"doc {did}"
        assert (grp["n_tokens"] == grp["text"].str.split().str.len()
                .fillna(0)).all()
    assert set(got["doc_id"]) == set(range(len(texts)))
    # consecutive chunks overlap by exactly `overlap` tokens when full
    full = got[got["n_tokens"] == 12]
    for _, r in full.iterrows():
        nxt = got[(got["doc_id"] == r["doc_id"])
                  & (got["chunk_id"] == r["chunk_id"] + 1)]
        if len(nxt):
            tail = r["text"].split()[-4:]
            head = nxt.iloc[0]["text"].split()[:4]
            assert tail == head


def test_chunk_documents_rejects_bad_overlap(ray_session):
    import ray.data as rd

    from sagan_ray.stages.pack import chunk_documents

    t = pa.table({"doc_id": pa.array([0]), "text": pa.array(["a b"])})
    with pytest.raises(Exception):
        chunk_documents(rd.from_arrow(t), chunk_tokens=4,
                        overlap=4).count()


# ---------------------------------------------------------------------------
# weighted sampling (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------


def test_weighted_sample_matches_pure_python_mirror(ray_session):
    import ray.data as rd

    from sagan_ray.stages.pack import weighted_sample_k

    rng = np.random.RandomState(4)
    n, k, seed = 500, 40, 9
    w = rng.rand(n) * 3
    w[:20] = 0.0  # zero-weight rows never win
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "weight": pa.array(w),
    })
    got = sorted(weighted_sample_k(rd.from_arrow(t), k, "weight", seed=seed)
                 .to_pandas()["doc_id"])
    # pure mirror of the A-Res key definition
    ids = np.arange(n, dtype=np.int64)
    u = (_shuffle_key(ids, seed).astype(np.float64) + 1.0) / float(2**64)
    with np.errstate(divide="ignore"):
        key = np.log(u) / w
    key[w == 0] = -np.inf
    exp = sorted(ids[np.argsort(-key, kind="stable")][:k].tolist())
    assert got == exp
    assert not (set(got) & set(range(20)))  # no zero-weight winners
    # layout invariance
    re = sorted(weighted_sample_k(rd.from_arrow(t).repartition(7), k,
                                  "weight", seed=seed)
                .to_pandas()["doc_id"])
    assert re == got


def test_weighted_sample_bias_toward_heavy_rows(ray_session):
    import ray.data as rd

    from sagan_ray.stages.pack import weighted_sample_k

    n = 2000
    w = np.where(np.arange(n) < n // 2, 10.0, 0.1)  # heavy first half
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "weight": pa.array(w),
    })
    got = weighted_sample_k(rd.from_arrow(t), 200, "weight").to_pandas()
    heavy = (got["doc_id"] < n // 2).mean()
    assert heavy > 0.9  # ~99% expected; 0.9 leaves seed slack
