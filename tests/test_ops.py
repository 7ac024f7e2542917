"""Training-data operator tests: dedup sketches vs brute force, ANN
recall, text kernels, multimodal plumbing."""

import numpy as np
import pyarrow as pa

from sagan_ray.stages.dedup import (
    exact_jaccard,
    minhash_signature,
    simhash64,
)
from sagan_ray.stages.similarity import kmeans_fit
from sagan_ray.stages.text import LangId, quality_batch, winnow_fingerprints

SF = "/root/testdata/sf0.001"


def test_minhash_estimates_jaccard():
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    sa, sb = minhash_signature(a), minhash_signature(b)
    est = (sa == sb).mean()
    true = exact_jaccard(a, b)
    assert abs(est - true) < 0.25
    assert (minhash_signature(a) == sa).all()  # deterministic


def test_minhash_lsh_recall_precision(ray_session):
    """Mutated copies must be found; every reported pair must truly have
    J >= threshold (precision 1.0 by exact verify)."""
    import ray.data as rd

    from sagan_ray.stages.dedup import minhash_lsh_pairs

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    rows += [
        {"doc_id": 1000 + i, "text": " ".join(t.split()[2:])}
        for i, t in enumerate(texts)
    ]
    ds = rd.from_items(rows)
    out = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    pairs = set(zip(out["doc_id_a"].astype(int), out["doc_id_b"].astype(int)))
    expected = {
        (i, 1000 + i)
        for i, t in enumerate(texts)
        if exact_jaccard(t, " ".join(t.split()[2:])) >= 0.5
    }
    found_expected = {p for p in pairs if p in expected}
    assert len(found_expected) / max(1, len(expected)) >= 0.9  # recall
    by_id = {r["doc_id"]: r["text"] for r in rows}
    for a, b in pairs:  # precision: exact verify really ran
        assert exact_jaccard(by_id[a], by_id[b]) >= 0.5


def test_simhash_mutation_close():
    t = " ".join(f"tok{i}" for i in range(60))
    t2 = " ".join(f"tok{i}" for i in range(60) if i != 30)
    h1, h2 = simhash64(t), simhash64(t2)
    assert bin(h1 ^ h2).count("1") <= 6
    assert simhash64(t) == h1  # deterministic


def test_ivf_recall_vs_brute_force(ray_session):
    import ray.data as rd

    from sagan_ray.stages.similarity import brute_force_topk, ivf_topk

    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.filter(pa.compute.less(t["vec_id"], 3))
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    ids = t["vec_id"].to_pylist()
    bf = brute_force_topk(ds, vecs, ids, k=10).to_pandas()
    iv = ivf_topk(ds, vecs, ids, k=10, n_clusters=8, nprobe=4).to_pandas()
    for q in ids:
        b = set(bf[bf.query_id == q]["vec_id"])
        v = set(iv[iv.query_id == q]["vec_id"])
        assert len(b & v) / 10 >= 0.5  # nprobe=4/8 clusters: decent recall


def test_kmeans_deterministic():
    x = np.random.RandomState(3).normal(size=(100, 8))
    c1 = kmeans_fit(x, 4)
    c2 = kmeans_fit(x, 4)
    assert np.allclose(c1, c2)


def test_quality_kernel():
    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": pa.array(["the cat a hat", "xyz"])})
    out = quality_batch(t)
    assert out["n_tokens"].to_pylist() == [4, 1]
    assert out["n_stop"].to_pylist() == [2, 0]
    assert out["n_chars_calc"].to_pylist() == [13, 3]


def test_langid_heuristic():
    li = LangId()
    assert li.predict("the cat is in the hat and it is fine") == "en"
    assert li.predict("der hund ist nicht mit der katze und von") == "de"
    assert li.predict("中文文本在这里") == "zh"


def test_winnowing_deterministic_and_local():
    t = "abcdefghijklmnopqrstuvwxyz" * 3
    f1 = winnow_fingerprints(t)
    assert f1 == winnow_fingerprints(t)
    assert len(f1) > 0
    # containment: fingerprints of a substring mostly appear in the full set
    sub = winnow_fingerprints(t[5:40])
    overlap = len(set(sub) & set(f1)) / max(1, len(set(sub)))
    assert overlap >= 0.5


def test_multimodal_stub_plumbing(ray_session):
    from sagan_ray.sources.webpages import webpages_from_documents
    from sagan_ray.stages.multimodal import (
        DecodeImageStub,
        FrameSampleStub,
        decode_stage,
    )

    ds = webpages_from_documents(SF)
    out = decode_stage(ds, DecodeImageStub, batch_size=64, concurrency=2).to_pandas()
    assert len(out) == 500
    assert set(out.columns) == {"url", "n_bytes", "width", "height", "mean_byte"}
    assert (out["n_bytes"] > 0).all()
    # deterministic across runs
    out2 = decode_stage(ds, DecodeImageStub, batch_size=64, concurrency=2).to_pandas()
    assert out.sort_values("url").reset_index(drop=True).equals(
        out2.sort_values("url").reset_index(drop=True)
    )
    frames = decode_stage(ds, FrameSampleStub, batch_size=64, concurrency=2).to_pandas()
    assert len(frames) >= 500  # explode: >= 1 frame per row
    assert frames["feature"].iloc[0] is not None


def test_exact_dedup_finds_duplicates(ray_session):
    import ray.data as rd

    from sagan_ray.stages.dedup import exact_dedup_groups

    rows = [{"doc_id": 0, "text": "same"}, {"doc_id": 1, "text": "same"},
            {"doc_id": 2, "text": "other"}]
    out = exact_dedup_groups(rd.from_items(rows)).to_pandas()
    assert len(out) == 2
    grp = out[out["n"] == 2].iloc[0]
    assert grp["keeper_doc_id"] == 0
