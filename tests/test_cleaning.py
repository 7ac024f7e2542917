"""End-to-end corpus cleaning chain (pipelines/cleaning.py)."""
import pyarrow as pa
import pytest


def _corpus():
    # engineered rows exercising every gate
    docs = [
        # 0: clean survivor
        (0, "https://a.com/page1",
         "the quick brown fox jumps over the lazy dog in the field while seventeen ravens describe careful circles above the old barn"),
        # 1: same canonical URL as 0 (utm param) -> url-dropped
        (1, "https://a.com/page1?utm_source=x",
         "different text entirely but the url already claimed by zero ok"),
        # 2: too short -> quality-dropped
        (2, "https://b.com/x", "tiny"),
        # 3: dominant 2-gram -> repetition-dropped
        (3, "https://c.com/x",
         "spam ham spam ham spam ham spam ham spam ham spam ham"),
        # 4: exact duplicate text of 0 -> exact-dedup-dropped
        (4, "https://d.com/x",
         "the quick brown fox jumps over the lazy dog in the field while seventeen ravens describe careful circles above the old barn"),
        # 5: near-duplicate of 0 (one word changed, J ~ 0.87) -> minhash-dropped
        (5, "https://e.com/x",
         "the quick brown fox jumps over the lazy dog in the field while seventeen crows describe careful circles above the old barn"),
        # 6: clean survivor
        (6, "https://f.com/x",
         "completely unrelated content about distributed stream engines"),
        # 7: contaminated by the eval set -> decontam-dropped
        (7, "https://g.com/x",
         "benchmark question alpha beta gamma delta epsilon zeta eta theta"),
    ]
    return pa.table({
        "doc_id": [d[0] for d in docs],
        "url": [d[1] for d in docs],
        "text": [d[2] for d in docs],
    })


def test_clean_corpus_end_to_end(ray_session):
    import ray.data as rd

    from sagan_ray.pipelines.cleaning import clean_corpus

    ds = rd.from_arrow(_corpus())
    out = clean_corpus(
        ds,
        eval_texts=[
            "benchmark question alpha beta gamma delta epsilon zeta eta theta"
        ],
        min_tokens=5,
        max_top_2gram_frac=0.4,
        boilerplate_min_count=None,  # no boilerplate planted here
        near_dup_threshold=0.5,
    ).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 6]
    # schema preserved
    assert sorted(out.columns) == ["doc_id", "text", "url"]


def test_clean_corpus_stage_toggles(ray_session):
    import ray.data as rd

    from sagan_ray.pipelines.cleaning import clean_corpus

    ds = rd.from_arrow(_corpus())
    # only exact dedup active: url/quality/repetition/decontam/near-dup off
    out = clean_corpus(
        ds, url_col=None, eval_texts=None, min_tokens=None,
        max_dup_line_frac=None, boilerplate_min_count=None,
        near_dup_threshold=None,
    ).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 1, 2, 3, 5, 6, 7]  # only 4 gone


def test_clean_corpus_on_documents_table(ray_session):
    import ray.data as rd

    from sagan_ray.pipelines.cleaning import clean_corpus
    from sagan_ray.sources import read_parquet_clean

    # documents.parquet has no url column — url stage off
    ds = read_parquet_clean("/root/testdata/sf0.001/documents.parquet")
    n_in = ds.count()
    out = clean_corpus(ds, url_col=None, near_dup_threshold=0.8)
    n_out = out.count()
    assert 0 < n_out < n_in  # the synthetic corpus has planted dups


def test_cli_clean(tmp_path):
    """`python -m sagan_ray clean` end-to-end in a subprocess (owns its
    Ray session)."""
    import json
    import subprocess
    import sys

    out = tmp_path / "cleaned"
    r = subprocess.run(
        [sys.executable, "-m", "sagan_ray", "clean",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--out", str(out), "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-800:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["rows_in"] == 500
    assert 0 < res["rows_out"] < 500
    assert res["dropped"] == res["rows_in"] - res["rows_out"]


def test_clean_corpus_lm_refset_and_cap_stages(ray_session):
    """The round-3c stages wired into the chain: LM head-keep drops the
    gibberish row, cross-corpus dedup drops the already-released row,
    and the per-key cap bounds the hot host — each surgically."""
    import ray.data as rd

    from sagan_ray.pipelines.cleaning import clean_corpus
    from sagan_ray.stages.lm import train_unigram_lm

    body = "plain reference prose about engines and pipelines number {}"
    docs = [(i, "h-hot.example", body.format(i)) for i in range(6)]
    docs += [(6, "h-cold.example", "zzqx vvkw jjpq mmtt rrss nnoo ppuu")]
    docs += [(7, "h-cold2.example",
              "already released text that the reference set contains")]
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], type=pa.int64()),
        "host": [d[1] for d in docs],
        "text": [d[2] for d in docs],
    })
    train = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": [body.format("x"), body.format("y")],
    }))
    model = train_unigram_lm(train)
    refset = rd.from_arrow(pa.table({
        "doc_id": pa.array([99], type=pa.int64()),
        "text": ["already released text that the reference set contains"],
    }))
    out = clean_corpus(
        rd.from_arrow(t), url_col=None, min_tokens=None,
        max_dup_line_frac=None, near_dup_threshold=None,
        lm_model=model, lm_min_logprob=model.oov_logprob + 1e-9,
        ref_corpus=refset, key_cap=4, key_col="host",
    ).to_pandas()
    kept = sorted(out["doc_id"].tolist())
    # 6 gone (all-OOV -> mean logprob == oov floor < cut), 7 gone
    # (released), hot host capped 6 -> 4 keepers
    assert 6 not in kept and 7 not in kept
    assert len([i for i in kept if i < 6]) == 4
    assert sorted(out.columns) == ["doc_id", "host", "text"]


def test_minhash_empty_candidates_typed(ray_session):
    """A corpus with no near-dups returns a TYPED empty pair set (a
    schema-less empty Dataset broke downstream joins before)."""
    import ray.data as rd

    from sagan_ray.stages.dedup import dedup_keep_first, minhash_lsh_pairs

    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "alpha beta gamma delta epsilon zeta",
            "one two three four five six seven",
            "red orange yellow green blue indigo violet",
        ],
    })
    ds = rd.from_arrow(t)
    pairs = minhash_lsh_pairs(ds, threshold=0.8)
    assert pairs.count() == 0
    # schema survives (to_pandas drops columns on ANY empty Dataset —
    # Ray artifact — so assert on the Dataset schema)
    assert sorted(pairs.schema().names) == ["doc_id_a", "doc_id_b", "jaccard"]
    # keep_first with the empty pair set returns the corpus unchanged
    out = dedup_keep_first(ds, pairs).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [1, 2, 3]


def test_embedding_empty_candidates_typed(ray_session):
    import numpy as np
    import ray.data as rd

    from sagan_ray.stages.dedup import embedding_dup_pairs

    rng = np.random.RandomState(3)
    vecs = rng.randn(6, 16)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    t = pa.table({"id": list(range(6)), "vec": [v.tolist() for v in vecs]})
    pairs = embedding_dup_pairs(
        rd.from_arrow(t), vec_col="vec", id_col="id", threshold=0.999
    )
    assert pairs.count() == 0
    assert sorted(pairs.schema().names) == ["cosine", "id_a", "id_b"]


def test_split_by_cluster_leakage_free(ray_session):
    """Near-dup docs always share a split; fractions roughly hold."""
    import numpy as np
    import ray.data as rd

    from sagan_ray.stages.pack import split_by_cluster

    # 400 docs; ids 2k and 2k+1 are near-dup pairs for k < 100
    n = 400
    pairs = pa.table({
        "doc_id_a": [2 * k for k in range(100)],
        "doc_id_b": [2 * k + 1 for k in range(100)],
    })
    ds = rd.from_arrow(pa.table({"doc_id": list(range(n))}))
    out = split_by_cluster(
        ds, rd.from_arrow(pairs),
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    ).to_pandas().set_index("doc_id")["split"]
    # leakage-free: each planted pair shares a split
    for k in range(100):
        assert out[2 * k] == out[2 * k + 1], k
    # deterministic across a second run
    out2 = split_by_cluster(
        ds, rd.from_arrow(pairs),
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    ).to_pandas().set_index("doc_id")["split"]
    assert (out == out2).all()
    # fractions roughly hold (300 effective clusters)
    frac_train = (out == "train").mean()
    assert 0.65 < frac_train < 0.95
    assert set(out.unique()) <= {"train", "val", "test"}


def test_clean_corpus_normalize_and_span_stages(ray_session):
    """The optional normalize + span-mask stages compose into the chain:
    decomposed text normalizes (then dedups against its composed twin),
    duplicated spans mask, and the output schema stays the input's."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sagan_ray.pipelines.cleaning import clean_corpus

    boiler = "follow us on all the social networks today friends"
    docs = [
        "café menu with many unique words here",    # composed
        "café menu with many unique words here",   # decomposed twin
        f"one unique doc body text {boiler}",
        f"two unique doc body text also {boiler}",
        "third totally different document body here",
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs, type=pa.string()),
    })
    out = clean_corpus(
        rd.from_arrow(t), url_col=None, min_tokens=2,
        max_dup_line_frac=None, near_dup_threshold=None,
        normalize=True, span_min_docs=2, span_k=3,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out.columns) == ["doc_id", "text"]
    # normalize unified the twins -> exact dedup kept only doc 0, and
    # the surviving copy is NOT self-masked (spans run post-dedup)
    assert 0 in set(out["doc_id"]) and 1 not in set(out["doc_id"])
    kept0 = out[out["doc_id"] == 0]["text"].iloc[0]
    assert "menu with many unique words" in kept0
    # the duplicated span is masked out of both carriers
    assert set(out["doc_id"]) == {0, 2, 3, 4}
    for txt in out[out["doc_id"].isin([2, 3])]["text"]:
        assert boiler not in txt


def _write_corpus_parquet(tmp_path):
    import pyarrow.parquet as pq

    files = []
    t = _corpus()
    for i in range(2):
        f = str(tmp_path / f"docs_{i}.parquet")
        pq.write_table(t.slice(i * 4, 4), f)
        files.append(f)
    return files


_RUN_KW = dict(
    eval_texts=[
        "benchmark question alpha beta gamma delta epsilon zeta eta theta"
    ],
    min_tokens=5,
    max_top_2gram_frac=0.4,
    boilerplate_min_count=None,
    near_dup_threshold=0.5,
)


def test_clean_corpus_run_resume_midway(ray_session, tmp_path):
    """Kill-at-50% resume for the checkpointed cleaning chain: a run
    that dies after the first unit resumes from that unit's parquet
    checkpoint (NOT the raw input) and produces the identical keeper
    set; completed-stage checkpoints are not rewritten on resume."""
    import os

    import pytest

    from sagan_ray.pipelines.cleaning import clean_corpus_run

    files = _write_corpus_parquet(tmp_path)
    run_a = str(tmp_path / "a")
    run_b = str(tmp_path / "b")
    out_a = clean_corpus_run(files, run_a, **_RUN_KW).to_pandas()
    assert sorted(out_a["doc_id"].tolist()) == [0, 6]

    with pytest.raises(RuntimeError, match="fault injection"):
        clean_corpus_run(files, run_b, fail_after_stages=1, **_RUN_KW)
    recs = [f for f in os.listdir(os.path.join(run_b, "_lineage"))
            if f.startswith("part-")]
    assert len(recs) == 1  # only the gates unit checkpointed
    gates_dir = os.path.join(run_b, "stages", "stage=gates")
    mtimes = {f: os.path.getmtime(os.path.join(gates_dir, f))
              for f in os.listdir(gates_dir)}
    out_b = clean_corpus_run(files, run_b, **_RUN_KW).to_pandas()
    assert sorted(out_b["doc_id"].tolist()) == [0, 6]
    # the completed gates checkpoint was reused, not rewritten
    for f, mt in mtimes.items():
        assert os.path.getmtime(os.path.join(gates_dir, f)) == mt


def test_clean_corpus_run_rejects_changed_plan(ray_session, tmp_path):
    """Resuming a run_dir with different chain parameters raises — a
    silently mixed-generation corpus is the alternative."""
    import pytest

    from sagan_ray.pipelines.cleaning import clean_corpus_run

    files = _write_corpus_parquet(tmp_path)
    run_dir = str(tmp_path / "r")
    with pytest.raises(RuntimeError, match="fault injection"):
        clean_corpus_run(files, run_dir, fail_after_stages=1, **_RUN_KW)
    kw2 = dict(_RUN_KW, min_tokens=6)
    with pytest.raises(ValueError, match="DIFFERENT"):
        clean_corpus_run(files, run_dir, **kw2)


def test_clean_corpus_run_rejects_changed_inputs(ray_session, tmp_path):
    """Resuming a run_dir with a DIFFERENT input file set raises (r4
    ADVICE): reused stage checkpoints would otherwise return output
    computed from the old corpus while silently ignoring the new
    files."""
    import pytest

    from sagan_ray.pipelines.cleaning import clean_corpus_run

    files = _write_corpus_parquet(tmp_path)
    run_dir = str(tmp_path / "ri")
    with pytest.raises(RuntimeError, match="fault injection"):
        clean_corpus_run(files, run_dir, fail_after_stages=1, **_RUN_KW)
    # dropping one shard changes the input fingerprint -> must raise
    with pytest.raises(ValueError, match="DIFFERENT"):
        clean_corpus_run(files[:-1], run_dir, **_RUN_KW)
    # the unchanged set still resumes fine
    out = clean_corpus_run(files, run_dir, **_RUN_KW).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 6]


def test_clean_corpus_semdedup_stage(ray_session):
    """embedding_col wires SemDeDup into the chain AFTER the textual
    dedups: a semantic twin (different text, near-identical embedding)
    survives exact+minhash dedup but falls to the embedding stage."""
    import numpy as np
    import ray.data as rd

    from sagan_ray.pipelines.cleaning import clean_corpus

    rng = np.random.RandomState(17)
    base = rng.randn(16); base /= np.linalg.norm(base)
    twin = base + rng.randn(16) * 0.005; twin /= np.linalg.norm(twin)
    others = rng.randn(3, 16)
    others /= np.linalg.norm(others, axis=1, keepdims=True)
    docs = [
        (0, "the original prose about distributed engines", base),
        (1, "a paraphrase with wholly different words", twin),
        (2, "first unrelated document body", others[0]),
        (3, "second unrelated document body", others[1]),
        (4, "third unrelated document body", others[2]),
    ]
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], type=pa.int64()),
        "text": [d[1] for d in docs],
        "vec": pa.array([d[2].tolist() for d in docs],
                        type=pa.list_(pa.float64())),
    })
    out = clean_corpus(
        rd.from_arrow(t), url_col=None, min_tokens=None,
        max_dup_line_frac=None, near_dup_threshold=0.8,
        embedding_col="vec", semdedup_eps=0.02, semdedup_clusters=2,
    ).to_pandas()
    kept = sorted(out["doc_id"].tolist())
    # one of the semantic twins is gone; everything else survives
    assert len([i for i in kept if i in (0, 1)]) == 1
    assert {2, 3, 4} <= set(kept)
    assert sorted(out.columns) == ["doc_id", "text", "vec"]


def test_cli_clean_run_dir_resumable(tmp_path):
    """`--run-dir` routes the CLI through the checkpointed runner: a
    second identical invocation reuses the stage checkpoints (lineage
    records present, same output counts)."""
    import json
    import os
    import subprocess
    import sys

    out = tmp_path / "cleaned"
    rd = tmp_path / "ckpt"
    cmd = [sys.executable, "-m", "sagan_ray", "clean",
           "--input", "/root/testdata/sf0.001/documents.parquet",
           "--out", str(out), "--run-dir", str(rd), "--num-cpus", "4"]
    r = subprocess.run(cmd, capture_output=True, text=True,
                       cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["rows_in"] == 500 and 0 < res["rows_out"] < 500
    recs = [f for f in os.listdir(rd / "_lineage")
            if f.startswith("part-")]
    assert len(recs) >= 2  # one per chain unit
    mtimes = {f: os.path.getmtime(rd / "stages" / "stage=gates" / f)
              for f in os.listdir(rd / "stages" / "stage=gates")}
    import shutil
    shutil.rmtree(out)
    r2 = subprocess.run(cmd, capture_output=True, text=True,
                        cwd="/root/repo", timeout=300)
    assert r2.returncode == 0, r2.stderr[-800:]
    res2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert res2["rows_out"] == res["rows_out"]
    for f, mt in mtimes.items():
        assert os.path.getmtime(
            rd / "stages" / "stage=gates" / f) == mt  # reused


def test_clean_corpus_run_migrates_pre_inputs_plan(ray_session, tmp_path):
    """Review finding (r5): a run_dir checkpointed BEFORE plan.json
    carried the 'inputs' key must stay resumable with identical params
    — the missing key is treated as matching and recorded."""
    import json as _json
    import os

    import pytest

    from sagan_ray.pipelines.cleaning import clean_corpus_run
    from sagan_ray.state import lineage

    files = _write_corpus_parquet(tmp_path)
    run_dir = str(tmp_path / "rm")
    with pytest.raises(RuntimeError, match="fault injection"):
        clean_corpus_run(files, run_dir, fail_after_stages=1, **_RUN_KW)
    # simulate the pre-upgrade plan file (no 'inputs' key)
    plan_path = os.path.join(lineage.lineage_dir(run_dir), "plan.json")
    with open(plan_path) as f:
        plan = _json.load(f)
    del plan["inputs"]
    with open(plan_path, "w") as f:
        _json.dump(plan, f)
    # identical resume works, and the key is backfilled for next time
    out = clean_corpus_run(files, run_dir, **_RUN_KW).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 6]
    with open(plan_path) as f:
        assert "inputs" in _json.load(f)


def test_plan_migration_rejected_resume_does_not_stamp(ray_session,
                                                       tmp_path):
    """Review finding (r5): a REJECTED resume into a legacy (pre-
    'inputs') run_dir must not backfill the wrong inputs fingerprint —
    the legitimately identical retry must still succeed."""
    import json as _json
    import os

    import pytest

    from sagan_ray.pipelines.cleaning import clean_corpus_run
    from sagan_ray.state import lineage

    files = _write_corpus_parquet(tmp_path)
    run_dir = str(tmp_path / "rs")
    with pytest.raises(RuntimeError, match="fault injection"):
        clean_corpus_run(files, run_dir, fail_after_stages=1, **_RUN_KW)
    plan_path = os.path.join(lineage.lineage_dir(run_dir), "plan.json")
    with open(plan_path) as f:
        plan = _json.load(f)
    del plan["inputs"]
    with open(plan_path, "w") as f:
        _json.dump(plan, f)
    # mistaken resume: wrong params AND wrong inputs -> rejected...
    with pytest.raises(ValueError, match="DIFFERENT"):
        clean_corpus_run(files[:-1], run_dir,
                         **dict(_RUN_KW, min_tokens=6))
    # ...and must NOT have stamped the wrong inputs into the plan:
    # the correct retry still resumes
    out = clean_corpus_run(files, run_dir, **_RUN_KW).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 6]
