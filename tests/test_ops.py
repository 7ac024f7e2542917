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


def test_langid_vectorized_matches_scalar():
    """Differential: the vectorized __call__ is byte-identical to the
    scalar predict() reference on adversarial inputs (empties, nulls,
    whitespace runs, ties, CJK past/inside the 200-char prefix)."""
    import random

    li = LangId()
    texts = ["", None, "the of and to the", "der die das und",
             "le la les et", "el la los y", "一二三 hello",
             "x" * 300 + " 一", "  the\t der\nle ", "THE A OF",
             "le el the der", "la la la", "word", "   "]
    rng = random.Random(7)
    vocab = ("the a of und der le la el los y is den pour que dans "
             "hello world foo bar").split()
    texts += [" ".join(rng.choices(vocab, k=rng.randint(0, 40)))
              for _ in range(500)]
    t = pa.table({"doc_id": list(range(len(texts))),
                  "text": pa.array(texts, type=pa.string())})
    assert (li(t)["lang_pred"].to_pylist()
            == [li.predict(x or "") for x in texts])


def test_winnowing_matches_pure_int_reference():
    """Differential: the numpy rolling-hash winnowing equals a pure
    Python-int reimplementation of the definition (wrapping 64-bit
    polynomial hash, rightmost-min window pick, consecutive dedup)."""
    import random

    B, MASK = 1099511628211, (1 << 64) - 1

    def ref(text, k=8, window=6):
        cps = [ord(c) for c in text]
        if len(cps) < k:
            h = 0
            for c in cps:
                h = (h * B + c) & MASK
            hs = [h >> 1]
        else:
            hs = []
            for i in range(len(cps) - k + 1):
                h = 0
                for c in cps[i : i + k]:
                    h = (h * B + c) & MASK
                hs.append(h >> 1)
        if len(hs) <= window:
            return [min(hs)]
        out, last = [], -1
        for i in range(len(hs) - window + 1):
            w = hs[i : i + window]
            m = min(w)
            j = i + max(idx for idx, v in enumerate(w) if v == m)
            if j != last:
                out.append(hs[j])
                last = j
        return out

    rng = random.Random(11)
    cases = ["", "a", "short", "abcdefgh", "aaaaaaaaaaaaaaaaaaaa",
             "the quick brown fox jumps over the lazy dog" * 3,
             "中文 mixed ascii 文本"]
    cases += ["".join(rng.choices("abcab ", k=rng.randint(0, 120)))
              for _ in range(200)]
    for t in cases:
        assert winnow_fingerprints(t) == ref(t), repr(t)


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

    # FrameSample(mode="auto") in a PIL-less container must be
    # indistinguishable from the stub (same rows, same schema)
    from sagan_ray.stages.multimodal import FrameSample

    frames2 = decode_stage(ds, FrameSample, batch_size=64,
                           concurrency=2, mode="auto").to_pandas()
    a = frames.sort_values(["url", "frame_id"]).reset_index(drop=True)
    b = frames2.sort_values(["url", "frame_id"]).reset_index(drop=True)
    assert a.equals(b)


def test_exact_dedup_finds_duplicates(ray_session):
    import ray.data as rd

    from sagan_ray.stages.dedup import exact_dedup_groups

    rows = [{"doc_id": 0, "text": "same"}, {"doc_id": 1, "text": "same"},
            {"doc_id": 2, "text": "other"}]
    out = exact_dedup_groups(rd.from_items(rows)).to_pandas()
    assert len(out) == 2
    grp = out[out["n"] == 2].iloc[0]
    assert grp["keeper_doc_id"] == 0


def test_asof_join_semantics(ray_session):
    """asof_join == DuckDB ASOF LEFT JOIN on a frame with unmatched
    lefts, exact-ts matches, multiple keys, and keys with no right rows."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from sagan_ray.stages.window import asof_join

    ts = lambda s: pd.Timestamp(f"2024-01-01 00:00:{s:02d}")
    left = pd.DataFrame({
        "k": [1, 1, 1, 2, 3],
        "ts": [ts(1), ts(5), ts(9), ts(4), ts(2)],
        "lv": [10, 11, 12, 20, 30],
    })
    right = pd.DataFrame({
        "k": [1, 1, 2, 2, 4],
        "ts": [ts(2), ts(5), ts(1), ts(8), ts(0)],
        "rv": [100, 101, 200, 201, 400],
    })
    out = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  keys=["k"], ts_col="ts")
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    ref = con.execute(
        "SELECT l.k, l.ts, l.lv, r.rv FROM l ASOF LEFT JOIN r "
        "ON l.k = r.k AND l.ts >= r.ts ORDER BY l.k, l.ts"
    ).df()
    assert out["lv"].tolist() == ref["lv"].tolist()
    assert out["rv"].astype("float").where(out["rv"].notna()).tolist() == \
        ref["rv"].tolist() or out["rv"].isna().equals(ref["rv"].isna())
    # element-wise: nulls align, values align
    for a, b in zip(out["rv"].tolist(), ref["rv"].tolist()):
        assert (pd.isna(a) and pd.isna(b)) or int(a) == int(b)


def test_range_join_semantics(ray_session):
    """range_join == DuckDB inequality join on a frame with exact band
    edges (lo exclusive, hi inclusive), multi-match lefts, lefts with
    no right rows, and duplicate right timestamps."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from sagan_ray.stages.window import range_join

    ts = lambda s: pd.Timestamp(f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}")
    left = pd.DataFrame({
        "k": [1, 1, 2, 3, 4],
        "ts": [ts(0), ts(100), ts(50), ts(10), ts(0)],
        "lv": [10, 11, 20, 30, 40],
    })
    right = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, 2, 5],
        # ts(0)==left edge (excluded), ts(60)==hi edge (included),
        # duplicate ts(30)s
        "ts": [ts(0), ts(30), ts(30), ts(60), ts(49), ts(111), ts(7)],
        "rv": [100, 101, 102, 103, 200, 201, 500],
    })
    out = (
        range_join(rd.from_pandas(left), rd.from_pandas(right),
                   keys=["k"], ts_col="ts",
                   lo=pd.Timedelta(0), hi=pd.Timedelta(seconds=60))
        .to_pandas()
        .sort_values(["k", "ts", "ts_r", "rv"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    ref = con.execute(
        "SELECT l.k, l.ts, l.lv, r.ts AS ts_r, r.rv FROM l JOIN r "
        "ON l.k = r.k AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 60 SECOND "
        "ORDER BY l.k, l.ts, ts_r, rv"
    ).df()
    assert len(out) == len(ref)
    assert out["lv"].tolist() == ref["lv"].tolist()
    assert out["rv"].tolist() == ref["rv"].tolist()
    assert out["ts_r"].tolist() == ref["ts_r"].tolist()


def test_pack_counts_greedy_invariants():
    """Differential vs a pure-Python greedy packer + invariants: no
    sequence over budget unless a single oversized doc; greedy means
    the next doc would not have fit; order preserved."""
    import random

    from sagan_ray.stages.pack import pack_counts

    def ref(counts, cap):
        seq, sid, acc = [], 0, 0
        for c in counts:
            if acc > 0 and acc + c > cap:
                sid += 1
                acc = 0
            seq.append(sid)
            acc += c
        return seq

    rng = random.Random(5)
    for _ in range(100):
        counts = np.array([rng.randint(1, 300) for _ in
                           range(rng.randint(0, 60))], dtype=np.int64)
        cap = rng.randint(1, 500)
        got = pack_counts(counts, cap).tolist()
        assert got == ref(counts.tolist(), cap), (counts, cap)
    assert pack_counts(np.array([], dtype=np.int64), 10).tolist() == []
    # oversized doc sits alone
    assert pack_counts(np.array([5, 99, 5], dtype=np.int64), 10).tolist() \
        == [0, 1, 2]


def test_pack_batch_shape(ray_session):
    import ray.data as rd

    from sagan_ray.stages.pack import pack_stage

    rows = [{"doc_id": i, "text": " ".join(["tok"] * (i % 7 + 1))}
            for i in range(50)]
    out = pack_stage(rd.from_items(rows), cap=10).to_pandas()
    assert out["n_tokens"].sum() == sum(i % 7 + 1 for i in range(50))
    assert (out["n_docs"] >= 1).all()
    assert not out["truncated"].any()
    flat = [d for ids in out["doc_ids"] for d in ids]
    assert sorted(flat) == list(range(50))
    # within blocks, no sequence over budget
    assert (out[~out["truncated"]]["n_tokens"] <= 10).all()


def test_batch_jaccard_matches_scalar():
    """Differential: the batched numpy Jaccard equals the scalar blake2b
    exact_jaccard on random and edge pairs (empties, short docs, k>len,
    identical, disjoint)."""
    import random

    from sagan_ray.stages.dedup import batch_jaccard

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(30)]
    pairs = [("", ""), ("", "a b c"), ("one two", "one two"),
             ("a", "a"), ("a", "b"), ("x y z", "x y z w")]
    for _ in range(300):
        a = " ".join(rng.choices(vocab, k=rng.randint(0, 25)))
        b = " ".join(rng.choices(vocab, k=rng.randint(0, 25)))
        pairs.append((a, b))
    got = batch_jaccard([p[0] for p in pairs], [p[1] for p in pairs])
    for (a, b), g in zip(pairs, got):
        assert abs(g - exact_jaccard(a, b)) < 1e-12, (a, b)


def test_join_ops_randomized_vs_duckdb(ray_session):
    """10 seeded random frames through BOTH custom joins, each checked
    against DuckDB (ASOF LEFT JOIN / inequality join): random key
    cardinality, ts collisions across sides, empty sides."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from sagan_ray.stages.window import asof_join, range_join

    rng = np.random.RandomState(17)
    con = duckdb.connect()
    for trial in range(10):
        nl, nr = rng.randint(0, 40), rng.randint(0, 40)
        base = pd.Timestamp("2024-03-01")
        mk = lambda n, vcol: pd.DataFrame({
            "k": rng.randint(0, 5, size=n),
            "ts": base + pd.to_timedelta(rng.randint(0, 3600, size=n), "s"),
            vcol: np.arange(n, dtype=np.int64),
        })
        left, right = mk(nl, "lv"), mk(nr, "rv")
        # unique (k, ts) on the right: deterministic asof/tie semantics
        right = right.drop_duplicates(["k", "ts"]).reset_index(drop=True)
        if nl == 0:
            continue  # empty left: nothing to compare
        con.register("l", left)
        con.register("r", right)
        got_a = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                           keys=["k"], ts_col="ts").to_pandas()
                 .sort_values(["k", "ts", "lv"]).reset_index(drop=True))
        ref_a = con.execute(
            "SELECT l.k, l.ts, l.lv, r.rv FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.ts >= r.ts ORDER BY l.k, l.ts, l.lv"
        ).df()
        assert len(got_a) == len(ref_a), f"asof trial {trial}"
        for a, b in zip(got_a["rv"].tolist(), ref_a["rv"].tolist()):
            assert (pd.isna(a) and pd.isna(b)) or int(a) == int(b), \
                f"asof trial {trial}"
        got_r = (range_join(rd.from_pandas(left), rd.from_pandas(right),
                            keys=["k"], ts_col="ts", lo=pd.Timedelta(0),
                            hi=pd.Timedelta(minutes=10)).to_pandas()
                 .sort_values(["k", "ts", "lv", "rv"]).reset_index(drop=True))
        ref_r = con.execute(
            "SELECT l.k, l.ts, l.lv, r.rv FROM l JOIN r ON l.k = r.k "
            "AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 10 MINUTE "
            "ORDER BY l.k, l.ts, l.lv, r.rv"
        ).df()
        assert got_r["rv"].tolist() == ref_r["rv"].tolist(), \
            f"range trial {trial}"
        con.unregister("l")
        con.unregister("r")


def test_pii_scrub_matches_duckdb(ray_session):
    """pii_scrub_batch (Arrow RE2 passes) vs DuckDB regexp_replace 'g'
    (also RE2) applied in the same order — bit-identical rewrites, and
    redaction counts equal regexp_extract_all lengths."""
    import duckdb
    import pyarrow as pa

    from sagan_ray.stages.text import PII_PATTERNS, pii_scrub_batch

    texts = [
        "contact john.doe+x@mail.example.org or 10.0.42.7 today",
        "call +1 555-123-4567 or +44 20 7946 0958, srv 192.168.1.254:8080",
        "no pii here at all",
        "a@b.io b@c.de back to back",
        "999.999.999.999 still looks like an ip to the scrubber",
        "pre-existing <EMAIL> marker must not count",
        None,
        "",
    ]
    t = pa.table({"doc_id": list(range(len(texts))),
                  "text": pa.array(texts, type=pa.string())})
    out = pii_scrub_batch(t)
    con = duckdb.connect()
    con.register("x", t)
    expr, cnt = "text", []
    for p, r in PII_PATTERNS:
        cnt.append(f"len(regexp_extract_all({expr}, '{p}'))")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    rows = con.execute(
        f"SELECT {expr}, {' + '.join(cnt)} FROM x ORDER BY doc_id"
    ).fetchall()
    assert out["text"].to_pylist() == [r[0] for r in rows]
    got_n = out["n_redactions"].to_pylist()
    want_n = [r[1] for r in rows]
    # null text -> null count on both sides
    assert got_n == want_n
    # stage plumbing: runs over a Dataset and keeps schema stable
    import ray.data as rd

    from sagan_ray.stages.text import pii_scrub_stage

    ds = pii_scrub_stage(rd.from_arrow(t))
    assert ds.count() == len(texts)
    assert set(ds.schema().names) == {"doc_id", "text", "n_redactions"}


def test_quality_filter_stage_matches_duckdb(ray_session):
    """The composed quality gate keeps exactly the rows DuckDB keeps
    when the same bounds are restated over the same integer features."""
    import duckdb
    import ray.data as rd

    from sagan_ray.stages.text import quality_filter_stage

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    out = quality_filter_stage(ds, min_tokens=8, min_stop_ratio=0.05,
                               max_mean_token_len=9.0)
    got = sorted(out.to_pandas()["doc_id"].tolist())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    want = [r[0] for r in con.execute("""
        WITH f AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 len(string_split(text, ' ')) AS n_tok,
                 len(list_filter(string_split(text, ' '),
                                 w -> w IN ('a', 'the'))) AS n_stop
          FROM documents)
        SELECT doc_id FROM f
        WHERE n_tok >= 8
          AND n_tok <= 100000
          AND (n_stop * 1.0 / n_tok) >= 0.05
          AND ((n_chars - (n_tok - 1)) * 1.0 / n_tok) <= 9.0
        ORDER BY doc_id""").fetchall()]
    assert got == want and 0 < len(got) < 500


def test_asof_join_forward_direction(ray_session):
    """direction="forward" == DuckDB ASOF LEFT JOIN with l.ts <= r.ts
    (nearest right row at or after each left row), randomized."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from sagan_ray.stages.window import asof_join

    rng = np.random.RandomState(23)
    con = duckdb.connect()
    base = pd.Timestamp("2024-03-01")
    for trial in range(6):
        nl, nr = rng.randint(1, 40), rng.randint(0, 40)

        def mk(n, vcol):
            return pd.DataFrame({
                "k": rng.randint(0, 5, size=n),
                "ts": base + pd.to_timedelta(
                    rng.randint(0, 3600, size=n), "s"),
                vcol: np.arange(n, dtype=np.int64),
            })

        left, right = mk(nl, "lv"), mk(nr, "rv")
        right = right.drop_duplicates(["k", "ts"]).reset_index(drop=True)
        con.register("l", left)
        con.register("r", right)
        got = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                         keys=["k"], ts_col="ts", direction="forward")
               .to_pandas().sort_values(["k", "ts", "lv"])
               .reset_index(drop=True))
        ref = con.execute(
            "SELECT l.k, l.ts, l.lv, r.rv FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.ts <= r.ts ORDER BY l.k, l.ts, l.lv"
        ).df()
        assert len(got) == len(ref), f"trial {trial}"
        for a, b in zip(got["rv"].tolist(), ref["rv"].tolist()):
            assert (pd.isna(a) and pd.isna(b)) or int(a) == int(b), \
                f"trial {trial}"
        con.unregister("l")
        con.unregister("r")
