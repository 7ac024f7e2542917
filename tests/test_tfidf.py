"""TF-IDF features (lm.train_doc_freq / tfidf_stage) — distributed
result mirrors a pure-Python Counter implementation to 1e-12."""
import numpy as np
import pyarrow as pa


def _docs():
    return [
        "the cat sat on the mat",
        "the dog sat on the log",
        "cat dog cat dog cat",
        "completely distinct vocabulary here",
        "",
    ]


def _tok_hash(word):
    from sagan_ray.stages.dedup import _batch_shingle_hashes

    sh, _ = _batch_shingle_hashes([word], k=1)
    return int(sh[0])


def _mirror_features(docs, vocab_size, min_df):
    from collections import Counter

    df = Counter()
    for d in docs:
        df.update({_tok_hash(w) for w in d.split()})
    df = Counter({h: c for h, c in df.items() if c >= min_df})
    head = dict(sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))
                [:vocab_size])
    n = len(docs)

    def idf(h):
        d = head.get(h, 1.0)
        return np.log((1.0 + n) / (1.0 + d)) + 1.0

    out = []
    for d in docs:
        ws = [_tok_hash(w) for w in d.split()]
        if not ws:
            out.append((0, 0.0, 0.0))
            continue
        tf = Counter(ws)
        weights = [cnt / len(ws) * idf(h) for h, cnt in tf.items()]
        out.append((len(tf), float(np.mean(weights)),
                    float(np.max(weights))))
    return out


def test_tfidf_mirrors_counter(ray_session):
    import ray.data as rd

    from sagan_ray.stages.lm import tfidf_stage, train_doc_freq

    docs = _docs()
    t = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                  "text": docs})
    ds = rd.from_arrow(t).repartition(2)
    for vocab, min_df in [(1 << 20, 1), (5, 2)]:
        table = train_doc_freq(ds, vocab_size=vocab, min_df=min_df)
        out = (tfidf_stage(ds, table).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        exp = _mirror_features(docs, vocab, min_df)
        for i, (nd, mean_w, max_w) in enumerate(exp):
            assert out["n_distinct_terms"].iloc[i] == nd, (vocab, i)
            np.testing.assert_allclose(out["tfidf_mean"].iloc[i], mean_w,
                                       atol=1e-12)
            np.testing.assert_allclose(out["tfidf_max"].iloc[i], max_w,
                                       atol=1e-12)


def test_tfidf_rare_terms_weigh_more(ray_session):
    import ray.data as rd

    from sagan_ray.stages.lm import tfidf_stage, train_doc_freq

    # equal tf structure (3 distinct tokens each, once each): only the
    # idf differs — 9 docs share one vocabulary, one doc is all-rare
    docs = ["shared words here"] * 9 + ["rare tokens now"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(10), type=pa.int64()), "text": docs}))
    table = train_doc_freq(ds)
    out = (tfidf_stage(ds, table).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["tfidf_mean"].iloc[9] > out["tfidf_mean"].iloc[0]
    assert out["tfidf_max"].iloc[9] > out["tfidf_max"].iloc[0]
