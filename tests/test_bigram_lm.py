"""Interpolated bigram LM (lm.BigramLM) — distributed train + score
must mirror a pure-Python Counter implementation of the same spec to
1e-12 (the unigram family's differential pattern)."""
import numpy as np
import pyarrow as pa
import pytest


def _docs():
    return [
        "the cat sat on the mat",
        "the cat ran over the hill and the cat slept",
        "a dog sat on a log near the mat",
        "the mat sat still",
        "completely unrelated words here",
        "",
    ]


def _tok_hash(word: str) -> int:
    """The repo's token hash via the k=1 shingle kernel (vectorized
    siphash + shingle mix) — the mirror must CALL the kernel, not
    reimplement the hash."""
    from sagan_ray.stages.dedup import _batch_shingle_hashes

    sh, _ = _batch_shingle_hashes([word], k=1)
    return int(sh[0])


def _mirror(train_docs, score_docs, vocab_size, bigram_size, alpha, lam):
    from collections import Counter

    from sagan_ray.stages.lm import _bigram_combine

    uni, bi = Counter(), Counter()
    for d in train_docs:
        ws = [_tok_hash(w) for w in d.split()]
        uni.update(ws)
        for a, b in zip(ws, ws[1:]):
            bi[int(_bigram_combine(np.array([a], dtype=np.uint64),
                                   np.array([b], dtype=np.uint64))[0])] += 1
    total = sum(uni.values())

    def top(counter, k):
        # count desc, hash asc — the train tie-break
        return dict(sorted(counter.items(),
                           key=lambda kv: (-kv[1], kv[0]))[:k])

    uni_h = top(uni, vocab_size)
    bi_h = top(bi, bigram_size)

    def p_uni(h):
        return uni_h.get(h, alpha) / total

    out = []
    for d in score_docs:
        ws = [_tok_hash(w) for w in d.split()]
        if not ws:
            out.append(np.log(alpha / total))  # pure-unigram OOV floor
            continue
        lps = [np.log(p_uni(ws[0]))]
        for a, b in zip(ws, ws[1:]):
            base = (1 - lam) * p_uni(b)
            if a in uni_h:
                bh = int(_bigram_combine(np.array([a], dtype=np.uint64),
                                         np.array([b], dtype=np.uint64))[0])
                p_b = min(bi_h.get(bh, 0) / uni_h[a], 1.0)
                base += lam * p_b
            lps.append(np.log(base))
        out.append(float(np.mean(lps)))
    return np.array(out)


@pytest.mark.parametrize("vocab,bsize", [(1 << 16, 1 << 16), (6, 4)])
def test_bigram_lm_mirrors_counter(ray_session, vocab, bsize):
    import ray.data as rd

    from sagan_ray.stages.lm import train_bigram_lm

    docs = _docs()
    t = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                  "text": docs})
    ds = rd.from_arrow(t).repartition(3)
    kw = dict(alpha=0.5, lam=0.7)
    model = train_bigram_lm(ds, vocab_size=vocab, bigram_size=bsize,
                            **kw)
    n_tok, lp = model.score_counts(docs)
    expected = _mirror(docs, docs, vocab, bsize, **kw)
    np.testing.assert_allclose(lp, expected, rtol=0, atol=1e-12)
    assert n_tok.tolist() == [len(d.split()) for d in docs]


def test_bigram_beats_unigram_on_word_order(ray_session):
    """The point of the bigram term: a doc with reference word ORDER
    outscores the same bag of words shuffled — a unigram model cannot
    tell them apart."""
    import ray.data as rd

    from sagan_ray.stages.lm import train_bigram_lm, train_unigram_lm

    train = ["the cat sat on the mat"] * 20
    t = pa.table({"doc_id": pa.array(range(20), type=pa.int64()),
                  "text": train})
    ds = rd.from_arrow(t)
    bi = train_bigram_lm(ds, lam=0.7)
    un = train_unigram_lm(ds)
    ordered = "the cat sat on the mat"
    shuffled = "mat the on sat cat the"
    _, lp_bi = bi.score_counts([ordered, shuffled])
    assert lp_bi[0] > lp_bi[1] + 0.1  # order matters to the bigram
    from sagan_ray.stages.lm import lm_score_counts

    _, lp_un = lm_score_counts([ordered, shuffled], un)
    np.testing.assert_allclose(lp_un[0], lp_un[1], atol=1e-12)


def test_bigram_model_drops_into_lm_stages(ray_session):
    """lm_score / lm_filter_stage dispatch on score_counts, so the
    bigram model drops into the existing stages unchanged."""
    import ray.data as rd

    from sagan_ray.stages.lm import lm_filter_stage, lm_score, train_bigram_lm

    train = ["plain prose about engines and pipelines"] * 5
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), type=pa.int64()), "text": train}))
    model = train_bigram_lm(ds)
    docs = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": ["plain prose about engines",
                 "zzqx vvkw jjpq mmtt"],
    })
    scored = lm_score(rd.from_arrow(docs), model,
                      keep_text=True).to_pandas().sort_values("doc_id")
    assert scored["lm_logprob"].iloc[0] > scored["lm_logprob"].iloc[1]
    kept = lm_filter_stage(
        rd.from_arrow(docs), model,
        min_logprob=float(scored["lm_logprob"].iloc[1]) + 1e-9,
    ).to_pandas()
    assert kept["doc_id"].tolist() == [0]
