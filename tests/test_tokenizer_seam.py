"""The injectable tokenizer seam (functions/tokenize.py): a fake BPE
drops into every token-denominated operator; defaults stay whitespace
(the existing differentials pin that — these tests pin the seam)."""
import numpy as np
import pyarrow as pa


def _fakes():
    """A deterministic 'BPE': dash-separated units, so token counts
    disagree with whitespace wherever a word contains '-'. Closures
    (not module-level defs) so cloudpickle ships them BY VALUE to Ray
    workers — the test module isn't importable there."""
    def fake_tokenize(texts):
        return [t.replace(" ", "-").split("-") if t else [] for t in texts]

    def fake_detokenize(tokens):
        return "|".join(tokens)

    return fake_tokenize, fake_detokenize


fake_tokenize, fake_detokenize = _fakes()


def test_pack_batch_counts_via_seam():
    from sagan_ray.stages.pack import pack_batch

    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": ["a-b-c d", "x y"],  # fake: 4 + 2 tokens; ws: 2 + 2
    })
    out = pack_batch(t, cap=4, tokenize=fake_tokenize).to_pandas()
    # fake counts: doc1=4 fills the cap alone, doc2=2 starts a new seq
    assert out["n_tokens"].tolist() == [4, 2]
    assert out["doc_ids"].tolist() == [[1], [2]]
    assert out["truncated"].tolist() == [False, False]
    # default (BPE-ish regex) counts the dashes too: doc1 = 6 tokens,
    # alone over the cap -> truncated; the seam changed the arithmetic
    out_def = pack_batch(t, cap=4).to_pandas()
    assert out_def["n_tokens"].tolist() == [6, 2]
    assert out_def["truncated"].tolist() == [True, False]


def test_chunk_documents_via_seam(ray_session):
    import ray.data as rd

    from sagan_ray.stages.pack import chunk_documents

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": ["a-b-c-d-e-f"],  # 6 fake tokens, 1 whitespace token
    }))
    out = chunk_documents(ds, chunk_tokens=4, overlap=1,
                          tokenize=fake_tokenize,
                          detokenize=fake_detokenize).to_pandas()
    assert out["text"].tolist() == ["a|b|c|d", "d|e|f"]
    assert out["n_tokens"].tolist() == [4, 3]
    ws = chunk_documents(ds, chunk_tokens=4, overlap=1).to_pandas()
    assert ws["text"].tolist() == ["a-b-c-d-e-f"]  # one ws token


def test_select_top_tokens_via_seam(ray_session):
    import ray.data as rd

    from sagan_ray.stages.pack import select_top_tokens

    # 10 docs, scores descending with doc_id; fake token count = 4 each
    # (ws count = 1) -> a 13-token budget keeps exactly 3 docs
    t = pa.table({
        "doc_id": pa.array(np.arange(10, dtype=np.int64)),
        "score": pa.array((10 - np.arange(10)).astype(np.float64)),
        "text": ["w-x-y-z"] * 10,
    })
    out = select_top_tokens(rd.from_arrow(t), budget=13,
                            score_col="score",
                            tokenize=fake_tokenize).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 1, 2]


def test_mask_duplicate_spans_via_seam(ray_session):
    import ray.data as rd

    from sagan_ray.stages.spans import mask_duplicate_spans

    dup = "p-q-r-s"  # 4 fake tokens shared by both docs
    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": [f"one-two {dup}", f"three-four {dup}"],
    })
    out = mask_duplicate_spans(
        rd.from_arrow(t), k=3, min_docs=2, tokenize=fake_tokenize,
        detokenize=fake_detokenize).to_pandas().sort_values("doc_id")
    # the shared 4-token run masks from both docs; untouched prefixes
    # survive via detokenize of the kept tokens
    assert out["text"].tolist() == ["one|two", "three|four"]
    assert out["n_masked_tokens"].tolist() == [4, 4]
    # whitespace default: no 3-gram of WORDS is shared (each doc's
    # words are ["one-two", "p-q-r-s"]-style 2-word lists) -> untouched
    ws = mask_duplicate_spans(
        rd.from_arrow(t), k=3, min_docs=2).to_pandas().sort_values("doc_id")
    assert ws["text"].tolist() == t["text"].to_pylist()
    assert ws["n_masked_tokens"].tolist() == [0, 0]
