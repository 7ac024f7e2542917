"""Duplicate-span masking (stages/spans.py) vs a pure-Python reference.

The reference builds the duplicated-gram set from tuple-of-words grams
(no hashing) and masks per the module contract; both Ray modes
(broadcast / join) must match it text-for-text and count-for-count."""
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from sagan_ray.stages.spans import (
    _gram_hashes,
    duplicate_gram_hashes,
    mask_duplicate_spans,
)


def ref_mask(corpus, k, min_docs, min_span):
    gram_docs = Counter()
    for t in corpus:
        ws = (t or "").split()
        gram_docs.update({tuple(ws[i:i + k])
                          for i in range(len(ws) - k + 1)})
    dup = {g for g, n in gram_docs.items() if n >= min_docs}
    min_run = min_span - k + 1
    outs, masked = [], []
    for t in corpus:
        ws = (t or "").split()
        hits = [i for i in range(len(ws) - k + 1)
                if tuple(ws[i:i + k]) in dup]
        covered = [False] * len(ws)

        def flush(run):
            if len(run) >= min_run:
                for tok in range(run[0], min(run[-1] + k, len(ws))):
                    covered[tok] = True

        cur = []
        for i in hits:
            if cur and i == cur[-1] + 1:
                cur.append(i)
            else:
                if cur:
                    flush(cur)
                cur = [i]
        if cur:
            flush(cur)
        nm = sum(covered)
        outs.append(" ".join(w for w, c in zip(ws, covered) if not c)
                    if nm else t)
        masked.append(nm)
    return outs, masked


def _corpus(seed=11, n=120, planted=8):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(40)]
    docs = [" ".join(rng.choice(vocab, size=rng.randint(1, 30)))
            for _ in range(n)]
    boiler = "subscribe to our newsletter for daily updates and offers"
    for i in range(planted):
        docs[i * 3] = f"{docs[i * 3]} {boiler} w{i}"
    docs.append("")          # empty doc
    docs.append("one two")   # shorter than k
    return docs


def _table(docs):
    return pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs, type=pa.string()),
    })


def _run(ds_docs, mode, k, min_docs, min_span):
    import ray.data as rd

    out = mask_duplicate_spans(
        rd.from_arrow(_table(ds_docs)), k=k, min_docs=min_docs,
        min_span_tokens=min_span, mode=mode,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    return out


@pytest.mark.parametrize("mode", ["broadcast", "join"])
@pytest.mark.parametrize("min_span", [3, 6])
def test_mask_matches_pure_python(ray_session, mode, min_span):
    docs = _corpus()
    k, min_docs = 3, 2
    exp_text, exp_masked = ref_mask(docs, k, min_docs, min_span)
    got = _run(docs, mode, k, min_docs, min_span)
    assert got["text"].tolist() == exp_text
    assert got["n_masked_tokens"].tolist() == exp_masked
    # the planted boilerplate must actually be gone somewhere
    assert sum(exp_masked) > 0


def test_untouched_docs_are_byte_identical(ray_session):
    # weird whitespace survives ONLY when nothing is masked in that doc
    docs = ["alpha\tbeta\n gamma  delta", "x y z", "x y z"]
    got = _run(docs, "broadcast", k=3, min_docs=2, min_span=3)
    assert got["text"][0] == docs[0]
    assert got["n_masked_tokens"][0] == 0
    assert got["n_masked_tokens"][1] == 3  # dup doc fully masked
    assert got["text"][1] == ""


def test_short_docs_never_masked(ray_session):
    docs = ["a b", "a b", "a b c d e", "a b c d e"]
    got = _run(docs, "broadcast", k=3, min_docs=2, min_span=3)
    assert got["text"][0] == "a b"
    assert got["n_masked_tokens"][0] == 0
    assert got["n_masked_tokens"][2] == 5


def test_block_layout_invariance(ray_session):
    import ray.data as rd

    docs = _corpus(seed=5)
    base = _run(docs, "broadcast", k=3, min_docs=2, min_span=3)
    re = mask_duplicate_spans(
        rd.from_arrow(_table(docs)).repartition(7), k=3, min_docs=2,
        min_span_tokens=3, mode="broadcast",
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert re["text"].tolist() == base["text"].tolist()
    assert re["n_masked_tokens"].tolist() == base["n_masked_tokens"].tolist()


def test_min_docs_counts_documents_not_occurrences(ray_session):
    import ray.data as rd

    # one doc repeats a gram 5x; it appears in only ONE document
    docs = [" ".join(["p q r"] * 5), "unrelated words here entirely now"]
    dup = duplicate_gram_hashes(
        rd.from_arrow(_table(docs)), k=3, min_docs=2).to_pandas()
    # the only grams with n_docs >= 2 would need 2 docs; there are none
    assert len(dup) == 0
    got = _run(docs, "broadcast", k=3, min_docs=2, min_span=3)
    assert got["n_masked_tokens"].tolist() == [0, 0]


def test_gram_hashes_flat_kernel_edges():
    gh, starts = _gram_hashes([], 3)
    assert len(gh) == 0 and starts.tolist() == [0]
    gh, starts = _gram_hashes(["a b", "", None if False else "c d e f"], 3)
    # doc0: 0 grams (short), doc1: 0, doc2: 2 grams
    assert starts.tolist() == [0, 0, 0, 2]
    assert len(gh) == 2
    # same gram text in different docs hashes identically
    g1, _ = _gram_hashes(["x y z"], 3)
    g2, _ = _gram_hashes(["junk pad", "x y z"], 3)
    assert g1[0] == g2[-1]


@pytest.mark.parametrize("mode", ["broadcast", "join"])
def test_out_col_preserves_original_text(ray_session, mode):
    import ray.data as rd

    docs = ["dup span here now ok", "dup span here now ok", "unique words"]
    out = mask_duplicate_spans(
        rd.from_arrow(_table(docs)), k=3, min_docs=2, min_span_tokens=3,
        mode=mode, out_col="clean_text",
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["text"].tolist() == docs          # original untouched
    assert out["clean_text"][0] == ""            # fully masked
    assert out["clean_text"][2] == "unique words"
    assert out["n_masked_tokens"].tolist() == [5, 5, 0]


@pytest.mark.parametrize("mode", ["broadcast", "join"])
def test_single_pass_equals_two_scan(ray_session, mode):
    # the gram-checkpoint path (single_pass=True, default) must be
    # indistinguishable from the streaming two-scan path
    import ray.data as rd

    docs = _corpus(seed=23)
    k, min_docs, min_span = 3, 2, 3
    outs = []
    for sp in (True, False):
        out = mask_duplicate_spans(
            rd.from_arrow(_table(docs)), k=k, min_docs=min_docs,
            min_span_tokens=min_span, mode=mode, single_pass=sp,
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
    assert outs[0]["text"].tolist() == outs[1]["text"].tolist()
    assert (outs[0]["n_masked_tokens"].tolist()
            == outs[1]["n_masked_tokens"].tolist())
    # checkpoint column must not leak into the output
    assert "__grams" not in outs[0].columns


def test_grams_checkpoint_roundtrip():
    # _attach_grams -> _grams_from_list must reproduce _gram_hashes
    # exactly (incl. empty/short docs and sliced chunks)
    from sagan_ray.stages.spans import (_attach_grams, _grams_from_list,
                                        _gram_hashes)

    docs = ["alpha beta gamma delta", "", "one two",
            "alpha beta gamma delta epsilon"]
    t = _attach_grams(_table(docs), "text", 3)
    gh_ck, starts_ck = _grams_from_list(t["__grams"])
    gh, starts = _gram_hashes(docs, 3)
    assert (gh_ck == gh.view(np.int64)).all()
    assert (starts_ck == starts).all()
    # sliced table (non-zero Arrow offset) round-trips too
    gh_s, starts_s = _grams_from_list(t.slice(1)["__grams"])
    assert (starts_s == starts[1:] - starts[1]).all()
    assert (gh_s == gh.view(np.int64)[starts[1]:]).all()
