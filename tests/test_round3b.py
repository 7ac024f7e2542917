"""Round-3 additions: decontamination + repetition filters.

Differentials run against independent pure-Python set/Counter
implementations over n-gram STRINGS (the stages use 64-bit hashes;
collision probability at test sizes is ~0, so flags/fractions must be
bit-equal)."""
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from sagan_ray.stages.decontam import (
    build_ngram_blocklist,
    contamination_counts,
    decontaminate,
)
from sagan_ray.stages.text import repetition_batch, repetition_filter_stage


def _py_ngrams(text: str, n: int) -> set[str]:
    ws = text.split()
    if not ws:
        return set()
    if len(ws) < n:
        return {" ".join(ws)}
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


RNG_DOCS = [
    "the quick brown fox jumps over the lazy dog every single day",
    "pack my box with five dozen liquor jugs",
    "",
    "one",
    "the quick brown fox jumps over the lazy dog",  # shares 8-grams with doc 0
    "completely unrelated text about distributed data processing engines",
    "repeat repeat repeat repeat repeat repeat repeat repeat repeat",
]
EVAL_SET = [
    "the quick brown fox jumps over the lazy dog",
    "a benchmark question about liquor jugs",
]


@pytest.mark.parametrize("n", [3, 8])
def test_contamination_counts_match_python_sets(n):
    block = build_ngram_blocklist(EVAL_SET, n=n)
    n_ngrams, n_hits = contamination_counts(RNG_DOCS, block, n=n)
    eval_grams = set()
    for t in EVAL_SET:
        eval_grams |= _py_ngrams(t, n)
    for i, doc in enumerate(RNG_DOCS):
        grams = _py_ngrams(doc, n)
        assert n_ngrams[i] == len(grams), (i, doc)
        assert n_hits[i] == len(grams & eval_grams), (i, doc)


def test_decontaminate_strict_drops_overlapping_docs(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(RNG_DOCS))), "text": RNG_DOCS})
    )
    out = decontaminate(ds, EVAL_SET, n=8, min_overlap_ratio=0.0)
    kept = sorted(out.to_pandas()["doc_id"].tolist())
    eval_grams = set()
    for t in EVAL_SET:
        eval_grams |= _py_ngrams(t, 8)
    expect = [
        i for i, d in enumerate(RNG_DOCS)
        if not (_py_ngrams(d, 8) & eval_grams)
    ]
    assert kept == expect
    # doc 4 is verbatim in the eval set -> must be gone; doc 0 contains it
    assert 4 not in kept and 0 not in kept


REP_DOCS = [
    "a\nb\nc",                       # no dup lines
    "x\nx\nx\ny",                    # 2 of 4 lines are repeats
    "hello world hello world hello world hello",  # dominant 2-gram
    "",                              # empty
    "solo",                          # single word
    "line one\nline one\nuna linea distinta",
]


def _py_repetition(text: str):
    # empty lines are paragraph separators, not content (matches the
    # stage's documented exclusion)
    lines = [ln for ln in text.split("\n") if ln]
    seen, dup, dup_chars = set(), 0, 0
    for ln in lines:
        if ln in seen:
            dup += 1
            dup_chars += len(ln)
        else:
            seen.add(ln)
    tot_chars = sum(len(ln) for ln in lines)
    ws = text.split()
    grams = [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
    if len(grams) > 1:
        top2 = Counter(grams).most_common(1)[0][1] / len(grams)
    else:
        top2 = 0.0
    return (
        dup / len(lines) if lines else 0.0,
        dup_chars / tot_chars if tot_chars else 0.0,
        top2,
    )


def test_repetition_batch_matches_python():
    t = pa.table({"doc_id": list(range(len(REP_DOCS))), "text": REP_DOCS})
    out = repetition_batch(t)
    for i, doc in enumerate(REP_DOCS):
        exp = _py_repetition(doc)
        got = (
            out["dup_line_frac"][i].as_py(),
            out["dup_line_char_frac"][i].as_py(),
            out["top_2gram_frac"][i].as_py(),
        )
        assert got == pytest.approx(exp), (i, doc, got, exp)


def test_repetition_filter_stage_gates(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(REP_DOCS))), "text": REP_DOCS})
    )
    out = repetition_filter_stage(
        ds, max_dup_line_frac=0.3, max_top_2gram_frac=0.4
    )
    kept = sorted(out.to_pandas()["doc_id"].tolist())
    expect = [
        i for i, d in enumerate(REP_DOCS)
        if _py_repetition(d)[0] <= 0.3 and _py_repetition(d)[2] <= 0.4
    ]
    assert kept == expect
    assert 1 not in kept and 2 not in kept  # the engineered repeats are gone


# ---------------------------------------------------------------------------
# corpus-level duplicate-line removal
# ---------------------------------------------------------------------------

BOILER_DOCS = [
    "Accept our cookies please\nreal content one\nmore unique text here",
    "Accept our cookies please\nreal content two",
    "Accept our cookies please\nreal content three\nAccept our cookies please",
    "totally unique document\nnothing shared at all",
    "short\nAccept our cookies please",
]


def _py_frequent(docs, min_count=2, min_chars=10):
    from collections import Counter

    c = Counter()
    for d in docs:
        for ln in set(d.split("\n")):
            if len(ln) >= min_chars:
                c[ln] += 1
    return {ln for ln, n in c.items() if n >= min_count}


def test_frequent_line_hashes_matches_python(ray_session):
    import ray.data as rd

    from sagan_ray.stages.text import frequent_line_hashes

    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(BOILER_DOCS))),
                                 "text": BOILER_DOCS}))
    out = frequent_line_hashes(ds).to_pandas()
    exp = _py_frequent(BOILER_DOCS)
    assert len(out) == len(exp)  # {"Accept our cookies please"} only
    assert out["n"].tolist() == [4]  # 4 DOCS carry it (in-doc repeat = 1)


def test_strip_frequent_lines_rewrites(ray_session):
    import ray.data as rd

    from sagan_ray.stages.text import strip_frequent_lines

    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(BOILER_DOCS))),
                                 "text": BOILER_DOCS}))
    out = (strip_frequent_lines(ds, min_count=2).to_pandas()
           .sort_values("doc_id"))
    freq = _py_frequent(BOILER_DOCS)
    expect = []
    for d in BOILER_DOCS:
        expect.append("\n".join(
            ln for ln in d.split("\n")
            if len(ln) < 10 or ln not in freq
        ))
    assert out["text"].tolist() == expect
    # the boilerplate line is gone everywhere, short lines survive
    assert all("cookies" not in t for t in out["text"])
    assert "short" in out["text"].tolist()[4]


def test_normalize_text_matches_duckdb(ray_session):
    """NFC + control-strip is byte-identical to the DuckDB restatement
    (same RE2 pattern, same NFC) on composed/decomposed/mojibake text."""
    import duckdb
    import ray.data as rd

    from sagan_ray.stages.text import CONTROL_CHAR_RE, normalize_text_stage

    docs = [
        "café naive",          # decomposed accent -> NFC composes
        "café already composed",
        "zero​width‌join‍ here﻿",
        "ctrl\x00\x01\x1f\x7fchars keep\ttab and\nnewline\r",
        "",
        "plain ascii",
        "A\u030a ring",          # A + combining ring -> NFC \u00c5
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs, type=pa.string()),
    })
    got = (normalize_text_stage(rd.from_arrow(t))
           .to_pandas().sort_values("doc_id")["text"].tolist())
    con = duckdb.connect()
    con.register("docs", t)
    want = con.execute(
        "SELECT regexp_replace(nfc_normalize(text), ?, '', 'g') "
        "FROM docs ORDER BY doc_id", [CONTROL_CHAR_RE]
    ).fetchall()
    assert got == [w[0] for w in want]
    assert got[0] == "café naive"
    assert got[2] == "zerowidthjoin here"
    assert got[3] == "ctrlchars keep\ttab and\nnewline\r"
    assert got[6] == "Å ring"


def test_normalize_text_collapse_spaces(ray_session):
    import ray.data as rd

    from sagan_ray.stages.text import normalize_text_stage

    t = pa.table({"doc_id": pa.array([0]),
                  "text": pa.array(["a   b  c d"])})
    out = normalize_text_stage(rd.from_arrow(t),
                               collapse_spaces=True).to_pandas()
    assert out["text"][0] == "a b c d"


def test_multi_paragraph_prose_not_flagged_repetitive(ray_session):
    """Regression (review finding): blank paragraph separators must not
    count as duplicate lines — clean prose was exceeding the 0.3 gate."""
    import ray.data as rd

    from sagan_ray.stages.text import repetition_filter_stage

    paras = "\n\n".join(
        f"paragraph {i} has its own words entirely" for i in range(5))
    t = pa.table({"doc_id": pa.array([0]), "text": pa.array([paras])})
    r = repetition_batch(t)
    assert r["dup_line_frac"][0].as_py() == 0.0
    kept = repetition_filter_stage(rd.from_arrow(t)).count()
    assert kept == 1
