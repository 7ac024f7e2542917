"""Differential property test for the matcher: a NAIVE per-row
reference implementation (written straight from the frozen semantics in
rules.py, no shared code paths with the vectorized matcher beyond the
compiled IR) must agree with rule_mask on random texts and rules."""

import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from sagan_ray.rules import parse_rule
from sagan_ray.stages.match import rule_mask

WORDS = ["foo", "bar", "baz", "qux", "key", "value", "zap"]


def naive_match(text: str, host: str, lang: str, rule) -> bool:
    if rule.programs and not rule._program_re.match(host):
        return False
    if rule.facility is not None and lang != rule.facility:
        return False
    prev_end = 0
    for c in rule.contents:
        hay = text.lower() if c.nocase else text
        pat = c.pattern.lower() if c.nocase else c.pattern
        if c.relative:
            start = prev_end + (c.distance or 0)
            stop = start + c.within if c.within is not None else len(text)
        else:
            start = c.offset or 0
            stop = start + c.depth if c.depth is not None else len(text)
        idx = hay.find(pat, max(0, start))
        found = idx != -1 and idx < stop
        if c.negated:
            if found:
                return False
        else:
            if not found:
                return False
            prev_end = idx + len(pat)
    for mc in rule.meta_contents:
        if not any(
            (lit.lower() in text.lower() if mc.nocase else lit in text)
            for lit in mc.literals()
        ):
            return False
    for p, crx in zip(rule.pcres, rule._pcre_compiled):
        hit = bool(crx.search(text))
        if p.negated == hit:
            return False
    return True


content_st = st.builds(
    lambda w, nocase, neg, off, depth, dist, within, rel: {
        "w": w, "nocase": nocase, "neg": neg,
        "off": off, "depth": depth, "dist": dist, "within": within, "rel": rel,
    },
    st.sampled_from(WORDS),
    st.booleans(),
    st.booleans(),
    st.integers(0, 10),
    st.one_of(st.none(), st.integers(1, 40)),
    st.integers(0, 5),
    st.one_of(st.none(), st.integers(1, 30)),
    st.booleans(),
)


def build_rule(contents, pcre_word, use_pcre):
    opts = ["sid:1"]
    first = True
    for c in contents:
        pat = c["w"].upper() if c["nocase"] else c["w"]
        neg = "!" if c["neg"] else ""
        opts.append(f'content:{neg}"{pat}"')
        if c["nocase"]:
            opts.append("nocase")
        if not first and c["rel"]:
            opts.append(f"distance:{c['dist']}")
            if c["within"] is not None:
                opts.append(f"within:{c['within']}")
        else:
            if c["off"]:
                opts.append(f"offset:{c['off']}")
            if c["depth"] is not None:
                opts.append(f"depth:{c['depth']}")
        first = False
    if use_pcre:
        opts.append(f'pcre:"/\\b{pcre_word}s?\\b/"')
    return parse_rule("alert any any any -> any any (" + "; ".join(opts) + ";)")


@settings(max_examples=120, deadline=None)
@given(
    st.lists(content_st, min_size=1, max_size=3),
    st.sampled_from(WORDS),
    st.booleans(),
    st.lists(
        st.lists(st.sampled_from(WORDS + ["XX", "yy"]), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
)
def test_vectorized_matches_naive(contents, pcre_word, use_pcre, texts_words):
    rule = build_rule(contents, pcre_word, use_pcre)
    texts = [" ".join(ws) for ws in texts_words]
    n = len(texts)
    batch = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(n)]),
            "warc_ts": pa.array([1_700_000_000_000_000] * n, type=pa.timestamp("us")),
            "host": pa.array(["h"] * n),
            "lang": pa.array(["en"] * n),
            "text": pa.array(texts),
        }
    )
    got = rule_mask(batch, rule).tolist()
    want = [naive_match(t, "h", "en", rule) for t in texts]
    assert got == want, f"rule={rule} texts={texts}"
