"""Property-based coverage for round-2 surfaces: header parsing, the
bounded hamming pair kernel, and end-to-end MinHash pair exactness
against a brute-force oracle."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sagan_ray.rules import parse_rule

_host = st.from_regex(r"[a-z][a-z0-9.-]{0,10}", fullmatch=True)


@given(
    src=st.lists(_host, min_size=1, max_size=3),
    dst=st.lists(_host, min_size=1, max_size=2),
    neg=st.booleans(),
    bidir=st.booleans(),
    proto=st.sampled_from(["any", "tcp", "udp", "icmp"]),
)
@settings(max_examples=200, deadline=None)
def test_header_parse_roundtrip(src, dst, neg, bidir, proto):
    """Any well-formed header parses into the expected spec pieces."""
    src_s = "[" + ",".join(src) + "]"
    if neg:
        src_s = "!" + src_s
    dst_s = "[" + ",".join(dst) + "]"
    d = "<>" if bidir else "->"
    line = f'alert {proto} {src_s} any {d} {dst_s} any (sid:1; content:"x";)'
    r = parse_rule(line)
    assert r.header is not None
    assert r.header.src.globs == tuple(src)
    assert r.header.src.negated == neg
    assert r.header.dst.globs == tuple(dst)
    assert r.header.bidirectional == bidir
    assert r.header.proto == proto


@given(
    n=st.integers(min_value=2, max_value=300),
    max_group=st.integers(min_value=4, max_value=64),
    max_hamming=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=10_000),
    near_frac=st.floats(min_value=0.0, max_value=0.5),
)
@settings(max_examples=60, deadline=None)
def test_bounded_hamming_pairs_equal_bruteforce(
    n, max_group, max_hamming, seed, near_frac
):
    import sagan_ray.stages.dedup as dd

    rng = np.random.RandomState(seed)
    sig = rng.randint(0, 2**63, size=n, dtype=np.int64).view(np.uint64)
    n_near = int(n * near_frac)
    for i in range(0, max(0, n_near - 1), 2):
        flips = rng.randint(0, 64, size=rng.randint(0, max_hamming + 1))
        v = int(sig[i])
        for f in flips:
            v ^= 1 << int(f)
        sig[i + 1] = np.uint64(v)
    ids = np.arange(n, dtype=np.int64)
    expect = set()
    for i in range(n):
        for j in range(i + 1, n):
            if bin(int(sig[i]) ^ int(sig[j])).count("1") <= max_hamming:
                expect.add((i, j))
    prev = dd._MAX_SEG_GROUP
    dd._MAX_SEG_GROUP = max_group
    try:
        a, b, h = dd._group_pairs_bounded(
            ids, sig, seg=0, n_seg=max_hamming + 1,
            seg_bits=64 // (max_hamming + 1), max_hamming=max_hamming
        )
    finally:
        dd._MAX_SEG_GROUP = prev
    assert set(zip(a.tolist(), b.tolist())) == expect


def test_minhash_pipeline_equals_bruteforce_pairs(ray_session):
    """End-to-end: the distributed LSH+verify pipeline finds EXACTLY the
    brute-force jaccard>=0.9 pair set on a corpus with planted near-dups
    (validates the no-candidate-loss claim behind the SQL oracle)."""
    import ray.data as rd

    from sagan_ray.stages.dedup import exact_jaccard, minhash_lsh_pairs

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(60)]
    texts, ids = [], []
    for i in range(40):
        words = [vocab[x] for x in rng.randint(0, 60, size=50)]
        texts.append(" ".join(words))
        ids.append(i)
    for i in range(12):  # near-dups: drop the first 2 words
        texts.append(" ".join(texts[i].split()[2:]))
        ids.append(1000 + i)
    import pyarrow as pa

    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                 "text": pa.array(texts)}))
    got = minhash_lsh_pairs(ds, threshold=0.9).to_pandas()
    got_pairs = set(zip(got.doc_id_a.astype(int), got.doc_id_b.astype(int)))
    expect = set()
    by_id = dict(zip(ids, texts))
    for x in ids:
        for y in ids:
            if x < y and exact_jaccard(by_id[x], by_id[y]) >= 0.9:
                expect.add((x, y))
    assert got_pairs == expect
    assert len(expect) >= 12  # every planted near-dup found
