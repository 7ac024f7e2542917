"""Injectable tokenizer seam for the token-denominated operators.

Every token count in the repo (packing, chunking, budget selection,
span masking) defaults to the whitespace / BPE-ish-regex contract the
differentials are written against — but a REAL tokenizer (a BPE wheel,
outside this sandbox) must be able to drop in without forking the
operators. The seam is two callables, both BATCH-level so a vectorized
or model-backed tokenizer amortizes its per-call cost:

- ``tokenize(texts: list[str|None]) -> list[list[str]]`` — one token
  list per input text (``None``/empty -> ``[]``). Determinism is part
  of the contract: task retries and the two passes of the span masker
  re-tokenize the same text and must get the same tokens.
- ``detokenize(tokens: list[str]) -> str`` — inverse used where an
  operator REWRITES text from kept tokens (chunking, span masking).
  Need not round-trip the original bytes — operators that promise
  byte-identity for untouched rows keep the original string and only
  call ``detokenize`` on rows they actually modify.

Operators taking the seam: ``pack.pack_batch`` / ``pack.pack_stage``
(counts only), ``pack.chunk_batch`` / ``pack.chunk_documents``,
``pack.select_top_tokens`` (counts only), and
``spans.mask_duplicate_spans`` / ``spans.duplicate_gram_hashes``.
Passing ``None`` everywhere keeps the historical whitespace behavior
bit-for-bit (the default differentials stay green).
"""

from __future__ import annotations

from typing import Callable, List, Optional

Tokenize = Callable[[List[Optional[str]]], List[List[str]]]
Detokenize = Callable[[List[str]], str]


def whitespace_tokenize(texts):
    """The default contract: ``str.split()`` per text, ``[]`` for
    null/empty."""
    return [t.split() if t else [] for t in texts]


def whitespace_detokenize(tokens):
    return " ".join(tokens)
