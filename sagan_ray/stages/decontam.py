"""Benchmark decontamination: flag/drop training documents that overlap an
evaluation set by shared word n-grams.

Follows the published recipe (GPT-3 appendix C; "Documenting Large Webtext
Corpora" C4 analysis): collect every word n-gram of the evaluation set, then
mark a training document contaminated when the fraction of its n-grams found
in that set reaches a threshold (``min_overlap_ratio``), or any n-gram
matches in the strict form (threshold 0.0 semantics: > 0 hits).

Scale shape (100 TB corpus, benchmark-sized eval set): the eval side is
small — its n-gram hash set builds once on the driver and broadcasts via
``ray.put`` as ONE sorted uint64 array; the corpus streams through
``map_batches``, each batch computing shingle hashes with the vectorized
kernel shared with MinHash (`dedup._batch_shingle_hashes`) and probing the
broadcast array with ``np.searchsorted``. No shuffle, no per-row Python in
the probe; the blocklist lives in the object store once per node
(plasma-shared, zero-copy numpy view in every task).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from sagan_ray.stages.dedup import _batch_shingle_hashes


def build_ngram_blocklist(eval_texts: list[str], n: int = 8) -> np.ndarray:
    """Sorted unique uint64 hashes of every word n-gram in the eval set."""
    sh, _starts = _batch_shingle_hashes(list(eval_texts), k=n)
    return np.unique(sh)


def contamination_counts(texts: list[str], block_sorted: np.ndarray,
                         n: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (n_ngrams, n_hits) against the sorted blocklist.

    Distinct n-grams per doc (set semantics, like the published recipe);
    probe is one ``searchsorted`` over the whole batch's grams.
    """
    sh, starts = _batch_shingle_hashes(list(texts), k=n)
    n_docs = len(texts)
    n_ngrams = np.zeros(n_docs, dtype=np.int64)
    n_hits = np.zeros(n_docs, dtype=np.int64)
    if len(sh) == 0:
        return n_ngrams, n_hits
    # dedupe grams within each doc: lexsort by (doc, hash), first-occurrence
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64),
                       np.diff(starts))
    order = np.lexsort((sh, doc_of))
    d_s, h_s = doc_of[order], sh[order]
    first = np.ones(len(h_s), dtype=bool)
    first[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
    d_u, h_u = d_s[first], h_s[first]
    from ..functions.collect import sorted_isin

    hit = sorted_isin(block_sorted, h_u)
    np.add.at(n_ngrams, d_u, 1)
    np.add.at(n_hits, d_u, hit.astype(np.int64))
    return n_ngrams, n_hits


def contamination_batch(t: pa.Table, block_sorted: np.ndarray, n: int = 8,
                        text_col: str = "text") -> pa.Table:
    """Append ``n_ngrams``/``n_contaminated`` columns (doc_id + features)."""
    texts = t[text_col].to_pylist()
    n_ngrams, n_hits = contamination_counts(texts, block_sorted, n)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_ngrams": pa.array(n_ngrams),
            "n_contaminated": pa.array(n_hits),
        }
    )


def decontaminate(ds, eval_texts: list[str], n: int = 8,
                  min_overlap_ratio: float = 0.0,
                  text_col: str = "text"):
    """Filter out documents whose eval-set n-gram overlap ratio EXCEEDS
    ``min_overlap_ratio`` (0.0 = strict: any shared n-gram drops the doc).

    Map-only: broadcast blocklist (``ray.put`` once), batch-local probe,
    in-batch filter — composes with any downstream stage without a shuffle.
    """
    import ray

    block = build_ngram_blocklist(eval_texts, n)
    ref = ray.put(block)

    def gate(t: pa.Table) -> pa.Table:
        blk = ray.get(ref)
        texts = t[text_col].to_pylist()
        n_ngrams, n_hits = contamination_counts(texts, blk, n)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(n_ngrams > 0, n_hits / n_ngrams, 0.0)
        return t.filter(pa.array(ratio <= min_overlap_ratio))

    return ds.map_batches(gate, batch_format="pyarrow")
