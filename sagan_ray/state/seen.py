"""Cross-run / cross-batch seen-set: incremental exact or Bloom dedup.

The batch dedup operators (stages/dedup.py) are one-shot: they shuffle a
whole corpus. The daemon path (``follow_directory``) instead sees files
ARRIVE over time and must drop rows whose content already streamed through
an earlier batch — a shared MUTABLE index, the one shape the Dataset API
cannot express (every map_batches fn must be stateless w.r.t. other
blocks). This module is the documented raw-actor escape hatch for it.

Design
------
``SeenShard`` actors each own one hash-range shard of the seen set:

- ``mode="exact"``: a Python set of uint64 digests. Bulk ``set.update`` /
  set lookups are C-per-element; memory = 8+overhead bytes per distinct
  digest, bounded by the shard's share of distinct content.
- ``mode="bloom"``: a numpy bit array (``m_bits`` per shard, ``k``
  multiply-shift hashes, all vectorized). Constant memory; NO false
  negatives (a true duplicate is always dropped), false-positive rate
  ~ (1-e^{-kn/m})^k — size m_bits ≈ 10 bits per expected distinct digest
  for ~1% unique rows wrongly dropped. Use when the exact set would not
  fit (10^12 distinct digests = 8+ TB exact, 1.25 TB as a 1%-FP bloom
  spread over the cluster's shards).

``check_and_add`` is atomic per shard (actor model: one message at a
time), so a digest is claimed by exactly ONE batch even when many tasks
race — the first call wins, later calls see it as dup.

Scale shape: rows never move — only (n_rows × 8B) digests travel to the
shard actors, partitioned by digest high bits so each actor sees 1/S of
the traffic. Shards are the throughput knob: S ≈ cluster cores / 4 keeps
the index off the critical path. The filter stage itself is map-only.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


class _SeenShardImpl:
    """Per-shard seen-set (plain class; wrapped by ray.remote below)."""

    def __init__(self, mode: str = "exact", m_bits: int = 1 << 20,
                 k: int = 4):
        if mode not in ("exact", "bloom"):
            raise ValueError(f"mode must be exact|bloom, got {mode!r}")
        self.mode = mode
        if mode == "exact":
            self._set: set[int] = set()
        else:
            if m_bits & (m_bits - 1):
                raise ValueError("m_bits must be a power of two")
            self.m_bits = m_bits
            self.k = k
            self._bits = np.zeros(m_bits // 8, dtype=np.uint8)
            # odd multipliers -> k independent multiply-shift hashes
            rng = np.random.RandomState(0x5EED)
            self._mul = (rng.randint(1, 2**63, size=k, dtype=np.int64)
                         .astype(np.uint64) | np.uint64(1))

    def _bloom_positions(self, h: np.ndarray) -> np.ndarray:
        # (k, n) bit positions via multiply-shift on the uint64 digests
        shift = np.uint64(64 - int(np.log2(self.m_bits)))
        return ((h[None, :] * self._mul[:, None]) >> shift).astype(np.int64)

    def check_and_add(self, h: np.ndarray) -> np.ndarray:
        """Atomically test membership and insert; True = already seen.

        Duplicates WITHIN the submitted array also mark: the first
        occurrence is new, later occurrences are dup (np.unique order).
        """
        h = np.asarray(h, dtype=np.uint64)
        if self.mode == "exact":
            seen = self._set
            # bulk C-level set ops; first occurrence in-array wins
            uniq, first_idx = np.unique(h, return_index=True)
            dup_in_set = np.fromiter(
                (int(v) in seen for v in uniq), dtype=bool, count=len(uniq)
            )
            seen.update(int(v) for v in uniq[~dup_in_set])
            new_mask = np.zeros(len(h), dtype=bool)
            new_mask[first_idx[~dup_in_set]] = True
            out = ~new_mask
            return out
        pos = self._bloom_positions(h)
        byte_, bit_ = pos >> 3, (pos & 7).astype(np.uint8)
        present = (self._bits[byte_] >> bit_) & 1  # (k, n)
        seen_all = present.all(axis=0)
        # first in-array occurrence of each digest is "new" even if its
        # bits straddle other rows in this same call
        uniq, first_idx = np.unique(h, return_index=True)
        first = np.zeros(len(h), dtype=bool)
        first[first_idx] = True
        out = seen_all | ~first
        # set bits for everything submitted
        np.bitwise_or.at(self._bits, byte_.ravel(),
                         (np.uint8(1) << bit_).ravel())
        return out

    def stats(self) -> dict:
        if self.mode == "exact":
            return {"mode": "exact", "n": len(self._set)}
        return {
            "mode": "bloom",
            "m_bits": self.m_bits,
            "k": self.k,
            "fill": float(np.unpackbits(self._bits).mean()),
        }


def start_seen_shards(n_shards: int = 8, mode: str = "exact",
                      m_bits: int = 1 << 20, k: int = 4):
    """Spawn the shard actors (idempotent per call — callers own them)."""
    import ray

    Shard = ray.remote(num_cpus=0.25)(_SeenShardImpl)
    return [Shard.remote(mode=mode, m_bits=m_bits, k=k)
            for _ in range(n_shards)]


def incremental_dedup(ds, shards, text_col: str = "text"):
    """Drop rows whose content digest was already seen by ANY earlier
    batch routed through the same ``shards`` — across Datasets, i.e.
    across daemon iterations.

    Map-only from the Dataset's view; each batch sends one digest array
    per shard (8 B/row total traffic) and filters on the returned mask.
    Determinism note: which of two simultaneous duplicate rows survives
    depends on actor message order — exactly-once is guaranteed, which
    copy wins is not (same contract as any streaming dedup).
    """
    import ray

    from sagan_ray.stages.dedup import _digest64

    n = len(shards)

    def gate(t: pa.Table) -> pa.Table:
        h = _digest64(t[text_col].to_pylist())
        shard_of = (h % np.uint64(n)).astype(np.int64)
        dup = np.zeros(len(h), dtype=bool)
        idxs = [np.flatnonzero(shard_of == s) for s in range(n)]
        refs = [shards[s].check_and_add.remote(h[ix])
                for s, ix in enumerate(idxs) if len(ix)]
        live = [ix for ix in idxs if len(ix)]
        for ix, mask in zip(live, ray.get(refs)):
            dup[ix] = mask
        return t.filter(pa.array(~dup))

    return ds.map_batches(gate, batch_format="pyarrow")
