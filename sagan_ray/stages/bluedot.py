"""Bluedot-shaped threat-intel lookup actor (reference
``src/processors/bluedot.c``): remote reputation lookups with a
TTL+LRU cache and per-batch request deduplication.

The real service is an external REST API (out of scope in this
environment — no network), so the RESOLVER is injectable: production
would pass an HTTP client callable; the default is a deterministic fake
(md5-derived category) so the Ray-side plumbing — actor cache,
distinct-key batching, TTL expiry, cache-hit accounting — is real and
tested either way. This is the async-lookup-with-cache shape the
reference uses for every remote intel source.
"""

from __future__ import annotations

import hashlib
import time
from collections import OrderedDict

import numpy as np
import pyarrow as pa

CATEGORIES = ("clean", "suspicious", "malicious")


def fake_resolver(keys: list[str]) -> dict[str, str]:
    """Deterministic stand-in for the REST call: md5-bucketed category."""
    out = {}
    for k in keys:
        h = hashlib.md5(k.encode()).digest()[0]
        out[k] = CATEGORIES[h % len(CATEGORIES)]
    return out


class BluedotLookup:
    """Actor: reputation lookups with TTL + LRU cache.

    ``resolver`` is called ONCE per batch with the DISTINCT uncached
    keys (the reference batches its REST calls the same way)."""

    def __init__(self, resolver=None, ttl_s: float = 3600.0,
                 max_entries: int = 1_000_000, key_col: str = "host",
                 clock=None):
        self.resolver = resolver or fake_resolver
        self.ttl_s = ttl_s
        self.max_entries = max_entries
        self.key_col = key_col
        self.clock = clock or time.monotonic
        self.cache: OrderedDict[str, tuple[float, str]] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def _get_cached(self, key: str, now: float) -> str | None:
        ent = self.cache.get(key)
        if ent is None:
            return None
        ts, val = ent
        if now - ts > self.ttl_s:
            del self.cache[key]
            return None
        self.cache.move_to_end(key)
        return val

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        now = self.clock()
        keys = np.asarray(batch[self.key_col].to_pandas(), dtype=object)
        # factorize, not np.unique: unique sorts with '<' and raises
        # TypeError on null keys
        inv, uk = pd.factorize(keys, use_na_sentinel=False)
        uk = np.asarray(uk, dtype=object)
        vals: dict[str, str] = {}
        need: list[str] = []
        for k in uk:
            v = self._get_cached(k, now)
            if v is None:
                need.append(k)
            else:
                vals[k] = v
                self.hits += 1
        if need:
            resolved = self.resolver(need)
            self.misses += len(need)
            for k in need:
                v = resolved.get(k, "unknown")
                vals[k] = v
                self.cache[k] = (now, v)
                if len(self.cache) > self.max_entries:
                    self.cache.popitem(last=False)  # LRU evict
        mapped = np.array([vals[k] for k in uk], dtype=object)
        return batch.append_column(
            "reputation", pa.array(mapped[inv].tolist(), type=pa.string())
        )


def bluedot_stage(ds, resolver=None, ttl_s: float = 3600.0,
                  key_col: str = "host", concurrency: int = 2):
    return ds.map_batches(
        BluedotLookup,
        fn_constructor_kwargs={
            "resolver": resolver, "ttl_s": ttl_s, "key_col": key_col
        },
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        num_cpus=1,
    )
