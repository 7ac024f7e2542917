"""Deterministic synthetic webpages generator (seeded, parallel).

Used for the golden end-to-end test and the benchmark table — the
driver's ``documents`` table is too small for throughput work. Every row
is a pure function of ``(seed, row_index)``, so generation parallelizes
with ``ray.data.range(n).map_batches`` and any subset of rows is
reproducible independent of partitioning (a requirement for the
resume-idempotence test: replayed partitions must be byte-identical).

Planted signal (all rates exact, per FIXTURES.md §1) — each token drives
one rule family of tests/fixtures/rules/web.rules at a controlled rate,
and the base vocabulary deliberately avoids every rule pattern, so the
total alert rate is ~15-20 % (log-pipeline-realistic) instead of the
~80 % a shared vocabulary would produce:
* ``spark`` 4 % (content), ``merge`` 4 % / ``stream`` 1 % (nocase+neg),
  ``slow scan`` 1 % (pcre), ``customer`` 3.3 % (meta_content),
  ``batch`` 5 % (program-gated — only h00* hosts alert),
  ``query`` 5 % (lang-gated), ``hash`` 4 % (threshold limit — with the
  Zipf-hot hosts this is the skew stressor), ``join`` 4 % (after),
  ``sort`` 3.3 % (alert_time), ``order``/``group`` 2.5 % each (xbits
  set→isset chains), ``key``+``value`` 2.9 % (position chain),
  ``needle-alpha`` 2 % (intel hit), ``ERR-nnnn`` 0.5 % (extraction).
* hosts drawn Zipf-ish from 200 domains: a few hosts are HOT
  (exercises salted-key skew mitigation in the threshold groupby).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEED = 42
N_HOSTS = 200
_LANGS = np.array(["en", "de", "fr", "es", "zh"])
_LANG_CUM = np.cumsum(np.array([0.5, 0.15, 0.12, 0.13, 0.10]))
_VOCAB = np.array(
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber birch cedar dune ember".split()
)
_EPOCH_2024_US = 1_704_067_200 * 1_000_000


def _host_pool() -> np.ndarray:
    return np.array([f"h{i:03d}.example.org" for i in range(N_HOSTS)])


_HOSTS = _host_pool()
# Zipf(s~1.2) over 200 hosts, precomputed cumulative mass.
_ZIPF_W = 1.0 / np.arange(1, N_HOSTS + 1) ** 1.2
_ZIPF_CUM = np.cumsum(_ZIPF_W / _ZIPF_W.sum())


def make_batch(indices: np.ndarray, seed: int = SEED) -> pa.Table:
    """Generate webpages rows for the given global row indices."""
    i = np.asarray(indices, dtype=np.int64)
    n = len(i)
    # Per-row deterministic streams: Philox keyed on (seed, index) would be
    # ideal; hashing the index through SplitMix64 is equivalent and fast.
    z = (i + np.int64(seed) * np.int64(0x9E3779B9)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    u1 = (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    z2 = z * np.uint64(0xD1342543DE82EF95) + np.uint64(1)
    z2 = z2 ^ (z2 >> np.uint64(29))
    u2 = (z2 >> np.uint64(11)).astype(np.float64) / float(1 << 53)

    host_idx = np.searchsorted(_ZIPF_CUM, u1, side="right").clip(0, N_HOSTS - 1)
    hosts = _HOSTS[host_idx]
    langs = _LANGS[np.searchsorted(_LANG_CUM, u2, side="right").clip(0, len(_LANGS) - 1)]

    # 12 vocabulary words per row, deterministic from the row hash.
    word_idx = np.empty((n, 12), dtype=np.int64)
    w = z2.copy()
    for c in range(12):
        w = w * np.uint64(6364136223846793005) + np.uint64(1442695040888963407)
        word_idx[:, c] = (w >> np.uint64(33)).astype(np.int64) % len(_VOCAB)
    words = _VOCAB[word_idx]

    texts = [" ".join(row) for row in words]
    # Plant the signal tokens at exact deterministic rates (one per rule
    # family — see module docstring).
    _PLANT = (
        (25, 1, "spark"),
        (25, 2, "merge"),
        (100, 2, "stream"),  # 1/4 of merges also carry the negator
        (100, 3, "slow scan"),
        (30, 4, "customer"),
        (20, 5, "batch"),
        (20, 6, "query"),
        (25, 7, "hash"),
        (25, 8, "join"),
        (30, 9, "sort"),
        # xbits chain: set at i%40==3, isset at i%40==7 — 4 rows x 913 s
        # = 3652 s gap, inside the 7200 s expire window; fires when both
        # rows drew the same Zipf host (~9 % of cycles)
        (40, 3, "order"),
        (40, 7, "group"),
        (35, 11, "key zz value"),
        (50, 0, "needle-alpha"),
    )
    for k in range(n):
        ii = int(i[k])
        extra = [tok for mod, rem, tok in _PLANT if ii % mod == rem]
        if ii % 200 == 7:
            extra.append(f"ERR-{ii % 10000:04d}")
        if extra:
            texts[k] = texts[k] + " " + " ".join(extra)

    urls = np.char.add(
        np.char.add("https://", hosts.astype(str)),
        np.char.add("/p/", i.astype(str)),
    )
    ts = pa.array(_EPOCH_2024_US + i * 913_000_000, type=pa.timestamp("us"))
    text_arr = pa.array(texts, type=pa.string())
    html = pa.array(
        [f"<html><body>{t}</body></html>".encode() for t in texts], type=pa.binary()
    )
    return pa.table(
        {
            "url": pa.array(urls.tolist(), type=pa.string()),
            "warc_ts": ts,
            "html": html,
            "text": text_arr,
            "lang": pa.array(langs.tolist(), type=pa.string()),
            "host": pa.array(hosts.tolist(), type=pa.string()),
            "doc_id": pa.array(i, type=pa.int64()),
        }
    )


def generate_webpages(n_rows: int, seed: int = SEED, include_html: bool = True):
    """Parallel seeded generation as a Ray Dataset."""
    import ray.data as rd

    ds = rd.range(n_rows)

    def gen(batch: pa.Table) -> pa.Table:
        t = make_batch(np.asarray(batch["id"]), seed=seed)
        return t if include_html else t.drop_columns(["html"])

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=32768)


def write_bench_table(path: str, n_rows: int, seed: int = SEED) -> None:
    """Materialize a bench input table to partitioned parquet (once)."""
    generate_webpages(n_rows, seed=seed).write_parquet(path)
