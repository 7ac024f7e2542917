"""Correlation: threshold / after gates and xbits cross-event flags.

Reference semantics (upstream: threshold/after checks inside
``src/processors/engine.c`` with mmap state via ``src/ipc.c``; xbits in
``src/xbit-mmap.c``): per-(rule, track-key) sliding windows anchored at
first-seen wall-clock time, mutated under a mutex.

Our re-expression is DETERMINISTIC EVENT-TIME tumbling windows over
``warc_ts`` (documented delta — SURVEY.md §2.5): for window length S,
``bucket = floor(epoch_seconds(ts) / S)`` and within each
``(sid, track_key, bucket)`` group rows are ordered by
``(warc_ts, url)`` (url is unique → total order → replay-stable):

* ``threshold: type limit, count C``   → keep row_number <= C
* ``threshold: type suppress, count C``→ keep the group only if its size <= C
* ``after: count C``                   → keep row_number > C

All three are exactly expressible as DuckDB window functions — that IS
the parity oracle.

Scale notes: the groupby is the pipeline's one hash shuffle; only alert
columns reach it (html/text-heavy inputs are projected away upstream).
Hot-host skew: a batch-local pre-prune keeps at most C rows per
(sid,key,bucket) per batch for `limit` rules before the shuffle, so a
host with 10^7 hits in a bucket ships ~C×num_batches rows, not 10^7.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..rules import Rule

_BUCKET_NONE = np.int64(-1)


def _track_col(track: str) -> str:
    return "lang" if track in ("by_lang", "by_facility") else "host"


def corr_specs(rules: list[Rule]) -> dict[int, dict]:
    """sid -> correlation spec (kind, type, count, seconds, track col)."""
    specs: dict[int, dict] = {}
    for r in rules:
        if r.threshold is not None:
            specs[r.sid] = {
                "kind": "threshold",
                "ttype": r.threshold.ttype,
                "count": r.threshold.count,
                "seconds": r.threshold.seconds,
                "track": _track_col(r.threshold.track),
            }
        elif r.after is not None:
            specs[r.sid] = {
                "kind": "after",
                "count": r.after.count,
                "seconds": r.after.seconds,
                "track": _track_col(r.after.track),
            }
    return specs


def _attach_keys(batch: pa.Table, specs: dict[int, dict]) -> pa.Table:
    """Add ckey (track value) and bucket columns per row, by sid."""
    sid = np.asarray(batch["sid"].combine_chunks(), dtype=np.int64)
    host = batch["host"].to_pylist()
    lang = batch["lang"].to_pylist()
    ts_us = np.asarray(
        pc.cast(
            pc.cast(batch["warc_ts"], pa.timestamp("us")), pa.int64()
        ).combine_chunks(),
        dtype=np.int64,
    )
    n = batch.num_rows
    ckey = [""] * n
    bucket = np.full(n, _BUCKET_NONE, dtype=np.int64)
    for i in range(n):
        spec = specs.get(int(sid[i]))
        if spec is None:
            continue
        ckey[i] = host[i] if spec["track"] == "host" else lang[i]
        bucket[i] = (ts_us[i] // 1_000_000) // spec["seconds"]
    return batch.append_column("ckey", pa.array(ckey, type=pa.string())).append_column(
        "bucket", pa.array(bucket)
    )


def _preprune_limit(batch: pd.DataFrame, specs: dict[int, dict]) -> pd.DataFrame:
    """Batch-local skew guard: for `limit` rules keep only the C earliest
    rows per (sid, ckey, bucket) within this batch — a superset of the
    final winners (monotone prefix property of row_number<=C)."""
    limit_sids = {s for s, sp in specs.items()
                  if sp["kind"] == "threshold" and sp["ttype"] == "limit"}
    if not limit_sids or batch.empty:
        return batch
    mask = batch["sid"].isin(limit_sids)
    if not mask.any():
        return batch
    sub = batch[mask].sort_values(["warc_ts", "url"], kind="mergesort")
    counts = {s: sp["count"] for s, sp in specs.items() if s in limit_sids}
    rn = sub.groupby(["sid", "ckey", "bucket"], sort=False).cumcount()
    keep_sub = sub[rn < sub["sid"].map(counts)]
    return pd.concat([batch[~mask], keep_sub], ignore_index=True)


def _gate_group(g: pd.DataFrame, specs: dict[int, dict]) -> pd.DataFrame:
    sid = int(g["sid"].iloc[0])
    spec = specs[sid]
    g = g.sort_values(["warc_ts", "url"], kind="mergesort")
    n = len(g)
    if spec["kind"] == "threshold":
        if spec["ttype"] == "suppress":
            return g if n <= spec["count"] else g.iloc[0:0]
        return g.iloc[: spec["count"]]  # limit
    # after
    return g.iloc[spec["count"]:]


def apply_correlation(alerts_ds, rules: list[Rule]):
    """alerts Dataset -> gated alerts Dataset.

    Uncorrelated rules bypass the shuffle entirely (their rows union back
    in unshuffled); correlated rows take the one hash exchange.
    """
    specs = corr_specs(rules)
    if not specs:
        return alerts_ds
    corr_sids = pa.array(list(specs.keys()), type=pa.int64())
    out_cols = None  # closure-filled; keeps schema stable

    def split_plain(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(pc.is_in(batch["sid"], value_set=corr_sids).combine_chunks())
        )

    def split_corr(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.is_in(batch["sid"], value_set=corr_sids))
        sub = _attach_keys(sub, specs)
        pdf = sub.to_pandas()
        pdf = _preprune_limit(pdf, specs)
        return pa.Table.from_pandas(pdf, preserve_index=False, schema=sub.schema)

    plain = alerts_ds.map_batches(split_plain, batch_format="pyarrow")
    corr = alerts_ds.map_batches(split_corr, batch_format="pyarrow")

    def gate(g: pd.DataFrame) -> pd.DataFrame:
        return _gate_group(g, specs)

    gated = (
        corr.groupby(["sid", "ckey", "bucket"])
        .map_groups(gate, batch_format="pandas")
        .drop_columns(["ckey", "bucket"])
    )
    return plain.union(gated)


# ---------------------------------------------------------------------------
# xbits — cross-event flags as a co-partitioned temporal join
# ---------------------------------------------------------------------------


def xbit_specs(rules: list[Rule]) -> dict[int, list]:
    return {r.sid: list(r.xbits) for r in rules if r.xbits}


def apply_xbits(alerts_ds, rules: list[Rule]):
    """Two-pass xbits: rules that `set`/`unset` a bit contribute state
    events; rules that test `isset`/`isnotset` keep rows only when the
    bit is active at their event time (set_ts <= ts < set_ts+expire,
    unset clears). Evaluated per (bit name, track key) group in event-time
    order — the co-partitioned map_groups version of the reference's
    mmap hash slots with TTL (src/xbit-mmap.c).

    `noalert` set-rules contribute state but route nothing.
    """
    specs = xbit_specs(rules)
    if not specs:
        return alerts_ds
    by_sid = {r.sid: r for r in rules}
    xb_sids = pa.array(list(specs.keys()), type=pa.int64())

    def split_plain(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(pc.is_in(batch["sid"], value_set=xb_sids).combine_chunks())
        )

    def explode_xbit(batch: pa.Table) -> pa.Table:
        """One row per (alert row, xbit option on its rule)."""
        sub = batch.filter(pc.is_in(batch["sid"], value_set=xb_sids))
        if sub.num_rows == 0:
            return sub.append_column("xname", pa.array([], type=pa.string())) \
                      .append_column("xaction", pa.array([], type=pa.string())) \
                      .append_column("xkey", pa.array([], type=pa.string())) \
                      .append_column("xexpire", pa.array([], type=pa.int64()))
        pdf = sub.to_pandas()
        rows = []
        for _, row in pdf.iterrows():
            for xb in specs[int(row["sid"])]:
                r2 = row.copy()
                r2["xname"] = xb.name
                r2["xaction"] = xb.action
                r2["xkey"] = row["lang"] if _track_col(xb.track) == "lang" else row["host"]
                r2["xexpire"] = np.int64(xb.expire if xb.expire is not None else -1)
                rows.append(r2)
        out = pd.DataFrame(rows).reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # order: event time, then actions — set/unset before tests at same ts
        order = {"set": 0, "unset": 1, "isset": 2, "isnotset": 3}
        g = g.assign(_ord=g["xaction"].map(order)).sort_values(
            ["warc_ts", "_ord", "url"], kind="mergesort"
        )
        active_until = None  # epoch us or +inf while set
        keep_idx = []
        for idx, row in g.iterrows():
            ts = row["warc_ts"].value // 1000 if hasattr(row["warc_ts"], "value") else int(row["warc_ts"])
            act = row["xaction"]
            if act == "set":
                exp = int(row["xexpire"])
                active_until = (ts + exp * 1_000_000) if exp >= 0 else float("inf")
            elif act == "unset":
                active_until = None
            elif act == "isset":
                if active_until is not None and ts < active_until:
                    keep_idx.append(idx)
            elif act == "isnotset":
                if active_until is None or ts >= active_until:
                    keep_idx.append(idx)
        kept = g.loc[keep_idx]
        return kept.drop(columns=["_ord"])

    plain = alerts_ds.map_batches(split_plain, batch_format="pyarrow")
    xb = alerts_ds.map_batches(explode_xbit, batch_format="pyarrow")
    resolved = (
        xb.groupby(["xname", "xkey"])
        .map_groups(resolve, batch_format="pandas")
        .drop_columns(["xname", "xaction", "xkey", "xexpire"])
    )

    # set/unset rules re-enter routing unless noalert; tested rows already kept
    def route_filter(batch: pa.Table) -> pa.Table:
        sids = np.asarray(batch["sid"].combine_chunks(), dtype=np.int64)
        keep = np.ones(len(sids), dtype=bool)
        for i, s in enumerate(sids):
            r = by_sid.get(int(s))
            if r is None:
                continue
            acts = {x.action for x in r.xbits}
            if r.noalert and acts & {"set", "unset"} and not acts & {"isset", "isnotset"}:
                keep[i] = False
        return batch.filter(pa.array(keep))

    # For rules whose ONLY xbit options are set/unset, the exploded+resolved
    # dataset dropped their rows (resolve keeps only tested rows) — re-add
    # them from the original stream (minus noalert).
    def setters(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.is_in(batch["sid"], value_set=xb_sids))
        if sub.num_rows == 0:
            return sub
        return route_filter(sub)

    def only_set_rows(batch: pa.Table) -> pa.Table:
        sub = setters(batch)
        if sub.num_rows == 0:
            return sub
        sids = np.asarray(sub["sid"].combine_chunks(), dtype=np.int64)
        keep = np.array(
            [not ({x.action for x in by_sid[int(s)].xbits} & {"isset", "isnotset"})
             for s in sids],
            dtype=bool,
        )
        return sub.filter(pa.array(keep))

    set_rows = alerts_ds.map_batches(only_set_rows, batch_format="pyarrow")
    return plain.union(resolved).union(set_rows)
