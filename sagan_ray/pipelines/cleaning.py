"""End-to-end corpus cleaning: the full training-data preparation chain.

Composes the repo's webtext operators in the order real pipelines run
them (cheapest gate first, so each stage sees fewer rows):

    URL-level dedup            (hashes of canonical URLs — no text moves)
 -> boilerplate line removal   (corpus-frequent lines stripped in place)
 -> quality gate               (Gopher bounds over integer features)
 -> repetition gate            (C4 dup-line / top-2-gram fractions)
 -> LM quality filter          (CCNet head-keep, broadcast unigram model)
 -> benchmark decontamination  (eval-set n-gram overlap, broadcast)
 -> cross-corpus dedup         (drop rows already in a released set)
 -> exact dedup                (128-bit content digest keeper filter)
 -> near-dup dedup             (MinHash-LSH clusters, keeper anti-join)
 -> semantic dedup             (optional, ``embedding_col``: SemDeDup
                                over an embedding column — catches what
                                text-level dedup cannot see)
 -> duplicate-span masking     (optional, ``span_min_docs``)
 -> per-key cap                (RefinedWeb-style domain cap, post-dedup)

Every stage is map-only except the dedups (hash-keyed shuffles of
ids/digests — text never rides an exchange; SemDeDup additionally
co-locates vectors per cluster) and the boilerplate count (one
line-hash groupby). Stages toggle independently; defaults are the
published C4/Gopher-ish settings scaled to the synthetic corpus.
"""
from __future__ import annotations

import os

from ..functions.url import canonicalize_urls
from ..stages import dedup as _dedup
from ..stages.decontam import decontaminate
from ..stages.text import (
    quality_filter_stage,
    repetition_filter_stage,
    strip_frequent_lines,
)


def _url_keeper_filter(ds, url_col: str, id_col: str):
    """Keep only the min-id row per canonical URL.

    Broadcast sizing: most URLs are unique, so the broadcast side is the
    DUPLICATED-url keeper map (url groups with n > 1) — loser-sized, not
    corpus-sized; the same asymmetry every keeper filter here exploits.
    """
    import numpy as np
    import pyarrow as pa
    import ray

    from ..functions.url import url_dedup

    dup_groups = url_dedup(ds, url_col=url_col, id_col=id_col).filter(
        expr="n > 1"
    )
    from ..functions.collect import collect_blocks, sorted_isin
    from ..stages.dedup import fast_digest128_bytes

    # loser-sized broadcast as TWO aligned sorted numpy arrays (128-bit
    # url digest -> keeper id) — zero-copy from plasma per task, probed
    # with one searchsorted per batch. A dict here would re-deserialize
    # on EVERY batch and probe per row in Python (review finding).
    url_s, keep_id = [], []
    for b in collect_blocks(dup_groups):
        url_s.extend(b["canonical_url"].to_pylist())
        keep_id.extend(b["keeper_doc_id"].to_pylist())
    dig = fast_digest128_bytes(url_s) if url_s else np.empty(0, dtype="S32")
    order = np.argsort(dig)
    ref = ray.put((dig[order],
                   np.asarray(keep_id, dtype=np.int64)[order]))

    def gate(t: pa.Table) -> pa.Table:
        keys, keepers = ray.get(ref)
        if not len(keys):
            return t  # no duplicated urls anywhere
        canon = canonicalize_urls(t[url_col])
        # null urls group under '' — grouped_min_count's contract
        q = fast_digest128_bytes(
            pa.compute.fill_null(canon, "").to_pylist())
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hit, pos = sorted_isin(keys, q, return_pos=True)
        drop = hit & (keepers[pos] != ids)
        return t.filter(pa.array(~drop))

    return ds.map_batches(gate, batch_format="pyarrow")


def _chain_units(
    pin,
    text_col: str = "text",
    id_col: str = "doc_id",
    url_col: str | None = "url",
    eval_texts: list[str] | None = None,
    min_tokens: int = 5,
    max_dup_line_frac: float = 0.5,
    max_top_2gram_frac: float = 0.5,
    boilerplate_min_count: int | None = None,
    near_dup_threshold: float | None = 0.8,
    lm_model=None,
    lm_min_logprob: float | None = None,
    ref_corpus=None,
    key_cap: int | None = None,
    key_col: str = "host",
    normalize: bool = False,
    span_min_docs: int | None = None,
    span_k: int = 10,
    embedding_col: str | None = None,
    semdedup_eps: float = 0.03,
    semdedup_clusters: int = 64,
) -> list[tuple[str, object]]:
    """The cleaning chain as named (stage, Dataset -> Dataset) units —
    the shared plan behind :func:`clean_corpus` (object-store pins
    between units) and :func:`clean_corpus_run` (parquet checkpoints +
    lineage between units). ``pin(ds)`` is the within-unit pin used
    where one unit's stream branches into several scans; the
    checkpointed runner passes identity (its unit inputs are
    re-scannable parquet)."""

    def gates(ds):
        if normalize:
            from ..stages.text import normalize_text_stage

            ds = normalize_text_stage(ds, text_col)
        if url_col is not None:
            ds = _url_keeper_filter(ds, url_col, id_col)
        if boilerplate_min_count is not None:
            ds = strip_frequent_lines(ds, text_col,
                                      min_count=boilerplate_min_count)
            ds = pin(ds)  # two stages above both scan; pin once
        if min_tokens is not None:
            ds = quality_filter_stage(ds, text_col, min_tokens=min_tokens)
        if max_dup_line_frac is not None:
            ds = repetition_filter_stage(
                ds, text_col,
                max_dup_line_frac=max_dup_line_frac,
                max_top_2gram_frac=max_top_2gram_frac,
            )
        if lm_model is not None and lm_min_logprob is not None:
            # CCNet head-keep: drop docs unlike the reference LM's
            # training corpus. Map-only (model broadcast once); runs
            # with the other cheap gates, before any dedup shuffle.
            from ..stages.lm import lm_filter_stage

            ds = lm_filter_stage(ds, lm_model, lm_min_logprob,
                                 text_col=text_col)
        if eval_texts:
            ds = decontaminate(ds, eval_texts, n=8)
        if ref_corpus is not None:
            # cross-corpus exact dedup (new crawl vs already-released
            # set): map-only broadcast probe for benchmark-sized refs,
            # digest anti-join above dedup_against's broadcast_limit.
            ds = _dedup.dedup_against(ds, ref_corpus, text_col=text_col)
        return ds

    def exact_dedup(ds):
        # keeper ids from the digest groupby, anti-join the rest; the
        # unit input is pinned/checkpointed (three branches scan it)
        exact = _dedup.exact_dedup_groups(ds, text_col, id_col)
        dup_groups = exact.filter(expr="n > 1")
        losers = _exact_losers(ds, dup_groups, text_col, id_col)
        return _anti_by_id(ds, losers, id_col)

    def near_dedup(ds):
        pairs = _dedup.minhash_lsh_pairs(ds, text_col=text_col,
                                         id_col=id_col,
                                         threshold=near_dup_threshold)
        return _dedup.dedup_keep_first(ds, pairs, id_col=id_col)

    def span_mask(ds):
        # duplicate-SPAN masking AFTER document-level dedup: run before
        # it, exact-duplicate documents fully mask EACH OTHER (every
        # gram is "duplicated") and no copy survives — masking must see
        # one keeper per content. (Found by the chain-composition test.)
        from ..stages.spans import mask_duplicate_spans

        ds = mask_duplicate_spans(ds, text_col, id_col=id_col, k=span_k,
                                  min_docs=span_min_docs)
        # chain contract: same schema as the input
        return ds.drop_columns(["n_masked_tokens"])

    def key_cap_unit(ds):
        # RefinedWeb-style per-domain cap LAST: bounds any one key's
        # share of the *deduplicated* corpus (cap-then-dedup would let
        # dedup re-skew the mix).
        from ..stages.pack import cap_per_key

        return cap_per_key(ds, key_col, key_cap, id_col=id_col)

    def sem_dedup(ds):
        # SemDeDup AFTER the textual dedups: exact/near dedup already
        # removed literal copies cheaply (hash shuffles); the embedding
        # pass then only pays its vector exchange for what text-level
        # dedup cannot see (translations, templated rewrites).
        # Requires ``embedding_col`` to ride the input schema.
        return _dedup.semdedup(ds, vec_col=embedding_col, id_col=id_col,
                               eps=semdedup_eps,
                               n_clusters=semdedup_clusters)

    units: list[tuple[str, object]] = [
        ("gates", gates), ("exact_dedup", exact_dedup)]
    if near_dup_threshold is not None:
        units.append(("near_dedup", near_dedup))
    if embedding_col is not None:
        units.append(("sem_dedup", sem_dedup))
    if span_min_docs is not None:
        units.append(("span_mask", span_mask))
    if key_cap is not None:
        units.append(("key_cap", key_cap_unit))
    return units


def clean_corpus(ds, **kwargs):
    """Run the full cleaning chain in one streaming session; any stage
    disables with ``None`` (see :func:`_chain_units` for the knobs).

    Returns the cleaned Dataset (same schema as the input).
    ``normalize`` prepends unicode NFC + control-strip (off by default —
    it REWRITES text, changing downstream hashes). ``span_min_docs``
    enables duplicate-SPAN masking AFTER the document-level dedups.

    Intermediate unit outputs pin to the object store (spill-backed) —
    a driver crash replays the whole chain. For long corpus runs use
    :func:`clean_corpus_run`, which checkpoints each unit to parquet
    with a lineage record and resumes from the last completed unit.
    """
    units = _chain_units(pin=lambda d: d.materialize(), **kwargs)
    for i, (_name, fn) in enumerate(units):
        ds = fn(ds)
        if i < len(units) - 1:
            # the dedups/cap branch the stream into several scans; pin
            # each unit boundary so branches never replay earlier units
            ds = ds.materialize()
    return ds


def _params_fingerprint(kwargs: dict) -> dict:
    """Replay-stable fingerprint of the chain parameters: scalars
    verbatim, text lists content-hashed, datasets/models by type name
    only (documented limit — swapping ref_corpus contents between
    resumes is NOT detected)."""
    import hashlib

    def enc(v):
        if v is None or isinstance(v, (bool, int, float, str)):
            return v
        if isinstance(v, (list, tuple)) and all(
                isinstance(x, str) for x in v):
            h = hashlib.sha1()
            for x in v:
                h.update(x.encode())
                h.update(b"\x00")
            return f"strlist:{len(v)}:{h.hexdigest()[:12]}"
        return f"type:{type(v).__name__}"

    return {k: enc(v) for k, v in sorted(kwargs.items())}


def clean_corpus_run(input_files, run_dir: str, *,
                     fail_after_stages: int | None = None, **kwargs):
    """Checkpointed :func:`clean_corpus`: each chain unit writes its
    surviving rows to ``run_dir/stages/stage=<name>/`` as parquet and
    records a lineage entry (the :mod:`..state.lineage` machinery the
    flagship's ``run_flagship`` uses); a re-run skips completed units
    and resumes from the last checkpoint — a crash 6 stages into a
    100-TB cleaning run replays ONE stage, not the chain.

    ``input_files`` is a list of parquet paths (or a Dataset for
    in-session use). The chain parameters AND the input file set are
    fingerprinted into ``_lineage/plan.json``; resuming with different
    parameters or different inputs raises (either would silently
    produce a mixed/stale-generation corpus from reused checkpoints).
    Dataset inputs fingerprint by type name only — path lists get the
    full content hash.
    ``fail_after_stages`` is test-only fault injection: raise after
    checkpointing that many units this session (the resume test kills
    at ~50%). Returns the cleaned Dataset (backed by the final
    checkpoint — re-scannable, deterministic lineage).
    """
    import json
    import shutil

    import pyarrow.parquet as pq

    from ..sources import read_parquet_clean
    from ..state import lineage

    units = _chain_units(pin=lambda d: d, **kwargs)
    os.makedirs(lineage.lineage_dir(run_dir), exist_ok=True)
    # the INPUT SET is part of the plan (ADVICE r4): resuming into a
    # run_dir with different input files would silently reuse stage
    # checkpoints computed from the OLD corpus — exactly the
    # mixed-generation hazard the fingerprint exists to prevent. Paths
    # ride the strlist content-hash; a Dataset input falls back to its
    # type name (documented limit, same as ref_corpus contents).
    inp_fp = _params_fingerprint({"input_files": (
        [input_files] if isinstance(input_files, str)
        else list(input_files)
        if isinstance(input_files, (list, tuple)) else input_files)})
    plan = {"stages": [n for n, _ in units],
            "params": _params_fingerprint(kwargs),
            "inputs": inp_fp["input_files"]}
    plan_path = os.path.join(lineage.lineage_dir(run_dir), "plan.json")
    if os.path.exists(plan_path):
        with open(plan_path) as f:
            prev = json.load(f)
        migrate = "inputs" not in prev
        if migrate:
            # migration: run_dirs checkpointed before the inputs key
            # existed must stay resumable with identical params — treat
            # the missing key as matching (it can't be reconstructed).
            # COMPARE first, write after: backfilling before validation
            # would stamp a REJECTED attempt's inputs into the legacy
            # plan and lock out the legitimately identical resume.
            prev = dict(prev, inputs=plan["inputs"])
        if prev == plan and migrate:
            tmp = plan_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(prev, f, indent=2, sort_keys=True)
            os.replace(tmp, plan_path)
        if prev != plan:
            raise ValueError(
                f"run_dir {run_dir!r} holds checkpoints for a DIFFERENT "
                "cleaning plan — resuming would mix generations; use a "
                f"fresh run_dir (recorded: {prev}, requested: {plan})")
    else:
        tmp = plan_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(plan, f, indent=2, sort_keys=True)
        os.replace(tmp, plan_path)

    def stage_dir(name: str) -> str:
        return os.path.join(run_dir, "stages", f"stage={name}")

    done = lineage.completed_partitions(run_dir)
    start = 0
    for name, _fn in units:
        if f"stage:{name}" in done:
            start += 1
        else:
            break
    if start == 0:
        ds = (read_parquet_clean(input_files)
              if isinstance(input_files, (list, tuple, str))
              else input_files)
    else:
        ds = read_parquet_clean(stage_dir(units[start - 1][0]))
    for i in range(start, len(units)):
        name, fn = units[i]
        sd = stage_dir(name)
        if os.path.isdir(sd):
            shutil.rmtree(sd)  # half-written checkpoint: replay cleanly
        out = fn(ds)
        os.makedirs(sd, exist_ok=True)
        out.write_parquet(sd)
        rows = sum(
            pq.read_metadata(os.path.join(sd, f)).num_rows
            for f in os.listdir(sd) if f.endswith(".parquet"))
        lineage.record_partition(run_dir, {
            "partition_id": f"stage:{name}", "stage": name,
            "rows": int(rows), "status": "done"})
        if (fail_after_stages is not None
                and (i - start + 1) >= fail_after_stages
                and i < len(units) - 1):
            raise RuntimeError(
                f"fault injection: stopped after {fail_after_stages} "
                "stage(s)")
        ds = read_parquet_clean(sd)
    return ds


def _exact_losers(ds, dup_groups, text_col: str, id_col: str):
    """Ids to drop: every member of a >1 digest group except its keeper.

    Broadcast form: two aligned sorted arrays (S32 digest -> keeper id),
    zero-copy per task, one searchsorted probe per batch — not a
    python dict probed per row (review finding)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..functions.collect import collect_blocks, sorted_isin
    from ..stages.dedup import fast_digest128_bytes

    rows = dup_groups.select_columns(["text_digest", "keeper_doc_id"])
    dig, keep_id = [], []
    for b in collect_blocks(rows):
        dig.extend(b["text_digest"].to_pylist())
        keep_id.extend(b["keeper_doc_id"].to_pylist())
    keys = (np.asarray(dig, dtype="S32") if dig
            else np.empty(0, dtype="S32"))
    order = np.argsort(keys)
    ref = ray.put((keys[order],
                   np.asarray(keep_id, dtype=np.int64)[order]))

    def find(t: pa.Table) -> pa.Table:
        keys_s, keepers = ray.get(ref)
        if not len(keys_s):
            return pa.table({id_col: pa.array([], type=pa.int64())})
        q = fast_digest128_bytes(t[text_col].to_pylist())
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hit, pos = sorted_isin(keys_s, q, return_pos=True)
        lose = hit & (keepers[pos] != ids)
        return pa.table({id_col: pa.array(ids[lose])})

    return ds.map_batches(find, batch_format="pyarrow")


def _anti_by_id(ds, losers, id_col: str):
    import numpy as np
    import pyarrow as pa
    import ray

    from ..functions.collect import collect_column_numpy

    ref = ray.put(np.sort(collect_column_numpy(losers, id_col,
                                               dtype=np.int64)))

    def gate(t: pa.Table) -> pa.Table:
        from ..functions.collect import sorted_isin

        blk = ray.get(ref)
        vals = t[id_col].to_numpy(zero_copy_only=False)
        if not len(blk):
            return t
        return t.filter(pa.array(~sorted_isin(blk, vals)))

    return ds.map_batches(gate, batch_format="pyarrow")
