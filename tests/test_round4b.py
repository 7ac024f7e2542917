"""Round-4b operators: compression-ratio quality signal and stratified
per-key sampling — each with an exact reference differential."""
import numpy as np
import pyarrow as pa
import pytest


def test_compression_ratio_mirrors_zlib(ray_session):
    import zlib

    import ray.data as rd

    from sagan_ray.stages.text import compression_ratio_batch

    docs = [
        " ".join(f"sentence {i} discussing distributed engines and "
                 f"varied data pipeline topics number {i * 37}"
                 for i in range(12)),
        "spam " * 200,
        "".join(chr(33 + c) for c in
                np.random.RandomState(0).randint(0, 90, 800)),  # junky
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(4), type=pa.int64()),
                  "text": docs})
    out = (rd.from_arrow(t)
           .map_batches(compression_ratio_batch, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, s in enumerate(docs):
        if not s:
            assert out["compression_ratio"].iloc[i] == 0.0
            continue
        raw = s.encode()
        exp = len(zlib.compress(raw, 6)) / len(raw)
        np.testing.assert_allclose(out["compression_ratio"].iloc[i], exp)
    # ordering sanity: repetitive < prose < high-entropy junk
    r = out["compression_ratio"]
    assert r.iloc[1] < r.iloc[0] < r.iloc[2]


def test_compression_filter_stage(ray_session):
    import ray.data as rd

    from sagan_ray.stages.text import compression_filter_stage

    import zlib

    prose = " ".join(
        f"sentence {i} discussing distributed engines and varied "
        f"data pipeline topics number {i * 37}" for i in range(12))
    docs = {
        0: prose,
        1: "spam " * 200,                                  # too repetitive
        2: "".join(chr(33 + c) for c in
                   np.random.RandomState(0).randint(0, 90, 4000)),
        3: "",
    }
    t = pa.table({"doc_id": pa.array(list(docs), type=pa.int64()),
                  "text": list(docs.values())})
    rp = len(zlib.compress(prose.encode(), 6)) / len(prose.encode())
    kept = compression_filter_stage(
        rd.from_arrow(t), min_ratio=rp - 0.01,
        max_ratio=rp + 0.01).to_pandas()
    assert kept["doc_id"].tolist() == [0]


def test_stratified_sample_matches_row_number_oracle(ray_session):
    """Exact vs DuckDB ROW_NUMBER over the same splitmix64 order (the
    documented oracle shape) — computed here with numpy/pandas since
    DuckDB lacks splitmix64; the REFERENCE is an independent pandas
    rank over the same deterministic key."""
    import pandas as pd
    import ray.data as rd

    from sagan_ray.stages.pack import _shuffle_key, stratified_sample

    rng = np.random.RandomState(3)
    n = 2000
    hosts = rng.choice([f"h{i}" for i in range(7)], size=n)
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "host": pa.array(hosts),
    })
    out = stratified_sample(rd.from_arrow(t).repartition(5), ["host"],
                            k=25, seed=9).to_pandas()
    # reference: pandas rank over the identical key
    ref = pd.DataFrame({"doc_id": np.arange(n), "host": hosts})
    ref["ord"] = _shuffle_key(ref["doc_id"].to_numpy(), 9)
    ref = ref.sort_values(["host", "ord"], kind="mergesort")
    ref_keep = ref.groupby("host", sort=False).head(25)
    assert sorted(out["doc_id"]) == sorted(ref_keep["doc_id"])
    # every stratum capped at k, small strata intact
    sizes = out.groupby("host").size()
    assert (sizes <= 25).all()
    # deterministic across runs and layouts
    out2 = stratified_sample(rd.from_arrow(t).repartition(11), ["host"],
                             k=25, seed=9).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])
    # schema preserved
    assert sorted(out.columns) == ["doc_id", "host"]


def test_hopping_window_agg_matches_pandas_mirror(ray_session):
    """Exact vs a brute-force pandas mirror (explode every row into its
    covering windows, then groupby) for all five aggs, including the
    tumbling degenerate case."""
    import pandas as pd
    import ray.data as rd

    from sagan_ray.stages.window import hopping_window_agg

    rng = np.random.RandomState(5)
    n = 3000
    base = pd.Timestamp("2026-02-01")
    df = pd.DataFrame({
        "user": rng.choice([f"u{i}" for i in range(9)], size=n),
        "ts": base + pd.to_timedelta(rng.randint(0, 7200, n), unit="s"),
        "v": rng.rand(n).round(6),
    })
    t = pa.table({
        "user": pa.array(df["user"]),
        "ts": pa.array(df["ts"]).cast(pa.timestamp("us")),
        "v": pa.array(df["v"]),
    })

    def mirror(window_s, hop_s, agg):
        n_win = window_s // hop_s
        rows = []
        epoch = df["ts"].astype("int64") // 1000  # us
        base_ws = (epoch // (hop_s * 1_000_000)) * (hop_s * 1_000_000)
        for i in range(n_win):
            sub = df.assign(ws=base_ws - i * hop_s * 1_000_000)
            rows.append(sub)
        ex = pd.concat(rows)
        g = ex.groupby(["user", "ws"])["v"]
        out = getattr(g, agg)().rename("value").reset_index()
        return out.sort_values(["user", "ws"]).reset_index(drop=True)

    for window_s, hop_s in [(600, 200), (600, 600)]:
        for agg in ["sum", "count", "mean", "max", "min"]:
            got = (hopping_window_agg(
                rd.from_arrow(t).repartition(4), ["user"], "ts",
                window_s, hop_s, "v", agg=agg).to_pandas())
            got["ws"] = (got["window_start"].astype("datetime64[ns]")
                         .astype("int64") // 1000)
            got = (got[["user", "ws", f"{agg}_value"]]
                   .rename(columns={f"{agg}_value": "value"})
                   .sort_values(["user", "ws"]).reset_index(drop=True))
            exp = mirror(window_s, hop_s, agg)
            if agg == "count":
                exp["value"] = exp["value"].astype("int64")
                got["value"] = got["value"].astype("int64")
            pd.testing.assert_frame_equal(got, exp, atol=1e-9,
                                          check_dtype=False), (window_s,
                                                               hop_s, agg)


def test_hopping_window_nulls_and_mixed_dtype_batches(ray_session):
    """Null value/ts rows are excluded without poisoning their batch's
    partials, null keys form a real stratum, and an integer key column
    whose blocks differ in null-presence still merges into ONE output
    row per (key, window) — the dtype-stable routing-hash contract."""
    import pandas as pd
    import ray.data as rd

    from sagan_ray.stages.window import hopping_window_agg

    base = pd.Timestamp("2026-03-01")
    t1 = pa.table({  # block without null keys (pandas would see int64)
        "k": pa.array([5, 5, 7], type=pa.int64()),
        "ts": pa.array([base] * 3).cast(pa.timestamp("us")),
        "v": pa.array([1.0, 2.0, 4.0]),
    })
    t2 = pa.table({  # block WITH a null key (pandas would see float64)
        "k": pa.array([5, None], type=pa.int64()),
        "ts": pa.array([base] * 2).cast(pa.timestamp("us")),
        "v": pa.array([8.0, 16.0]),
    })
    t3 = pa.table({  # null value and null ts rows: excluded, harmless
        "k": pa.array([5, 5], type=pa.int64()),
        "ts": pa.array([base, None]).cast(pa.timestamp("us")),
        "v": pa.array([None, 32.0]),
    })
    ds = rd.from_arrow([t1, t2, t3])
    out = (hopping_window_agg(ds, ["k"], "ts", 600, 600, "v", agg="sum")
           .to_pandas())
    got = {(-1 if pd.isna(r["k"]) else int(r["k"])): r["sum_value"]
           for _, r in out.iterrows()}
    assert len(out) == 3  # ONE row per key incl. the null stratum
    assert got[5] == 11.0   # 1+2+8; null-v and null-ts rows excluded
    assert got[7] == 4.0
    assert got[-1] == 16.0  # null key kept as its own stratum
    cnt = (hopping_window_agg(ds, ["k"], "ts", 600, 600, "v",
                              agg="count").to_pandas())
    cm = {(-1 if pd.isna(r["k"]) else int(r["k"])): r["count_value"]
          for _, r in cnt.iterrows()}
    assert cm[5] == 3  # null-value row NOT counted


def test_stratified_sample_keeps_null_stratum(ray_session):
    import pandas as pd
    import ray.data as rd

    from sagan_ray.stages.pack import stratified_sample

    t = pa.table({
        "doc_id": pa.array(np.arange(40, dtype=np.int64)),
        "host": pa.array((["h1"] * 20) + ([None] * 20)),
    })
    out = stratified_sample(rd.from_arrow(t), ["host"], k=5,
                            seed=3).to_pandas()
    n_null = out["host"].isna().sum()
    assert n_null == 5  # the null stratum samples like any other
    assert (out["host"] == "h1").sum() == 5


def test_unified2_all_null_columns(tmp_path):
    """Blocks where ANY optional column is all-null (Arrow type `null`)
    must pack with that field's default, not crash."""
    from sagan_ray.stages.unified2 import pack_unified2, read_unified2

    t = pa.table({
        "url": ["a", "b"],
        "sid": pa.array([1, 2], type=pa.int64()),
        "src_ip": pa.array([None, None]),       # type null
        "src_port": pa.array([None, None]),     # type null
        "priority": pa.array([None, None]),     # type null
        "classification": pa.array([None, None]),
    })
    payload, cls_map = pack_unified2(t)
    p = str(tmp_path / "u2.log")
    with open(p, "wb") as f:
        f.write(payload)
    evs = read_unified2(p)
    assert [e["signature_id"] for e in evs] == [1, 2]
    assert all(e["ip_source"] == "0.0.0.0" for e in evs)
    assert all(e["sport_itype"] == 0 for e in evs)
    assert cls_map == {}


def test_compression_filter_honors_level(ray_session):
    """The gate shares the ratio kernel and level with the signal —
    a threshold profiled at level=9 gates identically at level=9."""
    import zlib

    import ray.data as rd

    from sagan_ray.stages.text import compression_filter_stage

    prose = " ".join(f"varied sentence number {i * 13}" for i in range(30))
    raw = prose.encode()
    r9 = len(zlib.compress(raw, 9)) / len(raw)
    t = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                  "text": [prose]})
    kept = compression_filter_stage(rd.from_arrow(t), min_ratio=r9 - 1e-9,
                                    max_ratio=r9 + 1e-9,
                                    level=9).to_pandas()
    assert kept["doc_id"].tolist() == [0]


def test_stable_hash_type_coverage():
    """The routing hash must accept every key type the pandas path
    handled — bool, date32, time32, decimal, all-null — and must hash
    timestamp us/ns representations of one instant identically."""
    import pandas as pd

    from sagan_ray.stages.window import _stable_col_hash

    # bool (with null), date32, time32, decimal, all-null: no crash
    h_b = _stable_col_hash(pa.array([True, False, None]))
    assert len(h_b) == 3 and h_b[0] != h_b[1] != h_b[2]
    import datetime as dt
    h_d = _stable_col_hash(pa.array([dt.date(2026, 1, 1), None],
                                    type=pa.date32()))
    assert len(h_d) == 2
    h_t = _stable_col_hash(pa.array([dt.time(1, 2, 3)],
                                    type=pa.time32("s")))
    assert len(h_t) == 1
    from decimal import Decimal
    h_dec = _stable_col_hash(pa.array([Decimal("1.25"), None],
                                      type=pa.decimal128(10, 2)))
    assert len(h_dec) == 2
    h_n = _stable_col_hash(pa.array([None, None]))
    assert len(h_n) == 2 and h_n[0] == h_n[1]
    # unit-normalized temporal hashing: same instant, us vs ns blocks
    ts = pa.array([pd.Timestamp("2026-04-01 12:00:00")])
    np.testing.assert_array_equal(
        _stable_col_hash(ts.cast(pa.timestamp("us"))),
        _stable_col_hash(ts.cast(pa.timestamp("ns"))))
    # int null-presence stability (the original bug)
    a = _stable_col_hash(pa.array([5], type=pa.int64()))
    b = _stable_col_hash(pa.array([5, None], type=pa.int64()))
    assert a[0] == b[0]


def test_hopping_and_stratified_key_types_uniform_schema(ray_session):
    """With key_types/types passed, null-bearing int64 keys come back
    int64 in EVERY output block (no int64/double schema mixing)."""
    import pandas as pd
    import ray.data as rd

    from sagan_ray.stages.pack import stratified_sample
    from sagan_ray.stages.window import hopping_window_agg

    base = pd.Timestamp("2026-03-01")
    t = pa.table({
        "k": pa.array([1, 1, 2, None, None, 3], type=pa.int64()),
        "ts": pa.array([base] * 6).cast(pa.timestamp("us")),
        "v": pa.array([1.0] * 6),
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
    })
    ds = rd.from_arrow(t).repartition(3)
    out = hopping_window_agg(ds, ["k"], "ts", 600, 600, "v", agg="sum",
                             key_types={"k": pa.int64()}).materialize()
    assert pa.types.is_integer(out.schema().base_schema.field("k").type)
    samp = stratified_sample(
        ds.drop_columns(["ts", "v"]), ["k"], k=1,
        types={"k": pa.int64(), "doc_id": pa.int64()}).materialize()
    assert pa.types.is_integer(
        samp.schema().base_schema.field("k").type)
    assert len(samp.take_all()) == 4  # one per stratum incl. null


def test_stratified_sample_md5_order(ray_session):
    """order="md5" keeps the DuckDB-restatable rank: ROW_NUMBER() OVER
    (PARTITION BY host ORDER BY md5(CAST(id AS VARCHAR))) <= k —
    verified against DuckDB itself (the wp_sample driver-oracle shape)."""
    import duckdb
    import ray.data as rd

    from sagan_ray.stages.pack import stratified_sample

    rng = np.random.RandomState(7)
    n = 1500
    hosts = rng.choice([f"h{i}" for i in range(9)], size=n)
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "host": pa.array(hosts),
    })
    out = stratified_sample(rd.from_arrow(t).repartition(7), ["host"],
                            k=11, order="md5").to_pandas()
    ref = duckdb.connect().execute("""
        SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (
            PARTITION BY host
            ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
          FROM t) WHERE rn <= 11""").df()
    assert sorted(out["doc_id"]) == sorted(ref["doc_id"])

    with pytest.raises(ValueError):
        stratified_sample(rd.from_arrow(t), ["host"], 3, order="bogus")
