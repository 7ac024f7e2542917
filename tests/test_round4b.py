"""Round-4b operators: compression-ratio quality signal and stratified
per-key sampling — each with an exact reference differential."""
import numpy as np
import pyarrow as pa


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
