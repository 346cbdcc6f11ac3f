"""Training-data ops over the driver-generated testdata tables."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embs(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup_matches_duckdb(docs):
    import duckdb

    from wned_ray.pipelines.datawork import exact_dedup

    got = exact_dedup(docs, id_col="doc_id").to_pandas()
    want = duckdb.sql(
        f"SELECT count(*) AS n, count(DISTINCT text) AS d FROM "
        f"read_parquet('{SF}/documents.parquet')").fetchone()
    assert len(got) == want[1]                    # one row per distinct text
    assert got["n_dups"].sum() == want[0]


def test_minhash_near_dup_finds_duplicate_texts(docs):
    import duckdb

    from wned_ray.pipelines.datawork import minhash_candidates, verify_jaccard

    cands = minhash_candidates(docs, id_col="doc_id", num_partitions=4)
    verified = verify_jaccard(cands, docs, id_col="doc_id", threshold=0.9,
                              num_partitions=4).to_pandas()
    # exact duplicate texts must be found with jaccard 1.0
    dups = duckdb.sql(
        f"SELECT min(doc_id) a, max(doc_id) b FROM read_parquet('{SF}/documents.parquet') "
        f"GROUP BY text HAVING count(*)>1").df()
    found = set(zip(verified["id_a"], verified["id_b"]))
    exact_pairs = set(zip(dups["a"], dups["b"]))
    if exact_pairs:
        assert exact_pairs <= found
    assert (verified["jaccard"] >= 0.9).all()


def test_simhash_deterministic(docs):
    from wned_ray.pipelines.datawork import simhash

    a = simhash(docs, id_col="doc_id").to_pandas().sort_values("doc_id")
    b = simhash(docs, id_col="doc_id").to_pandas().sort_values("doc_id")
    assert (a["simhash"].to_numpy() == b["simhash"].to_numpy()).all()
    assert a["simhash"].nunique() > 1


def test_knn_search_matches_bruteforce(embs):
    from wned_ray.pipelines.datawork import knn_search

    df = embs.to_pandas()
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    q_ids = df["vec_id"].to_numpy()[:3]
    qm = m[:3]
    got = knn_search(embs, q_ids, qm, k=5).to_pandas()
    sims = mn @ (qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)).T
    for j, qid in enumerate(q_ids):
        want = set(df["vec_id"].to_numpy()[np.argsort(-sims[:, j])[:5]])
        have = set(got.loc[got["query_id"] == qid, "vec_id"])
        assert len(want & have) >= 4, (qid, want, have)  # ties may swap 1


def test_embedding_near_dup_self_pairs_excluded(embs):
    from wned_ray.pipelines.datawork import embedding_near_dup

    ds = embedding_near_dup(embs, threshold=0.99)
    assert [f.name for f in ds.schema().base_schema] == ["id_a", "id_b", "cos"]
    out = ds.to_pandas()
    # ray's to_pandas drops columns for an all-empty dataset; guard len first
    if len(out):
        assert (out["id_a"] < out["id_b"]).all()
    # sanity at a loose threshold: pairs exist and are canonical
    loose = embedding_near_dup(embs, threshold=0.0).to_pandas()
    assert len(loose) > 0 and (loose["id_a"] < loose["id_b"]).all()


def test_lang_id_and_quality_and_tokens(docs):
    from wned_ray.pipelines.datawork import lang_id, quality_scores, token_count

    lid = lang_id(docs).limit(20).to_pandas()
    assert set(lid["lang_pred"]) <= {"en", "de", "fr", "unknown"}
    q = quality_scores(docs).limit(20).to_pandas()
    assert (q["n_chars"] > 0).all()
    assert ((q["punct_ratio"] >= 0) & (q["punct_ratio"] <= 1)).all()
    t = token_count(docs).limit(20).to_pandas()
    assert (t["n_tokens"] > 0).all()


def test_fingerprint_deterministic(docs):
    from wned_ray.pipelines.datawork import fingerprint

    a = fingerprint(docs, id_col="doc_id").to_pandas().sort_values("doc_id")
    b = fingerprint(docs, id_col="doc_id").to_pandas().sort_values("doc_id")
    assert (a["fingerprint"].to_numpy() == b["fingerprint"].to_numpy()).all()


def test_multimodal_stub_plumbing(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.datawork import MultimodalDecodeStub, decode_media

    items = [{"media_id": i, "payload": bytes([i] * 16), "kind": "image"}
             for i in range(10)]
    ds = rd.from_items(items)
    out = decode_media(ds, feature_dim=4).to_pandas()
    assert len(out) == 10
    assert all(len(f) == 4 for f in out["features"])
    # deterministic per payload
    out2 = decode_media(ds, feature_dim=4).to_pandas()
    assert out.sort_values("media_id")["features"].tolist() == \
        out2.sort_values("media_id")["features"].tolist()
    # codec-library formats remain explicitly stubbed
    stub = MultimodalDecodeStub(fake=False)
    with pytest.raises(NotImplementedError):
        stub.decode_payload(b"\x89PNG")


def test_multimodal_real_wav_and_ppm_decode(ray_session):
    """The REAL decode paths (round-2 VERDICT task 7): stdlib WAV and
    binary PPM payloads produce verifiable physical features, and run
    end-to-end through the actor-pool stage with fake=False."""
    import io
    import wave

    import ray.data as rd

    from wned_ray.pipelines.datawork import MultimodalDecodeStub, decode_media

    # 1 second of a 440 Hz sine at 8 kHz mono, int16 full scale * 0.5
    sr, amp = 8000, 0.5
    t = np.arange(sr) / sr
    pcm = (np.sin(2 * np.pi * 440 * t) * amp * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    wav_payload = buf.getvalue()

    stub = MultimodalDecodeStub(feature_dim=8, fake=False)
    f = stub.decode_payload(wav_payload)
    assert abs(f[0] - 1.0) < 1e-3               # duration 1 s
    assert abs(f[3] - amp / np.sqrt(2)) < 0.01  # sine RMS = A/sqrt(2)
    assert abs(f[4] - amp) < 0.01               # peak = A
    assert 0.05 < f[5] < 0.2                    # zcr ~ 2*440/8000 = 0.11

    # 2x2 pure-red PPM (P6), maxval 255
    ppm_payload = b"P6\n2 2\n255\n" + bytes([255, 0, 0] * 4)
    g = stub.decode_payload(ppm_payload)
    assert g[2] == 3.0                          # channels
    assert abs(g[3] - 1.0) < 1e-6               # mean R
    assert g[4] == 0.0 and g[5] == 0.0          # mean G, B

    # PGM (P5) with a comment line in the header
    pgm = b"P5\n# a comment\n2 1\n255\n" + bytes([0, 255])
    h = stub.decode_payload(pgm)
    assert h[2] == 1.0 and abs(h[3] - 0.5) < 1e-6

    # end-to-end through the actor pool with the REAL path only
    ds = rd.from_items([
        {"media_id": 0, "payload": wav_payload, "kind": "audio"},
        {"media_id": 1, "payload": ppm_payload, "kind": "image"},
    ])
    out = decode_media(ds, feature_dim=8, fake=False).to_pandas()
    assert len(out) == 2 and all(len(x) == 8 for x in out["features"])


def test_idf_and_tfidf_top_terms(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data as rd

    from wned_ray.pipelines.datawork import idf_table, tfidf_top_terms

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["apple banana apple", "banana cherry", "apple Cherry cherry"],
    })
    ds = rd.from_pandas(docs)
    idf = idf_table(ds).to_pandas().set_index("term")
    # df: apple 2, banana 2, cherry 2 -> idf = ln(3/2)
    assert set(idf.index) == {"apple", "banana", "cherry"}
    assert np.allclose(idf["idf"], np.log(3 / 2))

    idf_tbl = pa.Table.from_pandas(idf.reset_index(), preserve_index=False)
    top = tfidf_top_terms(ds, ray.put(idf_tbl), k=1).to_pandas()
    top = top.sort_values("doc_id").reset_index(drop=True)
    assert list(top["term"]) == ["apple", "banana", "cherry"]
    assert list(top["tf"]) == [2, 1, 2]


def test_ann_lsh_matches_bruteforce_on_clusters(ray_session):
    import numpy as np
    import ray.data as rd

    from wned_ray.pipelines.datawork import ann_lsh, knn_search

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((4, 16)) * 5
    vecs = np.concatenate([c + 0.05 * rng.standard_normal((50, 16))
                           for c in centers])
    ids = np.arange(len(vecs))
    ds = rd.from_items([{"vec_id": int(i), "embedding": v.tolist()}
                        for i, v in zip(ids, vecs)])
    q_ids = np.array([0, 50, 100])
    qm = vecs[q_ids]
    exact = knn_search(ds, q_ids, qm, k=5).to_pandas()
    approx = ann_lsh(ds, q_ids, qm, k=5).to_pandas()
    # on tightly clustered data the LSH buckets keep the true neighbors
    e = exact.groupby("query_id")["vec_id"].apply(set)
    a = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in q_ids]
    assert np.mean(recalls) >= 0.8, recalls


def test_embedding_near_dup_lsh_finds_planted_pairs(ray_session):
    """LSH-bucketed scale path vs the exact baseline on planted near-dups:
    every planted pair (cos >= 0.97) must be found by both methods and the
    two methods must agree on the pair set at the 0.95 threshold."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import embedding_near_dup

    rng = np.random.default_rng(7)
    base = rng.standard_normal((120, 32))
    # plant 20 near-duplicates: tiny perturbations of the first 20 rows
    near = base[:20] + 0.02 * rng.standard_normal((20, 32))
    m = np.concatenate([base, near])
    df = pd.DataFrame({"vec_id": np.arange(len(m), dtype=np.int64),
                       "embedding": list(m.astype(np.float32))})
    ds = rd.from_pandas(df)

    exact = embedding_near_dup(ds, threshold=0.95, method="exact").to_pandas()
    lsh = embedding_near_dup(ds, threshold=0.95, method="lsh",
                             num_partitions=4).to_pandas()
    want = {(i, 120 + i) for i in range(20)}
    got_exact = set(zip(exact["id_a"], exact["id_b"]))
    got_lsh = set(zip(lsh["id_a"], lsh["id_b"]))
    assert want <= got_exact
    assert got_lsh == got_exact          # 12x8 tables: ~0.1% miss at 0.95
    assert (lsh["cos"] >= 0.95).all()


def test_minhash_candidates_hot_band_capped(ray_session):
    """One 600-copy boilerplate text may not blow up the pair count: its
    bands exceed max_block and are excluded, so pair count stays bounded
    by the non-boilerplate content."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import minhash_candidates

    boiler = ["lorem ipsum dolor sit amet " * 4] * 600
    uniq = [f"document number {i} with its own distinct words {i*7}"
            for i in range(50)]
    df = pd.DataFrame({"doc_id": np.arange(650, dtype=np.int64),
                       "text": boiler + uniq})
    ds = rd.from_pandas(df)
    got = minhash_candidates(ds, id_col="doc_id", max_block=256,
                             num_partitions=4).to_pandas()
    # unbounded: the hot band alone emits 600*599/2 = 179_700 pairs
    assert len(got) < 5_000


def test_sessionize_gap_splits(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import sessionize

    base = np.datetime64("2026-01-01T00:00:00", "us")
    mins = np.array([0, 5, 10, 120, 125, 500], dtype="timedelta64[m]")
    df = pd.DataFrame({
        "event_id": [0, 1, 2, 3, 4, 5],
        "user_id": [7, 7, 7, 7, 7, 7],
        "ts": base + mins.astype("timedelta64[us]"),
    })
    # a second user interleaved: numbering restarts per key
    df2 = df.copy()
    df2["user_id"] = 9
    df2["event_id"] += 10
    out = (sessionize(rd.from_pandas(pd.concat([df, df2])), gap_minutes=30)
           .to_pandas().sort_values(["user_id", "event_id"]))
    assert out[out.user_id == 7]["session_idx"].tolist() == [0, 0, 0, 1, 1, 2]
    assert out[out.user_id == 9]["session_idx"].tolist() == [0, 0, 0, 1, 1, 2]


def test_asof_join_backward(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import asof_join

    base = np.datetime64("2026-01-01T00:00:00", "us")
    mins = np.array([0, 10, 20, 30, 40], dtype="timedelta64[m]")
    left = pd.DataFrame({   # purchases at t10, t30
        "event_id": [100, 101],
        "user_id": [7, 7],
        "ts": base + mins[[1, 3]].astype("timedelta64[us]"),
    })
    right = pd.DataFrame({  # clicks at t0, t20, t40
        "event_id": [200, 201, 202],
        "user_id": [7, 7, 7],
        "ts": base + mins[[0, 2, 4]].astype("timedelta64[us]"),
    })
    out = (asof_join(rd.from_pandas(left), rd.from_pandas(right),
                     key_col="user_id", ts_col="ts", id_col="event_id")
           .to_pandas().sort_values("event_id"))
    assert out["event_id"].tolist() == [100, 101]
    assert out["asof_id"].tolist() == [200, 201]   # latest strictly-earlier

    # a left row with no earlier right row is dropped
    left2 = pd.DataFrame({"event_id": [99], "user_id": [8],
                          "ts": [base.astype("datetime64[us]")]})
    right2 = pd.DataFrame({
        "event_id": [300], "user_id": [8],
        "ts": [(base + np.timedelta64(1, "m")).astype("datetime64[us]")]})
    out2 = asof_join(rd.from_pandas(left2), rd.from_pandas(right2),
                     key_col="user_id", ts_col="ts", id_col="event_id")
    assert out2.count() == 0


def test_windowed_aggregate_tumbling(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import windowed_aggregate

    base = np.datetime64("2026-01-01T00:00:00", "us")
    mins = np.array([0, 10, 59, 60, 61, 200], dtype="timedelta64[m]")
    df = pd.DataFrame({
        "ts": base + mins.astype("timedelta64[us]"),
        "event_type": ["a", "a", "b", "a", "a", "b"],
        "value": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0],
    })
    out = (windowed_aggregate(rd.from_pandas(df), window_minutes=60.0)
           .to_pandas().sort_values(["event_type", "window_start"])
           .reset_index(drop=True))
    hour_us = 60 * 60 * 1_000_000
    base_us = base.astype("datetime64[us]").astype("int64")
    # windows: a@h0 = {1,2}, a@h1 = {8,16}, b@h0 = {4}, b@h3 = {32}
    assert out["event_type"].tolist() == ["a", "a", "b", "b"]
    assert out["window_start"].tolist() == [
        base_us, base_us + hour_us, base_us, base_us + 3 * hour_us]
    assert out["n_events"].tolist() == [2, 2, 1, 1]
    assert out["sum_value"].tolist() == [3.0, 24.0, 4.0, 32.0]


def test_range_join_count(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import range_join_count

    base = np.datetime64("2026-01-01T00:00:00", "us")
    mins = np.array([0, 30, 59, 60, 61, 200], dtype="timedelta64[m]")
    left = pd.DataFrame({   # purchases at t60, t200
        "event_id": [100, 101],
        "user_id": [7, 7],
        "ts": base + mins[[3, 5]].astype("timedelta64[us]"),
    })
    right = pd.DataFrame({  # clicks at t0, t30, t59, t61
        "event_id": [200, 201, 202, 203],
        "user_id": [7, 7, 7, 7],
        "ts": base + mins[[0, 1, 2, 4]].astype("timedelta64[us]"),
    })
    out = (range_join_count(rd.from_pandas(left), rd.from_pandas(right),
                            key_col="user_id", ts_col="ts",
                            id_col="event_id", lo_minutes=60.0,
                            out_col="n_clicks_1h")
           .to_pandas().sort_values("event_id"))
    # t60: clicks in [t0, t60) -> t0, t30, t59 = 3 (t0 boundary inclusive)
    # t200: clicks in [t140, t200) -> none = 0 (zero rows kept)
    assert out["event_id"].tolist() == [100, 101]
    assert out["n_clicks_1h"].tolist() == [3, 0]


def test_range_join_count_vs_bruteforce(ray_session):
    """Seeded fuzz: searchsorted sweep == per-row brute force, many keys."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import range_join_count

    rng = np.random.default_rng(7)
    base = np.datetime64("2026-01-01T00:00:00", "us")

    def mk(n, ids0):
        return pd.DataFrame({
            "event_id": np.arange(ids0, ids0 + n),
            "user_id": rng.integers(0, 5, n),
            "ts": base + rng.integers(0, 10_000, n).astype("timedelta64[s]"),
        })

    left, right = mk(80, 0), mk(200, 1000)
    lo_us = 600 * 1_000_000          # 10-minute window
    out = (range_join_count(rd.from_pandas(left), rd.from_pandas(right),
                            key_col="user_id", ts_col="ts",
                            id_col="event_id", lo_minutes=10.0)
           .to_pandas().set_index("event_id")["n_in_range"])
    lts = left["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    rts = right["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    for i, row in left.reset_index(drop=True).iterrows():
        t = int(lts[i])
        want = int(((right["user_id"].to_numpy() == row["user_id"])
                    & (rts >= t - lo_us) & (rts < t)).sum())
        assert out[row["event_id"]] == want


def test_windowed_aggregate_vs_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import windowed_aggregate

    rng = np.random.default_rng(11)
    n = 500
    base = np.datetime64("2026-01-01T00:00:00", "us")
    df = pd.DataFrame({
        "ts": base + rng.integers(0, 100_000, n).astype("timedelta64[s]"),
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": rng.normal(size=n).round(2),
    })
    out = (windowed_aggregate(rd.from_pandas(df), window_minutes=30.0)
           .to_pandas().sort_values(["event_type", "window_start"])
           .reset_index(drop=True))
    w_us = 30 * 60 * 1_000_000
    want = df.assign(window_start=(df["ts"].astype("int64") // w_us) * w_us)
    want = (want.groupby(["event_type", "window_start"], as_index=False)
            .agg(n_events=("value", "size"), sum_value=("value", "sum"))
            .sort_values(["event_type", "window_start"])
            .reset_index(drop=True))
    assert out["n_events"].tolist() == want["n_events"].tolist()
    assert np.allclose(out["sum_value"], want["sum_value"])
    assert out["window_start"].tolist() == want["window_start"].tolist()


def test_timestamp_ns_unit_normalized(ray_session):
    """timestamp[ns] inputs (pandas' default datetime64[ns]) must behave
    identically to timestamp[us] — gaps/windows/ranges are expressed in
    microseconds internally, and a silent 1000x unit mismatch would make
    every event its own session / shrink every window."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import (range_join_count, sessionize,
                                             windowed_aggregate)

    ts_ns = pd.date_range("2026-01-01", periods=6, freq="5min")  # ns unit
    assert str(ts_ns.dtype) == "datetime64[ns]"
    df = pd.DataFrame({"event_id": range(6), "user_id": [7] * 6,
                       "ts": ts_ns,
                       "event_type": ["a"] * 6, "value": [1.0] * 6})

    # 5-min spacing, 30-min gap -> ONE session (ns bug: six sessions)
    out = sessionize(rd.from_pandas(df), gap_minutes=30).to_pandas()
    assert out["session_idx"].tolist() == [0] * 6

    # one 60-min window holds all six events (ns bug: 1000x-narrow windows)
    w = windowed_aggregate(rd.from_pandas(df), window_minutes=60.0).to_pandas()
    assert w["n_events"].tolist() == [6]

    # every event has all 5 others within +/-30min (ns bug: zero in range)
    r = (range_join_count(rd.from_pandas(df), rd.from_pandas(df),
                          key_col="user_id", ts_col="ts", id_col="event_id",
                          lo_minutes=30.0, hi_minutes=30.0)
         .to_pandas().sort_values("event_id"))
    assert r["n_in_range"].tolist() == [6] * 6   # self included in [lo, hi)


def test_windowed_aggregate_counts_null_values(ray_session):
    """n_events is the EVENT count (oracle count(*)), not the non-null
    value count."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import windowed_aggregate

    base = np.datetime64("2026-01-01T00:00:00", "us")
    df = pd.DataFrame({
        "ts": [base, base + np.timedelta64(1, "m")],
        "event_type": ["a", "a"],
        "value": [2.0, None],
    })
    out = windowed_aggregate(rd.from_pandas(df),
                             window_minutes=60.0).to_pandas()
    assert out["n_events"].tolist() == [2]
    assert out["sum_value"].tolist() == [2.0]


def test_asof_join_cross_side_tie_not_counted(ray_session):
    """A right row with a left row's EXACT (ts, id) is not 'strictly
    preceding' — deterministic regardless of union arrival order."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import asof_join

    base = np.datetime64("2026-01-01T00:00:00", "us")
    left = pd.DataFrame({"event_id": [5], "user_id": [7], "ts": [base]})
    right = pd.DataFrame({
        "event_id": [3, 5],   # id 5 ties left's (ts, id) exactly
        "user_id": [7, 7],
        "ts": [base - np.timedelta64(1, "m"), base],
    })
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    key_col="user_id", ts_col="ts",
                    id_col="event_id").to_pandas()
    assert out["asof_id"].tolist() == [3]


def test_embedding_near_dup_exact_empty_input(ray_session):
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import embedding_near_dup

    empty = rd.from_pandas(pd.DataFrame({
        "vec_id": pd.Series([], dtype="int64"),
        "embedding": pd.Series([], dtype=object)}))
    out = embedding_near_dup(empty, method="exact")
    assert out.count() == 0
    # Dataset keeps the schema (to_pandas drops columns on empty inputs)
    assert set(out.schema().names) == {"id_a", "id_b", "cos"}


def test_sliding_window_aggregate_vs_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import sliding_window_aggregate

    rng = np.random.default_rng(5)
    n = 400
    base = np.datetime64("2026-01-01T00:00:00", "us")
    df = pd.DataFrame({
        "ts": base + rng.integers(0, 50_000, n).astype("timedelta64[s]"),
        "event_type": rng.choice(["a", "b"], n),
        "value": rng.normal(size=n).round(2),
    })
    W, S = 120.0, 30.0                       # 2h windows every 30min
    out = (sliding_window_aggregate(rd.from_pandas(df), width_minutes=W,
                                    step_minutes=S)
           .to_pandas().sort_values(["event_type", "window_start"])
           .reset_index(drop=True))
    w_us, s_us = int(W * 60e6), int(S * 60e6)
    rows = []
    for _, r in df.iterrows():
        e = r["ts"].value                     # pandas ns -> but datetime64[us]?
        e = int(pd.Timestamp(r["ts"]).value // 1000)   # ns -> us
        smax = (e // s_us) * s_us
        for k in range(w_us // s_us):
            rows.append((r["event_type"], smax - k * s_us, r["value"]))
    want = (pd.DataFrame(rows, columns=["event_type", "window_start", "value"])
            .groupby(["event_type", "window_start"], as_index=False)
            .agg(n_events=("value", "size"), sum_value=("value", "sum"))
            .sort_values(["event_type", "window_start"])
            .reset_index(drop=True))
    assert out["n_events"].tolist() == want["n_events"].tolist()
    assert np.allclose(out["sum_value"], want["sum_value"])
    assert out["window_start"].tolist() == want["window_start"].tolist()
    # every event in exactly width/step windows
    assert out["n_events"].sum() == n * (w_us // s_us)


def test_hash_sample_deterministic_and_fair(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import hash_sample

    df = pd.DataFrame({"doc_id": np.arange(20_000, dtype=np.int64)})
    a = hash_sample(rd.from_pandas(df), "doc_id", rate_pct=10.0,
                    seed=7).to_pandas()
    b = hash_sample(rd.from_pandas(df), "doc_id", rate_pct=10.0,
                    seed=7).to_pandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()    # deterministic
    assert 0.08 < len(a) / len(df) < 0.12                  # ~10%
    c = hash_sample(rd.from_pandas(df), "doc_id", rate_pct=10.0,
                    seed=8).to_pandas()
    assert a["doc_id"].tolist() != c["doc_id"].tolist()    # seed matters
    # matches the SQL twin's arithmetic exactly
    h = ((df["doc_id"].to_numpy().astype(np.uint64) + 7) % (1 << 32)
         * 2654435761) % (1 << 32)
    want = df["doc_id"][h < int(0.1 * (1 << 32))].tolist()
    assert a["doc_id"].tolist() == sorted(want)


def test_group_quantiles_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import group_quantiles

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], 3000),
        "value": rng.normal(size=3000).round(3),
    })
    df.loc[::50, "value"] = np.nan            # quantile_cont ignores nulls
    out = (group_quantiles(rd.from_pandas(df), "event_type", "value",
                           qs=(0.25, 0.5, 0.9, 0.99))
           .to_pandas().sort_values(["event_type", "quantile"])
           .reset_index(drop=True))
    want = duckdb.connect().execute(
        "SELECT event_type, unnest([0.25,0.5,0.9,0.99]) AS quantile, "
        "CAST(round(unnest(quantile_cont(value, [0.25,0.5,0.9,0.99]))"
        " * 10000) AS BIGINT) AS value_e4 "
        "FROM df GROUP BY event_type ORDER BY event_type, quantile"
    ).fetch_df()
    assert out["value_e4"].tolist() == want["value_e4"].tolist()
    assert out["event_type"].tolist() == want["event_type"].tolist()


def test_heavy_hitter_terms_exact_vs_bruteforce(ray_session):
    """Misra-Gries sketch + verify pass equals the full groupby whenever
    min_freq > n_tokens/(k+1) — forced through MANY small batches and a
    tiny k so the sketch actually decrements."""
    import re

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import heavy_hitter_terms

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(400)]
    # zipf-ish: a few heavy terms, a long tail
    weights = 1.0 / np.arange(1, len(vocab) + 1) ** 1.2
    weights /= weights.sum()
    docs = [" ".join(rng.choice(vocab, size=30, p=weights))
            for _ in range(300)]
    ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(20)

    n_tokens = 300 * 30
    k, min_freq = 64, 160
    assert min_freq > n_tokens // (k + 1)     # guarantee precondition
    got = (heavy_hitter_terms(ds, k=k, min_freq=min_freq)
           .to_pandas().sort_values("term").reset_index(drop=True))

    toks = [t for d in docs for t in re.findall(r"[a-z0-9]+", d.lower())]
    want = (pd.Series(toks).value_counts().rename_axis("term")
            .reset_index(name="freq"))
    want = (want[want["freq"] >= min_freq].sort_values("term")
            .astype({"freq": "int64"}).reset_index(drop=True))
    assert len(want) > 3                       # the fixture has heavy terms
    pd.testing.assert_frame_equal(got[["term", "freq"]],
                                  want[["term", "freq"]])

    # a too-coarse starting k self-heals: 16 -> 32 -> 64 crosses the
    # exactness gate (min_freq > n/(k+1)), with each doubling logged
    with pytest.warns(UserWarning, match="escalating to k="):
        healed = (heavy_hitter_terms(ds, k=16, min_freq=min_freq)
                  .to_pandas().sort_values("term").reset_index(drop=True))
    pd.testing.assert_frame_equal(healed[["term", "freq"]],
                                  want[["term", "freq"]])

    # past the escalation budget the guarantee is still enforced:
    # k=4 doubled 4x = 64 < the ~900 needed for min_freq=10
    with pytest.raises(ValueError, match="still too coarse"):
        heavy_hitter_terms(ds, k=4, min_freq=10).to_pandas()


def test_ordered_window_funcs_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import ordered_window_funcs

    rng = np.random.default_rng(21)
    n = 2000
    base = np.datetime64("2026-01-01T00:00:00", "us")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 40, n),
        "ts": base + rng.integers(0, 5000, n).astype("timedelta64[s]"),
        "value": rng.normal(size=n).round(2),
    })
    got = (ordered_window_funcs(rd.from_pandas(df))
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    want = duckdb.connect().execute(
        "SELECT event_id, user_id, "
        "sum(coalesce(value,0)) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS cum_value, "
        "lag(event_id) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_id, "
        "lead(event_id) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS next_id, "
        "first_value(event_id) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS first_id, "
        "dense_rank() OVER "
        "(PARTITION BY user_id ORDER BY value DESC) AS dense_rank_value, "
        "ntile(4) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS tile "
        "FROM df ORDER BY event_id").fetch_df()
    assert np.allclose(got["cum_value"], want["cum_value"])
    for col in ("prev_id", "next_id", "first_id"):
        assert got[col].astype("Int64").equals(want[col].astype("Int64")), col
    for col in ("dense_rank_value", "tile"):
        assert got[col].astype("int64").tolist() == \
            want[col].astype("int64").tolist(), col
    assert got["user_id"].tolist() == want["user_id"].tolist()


def test_set_op_matches_sql_semantics(ray_session):
    # ANSI INTERSECT / EXCEPT use DISTINCT semantics: duplicates on
    # either side collapse, and except removes a value present ANYWHERE
    # on the right side regardless of multiplicity
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import set_op

    a = rd.from_pandas(pd.DataFrame({"v": ["x", "x", "y", "z", "w"]}))
    b = rd.from_pandas(pd.DataFrame({"v": ["y", "y", "w", "q"]}))
    inter = sorted(set_op(a, b, "v", "intersect").to_pandas()["v"])
    exc = sorted(set_op(a, b, "v", "except").to_pandas()["v"])
    assert inter == ["w", "y"]
    assert exc == ["x", "z"]
    with pytest.raises(ValueError, match="intersect|except"):
        set_op(a, b, "v", "union")


def test_ordered_window_funcs_string_ids(ray_session):
    # prev_id must carry the input id column's type (ADVICE r2): string
    # mention-style ids like "c0000001:3" go through unchanged
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import ordered_window_funcs

    base = np.datetime64("2026-01-01T00:00:00", "us")
    df = pd.DataFrame({
        "event_id": [f"c{i:07d}:{i % 3}" for i in range(12)],
        "user_id": [i % 2 for i in range(12)],
        "ts": base + np.arange(12).astype("timedelta64[s]"),
        "value": np.ones(12),
    })
    # zero-padded ids sort lexically in ts order, so event_id is a valid
    # per-key order proxy for the emitted columns (ts is not re-emitted)
    got = (ordered_window_funcs(rd.from_pandas(df))
           .to_pandas().sort_values(["user_id", "event_id"])
           .reset_index(drop=True))
    assert got["prev_id"].dtype == object
    # first row per key is null; every later prev_id is the prior id
    for uid, g in got.groupby("user_id"):
        ids = g["event_id"].tolist()
        prev = g["prev_id"].tolist()
        assert prev[0] is None or pd.isna(prev[0])
        assert prev[1:] == ids[:-1]


def test_rollup_int_values_and_empty_input(ray_session):
    # int val_col: grand-total row must carry the same int64 sum_value
    # the finest level does (no mixed-schema union); empty input must
    # return an empty typed table, not a null-built grand row
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import rollup_aggregate

    df = pd.DataFrame({
        "event_type": ["a", "a", "b"],
        "user_id": np.array([1, 1, 2], np.int64),
        "value": np.array([10, 20, 5], np.int64),
    })
    out = rollup_aggregate(rd.from_pandas(df),
                           keys=["event_type", "user_id"])
    import pyarrow as pa_
    assert out.schema().base_schema.field("sum_value").type == pa_.int64()
    got = out.to_pandas()
    grand = got[got["event_type"].isna() & got["user_id"].isna()]
    assert grand["sum_value"].tolist() == [35]
    assert grand["n_events"].tolist() == [3]

    empty = rollup_aggregate(rd.from_pandas(df.head(0)),
                             keys=["event_type", "user_id"])
    assert empty.count() == 0
    assert set(empty.schema().names) == {"event_type", "user_id",
                                         "n_events", "sum_value"}


def test_simhash_keys_are_shuffle_safe_int63(ray_session, docs):
    # simhash exists to be grouped/joined on; uint64 >= 2^63 keys break
    # Ray's hash shuffle (segfault class documented round 1) so the
    # emitted column must be int63-masked int64 — and a groupby on it
    # must actually run
    import pyarrow as pa_

    from wned_ray.pipelines.datawork import simhash

    out = simhash(docs, id_col="doc_id")
    assert out.schema().base_schema.field("simhash").type == pa_.int64()
    vals = out.to_pandas()["simhash"].to_numpy()
    assert (vals >= 0).all()
    grouped = out.groupby("simhash").count().to_pandas()
    assert grouped["count()"].sum() == len(vals)


def test_rollup_aggregate_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from wned_ray.pipelines.datawork import rollup_aggregate

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], 2000),
        "user_id": rng.integers(0, 20, 2000),
        "value": rng.normal(size=2000).round(2),
    })
    out = rollup_aggregate(rd.from_pandas(df),
                           keys=["event_type", "user_id"]).to_pandas()
    out["sum_value"] = out["sum_value"].round(4)
    out = (out.sort_values(["event_type", "user_id"], na_position="first")
           .reset_index(drop=True))
    want = duckdb.connect().execute(
        "SELECT event_type, user_id, count(*) AS n_events, "
        "round(sum(value), 4) AS sum_value FROM df "
        "GROUP BY ROLLUP(event_type, user_id) "
        "ORDER BY event_type NULLS FIRST, user_id NULLS FIRST").fetch_df()
    assert len(out) == len(want)
    assert out["n_events"].tolist() == want["n_events"].tolist()
    assert np.allclose(out["sum_value"], want["sum_value"])
    assert (out["event_type"].isna() == want["event_type"].isna()).all()
    assert (out["user_id"].isna() == want["user_id"].isna()).all()


def test_simhash_near_dup(ray_session):
    """Banded simhash near-dup (Manku-style): exact and one-word-changed
    duplicates pair with small Hamming distance; unrelated docs do not.
    Also exercises groupby/join on simhash-derived keys — the int63
    masking's reason to exist."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import simhash_near_dup

    base = ("the quick brown fox jumps over the lazy dog near the river "
            "bank while the miller watches the water wheel turn slowly "
            ) * 10                                   # long doc: one changed
    near = base.replace("miller", "sailor", 1)       # token flips few bits
    rows = [{"doc_id": 0, "text": base},
            {"doc_id": 1, "text": base},                     # exact dup
            {"doc_id": 2, "text": near},                     # near dup
            {"doc_id": 3, "text": "completely different content here now "
                                  "about orbital mechanics and cheese"},
            {"doc_id": 4, "text": "another unrelated document body text "
                                  "regarding harvest yields this season"}]
    out = (simhash_near_dup(rd.from_items(rows), id_col="doc_id")
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    got = dict(zip(zip(out["id_a"], out["id_b"]), out["hamming"]))
    assert got.get((0, 1)) == 0                      # exact dup: hamming 0
    assert (0, 2) in got and got[(0, 2)] <= 3        # near dup within radius
    assert not any(3 in p or 4 in p for p in got)    # unrelated stay out


def test_hll_accuracy_and_merge(ray_session):
    """HyperLogLog: relative error within ~4 standard errors at p=12 on
    100k distinct values, and register-max merge == single build."""
    from wned_ray.pipelines.datawork import HyperLogLog

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1 << 62, 300_000).astype(np.uint64)
    exact = len(np.unique(vals))
    h = HyperLogLog(p=12)
    h.add_hashes(vals)
    est = h.estimate()
    rel = abs(est - exact) / exact
    assert rel < 0.065, (est, exact, rel)      # 4 * 1.04/sqrt(4096) ~ 6.5%

    merged = HyperLogLog(p=12)
    for chunk in np.array_split(vals, 7):
        part = HyperLogLog(p=12)
        part.add_hashes(chunk)
        merged.merge(part)
    assert (merged.registers == h.registers).all()
    assert merged.estimate() == est


def test_hll_count_distinct_dataset(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.datawork import hll_count_distinct

    n = 50_000
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64) % 10_000})
    out = hll_count_distinct(rd.from_pandas(df), "k")
    assert abs(out["estimate"] - 10_000) / 10_000 < 0.065, out
    # string column path (hashes via whole_string_hashes)
    sdf = pd.DataFrame({"s": [f"tok{i % 500}" for i in range(20_000)]})
    out2 = hll_count_distinct(rd.from_pandas(sdf), "s")
    assert abs(out2["estimate"] - 500) / 500 < 0.05, out2


def test_hll_md5_mode_matches_duckdb_twin(ray_session):
    """hash_mode='md5' is bit-reproducible in SQL: DuckDB recomputes the
    registers (first 8 md5 bytes, p=12, rho over the low-52-bit payload)
    and the corrected estimate, matching the Ray sketch exactly — this is
    what makes hll_distinct_terms a value-hash oracle row. Error bound vs
    exact also asserted (~1.6% standard error at p=12)."""
    import duckdb
    import ray.data as rd

    from wned_ray.pipelines.datawork import distinct_count, hll_count_distinct

    vals = [f"w{i % 3000}" for i in range(40_000)]
    ds = rd.from_pandas(pd.DataFrame({"s": vals}))
    est = hll_count_distinct(ds, "s", hash_mode="md5")["estimate"]
    exact = distinct_count(ds, "s")
    assert exact == 3000
    assert abs(est - exact) / exact < 0.065, (est, exact)

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS s", [vals])
    sql_est = con.execute(
        "WITH u AS (SELECT DISTINCT s FROM t), "
        "h AS (SELECT ('0x' || substr(md5(s), 1, 16))::UBIGINT AS hv FROM u), "
        "parts AS (SELECT hv // (4503599627370496)::UBIGINT AS idx, "
        "hv % (4503599627370496)::UBIGINT AS payload FROM h), "
        "regs AS (SELECT idx, max(CASE WHEN payload = 0 THEN 53 "
        "ELSE 53 - length(bin(payload)) END) AS r FROM parts GROUP BY idx), "
        "agg AS (SELECT sum(power(2.0, -r)) AS s, count(*) AS nz FROM regs), "
        "est AS (SELECT (0.7213 / (1 + 1.079 / 4096.0)) * 4096.0 * 4096.0 "
        "/ (s + (4096 - nz)) AS raw, (4096 - nz) AS zeros FROM agg) "
        "SELECT CASE WHEN raw <= 2.5 * 4096 AND zeros > 0 "
        "THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END FROM est"
    ).fetchone()[0]
    assert round(est) == round(sql_est), (est, sql_est)


def test_hll_group_distinct(ray_session):
    """Grouped HLL: per-key estimates within the p=12 error bound of the
    per-key exact distincts; the grouped md5 path must equal the global
    sketch run on each key's slice alone (the strip scatter + groupby
    merge is exactly a per-key HyperLogLog)."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import (hll_count_distinct,
                                             hll_group_distinct)

    rng = np.random.default_rng(11)
    n = 60_000
    keys = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    # distinct cardinality differs per key: a~2000, b~500, c~8000
    card = {"a": 2000, "b": 500, "c": 8000}
    vals = np.array([f"{k}v{rng.integers(0, card[k])}" for k in keys])
    df = pd.DataFrame({"k": keys, "v": vals})
    ds = rd.from_pandas(df)

    got = (hll_group_distinct(ds, "k", "v", hash_mode="md5")
           .to_pandas().set_index("k")["estimate_int"])
    for k in card:
        exact = df.loc[df["k"] == k, "v"].nunique()
        assert abs(got[k] - exact) / exact < 0.065, (k, got[k], exact)
        solo = hll_count_distinct(
            rd.from_pandas(df[df["k"] == k]), "v",
            hash_mode="md5")["estimate"]
        assert got[k] == int(round(solo)), (k, got[k], solo)


def test_ngram_jaccard_dedup_matches_duckdb(docs):
    import duckdb

    from wned_ray.pipelines.datawork import ngram_jaccard_dedup

    got = (ngram_jaccard_dedup(docs, id_col="doc_id", n=3, threshold=0.8,
                               num_partitions=4)
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    want = duckdb.sql(rf"""
        WITH w AS (SELECT doc_id, string_split(lower(trim(
            regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
          FROM read_parquet('{SF}/documents.parquet')),
        g AS (SELECT doc_id, unnest(list_distinct(
            [array_to_string(ws[i:i+2], ' ')
             for i in generate_series(1, len(ws)-2)])) AS gram
          FROM w WHERE len(ws) >= 3),
        s AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
        i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT i.id_a, i.id_b,
               1.0 * inter / (sa.sz + sb.sz - inter) AS jaccard
        FROM i JOIN s sa ON sa.doc_id = i.id_a
               JOIN s sb ON sb.doc_id = i.id_b
        WHERE 1.0 * inter / (sa.sz + sb.sz - inter) >= 0.8
        ORDER BY 1, 2""").df()
    assert len(got) > 0                       # planted near-dups exist
    assert got[["id_a", "id_b"]].values.tolist() == \
        want[["id_a", "id_b"]].values.tolist()
    assert np.allclose(got["jaccard"].values, want["jaccard"].values)


def test_ngram_jaccard_short_and_empty_docs(ray_session):
    """Docs with < n tokens emit no grams (SQL generate_series parity);
    identical short docs therefore do NOT pair here (exact_dedup's job)."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import ngram_jaccard_dedup

    ds = rd.from_items([
        {"doc_id": 1, "text": "a b"},
        {"doc_id": 2, "text": "a b"},
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": "x y z w x y z"},
        {"doc_id": 5, "text": "x y z w x y z"},
    ])
    got = (ngram_jaccard_dedup(ds, id_col="doc_id", n=3, threshold=0.8,
                               num_partitions=2)
           .to_pandas().sort_values(["id_a", "id_b"]))
    assert got[["id_a", "id_b"]].values.tolist() == [[4, 5]]
    assert np.allclose(got["jaccard"].values, [1.0])


def test_ann_ivf_matches_bruteforce_on_clusters(ray_session):
    import numpy as np
    import ray.data as rd

    from wned_ray.pipelines.datawork import ann_ivf, knn_search

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((4, 16)) * 5
    vecs = np.concatenate([c + 0.05 * rng.standard_normal((50, 16))
                           for c in centers])
    ids = np.arange(len(vecs))
    ds = rd.from_items([{"vec_id": int(i), "embedding": v.tolist()}
                        for i, v in zip(ids, vecs)])
    q_ids = np.array([0, 50, 100])
    qm = vecs[q_ids]
    exact = knn_search(ds, q_ids, qm, k=5).to_pandas()
    approx = ann_ivf(ds, q_ids, qm, k=5, n_cells=8, nprobe=2,
                     train_sample=200).to_pandas()
    # the quantizer separates the planted clusters; probed cells keep
    # the true neighbors
    e = exact.groupby("query_id")["vec_id"].apply(set)
    a = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in q_ids]
    assert np.mean(recalls) >= 0.8, recalls


def test_ann_ivf_deterministic(ray_session):
    import numpy as np
    import ray.data as rd

    from wned_ray.pipelines.datawork import ann_ivf

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((60, 8))
    ds = rd.from_items([{"vec_id": int(i), "embedding": v.tolist()}
                        for i, v in enumerate(vecs)])
    q_ids = np.array([1, 2])
    qm = vecs[q_ids]
    a = (ann_ivf(ds, q_ids, qm, k=3, n_cells=4, train_sample=60)
         .to_pandas().sort_values(["query_id", "vec_id"]).values.tolist())
    b = (ann_ivf(ds, q_ids, qm, k=3, n_cells=4, train_sample=60)
         .to_pandas().sort_values(["query_id", "vec_id"]).values.tolist())
    assert a == b


def test_stratified_sample_k_matches_duckdb(docs):
    import duckdb

    from wned_ray.pipelines.datawork import stratified_sample_k

    got = (stratified_sample_k(docs.select_columns(
        ["doc_id", "lang", "n_chars"]), key_col="lang", id_col="doc_id",
        k=10, seed=7)
        .to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True))
    want = duckdb.sql(f"""
        SELECT doc_id, lang, n_chars FROM (
          SELECT doc_id, lang, n_chars, row_number() OVER (
            PARTITION BY lang ORDER BY
            (CAST((doc_id + 7) % 4294967296 AS HUGEINT)
             * 2654435761) % 4294967296, doc_id) AS rn
          FROM read_parquet('{SF}/documents.parquet')) WHERE rn <= 10
        ORDER BY lang, doc_id""").df()
    assert got[["doc_id", "lang", "n_chars"]].values.tolist() == \
        want.values.tolist()


def test_stratified_sample_k_small_groups(ray_session):
    """Groups smaller than k keep every row; combiner never drops one."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import stratified_sample_k

    ds = rd.from_items([{"g": "a", "id": i} for i in range(3)]
                       + [{"g": "b", "id": i} for i in range(40)])
    out = stratified_sample_k(ds, key_col="g", id_col="id", k=5,
                              seed=1).to_pandas()
    assert (out.groupby("g").size().to_dict()) == {"a": 3, "b": 5}


def test_bm25_topk_matches_duckdb(docs):
    import duckdb

    from wned_ray.pipelines.datawork import bm25_topk

    got = bm25_topk(docs.select_columns(["doc_id", "text"]),
                    ["hash", "join", "vector", "stream"],
                    k=20).to_pandas()
    want = duckdb.sql(f"""
        WITH d AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
          FROM read_parquet('{SF}/documents.parquet')),
        dl AS (SELECT doc_id, len(ts) AS dlen FROM d),
        st AS (SELECT count(*) AS n,
            1.0 * sum(dlen) / count(*) AS avgdl FROM dl),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM (
            SELECT doc_id, unnest(ts) AS term FROM d)
          WHERE term IN ('hash', 'join', 'vector', 'stream')
          GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        sc AS (SELECT tf.doc_id, sum(
            ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
            * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dlen
            / st.avgdl))) AS score
          FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
          CROSS JOIN st GROUP BY 1)
        SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_e4
        FROM sc ORDER BY score_e4 DESC, doc_id LIMIT 20""").df()
    assert len(got) == 20
    assert got[["doc_id", "score_e4"]].values.tolist() == \
        want.values.tolist()


def test_bm25_absent_term_and_ordering(ray_session):
    """A term in no doc contributes nothing; tf saturation orders a
    doc with a rarer term above one stuffed with a common term."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import bm25_topk

    ds = rd.from_items([
        {"doc_id": 1, "text": "cat cat cat cat cat cat"},
        {"doc_id": 2, "text": "zebra cat"},
        {"doc_id": 3, "text": "dog dog"},
    ])
    out = (bm25_topk(ds, ["zebra", "cat", "unicorn"], k=3)
           .to_pandas().set_index("doc_id")["score_e4"])
    assert 3 not in out.index            # no query term -> no row
    assert out[2] > out[1]               # rare zebra beats stuffed cat


def test_grouped_corr_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from wned_ray.pipelines.datawork import grouped_corr

    ds = rd.read_parquet(f"{SF}/lineitem.parquet")
    got = (grouped_corr(ds, "l_returnflag", "l_quantity",
                        "l_extendedprice")
           .to_pandas().sort_values("l_returnflag").reset_index(drop=True))
    want = duckdb.sql(f"""
        SELECT l_returnflag, count(*) AS n,
               corr(l_extendedprice, l_quantity) AS c
        FROM read_parquet('{SF}/lineitem.parquet')
        GROUP BY 1 ORDER BY 1""").df()
    assert got["l_returnflag"].tolist() == want["l_returnflag"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    assert np.allclose(got["corr"].values, want["c"].values, atol=1e-9)


def test_grouped_corr_degenerate(ray_session):
    """Constant column -> zero denominator -> NaN (ANSI corr NULL)."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import grouped_corr

    ds = rd.from_items([{"g": "a", "x": 1.0, "y": float(i)}
                        for i in range(5)]
                       + [{"g": "b", "x": float(i), "y": 2.0 * i + 1}
                          for i in range(5)])
    out = (grouped_corr(ds, "g", "x", "y").to_pandas()
           .set_index("g")["corr"])
    assert np.isnan(out["a"])
    assert abs(out["b"] - 1.0) < 1e-12


def test_ngram_jaccard_join_path_equals_fast_path(docs):
    """driver_max_rows=0 forces the distributed self-join; both paths
    must emit the identical pair set + jaccard values."""
    from wned_ray.pipelines.datawork import ngram_jaccard_dedup

    fast = (ngram_jaccard_dedup(docs, id_col="doc_id", num_partitions=4)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    join = (ngram_jaccard_dedup(docs, id_col="doc_id", num_partitions=4,
                                driver_max_rows=0)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert fast[["id_a", "id_b"]].values.tolist() == \
        join[["id_a", "id_b"]].values.tolist()
    assert np.allclose(fast["jaccard"].values, join["jaccard"].values)


def test_salted_join_equals_plain_join(ray_session):
    """salted_join must emit the identical row multiset as Dataset.join
    on a Zipf-skewed fact side (90% one key), for inner AND left_outer,
    including many-to-many keys (dim carries a duplicated key)."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import salted_join

    rng = np.random.default_rng(3)
    n = 20_000
    keys = np.where(rng.random(n) < 0.9, 0,
                    rng.integers(1, 120, n)).astype(np.int64)
    fact = pd.DataFrame({"k": keys, "fv": np.arange(n, dtype=np.int64)})
    # dim covers keys 0..99 (keys 100..119 unmatched -> exercises outer),
    # and key 7 twice (many-to-many fan-out must not duplicate per salt)
    dim = pd.DataFrame({"k": list(range(100)) + [7],
                        "dv": list(range(100)) + [999]})

    def norm(ds):
        return (ds.to_pandas().sort_values(["k", "fv", "dv"])
                .reset_index(drop=True))

    for jt in ("inner", "left_outer"):
        plain = rd.from_pandas(fact).join(
            rd.from_pandas(dim), join_type=jt, num_partitions=4, on=("k",))
        salted = salted_join(rd.from_pandas(fact), rd.from_pandas(dim),
                             on="k", salt=4, num_partitions=4, join_type=jt)
        p, s = norm(plain), norm(salted)
        assert len(p) == len(s), (jt, len(p), len(s))
        pd.testing.assert_frame_equal(p[["k", "fv", "dv"]],
                                      s[["k", "fv", "dv"]])


def test_weighted_sample_k(ray_session):
    """Efraimidis-Spirakis: deterministic, partitioning-invariant, and
    actually weight-proportional (heavy rows ~9x likelier than light
    ones across seeds)."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import weighted_sample_k

    n = 3000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "w": np.where(np.arange(n) % 10 == 0, 9.0, 1.0)})
    ds = rd.from_pandas(df)
    a = weighted_sample_k(ds, "id", "w", k=50, seed=1).to_pandas()
    b = weighted_sample_k(ds.repartition(7), "id", "w", k=50,
                          seed=1).to_pandas()
    assert sorted(a["id"]) == sorted(b["id"])          # combiner invariant
    assert len(a) == 50 and a["id"].is_unique          # without replacement

    heavy_rate = []
    for seed in range(8):
        s = weighted_sample_k(ds, "id", "w", k=100, seed=seed).to_pandas()
        heavy_rate.append((s["id"] % 10 == 0).mean())
    # heavy rows are 10% of the population with 9x weight => expected
    # share 9/(9+9) = 0.5 of the sample
    assert 0.35 < np.mean(heavy_rate) < 0.65, heavy_rate

    # zero-weight rows can never be drawn
    z = df.copy()
    z.loc[z["id"] < 2900, "w"] = 0.0
    s = weighted_sample_k(rd.from_pandas(z), "id", "w", k=80,
                          seed=3).to_pandas()
    assert (s["id"] >= 2900).all() and len(s) == 80


def test_scrub_pii_planted(ray_session):
    """Each category redacts and counts; staging order keeps ip/ssn
    digits out of the phone matcher; clean text is byte-identical."""
    import duckdb
    import ray.data as rd

    from wned_ray.pipelines.datawork import scrub_pii

    docs = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [
        "mail me at jo.doe+x@ex-ample.co.uk now",
        "server 192.168.0.1 ssn 123-45-6789 call 555 867 5309 ok",
        "two mails a@b.io c@d.org and (020) 7946-0958",
        "clean text stays byte-identical",
    ]})
    out = (scrub_pii(rd.from_pandas(docs), id_col="doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.iloc[0]["text_scrubbed"] == "mail me at <EMAIL> now"
    assert out.iloc[1]["text_scrubbed"] == \
        "server <IP> ssn <SSN> call <PHONE> ok"
    assert out.iloc[2]["n_email"] == 2 and out.iloc[2]["n_phone"] == 1
    assert out.iloc[3]["text_scrubbed"] == docs["text"][3]
    assert list(out[["n_email", "n_ip", "n_ssn", "n_phone"]].sum()) \
        == [3, 1, 1, 2]

    # the generated staged-CTE oracle is byte-identical on planted PII
    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM docs")
    sql = e.oracle_sql()["scrub_pii_docs"].replace("documents", "t")
    want = (con.execute(sql).fetch_df()
            .sort_values("doc_id").reset_index(drop=True))
    assert out.astype(str).equals(want[out.columns].astype(str))


def _ppm(w, h, rgb_rows):
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(rgb_rows)


def test_media_resize_and_frame_sample(ray_session):
    """REAL nearest-neighbor PNM resize (exact pixel assertions) and
    frame sampling over concatenated-PNM streams (byte-identical frames
    out), both end-to-end through the actor-pool stages."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import (FrameSampler, MediaResizer,
                                             resize_media, sample_frames)

    # 2x2 RGB: quadrants R G / B W -> 1x1 nearest = pixel at (1,1) = W
    px = [255, 0, 0,  0, 255, 0,
          0, 0, 255,  255, 255, 255]
    img = _ppm(2, 2, px)
    r = MediaResizer(out_w=1, out_h=1)
    out = r.resize_payload(img)
    assert out == b"P6\n1 1\n255\n" + bytes([255, 255, 255])
    # 4x4 grayscale ramp -> 2x2 nearest picks centers (1,1),(1,3),...
    ramp = bytes(range(16))
    pgm = b"P5\n4 4\n255\n" + ramp
    out2 = MediaResizer(out_w=2, out_h=2).resize_payload(pgm)
    assert out2 == b"P5\n2 2\n255\n" + bytes([5, 7, 13, 15])
    # upscale round-trips the single pixel
    up = MediaResizer(out_w=3, out_h=3).resize_payload(
        b"P5\n1 1\n255\n" + bytes([42]))
    assert up == b"P5\n3 3\n255\n" + bytes([42] * 9)

    # frame stream: 5 concatenated frames, every 2nd -> 0, 2, 4 exact
    frames = [_ppm(1, 1, [i, i, i]) for i in range(5)]
    stream = b"".join(frames)
    s = FrameSampler(every_n=2)
    assert s.split_frames(stream) == frames

    ds = rd.from_items([{"media_id": 0, "payload": stream},
                        {"media_id": 1, "payload": frames[0]}])
    got = (sample_frames(ds, every_n=2).to_pandas()
           .sort_values(["media_id", "frame_idx"]).reset_index(drop=True))
    assert list(got["frame_idx"]) == [0, 2, 4, 0]
    assert bytes(got["frame"][1]) == frames[2]

    # resize stage end-to-end; codec formats still raise honestly
    rs = (resize_media(rd.from_items(
        [{"media_id": 7, "payload": img}]), out_w=1, out_h=1)
        .to_pandas())
    assert bytes(rs["payload"][0]).endswith(bytes([255, 255, 255]))
    import pytest as _pytest
    with _pytest.raises(Exception):
        MediaResizer().resize_payload(b"\x89PNG....")


# ------------------------------------------ decontamination / repetition / spans

def test_decontaminate_flags_shared_ngrams(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.datawork import decontaminate

    ev = rd.from_items([
        {"doc_id": 100, "text": "the quick brown fox jumps"},
        {"doc_id": 101, "text": "pack my box with liquor"},
    ])
    train = rd.from_items([
        # shares "the quick brown fox" AND "quick brown fox jumps"
        {"doc_id": 0, "text": "see THE  Quick brown fox jumps high"},
        # shares nothing at 4-gram granularity (only a 3-gram overlap)
        {"doc_id": 1, "text": "quick brown fox sleeps all day"},
        # too short for any 4-gram
        {"doc_id": 2, "text": "brown fox"},
        # exact eval duplicate: 2 distinct 4-grams, both hits
        {"doc_id": 3, "text": "pack my box with liquor"},
    ])
    got = (decontaminate(train, ev, n=4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(got["doc_id"]) == [0, 1, 2, 3]
    assert list(got["n_hit_grams"]) == [2, 0, 0, 2]
    assert list(got["contaminated"]) == [1, 0, 0, 1]


def test_repetition_signals_hand_example(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.datawork import repetition_signals

    ds = rd.from_items([
        {"doc_id": 0, "text": "a a b"},     # top a=2/3, dup 2/3,
                                            # bigrams {a a, a b} -> 1/2
        {"doc_id": 1, "text": "x"},         # single token, zero bigrams
        {"doc_id": 2, "text": "c c c c"},   # fully repeated: 1.0 / 1.0 /
                                            # bigram "c c" x3 -> 1.0
    ])
    got = (repetition_signals(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(got["n_tokens"]) == [3, 1, 4]
    assert np.allclose(got["top_word_frac"], [2 / 3, 1.0, 1.0])
    assert np.allclose(got["dup_word_frac"], [2 / 3, 0.0, 1.0])
    assert np.allclose(got["top_bigram_frac"], [1 / 2, 0.0, 1.0])


def test_dup_span_stats_hand_example(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.datawork import dup_span_stats

    ds = rd.from_items([
        # docs 0 and 1 share the 2-grams "b c" and "c d"; doc 0's "a b"
        # and doc 1's "e b" are unique; doc 2 shares nothing; doc 3 is
        # below n tokens and must be absent from the output
        {"doc_id": 0, "text": "a b c d"},
        {"doc_id": 1, "text": "e b c d"},
        {"doc_id": 2, "text": "p q r"},
        {"doc_id": 3, "text": "z"},
    ])
    got = (dup_span_stats(ds, n=2, num_partitions=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(got["doc_id"]) == [0, 1, 2]
    assert list(got["n_grams"]) == [3, 3, 2]
    assert list(got["n_dup_grams"]) == [2, 2, 0]
    assert np.allclose(got["dup_frac"], [2 / 3, 2 / 3, 0.0])


def test_dup_span_join_path_equals_fast_path(docs):
    from wned_ray.pipelines.datawork import dup_span_stats

    fast = (dup_span_stats(docs, n=5).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    dist = (dup_span_stats(docs, n=5, driver_max_rows=0).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert list(fast["doc_id"]) == list(dist["doc_id"])
    assert list(fast["n_grams"]) == list(dist["n_grams"])
    assert list(fast["n_dup_grams"]) == list(dist["n_dup_grams"])
    assert np.allclose(fast["dup_frac"], dist["dup_frac"])
    assert fast["n_dup_grams"].sum() > 0          # non-degenerate corpus


def test_bpe_token_count_matches_re(ray_session):
    import re

    import ray.data as rd

    from wned_ray.pipelines.datawork import BPE_ISH_PATTERN, bpe_token_count

    texts = ["I'll don't re-match 1234x!!  ok", "", "a b", "42", "...'s"]
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(texts)])
    got = (bpe_token_count(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pat = re.compile(BPE_ISH_PATTERN)
    want_bpe = [len(pat.findall(t)) for t in texts]
    want_ws = [len(re.findall(r"\S+", t)) for t in texts]
    assert list(got["n_bpe_tokens"]) == want_bpe
    assert list(got["n_ws_tokens"]) == want_ws
    assert want_bpe[0] > want_ws[0]     # BPE-ish splits finer than ws


def test_rolling_window_agg_hand_example(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.datawork import rolling_window_agg

    ds = rd.from_items([
        {"event_id": i, "user_id": "u", "ts": i, "value": v}
        for i, v in enumerate([1.0, 3.0, 2.0, 10.0, 4.0])
    ])
    got = (rolling_window_agg(ds, window=3).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    # frames: [1], [1,3], [1,3,2], [3,2,10], [2,10,4]
    assert np.allclose(got["roll_avg"], [1.0, 2.0, 2.0, 5.0, 16 / 3])
    assert np.allclose(got["roll_max"], [1.0, 3.0, 3.0, 10.0, 10.0])


def test_prefix_jaccard_join_equals_exact(ray_session):
    """The PPJoin prefix filter is an optimization, not an
    approximation: both global orderings must return the identical
    pair set and jaccard values as the exhaustive gram self-join."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import (ngram_jaccard_dedup,
                                             prefix_jaccard_join)

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    ex = (ngram_jaccard_dedup(ds, threshold=0.8).to_pandas()
          .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert len(ex) > 0
    for ordering in ("df", "hash"):
        pf = (prefix_jaccard_join(ds, threshold=0.8, ordering=ordering)
              .to_pandas().sort_values(["id_a", "id_b"])
              .reset_index(drop=True))
        assert pf[["id_a", "id_b"]].values.tolist() == \
            ex[["id_a", "id_b"]].values.tolist()
        assert np.allclose(pf["jaccard"], ex["jaccard"])


def test_prefix_jaccard_join_planted_pair(ray_session):
    """A near-dup pair sharing 4 of 5 trigrams (J = 2/3 at t = 0.6)
    must survive the prefix filter; an unrelated doc must not pair."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import prefix_jaccard_join

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c d e f g",        # grams: abc bcd cde def efg
                 "a b c d e f h",        # shares abc bcd cde def -> J=4/6
                 "q r s t u v w"],
    })
    out = prefix_jaccard_join(rd.from_pandas(df), threshold=0.6,
                              n=3).to_pandas()
    assert list(map(tuple, out[["id_a", "id_b"]].values)) == [(1, 2)]
    assert abs(out["jaccard"].iloc[0] - 4 / 6) < 1e-12


def test_cms_one_sided_and_partition_invariant(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.datawork import cms_term_counts

    docs = pd.DataFrame({"text": [
        "apple banana apple", "cherry apple", "banana date egg",
        "fig grape apple banana", "apple"] * 8})
    a = (cms_term_counts(rd.from_pandas(docs), top_k=8,
                         hash_mode="md5").to_pandas()
         .sort_values("term").reset_index(drop=True))
    # one-sided error: the sketch never undercounts
    assert (a["est_cnt"] >= a["exact_cnt"]).all()
    assert a.loc[a.term == "apple", "exact_cnt"].iloc[0] == 40
    # merging partials is associative: any partitioning -> same sketch
    b = (cms_term_counts(rd.from_pandas(docs).repartition(7), top_k=8,
                         hash_mode="md5").to_pandas()
         .sort_values("term").reset_index(drop=True))
    assert a.values.tolist() == b.values.tolist()
    # the fast (splitmix) mode holds the same one-sided contract
    c = cms_term_counts(rd.from_pandas(docs), top_k=8,
                        hash_mode="fast").to_pandas()
    assert (c["est_cnt"] >= c["exact_cnt"]).all()


def test_cms_tiny_width_overestimates_only(ray_session):
    """With w=2 everything collides: estimates blow UP, never down —
    the defining CMS failure mode is conservative."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import cms_term_counts

    docs = pd.DataFrame({"text": ["a b c d e f g h"] * 10})
    out = cms_term_counts(rd.from_pandas(docs), d=2, w=2,
                          top_k=8, hash_mode="fast").to_pandas()
    assert (out["est_cnt"] >= out["exact_cnt"]).all()
    assert (out["est_cnt"] > out["exact_cnt"]).any()


def test_ann_pq_matches_bruteforce_on_clusters(ray_session):
    import numpy as np
    import ray.data as rd

    from wned_ray.pipelines.datawork import ann_pq, knn_search

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((4, 16)) * 5
    vecs = np.concatenate([c + 0.05 * rng.standard_normal((50, 16))
                           for c in centers])
    ids = np.arange(len(vecs))
    ds = rd.from_items([{"vec_id": int(i), "embedding": v.tolist()}
                        for i, v in zip(ids, vecs)])
    q_ids = np.array([0, 50, 100])
    qm = vecs[q_ids]
    exact = knn_search(ds, q_ids, qm, k=5).to_pandas()
    approx = ann_pq(ds, q_ids, qm, k=5, m=4, ks=16,
                    train_sample=200).to_pandas()
    e = exact.groupby("query_id")["vec_id"].apply(set)
    a = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in q_ids]
    assert np.mean(recalls) >= 0.8, recalls


def test_ann_pq_recall_on_real_embeddings(ray_session):
    """sf0.001 embeddings (near-random, the hard case for PQ): mean
    recall@5 with the default (m=8, ks=32, rerank 16k pool) must hold
    >= 0.8 vs brute force."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from wned_ray.pipelines.datawork import ann_pq, knn_search

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/embeddings.parquet")
    head = pq.read_table(f"{sf}/embeddings.parquet").slice(0, 3)
    q_ids = np.asarray(head["vec_id"].to_pylist())
    qm = np.asarray(head["embedding"].to_pylist(), dtype=np.float64)
    exact = knn_search(ds, q_ids, qm, k=5).to_pandas()
    approx = ann_pq(ds, q_ids, qm, k=5).to_pandas()
    e = exact.groupby("query_id")["vec_id"].apply(set)
    a = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in q_ids]
    assert np.mean(recalls) >= 0.8, recalls


def test_ann_pq_deterministic(ray_session):
    import numpy as np
    import ray.data as rd

    from wned_ray.pipelines.datawork import ann_pq

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((60, 8))
    ds = rd.from_items([{"vec_id": int(i), "embedding": v.tolist()}
                        for i, v in enumerate(vecs)])
    q_ids = np.array([1, 2])
    qm = vecs[q_ids]
    a = (ann_pq(ds, q_ids, qm, k=3, m=2, ks=8, train_sample=60)
         .to_pandas().sort_values(["query_id", "vec_id"]).values.tolist())
    b = (ann_pq(ds, q_ids, qm, k=3, m=2, ks=8, train_sample=60)
         .to_pandas().sort_values(["query_id", "vec_id"]).values.tolist())
    assert a == b


def test_bigram_lm_hand_example(ray_session):
    """Tiny corpus where every count is hand-checkable: doc1 'a b',
    doc2 'a b', doc3 'a c', doc4 'z' (no bigrams -> scored 0).
    unigrams: a=3 b=2 c=1 z=1, V=4; bigrams: 'a b'=2, 'a c'=1."""
    import math

    import ray.data as rd

    from wned_ray.pipelines.datawork import bigram_lm_scores

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "text": ["a b", "a b", "a c", "z"]})
    got = (bigram_lm_scores(rd.from_pandas(df), alpha=0.1).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    a = 0.1
    nll_ab = -math.log((2 + a) / (3 + a * 4))
    nll_ac = -math.log((1 + a) / (3 + a * 4))
    want = [int(math.floor(x * 1e4 + 0.5)) for x in
            (nll_ab, nll_ab, nll_ac, 0.0)]
    assert got["nll_e4"].tolist() == want
    assert got["n_bigrams"].tolist() == [1, 1, 1, 0]


def test_bigram_lm_partition_invariant(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.datawork import bigram_lm_scores

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    a = (bigram_lm_scores(ds).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (bigram_lm_scores(ds.repartition(7)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a["n_bigrams"].tolist() == b["n_bigrams"].tolist()
    assert a["nll_e4"].tolist() == b["nll_e4"].tolist()


def test_edit_distance_join_complete_vs_bruteforce(ray_session):
    """Deletion-neighborhood candidate generation is COMPLETE for
    d<=1: result must equal the brute-force all-pairs filter exactly
    (ids, names and distances) on a mixed fixture with substitutions,
    inserts, deletes, equal strings and non-matches."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import edit_distance_join

    names = ["abc", "abd", "ab", "abcd", "xyz", "abc", "b", ""]
    df = pd.DataFrame({"id": range(len(names)), "name": names})
    got = (edit_distance_join(rd.from_pandas(df).repartition(3),
                              "id", "name").to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))

    def lev(a, b):
        import numpy as _np
        dp = _np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev = dp.copy()
            dp[0] = i
            for j, cb in enumerate(b, 1):
                dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                            prev[j - 1] + (ca != cb))
        return dp[len(b)]

    want = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            d = lev(names[i], names[j])
            if d <= 1:
                want.append([i, j, names[i], names[j], d])
    assert got.values.tolist() == want
    # sanity: the fixture hits every edit type
    assert len(want) >= 4


def test_edit_distance_join_d2_bruteforce(ray_session):
    """max_dist=2 (chained deletions): every pair within Levenshtein
    distance 2 must be found — fixture covers double-substitution,
    substitution+insert, double-delete, transposed-ish pairs, and
    far-apart strings that must NOT match."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import edit_distance_join

    names = ["martha", "martba", "marhta", "mart", "marthaxy",
             "m", "xy", "", "zzzzz", "martha", "abcdef", "abXdYf"]
    df = pd.DataFrame({"id": range(len(names)), "name": names})
    got = (edit_distance_join(rd.from_pandas(df).repartition(4),
                              "id", "name", max_dist=2).to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))

    def lev(a, b):
        dp = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev = dp.copy()
            dp[0] = i
            for j, cb in enumerate(b, 1):
                dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                            prev[j - 1] + (ca != cb))
        return dp[len(b)]

    want = [[i, j, names[i], names[j], lev(names[i], names[j])]
            for i in range(len(names)) for j in range(i + 1, len(names))
            if lev(names[i], names[j]) <= 2]
    assert got.values.tolist() == want
    assert any(w[4] == 2 for w in want)   # d=2 pairs actually exercised


def test_tfidf_cosine_join_hand_example(ray_session):
    """3 docs over a 3-term vocab with hand-computable tf-idf: the
    identical pair scores cos=1; the disjoint-content pair falls below
    threshold. idf(common-term)=0 so it cannot contribute."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import tfidf_cosine_join

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["cat cat shared", "cat cat shared", "dog shared"],
    })
    got = (tfidf_cosine_join(rd.from_pandas(df), threshold=0.5)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    # 'shared' has df=3 -> idf=0; docs 1,2 identical on 'cat' -> cos 1
    # doc 3 only has 'dog' weight -> orthogonal to 1,2
    assert got[["id_a", "id_b"]].values.tolist() == [[1, 2]]
    assert got["cos_e6"].tolist() == [1_000_000]


def test_tfidf_cosine_join_partition_invariant(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.datawork import tfidf_cosine_join

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    a = (tfidf_cosine_join(ds, threshold=0.9).to_pandas()
         .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    b = (tfidf_cosine_join(ds.repartition(7), threshold=0.9).to_pandas()
         .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert len(a) > 0
    assert a[["id_a", "id_b"]].values.tolist() == \
        b[["id_a", "id_b"]].values.tolist()
    assert (np.abs(a["cos_e6"] - b["cos_e6"]) <= 1).all()


def test_tfidf_cosine_join_sparse_path_bruteforce(ray_session):
    """Vocab > 4096 forces the prefix-filter (All-Pairs) path — the sf
    corpora's 31-term vocab always takes the dense-matmul branch, so
    this is the sparse path's correctness gate: planted dup / near-dup
    pairs over a 5k-term vocab must match a brute-force dense cosine
    over the same tf-idf math exactly (e6-rounded)."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import tfidf_cosine_join

    rng = np.random.default_rng(7)
    vocab = np.array([f"t{i:05d}" for i in range(5000)], object)
    docs = [" ".join(vocab[rng.integers(0, 5000,
                                        size=rng.integers(20, 60))])
            for _ in range(60)]
    docs.append(docs[0])                       # exact dup pair
    docs.append(docs[1] + " t04999 t04998")    # near dup pair
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})

    got = (tfidf_cosine_join(rd.from_pandas(df).repartition(5),
                             threshold=0.4)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))

    # brute force: same tokenizer/tf-idf/threshold, dense all-pairs
    toks = [d.split() for d in docs]
    terms = sorted({t for d in toks for t in d})
    tix = {t: i for i, t in enumerate(terms)}
    m = np.zeros((len(docs), len(terms)))
    for r, d in enumerate(toks):
        for t in d:
            m[r, tix[t]] += 1
    dfv = (m > 0).sum(0)
    m *= np.log(len(docs) / dfv)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
    s = m @ m.T
    want = [[i, j, int(np.floor(s[i, j] * 1e6 + 0.5))]
            for i in range(len(docs)) for j in range(i + 1, len(docs))
            if s[i, j] >= 0.4]
    assert [[int(a), int(b)] for a, b, _ in want] == \
        got[["id_a", "id_b"]].values.tolist()
    assert (np.abs(got["cos_e6"].to_numpy()
                   - np.array([c for _, _, c in want])) <= 1).all()
    assert len(want) >= 2    # both planted pairs found


def test_incremental_dedup_planted(ray_session):
    """Planted fates: a delta doc duplicating a BASE doc points at the
    base id; a delta-internal dup points at the smaller delta id; a
    fresh delta doc is new; a delta doc that is the SMALLEST id of its
    text group stays the keeper even with a larger base duplicate."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import incremental_dedup

    base = pd.DataFrame({"doc_id": [1, 2, 9],
                         "text": ["alpha", "beta", "omega"]})
    delta = pd.DataFrame({"doc_id": [5, 6, 7, 8, 3],
                          "text": ["alpha", "gamma", "gamma",
                                   "fresh", "omega"]})
    got = (incremental_dedup(rd.from_pandas(base),
                             rd.from_pandas(delta)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = {3: (-1, 1),    # smaller than base 'omega' 9 -> keeper
            5: (1, 0),     # dup of base 1
            6: (-1, 1),    # first 'gamma' in delta
            7: (6, 0),     # delta-internal dup
            8: (-1, 1)}    # fresh
    assert {r.doc_id: (r.dup_of, r.is_new)
            for r in got.itertuples()} == want


def test_incremental_dedup_no_overlap(ray_session):
    """Empty base_min (no delta text in base) exercises the
    schema-less-join guard path."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import incremental_dedup

    base = pd.DataFrame({"doc_id": [1], "text": ["aaa"]})
    delta = pd.DataFrame({"doc_id": [2, 3], "text": ["bbb", "ccc"]})
    got = incremental_dedup(rd.from_pandas(base),
                            rd.from_pandas(delta)).to_pandas()
    assert got["is_new"].tolist() == [1, 1]
    assert got["dup_of"].tolist() == [-1, -1]


def test_logodds_direction_and_symmetry(ray_session):
    """A term overrepresented in A gets z > 0; swapping the groups
    flips the sign exactly."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import logodds_terms

    df = pd.DataFrame({
        "g": ["a"] * 6 + ["b"] * 6,
        "text": ["cat common"] * 5 + ["dog common"]
        + ["dog common"] * 5 + ["cat common"],
    })
    ab = (logodds_terms(rd.from_pandas(df), "g", "text", "a", "b",
                        min_count=1).to_pandas().set_index("term"))
    assert ab.loc["cat", "z_e4"] > 0
    assert ab.loc["dog", "z_e4"] < 0
    assert abs(ab.loc["common", "z_e4"]) < abs(ab.loc["cat", "z_e4"])
    ba = (logodds_terms(rd.from_pandas(df), "g", "text", "b", "a",
                        min_count=1).to_pandas().set_index("term"))
    assert ba.loc["cat", "z_e4"] == -ab.loc["cat", "z_e4"]


def test_hll_set_ops_accuracy(ray_session):
    """Planted overlap: |A|=600, |B|=500, |A∩B|=100 — estimates must
    land within the compounded sketch error of the exact values (the
    exact columns in the same row make the check self-contained)."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import hll_set_ops

    a = rd.from_items([{"v": f"x{i}"} for i in range(600)])
    b = rd.from_items([{"v": f"x{i}"} for i in range(500, 1000)])
    t = hll_set_ops(a, b, "v", hash_mode="fast").to_pylist()[0]
    assert t["exact_a"] == 600 and t["exact_b"] == 500
    assert t["exact_union"] == 1000 and t["exact_intersect"] == 100
    assert abs(t["est_a"] - 600) / 600 < 0.05
    assert abs(t["est_union"] - 1000) / 1000 < 0.05
    # intersection error compounds through inclusion-exclusion: allow
    # the union+both-sides error budget (3 sketches x ~1.6% x scale)
    assert abs(t["est_intersect"] - 100) < 100


def test_corr_matrix_matches_numpy(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.datawork import corr_matrix

    rng = np.random.RandomState(5)
    x = rng.standard_normal(800)
    df = pd.DataFrame({
        "a": x, "b": 2 * x + 0.1 * rng.standard_normal(800),
        "c": rng.standard_normal(800),
    })
    got = (corr_matrix(rd.from_pandas(df).repartition(5),
                       ["a", "b", "c"]).to_pandas()
           .set_index(["col_a", "col_b"])["corr_e6"])
    want = np.corrcoef(df.values.T)
    assert abs(got[("a", "b")] - int(np.floor(
        want[0, 1] * 1e6 + 0.5))) <= 1
    assert abs(got[("a", "c")] - int(np.floor(
        want[0, 2] * 1e6 + 0.5))) <= 1
    assert got[("a", "b")] > 990_000       # strongly correlated pair
    assert abs(got[("a", "c")]) < 100_000  # independent pair


def test_leakage_safe_split_groups_stay_together(ray_session):
    """Planted exact-duplicate groups must land in ONE split each; the
    split draw is the keyed hash of the group's min id."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import leakage_safe_split

    rng = np.random.default_rng(3)
    texts = [f"unique doc {i} {rng.integers(1e9)}" for i in range(200)]
    # plant 20 dup groups of 3 (ids spread apart)
    for g in range(20):
        texts[g + 50] = texts[g]
        texts[g + 120] = texts[g]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (leakage_safe_split(rd.from_pandas(df).repartition(5))
           .to_pandas())
    assert len(got) == len(texts)
    m = got.merge(df, on="doc_id")
    per_text = m.groupby("text")["split"].nunique()
    assert (per_text == 1).all()          # no group straddles splits
    assert set(got["split"]) <= {"train", "val", "test"}
    assert (got["split"] == "train").mean() > 0.5   # ratios roughly hold
    # rep_id is the min doc id of the group
    rep = m.groupby("text")["doc_id"].min().rename("want_rep")
    chk = m.merge(rep, on="text")
    assert (chk["rep_id"] == chk["want_rep"]).all()


def test_token_budget_chunks_hand_case(ray_session):
    """Known token counts + budget 10: chunk boundaries are exactly
    floor(tokens_before / budget), invariant to partitioning."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import token_budget_chunks

    ntoks = [4, 7, 3, 10, 1, 9, 2, 8]          # cumsum-before: 0 4 11 14 24 25 34 36
    texts = [" ".join(["w"] * n) for n in ntoks]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    want_chunks = [0, 0, 1, 1, 2, 2, 3, 3]
    for parts in (1, 3):
        got = (token_budget_chunks(rd.from_pandas(df).repartition(parts),
                                   budget=10, n_buckets=4)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got["ntok"].tolist() == ntoks
        assert got["chunk_id"].tolist() == want_chunks


def test_mix_sources_hand_interleave(ray_session):
    """Weight 2:1 interleave of A(4 docs) and B(2 docs): virtual times
    A=.25,.75,1.25,1.75 / B=.5,1.5 give the exact merge order
    A1 B1 A2 A3 B2 A4."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import mix_sources

    df = pd.DataFrame({
        "doc_id": [10, 11, 12, 13, 20, 21],
        "src": ["A", "A", "A", "A", "B", "B"],
    })
    got = (mix_sources(rd.from_pandas(df).repartition(3), "doc_id",
                       "src", weights={"A": 2.0, "B": 1.0})
           .to_pandas().sort_values("mix_rank"))
    assert got["doc_id"].tolist() == [10, 20, 11, 12, 21, 13]
    assert got["mix_rank"].tolist() == [1, 2, 3, 4, 5, 6]


def test_distinct_ngram_ratio_hand_case(ray_session):
    """Hand-computable distinct-n: corpus of 2 docs, known unigram /
    bigram / trigram multisets."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import distinct_ngram_ratio

    df = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["a b a b", "a b c"],
    })
    got = (distinct_ngram_ratio(rd.from_pandas(df).repartition(2))
           .to_pandas().sort_values("n").reset_index(drop=True))
    # unigrams: a b a b | a b c -> total 7, distinct {a,b,c}=3
    # bigrams: "a b","b a","a b" | "a b","b c" -> total 5, distinct 3
    # trigrams: "a b a","b a b" | "a b c" -> total 3, distinct 3
    assert got["total_ngrams"].tolist() == [7, 5, 3]
    assert got["distinct_ngrams"].tolist() == [3, 3, 3]
    assert got["ratio_e6"].tolist() == [
        int(np.floor(3 / 7 * 1e6 + 0.5)),
        int(np.floor(3 / 5 * 1e6 + 0.5)), 1_000_000]


def test_near_dup_clusters_planted(ray_session):
    """Planted near-dup chains cluster transitively to the min doc id;
    docs with no near-dup partner label themselves."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import near_dup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = {
        0: base,                         # chain 0-1-2 (transitive)
        1: base + " extra",
        2: base + " extra more",
        3: "totally different words here nothing shared at all okay",
        4: base,                         # exact dup of 0
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = (near_dup_clusters(rd.from_pandas(df).repartition(3),
                             threshold=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["cluster_id"].tolist() == [0, 0, 0, 3, 0]


def test_resample_audio_physical(ray_session):
    """Linear-interpolation WAV resample: frame count scales by the
    rate ratio, a pure tone's RMS survives resampling (physical
    check), and np.interp exactness holds on a ramp signal; non-16-bit
    payloads raise."""
    import io
    import wave

    import ray.data as rd

    from wned_ray.pipelines.datawork import AudioResampler, resample_audio

    def wav(pcm, sr, nch=1):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.astype(np.int16).tobytes())
        return buf.getvalue()

    sr = 4000
    t = np.arange(sr) / sr
    tone = (np.sin(2 * np.pi * 440 * t) * 16000)
    ramp = np.linspace(-16000, 16000, 100)
    ds = rd.from_arrow(__import__("pyarrow").table({
        "media_id": [1, 2],
        "payload": [wav(tone, sr), wav(ramp, 100)],
    }))
    got = (resample_audio(ds, target_rate=8000).to_pandas()
           .sort_values("media_id").reset_index(drop=True))
    # both payloads are 1 s of audio -> 8000 frames at the target rate
    assert got["n_frames"].tolist() == [2 * sr, 8000]
    with wave.open(io.BytesIO(got["payload"][0]), "rb") as r:
        assert r.getframerate() == 8000
        x = np.frombuffer(r.readframes(r.getnframes()),
                          np.int16).astype(np.float64)
    # tone RMS survives within linear-interp attenuation (~3% at 9
    # samples/cycle: midpoints under-shoot the sine's curvature)
    rms0 = np.sqrt((tone ** 2).mean())
    assert abs(np.sqrt((x ** 2).mean()) - rms0) < 0.05 * rms0
    # ramp: linear interpolation reproduces the line exactly (+-1 lsb)
    with wave.open(io.BytesIO(got["payload"][1]), "rb") as r:
        y = np.frombuffer(r.readframes(r.getnframes()),
                          np.int16).astype(np.float64)
    want = np.interp(np.arange(8000) * (100 / 8000),
                     np.arange(100), ramp)
    assert np.abs(y - np.rint(want)).max() <= 1
    # honest raise on unsupported width
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(100)
        w.writeframes(b"\x00" * 50)
    with pytest.raises(Exception):
        AudioResampler().resample_payload(buf.getvalue())


def test_edit_distance_join_null_names_and_string_ids(ray_session):
    """Regression (code review): a null name must not kill the join
    (stringifies like str(None) did), and the empty-result schema must
    carry the INPUT id type."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import edit_distance_join

    df = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "name": ["abc", None, "abd", "None"],
    })
    got = (edit_distance_join(rd.from_pandas(df), "id", "name")
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    # null stringifies to "None": ids 2 and 4 are an exact pair (d=0)
    assert [2, 4] in got[["id_a", "id_b"]].values.tolist()
    assert [1, 3] in got[["id_a", "id_b"]].values.tolist()
    # no-match corpus with STRING ids: empty result whose Dataset
    # schema carries the input id type (to_pandas drops columns on
    # 0-row datasets — a Ray quirk — so assert on the schema)
    df2 = pd.DataFrame({"id": ["x", "y"], "name": ["aaaa", "zzzz"]})
    out2 = edit_distance_join(rd.from_pandas(df2), "id", "name")
    assert out2.count() == 0
    sch = out2.schema()
    assert sorted(sch.names) == ["dist", "id_a", "id_b",
                                 "name_a", "name_b"]
    import pyarrow as pa_
    assert sch.types[sch.names.index("id_a")] == pa_.string()


def test_tfidf_cosine_dense_path_string_ids(ray_session):
    """Regression (code review): the dense small-vocab path must accept
    NON-integer doc ids (they ride as a list cell, not an int64 blob)."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import tfidf_cosine_join

    df = pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "text": ["cat cat shared", "cat cat shared", "dog shared"],
    })
    got = (tfidf_cosine_join(rd.from_pandas(df), threshold=0.5)
           .to_pandas())
    assert got[["id_a", "id_b"]].values.tolist() == [["a", "b"]]
    assert got["cos_e6"].tolist() == [1_000_000]


def test_dedup_keep_planted(ray_session):
    """Dedup policy: exactly the min-id representative of every
    near-dup cluster survives; singletons survive untouched."""
    import ray.data as rd

    from wned_ray.pipelines.datawork import dedup_keep

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = {0: base, 1: base + " extra", 2: base + " extra more",
            3: "totally different words here nothing shared at all okay",
            4: base}
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = (dedup_keep(rd.from_pandas(df).repartition(3), threshold=0.5)
           .to_pandas().sort_values("doc_id"))
    assert got["doc_id"].tolist() == [0, 3]
    assert got["text"].tolist() == [docs[0], docs[3]]
