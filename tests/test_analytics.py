"""Unit tests for wned_ray.pipelines.analytics (relational batch 2 +
k-means). The SQL-twinned operators are also swept end-to-end by
scripts/check_all.py; these tests pin the kernel semantics on small
constructed inputs where ties and edge cases are explicit."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_broadcast_cross_join(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import broadcast_cross_join

    ds = rd.from_pandas(pd.DataFrame({"a": [1, 2, 3]}))
    small = pa.table({"b": ["x", "y"]})
    got = (broadcast_cross_join(ds, small).to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    assert len(got) == 6
    assert got["a"].tolist() == [1, 1, 2, 2, 3, 3]
    assert got["b"].tolist() == ["x", "y"] * 3


def test_string_agg_by_key_distinct_and_sorted(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import string_agg_by_key

    df = pd.DataFrame({"k": ["a", "a", "a", "b", "b"],
                       "v": ["z", "m", "z", "q", "q"]})   # dups collapse
    got = (string_agg_by_key(rd.from_pandas(df), "k", "v", sep="|",
                             out_col="vals")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["vals"].tolist() == ["m|z", "q"]
    assert got["n_vals"].tolist() == [2, 1]


def test_histogram_fixed_clamps_and_zero_buckets(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import histogram_fixed

    # -5 clamps into bucket 0; 99 and 1e9 clamp into the top bucket;
    # bucket 2 stays empty but must still be emitted with n=0
    df = pd.DataFrame({"x": [-5.0, 0.0, 9.9, 10.0, 35.0, 99.0, 1e9]})
    got = (histogram_fixed(rd.from_pandas(df), "x", lo=0.0, hi=40.0,
                           nbins=4).to_pandas()
           .sort_values("bucket").reset_index(drop=True))
    assert got["bucket"].tolist() == [0, 1, 2, 3]
    assert got["n"].tolist() == [3, 1, 0, 3]
    assert got["lo_e2"].tolist() == [0, 1000, 2000, 3000]
    assert got["hi_e2"].tolist() == [1000, 2000, 3000, 4000]


def test_explode_matches_positions(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import explode_matches

    df = pd.DataFrame({"id": [1, 2, 3],
                       "t": ["aa bb aa", "cc", "no match here x"]})
    got = (explode_matches(rd.from_pandas(df), "id", "t", r"[a-c]{2}",
                           out_col="m")
           .to_pandas().sort_values(["id", "pos"]).reset_index(drop=True))
    assert got[["id", "m", "pos"]].values.tolist() == [
        [1, "aa", 1], [1, "bb", 2], [1, "aa", 3], [2, "cc", 1]]


def test_grouping_sets_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from wned_ray.pipelines.datawork import grouping_sets_aggregate

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 500),
        "b": rng.integers(0, 5, 500),
        "value": rng.normal(size=500).round(2),
    })
    # neither a rollup nor a cube: includes (b) but not (a)
    out = grouping_sets_aggregate(
        rd.from_pandas(df), keys=["a", "b"],
        sets=[("a", "b"), ("b",), ()]).to_pandas()
    out["sum_value"] = out["sum_value"].round(4)
    out = (out.sort_values(["a", "b"], na_position="first")
           .reset_index(drop=True))
    want = duckdb.connect().execute(
        "SELECT a, b, count(*) AS n_events, round(sum(value), 4) AS "
        "sum_value FROM df GROUP BY GROUPING SETS ((a, b), (b), ()) "
        "ORDER BY a NULLS FIRST, b NULLS FIRST").fetch_df()
    assert len(out) == len(want)
    assert out["n_events"].tolist() == want["n_events"].tolist()
    assert np.allclose(out["sum_value"], want["sum_value"])
    assert (out["a"].isna() == want["a"].isna()).all()
    assert (out["b"].isna() == want["b"].isna()).all()

    with pytest.raises(ValueError):
        grouping_sets_aggregate(rd.from_pandas(df), keys=["a"],
                                sets=[("nope",)])


def test_golden_records_tie_breaks(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import golden_records

    # one head-key group: ids 10/11/12 share the first 4 tokens.
    # longest text ties between 11 and 12 -> min id 11 wins;
    # lang mode ties de/en 1:1... make it 2:1; source ties s1/s2 -> s1
    df = pd.DataFrame({
        "doc_id": np.array([12, 10, 11, 99], np.int64),
        "text": ["alpha beta gamma delta XX", "alpha beta gamma delta",
                 "alpha beta gamma delta YY", "other words entirely here"],
        "lang": ["en", "en", "de", "fr"],
        "source": ["s2", "s1", "s1", "s9"],
    })
    got = (golden_records(rd.from_pandas(df)).to_pandas()
           .sort_values("keep_id").reset_index(drop=True))
    assert len(got) == 2
    g = got.iloc[0]
    assert g["keep_id"] == 10 and g["n_members"] == 3
    assert g["rep_id"] == 11                    # longest-text tie: min id
    assert g["lang_mode"] == "en"               # 2:1 majority
    assert g["source_mode"] == "s1"             # 2:1 majority
    assert got.iloc[1]["keep_id"] == 99


def _ref_kmeans(ids, X, k, n_iter, seed):
    """Single-process reference Lloyd's with the SAME seeded-md5 init."""
    import hashlib

    h = np.array([int.from_bytes(
        hashlib.md5(f"{seed}:{v}".encode()).digest()[:8], "big")
        for v in ids], np.uint64) >> np.uint64(1)
    cent = X[np.argsort(h.astype(np.int64))[:k]].astype(np.float64).copy()
    for _ in range(n_iter):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(k):
            if (a == c).any():
                cent[c] = X[a == c].mean(axis=0)
    d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), cent


def test_kmeans_matches_reference(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import kmeans

    rng = np.random.default_rng(11)
    k, dim, n = 4, 8, 400
    # well-separated blobs so no point sits on a boundary
    centers = rng.normal(scale=10.0, size=(k, dim))
    X = (centers[rng.integers(0, k, n)]
         + rng.normal(scale=0.5, size=(n, dim))).astype(np.float64)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(X), pa.list_(pa.float64())),
    })
    assign_ds, cent = kmeans(rd.from_arrow(tbl).repartition(5),
                             id_col="vec_id", vec_col="embedding",
                             k=k, n_iter=4, seed=3)
    got = (assign_ds.to_pandas().sort_values("vec_id")
           .reset_index(drop=True))
    ref_a, ref_c = _ref_kmeans(ids, X, k, 4, 3)
    assert np.allclose(cent, ref_c, atol=1e-8)
    assert got["cluster"].to_numpy().tolist() == ref_a.tolist()
    # dist column is the euclidean distance to the assigned centroid
    d0 = np.sqrt(((X[0] - cent[ref_a[0]]) ** 2).sum())
    assert abs(got["dist_e6"].iloc[0] - round(d0 * 1e6)) <= 1


def test_kmeans_deterministic_across_runs(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import kmeans

    rng = np.random.default_rng(2)
    X = rng.normal(size=(120, 6))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(120, dtype=np.int64)),
        "embedding": pa.array(list(X), pa.list_(pa.float64())),
    })
    runs = []
    for _ in range(2):
        a, c = kmeans(rd.from_arrow(tbl).repartition(3),
                      id_col="vec_id", vec_col="embedding",
                      k=3, n_iter=3, seed=9)
        runs.append((a.to_pandas().sort_values("vec_id")["cluster"]
                     .tolist(), c))
    assert runs[0][0] == runs[1][0]
    assert np.array_equal(runs[0][1], runs[1][1])


def test_funnel_strict_ordering(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import funnel_counts

    t0 = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    rows = []
    # u1 completes all 3 in order; u2 clicks BEFORE viewing (click must
    # not count, and the later purchase needs a post-view click -> depth
    # stops at 1); u3 views only; u4 has no funnel events at all
    for u, seq in [(1, [("view", 0), ("click", 1), ("purchase", 2)]),
                   (2, [("click", 0), ("view", 1), ("purchase", 2)]),
                   (3, [("view", 0)]),
                   (4, [("error", 0)])]:
        rows += [{"user_id": u, "event_type": e, "ts": t0 + i * h}
                 for e, i in seq]
    got = (funnel_counts(rd.from_pandas(pd.DataFrame(rows)),
                         steps=["view", "click", "purchase"])
           .to_pandas().sort_values("step").reset_index(drop=True))
    assert got["event_type"].tolist() == ["view", "click", "purchase"]
    assert got["n_users"].tolist() == [3, 1, 1]


def test_funnel_same_timestamp_not_after(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import funnel_counts

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame([
        {"user_id": 1, "event_type": "view", "ts": t0},
        {"user_id": 1, "event_type": "click", "ts": t0},   # ties: not after
    ])
    got = (funnel_counts(rd.from_pandas(df), steps=["view", "click"])
           .to_pandas().sort_values("step"))
    assert got["n_users"].tolist() == [1, 0]


def test_cohort_retention_week_offsets(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import cohort_retention

    # 2024-01-03 is a Wednesday -> cohort week starts Monday 2024-01-01.
    # u1: first event Wed, active again 6 days later (offset 0) and 7
    # days later (offset 1). u2: first event the NEXT Monday.
    df = pd.DataFrame([
        {"user_id": 1, "ts": pd.Timestamp("2024-01-03 10:00")},
        {"user_id": 1, "ts": pd.Timestamp("2024-01-09 09:00")},  # +6d
        {"user_id": 1, "ts": pd.Timestamp("2024-01-10 23:00")},  # +7d
        {"user_id": 2, "ts": pd.Timestamp("2024-01-08 00:00")},
    ])
    got = (cohort_retention(rd.from_pandas(df)).to_pandas()
           .sort_values(["cohort_week", "week_offset"])
           .reset_index(drop=True))
    assert got.values.tolist() == [
        ["2024-01-01", 0, 1], ["2024-01-01", 1, 1], ["2024-01-08", 0, 1]]


def test_event_paths_order_and_day_split(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import event_paths

    df = pd.DataFrame([
        # u1 day one: b then a (ts order, not insertion order)
        {"user_id": 1, "event_id": 2, "event_type": "a",
         "ts": pd.Timestamp("2024-01-01 02:00")},
        {"user_id": 1, "event_id": 1, "event_type": "b",
         "ts": pd.Timestamp("2024-01-01 01:00")},
        # u1 next day: its own path
        {"user_id": 1, "event_id": 3, "event_type": "a",
         "ts": pd.Timestamp("2024-01-02 01:00")},
        # u2 same day: same path as u1 day one -> count 2
        {"user_id": 2, "event_id": 4, "event_type": "b",
         "ts": pd.Timestamp("2024-01-01 01:00")},
        {"user_id": 2, "event_id": 5, "event_type": "a",
         "ts": pd.Timestamp("2024-01-01 02:00")},
        # tie timestamps -> event_id breaks the tie
        {"user_id": 3, "event_id": 7, "event_type": "y",
         "ts": pd.Timestamp("2024-01-01 01:00")},
        {"user_id": 3, "event_id": 6, "event_type": "x",
         "ts": pd.Timestamp("2024-01-01 01:00")},
    ])
    got = (event_paths(rd.from_pandas(df)).to_pandas()
           .sort_values("path").reset_index(drop=True))
    assert got.values.tolist() == [["a", 1], ["b>a", 2], ["x>y", 1]]


def test_transition_counts_matches_lag(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import transition_counts

    t0 = pd.Timestamp("2024-01-01")
    m = pd.Timedelta(minutes=1)
    df = pd.DataFrame([
        {"user_id": 1, "event_id": i, "event_type": t, "ts": t0 + i * m}
        for i, t in enumerate(["a", "b", "a", "b"])
    ] + [
        {"user_id": 2, "event_id": 10, "event_type": "a", "ts": t0},
        {"user_id": 2, "event_id": 11, "event_type": "a", "ts": t0 + m},
        {"user_id": 3, "event_id": 20, "event_type": "z", "ts": t0},  # lone
    ])
    got = (transition_counts(rd.from_pandas(df)).to_pandas()
           .sort_values(["prev_type", "next_type"]).reset_index(drop=True))
    # u1: a>b, b>a, a>b ; u2: a>a ; u3: none
    assert got.values.tolist() == [
        ["a", "a", 1], ["a", "b", 2], ["b", "a", 1]]


def test_unpivot_mixed_types(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import unpivot

    df = pd.DataFrame({"id": [1, 2],
                       "a": np.array([10, 20], np.int32),
                       "b": [0.5, 1.5]})
    got = (unpivot(rd.from_pandas(df), ["id"], ["a", "b"]).to_pandas()
           .sort_values(["id", "name"]).reset_index(drop=True))
    assert got.values.tolist() == [
        [1, "a", 10.0], [1, "b", 0.5], [2, "a", 20.0], [2, "b", 1.5]]
    assert got["value"].dtype == np.float64


def test_bcubed_hand_example(ray_session):
    """Bagga-Baldwin worked example: C1={a,b,c}, C2={d,e} vs gold
    G1={a,b}, G2={c,d}, G3={e} -> P=8/15, R=4/5, F1=0.64."""
    import ray.data as rd

    from wned_ray.stages.evaluate import bcubed_metrics

    clusters = rd.from_pandas(pd.DataFrame({
        "mention_id": ["a", "b", "c", "d", "e"],
        "cluster_id": [1, 1, 1, 2, 2]}))
    gold = rd.from_pandas(pd.DataFrame({
        "mention_id": ["a", "b", "c", "d", "e"],
        "entity_id": ["g1", "g1", "g2", "g2", "g3"]}))
    m = bcubed_metrics(clusters, gold)
    assert m["n_mentions"] == 5
    assert abs(m["bcubed_precision"] - 8 / 15) < 1e-12
    assert abs(m["bcubed_recall"] - 4 / 5) < 1e-12
    assert abs(m["bcubed_f1"] - 0.64) < 1e-12


def test_bcubed_perfect_clustering(ray_session):
    import ray.data as rd

    from wned_ray.stages.evaluate import bcubed_metrics

    df = pd.DataFrame({"mention_id": list("abcdef"),
                       "cluster_id": [1, 1, 2, 2, 3, 3]})
    gold = df.rename(columns={"cluster_id": "entity_id"})
    m = bcubed_metrics(rd.from_pandas(df), rd.from_pandas(gold))
    assert m["bcubed_f1"] == 1.0 and m["n_mentions"] == 6


def test_ari_hand_example(ray_session):
    """Hubert-Arabie worked example: pred [0,0,1,2] vs gold [0,0,1,1]
    -> ARI = 4/7 (the standard textbook/sklearn doc case)."""
    import ray.data as rd

    from wned_ray.stages.evaluate import adjusted_rand_index

    clusters = rd.from_pandas(pd.DataFrame({
        "mention_id": ["a", "b", "c", "d"],
        "cluster_id": [0, 0, 1, 2]}))
    gold = rd.from_pandas(pd.DataFrame({
        "mention_id": ["a", "b", "c", "d"],
        "entity_id": [0, 0, 1, 1]}))
    m = adjusted_rand_index(clusters, gold)
    assert m["n_mentions"] == 4
    assert abs(m["ari"] - 4 / 7) < 1e-12


def test_ari_perfect_and_uninformative(ray_session):
    """Perfect clustering -> 1.0; one-big-cluster prediction lands at
    the chance-corrected floor of exactly 0."""
    import ray.data as rd

    from wned_ray.stages.evaluate import adjusted_rand_index

    df = pd.DataFrame({"mention_id": list("abcdef"),
                       "cluster_id": [1, 1, 2, 2, 3, 3]})
    gold = df.rename(columns={"cluster_id": "entity_id"})
    m = adjusted_rand_index(rd.from_pandas(df), rd.from_pandas(gold))
    assert m["ari"] == 1.0

    blob = pd.DataFrame({"mention_id": ["a", "b", "c", "d"],
                         "cluster_id": [7, 7, 7, 7]})
    gold2 = pd.DataFrame({"mention_id": ["a", "b", "c", "d"],
                          "entity_id": [0, 0, 1, 1]})
    m2 = adjusted_rand_index(rd.from_pandas(blob), rd.from_pandas(gold2))
    assert abs(m2["ari"]) < 1e-12


def test_pr_curve_exact_vs_reference(ray_session):
    import ray.data as rd

    from wned_ray.stages.evaluate import pr_curve

    rng = np.random.default_rng(4)
    n, n_bins = 3000, 20
    ids = np.arange(n, dtype=np.int64)
    score = rng.uniform(0, 1, n)
    # matches skew high, negatives low — a realistic separable-ish sweep
    is_match = rng.uniform(0, 1, n) < np.clip(score, 0.05, 0.95)
    labels = pd.DataFrame({"id_a": ids, "id_b": ids + n,
                           "is_match": is_match})
    scores = pd.DataFrame({"id_a": ids, "id_b": ids + n, "score": score})
    got = pr_curve(rd.from_pandas(labels).repartition(4),
                   rd.from_pandas(scores).repartition(3), n_bins=n_bins)
    assert len(got) == n_bins
    # reference sweep at the same bin thresholds
    for i in [0, 5, 13, 19]:
        thr = i / n_bins
        pred = score >= thr
        # binning: a score lands in bin floor(s*n_bins); >= bin i means
        # s >= i/n_bins up to fp rounding of the bin assignment itself
        pred = (score * n_bins).astype(np.int64).clip(0, n_bins - 1) >= i
        tp = int((pred & is_match).sum())
        fp = int((pred & ~is_match).sum())
        row = got.iloc[i]
        assert row["tp"] == tp and row["fp"] == fp
        assert row["fn"] == int(is_match.sum()) - tp
        prec = tp / (tp + fp) if tp + fp else 1.0
        assert row["precision_e6"] == round(prec * 1e6)
    # recall is non-increasing as the threshold rises
    assert (np.diff(got["recall_e6"].to_numpy()) <= 0).all()


def test_json_field_agg(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import json_field_agg

    df = pd.DataFrame({
        "g": ["a", "a", "b", "b", "b"],
        "j": ['{"k": 3}', '{"k": -2}', '{"k": 10}',
              '{"other": 1}', '{"k": 5, "z": 0}'],
    })
    got = (json_field_agg(rd.from_pandas(df), "j", "k", "g",
                          out_n="n", out_sum="s")
           .to_pandas().sort_values("g").reset_index(drop=True))
    # missing key rows excluded from n, contribute 0 to sum
    assert got["n"].tolist() == [2, 2]
    assert got["s"].tolist() == [1.0, 15.0]


def test_profile_columns(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import profile_columns

    df = pd.DataFrame({"x": [1.0, None, 3.0, 2.0],
                       "y": [10.0, 20.0, 30.0, 40.0]})
    got = (profile_columns(rd.from_pandas(df), ["x", "y"])
           .to_pandas().set_index("column"))
    assert got.loc["x", "n"] == 4 and got.loc["x", "nulls"] == 1
    assert got.loc["x", "min_v"] == 1.0 and got.loc["x", "max_v"] == 3.0
    assert got.loc["x", "sum_e4"] == 60000           # 6.0 * 1e4
    assert got.loc["y", "nulls"] == 0
    assert got.loc["y", "sum_e4"] == 1000000


def test_term_entropy(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import term_entropy

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b a b",          # p=.5/.5 -> H=1
                 "x x x x",          # single term -> H=0
                 ""],                # empty -> H=0
    })
    got = (term_entropy(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["entropy_e4"].tolist() == [10000, 0, 0]


def test_vocab_jaccard(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import vocab_jaccard

    df = pd.DataFrame({
        "source": ["s1", "s1", "s2", "s3"],
        "text": ["a b c", "c d", "b c e", "zz"],
    })
    # vocab: s1={a,b,c,d}, s2={b,c,e}, s3={zz}
    got = (vocab_jaccard(rd.from_pandas(df)).to_pandas()
           .sort_values(["key_a", "key_b"]).reset_index(drop=True))
    # only s1-s2 share terms; s3 absent (inner-join semantics)
    assert got[["key_a", "key_b"]].values.tolist() == [["s1", "s2"]]
    assert got["inter"].tolist() == [2]               # {b, c}
    assert got["union_sz"].tolist() == [5]            # {a,b,c,d,e}
    assert got["jaccard_e6"].tolist() == [400000]     # 2/5


def test_set_op_users(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import set_op_users

    df = pd.DataFrame({
        "user_id": [1, 1, 2, 3, 3, 4],
        "event_type": ["click", "purchase", "click",
                       "purchase", "view", "view"],
    })
    got = (set_op_users(rd.from_pandas(df)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    # 1 clicked+purchased, 2 clicked only; 3 purchase-only and 4
    # view-only are excluded (EXCEPT anchors on the left set)
    assert got["user_id"].tolist() == [1, 2]
    assert got["setop"].tolist() == ["both", "left_only"]


def test_merge_upsert(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import merge_upsert

    base = rd.from_pandas(pd.DataFrame({
        "k": [1, 2, 3], "v": ["a", "b", "c"]}))
    delta = rd.from_pandas(pd.DataFrame({
        "k": [2, 3], "v": ["B2", "C2"]}))
    got = (merge_upsert(base, delta, "k", ["v"]).to_pandas()
           .sort_values("k").reset_index(drop=True))
    # delta overrides 2 and 3; 1 passes through; no key duplication
    assert got["k"].tolist() == [1, 2, 3]
    assert got["v"].tolist() == ["a", "B2", "C2"]


def test_global_rank_exact(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import global_rank

    rng = np.random.default_rng(7)
    n = 5000
    vals = np.round(rng.normal(size=n) * 50, 3)   # heavy value ties
    ids = rng.permutation(n).astype(np.int64)
    df = pd.DataFrame({"id": ids, "v": vals})
    got = (global_rank(rd.from_pandas(df), "v", "id", n_buckets=8,
                       sample_mod=13).to_pandas()
           .sort_values("id").reset_index(drop=True))
    want = df.sort_values(["v", "id"]).reset_index()
    want_rank = pd.Series(np.arange(1, n + 1, dtype=np.int64),
                          index=want["id"].to_numpy()).sort_index()
    assert got["rnk"].to_numpy().tolist() == want_rank.to_numpy().tolist()


def test_global_rank_empty_sample(ray_session):
    """sample_mod larger than every id -> empty boundary sample -> one
    bucket; rank must still be exact."""
    import ray.data as rd

    from wned_ray.pipelines.analytics import global_rank

    df = pd.DataFrame({"id": [11, 12, 13], "v": [3.0, 1.0, 2.0]})
    got = (global_rank(rd.from_pandas(df), "v", "id",
                       sample_mod=10 ** 9).to_pandas()
           .sort_values("id").reset_index(drop=True))
    assert got["rnk"].tolist() == [3, 1, 2]


def test_pagerank_vs_dense(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import pagerank

    rng = np.random.default_rng(11)
    n, m = 60, 400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()

    got = (pagerank(rd.from_pandas(edges), alpha=0.85, n_iter=6)
           .to_pandas().sort_values("node").reset_index(drop=True))

    # dense reference with the identical recurrence (dangling mass
    # folded back uniformly)
    nodes = np.unique(np.concatenate([edges["src"], edges["dst"]]))
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    A = np.zeros((N, N))
    for s, d in edges.itertuples(index=False):
        A[idx[s], idx[d]] = 1.0
    deg = A.sum(axis=1)
    r = np.full(N, 1.0 / N)
    for _ in range(6):
        dang = r[deg == 0].sum()
        inflow = (r[deg > 0] / deg[deg > 0]) @ A[deg > 0]
        r = (1 - 0.85) / N + 0.85 * (inflow + dang / N)
    want = np.floor(r * 1e9 + 0.5).astype(np.int64)

    assert got["node"].tolist() == nodes.tolist()
    assert np.abs(got["rank_e9"].to_numpy() - want).max() <= 2
    assert abs(got["rank_e9"].sum() / 1e9 - 1.0) < 1e-6


def test_time_decay_agg_hand_example(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import time_decay_agg

    # t_ref = the max ts; ages 0 s and exactly one half-life
    df = pd.DataFrame({
        "k": ["a", "a", "b"],
        "ts": pd.to_datetime(["2024-01-02 00:00:00",
                              "2024-01-01 00:00:00",
                              "2024-01-02 00:00:00"]),
        "v": [10.0, 8.0, 4.0],
    })
    got = (time_decay_agg(rd.from_pandas(df), "k", "ts", "v",
                          half_life_s=86400.0)
           .to_pandas().sort_values("k").reset_index(drop=True))
    # a: 10*2^0 + 8*2^-1 = 14.0 ; b: 4*2^0 = 4.0
    assert got["decayed_e6"].tolist() == [14_000_000, 4_000_000]
    assert got["n"].tolist() == [2, 1]


def test_zscore_outliers_planted(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import zscore_outliers

    vals = [10.0] * 20 + [11.0] * 20 + [1000.0]   # one wild point
    df = pd.DataFrame({"id": range(len(vals)),
                       "g": ["x"] * len(vals), "v": vals})
    got = zscore_outliers(rd.from_pandas(df), "g", "v", "id",
                          z_thresh=3.0).to_pandas()
    assert got["id"].tolist() == [40]
    assert got["z_e4"].iloc[0] > 3_0000  # z far above threshold
    # constant group: sd == 0 -> no outliers, no div-by-zero
    df2 = pd.DataFrame({"id": [1, 2], "g": ["c", "c"], "v": [5.0, 5.0]})
    assert zscore_outliers(rd.from_pandas(df2), "g", "v", "id",
                           3.0).count() == 0


def test_above_group_avg_hand_example(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import above_group_avg

    df = pd.DataFrame({"k": [1, 1, 1, 2, 2],
                       "id": [10, 11, 12, 20, 21],
                       "v": [100.0, 100.0, 400.0, 50.0, 60.0]})
    # group 1 avg=200 -> thr 260 -> only v=400; group 2 avg=55 ->
    # thr 71.5 -> none
    got = above_group_avg(rd.from_pandas(df), "k", "v", ["id"],
                          factor=1.3).to_pandas()
    assert got["id"].tolist() == [12]
    assert got["threshold_e2"].tolist() == [26_000]


def test_topn_per_group_ties_keeps_boundary_ties(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import topn_per_group_ties

    df = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 3,
        "id": [1, 2, 3, 4, 5, 6, 7],
        "v": [9.0, 7.0, 7.0, 1.0,    5.0, 5.0, 5.0],
    })
    got = (topn_per_group_ties(rd.from_pandas(df), "g", "v", "id", n=2)
           .to_pandas().sort_values(["g", "id"]).reset_index(drop=True))
    # a: 9 (rnk1) + BOTH 7s (rnk2, tie kept); b: all three tie at rnk1
    assert got[got.g == "a"]["id"].tolist() == [1, 2, 3]
    assert got[got.g == "a"]["rnk"].tolist() == [1, 2, 2]
    assert got[got.g == "b"]["id"].tolist() == [5, 6, 7]
    assert got[got.g == "b"]["rnk"].tolist() == [1, 1, 1]


def test_topn_per_group_ties_matches_bruteforce(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import topn_per_group_ties

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "g": rng.randint(0, 17, 600),
        "id": np.arange(600),
        # coarse grid so cross-batch ties actually occur
        "v": rng.randint(0, 9, 600).astype(np.float64),
    })
    got = (topn_per_group_ties(
        rd.from_pandas(df).repartition(7), "g", "v", "id", n=3)
        .to_pandas().sort_values(["g", "id"]).reset_index(drop=True))
    ref = df.copy()
    ref["rnk"] = (ref.groupby("g")["v"].rank(method="min",
                                             ascending=False)
                  .astype(np.int64))
    ref = (ref[ref.rnk <= 3].sort_values(["g", "id"])
           .reset_index(drop=True))
    assert got["id"].tolist() == ref["id"].tolist()
    assert got["rnk"].tolist() == ref["rnk"].tolist()


def test_gap_fill_daily_zero_rows(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import gap_fill_daily

    df = pd.DataFrame({
        "t": ["click", "click", "view"],
        "ts": pd.to_datetime(["2024-01-01 05:00", "2024-01-03 06:00",
                              "2024-01-01 07:00"]),
    })
    got = (gap_fill_daily(rd.from_pandas(df), "t", "ts").to_pandas()
           .sort_values(["t", "day"]).reset_index(drop=True))
    # 3 days x 2 types = 6 dense rows
    assert len(got) == 6
    click = got[got.t == "click"]
    assert click["cnt"].tolist() == [1, 0, 1]     # Jan 2 zero-filled
    view = got[got.t == "view"]
    assert view["cnt"].tolist() == [1, 0, 0]


def test_skyline_hand_example_with_ties(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import skyline

    # (price, size): frontier = {(1,5), (2,9)}; (1,5)-duplicate row 6
    # survives too (no STRICT dominator); (2,5) dominated by (1,5);
    # (3,9) dominated by (2,9); (2,2) dominated by everything cheap
    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5, 6],
        "price": [1.0, 2.0, 2.0, 3.0, 2.0, 1.0],
        "size": [5, 9, 5, 9, 2, 5],
    })
    got = (skyline(rd.from_pandas(df).repartition(3), "price", "size",
                   ["id"]).to_pandas().sort_values("id"))
    assert got["id"].tolist() == [1, 2, 6]


def test_skyline_matches_bruteforce(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import skyline

    rng = np.random.RandomState(11)
    df = pd.DataFrame({"id": np.arange(400),
                       "price": rng.randint(0, 40, 400).astype(float),
                       "size": rng.randint(0, 40, 400)})
    got = set(skyline(rd.from_pandas(df).repartition(5), "price",
                      "size", ["id"]).to_pandas()["id"])
    want = set()
    for _, r in df.iterrows():
        dom = ((df.price <= r.price) & (df["size"] >= r["size"]) &
               ((df.price < r.price) | (df["size"] > r["size"]))).any()
        if not dom:
            want.add(r.id)
    assert got == want


def test_pmi_hand_example(ray_session):
    import math

    import ray.data as rd

    from wned_ray.pipelines.analytics import pmi_pairs

    # 4 docs; (a,b) co-occur in 2, df(a)=3, df(b)=2 -> pmi=ln(4*2/6)
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b", "a b c", "a c", "d"],
    })
    got = (pmi_pairs(rd.from_pandas(df), min_pairs=2).to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    ab = got[(got.a == "a") & (got.b == "b")]
    assert ab["n_ab"].tolist() == [2]
    want = int(math.floor(math.log(4 * 2 / (3 * 2)) * 1e4 + 0.5))
    assert ab["pmi_e4"].tolist() == [want]
    # (a,c): n=2, df(c)=2 -> same value; (b,c): n=1 < min_pairs dropped
    assert not ((got.a == "b") & (got.b == "c")).any()


def test_connected_components_hand_and_ring(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import connected_components

    edges = rd.from_pandas(pd.DataFrame(
        {"src": [1, 2, 7, 9], "dst": [2, 3, 8, 9]}))
    got = (connected_components(edges).to_pandas()
           .sort_values("node").values.tolist())
    assert got == [[1, 1], [2, 1], [3, 1], [7, 7], [8, 7], [9, 9]]
    # a 30-node ring: single component, diameter 15 — exercises the
    # multi-round convergence path (label sum fixpoint)
    n = 30
    ring = pd.DataFrame({"src": np.arange(n),
                         "dst": (np.arange(n) + 1) % n})
    got = (connected_components(rd.from_pandas(ring)).to_pandas())
    assert sorted(got["node"]) == list(range(n))
    assert (got["component"] == 0).all()


def test_connected_components_matches_union_find(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import connected_components

    rng = np.random.RandomState(5)
    e = pd.DataFrame({"src": rng.randint(0, 200, 150),
                      "dst": rng.randint(0, 200, 150)})
    got = (connected_components(rd.from_pandas(e).repartition(5))
           .to_pandas())
    # reference union-find
    parent = list(range(201))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in e.values:
        parent[find(s)] = find(d)
    nodes = sorted(set(e.src) | set(e.dst))
    # min node id per root
    rep = {}
    for v in nodes:
        r = find(v)
        rep[r] = min(rep.get(r, v), v)
    want = {v: rep[find(v)] for v in nodes}
    assert dict(zip(got["node"], got["component"])) == want


def test_cumulative_new_users_hand_example(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import cumulative_new_users

    df = pd.DataFrame({
        "t": ["c", "c", "c", "c", "v"],
        "u": [1, 1, 2, 3, 1],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-02",
                              "2024-01-03", "2024-01-05"]),
    })
    got = (cumulative_new_users(rd.from_pandas(df), "t", "u", "ts")
           .to_pandas().sort_values(["t", "day"]).reset_index(drop=True))
    c = got[got.t == "c"]
    # user 1 new on d1; user 2 new on d2 (1's second day doesn't count);
    # user 3 new on d3 -> cum 1, 2, 3
    assert c["new_users"].tolist() == [1, 1, 1]
    assert c["cum_users"].tolist() == [1, 2, 3]
    v = got[got.t == "v"]
    assert v["cum_users"].tolist() == [1]


def test_embedding_centroids_hand_example(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import embedding_centroids

    df = pd.DataFrame({
        "label": [0, 0, 1],
        "embedding": [[1.0, 3.0], [3.0, 5.0], [2.0, 2.0]],
    })
    got = (embedding_centroids(rd.from_pandas(df).repartition(2))
           .to_pandas().sort_values(["label", "dim"])
           .reset_index(drop=True))
    # label 0: (2.0, 4.0); label 1: (2.0, 2.0); dim is 1-based
    assert got["dim"].tolist() == [1, 2, 1, 2]
    assert got["mean_e6"].tolist() == [2_000_000, 4_000_000,
                                       2_000_000, 2_000_000]


def test_equidepth_bins_balanced(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import equidepth_bins

    df = pd.DataFrame({"id": np.arange(103),
                       "v": np.arange(103).astype(float)[::-1]})
    got = (equidepth_bins(rd.from_pandas(df).repartition(4), "v", "id",
                          n_bins=10).to_pandas().sort_values("bin")
           .reset_index(drop=True))
    # ntile: first 3 bins get 11 rows, the rest 10
    assert got["n"].tolist() == [11, 11, 11] + [10] * 7
    # bins partition the value range in order
    assert (got["max_e2"].to_numpy()[:-1]
            < got["min_e2"].to_numpy()[1:]).all()


def test_rank_window_funcs_hand_example(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import rank_window_funcs

    df = pd.DataFrame({"k": ["a"] * 4 + ["b"],
                       "id": [1, 2, 3, 4, 5],
                       "v": [10.0, 20.0, 20.0, 30.0, 7.0]})
    got = (rank_window_funcs(rd.from_pandas(df), "k", "v", "id")
           .to_pandas().sort_values(["k", "id"]).reset_index(drop=True))
    a = got[got.k == "a"]
    # percent_rank: (rank-1)/(n-1): 0, 1/3, 1/3, 1 ; cume: .25 .75 .75 1
    assert a["pct_rank_e6"].tolist() == [0, 333333, 333333, 1000000]
    assert a["cume_dist_e6"].tolist() == [250000, 750000, 750000,
                                          1000000]
    b = got[got.k == "b"]
    # single-row partition: percent_rank 0 by spec, cume_dist 1
    assert b["pct_rank_e6"].tolist() == [0]
    assert b["cume_dist_e6"].tolist() == [1000000]


def test_association_rules_hand_example(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import association_rules

    # baskets: {A,B} x3, {A,C}, {B}; N=5 baskets
    df = pd.DataFrame({
        "b": [1, 1, 2, 2, 3, 3, 4, 4, 5],
        "i": ["A", "B", "A", "B", "A", "B", "A", "C", "B"],
    })
    got = (association_rules(rd.from_pandas(df), "b", "i",
                             min_support=3).to_pandas()
           .sort_values(["item_a", "item_b"]).reset_index(drop=True))
    # only (A,B)/(B,A) reach support 3; n_A=4, n_B=4, N=5
    assert got[["item_a", "item_b"]].values.tolist() == \
        [["A", "B"], ["B", "A"]]
    assert got["support"].tolist() == [3, 3]
    assert got["conf_e6"].tolist() == [750_000, 750_000]
    # lift = 5*3/(4*4) = 0.9375
    assert got["lift_e6"].tolist() == [937_500, 937_500]


def test_graph_clustering_hand_example(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import graph_clustering

    # triangle {1,2,3} + pendant edge 3-4 (input direction mixed)
    edges = rd.from_pandas(pd.DataFrame(
        {"src": [1, 2, 3, 3], "dst": [2, 3, 1, 4]}))
    got = sorted(map(tuple, graph_clustering(edges).to_pandas()
                     .values.tolist()))
    # node 3: deg 3, 1 tri -> cc = 2/(3*2) = 1/3; node 4 pendant
    assert got == [(1, 2, 1, 1_000_000), (2, 2, 1, 1_000_000),
                   (3, 3, 1, 333_333), (4, 1, 0, 0)]


def test_graph_clustering_triangle_free(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import graph_clustering

    # a path graph has zero triangles -> the empty-tri guard path
    edges = rd.from_pandas(pd.DataFrame(
        {"src": [1, 2, 3], "dst": [2, 3, 4]}))
    got = graph_clustering(edges).to_pandas()
    assert (got["triangles"] == 0).all()
    assert (got["clustering_e6"] == 0).all()
    assert len(got) == 4


def test_grouped_mode_tie_break(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import grouped_mode

    df = pd.DataFrame({"k": ["a"] * 4 + ["b"] * 2,
                       "v": ["x", "y", "y", "x", "q", "p"]})
    got = (grouped_mode(rd.from_pandas(df), "k", "v").to_pandas()
           .sort_values("k").reset_index(drop=True))
    # a: x and y tie at 2 -> smallest value 'x' wins; b: p/q tie -> p
    assert got["mode_val"].tolist() == ["x", "p"]
    assert got["n"].tolist() == [2, 1]


def test_kfold_assign_deterministic_and_balanced(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import kfold_assign

    df = pd.DataFrame({"id": np.arange(1000), "y": np.arange(1000) % 3})
    a = (kfold_assign(rd.from_pandas(df), "id", "y", k=5).to_pandas()
         .sort_values("id").reset_index(drop=True))
    b = (kfold_assign(rd.from_pandas(df).repartition(7), "id", "y",
                      k=5).to_pandas()
         .sort_values("id").reset_index(drop=True))
    assert a["fold"].tolist() == b["fold"].tolist()
    # balanced within ~20% of n/k
    counts = a["fold"].value_counts()
    assert len(counts) == 5
    assert counts.min() > 0.8 * 200 and counts.max() < 1.2 * 200
    # different seed -> different assignment
    c = kfold_assign(rd.from_pandas(df), "id", "y", k=5,
                     seed=99).to_pandas().sort_values("id")
    assert c["fold"].tolist() != a["fold"].tolist()


def test_term_chi2_separating_term_scores_highest(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import term_chi2_class

    # 'foo' appears only in class x docs, 'shared' everywhere
    df = pd.DataFrame({
        "cls": ["x"] * 6 + ["y"] * 6,
        "text": ["foo shared"] * 6 + ["bar shared"] * 6,
    })
    got = (term_chi2_class(rd.from_pandas(df), "cls", "text",
                           min_df=1).to_pandas().set_index("term"))
    # perfectly separating terms: chi2 == N == 12; shared term: 0
    assert got.loc["foo", "chi2_e4"] == 120_000
    assert got.loc["bar", "chi2_e4"] == 120_000
    assert got.loc["shared", "chi2_e4"] == 0
    assert got.loc["foo", "df"] == 6


def test_winsorized_mean_hand_example(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import winsorized_mean

    # one wild outlier must be clamped to the p90 bound
    vals = list(np.arange(1.0, 10.0)) + [1000.0]
    df = pd.DataFrame({"k": ["a"] * 10, "v": vals})
    got = winsorized_mean(rd.from_pandas(df), "k", "v",
                          lo=0.1, hi=0.9).to_pandas()
    ql, qh = np.quantile(np.array(vals), [0.1, 0.9])
    want = int(np.floor(np.clip(vals, ql, qh).mean() * 1e4 + 0.5))
    assert got["wmean_e4"].tolist() == [want]
    assert got["n"].tolist() == [10]


def test_dq_checks_planted_violations(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import dq_checks

    df = pd.DataFrame({
        "id": [1, 2, 2, 4],                      # one dup
        "x": [5.0, -1.0, 50.0, 200.0],           # one below range
        "s": ["a", "b", "zz", "a"],              # one off-domain
        "n": pd.array([1, None, 3, 4], dtype="Int64"),  # one null
    })
    got = (dq_checks(rd.from_pandas(df), "id", {
        "not_null": ["n"], "unique": ["id"],
        "range": {"x": (0.0, 100.0)}, "domain": {"s": ["a", "b"]}})
        .to_pandas().set_index("rule")["violations"])
    assert got["not_null:n"] == 1
    assert got["unique:id"] == 1
    assert got["range:x"] == 2          # -1 below, 200 above
    assert got["domain:s"] == 1


def test_time_weighted_avg_hand_example(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import time_weighted_avg

    # value 10 holds 1s, value 20 holds 3s -> twa = (10+60)/4 = 17.5
    df = pd.DataFrame({
        "k": ["u"] * 3 + ["single"],
        "ts": pd.to_datetime(["2024-01-01 00:00:00",
                              "2024-01-01 00:00:01",
                              "2024-01-01 00:00:04",
                              "2024-01-01 00:00:00"]),
        "v": [10.0, 20.0, 99.0, 5.0],
        "id": [1, 2, 3, 4],
    })
    got = time_weighted_avg(rd.from_pandas(df), "k", "ts", "v",
                            "id").to_pandas()
    # single-event key has zero span -> dropped
    assert got["k"].tolist() == ["u"]
    assert got["twa_e4"].tolist() == [175_000]


def test_pseudonymize_consistent_and_collision_free(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import pseudonymize

    df = pd.DataFrame({"id": np.arange(6), "user": [1, 2, 1, 3, 2, 1]})
    got = pseudonymize(rd.from_pandas(df), "user").to_pandas()
    # same input id -> same pseudo id; distinct ids stay distinct
    m = got.groupby(df["user"].values)["pseudo_id"].nunique()
    assert (m == 1).all()
    assert got["pseudo_id"].nunique() == 3
    assert "user" not in got.columns          # raw id removed
    # different key -> different mapping
    other = pseudonymize(rd.from_pandas(df), "user",
                         key=12345).to_pandas()
    assert got["pseudo_id"].tolist() != other["pseudo_id"].tolist()


def test_dp_counts_noise_properties(ray_session):
    import ray.data as rd

    from wned_ray.pipelines.analytics import dp_counts

    df = pd.DataFrame({"g": ["a"] * 100 + ["b"] * 50})
    a1 = (dp_counts(rd.from_pandas(df), "g", epsilon=1.0, seed=3)
          .to_pandas().set_index("g")["noisy_n"])
    a2 = (dp_counts(rd.from_pandas(df).repartition(4), "g",
                    epsilon=1.0, seed=3)
          .to_pandas().set_index("g")["noisy_n"])
    # deterministic release: partitioning cannot change the noise
    assert a1.tolist() == a2.tolist()
    # noise is bounded w.h.p. at eps=1: within ~15 of truth here
    assert abs(a1["a"] - 100) < 15 and abs(a1["b"] - 50) < 15
    # a different seed (release id) draws different noise
    b1 = (dp_counts(rd.from_pandas(df), "g", epsilon=1.0, seed=4)
          .to_pandas().set_index("g")["noisy_n"])
    assert (a1.tolist() != b1.tolist())


def test_sort_merge_join_equals_hash_join(ray_session):
    """Row-multiset equality with Dataset.join on a many-to-many key
    (dup keys on both sides) across several partitionings."""
    import ray.data as rd

    from wned_ray.pipelines.analytics import sort_merge_join

    rng = np.random.RandomState(2)
    a = pd.DataFrame({"k": rng.randint(0, 40, 300),
                      "va": np.arange(300)})
    b = pd.DataFrame({"k": rng.randint(0, 40, 120),
                      "vb": np.arange(120) * 10})
    got = (sort_merge_join(rd.from_pandas(a).repartition(5),
                           rd.from_pandas(b).repartition(3),
                           "k", ["k", "va"], ["k", "vb"],
                           n_buckets=8, sample_mod=3)
           .to_pandas().astype(np.int64)
           .sort_values(["k", "va", "vb"]).reset_index(drop=True))
    want = (a.merge(b, on="k").astype(np.int64)
            .sort_values(["k", "va", "vb"]).reset_index(drop=True))
    assert got.values.tolist() == want[got.columns].values.tolist()


def test_sort_merge_join_tiny_sample_degenerate(ray_session):
    """Fewer sampled keys than buckets -> single range bucket; the
    join must still be exact."""
    import ray.data as rd

    from wned_ray.pipelines.analytics import sort_merge_join

    a = pd.DataFrame({"k": [1, 2, 3], "va": [10, 20, 30]})
    b = pd.DataFrame({"k": [2, 3, 4], "vb": [200, 300, 400]})
    got = (sort_merge_join(rd.from_pandas(a), rd.from_pandas(b), "k",
                           ["k", "va"], ["k", "vb"])
           .to_pandas().astype(np.int64).sort_values("k"))
    assert got.values.tolist() == [[2, 20, 200], [3, 30, 300]]
