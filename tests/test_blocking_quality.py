"""blocking_quality: RR / PC on a hand-computable fixture, plus the e2e
row over the T1 corpus (completeness must be 1.0 where pairwise F1 is)."""

import numpy as np
import pandas as pd


def test_blocking_quality_hand_computed(ray_session):
    import ray.data as rd

    from wned_ray.stages.evaluate import blocking_quality

    # 6 mentions, entities: e1={a,b,c} e2={d,e} e3={f}
    gold = rd.from_pandas(pd.DataFrame({
        "mention_id": list("abcdef"),
        "entity_id": ["e1", "e1", "e1", "e2", "e2", "e3"],
    }))
    # candidates connect {a,b}, {c,f}, {d,e}: the e1 pairs ac/bc are NOT
    # connected (cf is a false edge into e3), so only ab + de are covered
    pairs = rd.from_pandas(pd.DataFrame({
        "id_a": ["a", "d", "c"],
        "id_b": ["b", "e", "f"],
    }))
    m = blocking_quality(pairs, gold, num_partitions=2)
    assert m["n_mentions"] == 6 and m["candidate_pairs"] == 3
    assert m["true_pairs"] == 4           # C(3,2) + C(2,2) = 3 + 1
    assert m["covered_true_pairs"] == 2   # ab, de
    assert abs(m["reduction_ratio"] - (1 - 3 / 15)) < 1e-12
    assert abs(m["pair_completeness"] - 0.5) < 1e-12

    # transitive coverage: adding bc connects all of e1 through b
    pairs2 = rd.from_pandas(pd.DataFrame({
        "id_a": ["a", "d", "b"],
        "id_b": ["b", "e", "c"],
    }))
    m2 = blocking_quality(pairs2, gold, num_partitions=2)
    assert m2["covered_true_pairs"] == 4 and m2["pair_completeness"] == 1.0


def test_blocking_quality_t1_corpus(ray_session):
    """T1 tier: the candidate graph connects ≥99% of true mention pairs
    while pruning >90% of the quadratic space. (Not exactly 1.0: the
    pairwise-F1 labels mirror the blocking tier by construction, so the
    handful of true pairs whose surfaces never co-block are invisible
    to the F1 gate — surfacing them is this metric's whole point.)"""
    import ray.data as rd

    from wned_ray.config import PipelineConfig
    from wned_ray.pipelines.link import run_linkage
    from wned_ray.stages.evaluate import blocking_quality
    from wned_ray.synth import T1, ensure_corpus

    corpus = ensure_corpus(T1)
    out = run_linkage(corpus["transcripts"], corpus["aliases"],
                      corpus["graph_edges"], PipelineConfig(),
                      redirects_path=corpus["redirects"])
    gold = rd.read_parquet(corpus["expected_clusters"])
    m = blocking_quality(out["pairs"], gold)
    assert m["pair_completeness"] >= 0.99, m
    assert m["reduction_ratio"] > 0.9, m
    # same-norm star edges must cover every within-norm true pair:
    # completeness can only be lost ACROSS surfaces, never within one
    assert m["covered_true_pairs"] > 10_000, m


def test_sorted_neighborhood_matches_bruteforce(ray_session):
    """Window-5 sorted neighborhood over random short keys with a tiny
    chunk (forcing many ghost boundaries) == single-process brute force
    over the same (7-char key, id) total order."""
    import numpy as np
    import ray.data as rd

    from wned_ray.stages.blocking import sorted_neighborhood_pairs

    rng = np.random.default_rng(11)
    n, w = 300, 5
    keys = ["".join(rng.choice(list("abc"), size=rng.integers(0, 9)))
            for _ in range(n)]
    df = pd.DataFrame({"rid": np.arange(n, dtype=np.int64),
                       "key": keys})
    got = (sorted_neighborhood_pairs(
        rd.from_pandas(df).repartition(7), "rid", "key",
        window=w, chunk=16).to_pandas()
        .sort_values(["id_a", "id_b"]).reset_index(drop=True))

    s = (df.assign(k7=df["key"].str.slice(0, 7))
         .sort_values(["k7", "rid"], kind="stable")
         .reset_index(drop=True))
    want = [(int(s["rid"][i]), int(s["rid"][i + d]), d)
            for i in range(n) for d in range(1, w) if i + d < n]
    want = (pd.DataFrame(want, columns=["id_a", "id_b", "dist"])
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert len(got) == len(want) == (n - 1) + (n - 2) + (n - 3) + (n - 4)
    assert got.astype(np.int64).values.tolist() == \
        want.astype(np.int64).values.tolist()


def test_sorted_neighborhood_string_ids_and_window2(ray_session):
    """String ids exercise the non-integer-id sampler path in
    global_rank; window 2 emits exactly the adjacent pairs of the
    sorted order."""
    import numpy as np
    import ray.data as rd

    from wned_ray.stages.blocking import sorted_neighborhood_pairs

    df = pd.DataFrame({
        "mid": ["m3", "m1", "m4", "m2"],
        "key": ["bb", "aa", "cc", "ab"]})
    got = (sorted_neighborhood_pairs(rd.from_pandas(df), "mid", "key",
                                     window=2).to_pandas()
           .sort_values(["id_a"]).reset_index(drop=True))
    # sorted by key: m1(aa) m2(ab) m3(bb) m4(cc)
    assert got[["id_a", "id_b"]].values.tolist() == [
        ["m1", "m2"], ["m2", "m3"], ["m3", "m4"]]
    assert (got["dist"] == 1).all()


def test_sorted_neighborhood_validates_params(ray_session):
    import ray.data as rd

    from wned_ray.stages.blocking import sorted_neighborhood_pairs

    ds = rd.from_pandas(pd.DataFrame({"rid": [1], "key": ["a"]}))
    import pytest as _pt
    with _pt.raises(ValueError):
        sorted_neighborhood_pairs(ds, "rid", "key", window=1)
    with _pt.raises(ValueError):
        sorted_neighborhood_pairs(ds, "rid", "key", window=8, chunk=4)


def test_meta_blocking_hand_example(ray_session):
    import ray.data as rd

    from wned_ray.stages.blocking import meta_blocking

    # bigram blocks: x_y {1,2,3,5}, y_z {1,3}, y_w {2}, q_r {4}
    # kept (size 2..32): x_y, y_z
    # edges (CBS): (1,2)=1 (1,3)=2 (1,5)=1 (2,3)=1 (2,5)=1 (3,5)=1
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["x y z", "x y w", "x y z", "q r", "x y"],
    })
    # WEP: global mean = 7/6 -> only (1,3) survives
    wep = (meta_blocking(rd.from_pandas(df), "doc_id", "text",
                         scheme="wep", max_block=32)
           .to_pandas().sort_values(["id_a", "id_b"]))
    assert list(map(tuple, wep[["id_a", "id_b", "w"]].values)) == \
        [(1, 3, 2)]
    # WNP: node means 1:4/3, 2:1, 3:4/3, 5:1
    #   (1,3): 2 >= 4/3 keep; (2,5): 1 >= (1+1)/2 keep (boundary tie);
    #   all others fall below their (avg_a+avg_b)/2 threshold
    wnp = (meta_blocking(rd.from_pandas(df), "doc_id", "text",
                         scheme="wnp", max_block=32)
           .to_pandas().sort_values(["id_a", "id_b"]))
    assert list(map(tuple, wnp[["id_a", "id_b", "w"]].values)) == \
        [(1, 3, 2), (2, 5, 1)]


def test_meta_blocking_prunes_most_edges(ray_session):
    """At sf0.001 the pruned edge set must be a strict (and large)
    reduction of the unpruned CBS graph while keeping every surviving
    weight >= 1 and id_a < id_b."""
    import ray.data as rd

    from wned_ray.stages.blocking import meta_blocking

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    out = meta_blocking(ds, "doc_id", "text", scheme="wnp",
                        max_block=32).to_pandas()
    assert (out["id_a"] < out["id_b"]).all()
    assert (out["w"] >= 1).all()
    # brute-force CBS reference in pandas: the pruned set must be a
    # PROPER subset of the full graph with identical weights
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    rows = []
    for did, text in zip(docs.doc_id, docs.text):
        t = [w for w in text.lower().split(" ") if w]
        rows.extend((did, f"{a}_{b}") for a, b in zip(t, t[1:]))
    et = pd.DataFrame(rows, columns=["doc_id", "g"]).drop_duplicates()
    bs = et.groupby("g")["doc_id"].transform("size")
    et = et[(bs >= 2) & (bs <= 32)]
    m = et.merge(et, on="g")
    m = m[m.doc_id_x < m.doc_id_y]
    full = (m.groupby(["doc_id_x", "doc_id_y"]).size()
            .rename("w").reset_index())
    assert 0 < len(out) < len(full)
    chk = out.merge(full, left_on=["id_a", "id_b"],
                    right_on=["doc_id_x", "doc_id_y"], how="left")
    assert (chk["w_x"] == chk["w_y"]).all()


def test_canopy_pairs_hand_example(ray_session):
    import ray.data as rd

    from wned_ray.stages.blocking import canopy_pairs

    df = pd.DataFrame({
        "id": list(range(8)),
        "name": ["john smith", "jon smith", "john smyth", "mary jones",
                 "marie jones", "robert brown", "bob brown", "zz qq"],
    })
    got = (canopy_pairs(rd.from_pandas(df), "id", "name",
                        t_loose=0.25, t_tight=0.55)
           .to_pandas().sort_values(["id_a", "id_b"]))
    # canopies: {john*} {mary/marie jones} {r./bob brown}; 'zz qq' alone
    assert got.values.tolist() == [[0, 1], [0, 2], [3, 4], [5, 6]]


def test_canopy_pairs_deterministic_and_deduped(ray_session):
    """Canopies OVERLAP (loose radius): the same edge may surface from
    several canopies — the output must still be a deduplicated pair
    set, identical across partitionings."""
    import ray.data as rd

    from wned_ray.stages.blocking import canopy_pairs

    rng = np.random.RandomState(3)
    base = ["alpha beta", "alpha betz", "gamma delta", "gamma deltz",
            "epsilon zeta"]
    df = pd.DataFrame({
        "id": np.arange(60),
        "name": [base[i % 5] + f" {rng.randint(0, 3)}"
                 for i in range(60)],
    })
    a = (canopy_pairs(rd.from_pandas(df), "id", "name").to_pandas()
         .sort_values(["id_a", "id_b"]).values.tolist())
    b = (canopy_pairs(rd.from_pandas(df).repartition(6), "id", "name")
         .to_pandas().sort_values(["id_a", "id_b"]).values.tolist())
    assert a == b
    assert len(a) == len({tuple(x) for x in a})  # deduplicated
    assert len(a) > 0


def test_meta_blocking_char_qgram_mode(ray_session):
    """key_mode='chars' (trigram q-grams) blocks short name surfaces
    where word bigrams barely exist: the two smith variants co-block,
    the unrelated string does not pair with them."""
    import ray.data as rd

    from wned_ray.stages.blocking import meta_blocking

    df = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "name": ["john smith", "john smyth", "johnny smith", "qqq zzz"],
    })
    got = (meta_blocking(rd.from_pandas(df), "id", "name",
                         scheme="wep", max_block=32, key_mode="chars")
           .to_pandas())
    pairs = set(map(tuple, got[["id_a", "id_b"]].values))
    assert (1, 3) in pairs or (1, 2) in pairs
    assert all(4 not in p for p in pairs)
