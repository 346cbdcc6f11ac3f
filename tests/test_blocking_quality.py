"""blocking_quality: RR / PC on a hand-computable fixture, plus the e2e
row over the T1 corpus (completeness must be 1.0 where pairwise F1 is)."""

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
