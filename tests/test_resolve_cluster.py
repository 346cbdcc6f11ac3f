"""Connected components + per-conversation greedy resolution (K11/Stage 5)."""

import pandas as pd
import pytest

from wned_ray.config import PipelineConfig
from wned_ray.stages.cluster import _union_find_driver, connected_components


def test_union_find_vs_bruteforce():
    edges = pd.DataFrame({
        "id_a": ["a", "b", "x", "m"],
        "id_b": ["b", "c", "y", "n"],
    })
    out = _union_find_driver(edges).set_index("mention_id")["cluster_id"]
    assert out["a"] == out["b"] == out["c"] == "a"
    assert out["x"] == out["y"] == "x"
    assert out["m"] == out["n"] == "m"


def test_union_find_chain_and_merge():
    # chain b-c-d stays separate from a-e-f (merged by the late a-f edge)
    edges = pd.DataFrame({
        "id_a": ["b", "c", "e", "a"],
        "id_b": ["c", "d", "f", "f"],
    })
    out = _union_find_driver(edges).set_index("mention_id")["cluster_id"]
    assert out["b"] == out["c"] == out["d"] == "b"
    assert out["a"] == out["e"] == out["f"] == "a"


@pytest.mark.parametrize("mode", ["driver", "distributed"])
def test_connected_components_modes_agree(ray_session, mode):
    import ray.data as rd

    cfg = PipelineConfig()
    edges = rd.from_items([
        {"id_a": "a", "id_b": "b"},
        {"id_a": "b", "id_b": "c"},
        {"id_a": "x", "id_b": "y"},
        {"id_a": "p", "id_b": "q"},
        {"id_a": "q", "id_b": "r"},
        {"id_a": "r", "id_b": "a"},     # merges p-q-r with a-b-c
    ])
    out = (connected_components(edges, cfg, mode=mode)
           .to_pandas().set_index("mention_id")["cluster_id"])
    assert out["a"] == out["b"] == out["c"] == out["p"] == out["q"] == out["r"] == "a"
    assert out["x"] == out["y"] == "x"


def test_contract_to_cap_flattens_cross_batch_chains(ray_session):
    """A path graph scattered round-robin across blocks exercises the
    alternating sort+contract rounds: round 0's per-batch forests leave
    long cross-batch star chains, and the iterated rounds must flatten
    them to (near) the spanning-forest floor so the driver cutoff sees
    the true component skeleton, not the round-0 inflation."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from wned_ray.stages.cluster import contract_to_cap

    n = 20_000                              # one path: diameter n-1
    ids = np.array([f"n{i:06d}" for i in range(n)])
    perm = np.random.default_rng(3).permutation(n - 1)
    tbl = pa.table({"id_a": pa.array(ids[perm]),
                    "id_b": pa.array(ids[perm + 1])})
    edges = rd.from_arrow(tbl).repartition(16).materialize()

    cfg = PipelineConfig(cc_driver_max_pairs=1, cc_contract_rounds=8)
    contracted, count = contract_to_cap(edges, cfg)
    # floor = nodes - components = 20000 - 1; alternating rounds converge
    # to within a small factor of it (they stop when shrinkage stalls)
    assert count < 1.2 * (n - 1)

    # and CC over the contracted forest is exact
    out = (connected_components(edges, PipelineConfig(), mode="auto")
           .to_pandas())
    assert len(out) == n
    assert (out["cluster_id"] == ids[0]).all()


def test_resolve_conversations(ray_session, t1_corpus):
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    from wned_ray.pipelines.link import run_linkage
    from wned_ray.stages.normalize import prepare
    from wned_ray.stages.resolve import resolve_conversations

    from wned_ray.stages.aliases import resolve_redirects_table

    cfg = PipelineConfig()
    prepared = prepare(rd.read_parquet(t1_corpus["transcripts"]), cfg)
    alias_ref = ray.put(resolve_redirects_table(
        pq.read_table(t1_corpus["aliases"]),
        pq.read_table(t1_corpus["redirects"])))
    graph_ref = ray.put(pq.read_table(t1_corpus["graph_edges"]))
    res = resolve_conversations(prepared, alias_ref, graph_ref, cfg).to_pandas()
    exp = pq.read_table(t1_corpus["expected_clusters"]).to_pandas()
    m = res.merge(exp, on="mention_id", suffixes=("_got", "_want"))
    acc = (m["entity_id_got"] == m["entity_id_want"]).mean()
    assert acc >= 0.95, acc


def test_pref_strategy_uniform_still_resolves(ray_session, t1_corpus):
    """PrefStrategy surface (WNEDConfig.java:25-33): UNIFORM seed
    weighting must still resolve the friendly tier correctly (the two
    strategies only differ on skewed seed masses)."""
    from dataclasses import replace

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from wned_ray.config import PipelineConfig
    from wned_ray.stages.aliases import resolve_redirects_table
    from wned_ray.stages.normalize import prepare
    from wned_ray.stages.resolve import resolve_conversations

    cfg = replace(PipelineConfig(), pref_strategy="UNIFORM")
    prepared = prepare(rd.read_parquet(t1_corpus["transcripts"]),
                       cfg).materialize()
    alias_ref = ray.put(resolve_redirects_table(
        pq.read_table(t1_corpus["aliases"]),
        pq.read_table(t1_corpus["redirects"])))
    graph_ref = ray.put(pq.read_table(t1_corpus["graph_edges"]))
    got = (resolve_conversations(prepared, alias_ref, graph_ref, cfg)
           .to_pandas().set_index("mention_id")["entity_id"])
    gold = (pq.read_table(t1_corpus["expected_clusters"])
            .to_pandas().set_index("mention_id")["entity_id"])
    assert (got == gold.reindex(got.index)).mean() >= 0.95

    import pytest

    # RANDOM is now a SEEDED strategy (the graft fixes the reference's
    # wall-clock seed); unknown names still fail fast
    with pytest.raises(ValueError):
        PipelineConfig(pref_strategy="NOT_A_STRATEGY")
    with pytest.raises(ValueError):
        PipelineConfig(mention_pref="NOT_A_STRATEGY")


def _resolve_with(t1_corpus, **cfg_kw):
    from dataclasses import replace

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from wned_ray.stages.aliases import resolve_redirects_table
    from wned_ray.stages.normalize import prepare
    from wned_ray.stages.resolve import resolve_conversations

    cfg = replace(PipelineConfig(), **cfg_kw)
    prepared = prepare(rd.read_parquet(t1_corpus["transcripts"]),
                       cfg).materialize()
    alias_ref = ray.put(resolve_redirects_table(
        pq.read_table(t1_corpus["aliases"]),
        pq.read_table(t1_corpus["redirects"])))
    graph_ref = ray.put(pq.read_table(t1_corpus["graph_edges"]))
    got = (resolve_conversations(prepared, alias_ref, graph_ref, cfg)
           .to_pandas().set_index("mention_id")["entity_id"])
    gold = (pq.read_table(t1_corpus["expected_clusters"])
            .to_pandas().set_index("mention_id")["entity_id"])
    return float((got == gold.reindex(got.index)).mean())


@pytest.mark.parametrize("kw", [
    {"pref_strategy": "CTX_SIM"},
    {"pref_strategy": "RANDOM"},
    {"mention_pref": "TFIDF"},
    {"iterative": False},
    {"iterative": False, "pref_strategy": "CTX_SIM"},
    {"candidate_prune_limit": 3},
    {"candidate_prune_limit": 3, "pref_strategy": "CTX_SIM"},
])
def test_pref_strategy_variants_resolve_t1(ray_session, t1_corpus, kw):
    """Every PrefStrategy / useIterative combination (WNEDConfig.java:
    25-33; one-shot path SemanticSignatureEL.java:472-568) must clear the
    friendly tier — the strategies reweight the restart vector, they must
    not break resolution."""
    acc = _resolve_with(t1_corpus, **kw)
    assert acc >= 0.95, (kw, acc)


def test_random_pref_is_seeded_deterministic(ray_session, t1_corpus):
    """The graft's RANDOM preference is a pure function of (seed,
    conv_id, entity) — two runs agree exactly (the reference seeds with
    wall-clock time, SemanticSignatureEL.java:386-399; that
    nondeterminism is a documented defect this engine fixes)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from dataclasses import replace

    from wned_ray.stages.aliases import resolve_redirects_table
    from wned_ray.stages.normalize import prepare
    from wned_ray.stages.resolve import resolve_conversations

    cfg = replace(PipelineConfig(), pref_strategy="RANDOM")
    prepared = prepare(rd.read_parquet(t1_corpus["transcripts"]),
                       cfg).materialize()
    alias_ref = ray.put(resolve_redirects_table(
        pq.read_table(t1_corpus["aliases"]),
        pq.read_table(t1_corpus["redirects"])))
    graph_ref = ray.put(pq.read_table(t1_corpus["graph_edges"]))
    a = (resolve_conversations(prepared, alias_ref, graph_ref, cfg)
         .to_pandas().sort_values("mention_id").reset_index(drop=True))
    b = (resolve_conversations(prepared, alias_ref, graph_ref, cfg)
         .to_pandas().sort_values("mention_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_entity_contexts_and_ctx_sim_weights(ray_session, t1_corpus):
    """build_entity_contexts yields a non-empty (entity, ctx) dim from
    unambiguous surfaces, and the resolver's CTX_SIM weight is a set
    cosine in (0, 1] for a mention context sharing terms with the
    entity's bag."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from wned_ray.stages.normalize import prepare
    from wned_ray.stages.resolve import (ConversationResolver,
                                         build_entity_contexts)

    cfg = PipelineConfig()
    prepared = prepare(rd.read_parquet(t1_corpus["transcripts"]),
                       cfg).materialize()
    alias_table = pq.read_table(t1_corpus["aliases"])
    ctx_tbl = build_entity_contexts(prepared, alias_table, cfg)
    assert ctx_tbl.num_rows > 0
    ents = ctx_tbl["entity"].to_pylist()
    bags = ctx_tbl["ctx"].to_pylist()
    assert all(b for b in bags)

    r = ConversationResolver(alias_table, None, cfg,
                             entity_ctx_ref=ctx_tbl)
    ent, bag = ents[0], bags[0]
    shared = " ".join(bag.split()[:3])
    assert 0.0 < r._ctx_sim(shared, ent) <= 1.0
    assert r._ctx_sim("zzz qqq xxx", ent) == 0.0
    assert r._ctx_sim(shared, "no_such_entity") == 0.0


def test_approximate_seeds_fallback():
    """A conversation with NO unambiguous mention still gets a restart
    vector via getApproximateEntities (SemanticSignatureEL.java:850-889):
    candidates weighted by normalized entity pref x mention weight,
    deterministic max-merge; disabled via use_approximate_seeds=False."""
    from dataclasses import replace

    import pyarrow as pa

    from wned_ray.stages.resolve import ConversationResolver

    alias_table = pa.table({
        "entity": ["E1", "E2", "E1", "E3"],
        "alias": ["acme", "acme", "acme corp", "acme corp"],
        "freq": [6, 2, 5, 5],
    })
    cfg = PipelineConfig()
    r = ConversationResolver(alias_table, None, cfg)
    rows = [("m1", "acme"), ("m2", "acme corp")]
    cand_of = {m: r.cand.get(n, []) for m, n in rows}
    assert all(len(c) > 1 for c in cand_of.values())   # all ambiguous
    mw = {m: 1.0 for m, _ in rows}
    seeds = r._initial_seeds("c1", rows, cand_of, {}, mw)
    assert seeds                                # fallback kicked in
    # PRIOR_PROB: E1 gets max(6/8, 5/10) = 0.75; E2 2/8; E3 5/10
    assert seeds["E1"] == pytest.approx(0.75)
    assert seeds["E2"] == pytest.approx(0.25)
    assert seeds["E3"] == pytest.approx(0.5)

    r_off = ConversationResolver(
        alias_table, None, replace(cfg, use_approximate_seeds=False))
    assert r_off._initial_seeds("c1", rows, cand_of, {}, mw) == {}


def test_prune_candidates_union_semantics():
    """CSUtils.selectCandidatesMention:180-199 — the kept set is the
    UNION of top-k by prior and top-k by context sim: a candidate that
    loses on prior but wins on context survives, and vice versa."""
    from wned_ray.stages.resolve import prune_candidates

    cands = [("e1", 0.5), ("e2", 0.3), ("e3", 0.1),
             ("e4", 0.05), ("e5", 0.02)]
    sims = {"e1": 0.0, "e2": 0.0, "e3": 0.0, "e4": 0.9, "e5": 0.8}

    out = prune_candidates(cands, 2, ctx_sim=sims.get)
    kept = {e for e, _ in out}
    # prior side keeps e1,e2; ctx side keeps e4,e5; e3 loses both
    assert kept == {"e1", "e2", "e4", "e5"}
    # original (entity, prior) tuples and order are preserved
    assert out == [c for c in cands if c[0] in kept]

    # prior-only fallback (no entity-context dim)
    out2 = prune_candidates(cands, 2, ctx_sim=None)
    assert {e for e, _ in out2} == {"e1", "e2"}

    # short lists pass through untouched
    assert prune_candidates(cands[:2], 3, ctx_sim=sims.get) == cands[:2]
