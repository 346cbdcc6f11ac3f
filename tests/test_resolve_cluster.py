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

    with pytest.raises(ValueError):
        PipelineConfig(pref_strategy="RANDOM")
