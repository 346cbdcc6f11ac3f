"""End-to-end linkage on the t1 corpus: invariant, F1, resume (SURVEY §5)."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from wned_ray.config import PipelineConfig
from wned_ray.pipelines.link import run_linkage
from wned_ray.stages.evaluate import pairwise_metrics


@pytest.fixture(scope="module")
def linked(ray_session, t1_corpus):
    cfg = PipelineConfig()
    out = run_linkage(t1_corpus["transcripts"], t1_corpus["aliases"],
                      t1_corpus["graph_edges"], cfg,
                      redirects_path=t1_corpus["redirects"])
    return t1_corpus, cfg, out


def test_per_row_invariant(linked):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering."""
    corpus, cfg, out = linked
    df = (out["prepared"]
          .select_columns(["conv_id", "turn_idx", "text"]).to_pandas()
          .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    src = (pq.read_table(corpus["transcripts"]).to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert (df["text"] == src["text"]).all()
    assert (df["conv_id"] == src["conv_id"]).all()
    assert (df["turn_idx"] == src["turn_idx"]).all()


def test_pairs_canonical_and_unique(linked):
    _, _, out = linked
    pdf = out["pairs"].select_columns(["id_a", "id_b"]).to_pandas()
    assert (pdf["id_a"] < pdf["id_b"]).all()
    assert not pdf.duplicated(["id_a", "id_b"]).any()


def test_scores_have_all_features(linked):
    _, _, out = linked
    sdf = out["scores"].limit(50).to_pandas()
    for col in ["prior", "local", "sem_sim", "name_sim", "score", "matched"]:
        assert col in sdf.columns
    assert ((sdf["name_sim"] >= 0) & (sdf["name_sim"] <= 1)).all()
    assert ((sdf["prior"] >= 0) & (sdf["prior"] <= 1.0 + 1e-9)).all()


def test_pairwise_f1_vs_labels(linked):
    """The BASELINE.json correctness gate: pairwise F1 >= 0.99."""
    corpus, cfg, out = linked
    import ray.data as rd

    labels = rd.read_parquet(corpus["labels"])
    m = pairwise_metrics(labels, out["clusters"])
    assert m["micro_f1"] >= 0.99, m
    assert m["micro_precision"] >= 0.99, m
    assert m["micro_recall"] >= 0.99, m


def test_clusters_match_expected(linked):
    corpus, cfg, out = linked
    got = out["clusters"].to_pandas().sort_values("mention_id").reset_index(drop=True)
    want = (pq.read_table(corpus["expected_clusters"]).to_pandas()
            [["mention_id", "cluster_id"]]
            .sort_values("mention_id").reset_index(drop=True))
    merged = got.merge(want, on="mention_id", suffixes=("_got", "_want"))
    agree = (merged["cluster_id_got"] == merged["cluster_id_want"]).mean()
    assert agree >= 0.99, agree


def test_recall_depends_on_redirect_resolution(linked, ray_session, t1_corpus):
    """J6/A4: the corpus's "oldname" mentions reach their entity only via
    the redirects table — a run WITHOUT redirect resolution must lose
    recall, the run WITH it holds the >=0.99 gate (checked above)."""
    import ray.data as rd

    corpus, cfg, out = linked
    bare = run_linkage(corpus["transcripts"], corpus["aliases"],
                       corpus["graph_edges"], cfg)      # no redirects
    labels = rd.read_parquet(corpus["labels"])
    m_with = pairwise_metrics(labels, out["clusters"])
    m_without = pairwise_metrics(labels, bare["clusters"])
    assert m_with["micro_recall"] >= 0.99, m_with
    assert m_without["micro_recall"] < m_with["micro_recall"] - 0.02, (
        m_without, m_with)


def test_resume_from_checkpoint(ray_session, t1_corpus, tmp_path):
    """Kill-and-rerun: second run resumes from manifests and produces
    byte-identical clusters (north_rule resumability)."""
    ckpt = str(tmp_path / "ckpt")
    cfg = PipelineConfig(checkpoint_dir=ckpt)
    out1 = run_linkage(t1_corpus["transcripts"], t1_corpus["aliases"],
                       t1_corpus["graph_edges"], cfg)
    c1 = out1["clusters"].to_pandas().sort_values("mention_id").reset_index(drop=True)
    # simulate a crash after the scores stage: delete the clusters checkpoint
    shutil.rmtree(os.path.join(ckpt, "clusters"))
    out2 = run_linkage(t1_corpus["transcripts"], t1_corpus["aliases"],
                       t1_corpus["graph_edges"], cfg)
    c2 = out2["clusters"].to_pandas().sort_values("mention_id").reset_index(drop=True)
    assert c1.equals(c2)
    # manifests exist for every checkpointed stage
    for stage in ["blocking", "scores", "clusters"]:
        assert os.path.exists(os.path.join(ckpt, stage, "_MANIFEST.json")), stage
    # per-partition metrics ride the manifests (north_rule): every scores
    # partition carries pair/matched counts, every clusters partition
    # carries mention/singleton counts, and the stage rollup agrees
    import json

    with open(os.path.join(ckpt, "scores", "_MANIFEST.json")) as f:
        sm = json.load(f)
    assert sm["partitions"] and all(
        "pairs" in p["metrics"] and "matched" in p["metrics"]
        for p in sm["partitions"])
    assert sm["metrics"]["pairs"] == sum(
        p["metrics"]["pairs"] for p in sm["partitions"])
    assert sm["metrics"]["matched"] > 0

    with open(os.path.join(ckpt, "clusters", "_MANIFEST.json")) as f:
        cm = json.load(f)
    assert cm["metrics"]["mentions"] == len(c1)
    assert all("singletons" in p["metrics"] for p in cm["partitions"])


def test_presorted_promotion_equals_shuffle_path(ray_session, t1_corpus):
    """cfg.presorted_conversations must produce EXACTLY the shuffle
    path's (mention_id, norm_mention, norm_orig) — the no-shuffle
    promotion is an optimization, never a semantics change."""
    import ray.data as rd
    from dataclasses import replace

    from wned_ray.stages.normalize import prepare

    cfg = PipelineConfig()
    cols = ["mention_id", "norm_mention", "norm_orig"]

    def run(c):
        # narrow read blocks so conversations genuinely span blocks
        ds = rd.read_parquet(t1_corpus["transcripts"],
                             override_num_blocks=16)
        return (prepare(ds, c).to_pandas()[cols]
                .sort_values("mention_id").reset_index(drop=True))

    base = run(cfg)
    fast = run(replace(cfg, presorted_conversations=True))
    assert base.equals(fast)


def test_presorted_linkage_f1(ray_session, t1_corpus):
    """Full pipeline under the presorted fast path hits the same F1."""
    import ray.data as rd
    from dataclasses import replace

    from wned_ray.stages.evaluate import pairwise_metrics

    cfg = replace(PipelineConfig(), presorted_conversations=True)
    out = run_linkage(t1_corpus["transcripts"], t1_corpus["aliases"],
                      t1_corpus["graph_edges"], cfg,
                      redirects_path=t1_corpus["redirects"])
    m = pairwise_metrics(rd.read_parquet(t1_corpus["labels"]),
                         out["clusters"])
    assert m["micro_f1"] >= 0.99, m


def test_star_member_broadcast_equals_join_fallback(ray_session, t1_corpus):
    """The broadcast member attach (rep_broadcast_max path) must emit
    EXACTLY the pairs of the distributed-join fallback."""
    from dataclasses import replace

    def pairs(cfg):
        out = run_linkage(t1_corpus["transcripts"], t1_corpus["aliases"],
                          t1_corpus["graph_edges"], cfg,
                          redirects_path=t1_corpus["redirects"])
        return (out["scores"].select_columns(["id_a", "id_b", "block_key",
                                              "score", "matched"])
                .to_pandas()
                .sort_values(["id_a", "id_b"]).reset_index(drop=True))

    base = PipelineConfig()
    bc = pairs(base)                              # broadcast path
    jn = pairs(replace(base, rep_broadcast_max=0))  # join fallback
    assert bc.values.tolist() == jn.values.tolist()
    assert len(bc) > 0


def test_fuzzy_topn_union_keeps_linkage_f1(ray_session, t1_corpus):
    """With the 3-reranker top-n union enabled (AliasLuceneIndex.java:
    270-283 analog), end-to-end pairwise F1 must hold: the union prunes
    low-similarity band collisions, never true-match pairs (each true
    pair ranks inside at least one kernel's top-n on this corpus)."""
    import ray.data as rd
    from dataclasses import replace

    from wned_ray.stages.evaluate import pairwise_metrics

    cfg = replace(PipelineConfig(), fuzzy_rerank_top_n=8)
    out = run_linkage(t1_corpus["transcripts"], t1_corpus["aliases"],
                      t1_corpus["graph_edges"], cfg,
                      redirects_path=t1_corpus["redirects"])
    m = pairwise_metrics(rd.read_parquet(t1_corpus["labels"]),
                         out["clusters"])
    assert m["micro_f1"] >= 0.99, m


def test_bcubed_vs_expected_clusters(linked):
    """B-cubed per-mention gate beside the pairwise one: against the
    transitive gold closure the clustering must stay >= 0.99 on both
    axes (the hand-worked B3 math is pinned in test_analytics)."""
    import ray.data as rd

    from wned_ray.stages.evaluate import bcubed_metrics

    corpus, cfg, out = linked
    gold = (rd.read_parquet(corpus["expected_clusters"])
            .select_columns(["mention_id", "cluster_id"])
            .rename_columns({"cluster_id": "entity_id"}))
    m = bcubed_metrics(out["clusters"], gold)
    assert m["n_mentions"] == out["clusters"].count()
    assert m["bcubed_precision"] >= 0.99, m
    assert m["bcubed_recall"] >= 0.99, m
