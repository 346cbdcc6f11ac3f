"""Adversarial (hard) fixture tier — makes precision FALSIFIABLE.

Round-2 VERDICT "what's wrong" #2: the friendly generator's globally
unique first words made cross-entity co-blocking structurally impossible
(fp=0, F1=1.0 under-certified the scorer). The hard tier plants:

- shared-first-word entity pairs in DIFFERENT topics (their surfaces
  co-block through the token tier; is_match=False — the pair scorer
  carries precision: prior=0, sem~0, name-sim alone must not cross the
  threshold);
- ambiguous bare names ("kippolsot" under two entities): per-conv
  promotion resolves the in-context ones, the corpus-wide promotion
  guard must DECLINE the rest (two non-near-dup extensions);
- prior-trap nicknames whose alias rows favor the WRONG entity 2:1 —
  prior-only resolution (the reference's PriorProbEL baseline,
  ``…/experiment/PriorProbEL.java:133-148``) picks wrong; the PPR
  doc-signature must override (SURVEY §5.2 sanity floor).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def hard_run(ray_session, tmp_path_factory):
    """One HARD_T1 linkage run shared by the module's tests."""
    from wned_ray.pipelines.link import run_linkage
    from wned_ray.synth import HARD_T1, config_for, generate_corpus

    out = tmp_path_factory.mktemp("hardcorpus")
    corpus = generate_corpus(HARD_T1, str(out))
    cfg = config_for(HARD_T1)
    result = run_linkage(corpus["transcripts"], corpus["aliases"],
                         corpus["graph_edges"], cfg,
                         redirects_path=corpus["redirects"])
    return corpus, cfg, result


def test_hard_labels_contain_real_negatives(hard_run):
    """The labeled pair universe must include cross-entity pairs at
    shared blocking keys — without them F1=1.0 is vacuous."""
    import pyarrow.parquet as pq

    corpus, _, _ = hard_run
    lab = pq.read_table(corpus["labels"]).to_pandas()
    n_neg = int((~lab["is_match"]).sum())
    n_pos = int(lab["is_match"].sum())
    assert n_pos > 0 and n_neg > 0
    # negatives are a real fraction, not an accident of one collision
    assert n_neg >= 0.05 * len(lab), (n_neg, len(lab))


def test_hard_tier_pairwise_f1(hard_run):
    """The BASELINE gate on the falsifiable tier: micro-F1 >= 0.99 with
    zero false positives — precision carried by the scorer + the
    corpus-wide promotion unambiguity guard."""
    import ray.data as rd

    from wned_ray.stages.evaluate import pairwise_metrics

    corpus, _, result = hard_run
    m = pairwise_metrics(rd.read_parquet(corpus["labels"]),
                         result["clusters"])
    assert m["tn"] > 0, "no negatives evaluated — fixture is vacuous"
    assert m["micro_f1"] >= 0.99, m
    assert m["fp"] == 0, m


def test_shared_entities_stay_separate(hard_run):
    """The two entities of a shared-first-word pair must land in
    DIFFERENT predicted clusters (one matched cross pair would
    transitively merge them)."""
    import pyarrow.parquet as pq

    corpus, _, result = hard_run
    exp = pq.read_table(corpus["expected_clusters"]).to_pandas()
    cl = result["clusters"].to_pandas().set_index("mention_id")["cluster_id"]
    exp["pred"] = exp["mention_id"].map(cl)
    ents = exp[exp["entity_id"] != "NIL"]
    # first token -> set of entities sharing it
    first = ents["entity_id"].str.split(" ").str[0]
    shared_firsts = first[first.duplicated(keep=False) &
                          (ents["entity_id"] != first)].unique()
    checked = 0
    for f in shared_firsts:
        grp = ents[first == f]
        by_ent = grp.groupby("entity_id")["pred"].agg(set)
        if len(by_ent) < 2:
            continue
        sets = list(by_ent)
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                assert not (sets[i] & sets[j]), f
                checked += 1
    assert checked > 0, "no shared-first-word pairs were exercised"


def test_prior_baseline_below_full_resolver(hard_run):
    """PriorProbEL separation: full resolver accuracy >= 0.99 AND
    strictly above prior-only — the semantic kernel demonstrably adds
    lift over priors on this corpus."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from wned_ray.stages.aliases import resolve_redirects_table
    from wned_ray.stages.normalize import prepare
    from wned_ray.stages.resolve import resolve_conversations

    corpus, cfg, _ = hard_run
    prepared = prepare(rd.read_parquet(corpus["transcripts"]),
                       cfg).materialize()
    alias_ref = ray.put(resolve_redirects_table(
        pq.read_table(corpus["aliases"]), pq.read_table(corpus["redirects"])))
    graph_ref = ray.put(pq.read_table(corpus["graph_edges"]))
    gold = (pq.read_table(corpus["expected_clusters"])
            .to_pandas().set_index("mention_id")["entity_id"])

    def accuracy(prior_only: bool) -> float:
        got = resolve_conversations(
            prepared, alias_ref, graph_ref, cfg, prior_only=prior_only
        ).to_pandas().set_index("mention_id")["entity_id"]
        return float((got == gold.reindex(got.index)).mean())

    full = accuracy(prior_only=False)
    prior = accuracy(prior_only=True)
    assert full >= 0.99, full
    assert prior < full, (prior, full)


def test_global_promote_guard_declines_shared_bare():
    """The corpus-wide promotion's unambiguity guard (the hard tier's
    precision linchpin): a bare name with two non-near-dup extensions
    stays unpromoted; a unique extension still promotes."""
    from wned_ray.stages.normalize import _promotion_table_local

    # ambiguous: two different-entity extensions -> declined
    t = _promotion_table_local(
        ["kippolsot", "kippolsot jomydra", "kippolsot xenarvo"],
        max_token_block=64)
    assert "kippolsot" not in t["norm_a"].to_pylist()
    # near-dup extensions (typo family of ONE entity) -> promoted
    t2 = _promotion_table_local(
        ["kippolsot", "kippolsot jomydra", "kippolsot jomydr"],
        max_token_block=64)
    m = dict(zip(t2["norm_a"].to_pylist(), t2["norm_promoted"].to_pylist()))
    assert m.get("kippolsot") == "kippolsot jomydr" or \
        m.get("kippolsot") == "kippolsot jomydra"
    # unique extension -> promoted
    t3 = _promotion_table_local(
        ["kippolsot", "kippolsot jomydra"], max_token_block=64)
    m3 = dict(zip(t3["norm_a"].to_pylist(), t3["norm_promoted"].to_pylist()))
    assert m3.get("kippolsot") == "kippolsot jomydra"


def test_token_block_keys_align_with_pipeline(ray_session):
    """synth labels and stages/blocking must produce IDENTICAL token-tier
    keys for the same norms — one helper drives both sides."""
    import pyarrow as pa

    from wned_ray.config import PipelineConfig
    from wned_ray.functions.minhash import token_block_keys
    from wned_ray.stages.blocking import _explode_norms

    norms = ["kippolsot jomydra", "kippolsot", "gulmorrin gulydra", ""]
    cfg = PipelineConfig(token_blocks=True)
    batch = pa.table({
        "norm_mention": pa.array(norms, pa.string()),
        "n_mentions": pa.array([2, 3, 1, 5], pa.int64()),
        "rep_id": pa.array(["a", "b", "c", "d"], pa.string()),
    })
    out = _explode_norms(batch, cfg).to_pandas()
    tok = out[out["band_idx"] == -1]
    trow, tkeys = token_block_keys(norms)
    want = {(norms[r], k) for r, k in zip(trow, tkeys)}
    got = set(zip(tok["norm_mention"], tok["block_key"]))
    assert got == want


def test_norm_pairs_driver_matches_distributed(ray_session, tmp_path_factory):
    """The vocabulary-sized driver fast path and the distributed
    join/groupby path must produce the IDENTICAL norm-pair set."""
    import pandas as pd
    import ray.data as rd

    from dataclasses import replace

    from wned_ray.config import PipelineConfig
    from wned_ray.stages.blocking import hot_block_keys, norm_blocks
    from wned_ray.stages.normalize import prepare
    from wned_ray.stages.pairs import NP_COLS, norm_pairs
    from wned_ray.synth import HARD_T1, config_for, generate_corpus

    out = tmp_path_factory.mktemp("npcorpus")
    corpus = generate_corpus(HARD_T1, str(out))
    cfg = config_for(HARD_T1)
    prepared = prepare(rd.read_parquet(corpus["transcripts"]), cfg).materialize()
    blocking = norm_blocks(prepared, cfg).materialize()
    hot = hot_block_keys(blocking, cfg)

    def run(c):
        df = (norm_pairs(blocking, hot, c, num_partitions=4)
              .to_pandas()[NP_COLS]
              .sort_values(NP_COLS).reset_index(drop=True))
        return df

    local = run(cfg)
    dist = run(replace(cfg, norm_pairs_driver_max_rows=0))
    pd.testing.assert_frame_equal(local, dist)
    assert len(local) > 0


def test_fitted_weights_match_hand_tuned_f1(hard_run):
    """A5 learned-ranker e2e: weights fitted from the labels + scored
    pairs (fusion.fit_config) must reach the same F1 gate as the
    hand-tuned defaults on the adversarial tier."""
    import ray.data as rd

    from wned_ray.functions.fusion import fit_config
    from wned_ray.pipelines.link import run_linkage
    from wned_ray.stages.evaluate import pairwise_metrics

    corpus, cfg, result = hard_run
    labels_df = rd.read_parquet(corpus["labels"]).to_pandas()
    scores_df = result["scores"].to_pandas()
    fitted = fit_config(scores_df, labels_df, cfg)
    assert fitted.rank_scheme == "LINEAR"

    refit = run_linkage(corpus["transcripts"], corpus["aliases"],
                        corpus["graph_edges"], fitted,
                        redirects_path=corpus["redirects"])
    m = pairwise_metrics(rd.read_parquet(corpus["labels"]),
                         refit["clusters"])
    assert m["micro_f1"] >= 0.99, (m, {"prior": fitted.prior_weight,
                                       "local": fitted.local_weight,
                                       "name": fitted.name_weight,
                                       "thr": fitted.match_threshold})


def test_pairwise_fitted_weights_match_f1(hard_run):
    """The RankNet-style pairwise ranker (fit_config_pairwise — the
    honest L2RPredictor analog) must reach the same F1 gate as the
    pointwise fit on the adversarial tier."""
    import ray.data as rd

    from wned_ray.functions.fusion import fit_config_pairwise
    from wned_ray.pipelines.link import run_linkage
    from wned_ray.stages.evaluate import pairwise_metrics

    corpus, cfg, result = hard_run
    labels_df = rd.read_parquet(corpus["labels"]).to_pandas()
    scores_df = result["scores"].to_pandas()
    fitted = fit_config_pairwise(scores_df, labels_df, cfg)
    assert fitted.rank_scheme == "LINEAR"

    refit = run_linkage(corpus["transcripts"], corpus["aliases"],
                        corpus["graph_edges"], fitted,
                        redirects_path=corpus["redirects"])
    m = pairwise_metrics(rd.read_parquet(corpus["labels"]),
                         refit["clusters"])
    assert m["micro_f1"] >= 0.99, (m, {"prior": fitted.prior_weight,
                                       "local": fitted.local_weight,
                                       "name": fitted.name_weight,
                                       "thr": fitted.match_threshold})


def test_nil_model_e2e(hard_run):
    """Model-based NIL (cfg.nil_model, NILPredictor analog): the
    calibrated logistic decision must hold the pairwise F1 gate on the
    adversarial tier AND leave every gold-NIL mention a singleton."""
    from dataclasses import replace

    import ray.data as rd

    from wned_ray.functions.fusion import fit_nil_model
    from wned_ray.pipelines.link import run_linkage
    from wned_ray.stages.evaluate import pairwise_metrics

    corpus, cfg, result = hard_run
    labels_df = rd.read_parquet(corpus["labels"]).to_pandas()
    scores_df = result["scores"].to_pandas()
    d = labels_df.merge(
        scores_df[["id_a", "id_b", "prior", "local", "sem_sim",
                   "name_sim"]], on=["id_a", "id_b"], how="inner")
    model = fit_nil_model(
        d[["prior", "local", "sem_sim", "name_sim"]].to_numpy(),
        d["is_match"].to_numpy())
    rerun = run_linkage(corpus["transcripts"], corpus["aliases"],
                        corpus["graph_edges"],
                        replace(cfg, nil_model=model),
                        redirects_path=corpus["redirects"])
    m = pairwise_metrics(rd.read_parquet(corpus["labels"]),
                         rerun["clusters"])
    assert m["micro_f1"] >= 0.99, m

    exp = rd.read_parquet(corpus["expected_clusters"]).to_pandas()
    got = rerun["clusters"].to_pandas()
    sizes = got.groupby("cluster_id")["mention_id"].transform("size")
    got["singleton"] = sizes == 1
    nil = exp[exp["entity_id"] == "NIL"].merge(
        got[["mention_id", "singleton"]], on="mention_id", how="left")
    assert len(nil) > 0, "hard tier must plant gold-NIL turns"
    assert nil["singleton"].fillna(True).all()
