"""Benchmark harness. Prints ONE JSON line.

Headline: the full record-linkage pipeline (prepare -> block -> pairs ->
score -> cluster) over the 500k-turn synthetic transcript corpus
(sf0.1; smaller tiers at smaller sf), measured as wall seconds and
turns/sec. Side queries cover the other operator families over
``$GRAFT_SF_DIR`` tables.

Usage:
    python bench.py                 # headline = MEDIAN of 3 linkage runs at
                                    # $RAY_GRAFT_CPUS (default 32) — this VM's
                                    # wall time drifts +-35% run-to-run
                                    # (BASELINE.md), so single runs are
                                    # uninformative; min/median/max reported
    python bench.py --once          # single linkage run (fast iteration)
    python bench.py --scaling       # fresh processes at 2 and 8 CPUs on the
                                    # same input; reports scaling efficiency
                                    # (the in-sandbox stand-in for N vs 4N
                                    # nodes, BASELINE.md scaling target —
                                    # both legs below the box's bandwidth
                                    # ceiling; GRAFT_SCALE_CPUS overrides)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _corpus_spec(sf_dir: str):
    from wned_ray.synth import BENCH, SCALE, SCALE4, T1, T2

    if os.environ.get("GRAFT_SCALING_TIER"):
        # --scaling runs on the ~8M-turn SCALE corpus: large enough that
        # the data path dominates fixed costs (actor spawn, driver CC,
        # stage barriers), so the lo-vs-hi-CPU ratio measures scaling of
        # the distributed pipeline rather than constant overhead.
        # GRAFT_SCALE_X4=1 selects the ~32M-turn SCALE4 corpus, where the
        # per-stage fixed costs drop below ~2% of either leg's wall and
        # the VM's one-sided stall noise averages out (see synth.SCALE4).
        return SCALE4 if os.environ.get("GRAFT_SCALE_X4") else SCALE
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.endswith("0.001"):
        return T1
    if base.endswith("0.01"):
        return T2
    return BENCH


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)   # keep stdout to exactly ONE JSON line
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import ray.data as rd

    from wned_ray.config import PipelineConfig
    from wned_ray.pipelines.link import run_linkage
    from wned_ray.pipelines.datawork import (exact_dedup, knn_search,
                                             minhash_candidates)
    from wned_ray.synth import ensure_corpus

    spec = _corpus_spec(sf_dir)
    corpus = ensure_corpus(spec)          # generation cached — not timed
    n_turns = spec.n_convs * spec.turns_per_conv

    # warm the OS page cache so we measure compute + shuffle, not cold disk
    rd.read_parquet(corpus["transcripts"]).count()

    queries: dict[str, float] = {}
    # ensure_corpus writes transcripts conversation-contiguous (synth.py
    # np.repeat conv layout), so the no-shuffle promotion path applies:
    # conversations complete within a block promote locally and only the
    # ~2 boundary convs per block go through the per-document shuffle.
    # Equivalence to the shuffled path is pytest-gated
    # (test_presorted_promotion_*); on non-contiguous input leave this
    # False and pay the one per-document all-to-all.
    cfg = PipelineConfig(presorted_conversations=True)

    # Headline = median of 3 end-to-end linkage runs (round-2 VERDICT
    # task 9: single runs are uninformative under this VM's documented
    # +-35% wall drift). The scaling tier stays single-run: its legs are
    # minutes long and the efficiency ratio comes from a back-to-back
    # fresh-process pair, which is the comparable unit there.
    reps = 1 if (os.environ.get("GRAFT_BENCH_ONCE")
                 or os.environ.get("GRAFT_SCALING_TIER")) else 3
    runs: list[tuple[float, dict, int]] = []
    for _ in range(reps):
        t0 = time.time()
        out = run_linkage(corpus["transcripts"], corpus["aliases"],
                          corpus["graph_edges"], cfg,
                          redirects_path=corpus.get("redirects"))
        n_clusters = out["clusters"].count()
        runs.append((time.time() - t0, out, n_clusters))
    runs.sort(key=lambda r: r[0])
    t_link, out, n_clusters = runs[len(runs) // 2]      # median run
    runs_sec = [round(r[0], 3) for r in runs]
    queries["er_linkage"] = round(t_link, 3)

    if os.environ.get("GRAFT_SCALING_TIER"):
        ray.shutdown()
        return {
            "metric": "er_linkage_wall_sec", "value": round(t_link, 3),
            "unit": "sec", "queries": queries,
            "sf": os.path.basename(os.path.normpath(sf_dir)),
            "num_cpus": num_cpus, "turns": n_turns,
            "turns_per_sec": round(n_turns / t_link, 1),
            "clusters": n_clusters,
            "stages": out.get("timings", {}),
        }

    # Incremental linkage: 90/10 conv split, link the 90% base once
    # (untimed setup), then time the 10% delta increment — the
    # append-only-corpus cost story (pipelines/increment.py)
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    from wned_ray.pipelines.increment import run_linkage_increment

    split_dir = os.path.join(os.path.dirname(corpus["transcripts"]),
                             "inc_split90")
    base_p = os.path.join(split_dir, "base.parquet")
    delta_p = os.path.join(split_dir, "delta.parquet")
    if not (os.path.exists(base_p) and os.path.exists(delta_p)):
        os.makedirs(split_dir, exist_ok=True)
        t = _pq.read_table(corpus["transcripts"])
        convs = sorted(set(t["conv_id"].to_pylist()))
        import pyarrow as _pa

        dset = _pa.array(sorted(convs[: max(1, len(convs) // 10)]))
        mask = _pc.is_in(t["conv_id"], value_set=dset)
        _pq.write_table(t.filter(_pc.invert(mask)), base_p)
        _pq.write_table(t.filter(mask), delta_p)
    base_out = run_linkage(base_p, corpus["aliases"],
                           corpus["graph_edges"], cfg,
                           redirects_path=corpus.get("redirects"))
    base_out["clusters"].count()
    t0 = time.time()
    inc = run_linkage_increment(base_out, delta_p, corpus["aliases"],
                                corpus["graph_edges"], cfg,
                                redirects_path=corpus.get("redirects"))
    inc["clusters"].count()
    queries["er_increment_delta10"] = round(time.time() - t0, 3)

    # Fresh-vocabulary append — the increment's realistic regime. The
    # 90/10 same-corpus split above is its WORST case (the synthetic
    # vocabulary repeats across convs, so the delta touches ~78% of the
    # base's block keys). Here the delta is a different-seed corpus
    # (new entities, disjoint block keys); base state = the headline
    # run's full-corpus result, dims = merged (the KB after the
    # append). The honest comparator `er_full_rerun_fresh10` is a full
    # rerun over the union (timed once, same cfg) in the same JSON.
    from wned_ray.synth import CorpusSpec, fresh_delta_fixture

    fresh_spec = CorpusSpec(seed=2026, with_labels=False,
                            n_entities=max(4, spec.n_entities // 10),
                            n_convs=max(2, spec.n_convs // 10),
                            turns_per_conv=spec.turns_per_conv)
    fx = fresh_delta_fixture(corpus, fresh_spec)
    t0 = time.time()
    inc_f = run_linkage_increment(out, fx["delta_transcripts"],
                                  fx["aliases"], fx["graph_edges"], cfg,
                                  redirects_path=fx["redirects"])
    inc_f["clusters"].count()
    queries["er_increment_fresh10"] = round(time.time() - t0, 3)
    t0 = time.time()
    full_f = run_linkage(fx["union_transcripts"], fx["aliases"],
                         fx["graph_edges"], cfg,
                         redirects_path=fx["redirects"])
    full_f["clusters"].count()
    queries["er_full_rerun_fresh10"] = round(time.time() - t0, 3)

    t0 = time.time()
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    exact_dedup(docs, id_col="doc_id").count()
    queries["exact_dedup_docs"] = round(time.time() - t0, 3)

    t0 = time.time()
    minhash_candidates(docs, id_col="doc_id",
                       num_partitions=max(2, num_cpus // 2)).count()
    queries["minhash_candidates_docs"] = round(time.time() - t0, 3)

    from wned_ray.pipelines.datawork import ngram_jaccard_dedup

    t0 = time.time()
    ngram_jaccard_dedup(docs, id_col="doc_id",
                        num_partitions=max(2, num_cpus // 2)).count()
    queries["ngram_jaccard_dedup"] = round(time.time() - t0, 3)

    from wned_ray.pipelines.datawork import bm25_topk

    t0 = time.time()
    bm25_topk(docs, ["hash", "join", "vector", "stream"], k=20).count()
    queries["bm25_docs"] = round(time.time() - t0, 3)

    t0 = time.time()
    import numpy as np
    import pyarrow.parquet as pq

    head = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 8)
    q_ids = np.asarray(head["vec_id"].to_pylist())
    qm = np.asarray(head["embedding"].to_pylist(), dtype=np.float64)
    embs = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    knn_search(embs, q_ids, qm, k=10).count()
    queries["knn_embeddings"] = round(time.time() - t0, 3)

    t0 = time.time()
    from ray.data.aggregate import Count

    (rd.read_parquet(f"{sf_dir}/events.parquet",
                     columns=["user_id", "event_type"])
     .groupby(["user_id", "event_type"]).aggregate(Count(alias_name="w"))
     .count())
    queries["edge_aggregate_events"] = round(time.time() - t0, 3)

    from wned_ray.pipelines.datawork import (asof_join, range_join_count,
                                             sessionize, windowed_aggregate)

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type",
                                  "value"])

    t0 = time.time()
    sessionize(ev, gap_minutes=30.0).count()
    queries["sessionize_events"] = round(time.time() - t0, 3)

    t0 = time.time()
    windowed_aggregate(ev, window_minutes=360.0).count()
    queries["windowed_events"] = round(time.time() - t0, 3)

    t0 = time.time()
    import pyarrow.dataset as pads

    ev_cols = ["event_id", "user_id", "ts", "event_type", "value"]
    purchases = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=ev_cols,
        filter=(pads.field("event_type") == "purchase"))
    clicks = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=ev_cols,
        filter=(pads.field("event_type") == "click"))
    asof_join(purchases, clicks, key_col="user_id", ts_col="ts",
              id_col="event_id").count()
    queries["asof_join_events"] = round(time.time() - t0, 3)

    t0 = time.time()
    range_join_count(purchases, clicks, key_col="user_id", ts_col="ts",
                     id_col="event_id", lo_minutes=60.0).count()
    queries["range_join_events"] = round(time.time() - t0, 3)

    from wned_ray.pipelines.datawork import (group_quantiles, hash_sample,
                                             sliding_window_aggregate)

    t0 = time.time()
    sliding_window_aggregate(ev, width_minutes=360.0,
                             step_minutes=60.0).count()
    queries["sliding_window_events"] = round(time.time() - t0, 3)

    t0 = time.time()
    hash_sample(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"]),
                id_col="doc_id", rate_pct=10.0, seed=7).count()
    queries["hash_sample_docs"] = round(time.time() - t0, 3)

    t0 = time.time()
    group_quantiles(ev, key_col="event_type", val_col="value").count()
    queries["event_value_quantiles"] = round(time.time() - t0, 3)

    from wned_ray.pipelines.datawork import (heavy_hitter_terms,
                                             ordered_window_funcs)

    t0 = time.time()
    heavy_hitter_terms(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                       columns=["text"]),
                       k=8192, min_freq=100).count()
    queries["heavy_hitter_terms"] = round(time.time() - t0, 3)

    t0 = time.time()
    ordered_window_funcs(ev).count()
    queries["window_funcs_events"] = round(time.time() - t0, 3)

    from wned_ray.pipelines.datawork import (group_quantile_sketch,
                                             hll_group_distinct, scrub_pii,
                                             weighted_sample_k)

    t0 = time.time()
    scrub_pii(docs, id_col="doc_id").count()
    queries["scrub_pii_docs"] = round(time.time() - t0, 3)

    t0 = time.time()
    weighted_sample_k(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                      columns=["doc_id", "n_chars"]),
                      id_col="doc_id", weight_col="n_chars", k=64).count()
    queries["weighted_sample_docs"] = round(time.time() - t0, 3)

    t0 = time.time()
    hll_group_distinct(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["event_type", "user_id"]),
        "event_type", "user_id").count()
    queries["hll_group_distinct_users"] = round(time.time() - t0, 3)

    t0 = time.time()
    group_quantile_sketch(ev, "event_type", "value").count()
    queries["quantile_sketch_events"] = round(time.time() - t0, 3)

    from wned_ray.pipelines.datawork import (decontaminate, dup_span_stats,
                                             repetition_signals)
    import pyarrow as _pa

    def _mod10(is_eval: bool):
        def f(batch):
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 10 == 0) if is_eval else (ids % 10 != 0)
            return batch.filter(_pa.array(m))
        return f

    t0 = time.time()
    decontaminate(docs.map_batches(_mod10(False), batch_format="pyarrow"),
                  docs.map_batches(_mod10(True), batch_format="pyarrow"),
                  n=4).count()
    queries["decontaminate_docs"] = round(time.time() - t0, 3)

    t0 = time.time()
    repetition_signals(docs).count()
    queries["repetition_docs"] = round(time.time() - t0, 3)

    t0 = time.time()
    dup_span_stats(docs, n=5).count()
    queries["dup_span_docs"] = round(time.time() - t0, 3)

    from wned_ray.pipelines.datawork import bloom_semi_join

    t0 = time.time()
    bloom_semi_join(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"]),
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"],
                        filter=(pads.field("c_mktsegment") == "BUILDING")),
        on="o_custkey", key_col="c_custkey").count()
    queries["bloom_semi_join_orders"] = round(time.time() - t0, 3)

    # round-4 continuation: relational batch 2 + sequence analytics
    import __ray_entry__ as entry_mod

    t0 = time.time()
    entry_mod._q_multiway_join_revenue(sf_dir).count()
    queries["multiway_join_revenue"] = round(time.time() - t0, 3)

    from wned_ray.pipelines.analytics import (cohort_retention,
                                              funnel_counts, kmeans)

    t0 = time.time()
    funnel_counts(rd.read_parquet(f"{sf_dir}/events.parquet",
                                  columns=["user_id", "ts", "event_type"]),
                  steps=["view", "click", "purchase"]).count()
    queries["funnel_events"] = round(time.time() - t0, 3)

    t0 = time.time()
    cohort_retention(rd.read_parquet(f"{sf_dir}/events.parquet",
                                     columns=["user_id", "ts"])).count()
    queries["cohort_retention"] = round(time.time() - t0, 3)

    t0 = time.time()
    assign, _ = kmeans(rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                                       columns=["vec_id", "embedding"]),
                       k=8, n_iter=5, seed=7)
    assign.count()
    queries["kmeans_embeddings"] = round(time.time() - t0, 3)

    # round-4 continuation 2: order statistics / merge / set ops
    from wned_ray.pipelines.analytics import global_rank

    t0 = time.time()
    global_rank(rd.read_parquet(f"{sf_dir}/events.parquet",
                                columns=["event_id", "value"]),
                "value", "event_id", n_buckets=64).count()
    queries["global_rank_events"] = round(time.time() - t0, 3)

    t0 = time.time()
    entry_mod._q_merge_upsert_orders(sf_dir).count()
    queries["merge_upsert_orders"] = round(time.time() - t0, 3)

    t0 = time.time()
    entry_mod._q_term_entropy_docs(sf_dir).count()
    queries["term_entropy_docs"] = round(time.time() - t0, 3)

    t0 = time.time()
    entry_mod._q_source_vocab_jaccard(sf_dir).count()
    queries["source_vocab_jaccard"] = round(time.time() - t0, 3)

    # round-4 continuation 3: ER-scale blocking + sketch/LM/sim-join ops
    from wned_ray.pipelines.datawork import (bigram_lm_scores,
                                             cms_term_counts,
                                             prefix_jaccard_join)
    from wned_ray.stages.blocking import meta_blocking

    t0 = time.time()
    meta_blocking(docs, "doc_id", "text", scheme="wnp",
                  max_block=32).count()
    queries["meta_blocking_wnp"] = round(time.time() - t0, 3)

    t0 = time.time()
    prefix_jaccard_join(docs, threshold=0.8).count()
    queries["prefix_jaccard_join"] = round(time.time() - t0, 3)

    t0 = time.time()
    bigram_lm_scores(docs).count()
    queries["bigram_lm_docs"] = round(time.time() - t0, 3)

    t0 = time.time()
    cms_term_counts(rd.read_parquet(f"{sf_dir}/documents.parquet",
                                    columns=["text"]),
                    hash_mode="fast").count()
    queries["cms_term_counts"] = round(time.time() - t0, 3)

    t0 = time.time()
    entry_mod._q_time_decay_users(sf_dir).count()
    queries["time_decay_users"] = round(time.time() - t0, 3)

    t0 = time.time()
    entry_mod._q_tfidf_cosine_join(sf_dir).count()
    queries["tfidf_cosine_join"] = round(time.time() - t0, 3)

    t0 = time.time()
    entry_mod._q_edit_distance_join(sf_dir).count()
    queries["edit_distance_join"] = round(time.time() - t0, 3)

    t0 = time.time()
    entry_mod._q_graph_components_parts(sf_dir).count()
    queries["graph_components_parts"] = round(time.time() - t0, 3)

    t0 = time.time()
    entry_mod._q_sortmerge_join_orders(sf_dir).count()
    queries["sortmerge_join_orders"] = round(time.time() - t0, 3)

    # round-5: training-data prep ops (split / packing / mixture / diversity)
    t0 = time.time()
    entry_mod._q_leakage_safe_split_docs(sf_dir).count()
    queries["leakage_safe_split_docs"] = round(time.time() - t0, 3)

    t0 = time.time()
    entry_mod._q_token_budget_chunks_docs(sf_dir).count()
    queries["token_budget_chunks_docs"] = round(time.time() - t0, 3)

    t0 = time.time()
    entry_mod._q_mix_lang_docs(sf_dir).count()
    queries["mix_lang_docs"] = round(time.time() - t0, 3)

    t0 = time.time()
    entry_mod._q_distinct_ngram_ratio_docs(sf_dir).count()
    queries["distinct_ngram_ratio_docs"] = round(time.time() - t0, 3)

    ray.shutdown()
    return {
        "metric": "er_linkage_wall_sec",
        "value": round(t_link, 3),
        "unit": "sec",
        "linkage_runs_sec": runs_sec,          # sorted: [min, median, max]
        "stages": out.get("timings", {}),
        "queries": queries,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "num_cpus": num_cpus,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / t_link, 1),
        "clusters": n_clusters,
    }


def _subprocess_run(ncpu: int, sf_dir: str, scaling: bool = False) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
    if scaling:
        env["GRAFT_SCALING_TIER"] = "1"
        # substage decomposition per leg: scaling samples are the scarce
        # artifact (30-50 min each), so every leg persists its profiling
        # stderr for post-mortem (the [profiling] substage lines locate a
        # serial tail without paying for another sample)
        env["WNED_PROFILE"] = "1"
    out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                         capture_output=True, text=True,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    try:
        with open(f"/tmp/bench_child_cpu{ncpu}.err", "w") as f:
            f.write(out.stderr)
    except OSError:
        pass
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"bench child (cpus={ncpu}) failed rc={out.returncode}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        # default N=2 vs 4N=8 — the BELOW-CEILING pair: on one box, legs
        # past ~8-16 CPUs saturate shared memory bandwidth / object-store
        # throughput (~55-60k turns/s plateau at HEAD speed, BASELINE.md
        # ladder) that a real multi-node cluster scales with node count.
        # Override with GRAFT_SCALE_CPUS="4,16" etc. for ladder points.
        pair = os.environ.get("GRAFT_SCALE_CPUS", "2,8").split(",")
        lo, hi = int(pair[0]), int(pair[1])
        r_lo = _subprocess_run(lo, sf_dir, scaling=True)
        r_hi = _subprocess_run(hi, sf_dir, scaling=True)
        eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": round(eff, 3),
            "unit": "ratio",
            "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
            "cpus_lo": lo, "cpus_hi": hi,
            "turns_per_sec_lo": r_lo["turns_per_sec"],
            "turns_per_sec_hi": r_hi["turns_per_sec"],
            "turns": r_lo["turns"],
            "sf": r_lo["sf"],
            "stages_lo": r_lo.get("stages", {}),
            "stages_hi": r_hi.get("stages", {}),
        }))
        return
    if "--once" in sys.argv:
        os.environ["GRAFT_BENCH_ONCE"] = "1"
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    print(json.dumps(run_bench(sf_dir, ncpu)))


if __name__ == "__main__":
    main()
