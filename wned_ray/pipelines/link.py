"""End-to-end record-linkage pipeline (SURVEY §7 build plan).

read_parquet(transcripts)
  → prepare            (stateless map_batches: mention extract + normalize)
  → block              (stateless map_batches: MinHash/LSH band explode)
  → [checkpoint]       (per-stage Parquet + lineage manifest; also enables
                        the two-pass hot-key scan without recompute)
  → hot-key scan       (pre-aggregated count → broadcast hot-key set)
  → gen_pairs          (hash-partitioned self-join shuffle + cross-band dedup;
                        norm-level features scored on the DISTINCT-norm pair
                        set by the NormPairScorer actor pool — alias dict +
                        CSR graph via ray.put broadcast, loaded once per
                        actor — and carried through the expand joins)
  → finalize_scores    (stateless vectorized local-context cosine + fusion)
  → [checkpoint]
  → assign_clusters    (connected components + singleton completion)
  → [checkpoint]

The driver owns the Ray session; nothing here calls ray.init().
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from wned_ray.config import PipelineConfig
from wned_ray.stages.blocking import hot_block_keys, norm_blocks
from wned_ray.stages.cluster import assign_clusters
from wned_ray.stages.normalize import prepare
from wned_ray.stages.pairs import gen_pairs
from wned_ray.stages.scoring import finalize_scores
from wned_ray.state.checkpoint import checkpoint_dataset, lineage_fingerprint


def run_linkage(transcripts_path: str, aliases_path: str,
                graph_path: str | None, cfg: PipelineConfig,
                cc_mode: str = "auto", num_partitions: int | None = None,
                redirects_path: str | None = None):
    """Run the full pipeline; returns dict of Datasets:
    ``{"prepared", "pairs", "scores", "clusters"}``.

    With ``cfg.checkpoint_dir`` set, each wide stage writes a Parquet
    checkpoint + manifest and a rerun resumes from the last complete
    stage (kill/rerun test in tests/test_pipeline_e2e.py).
    """
    import ray
    import ray.data as rd
    from ray.data import DataContext

    # Fractional CPU per hash-shuffle aggregator partition: with several
    # joins in flight, integral per-actor reservations can sum past the
    # cluster and no pool ever completes (executor livelock). 0.25 lets
    # every pool spawn fully and oversubscribe gracefully — on a large
    # cluster the pools spread across nodes and the override is harmless.
    ctx = DataContext.get_current()
    if ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override is None:
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.25
    if ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override is None:
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.25

    if num_partitions is None:
        # Shuffle partitions are sized to the DATA, not the cluster: every
        # Dataset.join spawns num_partitions aggregator actors, so tying
        # this to CPU count makes a 32-CPU run pay 4x the actor-spawn +
        # coordination overhead of an 8-CPU run on identical input (it
        # measurably INVERTED scaling on the 500k-turn bench). ~64 MB of
        # input per partition, floor 8; multi-node jobs on much larger
        # input get proportionally more partitions from the same rule.
        try:
            input_bytes = os.path.getsize(transcripts_path)
        except OSError:
            input_bytes = 0
        cluster_cpus = int(ray.cluster_resources().get("CPU", 4))
        # ~8 MB of compressed transcript input per partition: the shuffled
        # volume (blocking rows, expanded pairs with context payloads) is
        # an order of magnitude larger than the input, so 64 MB/partition
        # left the heaviest joins running through a handful of aggregator
        # actors. Capped at cluster_cpus // 4 with floor 8: concurrent
        # aggregator pools that together reserve the whole cluster
        # livelock the executor (observed at 8M turns / 32 CPUs: 4 joins
        # x 32 partitions, zero progress) — but with the star-expansion
        # joins replaced by broadcast attaches at most ~3 aggregates
        # overlap, so a floor of 8 (8 x 0.25 CPU per pool) is safe down
        # to 8-CPU sessions and keeps the shuffle WIDTH identical across
        # cluster sizes — a 4-partition low leg measurably serialized
        # the blocking exchange relative to the same data at 32 CPUs.
        # floor capped by cluster CPUs: an 8-partition floor on a 4-CPU
        # session livelocks the (rep_broadcast_max-exceeded) join
        # fallback — its up-to-4 concurrent join pools would reserve
        # 2x the cluster
        num_partitions = max(2, min(max(min(8, cluster_cpus),
                                        cluster_cpus // 4),
                                    max(8, input_bytes // (8 << 20))))

    ckpt = cfg.checkpoint_dir
    base_fp = lineage_fingerprint(cfg.fingerprint(), transcripts_path,
                                  aliases_path, graph_path or "-",
                                  redirects_path or "-")

    timings: dict[str, float] = {}

    # Per-partition manifest metrics (north_rule: per-partition pair /
    # score / cluster metrics ride the lineage manifests). Computed from
    # a slim column re-read of each written part file — never a second
    # full pass over the stage output.
    def _scores_metrics(t) -> dict:
        import pyarrow.compute as pc

        n = t.num_rows
        matched = int(pc.sum(pc.cast(t["matched"], pa.int64())).as_py() or 0)
        return {"pairs": n, "matched": matched,
                "matched_rate": round(matched / n, 6) if n else 0.0}

    def _clusters_metrics(t) -> dict:
        import pyarrow.compute as pc

        n = t.num_rows
        singles = int(pc.sum(pc.cast(
            pc.equal(t["mention_id"], t["cluster_id"]),
            pa.int64())).as_py() or 0)
        return {"mentions": n, "singletons": singles,
                "matched_mentions": n - singles}

    stage_metrics = {
        "scores": (_scores_metrics, ["matched"]),
        "clusters": (_clusters_metrics, ["mention_id", "cluster_id"]),
    }

    def persist(factory, stage):
        """Pin a fan-out point: Parquet checkpoint when ckpt_dir is set
        (disk, resumable), else object-store materialize (spillable).
        Every dataset below is consumed by more than one downstream branch;
        leaving them lazy would re-execute the whole upstream per consumer.
        Emits one [profiling] stderr line per stage (the reference logs the
        same way, SemanticSignatureEL.java:584-709)."""
        import sys
        import time

        t0 = time.time()
        if ckpt:
            pm, cols = stage_metrics.get(stage, (None, None))
            out = checkpoint_dataset(
                factory, stage=stage, ckpt_dir=ckpt,
                fingerprint=lineage_fingerprint(base_fp, stage),
                partition_metrics=pm, metrics_columns=cols)
        else:
            out = factory().materialize()
        timings[stage] = round(time.time() - t0, 2)
        print(f"[profiling] linkage stage={stage} sec={time.time() - t0:.1f}",
              file=sys.stderr)
        return out

    # explicit read split: Ray's default sizes read tasks for ~128MB
    # output blocks, which fuses the read+prepare map into a handful of
    # tasks and caps the first stage's parallelism regardless of CPUs
    read_blocks = max(4 * num_partitions, 64)
    prepared = persist(
        lambda: prepare(rd.read_parquet(transcripts_path,
                                        override_num_blocks=read_blocks),
                        cfg),
        "prepared")

    # blocking runs over DISTINCT normalized surfaces (see stages/blocking.py)
    blocking = persist(lambda: norm_blocks(prepared, cfg), "blocking")

    import sys
    import time as _time

    _t0 = _time.time()
    hot = hot_block_keys(blocking, cfg)
    timings["hot_keys"] = round(_time.time() - _t0, 2)
    print(f"[profiling] linkage stage=hot_keys sec={timings['hot_keys']:.1f}",
          file=sys.stderr)

    # broadcast dim tables once (zero-copy object-store reads per actor).
    # Redirect composition (J6, KBExtractor.resolveRedirect) happens here,
    # on the vocabulary-sized dim table, before the broadcast — variant
    # surfaces that only exist as redirects reach their canonical entity.
    _t0 = _time.time()
    alias_table = pq.read_table(aliases_path)
    if redirects_path:
        from wned_ray.stages.aliases import resolve_redirects_table

        alias_table = resolve_redirects_table(
            alias_table, pq.read_table(redirects_path))
    if cfg.mine_anchor_aliases:
        # M3/M5: mine [[target|anchor]] alias pairs from the corpus and
        # union them into the dim table (KBExtractor's anchor source,
        # online analog). The mined result is vocabulary-sized — same
        # class as the alias dim itself — so the driver-side merge is
        # the established dim-table pattern, not a data-sized collect.
        from wned_ray.stages.aliases import merge_alias_tables, mine_anchor_aliases

        mined = mine_anchor_aliases(
            rd.read_parquet(transcripts_path, columns=["text"],
                            override_num_blocks=read_blocks)).materialize()
        # Cap discipline (round-4 VERDICT minor #6): the mined table is
        # vocabulary-sized by argument but was an uncapped driver
        # collect. The merged dim must fit the ray.put broadcast budget
        # regardless, so past the cap the fallback keeps the TOP-cap
        # mined pairs by freq (distributed sort + limit — the hottest
        # anchor evidence) rather than pretending an unbroadcastable
        # dim could work downstream; a warning records the truncation.
        n_mined = mined.count()
        if n_mined > cfg.alias_mined_max_rows:
            import warnings

            warnings.warn(
                f"mine_anchor_aliases produced {n_mined} rows > "
                f"alias_mined_max_rows={cfg.alias_mined_max_rows}; "
                f"keeping only the top-{cfg.alias_mined_max_rows} by freq")
            mined = mined.sort(["freq", "entity", "alias"],
                               descending=[True, False, False]
                               ).limit(cfg.alias_mined_max_rows)
        mined_t = pa.concat_tables(
            [t for t in ray.get(mined.to_arrow_refs())
             if t.num_rows > 0]) if n_mined else None
        if mined_t is not None:
            alias_table = merge_alias_tables(alias_table, mined_t)
    alias_ref = ray.put(alias_table)
    graph_ref = ray.put(pq.read_table(graph_path)) if graph_path else None
    timings["broadcast"] = round(_time.time() - _t0, 2)
    print(f"[profiling] linkage stage=broadcast "
          f"sec={timings['broadcast']:.1f}", file=sys.stderr)

    # Pair expansion and scoring run FUSED: gen_pairs scores the norm-level
    # features (prior/sem/name/lev) on the tiny DISTINCT-norm pair set, the
    # expand joins carry them to mention pairs, and finalize_scores (local
    # context cosine + fusion) chains as map_batches directly on the join
    # output — the wide intermediate (ctx strings per pair) streams through
    # task memory and is never materialized to the object store. Only the
    # slim scored table persists.
    scores = persist(
        lambda: finalize_scores(
            gen_pairs(prepared, blocking, hot, cfg,
                      num_partitions=num_partitions,
                      alias_ref=alias_ref, graph_ref=graph_ref),
            cfg),
        "scores")

    pairs = scores.select_columns(["id_a", "id_b", "block_key"])

    matched = scores.filter(expr="matched")

    clusters = persist(
        lambda: assign_clusters(prepared, matched, cfg, mode=cc_mode,
                                num_partitions=num_partitions),
        "clusters")

    return {"prepared": prepared, "blocking": blocking, "pairs": pairs,
            "scores": scores, "clusters": clusters, "timings": timings}
