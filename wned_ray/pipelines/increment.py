"""Incremental record linkage: link a DELTA of new transcripts against an
already-linked base WITHOUT re-scoring the base corpus.

At 100 TB the corpus is append-mostly: a day's new conversations are a
small fraction of the linked history. A full rerun re-pays prepare +
blocking + pair scoring over everything; this pipeline pays only

  prepare(delta)                          |delta| rows
  norm_blocks(delta)                      |delta vocab| rows
  blocking merge (groupby over base+delta
    blocking tables)                      |vocab x bands| rows — the slim
                                          stage, never the mention table
  pair gen + scoring                      pairs touching >=1 delta (or
                                          dirty) mention, inside delta-
                                          touched + dirty block keys
  cluster merge                           ONE connected-components pass
                                          over the slim matched-edge
                                          union (repaired base edges +
                                          new edges)

Correctness vs a full rerun of base+delta (asserted by
tests/test_increment.py and the ``er_increment`` gate — EXACT agreement
at both test tiers): pair features are corpus-independent (alias prior /
CSR graph dims, pair-local string + context kernels), hot keys are
recomputed on the MERGED blocking weights, per-norm ``n_mentions`` /
``rep_id`` merge associatively (Sum / Min), and HOT-FLIP REPAIR makes
the corpus-size-dependent skew cap incremental too: block weights only
grow, so ``hot(base) ⊆ hot(merged)``; norms touching a key in the
difference ("dirty") have ALL their pairs re-derived under merged
hotness and their base edges dropped — without it, base-time merges
through newly-hot blocks survive that a full rerun would not make
(measured 4.3% divergence at the t2 tier; 0.2% more from repairing by
single kept block key instead of whole norms). Two documented residual
divergences: (a) corpus-wide norm promotion (``cfg.global_promote``)
sees only the delta during incremental prepare — run with it off, or
accept borderline-promotion drift; (b) the fuzzy tier's per-surface
top-n union ranks within a candidate set that differs from the full
run's for clean base surfaces (no delta/dirty side) — kept pairs can
differ at the top-n boundary; none occur on the test tiers and the
score threshold still gates matches.

Cluster-id stability: base cluster ids are min-member mention ids, so the
merged component root min(base cluster ids, delta mention ids) equals the
full run's min-member id.
"""

from __future__ import annotations

import sys
import time

import pyarrow as pa
import pyarrow.compute as pc

from wned_ray.config import PipelineConfig
from wned_ray.stages.blocking import hot_block_keys, norm_blocks
from wned_ray.stages.normalize import prepare
from wned_ray.stages.pairs import gen_pairs
from wned_ray.stages.scoring import finalize_scores


def _keep_touching_ids(ids_ref):
    """Mention-level correctness filter: keep a pair only when at least
    one endpoint is a delta mention (base-base mention pairs inside a
    shared norm were already decided by the base run)."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        mask = pc.or_(pc.is_in(batch["id_a"], value_set=ids),
                      pc.is_in(batch["id_b"], value_set=ids))
        return batch.filter(mask)

    return fn


def merge_blocking(base_blocking, delta_blocking):
    """Merge two distinct-norm blocking tables associatively: per
    (norm, block_key, band) the mention weight SUMS and the representative
    id takes the MIN — exactly what ``norm_blocks`` over the concatenated
    corpora would produce. One shuffle over the slim vocab-sized table."""
    from ray.data.aggregate import Min, Sum

    merged = (base_blocking.union(delta_blocking)
              .groupby(["norm_mention", "block_key", "band_idx"])
              .aggregate(Sum("n_mentions", alias_name="n_mentions"),
                         Min("rep_id", alias_name="rep_id")))
    return merged


_BLOCK_COLS = ["norm_mention", "n_mentions", "rep_id", "block_key",
               "band_idx"]


def _gather_blocking(ds) -> pa.Table:
    """Zero-copy gather of a (materialized, vocab-sized) blocking Dataset
    to one driver Arrow table — same collect discipline as
    ``hot_block_keys``'s fast path (stages/blocking.py:148-158)."""
    import ray

    blocks = [b for b in ray.get(ds.to_arrow_refs())
              if b.num_columns > 0 and b.num_rows > 0]
    if not blocks:
        return pa.table({"norm_mention": pa.array([], pa.string()),
                         "n_mentions": pa.array([], pa.int64()),
                         "rep_id": pa.array([], pa.string()),
                         "block_key": pa.array([], pa.int64()),
                         "band_idx": pa.array([], pa.int32())})
    return (pa.concat_tables([b.select(_BLOCK_COLS) for b in blocks])
            .combine_chunks())


def _merge_touch_driver(base_t: pa.Table, delta_t: pa.Table,
                        cfg: PipelineConfig):
    """Driver twin of {merge_blocking + hot/flip/dirty/touched pruning}
    for vocabulary-sized blocking tables: identical semantics in one
    pass of Arrow/numpy kernels (no pandas — a pandas groupby + Python-
    set ``isin`` over ~300k rows measured 6.5 s where the Arrow form is
    <0.3 s). The distributed form pays four hash-shuffle waves (merge
    groupby, two hot-key scans, delta-key groupby + join) whose
    aggregator-spawn overhead dwarfs the data below the driver cap —
    the same switch discipline as ``norm_pairs``'s fast path
    (stages/pairs.py:212-243); the distributed path below remains for
    blocking tables past ``cfg.blocking_merge_driver_max_rows``.

    Returns (hot: set, dirty_norms_t, touched: pa.Table, delta_norms_t).
    """
    import numpy as np

    g = (pa.concat_tables([base_t, delta_t])
         .group_by(["norm_mention", "block_key", "band_idx"])
         .aggregate([("n_mentions", "sum"), ("rep_id", "min")]))
    merged = pa.table({
        "norm_mention": g["norm_mention"],
        "n_mentions": g["n_mentions_sum"],
        "rep_id": g["rep_id_min"],
        "block_key": g["block_key"],
        "band_idx": g["band_idx"],
    })

    def _hot(keys_col, w_col) -> set:
        # same np.unique/bincount reduction as hot_block_keys' fast
        # path (stages/blocking.py:148-170); float64 sums exact < 2^53
        keys = keys_col.combine_chunks().to_numpy(zero_copy_only=False)
        w = w_col.combine_chunks().to_numpy(zero_copy_only=False)
        if keys.size == 0:
            return set()
        uk, inv = np.unique(keys, return_inverse=True)
        sums = np.bincount(inv, weights=w)
        return set(uk[sums > cfg.max_block_size].tolist())

    hot = _hot(merged["block_key"], merged["n_mentions"])
    flipped = hot - _hot(base_t["block_key"], base_t["n_mentions"])
    if flipped:
        fl = pa.array(sorted(flipped), pa.int64())
        dirty = pc.unique(pc.filter(
            merged["norm_mention"],
            pc.is_in(merged["block_key"], value_set=fl)))
        dirty = dirty.take(pc.sort_indices(dirty))
    else:
        dirty = pa.array([], pa.string())
    dirty_norms_t = pa.table({"norm_mention": dirty})

    touch = pc.is_in(merged["block_key"],
                     value_set=pc.unique(delta_t["block_key"]))
    if len(dirty):
        dirty_keys = pc.unique(pc.filter(
            merged["block_key"],
            pc.is_in(merged["norm_mention"], value_set=dirty)))
        touch = pc.or_(touch, pc.is_in(merged["block_key"],
                                       value_set=dirty_keys))
    touched = merged.filter(touch).combine_chunks()
    delta_norms_t = pa.table(
        {"norm_mention": pc.unique(delta_t["norm_mention"])})
    return hot, dirty_norms_t, touched, delta_norms_t, merged


def _driver_backed(tbl: pa.Table):
    """Ship a driver-built Arrow table as a Ray Dataset in ~4x-CPU
    self-contained chunks so downstream per-block parallelism fans out
    (same shape as stages/pairs.py:230-242)."""
    import ray
    import ray.data as rd

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    nchunks = max(1, min(max(tbl.num_rows, 1), 4 * ncpu))
    step = (tbl.num_rows + nchunks - 1) // nchunks
    chunks = [tbl.slice(i * step, step).combine_chunks()
              for i in range(nchunks) if i * step < tbl.num_rows]
    out = rd.from_arrow(chunks if chunks else tbl)
    out._wned_driver_backed = True
    return out


def run_linkage_increment(base: dict, delta_transcripts_path: str,
                          aliases_path: str, graph_path: str | None,
                          cfg: PipelineConfig,
                          num_partitions: int | None = None,
                          redirects_path: str | None = None,
                          cc_mode: str = "auto"):
    """Link ``delta_transcripts_path`` against an existing linkage result.

    ``base``: the dict returned by ``run_linkage`` (or rebuilt from its
    checkpoints) — needs ``prepared``, ``blocking`` and ``clusters``.

    Returns ``{"prepared" (delta), "scores" (delta-touching pairs),
    "clusters" (FULL merged assignment), "timings", "state"}`` where
    ``state`` has ``run_linkage``'s output shape (merged prepared /
    blocking / scores / clusters) so the next delta chains:
    ``run_linkage_increment(prev["state"], next_delta, ...)``.

    Driver-state bounds: the delta's distinct norms and mention ids are
    broadcast via ``ray.put`` only below
    ``cfg.increment_broadcast_max_rows``; past the cap every membership
    filter switches to a distributed marker semi-join
    (``util.semi_join_or_filter``) and nothing delta-sized touches the
    driver. (Past ~10% of the corpus the full rerun's simpler plan wins
    anyway — the cap keeps the increment CORRECT, not optimal, for
    oversized deltas.)
    """
    import ray
    import ray.data as rd

    timings: dict[str, float] = {}
    if num_partitions is None:
        cluster_cpus = int(ray.cluster_resources().get("CPU", 4))
        num_partitions = max(2, min(8, cluster_cpus))

    def _prof(stage, t0):
        timings[stage] = round(time.time() - t0, 2)
        print(f"[profiling] increment stage={stage} "
              f"sec={timings[stage]:.1f}", file=sys.stderr)

    t0 = time.time()
    # explicit read split, same reason as run_linkage: Ray sizes read
    # tasks for ~128MB output blocks, so a delta-sized file arrives as
    # 1-2 blocks and the prepare map (+ the promotion shuffle behind it)
    # runs nearly serial regardless of CPUs
    delta_prepared = prepare(
        rd.read_parquet(delta_transcripts_path,
                        override_num_blocks=max(4 * num_partitions, 32)),
        cfg).materialize()
    _prof("prepared", t0)

    n_delta = delta_prepared.count()
    if n_delta == 0:
        # empty delta: the merged assignment IS the base assignment
        # (an empty dataset has no schema to shuffle/groupby on)
        return {"prepared": delta_prepared, "scores": None,
                "clusters": base["clusters"], "timings": timings,
                "state": base}

    t0 = time.time()
    delta_blocking = norm_blocks(delta_prepared, cfg).materialize()
    n_block_rows = base["blocking"].count() + delta_blocking.count()
    if n_block_rows <= cfg.blocking_merge_driver_max_rows:
        # Vocabulary-sized fast path: merge + hot/flip/dirty/touched in
        # one driver pass (see _merge_touch_driver) — no shuffle waves.
        (hot, dirty_norms_t, touched_t, delta_norms,
         merged_t) = _merge_touch_driver(
            _gather_blocking(base["blocking"]),
            _gather_blocking(delta_blocking), cfg)
        touched_blocking = _driver_backed(touched_t)
        touched_norms = pc.unique(touched_t["norm_mention"])
        merged_blocking = _driver_backed(merged_t)   # chain state
        use_broadcast = True       # already under the driver-merge cap
        keep_norms_ds = keep_ids_ds = dirty_ids_ds = None
    else:
        combined_blocking = merge_blocking(
            base["blocking"], delta_blocking).materialize()
        hot = hot_block_keys(combined_blocking, cfg)

        # Hot-flip dirty set: block weights only GROW with the delta, so
        # hot(base) ⊆ hot(merged); every key in the difference was
        # pair-generating at base time but is excluded by a full rerun.
        # Norms touching a flipped key are DIRTY — all their pairs are
        # re-derived in this pass under merged hotness (their base edges
        # are dropped below). Without this, base-time merges through
        # newly-hot blocks survive that a full rerun would not make
        # (measured 4.3% assignment divergence at the t2 tier), and
        # dropping base edges by their single kept block key instead of
        # whole norms over-drops multi-band pairs (0.2%).
        hot_base = hot_block_keys(base["blocking"], cfg)
        flipped = hot - hot_base
        delta_norms_ds = (delta_blocking.groupby("norm_mention").count()
                          .select_columns(["norm_mention"]).materialize())
        dirty_norms_ds = None
        keep_norms_ds = None
        dirty_ids_ds = None
        if flipped:
            flipped_arr = pa.array(sorted(flipped), pa.int64())

            def _in_flipped(batch: pa.Table) -> pa.Table:
                return batch.filter(
                    pc.is_in(batch["block_key"], value_set=flipped_arr))

            dnd = (combined_blocking.map_batches(_in_flipped,
                                                 batch_format="pyarrow")
                   .groupby("norm_mention").count()
                   .select_columns(["norm_mention"]).materialize())
            if dnd.count() > 0:
                dirty_norms_ds = dnd

        # Norm keep-set cap (round-4 VERDICT #4): the delta/dirty NORM
        # sets are vocabulary-sized — past the cap nothing norm-sized
        # is collected and the norm filters switch to marker
        # semi-joins (util.semi_join_or_filter). The MENTION-ID sets
        # get their own cap decision below, common to both branches.
        n_keep = (delta_norms_ds.count()
                  + (dirty_norms_ds.count() if dirty_norms_ds else 0))
        use_broadcast = n_keep <= cfg.increment_broadcast_max_rows

        dirty_norms_t = pa.table(
            {"norm_mention": pa.array([], pa.string())})
        if dirty_norms_ds is not None and use_broadcast:
            dirty_norms_t = pa.concat_tables(
                [t for t in ray.get(dirty_norms_ds.to_arrow_refs())
                 if t.num_rows > 0]).combine_chunks()

        # prune the pair self-join to block keys the delta (or a dirty
        # norm) actually touches
        delta_keys = (delta_blocking.groupby("block_key").count()
                      .select_columns(["block_key"]))
        if dirty_norms_ds is not None:
            if use_broadcast:
                dn_arr = dirty_norms_t["norm_mention"].combine_chunks()

                def _of_dirty(batch: pa.Table) -> pa.Table:
                    return batch.filter(
                        pc.is_in(batch["norm_mention"], value_set=dn_arr))

                dirty_sel = combined_blocking.map_batches(
                    _of_dirty, batch_format="pyarrow")
            else:
                from wned_ray.util import semi_join_or_filter

                dirty_sel = semi_join_or_filter(
                    combined_blocking.select_columns(
                        ["norm_mention", "block_key"]),
                    ["norm_mention"], dirty_norms_ds, "norm_mention",
                    num_partitions=num_partitions)
            dirty_keys = dirty_sel.select_columns(["block_key"])
            delta_keys = (delta_keys.union(dirty_keys)
                          .groupby("block_key").count()
                          .select_columns(["block_key"]))
        # materialize: gen_pairs consumes the touched blocking table more
        # than once (norm-pair gen + star expansion); left lazy, each
        # consumer would re-execute this join AND the merge groupby
        # behind it (measured as the dominant cost of the distributed
        # path at the 8M-turn tier before the pin)
        touched_blocking = combined_blocking.join(
            delta_keys, join_type="inner", num_partitions=num_partitions,
            on=("block_key",)).materialize()
        delta_norms = (pa.concat_tables(
            [t for t in ray.get(delta_norms_ds.to_arrow_refs())
             if t.num_rows > 0]).combine_chunks()
            if use_broadcast else None)
        touched_norms = None
        merged_blocking = combined_blocking          # chain state
        if not use_broadcast:
            # distributed norm keep set + dirty mention ids stay
            # Datasets; consumers semi-join them
            from wned_ray.util import semi_join_or_filter

            keep_norms_ds = delta_norms_ds
            if dirty_norms_ds is not None:
                keep_norms_ds = (delta_norms_ds.union(dirty_norms_ds)
                                 .groupby("norm_mention").count()
                                 .select_columns(["norm_mention"])
                                 .materialize())
                dirty_ids_ds = (semi_join_or_filter(
                    base["prepared"].select_columns(
                        ["mention_id", "norm_mention"]),
                    ["norm_mention"], dirty_norms_ds, "norm_mention",
                    num_partitions=num_partitions)
                    .select_columns(["mention_id"]).materialize())
    _prof("blocking", t0)

    # ---- keep sets ---------------------------------------------------
    # Norm sets broadcast only under `use_broadcast` (both branches'
    # norm tables are vocabulary-cap-bounded). The MENTION-ID sets get
    # an INDEPENDENT cap decision here — a delta with a tiny vocabulary
    # but hundreds of millions of mentions must not collect its id set
    # just because the blocking merge took the driver branch
    # (code-review finding on round-5's first cap cut).
    t0 = time.time()
    norm_keep_ref = None
    if use_broadcast:
        keep_norms = pa.concat_tables(
            [delta_norms, dirty_norms_t]).combine_chunks()
        norm_keep_ref = ray.put(keep_norms["norm_mention"].combine_chunks())

    # dirty mention ids as a DATASET first; collected only under the cap
    if dirty_ids_ds is None and use_broadcast and len(dirty_norms_t):
        dn_arr = dirty_norms_t["norm_mention"].combine_chunks()

        def _mention_of_dirty(batch: pa.Table) -> pa.Table:
            return (batch.filter(pc.is_in(batch["norm_mention"],
                                          value_set=dn_arr))
                    .select(["mention_id"]))

        dirty_ids_ds = (base["prepared"]
                        .select_columns(["mention_id", "norm_mention"])
                        .map_batches(_mention_of_dirty,
                                     batch_format="pyarrow")
                        .materialize())
    n_dirty_ids = dirty_ids_ds.count() if dirty_ids_ds is not None else 0
    ids_broadcast = ((n_delta + n_dirty_ids)
                     <= cfg.increment_broadcast_max_rows)

    delta_ids_ref = None
    dirty_ids_arr = pa.array([], pa.string())
    if ids_broadcast:
        def _gather_ids(d):
            ts = [t for t in ray.get(d.to_arrow_refs()) if t.num_rows > 0]
            return (pa.concat_tables(ts).combine_chunks() if ts
                    else pa.table({"mention_id": pa.array([],
                                                          pa.string())}))

        delta_ids = _gather_ids(
            delta_prepared.select_columns(["mention_id"]))
        dirty_ids_t = (_gather_ids(dirty_ids_ds)
                       if dirty_ids_ds is not None
                       else pa.table({"mention_id": pa.array(
                           [], pa.string())}))
        keep_ids = pa.concat_tables(
            [delta_ids.select(["mention_id"]),
             dirty_ids_t.select(["mention_id"])]).combine_chunks()
        delta_ids_ref = ray.put(keep_ids["mention_id"].combine_chunks())
        dirty_ids_arr = dirty_ids_t["mention_id"].combine_chunks()
    else:
        keep_ids_ds = delta_prepared.select_columns(["mention_id"])
        if dirty_ids_ds is not None:
            keep_ids_ds = keep_ids_ds.union(dirty_ids_ds)

    import pyarrow.parquet as pq

    alias_table = pq.read_table(aliases_path)
    if redirects_path:
        from wned_ray.stages.aliases import resolve_redirects_table

        alias_table = resolve_redirects_table(
            alias_table, pq.read_table(redirects_path))
    alias_ref = ray.put(alias_table)
    graph_ref = ray.put(pq.read_table(graph_path)) if graph_path else None
    _prof("broadcast", t0)

    t0 = time.time()
    full_prepared = base["prepared"].union(delta_prepared)
    mentions = full_prepared
    if touched_norms is not None:
        # every rep/member the expansion needs belongs to a norm present
        # in the touched blocking table, so the star expansion's two
        # mention passes (ctx-dim collect + exact-member emit,
        # stages/pairs.py:414-526) scan |touched-norm mentions| instead
        # of the whole corpus — the last full-corpus-sized cost in the
        # increment's pair path (the filter itself is one streaming scan)
        tn_ref = ray.put(touched_norms)

        def _of_touched_norm(batch: pa.Table) -> pa.Table:
            import ray as _ray
            return batch.filter(pc.is_in(batch["norm_mention"],
                                         value_set=_ray.get(tn_ref)))

        mentions = mentions.map_batches(_of_touched_norm,
                                        batch_format="pyarrow")
    pairs = gen_pairs(mentions, touched_blocking, hot, cfg,
                      num_partitions=num_partitions,
                      alias_ref=alias_ref, graph_ref=graph_ref,
                      norm_keep_ref=norm_keep_ref,
                      norm_keep_ds=None if use_broadcast else keep_norms_ds)
    if ids_broadcast:
        pairs = pairs.map_batches(_keep_touching_ids(delta_ids_ref),
                                  batch_format="pyarrow")
    else:
        from wned_ray.util import semi_join_or_filter

        pairs = semi_join_or_filter(pairs, ["id_a", "id_b"], keep_ids_ds,
                                    "mention_id",
                                    num_partitions=num_partitions)
    scores = finalize_scores(pairs, cfg).materialize()
    _prof("scores", t0)

    # ---- cluster merge -----------------------------------------------
    # Every base edge touching a DIRTY mention is dropped: its pair
    # universe was re-derived above under merged hotness (via all bands,
    # not the single kept min key), so the regenerated decisions replace
    # the stale base ones wholesale.
    t0 = time.time()
    new_edges = scores.filter(expr="matched").select_columns(["id_a", "id_b"])
    base_edges = base["scores"].filter(expr="matched").select_columns(
        ["id_a", "id_b"])
    if len(dirty_ids_arr):
        def _drop_dirty(batch: pa.Table) -> pa.Table:
            mask = pc.or_(
                pc.is_in(batch["id_a"], value_set=dirty_ids_arr),
                pc.is_in(batch["id_b"], value_set=dirty_ids_arr))
            return batch.filter(pc.invert(mask))

        base_edges = base_edges.map_batches(_drop_dirty,
                                            batch_format="pyarrow")
    elif not ids_broadcast and dirty_ids_ds is not None:
        from wned_ray.util import semi_join_or_filter

        base_edges = semi_join_or_filter(
            base_edges, ["id_a", "id_b"], dirty_ids_ds, "mention_id",
            num_partitions=num_partitions, keep=False)

    # CC over the SLIM matched-edge union (|matched| = O(mentions) after
    # blocking + threshold prune — the cheap stage of a full run), then
    # the same assignment pass run_linkage uses. Base prepare/blocking/
    # scoring — the expensive stages — are never re-paid.
    from wned_ray.stages.cluster import assign_clusters

    all_mentions = (base["prepared"].select_columns(["mention_id"])
                    .union(delta_prepared.select_columns(["mention_id"])))
    clusters = assign_clusters(all_mentions, base_edges.union(new_edges),
                               cfg, mode=cc_mode,
                               num_partitions=num_partitions)
    _prof("clusters", t0)

    # Chainable state: the same shape run_linkage returns, so the NEXT
    # delta can pass it straight back as ``base`` (append-mostly corpora
    # take increments day after day, not once). ``scores`` drops the
    # dirty-mention rows wholesale — their pair universe was re-derived
    # above — so filter(matched) over the state equals exactly the edge
    # union the merged clusters were built from. The unions are LAZY
    # views over materialized parents (O(delta) now); a production chain
    # should checkpoint the state every K increments to keep lineage
    # flat (state/checkpoint.py), same discipline as run_linkage's
    # per-stage pins.
    state_scores = base["scores"]
    if len(dirty_ids_arr):
        def _drop_dirty_rows(batch: pa.Table) -> pa.Table:
            mask = pc.or_(
                pc.is_in(batch["id_a"], value_set=dirty_ids_arr),
                pc.is_in(batch["id_b"], value_set=dirty_ids_arr))
            return batch.filter(pc.invert(mask))

        state_scores = state_scores.map_batches(_drop_dirty_rows,
                                                batch_format="pyarrow")
    elif not ids_broadcast and dirty_ids_ds is not None:
        from wned_ray.util import semi_join_or_filter

        state_scores = semi_join_or_filter(
            state_scores, ["id_a", "id_b"], dirty_ids_ds, "mention_id",
            num_partitions=num_partitions, keep=False)
    state = {"prepared": full_prepared, "blocking": merged_blocking,
             "scores": state_scores.union(scores), "clusters": clusters}

    return {"prepared": delta_prepared, "scores": scores,
            "clusters": clusters, "timings": timings, "state": state}


def save_linkage_state(state: dict, ckpt_dir: str) -> None:
    """Flatten a linkage / increment-chain state to partitioned Parquet.

    Each increment returns lazy unions layered over its base's datasets;
    chained day after day that lineage grows without bound (every
    consumer re-walks it) and dies with the driver. Writing the four
    state tables out flattens the lineage to a disk checkpoint a NEW
    driver can resume from (``load_linkage_state``) — the production
    cadence is an append-mostly corpus checkpointing every K increments
    (module docstring).

    Layout: one directory per table (``prepared/`` ``blocking/``
    ``scores/`` ``clusters/``), written by ``Dataset.write_parquet`` —
    many files, distributed, no driver materialization. The manifest
    (``_STATE.json``) is written LAST, so a killed save is invisible to
    the loader and simply retried whole; a stale partial directory is
    cleared before rewrite.
    """
    import json
    import os
    import shutil

    tables = ["prepared", "blocking", "scores", "clusters"]
    os.makedirs(ckpt_dir, exist_ok=True)
    manifest = os.path.join(ckpt_dir, "_STATE.json")
    if os.path.exists(manifest):
        os.remove(manifest)
    for t in tables:
        d = os.path.join(ckpt_dir, t)
        if os.path.exists(d):
            shutil.rmtree(d)
        state[t].write_parquet(d)
    with open(manifest, "w") as f:
        json.dump({"tables": tables, "format": 1}, f)


def load_linkage_state(ckpt_dir: str) -> dict:
    """Rehydrate a ``save_linkage_state`` checkpoint as a ``base`` dict
    ``run_linkage_increment`` (or any downstream consumer of
    ``run_linkage``'s output shape) accepts. Datasets are lazy Parquet
    reads — nothing is materialized here."""
    import json
    import os

    import ray.data as rd

    manifest = os.path.join(ckpt_dir, "_STATE.json")
    with open(manifest) as f:
        meta = json.load(f)
    return {t: rd.read_parquet(os.path.join(ckpt_dir, t))
            for t in meta["tables"]}
