"""Pairwise evaluation vs gold labels (Stage 6; G6 semantics).

The reference reports micro and macro precision/recall/F1 against gold
annotations (``…/experiment/Evaluation.java:57-161``: micro = corpus-level
counts, macro = average of per-document scores). Recast pairwise:

- universe = the labeled pairs at shared blocking keys (FIXTURES §2);
- prediction for a labeled pair = "in the same predicted cluster"
  (cluster-level evaluation — transitivity can connect a pair the scorer
  missed directly, exactly like the reference's iterative feedback);
- micro P/R/F1 over all labeled pairs; macro averages per block_key
  (the per-document analog).

Implemented as a broadcast join: cluster assignments for the label
columns are looked up via two hash joins, then a tiny aggregate. The
labels table is an evaluation fixture (small); everything stays in Ray
Data until the final scalar reduction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pairwise_metrics(labels_ds, clusters_ds, num_partitions: int = 8
                     ) -> dict[str, float]:
    """labels (id_a,id_b,block_key,is_match) x clusters (mention_id,
    cluster_id) -> micro/macro P/R/F1 dict."""
    la = labels_ds.join(
        clusters_ds.rename_columns({"mention_id": "id_a",
                                    "cluster_id": "cluster_a"}),
        join_type="inner", num_partitions=num_partitions, on=("id_a",))
    lab = la.join(
        clusters_ds.rename_columns({"mention_id": "id_b",
                                    "cluster_id": "cluster_b"}),
        join_type="inner", num_partitions=num_partitions, on=("id_b",))

    def tally(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        pred = df["cluster_a"] == df["cluster_b"]
        gold = df["is_match"].astype(bool)
        g = pd.DataFrame({
            "block_key": df["block_key"],
            "tp": (pred & gold).astype("int64"),
            "fp": (pred & ~gold).astype("int64"),
            "fn": (~pred & gold).astype("int64"),
            "tn": (~pred & ~gold).astype("int64"),
        }).groupby("block_key", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    per_block = (lab.map_batches(tally, batch_format="pyarrow")
                 .groupby("block_key")
                 .aggregate(Sum("tp", alias_name="tp"),
                            Sum("fp", alias_name="fp"),
                            Sum("fn", alias_name="fn"),
                            Sum("tn", alias_name="tn")))
    pb = per_block.to_pandas()          # one row per block key — small
    tp, fp, fn = pb["tp"].sum(), pb["fp"].sum(), pb["fn"].sum()
    micro_p = tp / (tp + fp) if tp + fp else 1.0
    micro_r = tp / (tp + fn) if tp + fn else 1.0
    micro_f1 = (2 * micro_p * micro_r / (micro_p + micro_r)
                if micro_p + micro_r else 0.0)

    bp = pb["tp"] / (pb["tp"] + pb["fp"]).replace(0, 1)
    br = pb["tp"] / (pb["tp"] + pb["fn"]).replace(0, 1)
    denom = (bp + br).replace(0, 1)
    bf1 = 2 * bp * br / denom
    return {
        "micro_precision": float(micro_p),
        "micro_recall": float(micro_r),
        "micro_f1": float(micro_f1),
        "macro_precision": float(bp.mean()) if len(pb) else 1.0,
        "macro_recall": float(br.mean()) if len(pb) else 1.0,
        "macro_f1": float(bf1.mean()) if len(pb) else 1.0,
        "tp": int(tp), "fp": int(fp), "fn": int(fn), "tn": int(pb["tn"].sum()),
        "labeled_pairs": int(len(pb) and pb[["tp", "fp", "fn", "tn"]].to_numpy().sum()),
    }


def blocking_quality(pairs_ds, gold_ds, num_partitions: int = 8
                     ) -> dict[str, float]:
    """Blocking-scheme evaluation (Christen, "Data Matching", 2012,
    ch. 4), adapted to this pipeline's candidate structure:

    - reduction ratio   RR = 1 - |C| / C(N, 2)
    - pair completeness PC = covered true pairs / all true pairs, where
      a true pair (same ``entity_id`` in ``gold_ds``) counts as covered
      iff the candidate graph CONNECTS its endpoints — computed from
      connected components over the candidate edges. Transitive
      coverage is the right notion here because the pair generator
      deliberately emits spanning structures (one rep-rep edge per
      block plus same-norm star edges), not the quadratic pair set; a
      directly-absent but connected pair still reaches the same cluster
      whenever the scorer accepts the path's edges.

    Everything is distributed: component labels via the cluster stage's
    contract-then-union-find (``stages/cluster.connected_components``),
    per-(entity, component) group sizes reduced to pair counts by a
    per-batch combiner + Sum — no pair set and no label map ever
    collects on the driver."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from wned_ray.config import PipelineConfig
    from wned_ray.stages.cluster import connected_components

    gold_ds = gold_ds.select_columns(["mention_id", "entity_id"])
    n = gold_ds.count()
    n_cand = pairs_ds.count()
    total_pairs = n * (n - 1) // 2

    def _pair_sum(grouped) -> int:
        def p(batch: pa.Table) -> pa.Table:
            import numpy as np

            c = batch["count()"].to_numpy(zero_copy_only=False) \
                .astype("int64")
            return pa.table({"s": pa.array([int((c * (c - 1) // 2).sum())],
                                           pa.int64())})

        agg = grouped.map_batches(p, batch_format="pyarrow") \
            .aggregate(Sum("s", alias_name="s"))
        return int(agg["s"] or 0)

    true_pairs = _pair_sum(gold_ds.groupby("entity_id").count())

    comp = connected_components(
        pairs_ds.select_columns(["id_a", "id_b"]), PipelineConfig())
    joined = gold_ds.join(comp, join_type="left_outer",
                          num_partitions=num_partitions,
                          on=("mention_id",))

    def lbl(batch: pa.Table) -> pa.Table:
        # mentions outside every candidate edge are singleton components
        return pa.table({
            "entity_id": batch["entity_id"],
            "comp": pc.coalesce(batch["cluster_id"], batch["mention_id"]),
        })

    covered = _pair_sum(joined.map_batches(lbl, batch_format="pyarrow")
                        .groupby(["entity_id", "comp"]).count())

    rr = 1.0 - (n_cand / total_pairs if total_pairs else 0.0)
    pc_ = covered / true_pairs if true_pairs else 1.0
    return {"n_mentions": int(n), "candidate_pairs": int(n_cand),
            "true_pairs": true_pairs, "covered_true_pairs": covered,
            "reduction_ratio": float(rr), "pair_completeness": float(pc_)}


def bcubed_metrics(clusters_ds, gold_ds, num_partitions: int = 8
                   ) -> dict[str, float]:
    """B-cubed precision / recall / F1 of a clustering against gold
    classes (Bagga & Baldwin 1998; the Amigó et al. 2009 formulation) —
    the standard ER clustering metric beside pairwise F1, and the one
    that penalizes both over-merging (precision) and over-splitting
    (recall) per MENTION rather than per pair.

    Inputs: ``clusters_ds`` (mention_id, cluster_id), ``gold_ds``
    (mention_id, entity_id). Per mention m, P(m) = |C(m) ∩ G(m)| /
    |C(m)| and R(m) = |C(m) ∩ G(m)| / |G(m)|; corpus scores are means
    over mentions.

    Distributed shape: ONE hash join aligns predicted and gold ids,
    then everything reduces through the (cluster, entity) contingency
    CELL table — the identity Σ_m |C(m)∩G(m)|/|C(m)| = Σ_cells n²/|C|
    turns the per-mention mean into two cell-table shuffles (by cluster
    to attach |C|, by class to attach |G|; each group = the cells of
    one cluster/class, bounded by its overlap count) and a global sum.
    No per-mention state ever reaches the driver."""
    from ray.data.aggregate import Count, Sum

    j = clusters_ds.join(
        gold_ds.select_columns(["mention_id", "entity_id"]),
        join_type="inner", num_partitions=num_partitions,
        on=("mention_id",))

    cells = (j.groupby(["cluster_id", "entity_id"])
             .aggregate(Count(alias_name="n")))

    def p_mass(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].astype("float64")
        g["p_mass"] = n * n / n.sum()
        return g

    def r_mass(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].astype("float64")
        g["r_mass"] = n * n / n.sum()
        return g

    w = (cells.groupby("cluster_id")
         .map_groups(p_mass, batch_format="pandas")
         .groupby("entity_id")
         .map_groups(r_mass, batch_format="pandas"))

    tot = w.aggregate(Sum("n", alias_name="n"),
                      Sum("p_mass", alias_name="p_mass"),
                      Sum("r_mass", alias_name="r_mass"))
    n = int(tot["n"] or 0)
    if n == 0:
        return {"bcubed_precision": 1.0, "bcubed_recall": 1.0,
                "bcubed_f1": 1.0, "n_mentions": 0}
    p = tot["p_mass"] / n
    r = tot["r_mass"] / n
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"bcubed_precision": float(p), "bcubed_recall": float(r),
            "bcubed_f1": float(f1), "n_mentions": n}


def pr_curve(labels_ds, scores_ds, n_bins: int = 50,
             num_partitions: int = 8) -> pd.DataFrame:
    """Precision/recall sweep over the fused score — the threshold-
    selection evidence behind ``PipelineConfig.match_threshold`` (the
    reference tunes its threshold the same way on held-out labels; the
    graft's fitted variant lives in ``fusion.fit_config``).

    Distributed shape: ONE hash join aligns labels with scored pairs,
    scores bucket into ``n_bins`` fixed bins with a per-batch
    ``np.bincount`` tally (2 x n_bins partial rows per batch), ONE
    dim-sized groupby-sum; the cumulative-from-the-top precision /
    recall per threshold is computed on the n_bins-row result. Returns
    one row per bin threshold: (threshold_e4, tp, fp, fn,
    precision_e6, recall_e6)."""
    import numpy as np

    from ray.data.aggregate import Sum

    j = labels_ds.select_columns(["id_a", "id_b", "is_match"]).join(
        scores_ds.select_columns(["id_a", "id_b", "score"]),
        join_type="inner", num_partitions=num_partitions,
        on=("id_a", "id_b"))

    def tally(batch: pa.Table) -> pa.Table:
        s = batch["score"].to_numpy(zero_copy_only=False)
        m = batch["is_match"].to_numpy(zero_copy_only=False).astype(bool)
        b = np.clip((s * n_bins).astype(np.int64), 0, n_bins - 1)
        return pa.table({
            "bin": pa.array(np.arange(n_bins, dtype=np.int64)),
            "pos": pa.array(np.bincount(b[m], minlength=n_bins)
                            .astype(np.int64)),
            "neg": pa.array(np.bincount(b[~m], minlength=n_bins)
                            .astype(np.int64)),
        })

    pb = (j.map_batches(tally, batch_format="pyarrow")
          .groupby("bin")
          .aggregate(Sum("pos", alias_name="pos"),
                     Sum("neg", alias_name="neg"))
          .to_pandas().sort_values("bin"))          # n_bins rows — tiny
    pos = np.zeros(n_bins, np.int64)
    neg = np.zeros(n_bins, np.int64)
    pos[pb["bin"].to_numpy()] = pb["pos"].to_numpy()
    neg[pb["bin"].to_numpy()] = pb["neg"].to_numpy()
    # predicted-positive at threshold t = everything in bin >= t's bin
    tp = np.cumsum(pos[::-1])[::-1]
    fp = np.cumsum(neg[::-1])[::-1]
    total_pos = int(pos.sum())
    fn = total_pos - tp
    prec = np.where(tp + fp > 0, tp / np.maximum(tp + fp, 1), 1.0)
    rec = (tp / total_pos) if total_pos else np.ones(n_bins)
    return pd.DataFrame({
        "threshold_e4": (np.arange(n_bins) * 10_000 // n_bins)
        .astype(np.int64),
        "tp": tp, "fp": fp, "fn": fn,
        "precision_e6": np.round(prec * 1e6).astype(np.int64),
        "recall_e6": np.round(rec * 1e6).astype(np.int64),
    })


def adjusted_rand_index(clusters_ds, gold_ds, num_partitions: int = 8
                        ) -> dict[str, float]:
    """Adjusted Rand Index of a clustering against gold classes
    (Hubert & Arabie 1985) — the chance-corrected pair-counting metric
    beside B-cubed: ARI = (Σ_cells C(n_ij,2) − E) / (max − E) with
    E = Σ_i C(a_i,2)·Σ_j C(b_j,2) / C(n,2).

    Distributed shape: the same ONE-join contingency-cell table as
    ``bcubed_metrics``; the three pair-count sums reduce through
    per-batch C(n,2) combiners over (a) the cell table, (b) the
    dim-sized cluster-size table, (c) the dim-sized class-size table.
    Four scalars reach the driver."""
    from ray.data.aggregate import Count, Sum

    j = clusters_ds.join(
        gold_ds.select_columns(["mention_id", "entity_id"]),
        join_type="inner", num_partitions=num_partitions,
        on=("mention_id",))

    cells = (j.groupby(["cluster_id", "entity_id"])
             .aggregate(Count(alias_name="n"))).materialize()

    def _pairs_sum(ds, col: str) -> float:
        def comb2(batch: pa.Table) -> pa.Table:
            x = batch[col].to_numpy(zero_copy_only=False).astype(
                np.float64)
            return pa.table({"_p": pa.array([float((x * (x - 1) / 2)
                                                   .sum())])})

        out = (ds.map_batches(comb2, batch_format="pyarrow")
               .aggregate(Sum("_p", alias_name="p")))
        return float(out["p"] or 0.0)

    sum_cells = _pairs_sum(cells, "n")
    row = cells.groupby("cluster_id").aggregate(Sum("n", alias_name="a"))
    col = cells.groupby("entity_id").aggregate(Sum("n", alias_name="b"))
    sum_rows = _pairs_sum(row, "a")
    sum_cols = _pairs_sum(col, "b")
    tot = cells.aggregate(Sum("n", alias_name="n"))
    n = int(tot["n"] or 0)
    if n < 2:
        return {"ari": 1.0, "n_mentions": n}
    total_pairs = n * (n - 1) / 2
    expected = sum_rows * sum_cols / total_pairs
    max_index = (sum_rows + sum_cols) / 2
    denom = max_index - expected
    ari = (sum_cells - expected) / denom if denom else 1.0
    return {"ari": float(ari), "n_mentions": n,
            "pair_tp": sum_cells, "pairs_pred": sum_rows,
            "pairs_gold": sum_cols}
