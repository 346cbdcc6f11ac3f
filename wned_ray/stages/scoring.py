"""Pairwise scoring — split into a tiny stateful stage over DISTINCT
surface pairs and a big stateless stage over mention pairs (Stage 4,
SURVEY §7).

The reference scores each (mention, candidate) with a 4-feature vector
(``SemanticSignatureEL.java:800-811``, ``…/utils/Feature.java:20-38``).
In the pairwise graft, three of the four features — prior, semantic
relatedness, name similarity — are functions of the two NORMALIZED
SURFACE FORMS only, so they are computed once per distinct norm pair
(|distinct surfaces| ~ 1e8 at the 1e12-turn design point) instead of
once per mention pair (~1e10+). Only the local context cosine is
mention-level, and it is fully vectorized.

1. ``score_norm_pairs`` — actor-pool ``map_batches`` over the norm-pair
   Dataset. All state — the alias→candidate dictionary (A1), the CSR
   entity graph + PPR signature kernel (A3/K2), fusion weights (A5) —
   is built ONCE per actor in ``__init__`` from broadcast ``ray.put``
   refs (zero-copy), the actor-pool recast of the reference's 55 GB
   singleton JVM heap (``run.sh:5``) and its 32-thread PPR pool
   (``…/graph/algorithms/WeightedPersonalizedPageRank.java:233-266``).
   Features:
   - ``prior``    : Σ_e p(e|alias_a)·p(e|alias_b) over shared candidates
     (freq-normalized per alias ``CandidateSelectionLucene.java:119-132``,
     top-20 cap + 2e-5 floor, G2/G3).
   - ``sem_sim``  : bounded inverse ZeroKL of the two top-candidates' PPR
     signatures over the entity graph (K2/K4/K5; alpha=0.85, <=3 iters,
     delta<=1e-5, gamma=10) — memoized per actor.
   - ``name_sim`` : Jaro-Winkler of the normalized surfaces (K9 — one of
     the reference's three fuzzy re-rankers,
     ``AliasLuceneIndex.java:381-404``; vectorized batch DP).
   - ``lev_sim``  : normalized Levenshtein (K9, ``StringSim.java:26-103``).

2. ``finalize_scores`` — STATELESS ``map_batches`` over the expanded
   mention pairs (which carry the norm-level features through the expand
   joins): vectorized local context cosine over turn-context term bags
   with the reference's semantics (K6, ``VectorSimilarity.java:22-43``),
   then fusion by the configured rank scheme (K10).
   ``matched = score >= cfg.match_threshold`` is the NIL analog (K12): a
   pair below threshold contributes no edge, so unmatched mentions end
   as singleton clusters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from wned_ray.config import PipelineConfig
from wned_ray.functions import fusion
from wned_ray.functions.strsim import jaro_winkler_batch, levenshtein_sim_batch
from wned_ray.functions.vectorsim import sparse_cosine_batch
from wned_ray.state.graph import CSRGraph, SignatureKernel

NORM_FEATURES = ["prior", "sem_sim", "name_sim", "lev_sim"]


def build_alias_candidates(alias_table: pa.Table, cfg: PipelineConfig
                           ) -> dict[str, list[tuple[str, float]]]:
    """alias parquet table -> {normalized alias: [(entity, prior), ...]}.

    prior = freq / sum(freq per alias) (G2), capped at top-K by prior
    (G3, top-20) with the 2e-5 floor (CSUtils.java:190-199).
    """
    df = alias_table.select(["entity", "alias", "freq"]).to_pandas()
    df = df.groupby(["alias", "entity"], as_index=False)["freq"].sum()
    tot = df.groupby("alias")["freq"].transform("sum")
    df["prior"] = df["freq"] / tot
    df = df[df["prior"] >= cfg.prior_floor]
    df = df.sort_values(["alias", "prior", "entity"],
                        ascending=[True, False, True])
    df = df.groupby("alias").head(cfg.top_k_candidates)
    out: dict[str, list[tuple[str, float]]] = {}
    for alias, ent, prior in zip(df["alias"], df["entity"], df["prior"]):
        out.setdefault(alias, []).append((ent, float(prior)))
    return out


class NormPairScorer:
    """Actor-pool batch scorer over DISTINCT norm pairs. State loaded once
    per actor (A1/A3/A5); memoized per-pair features (the per-document
    WeightCache analog, ``SemanticSignatureEL.java:376-464``)."""

    def __init__(self, alias_ref, graph_ref, cfg: PipelineConfig):
        import ray

        alias_table = ray.get(alias_ref) if not isinstance(alias_ref, pa.Table) else alias_ref
        graph_table = ray.get(graph_ref) if graph_ref is not None and not isinstance(graph_ref, pa.Table) else graph_ref
        self.cfg = cfg
        self.cand = build_alias_candidates(alias_table, cfg)
        if graph_table is not None and graph_table.num_rows > 0:
            self.graph = CSRGraph.from_edges(
                graph_table["src"].to_pylist(),
                graph_table["dst"].to_pylist(),
                graph_table["weight"].to_numpy(zero_copy_only=False))
            self.kernel = SignatureKernel(
                self.graph, cfg.ppr_alpha, cfg.ppr_max_iter, cfg.ppr_tol,
                cfg.kl_gamma, cfg.kl_eps, cfg.hub_degree_threshold)
        else:
            self.graph = None
            self.kernel = None
        self._top_cache: dict[str, str | None] = {}
        self._pair_memo: dict[tuple[str, str], tuple[float, float]] = {}

    # ------------------------------------------------------------- features

    def _top_entity(self, norm: str) -> str | None:
        if norm in self._top_cache:
            return self._top_cache[norm]
        cands = self.cand.get(norm)
        top = cands[0][0] if cands else None
        self._top_cache[norm] = top
        return top

    def _prior_pair(self, norm_a: str, norm_b: str) -> float:
        ca = self.cand.get(norm_a)
        cb = self.cand.get(norm_b)
        if not ca or not cb:
            return 0.0
        if len(ca) > len(cb):
            ca, cb = cb, ca
        mb = dict(cb)
        return float(sum(p * mb.get(e, 0.0) for e, p in ca))

    def _sem_pair(self, norm_a: str, norm_b: str) -> float:
        if self.kernel is None:
            return 0.0
        ea = self._top_entity(norm_a)
        eb = self._top_entity(norm_b)
        if ea is None or eb is None:
            return 0.0
        ia = self.graph.name2id.get(ea)
        ib = self.graph.name2id.get(eb)
        if ia is None or ib is None:
            return 1.0 if ea == eb else 0.0
        return self.kernel.relatedness(ia, ib)

    # --------------------------------------------------------------- __call__

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        norm_a = batch["norm_a"].to_numpy(dtype=object)
        norm_b = batch["norm_b"].to_numpy(dtype=object)
        name_sim = jaro_winkler_batch(norm_a, norm_b)
        lev_sim = levenshtein_sim_batch(norm_a, norm_b)
        n = len(batch)
        prior = np.empty(n)
        sem = np.empty(n)
        for i in range(n):
            key = (norm_a[i], norm_b[i])
            ps = self._pair_memo.get(key)
            if ps is None:
                ps = (self._prior_pair(*key), self._sem_pair(*key))
                if len(self._pair_memo) > 2_000_000:
                    self._pair_memo.clear()
                self._pair_memo[key] = ps
            prior[i], sem[i] = ps
        out = batch.copy()
        out["prior"] = prior
        out["sem_sim"] = sem
        out["name_sim"] = name_sim
        out["lev_sim"] = lev_sim
        # emit Arrow so every stage boundary carries Arrow blocks (mixing
        # pandas and arrow block types in one pipeline trips the executor)
        return pa.Table.from_pandas(out, preserve_index=False)


def score_norm_pairs(norm_pairs_ds, alias_ref, graph_ref, cfg: PipelineConfig):
    """norm-pair Dataset (norm_a, norm_b, block_key) -> same + the three
    norm-level features, via the NormPairScorer actor pool.

    The input is |distinct surface pairs| — tiny relative to mention
    pairs — so a small pool suffices; it is still an actor pool because
    each worker loads the alias dict + CSR graph once (A1/A3)."""
    import ray

    cluster_cpus = int(ray.cluster_resources().get("CPU", 2))
    want = cfg.score_concurrency or max(1, cluster_cpus // 4)
    concurrency = max(1, min(want, cluster_cpus - 1))
    return norm_pairs_ds.map_batches(
        NormPairScorer,
        fn_constructor_kwargs={"alias_ref": alias_ref, "graph_ref": graph_ref,
                               "cfg": cfg},
        batch_format="pandas",
        batch_size=cfg.score_batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def _finalize_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    ctx_a = np.asarray(batch["ctx_a"].to_pylist(), dtype=object)
    ctx_b = np.asarray(batch["ctx_b"].to_pylist(), dtype=object)
    local = sparse_cosine_batch(ctx_a, ctx_b)
    prior = batch["prior"].to_numpy(zero_copy_only=False)
    sem = batch["sem_sim"].to_numpy(zero_copy_only=False)
    name_sim = batch["name_sim"].to_numpy(zero_copy_only=False)
    score = fusion.fuse(cfg.rank_scheme, prior, local, sem, name_sim,
                        cfg.prior_weight, cfg.local_weight, cfg.name_weight)
    return pa.table({
        "id_a": batch["id_a"], "id_b": batch["id_b"],
        "block_key": batch["block_key"],
        "prior": batch["prior"], "local": pa.array(local),
        "sem_sim": batch["sem_sim"], "name_sim": batch["name_sim"],
        "lev_sim": batch["lev_sim"],
        "score": pa.array(score),
        "matched": pa.array(score >= cfg.match_threshold),
    })


def finalize_scores(pairs_ds, cfg: PipelineConfig):
    """Expanded mention pairs (carrying norm-level features + ctx bags) ->
    scored pairs. Stateless vectorized tasks — the hot mention-level path
    has no actor state and no Python-per-row work."""
    return pairs_ds.map_batches(
        lambda b: _finalize_batch(b, cfg),
        batch_format="pyarrow",
        batch_size=cfg.score_batch_size,
    )


def score_pairs(pairs_ds, alias_ref, graph_ref, cfg: PipelineConfig):
    """Monolithic fallback: score mention pairs that do NOT carry
    precomputed norm-level features (norm_a/norm_b/ctx_a/ctx_b required).
    Composes the same two kernels; used by callers that build their own
    pair sets outside the blocking pipeline."""
    scored_norm = score_norm_pairs(
        pairs_ds, alias_ref, graph_ref, cfg)
    return finalize_scores(scored_norm, cfg)
