"""Pairwise scoring — the stateful actor pool (Stage 4, SURVEY §7).

``PairScorer`` is a callable class passed to
``map_batches(PairScorer, concurrency=N, batch_size=B)``: all state —
the alias→candidate dictionary (A1), the CSR entity graph + signature
kernel (A3/K2), fusion weights (A5) — is built ONCE per actor in
``__init__`` from broadcast ``ray.put`` object refs (zero-copy reads),
the actor-pool recast of the reference's 55 GB singleton JVM heap
(``run.sh:5``) and its 32-thread PPR pool
(``…/graph/algorithms/WeightedPersonalizedPageRank.java:233-266``).

Per pair the reference's 4-feature vector (``SemanticSignatureEL.java:
800-811``, ``…/utils/Feature.java:20-38``):

- ``prior``    : Σ_e p(e|alias_a)·p(e|alias_b) over shared candidates —
  the pairwise recast of the per-(mention,candidate) prior probability
  (freq-normalized per alias, ``CandidateSelectionLucene.java:119-132``),
  top-20 cap + 2e-5 floor (G3).
- ``local``    : sparse context cosine over turn-context term bags with
  the reference's key-iteration semantics (K6, ``VectorSimilarity.java:
  22-43``).
- ``sem_sim``  : bounded inverse ZeroKL of the two top-candidates' PPR
  signatures over the entity graph (K2/K4/K5; alpha=0.85, <=3 iters,
  delta<=1e-5, gamma=10) — memoized per actor.
- ``name_sim`` : Jaro-Winkler of the normalized surfaces (K9 — JW is one
  of the reference's three fuzzy re-rankers,
  ``AliasLuceneIndex.java:381-404``; vectorized batch DP).

Fused by the configured rank scheme (K10) + the pairwise name term;
``matched = score >= cfg.match_threshold`` is the NIL analog (K12): a
pair below threshold contributes no edge, so unmatched mentions end as
singleton clusters.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from wned_ray.config import PipelineConfig
from wned_ray.functions import fusion
from wned_ray.functions.strsim import jaro_winkler_batch, levenshtein_sim_batch
from wned_ray.functions.vectorsim import sparse_cosine
from wned_ray.state.graph import CSRGraph, SignatureKernel


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


class PairScorer:
    """Actor-pool batch scorer. State loaded once per actor (A1/A3/A5)."""

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
        self._ctx_cache: dict[str, Counter] = {}   # per-actor ctx bag memo
        self._top_cache: dict[str, str | None] = {}

    # ------------------------------------------------------------- features

    def _ctx_counter(self, ctx: str) -> Counter:
        c = self._ctx_cache.get(ctx)
        if c is None:
            c = Counter(ctx.split())
            if len(self._ctx_cache) > 200_000:
                self._ctx_cache.clear()
            self._ctx_cache[ctx] = c
        return c

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

    def _local_pair(self, ctx_a: str, ctx_b: str) -> float:
        ca = self._ctx_counter(ctx_a)
        cb = self._ctx_counter(ctx_b)
        if not ca or not cb:
            return 0.0
        return float(sparse_cosine(
            list(ca.keys()), np.fromiter(ca.values(), np.float64, len(ca)),
            list(cb.keys()), np.fromiter(cb.values(), np.float64, len(cb))))

    # --------------------------------------------------------------- __call__

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        cfg = self.cfg
        norm_a = batch["norm_a"].to_numpy(dtype=object)
        norm_b = batch["norm_b"].to_numpy(dtype=object)

        name_sim = jaro_winkler_batch(norm_a, norm_b)
        lev_sim = levenshtein_sim_batch(norm_a, norm_b)

        n = len(batch)
        prior = np.empty(n)
        sem = np.empty(n)
        local = np.empty(n)
        # feature memo per distinct (norm_a, norm_b) / (ctx_a, ctx_b) —
        # the per-document WeightCache analog (SemanticSignatureEL:376-464)
        pair_memo: dict[tuple[str, str], tuple[float, float]] = {}
        ctx_a = batch["ctx_a"].to_numpy(dtype=object)
        ctx_b = batch["ctx_b"].to_numpy(dtype=object)
        for i in range(n):
            key = (norm_a[i], norm_b[i])
            ps = pair_memo.get(key)
            if ps is None:
                ps = (self._prior_pair(*key), self._sem_pair(*key))
                pair_memo[key] = ps
            prior[i], sem[i] = ps
            local[i] = self._local_pair(ctx_a[i], ctx_b[i])

        score = fusion.fuse(cfg.rank_scheme, prior, local, sem, name_sim,
                            cfg.prior_weight, cfg.local_weight, cfg.name_weight)
        out = batch[["id_a", "id_b", "block_key"]].copy()
        out["prior"] = prior
        out["local"] = local
        out["sem_sim"] = sem
        out["name_sim"] = name_sim
        out["lev_sim"] = lev_sim
        out["score"] = score
        out["matched"] = score >= cfg.match_threshold
        # emit Arrow so every stage boundary carries Arrow blocks (mixing
        # pandas and arrow block types in one pipeline trips the executor)
        return pa.Table.from_pandas(out, preserve_index=False)


def score_pairs(pairs_ds, alias_ref, graph_ref, cfg: PipelineConfig):
    """pairs Dataset -> scored Dataset via the PairScorer actor pool.

    Pool size is capped at cluster_cpus - 1 so the pool never reserves
    every CPU and starves the upstream read/shuffle stages (the actor-pool
    sizing rule from the Ray Data guide)."""
    import ray

    cluster_cpus = int(ray.cluster_resources().get("CPU", 2))
    concurrency = max(1, min(cfg.score_concurrency, cluster_cpus - 1))
    return pairs_ds.map_batches(
        PairScorer,
        fn_constructor_kwargs={"alias_ref": alias_ref, "graph_ref": graph_ref,
                               "cfg": cfg},
        batch_format="pandas",
        batch_size=cfg.score_batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
