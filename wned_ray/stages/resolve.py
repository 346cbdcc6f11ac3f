"""Per-conversation iterative greedy entity resolution (K11).

The reference resolves mentions *within one document* sequentially:
seed with unambiguous mentions, process the rest in ascending ambiguity
order, feed each decision back into the document's restart vector, and
remove losing candidates (``SemanticSignatureEL.java:576-723``:
``getUnambiguousEntities:208-259``, ``sortMentionByAmbiguity:901-922``
via the descending ``Rank.compareTo`` inversion ``…/utils/Rank.java:
27-36``, ``disambiguateMention:825-845``).

That loop is order-dependent — safe only within one group task (SURVEY
§7 hard-part 1) — so it runs inside ``groupby("conv_id").map_groups``:
embarrassingly parallel across conversations, sequential within one.
The output assigns each mention an entity_id (or "NIL"), the
document-level analog of the pairwise pipeline's clusters.

State (alias candidates + graph kernel) is loaded once per actor via a
callable-class ``map_groups`` UDF with broadcast refs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from wned_ray.config import PipelineConfig
from wned_ray.stages.scoring import build_alias_candidates
from wned_ray.state.graph import CSRGraph, SignatureKernel


class ConversationResolver:
    """map_groups UDF: one conversation in, one (mention_id, entity_id,
    n_candidates) frame out."""

    def __init__(self, alias_ref, graph_ref, cfg: PipelineConfig,
                 prior_only: bool = False):
        import ray

        alias_table = ray.get(alias_ref) if not isinstance(alias_ref, pa.Table) else alias_ref
        graph_table = (ray.get(graph_ref)
                       if graph_ref is not None and not isinstance(graph_ref, pa.Table)
                       else graph_ref)
        self.cfg = cfg
        # prior_only: the reference's PriorProbEL baseline — argmax prior
        # per mention, no semantic signature, no seed feedback
        # (``…/experiment/PriorProbEL.java:50-329``, argmax at :133-148).
        # The sanity floor every semantic method must beat (SURVEY §5.2).
        self.prior_only = prior_only
        self.cand = build_alias_candidates(alias_table, cfg)
        if graph_table is not None and graph_table.num_rows > 0:
            self.graph = CSRGraph.from_edges(
                graph_table["src"].to_pylist(), graph_table["dst"].to_pylist(),
                graph_table["weight"].to_numpy(zero_copy_only=False))
            self.kernel = SignatureKernel(
                self.graph, cfg.ppr_alpha, cfg.ppr_max_iter, cfg.ppr_tol,
                cfg.kl_gamma, cfg.kl_eps, cfg.hub_degree_threshold)
        else:
            self.graph, self.kernel = None, None

    def _doc_sig(self, seeds: dict[str, float], avoid_ents: set[str]):
        """K4 document signature: ONE restart-vector PPR from the
        accumulated seeds, EXCLUDING the current mention's own candidates
        (``SemanticSignatureEL.java:683-697`` avoid-set discipline — without
        the exclusion a mention's candidate mass self-reinforces).
        Returns None on the large-graph path or when no seed mass survives;
        callers fall back to mean pairwise relatedness."""
        if self.kernel is None or not seeds:
            return None
        n2i = self.graph.name2id
        seed_nodes = {n2i[s]: w for s, w in seeds.items() if s in n2i}
        avoid = {n2i[e] for e in avoid_ents if e in n2i}
        return self.kernel.doc_signature(seed_nodes, avoid)

    def _sem(self, ent: str, seeds: dict[str, float], doc_sig=None) -> float:
        """Candidate semantic score: ZeroKL vs the doc signature when one
        exists (K4/K5), else mean pairwise relatedness to the seeds (the
        large-graph fallback)."""
        if self.kernel is None or not seeds:
            return 0.0
        ie = self.graph.name2id.get(ent)
        if ie is None:
            return 0.0
        if doc_sig is not None:
            return self.kernel.sem_to_doc(ie, doc_sig)
        vals = []
        for s, w in seeds.items():
            js = self.graph.name2id.get(s)
            if js is not None:
                vals.append(w * self.kernel.relatedness(ie, js))
        return float(np.mean(vals)) if vals else 0.0

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        cfg = self.cfg
        g = g.sort_values("turn_idx")
        # J3 multi-key lookup (CandidateSelectionLucene.selectCandidatesName:
        # 271-294): a promoted/expanded mention probes the alias dictionary
        # with BOTH its promoted norm and its original surface norm; the
        # per-key candidate maps union with summed weights.
        from wned_ray.functions.abbrev import multi_key_candidates

        origs = (g["norm_orig"] if "norm_orig" in g.columns
                 else g["norm_mention"])
        rows = list(zip(g["mention_id"], g["norm_mention"], origs))
        cand_of = {mid: multi_key_candidates(self.cand, {norm, orig})
                   for mid, norm, orig in rows}
        rows = [(mid, norm) for mid, norm, _ in rows]

        # seeds: unambiguous mentions (single candidate) — K11 seed step.
        # Weighting follows cfg.pref_strategy (the reference's
        # PrefStrategy restart preference, WNEDConfig.java:25-33):
        # PRIOR_PROB accumulates the candidate's prior mass, UNIFORM
        # counts each unambiguous mention once.
        uniform = cfg.pref_strategy == "UNIFORM"
        seeds: dict[str, float] = {}
        for mid, _ in rows:
            c = cand_of[mid]
            if len(c) == 1:
                w = 1.0 if uniform else c[0][1]
                seeds[c[0][0]] = seeds.get(c[0][0], 0.0) + w

        resolved: dict[str, str] = {}
        # ascending ambiguity order, mention order as tie-break (G4)
        order = sorted(rows, key=lambda r: (len(cand_of[r[0]]), r[0]))
        for mid, _norm in order:
            cands = cand_of[mid]
            if not cands:
                resolved[mid] = "NIL"
                continue
            if len(cands) == 1:
                resolved[mid] = cands[0][0]
                continue
            if self.prior_only:
                # PriorProbEL.java:133-148 — argmax prior, lexicographic
                # entity tie-break (deterministic; the reference breaks
                # ties by HashMap order, SURVEY §7 hard-part 4)
                resolved[mid] = sorted(cands, key=lambda c: (-c[1], c[0]))[0][0]
                continue
            # score = prior fused with seed-relatedness (LINEAR over the
            # available features; local ctx is a pair feature, absent here).
            # One doc-signature PPR per DECISION, not per candidate —
            # restart = seeds minus this mention's own candidates (K4)
            doc_sig = self._doc_sig(seeds, {ent for ent, _ in cands})
            best, best_score = None, -1.0
            for ent, prior in cands:
                sem = self._sem(ent, seeds, doc_sig)
                s = cfg.prior_weight * prior + (1 - cfg.prior_weight) * sem
                if s > best_score or (s == best_score and (best is None or ent < best)):
                    best, best_score = ent, s
            resolved[mid] = best
            # feed back: winner joins the seed set; losers are dropped for
            # this mention (disambiguateMention:825-845)
            seeds[best] = seeds.get(best, 0.0) + 1.0

        return pa.table({
            "mention_id": pa.array([m for m, _ in rows], pa.string()),
            "entity_id": pa.array([resolved[m] for m, _ in rows], pa.string()),
            "n_candidates": pa.array([len(cand_of[m]) for m, _ in rows],
                                     pa.int32()),
        })


def resolve_conversations(prepared_ds, alias_ref, graph_ref,
                          cfg: PipelineConfig, concurrency: int = 4,
                          prior_only: bool = False):
    """prepared Dataset -> (mention_id, entity_id, n_candidates).

    The resolver is a callable class: the alias dict + graph kernel load
    once per actor (fn_constructor_kwargs), never per group."""
    import ray

    cluster_cpus = int(ray.cluster_resources().get("CPU", 2))
    concurrency = max(1, min(concurrency, cluster_cpus - 1))
    cols = ["conv_id", "turn_idx", "mention_id", "norm_mention"]
    try:
        if "norm_orig" in prepared_ds.columns():
            cols.append("norm_orig")
    except Exception:
        pass
    return (prepared_ds
            .select_columns(cols)
            .groupby("conv_id")
            .map_groups(ConversationResolver,
                        fn_constructor_kwargs={"alias_ref": alias_ref,
                                               "graph_ref": graph_ref,
                                               "cfg": cfg,
                                               "prior_only": prior_only},
                        batch_format="pandas",
                        concurrency=concurrency,
                        num_cpus=1))
