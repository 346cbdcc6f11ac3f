"""Per-conversation greedy entity resolution (K11) — iterative and
one-shot variants, with the reference's full restart-preference surface.

The reference resolves mentions *within one document* sequentially:
seed with unambiguous mentions, process the rest in ascending ambiguity
order, feed each decision back into the document's restart vector, and
remove losing candidates (``SemanticSignatureEL.java:576-723``:
``getUnambiguousEntities:208-259``, ``sortMentionByAmbiguity:901-922``
via the descending ``Rank.compareTo`` inversion ``…/utils/Rank.java:
27-36``, ``disambiguateMention:825-845``). The one-shot variant
(``useIterative=0``, ``linkingImplUnifiedUniterative:472-568``) resolves
every ambiguous mention against the INITIAL seed signature with no
feedback. Seed weights follow the split mention/entity PrefStrategy pair
(``WNEDConfig.java:25-33``; weight caches ``SemanticSignatureEL.java:
376-464``), with ``getApproximateEntities:850-889`` as the no-seed
fallback.

That loop is order-dependent — safe only within one group task (SURVEY
§7 hard-part 1) — so it runs inside ``groupby("conv_id").map_groups``:
embarrassingly parallel across conversations, sequential within one.
The output assigns each mention an entity_id (or "NIL"), the
document-level analog of the pairwise pipeline's clusters.

State (alias candidates + graph kernel + the optional entity-context /
idf preference dims) is loaded once per actor via a callable-class
``map_groups`` UDF with broadcast refs.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from wned_ray.config import PipelineConfig
from wned_ray.stages.scoring import build_alias_candidates
from wned_ray.state.graph import CSRGraph, SignatureKernel


def _stable_rand01(seed: int, conv_id: str, entity: str) -> float:
    """Deterministic pseudo-random weight in (0,1) per (conv, entity) —
    the graft's seeded replacement for the reference's wall-clock-seeded
    ``new Random(System.currentTimeMillis())`` RANDOM preference
    (``SemanticSignatureEL.java:386-399``, a documented nondeterminism
    this engine fixes)."""
    import hashlib

    h = hashlib.md5(f"{seed}|{conv_id}|{entity}".encode()).digest()
    return (int.from_bytes(h[:8], "big") + 1) / (2.0 ** 64 + 2)


def build_norm_idf(prepared_ds) -> pa.Table:
    """(norm_mention, idf) dim over CONVERSATIONS — the corpus tf-idf
    index analog behind the TFIDF mention preference
    (``DocumentUtils.computeTFIDF`` over ``tfidfIndex``). idf =
    ln(n_convs / df) where df counts conversations containing the norm.
    One distinct-pair combiner + two small groupbys; output is
    vocabulary-sized (a broadcast dim)."""
    def _uniq(batch: pa.Table) -> pa.Table:
        return (batch.select(["norm_mention", "conv_id"])
                .group_by(["norm_mention", "conv_id"]).aggregate([]))

    pairs = (prepared_ds.select_columns(["norm_mention", "conv_id"])
             .map_batches(_uniq, batch_format="pyarrow")
             .groupby(["norm_mention", "conv_id"]).count()
             .select_columns(["norm_mention", "conv_id"])
             .materialize())
    n_convs = max(1, pairs.groupby("conv_id").count().count())
    df_tbl = pairs.groupby("norm_mention").count().to_pandas()
    cnt_col = [c for c in df_tbl.columns if c != "norm_mention"][0]
    idf = np.log(n_convs / df_tbl[cnt_col].to_numpy(np.float64))
    return pa.table({
        "norm_mention": pa.array(df_tbl["norm_mention"], pa.string()),
        "idf": pa.array(idf, pa.float64()),
    })


def prune_candidates(cands: list, k: int, ctx_sim=None) -> list:
    """Reference candidate prune (``CSUtils.selectCandidatesMention:
    180-199``): keep the UNION of the top-k by context similarity and
    the top-k by prior (``PRUNE_LIMIT = 3``, ``CSUtils.java:34``); the
    2e-5 floor is already applied upstream in
    ``build_alias_candidates``. With no entity-context dim loaded
    (``ctx_sim=None``) only the prior ranking applies — the reference
    always has its entity-context cache, so pass the CTX_SIM dim for
    full parity. Ties break lexicographically (deterministic where the
    reference relies on sort stability)."""
    if len(cands) <= k:
        return cands
    by_prior = sorted(cands, key=lambda t: (-t[1], t[0]))[:k]
    keep = {e for e, _ in by_prior}
    if ctx_sim is not None:
        by_ctx = sorted(cands, key=lambda t: (-ctx_sim(t[0]), t[0]))[:k]
        keep |= {e for e, _ in by_ctx}
    return [t for t in cands if t[0] in keep]


def build_entity_contexts(prepared_ds, alias_table: pa.Table,
                          cfg: PipelineConfig,
                          max_terms: int = 64) -> pa.Table:
    """(entity, ctx) dim: per-entity context bag aggregated from the
    context terms of UNAMBIGUOUS mentions (surfaces whose alias entry has
    exactly one candidate) — the corpus-built analog of the reference's
    ``entityCtxCache`` (KB page text) behind the CTX_SIM preference
    (``SemanticSignatureEL.prepareContextSimCache:411-447``).

    Distributed shape: broadcast unambiguous norm->entity arrays, one
    map_batches token-count combiner, one (entity, term) SUM shuffle,
    per-entity top-``max_terms`` selection in ``map_groups`` (tiny
    groups). Output is entity-dim-sized — the same broadcast class as
    the alias table itself."""
    import ray
    from ray.data.aggregate import Sum

    cand = build_alias_candidates(alias_table, cfg)
    unamb = sorted((n, c[0][0]) for n, c in cand.items() if len(c) == 1)
    if not unamb:
        return pa.table({"entity": pa.array([], pa.string()),
                         "ctx": pa.array([], pa.string())})
    norms = pa.array([n for n, _ in unamb], pa.string())
    ents = pa.array([e for _, e in unamb], pa.string())
    ref = ray.put((norms, ents))

    def partial(batch: pa.Table) -> pa.Table:
        norms_b, ents_b = ray.get(ref)
        pos = pc.index_in(batch["norm_mention"], value_set=norms_b)
        b = batch.filter(pc.is_valid(pos))
        if b.num_rows == 0:
            return pa.table({"entity": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        pos = pc.index_in(b["norm_mention"], value_set=norms_b)
        ent = ents_b.take(pos)
        toks = pc.split_pattern(b["ctx"], " ")
        parents = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        t = pa.table({"entity": ent.take(parents), "term": flat})
        t = t.filter(pc.not_equal(t["term"], ""))
        g = t.group_by(["entity", "term"]).aggregate([("term", "count")])
        return pa.table({"entity": g["entity"], "term": g["term"],
                         "cnt": pc.cast(g["term_count"], pa.int64())})

    summed = (prepared_ds.select_columns(["norm_mention", "ctx"])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(["entity", "term"])
              .aggregate(Sum("cnt", alias_name="cnt")))

    def topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["cnt", "term"],
                          ascending=[False, True]).head(max_terms)
        return pa.table({
            "entity": pa.array([g["entity"].iloc[0]], pa.string()),
            "ctx": pa.array([" ".join(g["term"])], pa.string()),
        })

    out = summed.groupby("entity").map_groups(topk, batch_format="pandas")
    parts = [t for t in ray.get(out.to_arrow_refs())
             if t.num_columns > 0 and t.num_rows > 0]
    if not parts:
        return pa.table({"entity": pa.array([], pa.string()),
                         "ctx": pa.array([], pa.string())})
    return pa.concat_tables(parts).combine_chunks()


class ConversationResolver:
    """map_groups UDF: one conversation in, one (mention_id, entity_id,
    n_candidates) frame out."""

    def __init__(self, alias_ref, graph_ref, cfg: PipelineConfig,
                 prior_only: bool = False, entity_ctx_ref=None,
                 idf_ref=None):
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
        # entity-context dim for CTX_SIM (entity pref): entity -> term set
        self.ent_ctx: dict[str, frozenset[str]] = {}
        if entity_ctx_ref is not None:
            t = (ray.get(entity_ctx_ref)
                 if not isinstance(entity_ctx_ref, pa.Table) else entity_ctx_ref)
            self.ent_ctx = {e: frozenset(c.split())
                            for e, c in zip(t["entity"].to_pylist(),
                                            t["ctx"].to_pylist())}
        # idf dim for TFIDF (mention pref): norm -> idf
        self.idf: dict[str, float] = {}
        if idf_ref is not None:
            t = ray.get(idf_ref) if not isinstance(idf_ref, pa.Table) else idf_ref
            self.idf = dict(zip(t["norm_mention"].to_pylist(),
                                t["idf"].to_numpy(zero_copy_only=False)))
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

    # ----------------------------------------------- preference weights

    def _ctx_sim(self, mention_ctx: str | None, ent: str) -> float:
        """Set cosine between the mention's context bag and the entity's
        corpus-built context bag (CTX_SIM entity preference)."""
        bag = self.ent_ctx.get(ent)
        if not bag or not mention_ctx:
            return 0.0
        toks = set(mention_ctx.split())
        if not toks:
            return 0.0
        inter = len(toks & bag)
        if not inter:
            return 0.0
        return inter / math.sqrt(len(toks) * len(bag))

    def _mention_weights(self, g: pd.DataFrame,
                         rows: list[tuple[str, str]]) -> dict[str, float]:
        """mPrefStreg (``WeightCache.getMentionWeight:455-463``): UNIFORM
        -> 1; TFIDF -> tf of the surface within the conversation x corpus
        idf (RANDOM is applied at entity level, as the reference does)."""
        if self.cfg.mention_pref != "TFIDF":
            return {mid: 1.0 for mid, _ in rows}
        tf = pd.Series([n for _, n in rows]).value_counts()
        return {mid: float(tf[norm]) * self.idf.get(norm, 0.0)
                for mid, norm in rows}

    def _entity_weight(self, conv_id: str, mention_ctx: str | None,
                       ent: str, prior: float,
                       unambiguous: bool) -> float:
        """ePrefStreg (``WeightCache.getEntityWeight:465-474``)."""
        pref = self.cfg.pref_strategy
        if pref == "RANDOM" or self.cfg.mention_pref == "RANDOM":
            return _stable_rand01(self.cfg.seed, conv_id, ent)
        if pref == "PRIOR_PROB":
            return prior
        if pref == "CTX_SIM":
            # single-candidate mentions weigh 1.0 exactly
            # (prepareContextSimCache:425)
            return 1.0 if unambiguous else self._ctx_sim(mention_ctx, ent)
        return 1.0                                   # UNIFORM

    def _initial_seeds(self, conv_id: str, rows, cand_of, ctx_of,
                       mw: dict[str, float]) -> dict[str, float]:
        """Unambiguous-mention seeds (getUnambiguousEntities), with the
        approximate-entities fallback (getApproximateEntities:850-889)
        when the conversation has none."""
        cfg = self.cfg
        seeds: dict[str, float] = {}
        for mid, norm in rows:
            c = cand_of[mid]
            if len(c) == 1:
                ent, prior = c[0]
                w = mw[mid] * self._entity_weight(
                    conv_id, ctx_of.get(mid), ent, prior, unambiguous=True)
                seeds[ent] = seeds.get(ent, 0.0) + w
        if seeds or not cfg.use_approximate_seeds:
            return seeds
        rand_mode = (cfg.pref_strategy == "RANDOM"
                     or cfg.mention_pref == "RANDOM")
        for mid, norm in rows:
            c = cand_of[mid]
            if not c:
                continue
            ws = [self._entity_weight(conv_id, ctx_of.get(mid), ent, prior,
                                      unambiguous=False)
                  for ent, prior in c]
            tot = sum(ws)
            for (ent, _prior), w in zip(c, ws):
                if rand_mode:
                    # reference: raw random entity weight, unnormalized
                    # (getApproximateEntities:880-884)
                    val = w
                else:
                    val = (w / tot if tot > 0 else 1.0 / len(c)) * mw[mid]
                # deterministic max-merge (the reference's HashMap put is
                # last-write-wins over unordered iteration)
                if val > seeds.get(ent, -1.0):
                    seeds[ent] = val
        return seeds

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        cfg = self.cfg
        g = g.sort_values("turn_idx")
        conv_id = str(g["conv_id"].iloc[0]) if len(g) else ""
        # J3 multi-key lookup (CandidateSelectionLucene.selectCandidatesName:
        # 271-294): a promoted/expanded mention probes the alias dictionary
        # with BOTH its promoted norm and its original surface norm; the
        # per-key candidate maps union with summed weights.
        from wned_ray.functions.abbrev import multi_key_candidates

        origs = (g["norm_orig"] if "norm_orig" in g.columns
                 else g["norm_mention"])
        rows3 = list(zip(g["mention_id"], g["norm_mention"], origs))
        cand_of = {mid: multi_key_candidates(self.cand, {norm, orig})
                   for mid, norm, orig in rows3}
        rows = [(mid, norm) for mid, norm, _ in rows3]
        ctx_of: dict[str, str] = {}
        if "ctx" in g.columns:
            ctx_of = dict(zip(g["mention_id"], g["ctx"]))

        if cfg.candidate_prune_limit:
            k = cfg.candidate_prune_limit
            cand_of = {
                mid: prune_candidates(
                    c, k,
                    (lambda ent, _mid=mid: self._ctx_sim(
                        ctx_of.get(_mid), ent)) if self.ent_ctx else None)
                for mid, c in cand_of.items()}

        # seeds: PrefStrategy-weighted (K11 seed step / WeightCache)
        mw = self._mention_weights(g, rows)
        seeds = self._initial_seeds(conv_id, rows, cand_of, ctx_of, mw)

        resolved: dict[str, str] = {}
        # ascending ambiguity order, mention order as tie-break (G4).
        # The one-shot variant resolves in the same order — without
        # feedback the order only fixes the (deterministic) tie-breaks.
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
            # iterative only: feed back — winner joins the seed set;
            # losers are dropped for this mention
            # (disambiguateMention:825-845). The one-shot path
            # (useIterative=0, linkingImplUnifiedUniterative:472-568)
            # keeps the initial signature fixed.
            if cfg.iterative:
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

    The resolver is a callable class: the alias dict + graph kernel (and,
    when the config's PrefStrategy needs them, the entity-context / idf
    preference dims) load once per actor (fn_constructor_kwargs), never
    per group."""
    import ray

    cluster_cpus = int(ray.cluster_resources().get("CPU", 2))
    concurrency = max(1, min(concurrency, cluster_cpus - 1))
    cols = ["conv_id", "turn_idx", "mention_id", "norm_mention"]
    try:
        have = set(prepared_ds.columns())
    except Exception:
        have = set(cols)
    if "norm_orig" in have:
        cols.append("norm_orig")
    entity_ctx_ref = None
    if cfg.pref_strategy == "CTX_SIM":
        if "ctx" in have:
            cols.append("ctx")
        alias_table = (ray.get(alias_ref)
                       if not isinstance(alias_ref, pa.Table) else alias_ref)
        entity_ctx_ref = ray.put(build_entity_contexts(
            prepared_ds, alias_table, cfg))
    idf_ref = None
    if cfg.mention_pref == "TFIDF":
        idf_ref = ray.put(build_norm_idf(prepared_ds))
    return (prepared_ds
            .select_columns(cols)
            .groupby("conv_id")
            .map_groups(ConversationResolver,
                        fn_constructor_kwargs={"alias_ref": alias_ref,
                                               "graph_ref": graph_ref,
                                               "cfg": cfg,
                                               "prior_only": prior_only,
                                               "entity_ctx_ref": entity_ctx_ref,
                                               "idf_ref": idf_ref},
                        batch_format="pandas",
                        concurrency=concurrency,
                        num_cpus=1))
