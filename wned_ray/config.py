"""Pipeline configuration.

Single dataclass passed to every stage — the analog of the reference's
``WNEDConfig`` (``src/ca/ualberta/entitylinking/config/WNEDConfig.java:25-88``
+ ``el.config:1-31``), but validated and immutable.

Notable reference operating points carried over (see BASELINE.md):
- PPR: alpha=0.85, L1 delta <= 1e-5, max 3 iterations
  (``…/graph/algorithms/PersonalizedPageRank.java:27-29``).
- Candidate cap: top-20 by prior (``…/cs/CandidateSelectionLucene.java:41-44``).
- Rank scheme default: the reference's ``el.config`` says "MULTIPLY" but the
  parser only accepts the misspelling "MULTIPLE" (``WNEDConfig.java:175-176``)
  so the shipped default falls through to LINEAR — we default to LINEAR for
  parity and keep all schemes available.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


RANK_SCHEMES = (
    "SEMANTIC",      # semSim only                     (Feature.compareToSemantic)
    "PRIOR_SEM",     # prior * semSim                  (compareToPriorSemantic)
    "LOCAL_SEM",     # local * semSim                  (compareToLocalSemantic)
    "NOR",           # noisy-or of the three           (compareToNOR)
    "LINEAR",        # a*prior + b*local + (1-a-b)*sem (compareToJoint)
    "MULTIPLY",      # a*prior*sem + (1-a)*local*sem   (compareToJoint2)
    "VOTE",          # 2-of-3 majority                 (compareToVote)
)


@dataclass(frozen=True)
class PipelineConfig:
    """All knobs for the linkage pipeline. Frozen => hashable for lineage."""

    seed: int = 42

    # --- normalization (M9/M10/M11) ---
    strip_titles: bool = True
    strip_corp_suffixes: bool = True
    # person-coref substring promotion within a conversation (M8,
    # ELUtils.resolve:178-208): "varquo" inherits "varquo sotanor"'s norm
    coref_promote: bool = True
    # abbreviation-definition mining within a conversation (M13,
    # MentionExpansion.findAbbrevDefinitions:961-1066): "VS" with a mined
    # definition "Varquo Sotanor" inherits the definition's norm
    abbrev_expand: bool = True
    # anchor-text alias mining (M3/M5, KBExtractor.extractAlias anchor
    # source): mine [[target|anchor]] pairs from the corpus and union
    # them into the alias dim table before broadcast. Off by default —
    # the reference mines anchors OFFLINE during KB construction; this
    # flag is the online analog for corpora that carry link markup.
    mine_anchor_aliases: bool = False

    # --- blocking: char shingles -> MinHash -> LSH bands (J2 analog) ---
    shingle_k: int = 4           # char k-grams over normalized mention text
    num_perm: int = 64           # minhash permutations
    band_rows: int = 4           # rows per LSH band  => num_perm/band_rows bands
    max_block_size: int = 64     # blocks larger than this are dropped (hub
                                 # filter — the analog of the reference's
                                 # in-degree>=200/600 hub thresholds,
                                 # SubGraphGenerator.java:30-31, and the
                                 # Lucene top-200 fuzzy budget)
    global_promote: bool = True  # corpus-wide norm promotion: a norm whose
                                 # token set is contained in EXACTLY ONE
                                 # other norm's inherits that norm (the
                                 # reference's per-document substring
                                 # promotion, ELUtils.resolve:178-208,
                                 # lifted to corpus scope with an
                                 # unambiguity guard — a bare "vardosmor"
                                 # in a conversation with no full form
                                 # can still reach "vardosmor belullin")
    token_blocks: bool = False   # ALSO co-block norms sharing a name TOKEN
                                 # — the char-shingle LSH misses short⊂long
                                 # surface pairs ("vardosmor" vs "vardosmor
                                 # belullin", char-Jaccard ~0.35); the
                                 # reference's fuzzy tier matches them
                                 # because Lucene tokenizes the alias index
                                 # (CandidateSelectionLucene
                                 # .selectCandidatesName:271-294). Hot
                                 # tokens fall to the same max_block_size
                                 # discipline as hot LSH bands. Off by
                                 # default: global_promote already routes
                                 # unambiguous short⊂long surfaces through
                                 # the exact tier; enable this for corpora
                                 # where bare surfaces are AMBIGUOUS (the
                                 # promotion guard declines) so the pair
                                 # scorer can decide per pair instead.

    # Fuzzy-tier 3-reranker top-n UNION (AliasLuceneIndex.queryAlias:
    # 270-283): when set, each surface keeps only candidates ranked in
    # its top-n by ANY of the three string kernels (char-bigram Dice ∪
    # char-trigram sim ∪ Jaro-Winkler — the reference's Dice /
    # NGramDistance / JW trio); a pair survives if EITHER side keeps it.
    # None (default) = no per-kernel pruning: every band collision goes
    # to the scorer, bounded by max_block_size (the shipped behavior the
    # hard-tier F1 gates pin down).
    fuzzy_rerank_top_n: int | None = None

    # --- candidate selection (J1/G2/G3) ---
    top_k_candidates: int = 20   # CandidateSelectionLucene.java:41-44
    prior_floor: float = 2e-5    # CSUtils.java:190-199
    # Resolver candidate prune (CSUtils.selectCandidatesMention:180-199):
    # per mention keep the UNION of top-K by context similarity and
    # top-K by prior (PRUNE_LIMIT = 3, CSUtils.java:34) before the
    # iterative loop. 0 = off (keep the full top_k_candidates list —
    # the default here, since the gold gates are measured without it);
    # set 3 for reference-default parity. The context ranking engages
    # only when the CTX_SIM entity-context dim is loaded.
    candidate_prune_limit: int = 0

    # Restart-vector preference strategies for the resolver's document
    # signature — the reference's split mention/entity PrefStrategy pair
    # (WNEDConfig.java:25-33, mPrefStreg/ePrefStreg at :58-60, weight
    # caches SemanticSignatureEL.java:376-464).
    #
    # ``pref_strategy`` is the ENTITY-level preference (ePrefStreg):
    #   PRIOR_PROB — seed weight from candidate prior mass (shipped
    #                el.config default);
    #   UNIFORM    — every seed entity weighs 1;
    #   CTX_SIM    — cosine between the mention's context bag and a
    #                corpus-built per-entity context dim
    #                (stages/resolve.build_entity_contexts; the analog of
    #                the reference's entityCtxCache, with an unambiguous
    #                single-candidate mention weighing 1.0 exactly as
    #                prepareContextSimCache:425 does);
    #   RANDOM     — per-(conversation, entity) weight from a SEEDED
    #                stable hash. The reference seeds with wall-clock
    #                time (SemanticSignatureEL.java:386-399) — documented
    #                nondeterminism this engine deliberately fixes.
    pref_strategy: str = "PRIOR_PROB"
    # ``mention_pref`` is the MENTION-level preference (mPrefStreg):
    #   UNIFORM — every mention weighs 1 (reference default);
    #   TFIDF   — tf of the mention surface within its conversation x a
    #             corpus idf dim (stages/resolve.build_norm_idf; the
    #             analog of DocumentUtils.computeTFIDF over tfidfIndex);
    #   RANDOM  — per the reference, when either pref is RANDOM the
    #             entity-level seeded random weight is used directly
    #             (getApproximateEntities:880-884).
    mention_pref: str = "UNIFORM"
    # Iterative greedy feedback loop (the reference's useIterative axis):
    # True = linkingImplUnifiedIterative (seed feedback after each
    # decision, SemanticSignatureEL.java:576-723); False = the one-shot
    # variant (all ambiguous mentions resolve against the INITIAL seed
    # signature, no feedback — linkingImplUnifiedUniterative:472-568).
    iterative: bool = True
    # When a conversation has NO unambiguous seed mention, fall back to
    # the approximate seed set: every mention contributes its candidates
    # weighted by normalized entity preference x mention weight
    # (getApproximateEntities:850-889; deterministic max-merge where the
    # reference's HashMap iteration made it last-write-wins).
    use_approximate_seeds: bool = True

    # --- PPR semantic kernel (K2/K4/K5) ---
    ppr_alpha: float = 0.85
    ppr_max_iter: int = 3
    ppr_tol: float = 1e-5
    kl_gamma: float = 10.0       # ZeroKLDivergence gamma  (VectorSimilarity.java:93)
    kl_eps: float = 1e-6         # ZeroKLDivergence epsilon (VectorSimilarity.java:98)
    hub_degree_threshold: int = 200  # subgraph expansion hub cutoff (K1)

    # --- feature fusion (K10) + match decision (K12 analog) ---
    rank_scheme: str = "LINEAR"
    # name-similarity kernel for the pair scorer's name_sim feature:
    # "jw" (Jaro-Winkler, the default re-ranker the reference unions,
    # AliasLuceneIndex.java:381-404) or "soft_tfidf" (the SoftTFIDF
    # re-ranker, StringSim.java:111-115 — better on multi-token surfaces
    # with reordered/extra tokens; uniform token weights, theta=0.8)
    name_sim_kernel: str = "jw"
    # NOTE on defaults: the reference's el.config ships priorWeight=0.08 /
    # localWeight=0.10, which weights semSim 0.82 — right for ranking
    # candidates of ONE mention (semantic context picks among same-name
    # entities) but wrong for the pairwise match decision, where a high
    # semantic relatedness between two DIFFERENT same-topic entities must
    # not outvote disagreeing name/prior evidence. The pairwise defaults
    # below weight prior/name evidence up; the reference's ranking weights
    # remain available via PipelineConfig(prior_weight=0.08, ...).
    prior_weight: float = 0.45   # (reference ranking default: 0.08, el.config:22)
    local_weight: float = 0.10   # (el.config:23)
    name_weight: float = 0.45    # pairwise-graft extra feature weight: the
                                 # fused score is
                                 #   (1-name_weight)*fuse(prior,local,sem) +
                                 #   name_weight*name_sim
    match_threshold: float = 0.75  # pairs scoring below are non-matches (NIL)

    # --- pair expansion ---
    pair_mode: str = "star"      # "star": representative<->member pairs
                                 # (linear in mentions; same transitive
                                 # clusters); "all": exhaustive
                                 # within-block all-pairs (quadratic)
    rep_broadcast_max: int = 2_000_000
                                 # star-mode rep->context dim: broadcast
                                 # (index_in/take per batch, no shuffle
                                 # waves) up to this many distinct reps;
                                 # past it every attach falls back to
                                 # distributed hash joins so driver
                                 # memory stays bounded at the ~1e8
                                 # distinct-surfaces design point

    # --- prepare stage ---
    # Input rows of one conversation are CONTIGUOUS in file order (e.g.
    # transcripts written sorted by (conv_id, turn_idx) — true of the
    # synthetic corpus and of most real transcript dumps). When set, the
    # per-conversation promotion runs BLOCK-LOCALLY: Ray Data blocks are
    # contiguous row ranges, so any conversation that is neither the
    # first nor the last conv of its block is complete inside it; only
    # the ~2-convs-per-block boundary set takes the per-document shuffle.
    # This removes the prepare stage's full-text all-to-all (its one
    # bandwidth-bound exchange). Results are EXACTLY equal to the shuffle
    # path (equivalence-tested); leave False when contiguity is unknown.
    presorted_conversations: bool = False

    # --- pair generation ---
    # Blocking tables at or under this many exploded rows generate their
    # norm pairs on the DRIVER in one vectorized pass (profiled: the
    # distributed form's three hash-shuffle waves of aggregator-actor
    # spawn dominate at vocabulary scale — ~half the scores stage at
    # 500k turns). Past the cap (the 1e8-distinct-surfaces design point
    # and the 8M-turn scaling corpus) the distributed join/groupby path
    # runs — same driver/distributed switch discipline as global_promote
    # and cc_driver_max_pairs.
    norm_pairs_driver_max_rows: int = 1_000_000
    # Incremental blocking MERGE fast path (pipelines/increment.py):
    # below this many base+delta blocking rows the merge + hot/flip/
    # dirty/touched pruning runs as ONE driver pass of Arrow group_by +
    # bincount kernels. The cap is deliberately higher than
    # norm_pairs_driver_max_rows: the table is slim (norm, int64 key,
    # int32 band, int64 weight, rep id ≈ 60-80 B/row → ~1.2 GB transient
    # at the cap) and the alternative is FIVE shuffle waves whose
    # aggregator-spawn overhead measured 58.7 s at the 8M-turn tier
    # where the driver pass is ~2 s. Past the cap (vocabularies beyond
    # ~16M distinct surface×band rows — the 100 TB regime) the
    # distributed merge plan runs.
    blocking_merge_driver_max_rows: int = 16_000_000
    # Relatedness kernel selection (K7/K8 surface,
    # RelatednessMeasureWebGraph.java:31-62): "ppr" (default — ZeroKL
    # over PPR signatures, the reference's shipped configuration) or
    # one of the ten Milne-Witten link-set modes: in / in_count / out /
    # out_count / both / both_count (directed graph), undirect /
    # undirect_count / undirect_link_count / direct_count. The last two
    # keep the reference's quirks verbatim: direct_count always scores
    # 0.0; undirect_link_count returns the raw edge weight.
    rel_mode: str = "ppr"
    # Model-based NIL decision (K12, NILPredictor.java:26-62 analog): a
    # (w_prior, w_local, w_sem, w_name, bias) 5-tuple from
    # fusion.fit_nil_model. When set, matched = sigmoid(w·f + bias) >=
    # 0.5 replaces the score >= match_threshold rule; None (default)
    # keeps the threshold rule — the reference also ships with the
    # simple rule and trains the classifier offline.
    nil_model: "tuple | None" = None
    # Mined-anchor-alias driver cap: the mined (entity, alias, freq)
    # table is vocabulary-sized by argument, but past this many rows
    # only the top-cap pairs by freq merge into the alias dim (the dim
    # must fit the ray.put broadcast budget regardless) — truncation is
    # warned, not silent.
    alias_mined_max_rows: int = 8_000_000
    # Increment keep-set broadcast cap (rows across delta norms + dirty
    # norms + delta/dirty mention ids). The sets are delta-sized by
    # contract, but a TB-scale delta would break the driver; past the
    # cap the increment's membership filters switch to distributed
    # marker semi-joins (util.semi_join_or_filter) and nothing is
    # collected — same cap-with-fallback discipline as every other
    # broadcast site.
    increment_broadcast_max_rows: int = 20_000_000
    # Relatedness precompute: below this many unique in-graph entity
    # pairs AND with the graph in dense mode (<= SMALL_GRAPH_LIMIT nodes,
    # where signatures are memoized per entity and shared across pairs),
    # ONE driver-side kernel beats the actor pool (whose spawn wave costs
    # ~5 s at 32 CPUs and which recomputes each entity signature once per
    # actor that sees it). In subgraph mode (larger graphs) every pair is
    # an independent joint-subgraph PPR — no cache to share — so the pool
    # always runs regardless of pair count.
    rel_driver_max_pairs: int = 10_000
    # Broadcast cap for the precomputed relatedness lookup: unique
    # canonical int64 pair keys + float64 values = 16 bytes/pair, so the
    # default is a ~64 MB object-store broadcast (read zero-copy by every
    # scorer actor). When the input norm-pair table exceeds
    # norm_pairs_driver_max_rows the DISTINCT key set is computed
    # distributedly (per-batch distinct + one int64 groupby); only if
    # even that distinct set exceeds this cap does the precompute stand
    # down and the per-actor memo path (duplicated-work, never-wrong)
    # take over.
    rel_broadcast_max_pairs: int = 4_000_000
    # Hot-block-key detection reduces (block_key, n_mentions) — two int64
    # columns — on the DRIVER below this row count (np.unique/bincount,
    # ~16 bytes/row transient): a distributed SUM-groupby over the
    # vocabulary-sized blocking table costs a full aggregator-actor spawn
    # wave (~20 s of non-scaling wall at the 8M-turn tier). Above the cap
    # the hash-shuffle groupby remains the multi-node scale path.
    hot_keys_driver_max_rows: int = 16_000_000

    # --- scoring actor pool ---
    score_batch_size: int = 4096
    score_concurrency: int | None = None  # None => auto: cluster CPUs - 2

    # --- connected components ---
    cc_max_rounds: int = 12
    # Alternating sort+contract rounds (contract_to_cap) applied while the
    # forest is still above the driver cutoff: each round is one range-
    # partition exchange of a shrinking 2-column edge list — orders of
    # magnitude cheaper than a label-propagation round over the same
    # edges (measured at the 32M-turn tier: one propagation round ~= 30 s
    # of join + groupby + digest aggregator waves vs ~3 s per sort+
    # contract round on a 3M-edge forest).
    cc_contract_rounds: int = 4
    # driver union-find cutoff, applied AFTER iterated edge contraction.
    # The driver path is a SERIAL tail (~4 us/edge for the numpy label
    # propagation plus the broadcast-LUT build — 8.3 s measured on a 2M-
    # edge / 3.1M-node forest), so it must stay a small, bounded fraction
    # of wall. 8M contracted edges is ~0.5 GB transient driver heap and
    # ~30 s serial — acceptable up to the ~32M-turn tier where wall is
    # tens of minutes; past the cap the distributed min-label propagation
    # (converging in 1-2 rounds on the contraction-flattened forest)
    # keeps the stage parallel. Contraction floors the edge count at
    # (matched nodes - components), so this cap is effectively a cap on
    # DRIVER-VISIBLE NODES, not on raw matched pairs.
    cc_driver_max_pairs: int = 8_000_000

    # --- checkpointing ---
    checkpoint_dir: str | None = None

    def __post_init__(self) -> None:
        if self.rank_scheme not in RANK_SCHEMES:
            raise ValueError(f"rank_scheme must be one of {RANK_SCHEMES}")
        if self.pair_mode not in ("star", "all"):
            raise ValueError("pair_mode must be 'star' or 'all'")
        if self.name_sim_kernel not in ("jw", "soft_tfidf"):
            raise ValueError("name_sim_kernel must be 'jw' or 'soft_tfidf'")
        if self.pref_strategy not in ("PRIOR_PROB", "UNIFORM", "CTX_SIM",
                                      "RANDOM"):
            raise ValueError("pref_strategy must be PRIOR_PROB, UNIFORM, "
                             "CTX_SIM or RANDOM")
        if self.mention_pref not in ("UNIFORM", "TFIDF", "RANDOM"):
            raise ValueError("mention_pref must be UNIFORM, TFIDF or RANDOM")
        if self.num_perm % self.band_rows != 0:
            raise ValueError("num_perm must be divisible by band_rows")
        if not (0.0 < self.ppr_alpha < 1.0):
            raise ValueError("ppr_alpha must be in (0,1)")

    @property
    def num_bands(self) -> int:
        return self.num_perm // self.band_rows

    def fingerprint(self) -> str:
        """Stable hash of the config — part of every lineage manifest."""
        blob = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]
