"""Deterministic synthetic transcript corpus (FIXTURES.md §1-5).

Pure function of ``CorpusSpec`` (seed + sizes): generates the
``input_hint``-shaped transcripts table plus the derived dimension /
oracle tables mirroring the reference's file formats:

- ``transcripts``  : conv_id, turn_idx, role, text, tool, ts
  (BASELINE.json input_hint — the "document corpus")
- ``aliases``      : entity, alias, source, freq
  (the alias TSV of ``…/kb/KBExtractor.java:119-161``)
- ``graph_edges``  : src, dst, weight
  (the aggregated co-occurrence edge TSV of
  ``…/graph/extraction/WikiGraphExtractor.java:77-84`` + aggregate.py)
- ``labels``       : id_a, id_b, block_key, is_match, entity_id
  (gold pairs at shared blocking keys — the recast of the gold XML
  ``<annotation>`` records, ``SemanticSignatureEL.java:1055-1075``)
- ``expected_clusters`` : mention_id, cluster_id, entity_id
  (transitive closure of gold matched pairs; cluster_id = min mention_id)

Entity surface forms are built by the *inverse* of the reference's
normalizer: canonical "Firstword Secondword" names plus alias variants
with titles re-attached (M9), corporate suffixes re-attached, an
abbreviation ("Firstword S.") and a one-char typo within Jaro-Winkler
~0.93 (``…/cs/MentionExpansion.java:160-192,1128-1150``). Same-entity
turns therefore share MinHash blocks; cross-entity turns essentially
never do (first words are unique by construction).

Labels use the SAME blocking function/parameters as the pipeline
(functions/minhash.py), so "pairwise F1 at shared blocking keys" compares
identical pair universes. Everything is numpy/pandas vectorized; no Ray —
callers own any Ray session.
"""

from __future__ import annotations

import hashlib
import itertools
import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from wned_ray.config import PipelineConfig
from wned_ray.functions.minhash import block_keys_for
from wned_ray.functions.textnorm import normalize_names

_SYL1 = ["var", "quo", "zel", "mor", "tak", "bel", "rin", "dos", "fen", "gul",
         "hax", "jom", "kip", "lun", "nev", "pol", "qar", "sot", "tur", "wex"]
_SYL2 = ["anor", "ibex", "udel", "ostra", "enik", "arvo", "ullin", "extra",
         "ivane", "ormet", "ydra", "eppo"]
_TITLES = ["Dr.", "Mr.", "Ms.", "Prof."]
_SUFFIXES = ["Inc", "Ltd", "Corp", "Group"]
_FILLER = ("please check the latest status and update the record when done "
           "we should review results before the next sync also consider "
           "looking into pending items from yesterday there was some follow "
           "up needed about deployment metrics and logging around rollout "
           "thanks for taking care of this let me know if anything looks off "
           "today meanwhile keep an eye on open tickets regarding ingest "
           "quality checks for downstream consumers running during business "
           "hours").split()
_TOPIC_WORDS = ["ledger", "orbit", "kernel", "harvest", "signal", "meadow",
                "quartz", "voyage", "ember", "lattice", "tundra", "cipher",
                "anchor", "breeze", "canyon", "dynamo", "fjord", "glacier",
                "harbor", "island"]
_ROLES = ["user", "assistant", "tool"]
# transcripts are written in small row groups so ray.data.read_parquet can
# split the file into many blocks — one giant row group caps every
# downstream stage at single-task parallelism (a parquet row group is the
# minimum read-split unit). _FORMAT versions the on-disk fixture cache.
_ROW_GROUP = 16_384
_FORMAT = 10     # 10: vectorized whole-string hash changed short-norm keys
_TOOLS = ["", "search", "code", "browser"]


@dataclass(frozen=True)
class CorpusSpec:
    seed: int = 42
    n_entities: int = 400
    n_convs: int = 1250
    turns_per_conv: int = 16
    topic_size: int = 8          # entities per topic
    entities_per_conv: int = 3
    nil_fraction: float = 0.05   # turns with no entity mention (NIL analog)
    with_labels: bool = True
    # --- adversarial (hard) tier: makes precision FALSIFIABLE ---------
    # The friendly generator's unique first words make cross-entity
    # co-blocking structurally impossible (fp=0 by construction — round-2
    # VERDICT "what's wrong" #2). With hard=True, ``n_shared_pairs``
    # entity pairs (a, b) in DIFFERENT topics share their first word:
    #  - their full surfaces co-block through the token tier but must NOT
    #    match (prior=0, sem~0 — the scorer carries precision);
    #  - entity a keeps the bare first word as a surface in text, b never
    #    uses it; the bare alias maps to BOTH (a stronger) — corpus-wide
    #    promotion must DECLINE it (two non-near-dup extensions), so a
    #    broken unambiguity guard merges a's bares into b's cluster and
    #    F1 collapses (the guard demonstrably carries precision);
    #  - entity a also uses a NICKNAME surface whose alias rows favor b
    #    2:1 — prior-only resolution (PriorProbEL) picks b (wrong); the
    #    PPR doc-signature must override it (the reference's own
    #    semantic-vs-prior separation, ``…/experiment/PriorProbEL.java``).
    hard: bool = False
    n_shared_pairs: int = 0

    def fingerprint(self) -> str:
        blob = json.dumps(asdict(self), sort_keys=True)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


# canonical tiers (FIXTURES.md §7)
T1 = CorpusSpec(n_entities=60, n_convs=125, turns_per_conv=8)          # ~1k turns
T2 = CorpusSpec(n_entities=400, n_convs=1250, turns_per_conv=16)       # ~20k turns
BENCH = CorpusSpec(n_entities=4000, n_convs=31250, turns_per_conv=16,  # ~500k turns
                   with_labels=False)
# SCALE: the scaling-efficiency corpus (~8M turns). Large enough that
# parallel compute dominates the pipeline's fixed costs (actor spawn,
# driver-side CC, stage barriers), so the 8-vs-32-CPU comparison measures
# scaling of the DATA path, the in-sandbox stand-in for N vs 4N nodes.
# Entities scale 16x with the 16x turns so per-surface mention counts —
# and therefore the exact-tier pair count per surface, which grows
# QUADRATICALLY in mentions-per-surface — keep the same shape as BENCH.
SCALE = CorpusSpec(n_entities=64000, n_convs=500_000, turns_per_conv=16,
                   with_labels=False)
# SCALE4: the 4x scaling corpus (~32M turns). The per-stage fixed costs
# (aggregator-actor spawn waves, driver dim builds, stage barriers) are
# CONSTANT in corpus size but asymmetric across the two scaling legs —
# at 8M turns they are ~3-5x larger a FRACTION of the fast leg's wall
# than of the slow leg's, which alone depresses the measured efficiency
# by ~0.05-0.1; at 32M turns they amortize below ~2% of either leg, and
# single-box stall noise (documented +-35% one-sided) averages over a
# 4x longer window. Same shape discipline as SCALE: entities scale with
# turns so per-surface mention counts (and the quadratic exact-tier
# pair fan-out) stay constant.
SCALE4 = CorpusSpec(n_entities=256_000, n_convs=2_000_000,
                    turns_per_conv=16, with_labels=False)
# HARD: the adversarial-precision tier (~20k turns, same size as T2).
# 20 shared-first-word pairs across 40 of the 50 topics.
HARD = CorpusSpec(n_entities=400, n_convs=1250, turns_per_conv=16,
                  hard=True, n_shared_pairs=20)
# HARD_T1: pytest-sized twin (~1k turns; 7 topics -> max 3 pairs)
HARD_T1 = CorpusSpec(n_entities=60, n_convs=125, turns_per_conv=8,
                     hard=True, n_shared_pairs=3)


def config_for(spec: CorpusSpec, **overrides) -> PipelineConfig:
    """The PipelineConfig a corpus tier is designed for. Hard tiers need
    the token blocking tier (bare surfaces are AMBIGUOUS by construction,
    so the corpus-wide promotion guard declines them and the pair scorer
    must see the short<->long pairs — see config.token_blocks docs) and a
    hub cap above the shared-token block weight (~2 entities x ~50
    mentions < 256). One helper drives synth labels, pipeline queries and
    tests so the pair universes stay aligned."""
    if spec.hard:
        return PipelineConfig(seed=spec.seed, token_blocks=True,
                              max_block_size=256, **overrides)
    return PipelineConfig(seed=spec.seed, **overrides)


def _entity_names(n: int, rng: np.random.Generator) -> list[str]:
    """n unique two-word TitleCase names; first words unique per entity."""
    first_combos = ["".join(c) for c in itertools.product(_SYL1, _SYL1, _SYL1)]
    # large tiers: extend to 4- then 5-syllable words until the pool
    # covers n (the 20-syllable alphabet yields 8k/168k/3.36M cumulative
    # unique combos; SCALE4's 256k entities need the 5-syllable tier)
    for n_syl in (4, 5):
        if n <= len(first_combos):
            break
        first_combos += ["".join(c) for c in
                         itertools.islice(itertools.product(
                             *([_SYL1] * n_syl)),
                             2 * (n - len(first_combos)))]
        # a k-syllable concatenation can collide with a shorter one
        # (syllables are 2-3 chars) — dedupe or two entities could share
        # their "unique" first word (ADVICE.md round 1)
        first_combos = list(dict.fromkeys(first_combos))
    assert n <= len(first_combos)
    idx = rng.permutation(len(first_combos))[:n]
    firsts = [first_combos[i].capitalize() for i in idx]
    seconds = [( _SYL1[int(rng.integers(len(_SYL1)))] +
                 _SYL2[int(rng.integers(len(_SYL2)))]).capitalize()
               for _ in range(n)]
    return [f"{a} {b}" for a, b in zip(firsts, seconds)]


def _alias_variants(name: str, rng: np.random.Generator) -> list[tuple[str, str, int]]:
    """(surface_form, source, freq) variants for one entity (FIXTURES §1).

    The last variant ("oldname") is the entity's FORMER name: it appears
    in transcripts but is deliberately ABSENT from the aliases table —
    it reaches the entity only through the redirects table (old surface
    -> current primary surface), exactly the reference's redirect
    composition (``…/kb/KBExtractor.java:190-235``). A pipeline that
    skips redirect resolution scores these mentions with prior=0 and
    sem=0 and loses them (recall drop)."""
    first, second = name.split(" ", 1)
    typo_pos = int(rng.integers(1, len(second) - 1))
    typo = second[:typo_pos] + second[typo_pos + 1:]          # drop one char
    old = second[:-2] + "yx"      # former name: last 2 chars renamed — close
    # enough to co-block with the primary (shared shingle prefix) but a
    # distinct surface whose alias entry exists only via the redirect
    return [
        (name, "name", 40),
        (f"{first} {second[0]}.", "link", 10),                # abbreviation
        (f"{_TITLES[int(rng.integers(len(_TITLES)))]} {name}", "link", 5),
        (f"{name} {_SUFFIXES[int(rng.integers(len(_SUFFIXES)))]}", "link", 5),
        (f"{first} {typo.capitalize()}", "redirect", 8),      # typo variant
        (f"{first} {old.capitalize()}", "oldname", 6),        # redirect-only
        # bare first name: in NO dim table — linkable only through the M8
        # person-coref promotion to a longer co-occurring surface
        (first, "barename", 4),
        # initials: in NO dim table; the turn text renders as
        # "VS (Varquo Sotanor)" so the surface is linkable only through
        # the M13 abbreviation-definition miner
        (f"{first[0]}{second[0]}".upper(), "abbrevinit", 4),
    ]


def generate_corpus(spec: CorpusSpec, out_dir: str,
                    cfg: PipelineConfig | None = None) -> dict[str, str]:
    """Write all fixture tables under out_dir; returns {table: path}.

    Deterministic: a fresh ``default_rng(spec.seed)`` drives every draw in
    a fixed order (the reference's wall-clock seeding at
    ``SemanticSignatureEL.java:389`` is a documented nondeterminism we fix).
    """
    cfg = cfg or config_for(spec)
    rng = np.random.default_rng(spec.seed)
    os.makedirs(out_dir, exist_ok=True)

    names = _entity_names(spec.n_entities, rng)

    # ---- hard tier: shared-first-word entity pairs + nicknames (see
    # CorpusSpec.hard docs). Pair j: a in topic 2j, b in topic 2j+1 —
    # different topics, so no conversation ever contains both (a bare
    # mention in a conv with BOTH extensions would be unresolvable even
    # for the reference's per-document promotion).
    shared_a = np.zeros(0, np.int64)
    shared_b = np.zeros(0, np.int64)
    nicknames: list[str] = []
    if spec.hard and spec.n_shared_pairs:
        n_topics_h = max(1, spec.n_entities // spec.topic_size)
        if 2 * spec.n_shared_pairs > n_topics_h:
            raise ValueError("hard tier needs 2 topics per shared pair")
        j = np.arange(spec.n_shared_pairs, dtype=np.int64)
        shared_a = (2 * j) * spec.topic_size + (j % spec.topic_size)
        shared_b = (2 * j + 1) * spec.topic_size + (j % spec.topic_size)
        for aj, bj in zip(shared_a, shared_b):
            first_a, second_a = names[aj].split(" ", 1)
            second_b = names[bj].split(" ", 1)[1]
            # the pair must share ONLY the first word: same second-word
            # initials would make the abbreviation surfaces ("Kippolsot
            # J.") collide across entities — a same-norm different-entity
            # surface in TEXT, unresolvable for any norm-level scorer
            att = 0
            while second_b[0].lower() == second_a[0].lower():
                second_b = (_SYL1[(int(bj) + att) % len(_SYL1)]
                            + _SYL2[(int(bj) + att) % len(_SYL2)]).capitalize()
                att += 1
            names[bj] = f"{first_a} {second_b}"
        # single-token nickname surfaces; "Zz" prefix never occurs in the
        # syllable-built names, so nicknames collide with nothing else
        nicknames = [("zz" + _SYL1[int(k) % len(_SYL1)]
                      + _SYL2[int(k) % len(_SYL2)]).capitalize()
                     for k in range(spec.n_shared_pairs)]

    alias_path = os.path.join(out_dir, "aliases.parquet")

    # ---- transcripts
    n_turns = spec.n_convs * spec.turns_per_conv
    n_topics = max(1, spec.n_entities // spec.topic_size)
    conv_idx = np.repeat(np.arange(spec.n_convs), spec.turns_per_conv)
    turn_idx = np.tile(np.arange(spec.turns_per_conv, dtype=np.int32), spec.n_convs)
    conv_topic = conv_idx % n_topics

    # entities available to each conversation: entities_per_conv from its topic
    # vectorized: per conversation, entities_per_conv distinct members of
    # its topic via argsort of a random matrix (no per-conv Python — the
    # SCALE tier has 5e5 conversations)
    ent_of_topic = np.arange(spec.n_entities) // spec.topic_size  # entity -> topic
    members_of = np.full((n_topics, spec.topic_size), -1, np.int64)
    for t in range(n_topics):
        m = np.nonzero(ent_of_topic == t)[0]
        members_of[t, :len(m)] = np.resize(m, min(len(m), spec.topic_size))
        if len(m) < spec.topic_size:
            members_of[t, len(m):] = np.resize(m, spec.topic_size - len(m))
    kpick = min(spec.entities_per_conv, spec.topic_size)
    order = np.argsort(rng.random((spec.n_convs, spec.topic_size)), axis=1)
    picks = order[:, :kpick]
    topic_of_conv = np.arange(spec.n_convs) % n_topics
    conv_entities = members_of[topic_of_conv[:, None], picks]
    if kpick < spec.entities_per_conv:
        reps = np.tile(conv_entities,
                       (spec.entities_per_conv + kpick - 1) // kpick)
        conv_entities = reps[:, :spec.entities_per_conv]

    slot = rng.integers(0, spec.entities_per_conv, size=n_turns)
    turn_entity = conv_entities[conv_idx, slot]
    is_nil = rng.random(n_turns) < spec.nil_fraction
    turn_entity = np.where(is_nil, -1, turn_entity)

    # variant choice per turn (weighted like alias freqs)
    variant_p = np.array([40, 10, 5, 5, 8, 6, 4, 4], dtype=np.float64)
    variant_p /= variant_p.sum()
    variant = rng.choice(len(variant_p), size=n_turns, p=variant_p)
    if spec.hard and len(shared_b):
        # b-entities NEVER use the bare shared surface in text: the bare
        # norm's mentions all belong to a, so the exact tier stays
        # FP-free while the alias row ambiguity (a vs b) remains real
        variant = np.where(np.isin(turn_entity, shared_b) & (variant == 6),
                           0, variant)
        # a-entities render their typo-variant draws as the nickname too
        # (slot 7): the typo ALIAS row stays (slot 4 is in the dim table),
        # but a's text exposure of the prior-trap nickname rises to
        # ~15% of its mentions so the prior-vs-semantic separation is
        # measured on tens of mentions, not one
        variant = np.where(np.isin(turn_entity, shared_a) & (variant == 4),
                           7, variant)
    # per-entity surface forms drawn with a per-entity rng: the same table
    # drives both the turn texts and the aliases dim table, so the alias
    # dictionary and the corpus agree exactly
    surface_lut = np.array(
        [[v[0] for v in _alias_variants(n, np.random.default_rng(
            spec.seed + 7919 * i))] for i, n in enumerate(names)],
        dtype=object)
    if spec.hard and len(shared_a):
        # a-entities trade the abbrevinit variant slot for the nickname
        # (rendered PLAIN — no parenthetical, so only the alias table
        # links it, ambiguously, to a and b)
        for k, aj in enumerate(shared_a):
            surface_lut[aj, 7] = nicknames[k]

    mention = np.where(is_nil, "", surface_lut[np.maximum(turn_entity, 0), variant])
    # the abbrevinit variant RENDERS with its parenthetical definition
    # ("VS (Varquo Sotanor)") — the mention surface stays the initials
    # (extract_mentions stops at the paren); only the miner sees the rest
    full_name = np.array(names, dtype=object)[np.maximum(turn_entity, 0)]
    paren = (variant == 7) & ~is_nil
    if spec.hard and len(shared_a):
        paren &= ~np.isin(turn_entity, shared_a)      # nicknames render plain
    shown = np.where(paren,
                     mention.astype(object) + " (" + full_name + ")",
                     mention)
    # the "link"-sourced variants (1-3) RENDER as wiki anchors
    # "[[Entity_Name|surface]]" (WikiTextParser.parseLinks markup): the
    # M2 stripper shows downstream stages the plain surface, and the M3
    # miner recovers (entity, alias) rows from the target|anchor pairs
    target = np.char.replace(full_name.astype(str), " ", "_").astype(object)
    is_link = np.isin(variant, (1, 2, 3)) & ~is_nil
    shown = np.where(is_link,
                     "[[" + target + "|" + shown.astype(object) + "]]",
                     shown)

    # filler: prefix/suffix word windows + one topic word (local-context signal)
    fill = np.array(_FILLER, dtype=object)
    p_idx = rng.integers(0, len(fill) - 4, size=n_turns)
    s_idx = rng.integers(0, len(fill) - 4, size=n_turns)
    topic_word = np.array(_TOPIC_WORDS, dtype=object)[conv_topic % len(_TOPIC_WORDS)]
    prefix = fill[p_idx] + " " + fill[p_idx + 1] + " " + fill[p_idx + 2]
    suffix = fill[s_idx] + " " + fill[s_idx + 1] + " about " + topic_word
    text = np.where(
        is_nil,
        prefix + " " + suffix,
        prefix + " " + shown.astype(object) + " " + suffix,
    )

    conv_id = pd.array([f"c{c:07d}" for c in conv_idx], dtype="string")
    role = np.array(_ROLES, dtype=object)[turn_idx % len(_ROLES)]
    tool = np.array(_TOOLS, dtype=object)[
        rng.integers(0, len(_TOOLS), size=n_turns)]
    tool = np.where(role == "tool", tool, "")
    base_ts = np.datetime64("2026-01-01T00:00:00", "us")
    ts = base_ts + conv_idx.astype("timedelta64[h]") + (turn_idx * 30).astype("timedelta64[s]")

    transcripts = pa.table({
        "conv_id": pa.array(conv_id, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(role, pa.string()),
        "text": pa.array(text.astype(object), pa.string()),
        "tool": pa.array(tool.astype(object), pa.string()),
        "ts": pa.array(ts.astype("datetime64[us]")),
    })
    tr_path = os.path.join(out_dir, "transcripts.parquet")
    pq.write_table(transcripts, tr_path, row_group_size=_ROW_GROUP)

    # ---- aliases dim table (normalized alias key, like the reference's
    # lowercased lookup key CandidateSelectionLucene.java:95).
    # The "oldname" variant is EXCLUDED — it is only reachable through the
    # redirects table (KBExtractor.resolveRedirect semantics).
    # (variants 5 "oldname", 6 "barename" and 7 "abbrevinit" are excluded
    # from aliases: oldname resolves through redirects, barename through
    # M8 promotion, abbrevinit through M13 definition mining)
    alias_rows2 = []
    src_by_variant = ["name", "link", "link", "link", "redirect"]
    freq_by_variant = [40, 10, 5, 5, 8]
    for i, name in enumerate(names):
        for v in range(5):
            alias_rows2.append((name, surface_lut[i, v], src_by_variant[v],
                                freq_by_variant[v]))
    if spec.hard:
        # same-alias different-entity rows — REAL prior ambiguity
        # (CandidateSelectionLucene exists because aliases are ambiguous):
        # the shared bare surface favors a 3:1 (a uses it in text, b owns
        # it too); the nickname favors b 2:1 while the TEXT mentions are
        # a's — prior-only resolution picks b, the PPR signature must not
        for k, (aj, bj) in enumerate(zip(shared_a, shared_b)):
            bare = names[aj].split(" ", 1)[0]
            alias_rows2.append((names[aj], bare, "name", 12))
            alias_rows2.append((names[bj], bare, "name", 4))
            alias_rows2.append((names[bj], nicknames[k], "nickname", 8))
            alias_rows2.append((names[aj], nicknames[k], "nickname", 4))
    alias_df = pd.DataFrame(alias_rows2, columns=["entity", "surface", "source", "freq"])
    alias_df["alias"] = normalize_names(pa.array(alias_df["surface"].astype(str))).to_pylist()
    alias_out = (alias_df.groupby(["entity", "alias", "source"], as_index=False)
                 .agg(freq=("freq", "sum")))[["entity", "alias", "source", "freq"]]
    pq.write_table(pa.Table.from_pandas(alias_out, preserve_index=False), alias_path)

    # ---- redirects dim table: old surface -> current primary surface,
    # both normalized (the reference's redirect TSV, KBExtractor.java:114-122;
    # resolved into extra alias rows by stages/aliases.resolve_redirects)
    old_norm = normalize_names(
        pa.array([surface_lut[i, 5] for i in range(len(names))])).to_pylist()
    primary_norm = normalize_names(
        pa.array([surface_lut[i, 0] for i in range(len(names))])).to_pylist()
    redirects_df = pd.DataFrame({"from_alias": old_norm,
                                 "to_alias": primary_norm})
    redirects_path = os.path.join(out_dir, "redirects.parquet")
    pq.write_table(pa.Table.from_pandas(redirects_df, preserve_index=False),
                   redirects_path)

    # ---- co-occurrence graph (M4/G1 analog: same-conversation entity pairs)
    ent_name = np.array(names, dtype=object)
    gdf = pd.DataFrame({"conv": conv_idx, "ent": turn_entity})
    gdf = gdf[gdf["ent"] >= 0].drop_duplicates()
    pairs = gdf.merge(gdf, on="conv")
    pairs = pairs[pairs["ent_x"] < pairs["ent_y"]]
    agg = pairs.groupby(["ent_x", "ent_y"], as_index=False).size()
    graph_df = pd.DataFrame({
        "src": ent_name[agg["ent_x"].to_numpy()],
        "dst": ent_name[agg["ent_y"].to_numpy()],
        "weight": agg["size"].astype(np.float32),
    })
    graph_path = os.path.join(out_dir, "graph_edges.parquet")
    pq.write_table(pa.Table.from_pandas(graph_df, preserve_index=False), graph_path)

    paths = {"transcripts": tr_path, "aliases": alias_path,
             "graph_edges": graph_path, "redirects": redirects_path}

    # ---- labels + expected clusters (gold, at shared blocking keys)
    if spec.with_labels:
        mention_norm = normalize_names(pa.array(mention.astype(object))).to_pylist()
        if cfg.coref_promote or cfg.abbrev_expand:
            # the IDENTICAL per-conversation promotion the pipeline applies
            # (functions/coref.promote_norms: M13 definition expansion then
            # M8 substring promotion) — keeps the pair universes aligned
            from wned_ray.functions.coref import promote_norms

            conv_groups = pd.Series(range(n_turns)).groupby(conv_idx).indices
            for _conv, idx in conv_groups.items():
                prom = promote_norms(
                    [mention[i] for i in idx], [text[i] for i in idx],
                    [mention_norm[i] for i in idx],
                    coref=cfg.coref_promote, abbrev=cfg.abbrev_expand)
                for i, p in zip(idx, prom):
                    mention_norm[i] = p
        row_idx, keys = block_keys_for(mention_norm, cfg.shingle_k, cfg.num_perm,
                                       cfg.band_rows, cfg.seed)
        keys_np = keys.to_numpy(zero_copy_only=False)
        if cfg.token_blocks:
            # mirror the pipeline's token blocking tier (one extra block
            # per (norm, name token), functions/minhash.token_block_keys
            # drives BOTH sides) so the labeled pair universe includes the
            # short<->long and shared-token pairs the hard tier exists for
            from wned_ray.functions.minhash import token_block_keys

            trow, tkeys = token_block_keys(mention_norm)
            row_idx = np.concatenate([row_idx, trow])
            keys_np = np.concatenate([keys_np, tkeys])
        bdf = pd.DataFrame({"row": row_idx, "key": keys_np})
        bdf = bdf.drop_duplicates()                      # one row per (turn, key)
        sizes = bdf.groupby("key")["row"].transform("size")
        bdf = bdf[sizes <= cfg.max_block_size]           # hub filter, same as pipeline
        j = bdf.merge(bdf, on="key")
        j = j[j["row_x"] < j["row_y"]]
        j = (j.sort_values(["row_x", "row_y", "key"])
              .drop_duplicates(["row_x", "row_y"]))  # keep min block_key per pair
        mid = (pd.Series(conv_id, dtype=object) + ":" +
               pd.Series(turn_idx).astype(str)).to_numpy(dtype=object)
        ea = turn_entity[j["row_x"].to_numpy()]
        eb = turn_entity[j["row_y"].to_numpy()]
        is_match = (ea == eb) & (ea >= 0)
        labels = pd.DataFrame({
            "id_a": mid[j["row_x"].to_numpy()],
            "id_b": mid[j["row_y"].to_numpy()],
            "block_key": j["key"].to_numpy(),
            "is_match": is_match,
            "entity_id": np.where(is_match, ent_name[np.maximum(ea, 0)], "NIL"),
        })
        # canonical id_a < id_b (string order) like WikiGraphExtractor.java:71-72
        swap = labels["id_a"] > labels["id_b"]
        labels.loc[swap, ["id_a", "id_b"]] = labels.loc[swap, ["id_b", "id_a"]].to_numpy()
        labels_path = os.path.join(out_dir, "labels.parquet")
        pq.write_table(pa.Table.from_pandas(labels, preserve_index=False), labels_path)
        paths["labels"] = labels_path

        # expected clusters: union-find over matched gold pairs
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in zip(labels.loc[labels["is_match"], "id_a"],
                        labels.loc[labels["is_match"], "id_b"]):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        cluster = np.array([find(m) for m in mid], dtype=object)
        exp = pd.DataFrame({
            "mention_id": mid,
            "cluster_id": cluster,
            "entity_id": np.where(turn_entity >= 0, ent_name[np.maximum(turn_entity, 0)], "NIL"),
        })
        exp_path = os.path.join(out_dir, "expected_clusters.parquet")
        pq.write_table(pa.Table.from_pandas(exp, preserve_index=False), exp_path)
        paths["expected_clusters"] = exp_path

    with open(os.path.join(out_dir, "_SPEC.json"), "w") as f:
        json.dump({"spec": asdict(spec), "fingerprint": spec.fingerprint(),
                   "format": _FORMAT, "tables": sorted(paths)}, f, indent=2)
    return paths


def ensure_corpus(spec: CorpusSpec, base_dir: str = "/tmp/wned_ray_fixtures"
                  ) -> dict[str, str]:
    """Cached corpus keyed by spec fingerprint; regenerates when absent."""
    out_dir = os.path.join(base_dir, spec.fingerprint())
    manifest = os.path.join(out_dir, "_SPEC.json")
    expected = ["transcripts", "aliases", "graph_edges", "redirects"] + (
        ["labels", "expected_clusters"] if spec.with_labels else [])
    if os.path.exists(manifest):
        with open(manifest) as f:
            meta = json.load(f)
        paths = {t: os.path.join(out_dir, f"{t}.parquet") for t in expected}
        if (meta.get("format") == _FORMAT
                and all(os.path.exists(p) for p in paths.values())):
            return paths
    return generate_corpus(spec, out_dir)


def fresh_delta_fixture(base_corpus: dict[str, str], spec: CorpusSpec,
                        base_dir: str = "/tmp/wned_ray_fixtures"
                        ) -> dict[str, str]:
    """Append-scenario fixture: a delta whose entity VOCABULARY is fresh.

    The 90/10 same-corpus split used by ``er_increment_delta10`` is the
    increment's worst case: the synthetic generator reuses one entity
    vocabulary across conversations, so a 10% conv delta touches ~78% of
    the base's block keys and pair pruning is bounded by that overlap
    (BASELINE.md). The realistic append regime — new conversations about
    mostly NEW topics — is this fixture: a second corpus generated under
    ``spec`` (caller picks a different seed, so its entity names, and
    hence its block keys, are disjoint from the base's up to rare random
    syllable collisions), with

    - ``delta_transcripts``: the fresh conversations, conv_ids
      ``"f"``-prefixed so the union stays key-collision-free;
    - ``union_transcripts``: base + delta concatenated (both halves stay
      conversation-contiguous, so ``presorted_conversations`` holds) —
      the full-rerun comparator;
    - ``aliases`` / ``graph_edges`` / ``redirects``: base and fresh dim
      tables concatenated (the KB after the append).

    Cached under a key derived from the base path + spec fingerprint.
    """
    import pyarrow.compute as pc

    key = hashlib.sha256(
        (base_corpus["transcripts"] + "|" + spec.fingerprint()).encode()
    ).hexdigest()[:16]
    out_dir = os.path.join(base_dir, f"fresh_{key}")
    manifest = os.path.join(out_dir, "_FRESH.json")
    names = ["delta_transcripts", "union_transcripts", "aliases",
             "graph_edges", "redirects"]
    paths = {n: os.path.join(out_dir, f"{n}.parquet") for n in names}
    if (os.path.exists(manifest)
            and all(os.path.exists(p) for p in paths.values())):
        return paths
    fresh = ensure_corpus(spec, base_dir)
    os.makedirs(out_dir, exist_ok=True)
    ft = pq.read_table(fresh["transcripts"])
    ft = ft.set_column(
        ft.schema.get_field_index("conv_id"), "conv_id",
        pc.binary_join_element_wise("f", ft["conv_id"], ""))
    pq.write_table(ft, paths["delta_transcripts"])
    bt = pq.read_table(base_corpus["transcripts"])
    pq.write_table(pa.concat_tables([bt, ft]), paths["union_transcripts"])
    for dim in ("aliases", "graph_edges", "redirects"):
        merged = pa.concat_tables([pq.read_table(base_corpus[dim]),
                                   pq.read_table(fresh[dim])])
        pq.write_table(merged, paths[dim])
    with open(manifest, "w") as f:
        json.dump({"spec": asdict(spec), "base": base_corpus["transcripts"],
                   "format": _FORMAT}, f, indent=2)
    return paths
