"""Prepare stage: mention extraction + normalization per turn (M6/M9/M10/M11).

Stateless ``map_batches`` over zero-copy Arrow. Input is the
``input_hint`` transcript schema; output adds:

- ``mention_id``   : ``conv_id || ':' || turn_idx`` (the stable primary key)
- ``mention``      : raw extracted surface form (capitalized token run)
- ``norm_mention`` : normalized form (the alias-lookup key,
  ``CandidateSelectionLucene.java:95``)
- ``ctx``          : space-joined, stopword-filtered, lowercased context
  terms of the turn (mention removed) — the sparse context vector's term
  bag, serialized compactly for transit (``TFIDF3x.DocTFIDFVector`` analog)

Per-row invariant: ``text`` passes through byte-identical, and
``(conv_id, turn_idx)`` is never modified (BASELINE.json input_hint).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from wned_ray.config import PipelineConfig
from wned_ray.functions.textnorm import (context_terms, extract_mentions,
                                         normalize_names)


def prepare_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    text = batch["text"]
    mention = extract_mentions(text)
    norm = normalize_names(mention, cfg.strip_titles, cfg.strip_corp_suffixes)
    ctx_list = context_terms(text, mention)
    ctx = pc.binary_join(ctx_list, " ")
    mention_id = pc.binary_join_element_wise(
        batch["conv_id"], pc.cast(batch["turn_idx"], pa.string()), ":")
    return (batch
            .append_column("mention_id", mention_id)
            .append_column("mention", mention)
            .append_column("norm_mention", norm)
            .append_column("ctx", ctx))


def prepare(ds, cfg: PipelineConfig):
    """transcripts Dataset -> prepared Dataset (stateless tasks), plus the
    per-conversation coref promotion shuffle when ``cfg.coref_promote``."""
    out = ds.map_batches(lambda b: prepare_batch(b, cfg),
                         batch_format="pyarrow")
    if cfg.coref_promote:
        out = promote_mentions(out, cfg)
    return out


def _promote_group(g, _cfg=None):
    """One conversation: rewrite each short norm to its longest containing
    co-occurring norm (M8, ``ELUtils.resolve:178-208``). Emits Arrow so
    every stage boundary stays on Arrow blocks (pandas blocks break the
    arrow-native Project/rename operators downstream)."""
    from wned_ray.functions.coref import apply_promotion

    g = g.copy()
    g["norm_mention"] = apply_promotion(g["norm_mention"].tolist())
    return pa.Table.from_pandas(g, preserve_index=False)


def promote_mentions(prepared_ds, cfg: PipelineConfig):
    """Person-coref substring promotion, grouped by conversation.

    This is the one deliberately per-document shuffle in the prepare path
    — the promotion decision needs the conversation's full surface set
    (reference semantics are per-document). Groups are conversation-sized
    (tiny), the payload is the prepared row, and the same conv_id
    partitioning is what downstream per-conv stages (resolve) use."""
    return (prepared_ds
            .groupby("conv_id")
            .map_groups(_promote_group, batch_format="pandas"))
