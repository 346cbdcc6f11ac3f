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
from wned_ray.functions.anchors import strip_markup
from wned_ray.functions.textnorm import (context_terms, extract_mentions,
                                         normalize_names)


def extract_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Mention extraction + normalization (no context yet).

    markup -> plain (M2, WikiTextParser display semantics): mention
    extraction sees the DISPLAY form of any [[target|anchor]] wiki link;
    the stored ``text`` column passes through byte-identical (input_hint
    per-row invariant) — the stripped view is transient."""
    text = strip_markup(batch["text"])
    mention = extract_mentions(text)
    norm = normalize_names(mention, cfg.strip_titles, cfg.strip_corp_suffixes)
    mention_id = pc.binary_join_element_wise(
        batch["conv_id"], pc.cast(batch["turn_idx"], pa.string()), ":")
    return (batch
            .append_column("mention_id", mention_id)
            .append_column("mention", mention)
            .append_column("norm_mention", norm))


def context_batch(batch: pa.Table) -> pa.Table:
    text = strip_markup(batch["text"])
    ctx_list = context_terms(text, batch["mention"])
    return batch.append_column("ctx", pc.binary_join(ctx_list, " "))


def prepare_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """extract + context in one pass (the no-promotion fast path)."""
    return context_batch(extract_batch(batch, cfg))


def prepare(ds, cfg: PipelineConfig):
    """transcripts Dataset -> prepared Dataset (stateless tasks), plus the
    per-conversation promotion shuffle (M8 coref + M13 abbreviation
    expansion) when either is enabled.

    The ``ctx`` term bag (text-sized) is computed AFTER the promotion
    shuffle: it does not depend on the promoted norm, and materializing
    it before the conv_id sort would double the bytes moved through the
    pipeline's one unavoidable per-document all-to-all."""
    if cfg.coref_promote or cfg.abbrev_expand:
        out = ds.map_batches(lambda b: extract_batch(b, cfg),
                             batch_format="pyarrow")
        out = promote_mentions(out, cfg)
        return out.map_batches(context_batch, batch_format="pyarrow")
    return ds.map_batches(lambda b: prepare_batch(b, cfg),
                          batch_format="pyarrow")


def promote_mentions(prepared_ds, cfg: PipelineConfig):
    """Per-conversation norm promotion, grouped by conversation: M13
    abbreviation-definition expansion first ("VS" with a mined definition
    inherits the definition's norm,
    ``MentionExpansion.findAbbrevDefinitions:961-1066``), then M8
    substring promotion (short norm -> longest containing co-occurring
    norm, ``ELUtils.resolve:178-208``). The pre-promotion norm is kept as
    ``norm_orig`` for the J3 multi-key candidate lookup downstream.

    This is the one deliberately per-document shuffle in the prepare path
    — the promotion decision needs the conversation's full surface set
    (reference semantics are per-document). Groups are conversation-sized
    (tiny), the payload is the prepared row, and the same conv_id
    partitioning is what downstream per-conv stages (resolve) use.
    (``map_groups`` wants a plain function, hence the closure over the
    two config flags rather than a callable class. The group function
    stays on zero-copy Arrow slices — at corpus scale it runs once per
    conversation, so a pandas copy + ``Table.from_pandas`` per group was
    the promote stage's dominant constant.)"""
    coref, abbrev = cfg.coref_promote, cfg.abbrev_expand

    def _promote_group(t: pa.Table) -> pa.Table:
        from wned_ray.functions.coref import promote_norms

        norms = t["norm_mention"].to_pylist()
        mine = (abbrev and "mention" in t.column_names
                and "text" in t.column_names)
        raw = t["mention"].to_pylist() if mine else [""] * len(norms)
        texts = t["text"].to_pylist() if mine else []
        out = promote_norms(raw, texts, norms, coref=coref, abbrev=mine)
        t = t.append_column("norm_orig", t["norm_mention"])
        if out != norms:
            t = t.set_column(t.column_names.index("norm_mention"),
                             "norm_mention", pa.array(out, pa.string()))
        return t

    return (prepared_ds
            .groupby("conv_id")
            .map_groups(_promote_group, batch_format="pyarrow",
                        zero_copy_batch=True))
