"""Text / name normalization and mention extraction (vectorized).

Reimplements the reference's normalization semantics over Arrow columns:

- M9  name normalizer: strip person titles ("mr.", "prof.", …) and corporate
  suffixes ("inc", "ltd", …), trailing dot
  (``…/cs/MentionExpansion.java:160-192``).
- M10 whitespace collapse + lowercase before alias lookup
  (``…/cs/CandidateSelectionLucene.java:95,161``).
- M11 stopword filter — Lucene English stopword set
  (``…/utils/StringUtils.java:29-35``).
- M6  mention extraction: the reference runs Stanford NER
  (``…/common/nlp/StanfordNER.java:41-288``); in the transcript graft the
  mention is the capitalized token run embedded in the turn text, extracted
  with a vectorized regex (the corpus generator guarantees filler text is
  lowercase, so the capitalized run IS the entity surface form).

All kernels are pyarrow.compute / regex based — no per-row Python loops.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Person titles stripped by MentionExpansion.normalizeName (reference list).
TITLES = (
    "mr", "mrs", "ms", "miss", "dr", "prof", "professor", "sir",
    "president", "senator", "gov", "gen", "rep", "st",
)
# Corporate designators stripped by the same normalizer.
CORP_SUFFIXES = ("inc", "ltd", "llc", "corp", "co", "company", "group", "plc")

# Lucene's classic English stopword set (StringUtils.java:29-35 loads
# StopAnalyzer.ENGLISH_STOP_WORDS_SET — this is that public list).
STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

_TITLE_RE = r"^(?:(?:" + "|".join(TITLES) + r")\.?\s+)+"
_CORP_RE = r"(?:\s+(?:" + "|".join(CORP_SUFFIXES) + r")\.?)+$"

# A mention = a run of Capitalized / ALLCAPS tokens (incl. initials "J."),
# possibly hyphen/apostrophe-bearing. First match per turn text.
MENTION_RE = r"(?:[A-Z][\w'.&-]*)(?:[ ](?:[A-Z][\w'.&-]*))*"
_MENTION_EXTRACT_RE = r"(?P<mention>" + MENTION_RE + r")"


def normalize_names(arr: pa.Array | pa.ChunkedArray,
                    strip_titles: bool = True,
                    strip_corp: bool = True) -> pa.Array | pa.ChunkedArray:
    """Normalize a column of name/mention strings.

    lowercase -> collapse whitespace -> trim -> strip leading titles ->
    strip trailing corporate suffixes -> strip trailing dot.
    Mirrors MentionExpansion.normalizeName:160-192 + CandidateSelectionLucene:95.
    """
    x = pc.utf8_lower(arr)
    x = pc.replace_substring_regex(x, r"\s+", " ")
    x = pc.utf8_trim_whitespace(x)
    if strip_titles:
        x = pc.replace_substring_regex(x, _TITLE_RE, "")
    if strip_corp:
        x = pc.replace_substring_regex(x, _CORP_RE, "")
    # trailing dot (MentionExpansion.java:190: name.endsWith(".") -> drop)
    x = pc.replace_substring_regex(x, r"\.$", "")
    x = pc.utf8_trim_whitespace(x)
    return x


def extract_mentions(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Extract the first capitalized token run from each turn text (M6 analog).

    Returns a string array; rows with no capitalized run get "".
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    ex = pc.extract_regex(text, _MENTION_EXTRACT_RE)  # struct array, one field
    mention = pc.struct_field(ex, 0)
    return pc.if_else(pc.is_valid(mention), mention, pa.scalar("", pa.string()))


def context_terms(text: pa.Array | pa.ChunkedArray,
                  mention: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Tokenized, stopword-free context of each turn: the turn text with the
    mention removed, lowercased and split on non-word chars (M10+M11).

    Returns list<string> — the sparse context vector's term list (the tf
    weight is the in-list multiplicity; see VectorSimilarity cosine in
    functions/vectorsim.py).
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if isinstance(mention, pa.ChunkedArray):
        mention = mention.combine_chunks()
    # remove the mention occurrence, then tokenize
    # (replace_substring has no per-row pattern; mask via split on the
    # mention is overkill — the corpus embeds the mention once, so removing
    # capitalized runs globally is equivalent and fully vectorized)
    x = pc.replace_substring_regex(text, MENTION_RE, " ")
    x = pc.utf8_lower(x)
    toks = pc.split_pattern_regex(x, r"[^\w]+")
    # drop empties and stopwords
    flat_valid = pc.and_(
        pc.greater(pc.utf8_length(pc.list_flatten(toks)), 0),
        pc.invert(pc.is_in(pc.list_flatten(toks),
                           value_set=pa.array(sorted(STOPWORDS)))),
    )
    # rebuild list array with mask applied
    flat = pc.list_flatten(toks)
    offsets = pc.list_parent_indices(toks)
    keep = flat_valid
    kept_terms = pc.filter(flat, keep)
    kept_parent = pc.filter(offsets, keep)
    # build list<string> from (parent, term) pairs
    import numpy as np

    parents = kept_parent.to_numpy(zero_copy_only=False)
    n = len(toks)
    counts = np.bincount(parents, minlength=n) if len(parents) else np.zeros(n, np.int64)
    new_offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=new_offsets[1:])
    return pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()), kept_terms)
