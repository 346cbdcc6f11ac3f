"""Link/anchor markup parsing (M5) + markup->plain stripping (M2).

The reference parses ``[[target|anchor]]`` / ``[[target]]`` wiki links
out of page text (``…/kb/wikipedia/wikixmlj/WikiTextParser.java:135-170``
``parseLinks``) and canonicalizes the target with ``formatName``
(``WikiTextParser.java:119-133``: collapse whitespace, underscore ->
space, trim, capitalize the first letter). The anchor-text pairs feed
the alias dictionary (``…/kb/KBExtractor.java:98-167``); in the graft
the same pairs are mined from anchor-marked transcript turns by
``stages/aliases.mine_anchor_aliases`` (M3).

All kernels are vectorized: the stripper is two RE2 rewrites over the
Arrow column; the pair extractor is one pandas ``str.extractall`` (C
regex) producing flat (row, target, anchor) arrays for flat-map stages.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# [[target]] or [[target|anchor]]; target may not contain '|' or brackets
ANCHOR_RE = r"\[\[([^\[\]|]+)(?:\|([^\[\]|]+))?\]\]"


def format_name(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """``WikiTextParser.formatName:119-133``: collapse whitespace,
    underscore -> space, trim, first letter uppercased."""
    x = pc.replace_substring_regex(arr, r"\s+", " ")
    x = pc.replace_substring(x, "_", " ")
    x = pc.utf8_trim_whitespace(x)
    # capitalize ONLY the first char (utf8_capitalize also lowercases the
    # rest, which formatName does not)
    head = pc.utf8_upper(pc.utf8_slice_codeunits(x, 0, 1))
    return pc.binary_join_element_wise(head, pc.utf8_slice_codeunits(
        x, 1, np.iinfo(np.int32).max), "")


def strip_markup(text: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Markup -> plain (M2): ``[[t|a]]`` renders as ``a``, ``[[t]]`` as
    ``t`` — the display form of the wiki link. Two RE2 rewrites, fully
    vectorized; non-markup text passes through unchanged."""
    x = pc.replace_substring_regex(
        text, r"\[\[[^\[\]|]+\|([^\[\]|]+)\]\]", r"\1")
    return pc.replace_substring_regex(x, r"\[\[([^\[\]|]+)\]\]", r"\1")


def parse_anchors(text: pa.Array | pa.ChunkedArray
                  ) -> tuple[np.ndarray, pa.Array, pa.Array]:
    """Extract ALL wiki links per row -> (row_idx int64, target, anchor).

    target is ``formatName``-canonicalized; anchor defaults to the target
    when the link has no ``|`` part (``WikiTextParser.parseLinks:158-166``).
    Rows without links contribute nothing (flat-map shape: 1 row in ->
    0..N rows out).
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    s = pd.Series(text.to_pandas(), dtype="object").fillna("")
    hits = s.str.extractall(ANCHOR_RE)
    if hits.empty:
        empty = pa.array([], pa.string())
        return np.zeros(0, np.int64), empty, empty
    row_idx = hits.index.get_level_values(0).to_numpy(dtype=np.int64)
    target = format_name(pa.array(hits[0].to_numpy(dtype=object),
                                  pa.string()))
    anchor_raw = hits[1].to_numpy(dtype=object)
    anchor = format_name(pa.array(
        np.where(pd.isna(anchor_raw), hits[0].to_numpy(dtype=object),
                 anchor_raw), pa.string()))
    return row_idx, target, anchor
