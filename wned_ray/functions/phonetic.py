"""Phonetic encodings + phonetic blocking — the classic record-linkage
blocking family (Christen, "Data Matching", 2012, ch. 4.3: Soundex is
the canonical phonetic blocking key; reference-adjacent to the fuzzy
alias tier in ``AliasLuceneIndex.java`` which re-ranks lexically).

Everything here is VECTORIZED over numpy byte matrices — no per-string
Python in the encode path — and shuffle-free until the final per-key
pair emit (one hash shuffle on the phonetic key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# American Soundex digit classes; vowels + h/w are 0 (h/w additionally
# do not separate equal codes — handled below per the NARA spec)
_SOUNDEX_DIGIT = np.zeros(26, np.uint8)
for _chars, _d in (("bfpv", 1), ("cgjkqsxz", 2), ("dt", 3), ("l", 4),
                   ("mn", 5), ("r", 6)):
    for _c in _chars:
        _SOUNDEX_DIGIT[ord(_c) - 97] = _d
_HW = np.zeros(26, bool)
_HW[ord("h") - 97] = _HW[ord("w") - 97] = True


def soundex(names: "pd.Series | pa.Array") -> pd.Series:
    """American Soundex (NARA variant) of the FIRST token of each name,
    fully vectorized: one fixed-width byte matrix, table-lookup digit
    classes, h/w-transparent adjacent-duplicate suppression.

    Returns 4-char codes like ``R163``; empty/non-alpha input -> ``""``.
    """
    if isinstance(names, (pa.Array, pa.ChunkedArray)):
        names = names.to_pandas()
    s = (names.astype(str).str.lower()
         .str.extract(r"([a-z]+)", expand=False).fillna(""))
    maxlen = max(int(s.str.len().max() or 0), 1)
    # byte matrix (n, maxlen): one NUL-padded concat, one frombuffer —
    # no per-string Python
    buf = s.str.ljust(maxlen, "\x00").str.cat().encode("latin1")
    arr = np.frombuffer(buf, np.uint8).reshape(len(s), maxlen)
    alpha = arr >= 97
    idx = np.where(alpha, arr - 97, 0)
    digit = np.where(alpha, _SOUNDEX_DIGIT[idx], 0).astype(np.int8)
    is_hw = alpha & _HW[idx]
    # previous meaningful digit for duplicate suppression: h/w are
    # transparent (codes equal ACROSS h/w collapse), vowels reset
    prev = np.zeros(len(s), np.int8)
    out_digits = np.zeros((len(s), maxlen), np.int8)
    keep = np.zeros((len(s), maxlen), bool)
    for j in range(maxlen):
        d = digit[:, j]
        col_alpha = alpha[:, j]
        dup = d == prev
        k = col_alpha & (d > 0) & ~dup
        keep[:, j] = k
        out_digits[:, j] = d
        # update prev: consonant -> its digit; vowel (d==0, not h/w)
        # -> 0 (reset); h/w -> unchanged (transparent)
        vowel = col_alpha & (d == 0) & ~is_hw[:, j]
        prev = np.where(col_alpha & (d > 0), d,
                        np.where(vowel, 0, prev)).astype(np.int8)
    # first letter always kept as a letter, its digit never emitted
    keep[:, 0] = False
    # first 3 kept digits per row, vectorized: rank kept positions with
    # a row cumsum, select rank 1/2/3 (missing ranks give 0 == the '0'
    # padding the spec wants)
    order = np.cumsum(keep, axis=1)
    def _rank_digit(r):
        sel = keep & (order == r)
        return (out_digits * sel).sum(axis=1)
    d1, d2, d3 = _rank_digit(1), _rank_digit(2), _rank_digit(3)
    first_ok = alpha[:, 0]
    head = pd.Series((arr[:, 0] - 32).view(np.uint8), dtype="uint8"
                     ).map(chr).to_numpy()
    codes = np.where(
        first_ok,
        pd.Series(head).str.cat([
            pd.Series(d1).astype(str), pd.Series(d2).astype(str),
            pd.Series(d3).astype(str)]).to_numpy(),
        "")
    return pd.Series(codes, index=names.index, dtype=str)


def phonetic_key_pairs(ds, id_col: str, name_col: str,
                       max_block: int = 2048):
    """Phonetic blocking: soundex key per row, ONE hash shuffle on the
    key, star edges (min-id -> others) per block — the spanning
    structure the main blocking tier also emits (connectivity, not the
    quadratic set). Blocks above ``max_block`` rows are dropped as hot
    keys (same bounded-skew contract as ``hot_block_keys``).

    Output: (id_a, id_b) with id_a < id_b."""
    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col],
            "_pkey": soundex(df[name_col]),
        })

    keyed = (ds.select_columns([id_col, name_col])
             .map_batches(add_key, batch_format="pandas")
             .filter(expr="_pkey != ''"))

    def star(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > max_block:
            return pd.DataFrame({"id_a": pd.Series([], dtype=str),
                                 "id_b": pd.Series([], dtype=str)})
        ids = np.sort(g[id_col].astype(str).to_numpy())
        return pd.DataFrame({"id_a": np.repeat(ids[0], len(ids) - 1),
                             "id_b": ids[1:]})

    return keyed.groupby("_pkey").map_groups(star, batch_format="pandas")
