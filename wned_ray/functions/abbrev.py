"""Abbreviation definition mining (M13) + multi-key candidate lookup (J3).

Distills the reference's per-document abbreviation expansion
(``/root/reference/src/ca/ualberta/entitylinking/cs/MentionExpansion.java``)
to the transcript graft, where a "document" is one conversation and
token positions come from whitespace tokenization of turn texts (the
reference scans CoreNLP sentence tokens):

- pattern ``A (full form)``   — regex adjacency
  (``findAbbrevDefinitions``, ``MentionExpansion.java:986-1001``)
- pattern ``full form (A)``   — backward windowed scan with the
  reference's stopping rules: window ``min(|A|+5, |A|*2)`` tokens, stop
  at punctuation or after 3 stopwords, trim leading stopword /
  lowercase tokens, one candidate per uppercase-bearing start token
  (``findDefinitionBackward``, ``MentionExpansion.java:730-816``)
- document-wide forward scan  — every token sharing the abbreviation's
  first letter starts a window (stop at punctuation or after 1
  stopword), candidates end at each uppercase-bearing token
  (``findDefinitionForward`` / ``findDefinitionImpl``,
  ``MentionExpansion.java:825-952``)

Candidates are filtered by ``abbrev_sim > threshold`` (the reference's
``abbrevThreshold = 0.3``, ``MentionExpansion.java:48``) and the winner
is chosen by best abbrev similarity with a lexicographic tie-break
(``chooseByNameSimilarity`` analog; the Wikipedia-name chooser needs the
KB and is covered by the alias lookup downstream instead).

``multi_key_candidates`` is the J3 operator
(``CandidateSelectionLucene.selectCandidatesName:271-294``): the union
of per-key candidate maps with SUMMED weights — a mention that carries
both its own surface and a mined definition (or promoted form) probes
the alias dictionary with every key.
"""

from __future__ import annotations

import re

from wned_ray.functions.strsim import abbrev_sim, is_abbreviation
from wned_ray.functions.textnorm import STOPWORDS

ABBREV_THRESHOLD = 0.3          # MentionExpansion.java:48
_PUNCT_CHARS = set("()[]{}=!?")


def _is_punct_token(tok: str) -> bool:
    return any(c in _PUNCT_CHARS for c in tok) or not any(
        ch.isalnum() for ch in tok)


def _is_stopword(tok: str) -> bool:
    return tok.lower().strip(".,;:") in STOPWORDS


def _has_upper(tok: str) -> bool:
    return any(c.isupper() for c in tok)


def _max_window(abbrev: str) -> int:
    return min(len(abbrev) + 5, len(abbrev) * 2)


def find_definition_backward(abbrev: str, text: str, paren_pos: int
                             ) -> set[str]:
    """Candidates for pattern ``full form (A)``: scan backward from the
    ``(A)`` occurrence at ``paren_pos`` (char offset into ``text``)."""
    tokens = text[:paren_pos].split()
    if not tokens:
        return set()
    end = len(tokens)                       # exclusive
    max_win = _max_window(abbrev)
    n_stop = n_tok = 0
    start = end
    while start > 0:
        tok = tokens[start - 1]
        n_tok += 1
        if n_tok > max_win or _is_punct_token(tok):
            break
        if _is_stopword(tok):
            n_stop += 1
            if n_stop > 3:
                break
        start -= 1
    # trim unrelated leading tokens (stopwords / punctuation / lowercase)
    out: set[str] = set()
    for i in range(start, end):
        tok = tokens[i]
        if _is_punct_token(tok) or _is_stopword(tok) or not _has_upper(tok):
            continue
        cand = re.sub(r"\s+", " ", " ".join(tokens[i:end])).strip()
        if cand and abbrev not in cand:
            out.add(cand)
    return out


def _definition_impl(abbrev: str, tokens: list[str], begin: int) -> set[str]:
    """Forward window from ``tokens[begin]`` (findDefinitionImpl)."""
    max_win = _max_window(abbrev)
    n_stop = n_tok = 0
    end = begin
    while end < len(tokens):
        tok = tokens[end]
        n_tok += 1
        if n_tok > max_win or _is_punct_token(tok):
            break
        if _is_stopword(tok):
            n_stop += 1
            if n_stop > 1:
                break
        end += 1
    end -= 1
    # trim the end back to the last uppercase-bearing content token
    while end > begin and (_is_punct_token(tokens[end])
                           or _is_stopword(tokens[end])
                           or not _has_upper(tokens[end])):
        end -= 1
    if end <= begin:
        return set()
    out: set[str] = set()
    for i in range(begin + 1, end + 1):
        tok = tokens[i]
        if _is_punct_token(tok) or _is_stopword(tok) or not _has_upper(tok):
            continue
        cand = re.sub(r"\s+", " ", " ".join(tokens[begin:i + 1])).strip()
        if cand and abbrev not in cand:
            out.add(cand)
    return out


def find_definition_forward(abbrev: str, text: str) -> set[str]:
    """Document-wide scan: windows start at tokens sharing the
    abbreviation's first letter (findDefinitionForward)."""
    if not abbrev:
        return set()
    tokens = text.split()
    out: set[str] = set()
    for i, tok in enumerate(tokens):
        if _is_punct_token(tok) or _is_stopword(tok):
            continue
        if tok[:1] == abbrev[:1]:
            out |= _definition_impl(abbrev, tokens, i)
    return out


def _best(abbrev: str, cands: set[str],
          threshold: float = ABBREV_THRESHOLD) -> str | None:
    scored = [(abbrev_sim(abbrev, c), c) for c in cands]
    scored = [(s, c) for s, c in scored if s > threshold]
    if not scored:
        return None
    # highest similarity; lexicographic tie-break (deterministic under any
    # set iteration order — the reference iterates a HashSet)
    scored.sort(key=lambda x: (-x[0], x[1]))
    return scored[0][1]


def find_definition(abbrev: str, texts: list[str],
                    threshold: float = ABBREV_THRESHOLD) -> str | None:
    """Best full-form definition of ``abbrev`` in one conversation's turn
    texts, or None — the reference's priority order."""
    # 1. A (full form). The reference returns the FIRST above-threshold
    # match in document order; a map_groups row order is not stable, so we
    # collect every match and choose best-by-similarity instead — the
    # result is then independent of partitioning AND identical to the
    # fixture generator's iteration order.
    pat = re.compile(re.escape(abbrev) + r"\s*\((.*?)\)")
    cands1: set[str] = set()
    for text in texts:
        for m in pat.finditer(text):
            cand = m.group(1).strip()
            if cand:
                cands1.add(cand)
    best = _best(abbrev, cands1, threshold)
    if best is not None:
        return best
    # 2. full form (A) — backward scan from each occurrence
    pat2 = re.compile(r"\(\s*" + re.escape(abbrev) + r"\s*\)")
    cands: set[str] = set()
    for text in texts:
        for m in pat2.finditer(text):
            cands |= find_definition_backward(abbrev, text, m.start())
    best = _best(abbrev, cands, threshold)
    if best is not None:
        return best
    # 3. document-wide forward scan
    cands = set()
    for text in texts:
        cands |= find_definition_forward(abbrev, text)
    return _best(abbrev, cands, threshold)


def definition_map(mentions: list[str], texts: list[str],
                   threshold: float = ABBREV_THRESHOLD) -> dict[str, str]:
    """One conversation's raw mention surfaces + turn texts ->
    {abbreviation surface: mined full form}. Only abbreviation-shaped
    surfaces (M12 predicate) are mined; each distinct abbreviation is
    mined ONCE per conversation against the concatenated turn texts."""
    out: dict[str, str] = {}
    distinct = sorted({m for m in mentions if m and is_abbreviation(m)})
    for ab in distinct:
        d = find_definition(ab, texts, threshold)
        if d is not None:
            out[ab] = d
    return out


def multi_key_candidates(cand: dict[str, list[tuple[str, float]]],
                         keys) -> list[tuple[str, float]]:
    """J3: union of per-key candidate lists with summed weights
    (``CandidateSelectionLucene.selectCandidatesName:271-294``), ordered
    by (weight desc, entity asc) for a deterministic argmax."""
    acc: dict[str, float] = {}
    for key in keys:
        for ent, w in cand.get(key, ()):  # missing key contributes nothing
            acc[ent] = acc.get(ent, 0.0) + w
    return sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
