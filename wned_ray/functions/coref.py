"""Person-coref substring promotion (M8).

The reference promotes a short mention to a longer co-occurring mention's
name when the short name is a char-level substring of the long one
(``/root/reference/src/ca/ualberta/entitylinking/utils/ELUtils.java:178-208``:
``name2.contains(name1) && name1.length() < name2.length()``, gated on
PERSON type). The graft applies the same containment rule to normalized
surface forms WITHIN ONE conversation (the document analog); there is no
NER type here, so the gate is a minimum length instead.

Deviations from the reference, documented: (a) the reference takes the
FIRST containing mention in list order (order-dependent); we take the
longest containing norm with a lexicographic tie-break, deterministic
under any partitioning; (b) containment must start at a token boundary
("varquo" may promote to "varquo sotanor" but not to "gulvarquo fenarvo"
— the reference's PERSON-type gate filters such collisions, we have no
NER types). The same function drives both the pipeline stage
(stages/normalize.promote_mentions) and the labels fixture (synth.py), so
the evaluated pair universes stay aligned.
"""

from __future__ import annotations

MIN_SHORT_LEN = 3      # no single/double-char promotions ("s" is in everything)


def _contains(long: str, short: str) -> bool:
    """Char-level containment starting at a token boundary."""
    return long.startswith(short) or (" " + short) in long


def promotion_map(norms) -> dict[str, str]:
    """Distinct normalized surfaces of one conversation -> {short: full}.

    A norm maps to the longest distinct co-occurring norm that contains it
    (char-level, like the reference); chains resolve by one extra pass
    ("vq" -> "vq sot" -> "vq sotanor" lands on the longest directly since
    containment is transitive over substrings of the same winner).
    """
    uniq = sorted({n for n in norms if n and len(n) >= MIN_SHORT_LEN})
    # longest-first, then lexicographic: the first container found wins
    by_len = sorted(uniq, key=lambda s: (-len(s), s))
    out: dict[str, str] = {}
    for n in uniq:
        for m in by_len:
            if len(m) <= len(n):
                break                      # only longer norms can contain n
            if _contains(m, n):
                out[n] = m
                break
    # collapse chains: a -> b while b -> c becomes a -> c
    for k in list(out):
        seen = {k}
        v = out[k]
        while v in out and out[v] not in seen:
            seen.add(v)
            v = out[v]
        out[k] = v
    return out


def apply_promotion(norms: list[str]) -> list[str]:
    m = promotion_map(norms)
    return [m.get(n, n) for n in norms]


def _initial_compatible(short: str, long: str) -> bool:
    """OrthoMatcher-style initials rule (M7): every token of the short
    form matches the positional token of the long form either exactly or
    as a dotted/bare single-letter initial ("v." / "v" vs "varquo"), with
    at least one full-token anchor in common ("v. sotanor" ~ "varquo
    sotanor", but "v. s." matches nothing — all-initials carries no
    anchor). Token counts must agree (the word-subset case is the
    containment rule's job)."""
    ts, tl = short.split(), long.split()
    if len(ts) != len(tl) or not ts:
        return False
    anchor = False
    for a, b in zip(ts, tl):
        if a == b:
            anchor = True
            continue
        bare = a[:-1] if a.endswith(".") else a
        if len(bare) == 1 and b.startswith(bare):
            continue
        return False
    return anchor


def variant_clusters(norms) -> dict[str, str]:
    """Per-document orthographic variant clustering (M7, the GATE
    OrthoMatcher recast — ``…/common/nlp/OrthoMatcherCoref.java:45-329``
    wraps ``gate.creole.orthomatcher.OrthoMatcher``; the rules below are
    the public ANNIE orthographic rules this graft needs: exact match,
    word-subset/containment, and first/middle-name initials).

    Distinct norms of one conversation -> {norm: representative}, where
    the representative is the cluster's longest member (lexicographic
    tie-break — deterministic under any partitioning). Conservative on
    ambiguity: a short form compatible with MORE than one longer norm is
    left alone (the reference resolves by document order, which is not
    stable under re-partitioning)."""
    out = promotion_map(norms)          # containment edges (M8 rule)
    uniq = sorted({n for n in norms if n and len(n) >= MIN_SHORT_LEN})
    resolved = sorted({out.get(n, n) for n in uniq})
    for n in uniq:
        if n in out:
            continue
        cands = [m for m in resolved
                 if len(m) > len(n) and _initial_compatible(n, m)]
        if len(cands) == 1:             # unique → safe to promote
            out[n] = cands[0]
    return out


def promote_norms(raw_mentions: list[str], texts: list[str],
                  norms: list[str], coref: bool = True,
                  abbrev: bool = True) -> list[str]:
    """Full per-conversation norm rewrite: M13 abbreviation-definition
    expansion first (an abbreviation-shaped surface whose full form is
    mined from the conversation text inherits the full form's norm),
    then the M8 substring promotion. One pure function drives BOTH the
    pipeline stage (stages/normalize.promote_mentions) and the labels
    fixture (synth.py) so the evaluated pair universes stay aligned."""
    out = list(norms)
    if abbrev:
        import pyarrow as pa

        from wned_ray.functions.abbrev import definition_map
        from wned_ray.functions.textnorm import normalize_names

        dmap = definition_map(raw_mentions, texts)
        if dmap:
            norm_of = {ab: normalize_names(pa.array([d]))[0].as_py()
                       for ab, d in dmap.items()}
            out = [norm_of.get(r, n) for r, n in zip(raw_mentions, out)]
    if coref:
        m = variant_clusters(out)
        out = [m.get(n, n) for n in out]
    return out
