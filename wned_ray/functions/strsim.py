"""String-similarity kernels (K9), vectorized over batches of pairs.

Reimplements (from the published formulas, matching the reference's
behavior in ``…/utils/similarity/StringSim.java:26-160``):

- Levenshtein edit distance + normalized score  (StringSim.java:32-85:
  ``1 - dist / max(len)``; empty-string quirk: if one side is empty the
  "score" is the *other side's length* — we keep the sane 0..1 contract
  instead and document the deviation here: empty vs non-empty => 0.0,
  empty vs empty => 1.0).
- Jaro and Jaro-Winkler (secondstring's standard formulation:
  matches within window floor(max/2)-1, transpositions/2, Winkler
  prefix boost p=0.1 up to 4 chars).
- Character n-gram similarity (Lucene NGramDistance-style, default n=2):
  1 - edit_distance_over_grams — here implemented as Dice over char
  bigram multisets, the standard public formulation.
- Longest common substring length (StringSim.java:136-160 returns the
  *raw length*, not normalized — kept identical).

The batch kernels take numpy object arrays of strings and run the DP
across the whole batch at once (python loop only over string *positions*,
numpy over the batch axis) — suitable for the scorer actor's hot path.
Scalar reference implementations (``*_scalar``) are the ground truth for
unit tests.
"""

from __future__ import annotations

import numpy as np

_MAXLEN = 64  # mention surface forms are short; longer strings are truncated


def _encode(strs: np.ndarray, maxlen: int = _MAXLEN) -> tuple[np.ndarray, np.ndarray]:
    """Encode an object array of strings to (codes[B, L] int32, lengths[B]).

    Code 0 is the padding sentinel (never a real char).
    """
    n = len(strs)
    lens = np.fromiter((min(len(s), maxlen) for s in strs), np.int32, n)
    L = max(1, int(lens.max()) if n else 1)
    codes = np.zeros((n, L), dtype=np.int32)
    for i, s in enumerate(strs):  # one pass to build the code matrix; the
        # per-char DP below is vectorized across the batch
        m = lens[i]
        if m:
            codes[i, :m] = np.frombuffer(s[:m].encode("utf-32-le"), np.uint32)[:m]
    return codes, lens


# ---------------------------------------------------------------- Levenshtein

def levenshtein_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Edit distances for aligned arrays of string pairs, vectorized."""
    ca, la = _encode(a)
    cb, lb = _encode(b)
    B = len(a)
    Lb = cb.shape[1]
    js = np.arange(1, Lb + 1)
    # dp row over b positions, per batch element
    dp = np.broadcast_to(np.arange(Lb + 1), (B, Lb + 1)).astype(np.int32).copy()
    # mask positions beyond each string's length so they never win the min
    big = np.int32(1 << 20)
    for i in range(ca.shape[1]):
        active = la > i                      # rows still consuming chars of a
        if not active.any():
            break
        prev = dp.copy()
        cost = (ca[:, i : i + 1] != cb) & (cb != 0)  # substitution cost per j
        sub = prev[:, :-1] + cost
        ins = prev[:, 1:] + 1
        m = np.minimum(sub, ins)
        # resolve the deletion chain: new[j] = min_k<=j (m[k] + (j-k))
        t = m - js
        np.minimum.accumulate(t, axis=1, out=t)
        new = np.minimum(m, t + js).astype(np.int32)
        dp[:, 1:] = np.where(active[:, None], new, prev[:, 1:])
        dp[:, 0] = np.where(active, i + 1, dp[:, 0])
        # keep padded-j cells harmless (they are read but we only output at lb)
        dp[:, 1:] = np.where((cb == 0), np.minimum(dp[:, 1:], big), dp[:, 1:])
    return dp[np.arange(B), lb]


def levenshtein_sim_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Normalized Levenshtein similarity 1 - d/max(len); both empty => 1."""
    d = levenshtein_batch(a, b).astype(np.float64)
    la = np.fromiter((len(s) for s in a), np.float64, len(a))
    lb = np.fromiter((len(s) for s in b), np.float64, len(b))
    mx = np.maximum(la, lb)
    out = np.where(mx > 0, 1.0 - d / np.maximum(mx, 1.0), 1.0)
    return out


def levenshtein_scalar(s1: str, s2: str) -> int:
    n, m = len(s1), len(s2)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if s1[i - 1] == s2[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[m]


# --------------------------------------------------------------- Jaro-Winkler

def jaro_winkler_batch(a: np.ndarray, b: np.ndarray,
                       p: float = 0.1, max_prefix: int = 4) -> np.ndarray:
    """Jaro-Winkler similarity for aligned arrays of string pairs."""
    ca, la = _encode(a)
    cb, lb = _encode(b)
    B, La = ca.shape
    Lb = cb.shape[1]
    if B == 0:
        return np.zeros(0)
    # match window: floor(max(la, lb)/2) - 1, at least 0
    win = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    matched_b = np.zeros((B, Lb), dtype=bool)
    match_idx_a = np.full((B, La), -1, dtype=np.int32)  # pos in b matched to a_i
    jpos = np.arange(Lb)
    for i in range(La):
        ai = ca[:, i : i + 1]
        lo = (i - win)[:, None]
        hi = (i + win)[:, None]
        cand = (cb == ai) & (ai != 0) & (cb != 0) & (~matched_b) \
            & (jpos >= lo) & (jpos <= hi)
        has = cand.any(axis=1)
        first = np.argmax(cand, axis=1)
        rows = np.nonzero(has)[0]
        matched_b[rows, first[rows]] = True
        match_idx_a[rows, i] = first[rows]
    valid = match_idx_a >= 0
    m = valid.sum(axis=1).astype(np.float64)
    # transpositions: compare a's matched chars (in a-order) with b's matched
    # chars (in b-order); count mismatched positions / 2 — fully vectorized
    # by compacting matched positions to the front of each row via sort
    BIG = np.int32(1 << 20)
    a_pos = np.where(valid, np.arange(La, dtype=np.int32), BIG)
    a_pos.sort(axis=1)
    b_pos = np.where(valid, match_idx_a, BIG)
    b_pos.sort(axis=1)
    a_chars = np.take_along_axis(ca, np.minimum(a_pos, La - 1), axis=1)
    b_chars = np.take_along_axis(cb, np.minimum(b_pos[:, :La], Lb - 1), axis=1)
    in_front = np.arange(La) < valid.sum(axis=1)[:, None]
    trans = ((a_chars != b_chars) & in_front).sum(axis=1) / 2.0
    la_f = np.maximum(la.astype(np.float64), 1.0)
    lb_f = np.maximum(lb.astype(np.float64), 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = np.where(
            m > 0,
            (m / la_f + m / lb_f + (m - trans) / np.maximum(m, 1.0)) / 3.0,
            0.0,
        )
    both_empty = (la == 0) & (lb == 0)
    jaro = np.where(both_empty, 1.0, jaro)
    # Winkler prefix boost
    pref = np.zeros(B, dtype=np.int32)
    live = np.ones(B, dtype=bool)
    for i in range(min(max_prefix, La, Lb)):
        same = live & (ca[:, i] == cb[:, i]) & (ca[:, i] != 0)
        pref += same
        live &= same
    return jaro + pref * p * (1.0 - jaro)


def jaro_scalar(s1: str, s2: str) -> float:
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    win = max(max(len(s1), len(s2)) // 2 - 1, 0)
    matched2 = [False] * len(s2)
    m1, m2idx = [], []
    for i, c in enumerate(s1):
        lo, hi = max(0, i - win), min(len(s2) - 1, i + win)
        for j in range(lo, hi + 1):
            if not matched2[j] and s2[j] == c:
                matched2[j] = True
                m1.append(c)
                m2idx.append(j)
                break
    if not m1:
        return 0.0
    m2 = [s2[j] for j in sorted(m2idx)]
    t = sum(x != y for x, y in zip(m1, m2)) / 2.0
    m = len(m1)
    return (m / len(s1) + m / len(s2) + (m - t) / m) / 3.0


def jaro_winkler_scalar(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4) -> float:
    j = jaro_scalar(s1, s2)
    pref = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        pref += 1
    return j + pref * p * (1 - j)


# ------------------------------------------------------------ char n-gram sim

def ngram_sim_batch(a: np.ndarray, b: np.ndarray, n: int = 2) -> np.ndarray:
    """Dice similarity over char n-gram multisets (NGramDistance analog)."""
    out = np.zeros(len(a))
    for i in range(len(a)):  # gram-set construction is string-level; kept
        # simple — the scorer's primary fuzzy kernel is the hashed-bigram
        # matmul in stages/scoring.py, this is the exact small-batch variant
        out[i] = ngram_sim_scalar(a[i], b[i], n)
    return out


def _grams(s: str, n: int) -> dict[str, int]:
    g: dict[str, int] = {}
    for i in range(len(s) - n + 1):
        k = s[i : i + n]
        g[k] = g.get(k, 0) + 1
    return g


def ngram_sim_scalar(s1: str, s2: str, n: int = 2) -> float:
    if len(s1) < n or len(s2) < n:
        return 1.0 if s1 == s2 else 0.0
    g1, g2 = _grams(s1, n), _grams(s2, n)
    inter = sum(min(c, g2.get(k, 0)) for k, c in g1.items())
    tot = sum(g1.values()) + sum(g2.values())
    return 2.0 * inter / tot if tot else 0.0


def monge_elkan_scalar(s: str, t: str, inner=jaro_winkler_scalar) -> float:
    """Monge-Elkan token-level similarity (``StringSim.monge_elkan_score``,
    ``…/utils/similarity/StringSim.java:105-109``): mean over s's tokens of
    the best inner similarity against t's tokens. The reference delegates
    to secondstring's MongeElkan (scaled Smith-Waterman inner); we use
    Jaro-Winkler as the inner kernel (public formulation, Monge & Elkan
    1996) — same contract: asymmetric, 0..1, 1.0 on identical token bags."""
    ws = s.split()
    wt = t.split()
    if not ws or not wt:
        return 1.0 if not ws and not wt else 0.0
    return sum(max(inner(a, b) for b in wt) for a in ws) / len(ws)


def monge_elkan_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Monge-Elkan over aligned arrays. Token-level rerank kernel
    — surfaces are short (<=8 tokens), so the per-pair loop is bounded;
    the batch-axis-vectorized JW kernel does the heavy lifting by scoring
    all (token_a, token_b) cross pairs of the batch in ONE call."""
    n = len(a)
    out = np.zeros(n)
    if n == 0:
        return out
    # explode every pair's token cross product into one flat JW batch
    flat_a: list[str] = []
    flat_b: list[str] = []
    slices: list[tuple[int, int, int]] = []  # (start, n_ws, n_wt) per pair
    for i in range(n):
        ws, wt = a[i].split(), b[i].split()
        slices.append((len(flat_a), len(ws), len(wt)))
        for x in ws:
            for y in wt:
                flat_a.append(x)
                flat_b.append(y)
    if not flat_a:
        return np.array([1.0 if not a[i].split() and not b[i].split() else 0.0
                         for i in range(n)])
    sims = jaro_winkler_batch(np.asarray(flat_a, object),
                              np.asarray(flat_b, object))
    for i, (start, nws, nwt) in enumerate(slices):
        if nws == 0 or nwt == 0:
            out[i] = 1.0 if nws == nwt else 0.0
            continue
        block = sims[start:start + nws * nwt].reshape(nws, nwt)
        out[i] = block.max(axis=1).mean()
    return out


def soft_tfidf_scalar(s: str, t: str, theta: float = 0.8,
                      idf: dict[str, float] | None = None,
                      inner=jaro_winkler_scalar) -> float:
    """SoftTFIDF (Cohen-Ravikumar-Fienberg 2003; ``StringSim.
    soft_tfidf_score``, ``…/utils/similarity/StringSim.java:111-115``,
    theta=0.8): cosine over token TF-IDF weight vectors where a token of s
    "soft-matches" its best inner-similarity token of t when that
    similarity >= theta, contributing weight_s * weight_t * sim.

    ``idf`` maps token -> idf; missing/None tokens weigh 1.0 (uniform —
    the corpus-free variant secondstring falls back to when untrained)."""
    ws, wt = s.split(), t.split()
    if not ws or not wt:
        return 1.0 if not ws and not wt else 0.0

    def weights(tokens: list[str]) -> dict[str, float]:
        w: dict[str, float] = {}
        for tok in tokens:
            w[tok] = w.get(tok, 0.0) + ((idf or {}).get(tok, 1.0))
        norm = float(np.sqrt(sum(v * v for v in w.values())))
        return {k: v / norm for k, v in w.items()} if norm else w

    va, vb = weights(ws), weights(wt)
    score = 0.0
    for tok_a, wa in va.items():
        best_sim, best_tok = 0.0, None
        for tok_b in vb:
            sim = inner(tok_a, tok_b)
            if sim > best_sim:
                best_sim, best_tok = sim, tok_b
        if best_tok is not None and best_sim >= theta:
            score += wa * vb[best_tok] * best_sim
    return min(score, 1.0)


def soft_tfidf_batch(a: np.ndarray, b: np.ndarray, theta: float = 0.8,
                     idf: "dict[str, float] | None" = None) -> np.ndarray:
    """Batch SoftTFIDF over aligned string arrays — exact semantics of
    ``soft_tfidf_scalar`` (unique-token weight vectors, best inner-JW
    match per s-token, theta gate), with ALL cross-token Jaro-Winkler
    computed in ONE flattened ``jaro_winkler_batch`` call (the same
    flatten-then-slice shape as ``monge_elkan_batch``)."""
    n = len(a)
    out = np.zeros(n)
    flat_a: list[str] = []
    flat_b: list[str] = []
    metas: list[tuple[int, list, np.ndarray, list, np.ndarray]] = []
    for i in range(n):
        ws, wt = a[i].split(), b[i].split()
        if not ws or not wt:
            out[i] = 1.0 if not ws and not wt else 0.0
            metas.append((len(flat_a), [], np.zeros(0), [], np.zeros(0)))
            continue

        def weights(tokens):
            w: dict[str, float] = {}
            for tok in tokens:
                w[tok] = w.get(tok, 0.0) + ((idf or {}).get(tok, 1.0))
            keys = list(w)
            vals = np.array([w[k] for k in keys])
            norm = float(np.sqrt((vals * vals).sum()))
            return keys, (vals / norm if norm else vals)

        ka, va = weights(ws)
        kb, vb = weights(wt)
        metas.append((len(flat_a), ka, va, kb, vb))
        for x in ka:
            for y in kb:
                flat_a.append(x)
                flat_b.append(y)
    if flat_a:
        sims = jaro_winkler_batch(np.asarray(flat_a, object),
                                  np.asarray(flat_b, object))
    for i, (start, ka, va, kb, vb) in enumerate(metas):
        if not ka:
            continue
        block = sims[start:start + len(ka) * len(kb)].reshape(len(ka),
                                                              len(kb))
        best = block.argmax(axis=1)
        best_sim = block[np.arange(len(ka)), best]
        ok = best_sim >= theta
        out[i] = min(float((va[ok] * vb[best[ok]] * best_sim[ok]).sum()),
                     1.0)
    return out


def lcs_length_scalar(s: str, t: str) -> int:
    """Longest common substring *length* (StringSim.lcs_distance:136-160 —
    the reference returns the raw length, unnormalized)."""
    if not s or not t:
        return 0
    prev = [0] * (len(t) + 1)
    best = 0
    for i in range(1, len(s) + 1):
        cur = [0] * (len(t) + 1)
        for j in range(1, len(t) + 1):
            if s[i - 1] == t[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


# ----------------------------------------------------- abbreviations (M12-M14)

_ABBREV_MIN, _ABBREV_MAX = 2, 10


def is_abbreviation(token: str) -> bool:
    """Abbreviation predicate of ``…/cs/MentionExpansion.java:126-158``:
    a single word, 2-10 chars, with at least 2 uppercase letters."""
    if " " in token:
        return False
    if not (_ABBREV_MIN <= len(token) <= _ABBREV_MAX):
        return False
    return sum(1 for c in token if c.isupper()) >= 2


def extract_abbrev(full_name: str) -> str:
    """Initials of a multi-word name (``MentionExpansion.extractAbbrev``,
    ``…/cs/MentionExpansion.java:1128-1140``): first letter of every
    whitespace-separated word, uppercased."""
    return "".join(w[0].upper() for w in full_name.split() if w)


def abbrev_sim(abbrev: str, full_name: str) -> float:
    """Letter-sorted edit-distance similarity with a length penalty
    (``MentionExpansion.abbrevSimImpl/abbrevSim``,
    ``…/cs/MentionExpansion.java:1142-1183``): compare the candidate
    abbreviation against the name's initials, both letter-sorted and
    uppercased (order-insensitive), normalized by the longer length and
    scaled by the shorter/longer length ratio so dropped words penalize."""
    a = "".join(sorted(abbrev.replace(".", "").upper()))
    b = "".join(sorted(extract_abbrev(full_name)))
    if not a or not b:
        return 0.0
    d = levenshtein_scalar(a, b)
    longer = max(len(a), len(b))
    return (1.0 - d / longer) * (min(len(a), len(b)) / longer)
