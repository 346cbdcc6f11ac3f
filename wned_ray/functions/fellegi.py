"""Fellegi–Sunter probabilistic record linkage with unsupervised EM.

The canonical probabilistic ER model (Fellegi & Sunter, JASA 1969;
the naive-conditional-independence EM fit due to Winkler 1988): each
candidate pair yields a binary agreement pattern γ over F comparison
features; matches and non-matches are a two-class mixture with
per-feature agreement probabilities m_f = P(agree_f | M) and
u_f = P(agree_f | U); the match weight of a pattern is
log2 P(γ|M)/P(γ|U). EM fits (λ, m, u) WITHOUT labels.

Scale shape — the whole reason FS fits a 100 TB engine: with binary
features the sufficient statistics are the 2^F PATTERN COUNTS, so the
distributed work is one per-batch bincount combiner plus a 2^F-row
groupby; EM then iterates on the driver over that tiny table. No pair
ever revisits the cluster during fitting.

The complement to ``fusion.fit_config`` (supervised least squares):
FS-EM needs NO labels, which is the regime a new 100 TB corpus is
actually in.
"""

from __future__ import annotations

import numpy as np

# EM floor: keeps m/u off the 0/1 boundary where a pattern's likelihood
# ratio degenerates (standard practice; Winkler's EMH does the same)
_EPS = 1e-6


def patterns_from_features(feat: np.ndarray, thresholds: np.ndarray
                           ) -> np.ndarray:
    """Binarize an (n, F) float feature matrix into pattern ids in
    [0, 2^F): bit f set iff feat[:, f] >= thresholds[f]."""
    bits = (feat >= thresholds[None, :]).astype(np.int64)
    weights = 1 << np.arange(feat.shape[1], dtype=np.int64)
    return bits @ weights


def em_fit(counts: np.ndarray, n_features: int, n_iter: int = 100,
           tol: float = 1e-10) -> dict:
    """EM over the 2^F pattern-count vector.

    Initialization pins the label assignment (m0 = 0.9 > u0 = 0.1 per
    feature, λ0 = 0.5) so the "match" class cannot label-switch.
    Returns λ, m, u, per-pattern match weights (log2 likelihood ratio)
    and posteriors."""
    n_pat = 1 << n_features
    if counts.shape != (n_pat,):
        raise ValueError(f"counts must have shape ({n_pat},)")
    n = counts.sum()
    if n == 0:
        raise ValueError("no pairs to fit")
    g_bits = ((np.arange(n_pat)[:, None] >> np.arange(n_features)[None, :])
              & 1).astype(np.float64)                      # (2^F, F)
    lam = 0.5
    m = np.full(n_features, 0.9)
    u = np.full(n_features, 0.1)
    prev = -np.inf
    for _ in range(n_iter):
        # E-step over patterns (log domain)
        log_pm = (g_bits @ np.log(m) + (1 - g_bits) @ np.log1p(-m))
        log_pu = (g_bits @ np.log(u) + (1 - g_bits) @ np.log1p(-u))
        a = np.log(lam) + log_pm
        b = np.log1p(-lam) + log_pu
        hi = np.maximum(a, b)
        log_z = hi + np.log(np.exp(a - hi) + np.exp(b - hi))
        w = np.exp(a - log_z)                              # P(M | γ)
        ll = float(counts @ log_z)
        # M-step from pattern counts
        nm = counts @ w
        lam = min(max(nm / n, _EPS), 1 - _EPS)
        m = np.clip((counts * w) @ g_bits / max(nm, _EPS), _EPS, 1 - _EPS)
        u = np.clip((counts * (1 - w)) @ g_bits / max(n - nm, _EPS),
                    _EPS, 1 - _EPS)
        if ll - prev < tol and ll >= prev:
            break
        prev = ll
    log_pm = (g_bits @ np.log(m) + (1 - g_bits) @ np.log1p(-m))
    log_pu = (g_bits @ np.log(u) + (1 - g_bits) @ np.log1p(-u))
    weights = (log_pm - log_pu) / np.log(2.0)              # FS match weight
    a = np.log(lam) + log_pm
    b = np.log1p(-lam) + log_pu
    hi = np.maximum(a, b)
    post = np.exp(a - (hi + np.log(np.exp(a - hi) + np.exp(b - hi))))
    return {"lambda": float(lam), "m": m, "u": u,
            "pattern_weights": weights, "pattern_posteriors": post,
            "log_likelihood": float(prev)}
