"""Feature fusion (K10) — the reference's seven rank schemes, vectorized.

``…/utils/Feature.java:40-164`` defines comparators; expressed as score
functions they are (alpha=priorWeight, beta=localWeight):

- SEMANTIC  : semSim
- PRIOR_SEM : prior * semSim
- LOCAL_SEM : local * semSim
- NOR       : 1 - (1-prior)(1-local)(1-semSim)
- LINEAR    : alpha*prior + beta*local + (1-alpha-beta)*semSim   (compareToJoint:142-152)
- MULTIPLY  : alpha*prior*semSim + (1-alpha)*local*semSim        (compareToJoint2:154-164)
- VOTE      : has no scalar score (2-of-3 pairwise majority); scored here as
  the mean of the three features' ranks-as-values, i.e. (prior+local+sem)/3,
  which preserves the majority ordering for the fused>threshold decision.

Config trap preserved: the reference's ``el.config`` says "MULTIPLY" but
``WNEDConfig.loadConfiguration:175-176`` only matches the misspelling
"MULTIPLE", so the shipped configuration silently runs LINEAR — our default
``PipelineConfig.rank_scheme`` is therefore LINEAR (see config.py).

The pairwise graft adds a fourth feature (name_sim, K9); the final score is
``(1-name_weight)*fuse3(prior, local, sem) + name_weight*name_sim``.
"""

from __future__ import annotations

import numpy as np


def fuse3(scheme: str, prior: np.ndarray, local: np.ndarray, sem: np.ndarray,
          prior_weight: float, local_weight: float) -> np.ndarray:
    a, b = prior_weight, local_weight
    if scheme == "SEMANTIC":
        return sem
    if scheme == "PRIOR_SEM":
        return prior * sem
    if scheme == "LOCAL_SEM":
        return local * sem
    if scheme == "NOR":
        return 1.0 - (1.0 - prior) * (1.0 - local) * (1.0 - sem)
    if scheme == "LINEAR":
        return a * prior + b * local + (1.0 - a - b) * sem
    if scheme == "MULTIPLY":
        return a * prior * sem + (1.0 - a) * local * sem
    if scheme == "VOTE":
        return (prior + local + sem) / 3.0
    raise ValueError(f"unknown rank scheme {scheme!r}")


def fuse(scheme: str, prior: np.ndarray, local: np.ndarray, sem: np.ndarray,
         name_sim: np.ndarray, prior_weight: float, local_weight: float,
         name_weight: float) -> np.ndarray:
    base = fuse3(scheme, prior, local, sem, prior_weight, local_weight)
    return (1.0 - name_weight) * base + name_weight * name_sim


def fit_weights(features: np.ndarray, is_match: np.ndarray):
    """Fit the LINEAR fusion weights from labeled pairs (the A5 learned-
    ranker tail — the reference trains a RankLib model offline and takes
    argmax at inference, ``…/disambiguation/L2RPredictor.java:43-62``;
    the pairwise graft's analog is a least-squares fit of the 4-feature
    score onto is_match, projected onto the fusion form's simplex).

    ``features``: [n, 4] columns (prior, local, sem, name_sim);
    ``is_match``: [n] bool/0-1. Returns (prior_weight, local_weight,
    name_weight, match_threshold) for ``PipelineConfig`` — the fused
    LINEAR score under these knobs equals the normalized fitted weights:
      score = (1-nw)*(a*prior + b*local + (1-a-b)*sem) + nw*name
    with nw=w_name, a=w_prior/(1-nw), b=w_local/(1-nw). The threshold is
    the F1-maximizing cut on the training pairs (vectorized sweep)."""
    X = np.column_stack([features.astype(np.float64),
                         np.ones(len(features))])
    y = is_match.astype(np.float64)
    w, *_ = np.linalg.lstsq(X, y, rcond=None)
    return _project_fusion_form(w[:4], features, is_match)


def _project_fusion_form(w4_raw: np.ndarray, features: np.ndarray,
                         is_match: np.ndarray):
    """Shared tail of both fitters: project raw 4-feature weights onto
    the fusion form's simplex (clip >= 0, normalize; degenerate => name
    only) and sweep the F1-maximizing threshold on the fused LINEAR
    score. Returns (a, b, nw, threshold)."""
    y = is_match.astype(np.float64)
    w4 = np.clip(w4_raw, 0.0, None)
    if w4.sum() <= 0:
        w4 = np.array([0.0, 0.0, 0.0, 1.0])
    w4 = w4 / w4.sum()
    nw = float(w4[3])
    rest = max(1.0 - nw, 1e-12)
    a, b = float(w4[0] / rest), float(w4[1] / rest)

    fused = fuse("LINEAR", features[:, 0], features[:, 1], features[:, 2],
                 features[:, 3], a, b, nw)
    order = np.argsort(-fused, kind="stable")
    ys = y[order]
    tp = np.cumsum(ys)
    fp = np.cumsum(1.0 - ys)
    pos = ys.sum()
    f1 = 2 * tp / np.maximum(2 * tp + fp + (pos - tp), 1e-12)
    best = int(np.argmax(f1))
    s_sorted = fused[order]
    hi = s_sorted[best]
    lo = s_sorted[best + 1] if best + 1 < len(s_sorted) else hi - 1e-6
    return a, b, nw, float((hi + lo) / 2.0)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30.0, 30.0)))


def fit_weights_pairwise(features: np.ndarray, is_match: np.ndarray,
                         iters: int = 400, lr: float = 0.5,
                         max_pairs: int = 200_000, seed: int = 7):
    """RankNet-style PAIRWISE logistic ranker — the honest
    ``L2RPredictor.java:43-62`` analog (the reference evals a RankLib
    learning-to-rank model over rank lists; a pairwise logistic loss is
    the canonical rank-learning objective, vs ``fit_weights``'s
    pointwise least squares). Minimizes mean log(1 + exp(-(w·x⁺ -
    w·x⁻))) over match/non-match feature DIFFERENCES by full-batch
    gradient descent (deterministic: fixed init, fixed iteration
    count, seeded subsample past ``max_pairs`` differences). The bias
    cancels in the difference, so only the 4 weights train; the fitted
    direction then takes the same fusion-form projection + F1
    threshold sweep as the pointwise fit.

    Returns (prior_weight, local_weight, name_weight, threshold)."""
    X = features.astype(np.float64)
    y = is_match.astype(bool)
    pos, neg = X[y], X[~y]
    if len(pos) == 0 or len(neg) == 0:
        return fit_weights(features, is_match)
    n_all = len(pos) * len(neg)
    if n_all <= max_pairs:
        ip = np.repeat(np.arange(len(pos)), len(neg))
        jn = np.tile(np.arange(len(neg)), len(pos))
    else:
        rng = np.random.default_rng(seed)
        ip = rng.integers(0, len(pos), size=max_pairs)
        jn = rng.integers(0, len(neg), size=max_pairs)
    D = pos[ip] - neg[jn]
    w = np.full(4, 0.25)
    for _ in range(iters):
        s = D @ w
        w -= lr * -(D * _sigmoid(-s)[:, None]).mean(axis=0)
    return _project_fusion_form(w, features, is_match)


def fit_config_pairwise(scores_df, labels_df, cfg):
    """``fit_config`` twin using the pairwise (RankNet-style) ranker."""
    from dataclasses import replace

    d = labels_df.merge(
        scores_df[["id_a", "id_b", "prior", "local", "sem_sim", "name_sim"]],
        on=["id_a", "id_b"], how="inner")
    if not len(d):
        raise ValueError("no labeled pairs intersect the scored pairs")
    feats = d[["prior", "local", "sem_sim", "name_sim"]].to_numpy()
    a, b, nw, thr = fit_weights_pairwise(feats, d["is_match"].to_numpy())
    return replace(cfg, rank_scheme="LINEAR", prior_weight=a,
                   local_weight=b, name_weight=nw, match_threshold=thr)


def fit_nil_model(features: np.ndarray, is_match: np.ndarray,
                  iters: int = 500, lr: float = 2.0):
    """Calibrated logistic classifier over the 4-feature vector — the
    model-based NIL decision (``…/disambiguation/NILPredictor.java:
    26-62`` trains a libsvm classifier on the same features to decide
    mention-maps-to-NO-entity; the pairwise recast's NIL decision is
    the per-pair matched flag, K12). Full-batch gradient descent,
    deterministic (zero weight init, bias at the base-rate logit).
    Returns a 5-tuple (w_prior, w_local, w_sem, w_name, bias) for
    ``PipelineConfig.nil_model``; prediction is match iff
    sigmoid(w·f + bias) >= 0.5, with ``match_threshold`` as the
    fallback whenever no model is configured."""
    X = features.astype(np.float64)
    y = is_match.astype(np.float64)
    n = len(y)
    if n == 0 or y.sum() == 0 or y.sum() == n:
        raise ValueError("nil model needs both classes in the labels")
    rate = y.mean()
    w = np.zeros(4)
    b = float(np.log(rate / (1.0 - rate)))
    for _ in range(iters):
        p = _sigmoid(X @ w + b)
        g = X.T @ (p - y) / n
        w -= lr * g
        b -= lr * float((p - y).mean())
    return (float(w[0]), float(w[1]), float(w[2]), float(w[3]), b)


def nil_predict(model, features: np.ndarray) -> np.ndarray:
    """Match probability under a ``fit_nil_model`` 5-tuple."""
    w = np.asarray(model[:4], np.float64)
    return _sigmoid(features.astype(np.float64) @ w + model[4])


def fit_config(scores_df, labels_df, cfg):
    """Join scored pairs to gold labels on the canonical (id_a, id_b)
    key and fit a LINEAR PipelineConfig (fit_weights docstring). Driver-
    side by design: the labels table is an evaluation fixture (small);
    pass pandas frames (``Dataset.to_pandas()`` of the scores intersect
    is caller's choice of sample)."""
    from dataclasses import replace

    d = labels_df.merge(
        scores_df[["id_a", "id_b", "prior", "local", "sem_sim", "name_sim"]],
        on=["id_a", "id_b"], how="inner")
    if not len(d):
        raise ValueError("no labeled pairs intersect the scored pairs")
    feats = d[["prior", "local", "sem_sim", "name_sim"]].to_numpy()
    a, b, nw, thr = fit_weights(feats, d["is_match"].to_numpy())
    return replace(cfg, rank_scheme="LINEAR", prior_weight=a,
                   local_weight=b, name_weight=nw, match_threshold=thr)


def normalize_columns(features: np.ndarray) -> np.ndarray:
    """Sum-normalize each feature column (SemanticSignatureEL.
    normalizeFeatures:725-744): each column is divided by its sum when > 0."""
    out = features.astype(np.float64).copy()
    sums = out.sum(axis=0)
    nz = sums > 0
    out[:, nz] /= sums[nz]
    return out
