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


def normalize_columns(features: np.ndarray) -> np.ndarray:
    """Sum-normalize each feature column (SemanticSignatureEL.
    normalizeFeatures:725-744): each column is divided by its sum when > 0."""
    out = features.astype(np.float64).copy()
    sums = out.sum(axis=0)
    nz = sums > 0
    out[:, nz] /= sums[nz]
    return out
