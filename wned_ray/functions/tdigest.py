"""Merging t-digest (Dunning & Ertl, "Computing extremely accurate
quantiles using t-digests", 2019) — the mergeable quantile sketch: the
bounded-state shape for per-key quantiles when one key's value history
is too large to sort on a worker (the regime where the exact
``datawork.group_quantiles`` shuffle-and-sort stops fitting).

Clustering variant, fully vectorized: sorted values are assigned to
centroids by flooring the k1 scale function k(q) = δ/(2π)·asin(2q−1)
at each point's mid-rank — the scale function concentrates centroids at
the tails, giving the t-digest's signature q(1−q) relative rank-error
profile. Merging two digests = concatenate centroids, re-sort, re-bucket
— associative and, because centroids are sorted by (mean, weight) before
bucketing, DETERMINISTIC in the merge order, so a distributed groupby
merge yields run-identical estimates regardless of block arrival order.

State per digest is O(δ): ≤ δ/2+1 (mean, weight) float64 pairs plus
exact min/max (kept so extreme quantiles interpolate to true extrema).
"""

from __future__ import annotations

import numpy as np


class TDigest:
    __slots__ = ("delta", "means", "weights", "vmin", "vmax")

    def __init__(self, delta: int = 200):
        self.delta = int(delta)
        self.means = np.empty(0, np.float64)
        self.weights = np.empty(0, np.float64)
        self.vmin = np.inf
        self.vmax = -np.inf

    # -- construction ---------------------------------------------------
    def add_values(self, vals: np.ndarray) -> "TDigest":
        vals = np.asarray(vals, np.float64)
        vals = vals[~np.isnan(vals)]
        if len(vals) == 0:
            return self
        self.vmin = min(self.vmin, float(vals.min()))
        self.vmax = max(self.vmax, float(vals.max()))
        self._absorb(np.concatenate([self.means, vals]),
                     np.concatenate([self.weights,
                                     np.ones(len(vals), np.float64)]))
        return self

    @classmethod
    def merge_all(cls, digests: list["TDigest"]) -> "TDigest":
        """One-shot merge: concatenate EVERY input's centroids, then a
        single re-cluster — deterministic in input order (the absorb
        sort canonicalizes) and strictly more accurate than a pairwise
        chain, since intermediate clusterings never compound."""
        live = [d for d in digests if len(d.means)]
        out = cls(digests[0].delta if digests else 200)
        if not live:
            return out
        out.vmin = min(d.vmin for d in live)
        out.vmax = max(d.vmax for d in live)
        out._absorb(np.concatenate([d.means for d in live]),
                    np.concatenate([d.weights for d in live]))
        return out

    def merge(self, other: "TDigest") -> "TDigest":
        if len(other.means) == 0:
            return self
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._absorb(np.concatenate([self.means, other.means]),
                     np.concatenate([self.weights, other.weights]))
        return self

    def _absorb(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Re-cluster (means, weights) into ≤ δ/2+1 centroids: one sort,
        one k1-scale bucket assignment at mid-rank, one grouped weighted
        mean — no per-centroid Python loop."""
        # lexicographic (mean, weight) sort => merge-order determinism
        order = np.lexsort((weights, means))
        means, weights = means[order], weights[order]
        total = weights.sum()
        cum = np.cumsum(weights)
        q_mid = (cum - weights / 2.0) / total
        k = np.floor(self.delta / (2.0 * np.pi)
                     * np.arcsin(np.clip(2.0 * q_mid - 1.0, -1.0, 1.0)))
        # grouped weighted mean per bucket via reduceat on boundaries
        bounds = np.flatnonzero(np.diff(k)) + 1
        starts = np.concatenate([[0], bounds])
        w = np.add.reduceat(weights, starts)
        m = np.add.reduceat(means * weights, starts) / w
        self.means, self.weights = m, w

    # -- queries ----------------------------------------------------------
    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        w = self.weights
        total = w.sum()
        # centroid mid-ranks; clamp interpolation to the true extrema
        cum = np.cumsum(w) - w / 2.0
        x = np.concatenate([[0.0], cum, [total]])
        y = np.concatenate([[self.vmin], self.means, [self.vmax]])
        return float(np.interp(q * total, x, y))

    # -- serialization (shuffle payload) ----------------------------------
    def to_bytes(self) -> bytes:
        head = np.array([self.delta, len(self.means)], np.int64).tobytes()
        mm = np.array([self.vmin, self.vmax], np.float64).tobytes()
        return head + mm + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        delta, n = np.frombuffer(blob[:16], np.int64)
        d = cls(int(delta))
        d.vmin, d.vmax = np.frombuffer(blob[16:32], np.float64)
        d.means = np.frombuffer(blob[32:32 + 8 * n], np.float64).copy()
        d.weights = np.frombuffer(blob[32 + 8 * n:32 + 16 * n],
                                  np.float64).copy()
        return d
