"""Fellegi–Sunter EM: parameter recovery on a generative model with
known (lambda, m, u), weight-ordering sanity, and the distributed
pattern-count path vs the driver kernel."""

from __future__ import annotations

import numpy as np
import pandas as pd

from wned_ray.functions.fellegi import (em_fit, patterns_from_features)


def _simulate(lam, m, u, n, seed=0):
    rng = np.random.default_rng(seed)
    is_m = rng.uniform(size=n) < lam
    probs = np.where(is_m[:, None], m[None, :], u[None, :])
    bits = (rng.uniform(size=(n, len(m))) < probs).astype(np.int64)
    pat = bits @ (1 << np.arange(len(m), dtype=np.int64))
    return pat, is_m


def test_em_recovers_known_parameters():
    lam, m, u = 0.3, np.array([0.95, 0.8, 0.9]), np.array([0.05, 0.2, 0.1])
    pat, _ = _simulate(lam, m, u, 200_000, seed=7)
    counts = np.bincount(pat, minlength=8)
    fit = em_fit(counts, 3)
    assert abs(fit["lambda"] - lam) < 0.02
    assert np.allclose(fit["m"], m, atol=0.02)
    assert np.allclose(fit["u"], u, atol=0.02)
    # all-agree pattern outweighs all-disagree by construction
    w = fit["pattern_weights"]
    assert w[7] > 0 > w[0]
    assert fit["pattern_posteriors"][7] > 0.99
    assert fit["pattern_posteriors"][0] < 0.01


def test_em_classification_matches_bayes():
    # posterior-0.5 classification must agree with the true Bayes rule
    # under the fitted parameters on every pattern
    lam, m, u = 0.4, np.array([0.9, 0.85]), np.array([0.1, 0.15])
    pat, is_m = _simulate(lam, m, u, 100_000, seed=3)
    fit = em_fit(np.bincount(pat, minlength=4), 2)
    pred = fit["pattern_posteriors"][pat] >= 0.5
    # generative overlap bounds accuracy; fitted-Bayes should be close
    # to the optimum — well above majority-class guessing
    acc = (pred == is_m).mean()
    assert acc > 0.85


def test_patterns_from_features_bits():
    feat = np.array([[0.9, 0.1], [0.1, 0.9], [0.9, 0.9], [0.1, 0.1]])
    pat = patterns_from_features(feat, np.array([0.5, 0.5]))
    assert pat.tolist() == [1, 2, 3, 0]


def test_fs_em_fit_distributed_matches_kernel(ray_session):
    import ray.data as rd

    from wned_ray.stages.scoring import fs_classify, fs_em_fit

    rng = np.random.default_rng(9)
    n = 5000
    is_m = rng.uniform(size=n) < 0.35
    df = pd.DataFrame({
        "id_a": np.arange(n, dtype=np.int64),
        "id_b": np.arange(n, dtype=np.int64) + n,
        # continuous features whose mean-threshold binarization recovers
        # the planted mixture
        "prior": np.where(is_m, rng.uniform(0.6, 1.0, n),
                          rng.uniform(0.0, 0.4, n)),
        "local": np.where(is_m, rng.uniform(0.4, 1.0, n),
                          rng.uniform(0.0, 0.6, n)),
        "sem_sim": np.where(is_m, rng.uniform(0.7, 1.0, n),
                            rng.uniform(0.0, 0.3, n)),
        "name_sim": np.where(is_m, rng.uniform(0.8, 1.0, n),
                             rng.uniform(0.0, 0.5, n)),
    })
    ds = rd.from_pandas(df).repartition(4)
    fit = fs_em_fit(ds)
    # driver twin: same thresholds, same counts, same EM
    thr = np.array([fit["thresholds"][c]
                    for c in ("prior", "local", "sem_sim", "name_sim")])
    pat = patterns_from_features(
        df[["prior", "local", "sem_sim", "name_sim"]].to_numpy(), thr)
    ref = em_fit(np.bincount(pat, minlength=16), 4)
    assert np.array_equal(fit["pattern_counts"],
                          np.bincount(pat, minlength=16))
    assert abs(fit["lambda"] - ref["lambda"]) < 1e-12
    assert np.allclose(fit["m"], ref["m"]) and np.allclose(fit["u"],
                                                           ref["u"])
    # classification recovers the planted classes on separable features
    cls = fs_classify(ds, fit).to_pandas().sort_values("id_a")
    assert (cls["fs_matched"].to_numpy() == is_m).mean() > 0.97
