"""Sparse cosine / ZeroKL kernels vs hand-computed values (K5/K6)."""

import numpy as np
import pytest

from wned_ray.functions.vectorsim import (
    cosine_dense, sem_sim_from_kl, sparse_cosine, zero_kl_divergence)


def test_sparse_cosine_basic():
    t1, w1 = ["a", "b"], np.array([1.0, 2.0])
    t2, w2 = ["b", "c"], np.array([3.0, 4.0])
    # dot = 2*3 = 6; |v1| = sqrt(5), |v2| = 5
    assert sparse_cosine(t1, w1, t2, w2) == pytest.approx(6 / (np.sqrt(5) * 5))


def test_sparse_cosine_disjoint_and_empty():
    assert sparse_cosine(["a"], np.array([1.0]), ["b"], np.array([1.0])) == 0.0
    assert sparse_cosine([], np.array([]), ["b"], np.array([1.0])) == 0.0


def test_dense_cosine():
    v = np.array([1.0, 0.0, 1.0])
    w = np.array([1.0, 1.0, 0.0])
    assert cosine_dense(v, w) == pytest.approx(0.5)
    assert cosine_dense(v, np.zeros(3)) == 0.0
    assert cosine_dense(v, np.zeros(2)) == 0.0  # length mismatch => 0


def test_zero_kl_reference_semantics():
    # p zero entries skipped; q <= 1e-6 adds gamma*p; else p*log2(p/q)
    p = np.array([0.5, 0.5, 0.0])
    q = np.array([0.25, 0.0, 0.75])
    want = 0.5 * np.log2(0.5 / 0.25) + 0.5 * 10.0
    assert zero_kl_divergence(p, q) == pytest.approx(want)
    assert zero_kl_divergence(p, p) == pytest.approx(0.0)
    assert zero_kl_divergence(np.zeros(3), q) == 0.0
    assert zero_kl_divergence(p, np.zeros(2)) == 0.0  # length mismatch


def test_sem_sim_bounds():
    assert sem_sim_from_kl(0.0) == 1.0
    assert 0 < sem_sim_from_kl(100.0) < 0.01 + 1e-9


def test_sparse_cosine_batch_arrow_matches_object():
    """Arrow entry (zero-copy) and object-array entry agree exactly."""
    import numpy as np
    import pyarrow as pa

    from wned_ray.functions.vectorsim import sparse_cosine_batch

    a = ["check status update", "", "ledger orbit", "a a b", "x"]
    b = ["status check done", "x", "ledger orbit", "a b b", ""]
    obj = sparse_cosine_batch(np.asarray(a, object), np.asarray(b, object))
    arr = sparse_cosine_batch(pa.array(a), pa.array(b))
    chk = sparse_cosine_batch(
        pa.chunked_array([pa.array(a[:2]), pa.array(a[2:])]),
        pa.chunked_array([pa.array(b[:3]), pa.array(b[3:])]))
    assert np.allclose(obj, arr) and np.allclose(obj, chk)
