"""CSR graph + PPR vs dense-matrix reference; Milne-Witten vs formula (K1-K7)."""

import numpy as np
import pytest

from wned_ray.state.graph import CSRGraph, SignatureKernel, milne_witten, ppr


def toy_graph():
    # 6-node toy in the shape of GraphUtils.main (reference smoke driver)
    src = ["a", "a", "b", "b", "c", "d", "e"]
    dst = ["b", "c", "c", "d", "d", "e", "f"]
    w = [1.0, 2.0, 1.0, 1.0, 3.0, 1.0, 1.0]
    return CSRGraph.from_edges(src, dst, w)


def test_csr_build_symmetric():
    g = toy_graph()
    assert g.num_nodes == 6
    a, b = g.name2id["a"], g.name2id["b"]
    assert b in g.neighbors(a).tolist()
    assert a in g.neighbors(b).tolist()
    # duplicate-pair max-weight symmetrization
    g2 = CSRGraph.from_edges(["x", "y"], ["y", "x"], [1.0, 5.0])
    x = g2.name2id["x"]
    lo, hi = g2.indptr[x], g2.indptr[x + 1]
    assert g2.weights[lo:hi].tolist() == [5.0]


def dense_ppr(A, restart, alpha=0.85, max_iter=3, tol=1e-5):
    n = A.shape[0]
    r = restart / restart.sum()
    row = A.sum(axis=1)
    P = np.divide(A, row[:, None], out=np.zeros_like(A), where=row[:, None] > 0)
    dangling = row == 0
    rank = r.copy()
    for _ in range(max_iter):
        new = alpha * (P.T @ rank + rank[dangling].sum() * r) + (1 - alpha) * r
        if np.abs(new - rank).sum() <= tol:
            rank = new
            break
        rank = new
    return rank


def test_ppr_matches_dense_power_iteration():
    g = toy_graph()
    n = g.num_nodes
    A = np.zeros((n, n))
    for u in range(n):
        lo, hi = g.indptr[u], g.indptr[u + 1]
        A[u, g.indices[lo:hi]] = g.weights[lo:hi]
    for seed in range(n):
        restart = np.zeros(n)
        restart[seed] = 1.0
        got = ppr(g.indptr, g.indices, g.weights, restart)
        want = dense_ppr(A, restart)
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_ppr_uniform_restart_on_zero_vector():
    g = toy_graph()
    got = ppr(g.indptr, g.indices, g.weights, np.zeros(g.num_nodes))
    assert got.sum() == pytest.approx(1.0, abs=1e-9)


def test_milne_witten_formula():
    g = toy_graph()
    a, b = g.name2id["a"], g.name2id["b"]
    na, nb = set(g.neighbors(a).tolist()), set(g.neighbors(b).tolist())
    common = len(na & nb)
    n = g.num_nodes
    want = 1 - (np.log(max(len(na), len(nb))) - np.log(common)) / (
        np.log(n) - np.log(min(len(na), len(nb))))
    assert milne_witten(g, a, b) == pytest.approx(max(0.0, min(1.0, want)))
    # no common neighbors => 0 (the common==0 quirk)
    e, f = g.name2id["e"], g.name2id["a"]
    assert milne_witten(g, e, f) == 0.0


def test_signature_kernel_relatedness():
    g = toy_graph()
    k = SignatureKernel(g)
    a, b, f = g.name2id["a"], g.name2id["b"], g.name2id["f"]
    assert k.relatedness(a, a) == 1.0
    rab = k.relatedness(a, b)
    raf = k.relatedness(a, f)
    assert 0 < raf < rab <= 1.0       # close nodes more related than far ones
    assert k.relatedness(b, a) == rab  # symmetric via canonical cache key


def test_subgraph_expansion_hub_fallback():
    g = toy_graph()
    seeds = np.array([g.name2id["a"]])
    # threshold higher than any degree -> fallback keeps all neighbors
    nodes = g.subgraph_nodes(seeds, hub_threshold=100)
    assert set(nodes.tolist()) >= {g.name2id["a"], g.name2id["b"], g.name2id["c"]}
    indptr, indices, weights, ids = g.induced_csr(nodes)
    assert len(indptr) == len(nodes) + 1
    assert (indices < len(nodes)).all()
