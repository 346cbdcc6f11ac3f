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


def test_milne_witten_modes_vs_naive():
    """All ten link-set modes (milne_witten_mode) vs a naive dict
    reimplementation of RelatednessMeasureWebGraph.java:83-353,
    including the quirks: a==b => 1.0, direct_count => 0.0,
    undirect_link_count => raw edge weight, common==0 => 0."""
    import math

    from wned_ray.state.graph import (CSRGraph, DirectedCSR, MW_MODES,
                                      milne_witten_mode)

    src = ["x", "y", "a", "b", "c", "e", "e", "a"]
    dst = ["a", "a", "c", "c", "a", "a", "b", "d"]
    w = [2.0, 1.0, 2.0, 3.0, 1.0, 4.0, 1.0, 2.0]
    und = CSRGraph.from_edges(src, dst, w)
    dg = DirectedCSR.from_edges(src, dst, w)
    n2i = {s: i for i, s in enumerate(dg.names)}
    N = dg.num_nodes
    assert N == und.num_nodes

    ins: dict[int, dict[int, float]] = {i: {} for i in range(N)}
    outs: dict[int, dict[int, float]] = {i: {} for i in range(N)}
    for s, d, ww in zip(src, dst, w):
        outs[n2i[s]][n2i[d]] = outs[n2i[s]].get(n2i[d], 0) + ww
        ins[n2i[d]][n2i[s]] = ins[n2i[d]].get(n2i[s], 0) + ww
    und_nbrs: dict[int, dict[int, float]] = {i: {} for i in range(N)}
    for s, d, ww in zip(src, dst, w):
        a, b = n2i[s], n2i[d]
        if a == b:
            continue
        for u, v in ((a, b), (b, a)):
            und_nbrs[u][v] = max(und_nbrs[u].get(v, 0.0), ww)

    def clip(sr):
        return 0.0 if (sr < 0.0 or sr >= 1.0) else 1.0 - sr

    def binary(s1, s2):
        if not s1 or not s2:
            return 0.0
        common = len(s1 & s2)
        if common == 0:
            return 0.0
        return clip((math.log(max(len(s1), len(s2))) - math.log(common))
                    / (math.log(N) - math.log(min(len(s1), len(s2)))))

    def counted(m1, m2):
        if not m1 or not m2:
            return 0.0
        n1, n2_ = sum(m1.values()), sum(m2.values())
        common = sum(min(m1[k], m2[k]) for k in m1 if k in m2)
        if common == 0 or n1 == 0 or n2_ == 0:
            return 0.0
        return clip((math.log(max(n1, n2_)) - math.log(common))
                    / (math.log(N) - math.log(min(n1, n2_))))

    def naive(mode, a, b):
        if a == b:
            return 1.0
        if mode == "in":
            return binary(set(ins[a]), set(ins[b]))
        if mode == "out":
            return binary(set(outs[a]), set(outs[b]))
        if mode == "in_count":
            return counted(ins[a], ins[b])
        if mode == "out_count":
            return counted(outs[a], outs[b])
        if mode == "both":
            return binary(set(ins[a]) | set(outs[a]),
                          set(ins[b]) | set(outs[b]))
        if mode == "both_count":
            def merge(i):
                m = dict(ins[i])
                for k, v in outs[i].items():
                    m[k] = m.get(k, 0) + v
                return m
            return counted(merge(a), merge(b))
        if mode == "direct_count":
            return 0.0
        if mode == "undirect_link_count":
            return und_nbrs[a].get(b, 0.0)
        if mode == "undirect":
            return binary(set(und_nbrs[a]), set(und_nbrs[b]))
        if mode == "undirect_count":
            return counted(und_nbrs[a], und_nbrs[b])
        raise AssertionError(mode)

    checked_nonzero = 0
    for mode in sorted(MW_MODES):
        for a in range(N):
            for b in range(N):
                got = milne_witten_mode(mode, a, b,
                                        undirected=und, directed=dg)
                want = naive(mode, a, b)
                assert got == pytest.approx(want), (mode, a, b)
                if a != b and want > 0:
                    checked_nonzero += 1
    assert checked_nonzero >= 10   # fixture exercises non-trivial values
    # the raw-weight quirk actually returns a weight, not a similarity
    assert milne_witten_mode("undirect_link_count", n2i["e"], n2i["a"],
                             undirected=und) == 4.0


def test_ppr_gauss_seidel_matches_power_iteration():
    """The Gauss-Seidel unit-weight solver (K3 second solver) must agree
    with the converged power-iteration kernel on the same unit-weight
    graph, and reach a tolerance in no MORE sweeps than Jacobi needs
    iterations (the in-place update propagates within a sweep)."""
    from wned_ray.state.graph import ppr, ppr_gauss_seidel

    g = toy_graph()
    ones = np.ones_like(g.weights)
    for seed in range(g.num_nodes):
        r = np.zeros(g.num_nodes)
        r[seed] = 1.0
        want = ppr(g.indptr, g.indices, ones, r,
                   alpha=0.85, max_iter=200, tol=1e-12)
        got = ppr_gauss_seidel(g.indptr, g.indices, r,
                               alpha=0.85, max_iter=200, tol=1e-12)
        assert np.allclose(got, want, atol=1e-6), seed
        assert got.sum() == pytest.approx(1.0, abs=1e-6)


def test_ppr_gauss_seidel_dangling_and_zero_restart():
    from wned_ray.state.graph import ppr_gauss_seidel

    # node 2 dangling (no out-edges in the directed interpretation):
    # a chain 0 -> 1 -> 2
    indptr = np.array([0, 1, 2, 2])
    indices = np.array([1, 2])
    r = np.zeros(3)
    r[0] = 1.0
    x = ppr_gauss_seidel(indptr, indices, r, max_iter=100, tol=1e-12)
    assert x.sum() == pytest.approx(1.0, abs=1e-9)
    assert x[0] > x[1] > x[2] > 0
    # zero restart falls back to uniform, no NaNs
    x2 = ppr_gauss_seidel(indptr, indices, np.zeros(3))
    assert np.isfinite(x2).all()
