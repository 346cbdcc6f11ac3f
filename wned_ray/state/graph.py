"""Entity relatedness graph: CSR storage + personalized PageRank (K1-K8).

The reference stores the whole-KB graph as a compressed WebGraph
(``…/graph/DirectedGraph.java:47-134``, ``…/graph/WeightedGraph.java:31-106``)
and runs a 32-thread pool of one-hot personalized PageRanks
(``…/graph/algorithms/WeightedPersonalizedPageRank.java:211-266``) with
alpha=0.85, L1 delta <= 1e-5, max 3 iterations
(``…/graph/algorithms/PersonalizedPageRank.java:27-29``).

Here the graph is a scipy-free CSR built from a Parquet edge table
(``src, dst, weight``) and held once per scorer actor (loaded in
``__init__`` — the actor-pool analog of the reference's singleton). PPR is
a dense power iteration over the CSR (row-normalized transition matrix),
restricted to a hub-thresholded subgraph around the seed set when the
graph is large (K1: ``SubGraphGenerator.java:29-188``, in-degree cutoff
200/600).

Scale note (100 TB / 10^12 turns): the *entity* graph is a dimension-side
artifact (millions of nodes, not trillions); a per-worker CSR of int32
indptr/indices + float32 weights at 10M edges is ~120 MB — broadcast once
via ``ray.put`` and read zero-copy in every actor, never re-shipped per
batch. Signatures are computed per *subgraph* (bounded by the hub cutoff)
so the dense vectors stay small regardless of total graph size.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from wned_ray.functions.vectorsim import sem_sim_from_kl, zero_kl_divergence


class CSRGraph:
    """Undirected weighted graph in CSR form with string node names.

    Mirrors WeightedGraph's (graph, name2id, id2name) triple
    (``…/graph/WeightedGraph.java:35-37``); symmetrization takes the max
    weight per unordered pair like SubGraphGenerator.java:194-229.
    """

    def __init__(self, indptr: np.ndarray, indices: np.ndarray,
                 weights: np.ndarray, names: np.ndarray):
        self.indptr = indptr
        self.indices = indices
        self.weights = weights
        self.names = names                      # id -> name
        self._name2id: dict | None = None       # built on first access

    @property
    def name2id(self) -> dict:
        """Lazy name -> id dict: an actor wired from prebuilt CSR arrays
        (scoring.build_scorer_state) never touches string lookups, so the
        vocabulary-sized dict build is skipped there entirely."""
        if self._name2id is None:
            self._name2id = {n: i for i, n in enumerate(self.names.tolist())}
        return self._name2id

    @property
    def num_nodes(self) -> int:
        return len(self.indptr) - 1

    @classmethod
    def from_edges(cls, src: "list[str] | np.ndarray", dst, weight) -> "CSRGraph":
        """Build a symmetrized CSR from parallel edge arrays.

        Node ids are assigned in first-seen order over src then dst (the
        reference assigns ids in read order, DirectedGraph.java:73-84).
        """
        import pandas as pd

        src = np.asarray(src, dtype=object)
        dst = np.asarray(dst, dtype=object)
        weight = np.asarray(weight, dtype=np.float64)
        # factorize assigns codes in first-seen order over src then dst —
        # identical ids to the reference's read-order assignment, without
        # the per-edge Python loop
        codes, uniques = pd.factorize(np.concatenate([src, dst]))
        names = np.asarray(uniques, dtype=object)
        n = len(names)
        s = codes[: len(src)].astype(np.int64)
        d = codes[len(src):].astype(np.int64)
        # symmetrize with max-weight per unordered pair (K1 :194-229)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        key = lo * n + hi
        order = np.argsort(key, kind="stable")
        key_s, w_s = key[order], weight[order]
        uniq, first = np.unique(key_s, return_index=True)
        wmax = np.maximum.reduceat(w_s, first) if len(w_s) else w_s
        lo_u = (uniq // n).astype(np.int64)
        hi_u = (uniq % n).astype(np.int64)
        keep = lo_u != hi_u                    # drop self loops
        lo_u, hi_u, wmax = lo_u[keep], hi_u[keep], wmax[keep]
        # build CSR over both directions
        rows = np.concatenate([lo_u, hi_u])
        cols = np.concatenate([hi_u, lo_u])
        ws = np.concatenate([wmax, wmax])
        order = np.argsort(rows, kind="stable")
        rows, cols, ws = rows[order], cols[order], ws[order]
        indptr = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(rows, minlength=n), out=indptr[1:])
        return cls(indptr, cols.astype(np.int32), ws.astype(np.float32),
                   np.asarray(names, dtype=object))

    @classmethod
    def from_parquet(cls, path: str) -> "CSRGraph":
        t = pq.read_table(path, columns=["src", "dst", "weight"])
        return cls.from_edges(t["src"].to_pylist(), t["dst"].to_pylist(),
                              t["weight"].to_numpy(zero_copy_only=False))

    # ---------------------------------------------------------------- queries

    def neighbors(self, node: int) -> np.ndarray:
        return self.indices[self.indptr[node]: self.indptr[node + 1]]

    def degree(self, node: int) -> int:
        return int(self.indptr[node + 1] - self.indptr[node])

    def degrees(self) -> np.ndarray:
        return np.diff(self.indptr)

    # --------------------------------------------------- subgraph / signature

    def subgraph_nodes(self, seeds: np.ndarray, hub_threshold: int = 200,
                       expand_level: int = 1) -> np.ndarray:
        """K1 expansion: seeds + neighbors, keeping expansion nodes whose
        degree >= hub_threshold — unless that would leave a seed isolated,
        in which case all its neighbors are kept
        (SubGraphGenerator.java:105-188, fallback :149-151)."""
        keep = set(seeds.tolist())
        degs = self.degrees()
        for _ in range(expand_level):
            new: set[int] = set()
            for s in list(keep):
                nb = self.neighbors(s)
                hubs = nb[degs[nb] >= hub_threshold]
                picked = hubs if len(hubs) else nb   # fallback: keep all
                new.update(picked.tolist())
            keep |= new
        return np.fromiter(sorted(keep), np.int64, len(keep))

    def induced_csr(self, nodes: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Induced subgraph as (indptr, indices, weights, node_ids) with
        local ids 0..len(nodes)-1 (SubGraphGenerator.java:105-120).

        Vectorized (round-3): one flat gather of every member's adjacency
        range + one mask, instead of a Python loop per subgraph node —
        this sits on the large-graph scorer's per-pair path (K1), where
        the reference's own subgraph extraction is the hot step."""
        n_sub = len(nodes)
        remap = np.full(self.num_nodes, -1, np.int64)
        remap[nodes] = np.arange(n_sub)
        lo = self.indptr[nodes]
        lens = self.indptr[nodes + 1] - lo
        total = int(lens.sum())
        if total == 0:
            return (np.zeros(n_sub + 1, np.int64), np.zeros(0, np.int64),
                    np.zeros(0, np.float32), nodes)
        ends = np.cumsum(lens)
        flat = np.repeat(lo, lens) + (np.arange(total, dtype=np.int64)
                                      - np.repeat(ends - lens, lens))
        rows = np.repeat(np.arange(n_sub, dtype=np.int64), lens)
        cols = remap[self.indices[flat]]
        m = cols >= 0
        rows, cols = rows[m], cols[m]
        wts = self.weights[flat][m]
        indptr = np.zeros(n_sub + 1, np.int64)
        np.cumsum(np.bincount(rows, minlength=n_sub), out=indptr[1:])
        return indptr, cols, wts, nodes


def ppr(indptr: np.ndarray, indices: np.ndarray, weights: np.ndarray,
        restart: np.ndarray, alpha: float = 0.85, max_iter: int = 3,
        tol: float = 1e-5) -> np.ndarray:
    """Personalized PageRank by power iteration (K2).

    ``rank = alpha * P^T rank + (1-alpha) * restart`` with row-normalized
    transition weights; strongly-preferential restart (dangling mass goes to
    the restart vector, matching WeightedPageRank's stronglyPreferential
    default). Stops at L1 delta <= tol or max_iter iterations — the
    reference's exact budget (alpha=0.85, tol=1e-5, max_iter=3).
    """
    n = len(indptr) - 1
    r = restart.astype(np.float64)
    tot = r.sum()
    r = r / tot if tot > 0 else np.full(n, 1.0 / max(n, 1))
    rank = r.copy()
    # row sums for normalization
    row_sums = np.zeros(n)
    np.add.at(row_sums, np.repeat(np.arange(n), np.diff(indptr)), weights.astype(np.float64))
    rows = np.repeat(np.arange(n), np.diff(indptr))
    norm_w = weights.astype(np.float64) / np.maximum(row_sums[rows], 1e-300)
    dangling = row_sums == 0
    for _ in range(max_iter):
        spread = np.zeros(n)
        contrib = rank[rows] * norm_w
        np.add.at(spread, indices, contrib)
        dangling_mass = rank[dangling].sum()
        new = alpha * (spread + dangling_mass * r) + (1 - alpha) * r
        delta = float(np.abs(new - rank).sum())
        rank = new
        if delta <= tol:
            break
    return rank


# Dense-mode cutoff: at or below this node count the kernel keeps full-
# graph signatures memoized PER ENTITY (cross-pair amortization); above
# it every relatedness call runs a per-PAIR joint-subgraph PPR with no
# shared state. Callers deciding serial-vs-pooled execution key off this
# (serial only pays when the cache amortizes).
SMALL_GRAPH_LIMIT = 50_000


def ppr_gauss_seidel(indptr: np.ndarray, indices: np.ndarray,
                     restart: np.ndarray, alpha: float = 0.85,
                     max_iter: int = 20, tol: float = 1e-5) -> np.ndarray:
    """Strongly-preferential PPR by GAUSS-SEIDEL sweeps with UNIT edge
    weights — the reference's second solver (K3,
    ``…/graph/algorithms/UnweightedPersonalizedPageRank.java:42-92``
    wraps LAW's PageRankParallelGaussSeidel with
    ``stronglyPreferential = true``, 20 sweeps, L1-norm stop): solves
    ``x_i = (1-α)v_i + α(Σ_{j→i} x_j/outdeg_j + d·v_i)`` updating x
    IN PLACE so later nodes in a sweep see already-updated ranks —
    fewer sweeps than the Jacobi/power form at equal tolerance, at
    the price of a per-node loop. Sized for per-document SUBGRAPHS
    (the hub-cutoff-bounded supports every signature runs on, K1),
    where n is hundreds — the power-iteration kernel (``ppr``)
    remains the vectorized default. Deterministic: fixed node order,
    dangling mass refreshed per sweep."""
    n = len(indptr) - 1
    s = restart.sum()
    v = (restart / s) if s > 0 else np.full(n, 1.0 / max(n, 1))
    outdeg = np.diff(indptr).astype(np.float64)
    # transpose to in-CSR: for node i, the sources j with j -> i
    src = np.repeat(np.arange(n), np.diff(indptr))
    order = np.argsort(indices, kind="stable")
    tin_src = src[order]
    tin_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(indices, minlength=n), out=tin_ptr[1:])
    inv_out = np.divide(1.0, outdeg, out=np.zeros(n), where=outdeg > 0)
    dangling = outdeg == 0
    x = v.copy()
    for _ in range(max_iter):
        dm = float(x[dangling].sum())
        delta = 0.0
        for i in range(n):
            srcs = tin_src[tin_ptr[i]: tin_ptr[i + 1]]
            xi = ((1.0 - alpha) * v[i]
                  + alpha * (float(np.dot(x[srcs], inv_out[srcs]))
                             + dm * v[i]))
            delta += abs(xi - x[i])
            x[i] = xi
        if delta <= tol:
            break
    return x


class SignatureKernel:
    """Per-actor semantic-signature cache (K2/K4/K5 fused).

    ``relatedness(name_a, name_b)`` returns the bounded inverse ZeroKL of
    the two entities' PPR signatures over the (sub)graph spanned by both
    seed sets — the pairwise recast of
    ``semSim = 1/ZeroKLDivergence(candSig, docSig)``
    (``SemanticSignatureEL.java:800-811``). Signatures are memoized per
    entity id, the analog of the per-document WeightCache
    (``SemanticSignatureEL.java:376-464``) amortized across batches.
    """

    def __init__(self, graph: CSRGraph, alpha: float = 0.85, max_iter: int = 3,
                 tol: float = 1e-5, gamma: float = 10.0, eps: float = 1e-6,
                 hub_threshold: int = 200,
                 small_graph_limit: int = SMALL_GRAPH_LIMIT,
                 rel_mode: str = "ppr",
                 directed: "DirectedCSR | None" = None):
        self.g = graph
        self.alpha, self.max_iter, self.tol = alpha, max_iter, tol
        self.gamma, self.eps = gamma, eps
        self.hub_threshold = hub_threshold
        # K7 surface: "ppr" = ZeroKL over PPR signatures (default), else
        # one of the ten Milne-Witten link-set modes (milne_witten_mode)
        self.rel_mode = rel_mode
        self.directed = directed
        if rel_mode != "ppr" and rel_mode not in MW_MODES:
            raise ValueError(f"unknown rel_mode {rel_mode!r}")
        self._cache: dict[int, np.ndarray] = {}
        # small graphs: dense full-graph signatures, memoized per entity.
        # Large graphs: per-PAIR joint-subgraph signatures (K1 discipline —
        # the reference also never runs PPR on the whole KB; it extracts a
        # hub-thresholded subgraph first, SubGraphGenerator.java:105-188).
        # A dense cache at 1e5+ nodes would cost nodes^2 floats.
        self._global = graph.num_nodes <= small_graph_limit
        self._rel_cache: dict[tuple[int, int], float] = {}
        if self._global:
            # graph-static PPR normalization, computed ONCE (recomputing
            # rows/row-sums per call made each signature O(edges) slower)
            n = graph.num_nodes
            rows = np.repeat(np.arange(n), np.diff(graph.indptr))
            row_sums = np.zeros(n)
            np.add.at(row_sums, rows, graph.weights.astype(np.float64))
            self._rows = rows
            self._norm_w = (graph.weights.astype(np.float64)
                            / np.maximum(row_sums[rows], 1e-300))
            self._dangling = row_sums == 0

    def _ppr_restart(self, r: np.ndarray) -> np.ndarray:
        """Power iteration from an arbitrary (already normalized) restart
        vector, using the precomputed global normalization arrays."""
        rank = r.copy()
        for _ in range(self.max_iter):
            spread = np.zeros(len(r))
            np.add.at(spread, self.g.indices, rank[self._rows] * self._norm_w)
            dangling_mass = rank[self._dangling].sum()
            new = self.alpha * (spread + dangling_mass * r) + (1 - self.alpha) * r
            delta = float(np.abs(new - rank).sum())
            rank = new
            if delta <= self.tol:
                break
        return rank

    def _ppr_global(self, node: int) -> np.ndarray:
        r = np.zeros(self.g.num_nodes)
        r[node] = 1.0
        return self._ppr_restart(r)

    def doc_signature(self, seed_weights: "dict[int, float]",
                      avoid: "set[int] | None" = None) -> "np.ndarray | None":
        """K4 document signature (``…/utils/ELUtils.java:59-94`` +
        ``SemanticSignatureEL.java:683-697``): ONE PPR whose restart vector
        is the accumulated seed weights MINUS the avoid set (the queried
        mention's own candidates — without the exclusion a mention's own
        candidate mass self-reinforces, SURVEY §7 hard-part 2).

        Returns None when no seed mass survives the exclusion or on the
        large-graph (subgraph) path, where callers fall back to pairwise
        seed relatedness."""
        if not self._global or not seed_weights:
            return None
        r = np.zeros(self.g.num_nodes)
        for node, w in seed_weights.items():
            if avoid and node in avoid:
                continue
            r[node] += w
        tot = r.sum()
        if tot <= 0:
            return None
        return self._ppr_restart(r / tot)

    def sem_to_doc(self, node: int, doc_sig: np.ndarray) -> float:
        """semSim = bounded inverse ZeroKL(candidate signature, doc
        signature) (K5, ``SemanticSignatureEL.java:806``)."""
        kl = zero_kl_divergence(self.signature(node), doc_sig,
                                self.gamma, self.eps)
        return float(sem_sim_from_kl(kl))

    def signature(self, node: int) -> np.ndarray:
        sig = self._cache.get(node)
        if sig is None:
            sig = self._ppr_global(node)
            self._cache[node] = sig
        return sig

    def _relatedness_subgraph(self, a: int, b: int) -> float:
        """Joint-subgraph signatures for large graphs: expand around both
        seeds with the hub threshold (K1), run both 1-hot PPRs on the
        induced CSR (small dense vectors on a shared support), ZeroKL."""
        nodes = self.g.subgraph_nodes(np.array([a, b], np.int64),
                                      self.hub_threshold)
        indptr, indices, weights, node_ids = self.g.induced_csr(nodes)
        pos = {int(x): i for i, x in enumerate(node_ids)}
        ra = np.zeros(len(nodes))
        rb = np.zeros(len(nodes))
        ra[pos[a]] = 1.0
        rb[pos[b]] = 1.0
        sa = ppr(indptr, indices, weights, ra, self.alpha, self.max_iter,
                 self.tol)
        sb = ppr(indptr, indices, weights, rb, self.alpha, self.max_iter,
                 self.tol)
        kl = zero_kl_divergence(sa, sb, self.gamma, self.eps)
        return float(sem_sim_from_kl(kl))

    def relatedness(self, a: int, b: int) -> float:
        if a == b:
            return 1.0
        key = (a, b) if a < b else (b, a)
        v = self._rel_cache.get(key)
        if v is None:
            if self.rel_mode != "ppr":
                v = milne_witten_mode(self.rel_mode, key[0], key[1],
                                      undirected=self.g,
                                      directed=self.directed)
            elif self._global:
                kl = zero_kl_divergence(self.signature(key[0]),
                                        self.signature(key[1]),
                                        self.gamma, self.eps)
                v = float(sem_sim_from_kl(kl))
            else:
                v = self._relatedness_subgraph(key[0], key[1])
            self._rel_cache[key] = v
        return v


class DirectedCSR:
    """Directed counted graph: out-CSR + in-CSR over ONE id space — the
    analog of the reference's DirectedGraph in/outLinks(2) accessors
    (``…/graph/DirectedGraph.java``), needed by the directed
    Milne-Witten link-set modes. Ids are assigned with the SAME
    first-seen-over-src-then-dst factorization as ``CSRGraph.from_edges``
    so both structures built from one edge table share the id space.
    Duplicate (src, dst) edges SUM their counts (the aggregated edge
    TSV is already unique per pair; summing keeps this robust)."""

    def __init__(self, out_indptr, out_indices, out_counts,
                 in_indptr, in_indices, in_counts, names):
        self.out_indptr = out_indptr
        self.out_indices = out_indices
        self.out_counts = out_counts
        self.in_indptr = in_indptr
        self.in_indices = in_indices
        self.in_counts = in_counts
        self.names = names

    @property
    def num_nodes(self) -> int:
        return len(self.names)

    @classmethod
    def from_edges(cls, src, dst, weight) -> "DirectedCSR":
        import pandas as pd

        src = np.asarray(src, dtype=object)
        dst = np.asarray(dst, dtype=object)
        w = np.asarray(weight, dtype=np.float64)
        codes, uniques = pd.factorize(np.concatenate([src, dst]))
        names = np.asarray(uniques, dtype=object)
        n = len(names)
        s = codes[: len(src)].astype(np.int64)
        d = codes[len(src):].astype(np.int64)
        key = s * n + d
        order = np.argsort(key, kind="stable")
        key_s, w_s = key[order], w[order]
        uniq, first = np.unique(key_s, return_index=True)
        wsum = np.add.reduceat(w_s, first) if len(w_s) else w_s
        su = (uniq // n).astype(np.int64)
        du = (uniq % n).astype(np.int64)

        def csr(rows, cols, ws):
            o = np.argsort(rows, kind="stable")
            rows, cols, ws = rows[o], cols[o], ws[o]
            indptr = np.zeros(n + 1, np.int64)
            np.cumsum(np.bincount(rows, minlength=n), out=indptr[1:])
            return indptr, cols.astype(np.int32), ws.astype(np.float64)

        oi, oc, ow = csr(su, du, wsum)
        ii, ic, iw = csr(du, su, wsum)
        return cls(oi, oc, ow, ii, ic, iw, names)

    def out_links(self, node: int):
        s, e = self.out_indptr[node], self.out_indptr[node + 1]
        return self.out_indices[s:e], self.out_counts[s:e]

    def in_links(self, node: int):
        s, e = self.in_indptr[node], self.in_indptr[node + 1]
        return self.in_indices[s:e], self.in_counts[s:e]


#: modes that need the DirectedCSR twin beside the symmetrized CSRGraph
DIRECTED_MW_MODES = frozenset(
    ("in", "in_count", "out", "out_count", "both", "both_count"))
#: every selectable non-PPR relatedness mode, reference enum -> ours
#: (RelatednessMeasureWebGraph.java:31-62):
#:   pageLinksIn->in  pageCountLinksIn->in_count  pageLinksOut->out
#:   pageCountLinksOut->out_count  pageLinks->both
#:   pageCountLinks->both_count  directLinkCounts->direct_count
#:   undirectLinkCounts->undirect_link_count
#:   undirectPageLinks->undirect  undirectPageCountLinks->undirect_count
MW_MODES = DIRECTED_MW_MODES | frozenset(
    ("direct_count", "undirect_link_count", "undirect", "undirect_count"))


def _mw_binary(l1: np.ndarray, l2: np.ndarray, n_nodes: int) -> float:
    """Set-based Milne-Witten with the reference's exact clip chain
    (``RelatednessMeasureWebGraph.java:116-152``): empty side or empty
    intersection => sr 1.0 => clipped to 0; sr<0 or sr>=1 => 0;
    else 1-sr."""
    if len(l1) == 0 or len(l2) == 0:
        return 0.0
    common = len(np.intersect1d(l1, l2))
    if common == 0:
        return 0.0
    hi, lo = max(len(l1), len(l2)), min(len(l1), len(l2))
    denom = np.log(n_nodes) - np.log(lo)
    if denom <= 0:
        return 0.0
    sr = (np.log(hi) - np.log(common)) / denom
    if sr < 0.0 or sr >= 1.0:
        return 0.0
    return float(1.0 - sr)


def _mw_counted(ids1, c1, ids2, c2, n_nodes: int) -> float:
    """Counted Milne-Witten (``:165-193``): sizes become count sums and
    the intersection becomes Σ min(count1, count2) over shared
    neighbors; same clip chain."""
    if len(ids1) == 0 or len(ids2) == 0:
        return 0.0
    num1 = float(c1.sum())
    num2 = float(c2.sum())
    _, i1, i2 = np.intersect1d(ids1, ids2, assume_unique=True,
                               return_indices=True)
    common = float(np.minimum(c1[i1], c2[i2]).sum())
    if common <= 0 or num1 <= 0 or num2 <= 0:
        return 0.0
    denom = np.log(n_nodes) - np.log(min(num1, num2))
    if denom <= 0:
        return 0.0
    sr = (np.log(max(num1, num2)) - np.log(common)) / denom
    if sr < 0.0 or sr >= 1.0:
        return 0.0
    return float(1.0 - sr)


def milne_witten_mode(mode: str, a: int, b: int,
                      undirected: CSRGraph | None = None,
                      directed: "DirectedCSR | None" = None) -> float:
    """All ten link-set relatedness modes of
    ``RelatednessMeasureWebGraph.java:83-353`` over the CSR pair
    (K7 full surface, round-4 VERDICT #6), including the reference's
    quirks: a==b => 1.0 before any mode dispatch; ``direct_count``
    always returns 0.0 (the reference's switch arm, :102-103);
    ``undirect_link_count`` returns the RAW edge weight between the
    two nodes (not clamped to [0,1], :346-352). The undirected modes
    run over the max-weight-symmetrized ``CSRGraph`` (the repo's
    undirected artifact); directed modes need the ``DirectedCSR``
    twin built from the same edge table."""
    if a == b:
        return 1.0
    if mode in DIRECTED_MW_MODES:
        if directed is None:
            raise ValueError(f"rel_mode={mode!r} needs a DirectedCSR")
        n = directed.num_nodes
        if mode == "in":
            return _mw_binary(directed.in_links(a)[0],
                              directed.in_links(b)[0], n)
        if mode == "out":
            return _mw_binary(directed.out_links(a)[0],
                              directed.out_links(b)[0], n)
        if mode == "in_count":
            i1, c1 = directed.in_links(a)
            i2, c2 = directed.in_links(b)
            return _mw_counted(i1, c1, i2, c2, n)
        if mode == "out_count":
            i1, c1 = directed.out_links(a)
            i2, c2 = directed.out_links(b)
            return _mw_counted(i1, c1, i2, c2, n)
        if mode == "both":
            s1 = np.union1d(directed.in_links(a)[0],
                            directed.out_links(a)[0])
            s2 = np.union1d(directed.in_links(b)[0],
                            directed.out_links(b)[0])
            return _mw_binary(s1, s2, n)
        # both_count: merge the in/out maps SUMMING counts per neighbor
        # (:265-283), then the counted formula
        def merged(node):
            ii, ic = directed.in_links(node)
            oi, oc = directed.out_links(node)
            ids = np.concatenate([ii, oi])
            cs = np.concatenate([ic, oc])
            o = np.argsort(ids, kind="stable")
            u, first = np.unique(ids[o], return_index=True)
            return u, (np.add.reduceat(cs[o], first) if len(u)
                       else cs)
        i1, c1 = merged(a)
        i2, c2 = merged(b)
        return _mw_counted(i1, c1, i2, c2, n)
    if mode == "direct_count":
        return 0.0
    if undirected is None:
        raise ValueError(f"rel_mode={mode!r} needs the undirected CSR")
    if mode == "undirect_link_count":
        s, e = undirected.indptr[a], undirected.indptr[a + 1]
        nbrs = undirected.indices[s:e]
        hit = np.nonzero(nbrs == b)[0]
        return float(undirected.weights[s:e][hit[0]]) if len(hit) else 0.0
    if mode == "undirect":
        return _mw_binary(undirected.neighbors(a),
                          undirected.neighbors(b), undirected.num_nodes)
    if mode == "undirect_count":
        sa, ea = undirected.indptr[a], undirected.indptr[a + 1]
        sb, eb = undirected.indptr[b], undirected.indptr[b + 1]
        return _mw_counted(
            undirected.indices[sa:ea],
            undirected.weights[sa:ea].astype(np.float64),
            undirected.indices[sb:eb],
            undirected.weights[sb:eb].astype(np.float64),
            undirected.num_nodes)
    raise ValueError(f"unknown Milne-Witten mode {mode!r}")


def milne_witten(graph: CSRGraph, a: int, b: int) -> float:
    """Milne-Witten relatedness over neighbor sets (K7,
    ``RelatednessMeasureWebGraph.java:116-141``):
    ``1 - (log max(|A|,|B|) - log|A∩B|) / (log N - log min(|A|,|B|))``,
    clamped to [0,1]; empty intersection or empty side => 0
    (common==0 => sr=1.0 => relatedness 0, the :129-130 quirk)."""
    na = graph.neighbors(a)
    nb = graph.neighbors(b)
    if len(na) == 0 or len(nb) == 0:
        return 0.0
    common = len(np.intersect1d(na, nb, assume_unique=False))
    if common == 0:
        return 0.0
    n = graph.num_nodes
    hi, lo = max(len(na), len(nb)), min(len(na), len(nb))
    denom = np.log(n) - np.log(lo)
    if denom <= 0:
        return 0.0
    sr = (np.log(hi) - np.log(common)) / denom
    return float(min(max(1.0 - sr, 0.0), 1.0))
