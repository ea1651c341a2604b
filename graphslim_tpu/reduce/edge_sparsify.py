"""Edge sparsification: thin the edge set, keep all nodes.

First-party replacements for the reference's NetworKit-backed sparsifiers
(``graphslim/sparsification/{random_edge,g_spar,local_degree,scan,
spanning_forest,rank_degree,t_spanner}.py`` + ``nk`` round-trip in
``edge_sparsification_base.py:13-34``):

* Jaccard (GSpar) and SCAN similarities via chunked sparse row-intersection
  (CSR gather + multiply) — no NetworKit.
* LocalDegree via per-node neighbor-degree ranking.
* Spanning forest via ``scipy.sparse.csgraph.minimum_spanning_tree``.
* RankDegree's iterative seed growth and the t-spanner's sequential
  Dijkstra check stay host-side (inherently sequential — SURVEY.md §7.5).

Output contract matches the reference: same node set, reduced edges; the
synthetic triple is (full feats, sparsified adj, full labels) restricted to
the train pool in inductive settings.
"""

from __future__ import annotations

import logging

import numpy as np
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

import jax.numpy as jnp

from graphslim_tpu import graph as G
from graphslim_tpu.reduce.base import Reducer

log = logging.getLogger("graphslim_tpu")


def _to_scipy(adj: G.SparseAdj) -> sp.csr_matrix:
    n = adj.n_rows
    return sp.csr_matrix(
        (np.asarray(adj.values_or_ones()),
         (np.asarray(adj.row), np.asarray(adj.col))), shape=(n, n))


def _upper_edges(W: sp.csr_matrix):
    Wu = sp.triu(W, 1).tocoo()
    return np.stack([Wu.row, Wu.col]), Wu.data


def _common_neighbors(W: sp.csr_matrix, edges: np.ndarray,
                      chunk: int = 200_000) -> np.ndarray:
    """|N(u) ∩ N(v)| per edge via chunked sparse row gather+multiply."""
    Wb = (W > 0).astype(np.float32).tocsr()
    out = np.zeros(edges.shape[1], dtype=np.float32)
    for lo in range(0, edges.shape[1], chunk):
        hi = min(lo + chunk, edges.shape[1])
        a = Wb[edges[0, lo:hi]]
        b = Wb[edges[1, lo:hi]]
        out[lo:hi] = np.asarray(a.multiply(b).sum(axis=1)).ravel()
    return out


class EdgeSparsifier(Reducer):
    """Base: score edges, keep the top ``r`` fraction, rebuild the triple."""

    def __init__(self, data, args, labels_syn_override=None):
        super().__init__(data, args)

    # subclass hook: higher score = keep
    def edge_scores(self, W: sp.csr_matrix, edges: np.ndarray,
                    weights: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def select_edges(self, W, edges, weights) -> np.ndarray:
        scores = self.edge_scores(W, edges, weights)
        m_keep = max(int(edges.shape[1] * self.args.reduction_rate), 1)
        return np.argsort(-scores, kind="stable")[:m_keep]

    def _reduce(self, data: G.Dataset, verbose: bool) -> G.Reduced:
        if data.setting == "ind":
            adj, feat, labels = (data.adj_train, data.feat_train,
                                 data.labels_train)
        else:
            adj, feat, labels = data.adj, data.feat, data.labels
        W = _to_scipy(adj)
        edges, weights = _upper_edges(W)
        keep = self.select_edges(W, edges, weights)
        ei = edges[:, keep]
        ew = weights[keep]
        adj_syn = G.from_edge_index(ei, W.shape[0], edge_weight=ew,
                                    symmetrize=True)
        return G.Reduced(feat=feat, adj=adj_syn, labels=labels)


class RandomEdge(EdgeSparsifier):
    """Uniform random edge keep (reference ``random_edge.py:13-21``)."""

    def edge_scores(self, W, edges, weights):
        rng = np.random.default_rng(self.args.seed)
        return rng.random(edges.shape[1])


class GSpar(EdgeSparsifier):
    """Jaccard similarity (reference ``g_spar.py`` /
    ``nk.JaccardSimilaritySparsifier``)."""

    def edge_scores(self, W, edges, weights):
        common = _common_neighbors(W, edges)
        deg = np.asarray((W > 0).sum(1)).ravel()
        union = deg[edges[0]] + deg[edges[1]] - common
        return common / np.maximum(union, 1.0)


class Scan(EdgeSparsifier):
    """SCAN structural similarity over closed neighborhoods
    (reference ``scan.py`` / ``nk.SCANSparsifier``)."""

    def edge_scores(self, W, edges, weights):
        common = _common_neighbors(W, edges)
        deg = np.asarray((W > 0).sum(1)).ravel()
        # closed neighborhoods: +2 shared (u,v themselves), sizes +1
        return (common + 2.0) / np.sqrt(
            (deg[edges[0]] + 1.0) * (deg[edges[1]] + 1.0))


class LocalDegree(EdgeSparsifier):
    """Keep edges ranked high in the *neighbor's* degree order
    (reference ``local_degree.py`` / ``nk.LocalDegreeSparsifier``)."""

    def edge_scores(self, W, edges, weights):
        deg = np.asarray((W > 0).sum(1)).ravel()
        n = W.shape[0]
        Wb = (W > 0).tocsr()
        indptr, indices = Wb.indptr, Wb.indices
        # rank of each directed edge target within source's neighbor list
        # sorted by degree descending
        score_dir = {}
        rank_score = np.zeros_like(indices, dtype=np.float32)
        for u in range(n):
            lo, hi = indptr[u], indptr[u + 1]
            if hi == lo:
                continue
            nbrs = indices[lo:hi]
            order = np.argsort(-deg[nbrs], kind="stable")
            d = hi - lo
            r = np.empty(d)
            r[order] = 1.0 - np.log(np.arange(1, d + 1)) / max(
                np.log(d + 1), 1e-9)
            rank_score[lo:hi] = r
        S = sp.csr_matrix((rank_score, indices, indptr), shape=(n, n))
        s1 = np.asarray(S[edges[0], edges[1]]).ravel()
        s2 = np.asarray(S[edges[1], edges[0]]).ravel()
        return np.maximum(s1, s2)


class SpanningForest(EdgeSparsifier):
    """Keep only a spanning forest (reference ``spanning_forest.py`` /
    ``nk.graph.SpanningForest``); ignores the reduction rate."""

    def select_edges(self, W, edges, weights):
        mst = csgraph.minimum_spanning_tree(W)
        mst = sp.coo_matrix(mst)
        tree = set(zip(*(np.minimum(mst.row, mst.col),
                         np.maximum(mst.row, mst.col))))
        keep = [e for e in range(edges.shape[1])
                if (min(edges[0, e], edges[1, e]),
                    max(edges[0, e], edges[1, e])) in tree]
        return np.asarray(keep, dtype=np.int64)


class RankDegree(EdgeSparsifier):
    """Iterative seed/neighbor-rank growth with adaptive rho
    (reference ``rank_degree.py:14-68``)."""

    def select_edges(self, W, edges, weights):
        rng = np.random.default_rng(self.args.seed)
        n = W.shape[0]
        target = max(int(edges.shape[1] * self.args.reduction_rate), 1)
        deg = np.asarray((W > 0).sum(1)).ravel()
        Wb = (W > 0).tocsr()
        rho = 0.1
        kept = set()
        seeds = list(rng.choice(n, size=min(max(n // 100, 3), n),
                                replace=False))
        it = 0
        while len(kept) < target and it < 100:
            it += 1
            new_seeds = []
            for s in seeds:
                nbrs = Wb[s].indices
                if len(nbrs) == 0:
                    continue
                k = max(int(np.ceil(rho * len(nbrs))), 1)
                top = nbrs[np.argsort(-deg[nbrs], kind="stable")[:k]]
                for v in top:
                    e = (min(s, v), max(s, v))
                    if e not in kept:
                        kept.add(e)
                        new_seeds.append(v)
                    if len(kept) >= target:
                        break
                if len(kept) >= target:
                    break
            seeds = new_seeds or list(rng.choice(n, size=3, replace=False))
            rho = min(rho * 1.5, 1.0)
        lookup = {(min(edges[0, e], edges[1, e]),
                   max(edges[0, e], edges[1, e])): e
                  for e in range(edges.shape[1])}
        return np.asarray([lookup[e] for e in kept if e in lookup],
                          dtype=np.int64)


class TSpanner(EdgeSparsifier):
    """Greedy t-spanner: process edges lightest-first, keep an edge iff
    the distance through kept edges exceeds ``t·w`` (reference
    ``t_spanner.py:13-28``)."""

    def select_edges(self, W, edges, weights):
        t = self.args.ts
        n = W.shape[0]
        # Fast path: exact sequential spanner in the first-party C++ lib
        # (graphslim_tpu/native); Python fallback below batches the
        # spanner-graph rebuilds.
        from graphslim_tpu import native
        keep = native.t_spanner(edges[0], edges[1], weights, n, float(t))
        if keep is not None:
            return keep
        order = np.argsort(weights, kind="stable")
        kept_rows, kept_cols, kept_w, kept_idx = [], [], [], []
        rebuild_every = max(len(order) // 50, 1)
        Wk = sp.csr_matrix((n, n))
        pending = 0
        for e in order:
            u, v, w = int(edges[0, e]), int(edges[1, e]), float(weights[e])
            if pending >= rebuild_every:
                Wk = sp.csr_matrix(
                    (kept_w + kept_w, (kept_rows + kept_cols,
                                       kept_cols + kept_rows)),
                    shape=(n, n))
                pending = 0
            d = csgraph.dijkstra(Wk, indices=u, limit=t * w,
                                 min_only=True)[v] if Wk.nnz else np.inf
            if d > t * w:
                kept_rows.append(u)
                kept_cols.append(v)
                kept_w.append(w)
                kept_idx.append(e)
                pending += 1
        return np.asarray(kept_idx, dtype=np.int64)
