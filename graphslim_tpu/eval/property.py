"""Graph-property preservation evaluation.

Re-design of reference ``graphslim/evaluation/graph_property.py:25-173``:
density, Laplacian-subspace eigenvalue trace, spectral radius, mean
clustering coefficient, edge homophily, and Davies–Bouldin index (raw and
Â²X-aggregated features) for original vs reduced graphs.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from graphslim_tpu import graph as G

log = logging.getLogger("graphslim_tpu")


def _to_csr(adj) -> sp.csr_matrix:
    if isinstance(adj, G.SparseAdj):
        n = adj.n_rows
        return sp.csr_matrix(
            (np.asarray(adj.values_or_ones()),
             (np.asarray(adj.row), np.asarray(adj.col))), shape=(n, n))
    a = np.asarray(adj)
    return sp.csr_matrix(a)


def density(W: sp.csr_matrix) -> float:
    n = W.shape[0]
    return float(W.nnz / max(n * (n - 1), 1))


def laplacian_trace(W: sp.csr_matrix, k: int = 10) -> float:
    """Sum of the k smallest normalized-Laplacian eigenvalues."""
    n = W.shape[0]
    deg = np.asarray(W.sum(1)).ravel()
    with np.errstate(divide="ignore"):
        dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    L = sp.eye(n) - sp.diags(dinv) @ W @ sp.diags(dinv)
    k = min(k, n - 2)
    if k < 1:
        return 0.0
    if n <= 2000:
        vals = np.linalg.eigvalsh(L.toarray())[:k]
    else:
        # shift-invert at sigma<0: ARPACK 'SA' without it can take
        # thousands of iterations for the smallest Laplacian eigenvalues
        # (observed hanging on a 20k-node graph); 'LM' on (L - sigma I)^-1
        # converges in a handful
        try:
            vals = sp.linalg.eigsh(L.tocsc(), k=k, sigma=-0.01,
                                   which="LM", return_eigenvectors=False,
                                   tol=1e-4)
        except Exception:
            vals = sp.linalg.eigsh(L, k=k, which="SA",
                                   return_eigenvectors=False, tol=1e-4,
                                   maxiter=2000)
    return float(np.sum(vals))


def spectral_radius(W: sp.csr_matrix) -> float:
    n = W.shape[0]
    if n <= 2000:
        return float(np.max(np.abs(
            np.linalg.eigvalsh(W.toarray().astype(np.float64)))))
    v = sp.linalg.eigsh(W.astype(np.float64), k=1, which="LM",
                        return_eigenvectors=False, tol=1e-4)
    return float(abs(v[0]))


def clustering_coefficient(W: sp.csr_matrix) -> float:
    """Mean local clustering coefficient (binary graph)."""
    A = (W > 0).astype(np.float64)
    A = A - sp.diags(A.diagonal())
    deg = np.asarray(A.sum(1)).ravel()
    tri = (A @ A).multiply(A).sum(axis=1)
    tri = np.asarray(tri).ravel() / 2.0
    denom = deg * (deg - 1) / 2.0
    cc = np.where(denom > 0, tri / np.maximum(denom, 1), 0.0)
    return float(cc.mean())


def homophily(W: sp.csr_matrix, labels: np.ndarray) -> float:
    coo = W.tocoo()
    if coo.nnz == 0:
        return 0.0
    same = labels[coo.row] == labels[coo.col]
    return float(same.mean())


def davies_bouldin(feat: np.ndarray, labels: np.ndarray) -> float:
    """DB index (lower = better-separated class clusters)."""
    classes = np.unique(labels)
    if len(classes) < 2:
        return 0.0
    cents, scatter = [], []
    for c in classes:
        x = feat[labels == c]
        mu = x.mean(0)
        cents.append(mu)
        scatter.append(np.linalg.norm(x - mu, axis=1).mean())
    cents = np.stack(cents)
    k = len(classes)
    db = 0.0
    for i in range(k):
        worst = 0.0
        for j in range(k):
            if i == j:
                continue
            d = np.linalg.norm(cents[i] - cents[j])
            worst = max(worst, (scatter[i] + scatter[j]) / max(d, 1e-12))
        db += worst
    return float(db / k)


class PropertyEvaluator:
    """Compare structural/feature properties of original vs reduced."""

    def __init__(self, data: G.Dataset, args):
        self.data = data
        self.args = args

    def properties(self, adj, feat, labels) -> dict:
        W = _to_csr(adj) if adj is not None else sp.csr_matrix(
            (feat.shape[0], feat.shape[0]))
        feat_np = np.asarray(feat)
        labels_np = np.asarray(labels)
        if labels_np.ndim == 2:
            labels_np = labels_np.argmax(1)
        out = {
            "density": density(W),
            "laplacian_trace": laplacian_trace(W),
            "spectral_radius": spectral_radius(W),
            "cluster_coefficient": clustering_coefficient(W),
            "homophily": homophily(W, labels_np),
            "davies_bouldin": davies_bouldin(feat_np, labels_np),
        }
        # aggregated-feature DB (reference graph_property.py:150-173) —
        # host-side scipy SpMM: property evaluation is a post-hoc
        # analysis pass, and eager device matmuls here have OOMed when
        # run right after a condensation left HBM populated
        if W.nnz:
            n = W.shape[0]
            A = (W + sp.eye(n, format="csr")).tocsr()
            deg = np.asarray(A.sum(1)).ravel()
            with np.errstate(divide="ignore"):
                dinv = np.where(deg > 0, deg ** -0.5, 0.0)
            Dn = sp.diags(dinv)
            An = Dn @ A @ Dn
            agg = An @ (An @ feat_np.astype(np.float64))
            out["davies_bouldin_agg"] = davies_bouldin(
                np.asarray(agg, dtype=np.float32), labels_np)
        return out

    def compare(self, reduced: G.Reduced) -> dict:
        d = self.data
        ori = self.properties(d.adj, d.feat, d.labels)
        red = self.properties(
            None if reduced.adj is None else reduced.adj, reduced.feat,
            reduced.labels)
        return {"original": ori, "reduced": red}
