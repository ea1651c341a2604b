"""GDEM — graph distillation via eigenbasis matching.

Re-design of reference ``graphslim/condensation/gdem.py:16-289`` +
helpers (``condensation/utils.py:457-628``):

* largest connected component → normalized Laplacian → eigendecomposition
  (dense ``jnp.linalg.eigh`` on device below a cutoff, ARPACK ``eigsh``
  k=1000 above; cached on disk like the reference's ``eigenvalues.npy``).
* learnable ``eigenvecs_syn`` [n_syn, eigen_k] + synthetic features;
  losses = α·subspace-covariance match + β·class-embedding match +
  γ·orthogonality; alternating eigenvec/feat steps on the e1/e2 schedule.
* whole epoch jitted; eigenvecs initialized from an SBM Laplacian basis.
"""

from __future__ import annotations

import logging
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

from graphslim_tpu import graph as G
from graphslim_tpu.data import synthetic
from graphslim_tpu.reduce.cond_base import CondensationBase

log = logging.getLogger("graphslim_tpu")

_DENSE_EIG_CUTOFF = 6000


def subspace_covariance(eigenvecs: jax.Array, x: jax.Array) -> jax.Array:
    """[k, d, d] per-direction covariance of the L2-normalized spectral
    projection (reference ``get_subspace_covariance_matrix``)."""
    x_trans = eigenvecs.T @ x                       # [k, d]
    x_trans = x_trans / jnp.maximum(
        jnp.linalg.norm(x_trans, axis=1, keepdims=True), 1e-12)
    return jnp.einsum("kd,ke->kde", x_trans, x_trans)


def embed_mean(eigenvals, eigenvecs, x, onehot) -> jax.Array:
    """Normalized per-class mean of U diag(1-λ) Uᵀ x (reference
    ``get_embed_sum`` + ``get_embed_mean``)."""
    x_trans = eigenvecs.T @ x
    x_trans = (1.0 - eigenvals)[:, None] * x_trans
    embed_sum = eigenvecs @ x_trans                 # [n, d]
    cls = onehot.T @ embed_sum                      # [C, d]
    cls = cls / jnp.maximum(onehot.sum(0)[:, None], 1.0)
    return cls / jnp.maximum(
        jnp.linalg.norm(cls, axis=1, keepdims=True), 1e-12)


class GDEM(CondensationBase):
    with_structure = False   # structure comes from the learned eigenbasis

    def __init__(self, data, args):
        args = args.replace(eigen_k=min(args.eigen_k, 256))
        super().__init__(data, args)
        self.eigen_k = min(args.eigen_k, self.n_syn)

    # -- spectral preprocessing ----------------------------------------
    def _lcc_eigen(self, data: G.Dataset):
        """(idx_lcc, eigenvals, eigenvecs) of the LCC normalized
        Laplacian, disk-cached (reference ``get_eigh``)."""
        cache = os.path.join(self.args.save_path, "eigen", data.name)
        os.makedirs(cache, exist_ok=True)
        vp = os.path.join(cache, "eigenvalues.npy")
        up = os.path.join(cache, "eigenvectors.npy")
        ip = os.path.join(cache, "idx_lcc.npy")
        if os.path.exists(vp) and os.path.exists(up):
            return np.load(ip), np.load(vp), np.load(up)
        adj = data.adj_train if data.setting == "ind" else data.adj
        n = adj.n_rows
        W = sp.csr_matrix(
            (np.asarray(adj.values_or_ones()),
             (np.asarray(adj.row), np.asarray(adj.col))), shape=(n, n))
        _, comp = csgraph.connected_components(W, directed=False)
        sizes = np.bincount(comp)
        idx_lcc = np.flatnonzero(comp == np.argmax(sizes))
        Wl = W[np.ix_(idx_lcc, idx_lcc)]
        # normalized laplacian L = I - D^-1/2 (A+I) D^-1/2
        Wl = Wl + sp.eye(Wl.shape[0])
        d = np.asarray(Wl.sum(1)).ravel()
        dinv = 1.0 / np.sqrt(np.maximum(d, 1e-12))
        An = sp.diags(dinv) @ Wl @ sp.diags(dinv)
        L = sp.eye(Wl.shape[0]) - An
        if Wl.shape[0] <= _DENSE_EIG_CUTOFF:
            vals, vecs = np.linalg.eigh(L.toarray())
        else:
            k = min(1000, Wl.shape[0] - 1)
            vals, vecs = sp.linalg.eigsh(L, k=k, which="SA", tol=1e-5)
        np.save(vp, vals)
        np.save(up, vecs)
        np.save(ip, idx_lcc)
        return idx_lcc, vals, vecs

    @staticmethod
    def _syn_eigen(vals, vecs, eigen_k, ratio):
        """k1 smallest + k2 largest directions (reference
        ``get_syn_eigen``)."""
        k1 = math.ceil(eigen_k * ratio)
        k2 = eigen_k - k1
        total = vals.shape[0]
        sel = list(range(k1)) + list(range(total - k2, total))
        return vals[sel], vecs[:, sel]

    def _init_eigenvecs(self, key):
        """SBM-graph Laplacian basis (reference
        ``get_init_syn_eigenvecs``)."""
        n_syn, C = self.n_syn, self.nclass
        ei, _, _ = synthetic.generate(
            n_syn, 8, C, avg_degree=max(n_syn / C / 3.0, 2.0),
            homophily=0.75, seed=self.args.seed)
        adj = G.from_edge_index(ei, n_syn, symmetrize=True)
        dense = np.asarray(G.gcn_norm(adj).to_dense())
        L = np.eye(n_syn) - dense
        _, vecs = np.linalg.eigh(L)
        return jnp.asarray(vecs[:, : self.eigen_k], dtype=jnp.float32)

    # -- main loop ------------------------------------------------------
    def _reduce(self, data: G.Dataset, verbose: bool) -> G.Reduced:
        args = self.args
        idx_lcc, vals_lcc, vecs_lcc = self._lcc_eigen(data)
        vals, vecs = self._syn_eigen(vals_lcc, vecs_lcc, self.eigen_k,
                                     args.ratio)
        vals_j = jnp.asarray(vals, dtype=jnp.float32)
        vecs_j = jnp.asarray(vecs, dtype=jnp.float32)

        feats_all = data.feat_train if data.setting == "ind" else data.feat
        x_lcc = jnp.take(feats_all, jnp.asarray(idx_lcc), axis=0)
        co_real = subspace_covariance(vecs_j, x_lcc)

        # train rows inside the LCC (reference get_train_lcc idx_map)
        if data.setting == "ind":
            train_ids = np.arange(feats_all.shape[0])
            labels_all = np.asarray(data.labels_train)
        else:
            train_ids = np.asarray(data.idx_train)
            labels_all = np.asarray(data.labels)
        in_lcc = np.isin(train_ids, idx_lcc)
        train_lcc = train_ids[in_lcc]
        pos = np.searchsorted(idx_lcc, train_lcc)
        onehot_real = np.zeros((idx_lcc.shape[0], self.nclass),
                               dtype=np.float32)
        onehot_real[pos] = np.eye(self.nclass,
                                  dtype=np.float32)[labels_all[train_lcc]]
        mean_real = embed_mean(vals_j, vecs_j, x_lcc,
                               jnp.asarray(onehot_real))

        onehot_syn = jnp.asarray(
            np.eye(self.nclass, dtype=np.float32)[
                np.asarray(self.labels_syn)])

        key = jax.random.key(args.seed)
        x_syn = self.init_feat_syn(verbose)
        u_syn = self._init_eigenvecs(key)
        opt_x = optax.adam(args.lr_feat)
        opt_u = optax.adam(args.lr_eigenvec)
        sx = opt_x.init(x_syn)
        su = opt_u.init(u_syn)
        iden_c = jnp.eye(self.nclass)
        iden_k = jnp.eye(self.eigen_k)

        def build_step(update_u: bool):
            def step(x_syn, u_syn, sx, su):
                def loss_of(x, u):
                    co_syn = subspace_covariance(u, x)
                    l_eigen = jnp.mean((co_syn - co_real) ** 2)
                    mean_syn = embed_mean(vals_j, u, x, onehot_syn)
                    l_class = jnp.mean(
                        (mean_real @ mean_syn.T - iden_c) ** 2)
                    l_orth = jnp.mean((u.T @ u - iden_k) ** 2)
                    return (args.alpha * l_eigen + args.beta * l_class
                            + args.gamma * l_orth)

                loss, (gx, gu) = jax.value_and_grad(
                    loss_of, argnums=(0, 1))(x_syn, u_syn)
                if update_u:
                    up, su2 = opt_u.update(gu, su, u_syn)
                    return x_syn, optax.apply_updates(u_syn, up), sx, \
                        su2, loss
                up, sx2 = opt_x.update(gx, sx, x_syn)
                return optax.apply_updates(x_syn, up), u_syn, sx2, su, \
                    loss

            return jax.jit(step)

        steps = {True: build_step(True), False: build_step(False)}
        best_val = 0.0
        self._best_reduced = None
        period = max(args.e1 + args.e2, 1)
        for ep in range(args.epochs):
            update_u = (ep % period) < args.e1
            x_syn, u_syn, sx, su, loss = steps[update_u](x_syn, u_syn,
                                                         sx, su)
            if ep in args.checkpoints:
                L_syn = u_syn @ jnp.diag(vals_j) @ u_syn.T
                adj_syn = jnp.eye(self.n_syn) - L_syn
                best_val = self.intermediate_evaluation(
                    x_syn, adj_syn, best_val, ep, float(loss), verbose)
        if self._best_reduced is not None:
            return self._best_reduced
        L_syn = u_syn @ jnp.diag(vals_j) @ u_syn.T
        adj_syn = jnp.eye(self.n_syn) - L_syn
        return G.Reduced(feat=jax.lax.stop_gradient(x_syn), adj=adj_syn,
                         labels=self.labels_syn)
