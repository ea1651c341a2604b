"""GECC — evolving clustering aggregation condensation.

Re-design of reference ``graphslim/condensation/gecc.py:25-1137`` (the
checked-in single-split path; the commented-out cross-split "evolve"
plumbing maps to passing previous centroids via ``prev_centroids``):

1. weighted multi-hop feature aggregation
   ``X_agg = γ·X + α·ÂX + β·Â²X (+ 0.5·deeper hops)`` — ELL SpMM hops,
   no NeighborSampler needed (the reference's ogbn-products sampler path
   exists only to bound GPU memory);
2. per-class clustering of aggregated train features: K-Means when
   ``fuzziness == 1`` else fuzzy c-means (closed-form membership updates,
   replacing skfuzzy) — both jitted JAX;
3. centroids become ``feat_syn`` with identity adjacency.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from graphslim_tpu import graph as G
from graphslim_tpu.kernels.ell import ell_from_sparse
from graphslim_tpu.kernels.kmeans import kmeans
from graphslim_tpu.reduce.base import Reducer, class_budgets

log = logging.getLogger("graphslim_tpu")


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def fuzzy_cmeans(key: jax.Array, x: jax.Array, k: int, m: float,
                 iters: int = 50) -> jax.Array:
    """Fuzzy c-means centroids (replaces skfuzzy; closed-form updates)."""
    n = x.shape[0]
    idx = jax.random.choice(key, n, shape=(k,), replace=False)
    centers = jnp.take(x, idx, axis=0)
    expo = 2.0 / (m - 1.0)

    def step(centers, _):
        d2 = (jnp.sum(x * x, 1)[:, None]
              + jnp.sum(centers * centers, 1)[None, :]
              - 2.0 * x @ centers.T)
        d2 = jnp.maximum(d2, 1e-12)
        # overflow-safe memberships: normalize by the row minimum before
        # the negative power so the largest term is exactly 1
        ratio = d2 / jnp.min(d2, axis=1, keepdims=True)
        inv = ratio ** (-expo / 2.0)
        u = inv / jnp.sum(inv, axis=1, keepdims=True)
        um = u ** m
        centers = (um.T @ x) / jnp.maximum(
            um.sum(axis=0)[:, None], 1e-12)
        return centers, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


class GECC(Reducer):
    def __init__(self, data, args, labels_syn_override=None,
                 prev_centroids=None):
        super().__init__(data, args)
        if labels_syn_override is not None:
            ls = np.asarray(labels_syn_override)
            classes, counts = np.unique(ls, return_counts=True)
            self.budgets = dict(zip(classes.tolist(), counts.tolist()))
            self.labels_syn = ls
        else:
            self.budgets, self.labels_syn, _ = class_budgets(
                data.labels_for_reduction(), args.reduction_rate,
                absorb_remainder=True)
        self.prev_centroids = prev_centroids or {}

    def _aggregate(self, data: G.Dataset):
        """Weighted hop mix (reference gecc.py:53-160)."""
        args = self.args
        weights = [args.agg_gamma, args.agg_alpha, args.agg_beta]
        weights += [0.5] * max(args.depth + 1 - 3, 0)
        if data.setting == "ind":
            feat, adj = data.feat_train, data.adj_train
        else:
            feat, adj = data.feat, data.adj
        fast = ell_from_sparse(G.gcn_norm(adj))
        agg = weights[0] * feat
        tmp = feat
        for hop in range(1, args.depth + 1):
            tmp = fast.matmul(tmp)
            agg = agg + weights[min(hop, len(weights) - 1)] * tmp
        return agg

    def _reduce(self, data: G.Dataset, verbose: bool) -> G.Reduced:
        args = self.args
        agg = self._aggregate(data)
        if data.setting == "ind":
            labels_tr = np.asarray(data.labels_train)
        else:
            agg = jnp.take(agg, jnp.asarray(data.idx_train), axis=0)
            labels_tr = np.asarray(data.labels)[data.idx_train]
        labels_syn = np.asarray(self.labels_syn)
        d = agg.shape[1]
        x_syn = np.zeros((labels_syn.shape[0], d), dtype=np.float32)
        key = jax.random.key(args.seed)
        for c, n_c in self.budgets.items():
            key, kc = jax.random.split(key)
            x_c = agg[jnp.asarray(np.flatnonzero(labels_tr == c))]
            n_c = int(min(n_c, x_c.shape[0]))
            prev = self.prev_centroids.get(c)
            if prev is not None and prev.shape[0] >= n_c:
                centers = jnp.asarray(prev[:n_c])
            elif x_c.shape[0] <= n_c:
                reps = -(-n_c // x_c.shape[0])
                centers = jnp.tile(x_c, (reps, 1))[:n_c]
            elif args.fuzziness == 1.0:
                centers, _ = kmeans(kc, x_c, n_c)
            else:
                centers = fuzzy_cmeans(kc, x_c, n_c,
                                       float(args.fuzziness),
                                       int(args.rep_fuzz))
            rows = np.flatnonzero(labels_syn == c)[: n_c]
            x_syn[rows] = np.asarray(centers)[: len(rows)]
            self.prev_centroids[c] = np.asarray(centers)
        return G.Reduced(feat=jnp.asarray(x_syn), adj=None,
                        labels=jnp.asarray(labels_syn))
