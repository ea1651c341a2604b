"""Structure-free coarsening: Cluster / ClusterAgg / Average.

Re-designs of reference ``graphslim/coarsening/{clustering,clusteringagg,
averaging}.py``: per-class (Bisecting)KMeans centroids — here a jitted JAX
Lloyd's — or per-class means, identity adjacency.  These double as the
standard condensation initializers (``gcond_base.py:117-152``), so they
accept an externally imposed label budget via ``labels_syn_override``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphslim_tpu import graph as G
from graphslim_tpu.kernels.kmeans import kmeans
from graphslim_tpu.reduce.base import Reducer, class_budgets


class Cluster(Reducer):
    use_agg = False

    def __init__(self, data, args, labels_syn_override=None):
        super().__init__(data, args)
        if labels_syn_override is not None:
            labels_syn = np.asarray(labels_syn_override)
            classes, counts = np.unique(labels_syn, return_counts=True)
            self.budgets = dict(zip(classes.tolist(), counts.tolist()))
            self.labels_syn = labels_syn
        else:
            self.budgets, self.labels_syn, _ = class_budgets(
                data.labels_for_reduction(), args.reduction_rate)

    def _train_feats(self, data: G.Dataset) -> tuple[jax.Array, np.ndarray]:
        if data.setting == "ind":
            feat, labels = data.feat_train, np.asarray(data.labels_train)
        else:
            feat = jnp.take(data.feat, jnp.asarray(data.idx_train), axis=0)
            labels = np.asarray(data.labels)[data.idx_train]
        if self.use_agg:
            adj = data.adj_train if data.setting == "ind" else data.adj
            norm = G.gcn_norm(adj)
            agg = norm.matmul(norm.matmul(
                data.feat if data.setting != "ind" else data.feat_train))
            if data.setting != "ind":
                agg = jnp.take(agg, jnp.asarray(data.idx_train), axis=0)
            feat = agg
        return feat, labels

    def _class_feat(self, x_c: jax.Array, n_c: int, key) -> jax.Array:
        if x_c.shape[0] <= n_c:
            reps = -(-n_c // x_c.shape[0])
            return jnp.tile(x_c, (reps, 1))[:n_c]
        centroids, _ = kmeans(key, x_c, int(n_c))
        return centroids

    def _reduce(self, data: G.Dataset, verbose: bool) -> G.Reduced:
        feat, labels = self._train_feats(data)
        labels_syn = np.asarray(self.labels_syn)
        d = feat.shape[1]
        x_syn = np.zeros((labels_syn.shape[0], d), dtype=np.float32)
        key = jax.random.key(self.args.seed)
        for c, n_c in self.budgets.items():
            key, kc = jax.random.split(key)
            x_c = feat[jnp.asarray(np.flatnonzero(labels == c))]
            x_syn[labels_syn == c] = np.asarray(
                self._class_feat(x_c, n_c, kc))
        return G.Reduced(feat=jnp.asarray(x_syn), adj=None,
                         labels=jnp.asarray(labels_syn))


class ClusterAgg(Cluster):
    """KMeans on Â²X-aggregated features (reference
    ``clusteringagg.py``)."""

    use_agg = True


class Average(Cluster):
    """Per-class feature mean replicated to the class budget
    (reference ``averaging.py:11-116``)."""

    def _class_feat(self, x_c, n_c, key):
        return jnp.tile(x_c.mean(axis=0, keepdims=True), (n_c, 1))
