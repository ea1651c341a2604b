"""Large-graph batch loader: KMeans-partitioned train batches.

Re-design of reference ``LargeDataLoader`` (``dataset/loader.py:232-372``,
the GCSNTK large-dataset path): sparse adjacency + self loops, z-scored
features, optional k-hop GCF pre-filter, KMeans partition of the train
split; ``get_batch(i)`` returns ``(feat, labels, sub_adj)`` — here the
KMeans runs jitted on device and sub-adjacencies are dense blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphslim_tpu import graph as G
from graphslim_tpu.kernels.kmeans import kmeans


class LargeDataLoader:
    def __init__(self, data: G.Dataset, batch_size: int = 3000,
                 split_method: str = "kmeans", gcf_hops: int = 0,
                 seed: int = 0):
        if data.setting == "ind":
            feat = data.feat_train
            labels = np.asarray(data.labels_train)
            adj = data.adj_train
        else:
            feat = jnp.take(data.feat, jnp.asarray(data.idx_train),
                            axis=0)
            labels = np.asarray(data.labels)[data.idx_train]
            adj = G.submatrix(data.adj, data.idx_train)
        feat = G.standardize(feat)
        if gcf_hops > 0:
            # GCF pre-filter: k hops of (I + Â)/2 smoothing
            # (reference loader.py:279-301)
            norm = G.gcn_norm(adj)
            for _ in range(gcf_hops):
                feat = 0.5 * feat + 0.5 * norm.matmul(feat)
        self.feat = feat
        self.labels = labels
        self.adj = adj
        n = feat.shape[0]
        self.n_batch = max(-(-n // batch_size), 1)
        if split_method == "kmeans" and self.n_batch > 1:
            _, assign = kmeans(jax.random.key(seed), feat, self.n_batch)
            assign = np.asarray(assign)
        else:
            assign = np.arange(n) % self.n_batch
        self.batches = [np.flatnonzero(assign == b)
                        for b in range(self.n_batch)]
        self.batches = [b for b in self.batches if b.size > 1]
        self.n_batch = len(self.batches)

    def properties(self):
        n, d = self.feat.shape
        nclass = int(self.labels.max()) + 1
        return self.n_batch, n, nclass, d, n

    def get_batch(self, i: int):
        rows = self.batches[i]
        sub = G.submatrix(self.adj, rows)
        dense = sub.to_dense() + jnp.eye(rows.shape[0])
        return (jnp.take(self.feat, jnp.asarray(rows), axis=0),
                jnp.asarray(self.labels[rows]), dense)
