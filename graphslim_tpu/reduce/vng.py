"""VNG — Virtual Node Graph coarsening ("Serving Graph Compression for
GNNs").

Re-design of reference ``graphslim/coarsening/vng.py:13-165``: train a GNN,
concatenate its per-layer train-node embeddings, run degree-weighted KMeans
(JAX Lloyd's with sample weights), build the propagation-preserving virtual
adjacency ``A_vr = (E A X_head) pinv(E X_head)`` via SVD on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphslim_tpu import graph as G
from graphslim_tpu import models as M
from graphslim_tpu.kernels.kmeans import kmeans
from graphslim_tpu.reduce.base import Reducer


class VNG(Reducer):
    def __init__(self, data, args, labels_syn_override=None):
        super().__init__(data, args)

    def _reduce(self, data: G.Dataset, verbose: bool) -> G.Reduced:
        args = self.args
        cfg = M.ModelConfig(nfeat=data.n_feat, nhid=args.hidden,
                            nclass=data.nclass, nlayers=args.nlayers,
                            dropout=0.0)
        model = M.get_model(args.condense_model, cfg)

        if data.setting == "ind":
            feat, adj, labels = (data.feat_train, data.adj_train,
                                 data.labels_train)
            y_idx = None
            feat0 = data.feat_train
        else:
            feat, adj, labels = data.feat, data.adj, data.labels
            y_idx = jnp.asarray(data.idx_train)
            feat0 = jnp.take(data.feat, y_idx, axis=0)
        norm = G.gcn_norm(adj)
        y_train = labels if y_idx is None else jnp.take(labels, y_idx)
        vy = (data.labels_val if data.setting == "ind"
              else data.labels[jnp.asarray(data.idx_val)])
        vadj = (G.gcn_norm(data.adj_val) if data.setting == "ind" else norm)
        vx = data.feat_val if data.setting == "ind" else feat
        vidx = None if data.setting == "ind" else jnp.asarray(data.idx_val)
        params, _, _ = M.fit_with_val(
            model, jax.random.key(args.seed),
            train=(feat, norm, y_train, y_idx),
            val=(vx, vadj, vy, vidx),
            cfg=M.TrainConfig(epochs=args.eval_epochs, lr=args.lr or 0.01,
                              weight_decay=5e-4, metric=args.metric))
        embeds = model.layer_features(params, feat, norm)
        if y_idx is not None:
            embeds = [jnp.take(e, y_idx, axis=0) for e in embeds]
        x_head = jnp.concatenate(embeds, axis=1)

        # degree-weighted KMeans over concatenated embeddings
        adj_tr = data.adj_train if data.setting == "ind" else \
            G.submatrix(data.adj, data.idx_train)
        col_sum = np.array(adj_tr.rmatmul(
            jnp.ones((adj_tr.n_rows, 1)), adj_tr.n_rows)).ravel().copy()
        col_sum[col_sum == 0] = 1.0
        n_tr = x_head.shape[0]
        n_syn = max(int(args.reduction_rate * n_tr), data.nclass)
        _, assign = kmeans(jax.random.key(2024), x_head, n_syn,
                           weights=jnp.asarray(col_sum))
        assign = np.asarray(assign)

        # E: degree-weighted membership, row-normalized; M: binary
        E = np.zeros((n_syn, n_tr), dtype=np.float32)
        E[assign, np.arange(n_tr)] = col_sum
        row_sums = E.sum(1, keepdims=True)
        row_sums[row_sums == 0] = 1.0
        E = E / row_sums
        Mb = np.zeros((n_syn, n_tr), dtype=np.float32)
        Mb[assign, np.arange(n_tr)] = 1.0

        x_vr = jnp.asarray(E) @ feat0
        X_head = np.asarray(x_head)
        A_tr = np.asarray(adj_tr.to_dense())
        P = E @ X_head
        Q = E @ A_tr @ X_head
        Up, Sp, Vtp = np.linalg.svd(P, full_matrices=False)
        Sinv = np.where(Sp > 1e-8, 1.0 / np.maximum(Sp, 1e-12), 0.0)
        A_vr = Q @ Vtp.T @ np.diag(Sinv) @ Up.T

        onehot = np.eye(data.nclass, dtype=np.float32)[
            np.asarray(y_train)]
        labels_syn = np.argmax(Mb @ onehot, axis=1)
        return G.Reduced(feat=jnp.asarray(x_vr, dtype=jnp.float32),
                         adj=jnp.asarray(A_vr, dtype=jnp.float32),
                         labels=jnp.asarray(labels_syn, dtype=jnp.int32))
