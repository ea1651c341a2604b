"""SGDD — structure-broadcast graph distillation with the IGNR graphon.

Re-design of reference ``graphslim/condensation/sgdd.py:14-105``: GCond's
gradient-matching loop with the IGNR generator and a spectral-OT
regularizer against the top-left ``mx_size`` corner of the raw adjacency,
scaled by ``opt_scale``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphslim_tpu import graph as G
from graphslim_tpu.models.ignr import IGNR, IGNRConfig, mx_inv
from graphslim_tpu.reduce.gcond import GCond


class SGDD(GCond):
    def __init__(self, data, args):
        # The spectral-OT regularizer differentiates an SVD/eigh of the
        # generated adjacency.  At the TPU default matmul precision
        # (bf16 multiplies) the adjacency entering the decomposition is
        # degraded enough to crash the on-device eigensolver
        # (reproduced twice: "TPU worker process crashed", paper cora
        # config on the hard twin; survives with opt_scale=0 or at
        # HIGHEST — docs/PERF.md round 5).  Quality also needs f32:
        # 0.775±0.014 at HIGHEST vs 0.391 at a default-precision mid
        # budget.  Default the knob on TPU unless the user set one.
        if (getattr(args, "matmul_precision", None) is None
                and args.opt_scale > 0
                and jax.default_backend() == "tpu"):
            args = args.replace(matmul_precision="highest")
        super().__init__(data, args)
        mx_size = min(args.mx_size, data.n_nodes)
        self.pge = IGNR(IGNRConfig(
            node_feature=self.d, nnodes=self.n_syn, nfeat=128,
            ep_ratio=args.ep_ratio, sinkhorn_iter=args.sinkhorn_iter,
            mx_size=mx_size))
        # Lx^-1 of the raw adjacency corner (reference sgdd.py:33-37 +
        # ignr.py:187-188) — computed once.
        dense = np.asarray(self.data.adj.to_dense())[:mx_size, :mx_size] \
            if data.setting != "ind" else \
            np.asarray(self.data.adj_train.to_dense())[:mx_size, :mx_size]
        self.lx_inv = mx_inv(jnp.asarray(dense, dtype=jnp.float32))

    def generator_forward(self, pge_params, feat_syn):
        adj = self.pge.apply(pge_params, feat_syn)
        aux = jnp.float32(0.0)
        if self.args.opt_scale > 0:
            aux = self.args.opt_scale * self.pge.opt_loss(
                pge_params, adj, self.lx_inv)
        return G.normalize_adj_dense(adj), aux
