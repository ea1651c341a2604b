"""GAT: multi-head edge attention over sparse adjacency.

Replaces the reference's PyG-MessagePassing GATConv (reference
``graphslim/models/layers.py:59-249``, ``models/gat.py:16-66``): edge scores
via gather (SDDMM pattern), edge-softmax via segment-max/segment-sum, then
weighted SpMM — all on-device.  Like the reference, GAT is sparse-only and
used for evaluation; condensed dense graphs are thresholded to sparse first
(``dataset/utils.py:8-66``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphslim_tpu import graph as G
from graphslim_tpu.kernels.ell import EllAdj, attention_ell
from graphslim_tpu.kernels.segment import segment_softmax
from graphslim_tpu.models import nn
from graphslim_tpu.models.base import GNNModel


class GAT(GNNModel):
    """Two layers: heads concat then single-head output (reference
    ``gat.py:16-40``: 8 heads, hidden//8 per head)."""

    def init(self, key):
        c = self.cfg
        h = max(c.nhid // c.nheads, 1)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "w1": nn.glorot_uniform(k1, (c.nfeat, c.nheads * h)),
            "a1": nn.glorot_uniform(k2, (2, c.nheads, h)),
            "w2": nn.glorot_uniform(k3, (c.nheads * h, c.nclass)),
            "a2": nn.glorot_uniform(k4, (2, 1, c.nclass)),
        }

    def _attn_layer(self, x, adj, w, a, nheads, training, key, dropout):
        n = x.shape[0]
        h = w.shape[1] // nheads
        feat = (x @ w).reshape(n, nheads, h)
        # Edge scores: target (row) gets src (col) messages.
        alpha_dst = jnp.einsum("nhd,hd->nh", feat, a[0])
        alpha_src = jnp.einsum("nhd,hd->nh", feat, a[1])
        if isinstance(adj, EllAdj):
            # Scatter-free fast path: row-local softmax on the padded
            # ELL buckets (docs/PERF.md "edge softmax" measurement).
            # Inference with wide heads is bytes-bound in the message
            # gather (rows > ~1 KB): bf16 messages measured 1.5x faster
            # at h=32 on chip (155.4 -> 103.4 ms, round 3).  The
            # per-edge source logits ride the combined gather, so on
            # this path they are rounded to bf16 too (the destination
            # logits and the softmax itself stay f32 — ~8 mantissa bits
            # on half the logit sum; eval parity pinned by
            # tests/test_models.py::test_gat_bf16_inference_parity).
            # Training keeps f32 end-to-end.
            mfeat = (feat.astype(jnp.bfloat16)
                     if (not training and h >= 16) else feat)
            out = attention_ell(adj, alpha_dst, alpha_src, mfeat,
                                dropout_key=key, dropout=dropout,
                                training=training)
            return out.reshape(n, nheads * h).astype(x.dtype)
        scores = jnp.take(alpha_dst, adj.row, axis=0) + \
            jnp.take(alpha_src, adj.col, axis=0)          # [E, H]
        scores = jax.nn.leaky_relu(scores, 0.2)
        att = segment_softmax(scores, adj.row, n)
        if adj.val is not None:
            att = att * adj.val[:, None]
        att = nn.dropout(key, att, dropout, training)
        msgs = jnp.take(feat, adj.col, axis=0) * att[..., None]
        out = jax.ops.segment_sum(msgs, adj.row, num_segments=n,
                                  indices_are_sorted=True)
        return out.reshape(n, nheads * h)

    def _forward(self, params, x, adj, *, training, key):
        c = self.cfg
        if not isinstance(adj, (G.SparseAdj, EllAdj)):
            # Dense condensed adj: convert via thresholded sparse view.
            raise TypeError(
                "GAT requires a SparseAdj or EllAdj; threshold the dense "
                "synthetic adjacency first (data.artifacts.sparsify)")
        dks = self._dropout_keys(key, 4)
        x = nn.dropout(dks[0], x, c.dropout, training)
        x = self._attn_layer(x, adj, params["w1"], params["a1"], c.nheads,
                             training, dks[1], c.dropout)
        x = jax.nn.elu(x)
        x = nn.dropout(dks[2], x, c.dropout, training)
        x = self._attn_layer(x, adj, params["w2"], params["a2"], 1,
                             training, dks[3], c.dropout)
        return x
