"""SGFormer — linear-attention graph transformer.

Re-design of reference ``graphslim/models/sgformer.py`` (TransConv linear
attention ``:149-292`` + GraphConv branch ``:96-148``, mixed with
``graph_weight``): the O(N) attention ``softmax-free`` trick
(``qs·(ksᵀvs)`` with additive N·vs term) is pure MXU einsum work.  Uses
the shared trainer (the reference duplicates ``fit_with_val`` at
``:363-476``; ours reuses :mod:`graphslim_tpu.models.trainer`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphslim_tpu.models import nn
from graphslim_tpu.models.base import GNNModel, aggregate


def _layer_norm(x: jax.Array, p: dict) -> jax.Array:
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


class SGFormer(GNNModel):
    gnn_layers = 2
    heads = 1
    graph_weight = 0.8

    @property
    def trans_layers(self) -> int:
        """Transformer depth — reference ``trans_num_layers`` grid axis
        (``eval_agent.py:135-136``), configurable via
        ``ModelConfig.trans_layers``."""
        return self.cfg.trans_layers

    def init(self, key):
        c = self.cfg
        h = c.nhid
        keys = iter(jax.random.split(key, 64))
        params = {
            # trans branch
            "t_fc": nn.linear_init(next(keys), c.nfeat, h),
            "t_ln": [{"scale": jnp.ones((h,)), "bias": jnp.zeros((h,))}
                     for _ in range(self.trans_layers + 1)],
            "t_conv": [
                {"wq": nn.linear_init(next(keys), h, h * self.heads),
                 "wk": nn.linear_init(next(keys), h, h * self.heads),
                 "wv": nn.linear_init(next(keys), h, h * self.heads)}
                for _ in range(self.trans_layers)],
            # graph branch
            "g_fc": nn.linear_init(next(keys), c.nfeat, h),
            "g_bn": [nn.bn_init(h) for _ in range(self.gnn_layers + 1)],
            "g_conv": [nn.linear_init(next(keys), h, h, bias=False)
                       for _ in range(self.gnn_layers)],
            "out": nn.linear_init(next(keys), h, c.nclass),
        }
        return params

    def _attention(self, p, x):
        """Softmax-free linear attention (reference ``:174-209``)."""
        n = x.shape[0]
        H, D = self.heads, x.shape[-1]
        qs = nn.linear_apply(p["wq"], x).reshape(n, H, D)
        ks = nn.linear_apply(p["wk"], x).reshape(n, H, D)
        vs = nn.linear_apply(p["wv"], x).reshape(n, H, D)
        qs = qs / jnp.maximum(jnp.linalg.norm(qs), 1e-12)
        ks = ks / jnp.maximum(jnp.linalg.norm(ks), 1e-12)
        kvs = jnp.einsum("lhm,lhd->hmd", ks, vs)
        num = jnp.einsum("nhm,hmd->nhd", qs, kvs) + n * vs
        ks_sum = ks.sum(axis=0)                       # [H, M]
        denom = jnp.einsum("nhm,hm->nh", qs, ks_sum)[..., None] + n
        return (num / denom).mean(axis=1)

    def _forward(self, params, x, adj, *, training, key):
        c = self.cfg
        dks = self._dropout_keys(key, 2 * (self.trans_layers
                                           + self.gnn_layers) + 2)
        ki = iter(dks)
        # trans branch
        t = nn.linear_apply(params["t_fc"], x)
        t = _layer_norm(t, params["t_ln"][0])
        t = jax.nn.relu(t)
        t = nn.dropout(next(ki), t, c.dropout, training)
        hist = [t]
        for i in range(self.trans_layers):
            t = self._attention(params["t_conv"][i], t)
            t = (t + hist[i]) / 2.0                   # residual
            t = _layer_norm(t, params["t_ln"][i + 1])
            t = jax.nn.relu(t)
            t = nn.dropout(next(ki), t, c.dropout, training)
            hist.append(t)
        # graph branch
        g = nn.linear_apply(params["g_fc"], x)
        g = jax.nn.relu(g)
        g = nn.dropout(next(ki), g, c.dropout, training)
        for i in range(self.gnn_layers):
            g = aggregate(adj, g)
            g = nn.linear_apply(params["g_conv"][i], g)
            g = jax.nn.relu(g)
            g = nn.dropout(next(ki), g, c.dropout, training)
        out = self.graph_weight * g + (1 - self.graph_weight) * t
        return nn.linear_apply(params["out"], out)
