"""The GNN model zoo: MLP, GCN, SGC, APPNP, Cheby, GraphSage.

Functional re-designs of reference ``graphslim/models/{gcn,sgc,appnp,cheby,
graphsage}.py`` + ``models/layers.py``.  Semantics preserved:

* GCN: per layer ``A @ (X W) + b``; BN?/ReLU/dropout between layers;
  log_softmax head (``layers.py:36-51``, ``gcn.py:8-23``).
* SGC: ``ntrans`` linears (ReLU/dropout between) then ``nlayers``
  propagations ``x = A @ x`` (``sgc.py:37-57``); eval mode forces ntrans=1.
* APPNP: linears then K steps ``x = (1-α)·A@x + α·h`` with a selectable
  activation (``appnp.py:35-88``).
* Cheby: K-term recurrence ``Tx_2 = 2·A·Tx_1 − Tx_0`` with single shared
  weight per layer (``layers.py:288-351``).
* GraphSage: ``W(A@x) + W(x)`` with shared root weight (``layers.py:252-285``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from graphslim_tpu.models import nn
from graphslim_tpu.models.base import (
    GNNModel, ModelConfig, layer_aggregate, block_level_adj,
)


def _block_self_rows(x: jax.Array, weights: jax.Array) -> jax.Array:
    """Rows of ``x`` corresponding to block targets (last slot = self)."""
    m_out, s = weights.shape
    return x.reshape(m_out, s, x.shape[-1])[:, -1, :]


class MLP(GNNModel):
    """nlayers-deep MLP (adjacency ignored — identity structure)."""

    def init(self, key):
        c = self.cfg
        dims = ([c.nfeat] + [c.nhid] * (c.nlayers - 1) + [c.nclass]
                if c.nlayers > 1 else [c.nfeat, c.nclass])
        keys = jax.random.split(key, len(dims) - 1)
        params = {"layers": [nn.linear_init(k, a, b)
                             for k, a, b in zip(keys, dims[:-1], dims[1:])]}
        if c.with_bn:
            params["bns"] = [nn.bn_init(d) for d in dims[1:-1]]
        return params

    def _forward(self, params, x, adj, *, training, key):
        c = self.cfg
        layers = params["layers"]
        dks = self._dropout_keys(key, len(layers))
        for i, p in enumerate(layers):
            x = nn.linear_apply(p, x)
            if i != len(layers) - 1:
                if c.with_bn:
                    x = nn.bn_apply(params["bns"][i], x)
                x = jax.nn.relu(x)
                x = nn.dropout(dks[i], x, c.dropout, training)
        return x


class GCN(GNNModel):
    def init(self, key):
        c = self.cfg
        dims = ([c.nfeat] + [c.nhid] * (c.nlayers - 1) + [c.nclass]
                if c.nlayers > 1 else [c.nfeat, c.nclass])
        keys = jax.random.split(key, len(dims) - 1)
        params = {"layers": [nn.linear_init(k, a, b)
                             for k, a, b in zip(keys, dims[:-1], dims[1:])]}
        if c.with_bn:
            params["bns"] = [nn.bn_init(d) for d in dims[1:-1]]
        return params

    def _forward(self, params, x, adj, *, training, key):
        c = self.cfg
        layers = params["layers"]
        dks = self._dropout_keys(key, len(layers))
        for i, p in enumerate(layers):
            x = nn.linear_apply(p, x)
            x = layer_aggregate(adj, i, x)
            if i != len(layers) - 1:
                if c.with_bn:
                    x = nn.bn_apply(params["bns"][i], x)
                x = jax.nn.relu(x)
                x = nn.dropout(dks[i], x, c.dropout, training)
        return x

    def layer_features(self, params, x, adj):
        feats = []
        for i, p in enumerate(params["layers"]):
            x = nn.linear_apply(p, x)
            x = layer_aggregate(adj, i, x)
            if i != len(params["layers"]) - 1:
                if self.cfg.with_bn:
                    x = nn.bn_apply(params["bns"][i], x)
                x = jax.nn.relu(x)
            feats.append(x.reshape(-1, x.shape[-1]))
        return feats


def _trans_stack_init(key, c: ModelConfig):
    """ntrans linear layers feat→(nhid…)→nclass (SGC/APPNP pattern)."""
    if c.ntrans == 1:
        dims = [c.nfeat, c.nclass]
    else:
        dims = [c.nfeat] + [c.nhid] * (c.ntrans - 1) + [c.nclass]
    keys = jax.random.split(key, len(dims) - 1)
    params = {"layers": [nn.linear_init(k, a, b)
                         for k, a, b in zip(keys, dims[:-1], dims[1:])]}
    if c.with_bn and len(dims) > 2:
        params["bns"] = [nn.bn_init(d) for d in dims[1:-1]]
    return params


def _trans_stack_apply(params, c: ModelConfig, x, activation, training,
                       dks):
    layers = params["layers"]
    for i, p in enumerate(layers):
        x = nn.linear_apply(p, x)
        if i != len(layers) - 1:
            if c.with_bn:
                x = nn.bn_apply(params["bns"][i], x)
            x = activation(x)
            x = nn.dropout(dks[i], x, c.dropout, training)
    return x


class SGC(GNNModel):
    """``nlayers`` = number of propagations; ``ntrans`` transformations."""

    def init(self, key):
        return _trans_stack_init(key, self.cfg)

    def _forward(self, params, x, adj, *, training, key):
        c = self.cfg
        dks = self._dropout_keys(key, len(params["layers"]))
        x = _trans_stack_apply(params, c, x, jax.nn.relu, training, dks)
        for i in range(c.nlayers):
            x = layer_aggregate(adj, i, x)
        return x


class APPNP(GNNModel):
    """``nlayers`` = K power-iteration steps, teleport ``alpha``."""

    def init(self, key):
        return _trans_stack_init(key, self.cfg)

    def _forward(self, params, x, adj, *, training, key):
        c = self.cfg
        act = nn.ACTIVATIONS.get(c.activation, jax.nn.relu)
        dks = self._dropout_keys(key, len(params["layers"]))
        x = _trans_stack_apply(params, c, x, act, training, dks)
        h = x
        for i in range(c.nlayers):
            kind, a = block_level_adj(adj, i)
            if kind == "block":
                # Sampled path: teleport h restricted to this level's
                # targets.  In the contiguous-slot block layout the target's
                # own row is the last (self-loop) slot of its group.
                h = _block_self_rows(h, a)
                x = layer_aggregate(adj, i, x)
            else:
                x = layer_aggregate(adj, i, x)
            x = (1 - c.alpha) * x + c.alpha * h
        return x


class Cheby(GNNModel):
    """Chebyshev stack; each layer uses a single shared weight across the
    K-term recurrence (reference ``single_param=True``)."""

    K = 2

    def init(self, key):
        c = self.cfg
        dims = ([c.nfeat] + [c.nhid] * (c.nlayers - 1) + [c.nclass]
                if c.nlayers > 1 else [c.nfeat, c.nclass])
        keys = jax.random.split(key, len(dims) - 1)
        params = {"layers": [
            {"lin": nn.linear_init(k, a, b, bias=False),
             "b": jnp.zeros((b,))}
            for k, a, b in zip(keys, dims[:-1], dims[1:])]}
        if c.with_bn:
            params["bns"] = [nn.bn_init(d) for d in dims[1:-1]]
        return params

    def _cheb_layer(self, p, x, adj, layer_idx):
        tx0 = x
        out = nn.linear_apply(p["lin"], tx0)
        tx1 = layer_aggregate(adj, layer_idx, x)
        out = out + nn.linear_apply(p["lin"], tx1)
        for _ in range(self.K - 2):
            tx2 = 2.0 * layer_aggregate(adj, layer_idx, tx1) - tx0
            out = out + nn.linear_apply(p["lin"], tx2)
            tx0, tx1 = tx1, tx2
        return out + p["b"]

    def _forward(self, params, x, adj, *, training, key):
        c = self.cfg
        layers = params["layers"]
        dks = self._dropout_keys(key, len(layers))
        for i, p in enumerate(layers):
            x = self._cheb_layer(p, x, adj, i)
            if i != len(layers) - 1:
                if c.with_bn:
                    x = nn.bn_apply(params["bns"][i], x)
                x = jax.nn.relu(x)
                x = nn.dropout(dks[i], x, c.dropout, training)
        return x


class GraphSage(GNNModel):
    def init(self, key):
        c = self.cfg
        dims = ([c.nfeat] + [c.nhid] * (c.nlayers - 1) + [c.nclass]
                if c.nlayers > 1 else [c.nfeat, c.nclass])
        keys = jax.random.split(key, len(dims) - 1)
        params = {"layers": [
            {"lin": nn.linear_init(k, a, b, bias=False)}
            for k, a, b in zip(keys, dims[:-1], dims[1:])]}
        if c.with_bn:
            params["bns"] = [nn.bn_init(d) for d in dims[1:-1]]
        return params

    def _forward(self, params, x, adj, *, training, key):
        c = self.cfg
        layers = params["layers"]
        dks = self._dropout_keys(key, len(layers))
        for i, p in enumerate(layers):
            h = layer_aggregate(adj, i, x)
            kind, a = block_level_adj(adj, i)
            # Root term: the target's own (untransformed) features — the
            # self-loop slot in the block layout, all rows otherwise.
            root = _block_self_rows(x, a) if kind == "block" else x
            x = nn.linear_apply(p["lin"], h) + nn.linear_apply(p["lin"],
                                                               root)
            if i != len(layers) - 1:
                if c.with_bn:
                    x = nn.bn_apply(params["bns"][i], x)
                x = jax.nn.relu(x)
                x = nn.dropout(dks[i], x, c.dropout, training)
        return x
