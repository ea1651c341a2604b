"""Adversarial graph corruption for robustness benchmarks.

Re-design of reference ``graphslim/dataset/attack.py:16-95`` +
``models/{prbcd,random_attack}.py``:

* ``random_adj``  — add ``ptb_r·|E|/2`` random edges (RandomAttack).
* ``random_feat`` — replace features with Gaussian noise on a ``ptb_r``
  fraction of nodes.
* ``metattack``   — PRBCD (projected randomized block coordinate descent,
  "Robustness of GNNs at Scale"): a JAX re-implementation that trains a
  GCN surrogate, then optimizes Bernoulli edge-flip probabilities over
  random candidate blocks by gradient ascent on the attack loss, and
  samples the final perturbation under the budget.

Corrupted adjacency is cached as npz like the reference
(``attack.py:25-32``).
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphslim_tpu import graph as G
from graphslim_tpu import models as M
from graphslim_tpu import utils

log = logging.getLogger("graphslim_tpu")


def _cache_path(args, data) -> str:
    root = os.path.join(args.save_path, "corrupt_graph", args.attack)
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, f"{data.name}_{args.ptb_r}.npz")


def attack(data: G.Dataset, args) -> G.Dataset:
    """Dispatch + cache + report attacked GCN accuracy
    (reference ``attack.py:16-95``)."""
    path = _cache_path(args, data)
    if os.path.exists(path):
        blob = np.load(path)
        new_adj = G.from_edge_index(blob["edge_index"], data.n_nodes,
                                    dedup=True)
        feat = jnp.asarray(blob["feat"]) if "feat" in blob else data.feat
    else:
        if args.attack == "random_adj":
            new_adj, feat = _random_adj(data, args), data.feat
        elif args.attack == "random_feat":
            new_adj, feat = data.adj, _random_feat(data, args)
        elif args.attack in ("metattack", "prbcd"):
            new_adj, feat = prbcd_attack(data, args), data.feat
        else:
            raise ValueError(f"unknown attack {args.attack!r}")
        payload = {"edge_index": G.to_edge_index(new_adj)}
        if args.attack == "random_feat":
            payload["feat"] = np.asarray(feat)
        np.savez_compressed(path, **payload)

    import dataclasses
    attacked = dataclasses.replace(data, adj=new_adj, feat=feat,
                                   _adj_norm=None)
    attacked._adj_norm_ell = None
    if data.setting == "ind":
        attacked.adj_train = G.submatrix(new_adj, data.idx_train)
        attacked.adj_val = G.submatrix(new_adj, data.idx_val)
        attacked.adj_test = G.submatrix(new_adj, data.idx_test)
        attacked.feat_train = jnp.take(feat,
                                       jnp.asarray(data.idx_train), axis=0)
        attacked.feat_val = jnp.take(feat, jnp.asarray(data.idx_val),
                                     axis=0)
        attacked.feat_test = jnp.take(feat, jnp.asarray(data.idx_test),
                                      axis=0)
    _report_attacked_acc(attacked, args)
    return attacked


def _random_adj(data: G.Dataset, args) -> G.SparseAdj:
    """Add ptb_r·|E|/2 random edges (reference RandomAttack 'add')."""
    rng = np.random.default_rng(args.seed)
    n = data.n_nodes
    n_add = int(args.ptb_r * data.adj.nnz / 2)
    src = rng.integers(0, n, size=n_add)
    dst = rng.integers(0, n, size=n_add)
    keep = src != dst
    ei = np.concatenate([G.to_edge_index(data.adj),
                         np.stack([src[keep], dst[keep]])], axis=1)
    return G.from_edge_index(ei, n, symmetrize=True)


def _random_feat(data: G.Dataset, args) -> jax.Array:
    rng = np.random.default_rng(args.seed)
    feat = np.asarray(data.feat).copy()
    n_ptb = int(args.ptb_r * feat.shape[0])
    rows = rng.choice(feat.shape[0], size=n_ptb, replace=False)
    feat[rows] = rng.normal(size=(n_ptb, feat.shape[1])).astype(
        np.float32) * feat.std()
    return jnp.asarray(feat)


def prbcd_attack(data: G.Dataset, args, block_size: int = 100_000,
                 steps: int = 50) -> G.SparseAdj:
    """PRBCD structure attack (reference ``models/prbcd.py``, re-designed
    in JAX): gradient ascent on flip probabilities over random edge
    blocks, projection onto the budget simplex, final Bernoulli rounding."""
    key = utils.seed_everything(args.seed)
    n = data.n_nodes
    budget = int(args.ptb_r * data.adj.nnz / 2)
    if budget == 0:
        return data.adj

    # surrogate GCN
    cfg = M.ModelConfig(nfeat=data.n_feat, nhid=64, nclass=data.nclass,
                        nlayers=2, dropout=0.0)
    surrogate = M.get_model("GCN", cfg)
    norm = data.adj_norm()
    tr = jnp.asarray(data.idx_train)
    params, _, _ = M.fit_with_val(
        surrogate, key,
        train=(data.feat, norm, data.labels[tr], tr),
        val=(data.feat, norm, data.labels[jnp.asarray(data.idx_val)],
             jnp.asarray(data.idx_val)),
        cfg=M.TrainConfig(epochs=200))

    rng = np.random.default_rng(args.seed)
    block = min(block_size, n * (n - 1) // 2)
    # sample candidate flip pairs (upper-triangle linear indices)
    lin = rng.choice(n * n, size=block, replace=False)
    rows = (lin // n).astype(np.int32)
    cols = (lin % n).astype(np.int32)
    off = rows != cols
    rows, cols = rows[off], cols[off]
    rows_j, cols_j = jnp.asarray(rows), jnp.asarray(cols)

    base_row, base_col = data.adj.row, data.adj.col
    base_val = data.adj.values_or_ones()
    labels = data.labels
    feat = data.feat
    n_nodes = n

    def adj_with(p):
        """Normalized adjacency with candidate edges weighted by p."""
        row = jnp.concatenate([base_row, rows_j, cols_j])
        col = jnp.concatenate([base_col, cols_j, rows_j])
        val = jnp.concatenate([base_val, p, p])
        # degree + sym norm with self loops, all in jit (fixed nnz)
        deg = jax.ops.segment_sum(val, row, num_segments=n_nodes) + 1.0
        dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
        vn = val * jnp.take(dinv, row) * jnp.take(dinv, col)
        self_v = dinv * dinv
        return row, col, vn, self_v

    def fwd(p):
        row, col, vn, self_v = adj_with(p)
        x = feat
        for i, layer in enumerate(params["layers"]):
            from graphslim_tpu.models import nn as fnn
            x = fnn.linear_apply(layer, x)
            gathered = jnp.take(x, col, axis=0) * vn[:, None]
            x = jax.ops.segment_sum(gathered, row,
                                    num_segments=n_nodes) + \
                self_v[:, None] * x
            if i != len(params["layers"]) - 1:
                x = jax.nn.relu(x)
        return jax.nn.log_softmax(x, axis=-1)

    @jax.jit
    def step(p, opt_state):
        def loss_of(p):
            out = fwd(jax.nn.sigmoid(p))
            return -utils.nll_loss(out[tr], labels[tr])  # maximize loss

        loss, g = jax.value_and_grad(loss_of)(p)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(p, updates), opt_state, loss

    opt = optax.adam(0.1)
    p = jnp.full((rows.shape[0],), -4.0)
    opt_state = opt.init(p)
    for _ in range(steps):
        p, opt_state, _ = step(p, opt_state)

    probs = np.asarray(jax.nn.sigmoid(p))
    top = np.argsort(-probs)[:budget]
    ei = np.concatenate([G.to_edge_index(data.adj),
                         np.stack([rows[top], cols[top]])], axis=1)
    return G.from_edge_index(ei, n, symmetrize=True)


def _report_attacked_acc(data: G.Dataset, args) -> None:
    """Retrain a GCN on the corrupted graph and log its accuracy
    (reference ``attack.py:69-95``)."""
    cfg = M.ModelConfig(nfeat=data.n_feat, nhid=args.hidden,
                        nclass=data.nclass, nlayers=2, dropout=0.0)
    model = M.get_model("GCN", cfg)
    norm = G.gcn_norm(data.adj)
    tr = jnp.asarray(data.idx_train)
    va = jnp.asarray(data.idx_val)
    te = jnp.asarray(data.idx_test)
    params, _, _ = M.fit_with_val(
        model, jax.random.key(args.seed),
        train=(data.feat, norm, data.labels[tr], tr),
        val=(data.feat, norm, data.labels[va], va),
        cfg=M.TrainConfig(epochs=min(args.eval_epochs, 300)))
    acc = M.evaluate(model, params, data.feat, norm, data.labels[te], te)
    log.info("attacked GCN accuracy (%s, ptb=%.2f): %.4f", args.attack,
             args.ptb_r, float(acc))
