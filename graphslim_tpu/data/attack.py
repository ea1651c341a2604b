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
            new_adj = prbcd_attack(
                data, args,
                block_size=getattr(args, "prbcd_block", 250_000),
                epochs=getattr(args, "prbcd_epochs", 120),
                fine_tune_epochs=getattr(args, "prbcd_fine_tune", 30))
            feat = data.feat
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


def _triu_pairs(rng: np.random.Generator, n: int, count: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """``count`` random upper-triangle (i<j) pairs, with replacement
    (duplicates are harmless: their flip weights just alias).  Uses the
    closed-form linear→triu index map (reference ``prbcd.py:379-392``)."""
    lin = rng.integers(0, n * (n - 1) // 2, size=count, dtype=np.int64)
    # row r of pair k: largest r with r*n - r(r+1)/2 <= k
    row = (n - 2 - np.floor(
        np.sqrt(-8 * lin + 4 * n * (n - 1) - 7) / 2 - 0.5)).astype(np.int64)
    col = lin + row + 1 - (row * (2 * n - row - 1)) // 2
    return row.astype(np.int32), col.astype(np.int32)


def _edge_key_set(edge_index: np.ndarray, n: int) -> np.ndarray:
    """Sorted canonical (min,max) linear keys of an edge list."""
    lo = np.minimum(edge_index[0], edge_index[1]).astype(np.int64)
    hi = np.maximum(edge_index[0], edge_index[1]).astype(np.int64)
    return np.unique(lo * n + hi)


def _is_existing_edge(keys: np.ndarray, rows: np.ndarray,
                      cols: np.ndarray, n: int) -> np.ndarray:
    """Vectorized membership of (rows<cols) pairs against sorted keys."""
    q = rows.astype(np.int64) * n + cols.astype(np.int64)
    pos = np.searchsorted(keys, q)
    pos = np.minimum(pos, keys.shape[0] - 1)
    return keys[pos] == q if keys.size else np.zeros(q.shape, dtype=bool)


def prbcd_attack(data: G.Dataset, args, block_size: int = 250_000,
                 epochs: int = 120, fine_tune_epochs: int = 30,
                 lr_adj: float = 0.2, eps: float = 1e-7,
                 max_final_samples: int = 20) -> G.SparseAdj:
    """PRBCD structure attack — full algorithm of reference
    ``models/prbcd.py:65-440`` ("Robustness of GNNs at Scale"), TPU-native:

    * surrogate GCN + **self-training labels** (non-train labels replaced
      by surrogate predictions, ``prbcd.py:253-259``);
    * random candidate block of upper-triangle pairs; existing edges get
      flip semantics (weight ``1-p``), non-edges get ``p``
      (``get_modified_adj``'s coalesce + ``2-w`` trick, done here with a
      precomputed ``is_edge`` sign so the jit nnz stays static);
    * per-epoch: tanh-margin attack loss on all nodes, first-step-Adam
      ascent (the reference re-creates its Adam each epoch, which reduces
      to sign-scaled ascent), clamp to ``eps``, then **projection onto the
      budget simplex** by bisection (``project``/``bisection``,
      ``prbcd.py:200-215,408-430``);
    * **block resampling** while ``epoch < epochs - fine_tune_epochs``:
      keep the top half by weight, refill with fresh random pairs
      (``resample_random_block``, ``prbcd.py:151-199``);
    * final: top-k first, then ``max_final_samples`` Bernoulli draws under
      the budget, **keep the draw with the worst validation loss**
      (``sample_final_edges``, ``prbcd.py:107-149``).

    The candidate block lives in one fixed-shape jit program; resampling
    swaps array *contents* only, so nothing recompiles across epochs.
    """
    key = utils.seed_everything(args.seed)
    n = data.n_nodes
    budget = int(args.ptb_r * data.adj.nnz / 2)
    if budget == 0:
        return data.adj

    # --- surrogate GCN + self-training labels ---------------------------
    cfg = M.ModelConfig(nfeat=data.n_feat, nhid=64, nclass=data.nclass,
                        nlayers=2, dropout=0.0)
    surrogate = M.get_model("GCN", cfg)
    norm = data.adj_norm()
    tr = jnp.asarray(data.idx_train)
    va = jnp.asarray(data.idx_val)
    params, _, _ = M.fit_with_val(
        surrogate, key,
        train=(data.feat, norm, data.labels[tr], tr),
        val=(data.feat, norm, data.labels[va], va),
        cfg=M.TrainConfig(epochs=200))
    pred = jnp.argmax(surrogate.apply(params, data.feat, norm,
                                      training=False), axis=-1)
    st_labels = pred.astype(jnp.int32)
    st_labels = st_labels.at[tr].set(data.labels[tr])

    rng = np.random.default_rng(args.seed)
    B = min(block_size, n * (n - 1) // 2)
    ei_base = G.to_edge_index(data.adj)
    edge_keys = _edge_key_set(ei_base, n)

    def sample_block(count):
        r, c = _triu_pairs(rng, n, count)
        is_e = _is_existing_edge(edge_keys, r, c, n)
        return r, c, is_e

    rows, cols, is_edge = sample_block(B)

    # big real-graph arrays travel as jit ARGUMENTS (closure constants
    # would bake multi-MB literals into the HLO; see cond_base.RealTensors)
    base = (data.adj.row, data.adj.col, data.adj.values_or_ones(),
            data.feat, st_labels)
    n_nodes = n

    def fwd(base, p, rows_j, cols_j, sign_j):
        """Surrogate forward on the modified graph.  ``sign_j`` is +1 for
        insertion candidates and -1 for deletion candidates, so the
        effective edge weight is ``1-p`` on existing edges."""
        base_row, base_col, base_val, feat, _ = base
        w = sign_j * p
        row = jnp.concatenate([base_row, rows_j, cols_j])
        col = jnp.concatenate([base_col, cols_j, rows_j])
        val = jnp.concatenate([base_val, w, w])
        deg = jax.ops.segment_sum(val, row, num_segments=n_nodes) + 1.0
        dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
        vn = val * jnp.take(dinv, row) * jnp.take(dinv, col)
        self_v = dinv * dinv
        x = feat
        from graphslim_tpu.models import nn as fnn
        for i, layer in enumerate(params["layers"]):
            x = fnn.linear_apply(layer, x)
            gathered = jnp.take(x, col, axis=0) * vn[:, None]
            x = jax.ops.segment_sum(gathered, row,
                                    num_segments=n_nodes) + \
                self_v[:, None] * x
            if i != len(params["layers"]) - 1:
                x = jax.nn.relu(x)
        return jax.nn.log_softmax(x, axis=-1)

    def tanh_margin_loss(log_probs, st_labels):
        """tanh of the negative classification margin, mean over nodes
        (reference ``loss_attack`` type='tanhMargin', ``prbcd.py:314-325``)."""
        true_lp = jnp.take_along_axis(log_probs, st_labels[:, None],
                                      axis=1)[:, 0]
        masked = log_probs.at[jnp.arange(n_nodes), st_labels].set(-jnp.inf)
        best_other = jnp.max(masked, axis=1)
        return jnp.mean(jnp.tanh(best_other - true_lp))

    def project(p):
        """Clamp-shift projection onto {Σp ≤ budget, p ∈ [eps, 1-eps]}
        by bisection (reference ``bisection``, ``prbcd.py:408-430``)."""
        def body(_, ab):
            a, b = ab
            mid = (a + b) / 2.0
            f = jnp.sum(jnp.clip(p - mid, 0.0, 1.0)) - budget
            return jnp.where(f > 0, mid, a), jnp.where(f > 0, b, mid)

        needs = jnp.sum(jnp.clip(p, 0.0, 1.0)) > budget
        a0, b0 = jnp.min(p) - 1.0, jnp.max(p)
        a, b = jax.lax.fori_loop(0, 40, body, (a0, b0))
        mu = jnp.where(needs, (a + b) / 2.0, 0.0)
        return jnp.clip(p - mu, eps, 1.0 - eps)

    @jax.jit
    def epoch_step(base, p, rows_j, cols_j, sign_j):
        loss, g = jax.value_and_grad(
            lambda q: tanh_margin_loss(fwd(base, q, rows_j, cols_j,
                                           sign_j), base[4]))(p)
        # reference re-creates Adam every epoch -> first-step Adam ==
        # sign-scaled ascent at lr_adj
        p = p + lr_adj * g / (jnp.abs(g) + 1e-12)
        p = jnp.maximum(p, eps)
        return project(p), loss

    @jax.jit
    def val_loss_of(base, p, rows_j, cols_j, sign_j):
        out = fwd(base, p, rows_j, cols_j, sign_j)
        return utils.nll_loss(out[va], base[4][va])

    p = jnp.full((B,), eps, dtype=jnp.float32)
    rows_j = jnp.asarray(rows)
    cols_j = jnp.asarray(cols)
    sign_j = jnp.where(jnp.asarray(is_edge), -1.0, 1.0)
    resample_until = epochs - fine_tune_epochs
    for it in range(epochs):
        p, loss = epoch_step(base, p, rows_j, cols_j, sign_j)
        if it < resample_until - 1:
            # keep top half by weight, refill the rest with fresh pairs
            p_np = np.asarray(p)
            keep = np.argsort(-p_np)[:B // 2]
            keep = keep[p_np[keep] > eps]
            r2, c2, e2 = sample_block(B - keep.shape[0])
            rows = np.concatenate([rows[keep], r2])
            cols = np.concatenate([cols[keep], c2])
            is_edge = np.concatenate([is_edge[keep], e2])
            p_np = np.concatenate([p_np[keep],
                                   np.full(r2.shape[0], eps,
                                           dtype=np.float32)])
            rows_j, cols_j = jnp.asarray(rows), jnp.asarray(cols)
            sign_j = jnp.where(jnp.asarray(is_edge), -1.0, 1.0)
            p = jnp.asarray(p_np)

    # --- final discrete sample: topk, then Bernoulli draws; keep the
    # draw with the WORST surrogate validation loss --------------------
    p_np = np.array(p)
    p_np[p_np <= eps] = 0.0
    best_loss, best_mask = -np.inf, None
    for i in range(max_final_samples):
        if best_mask is None:
            mask = np.zeros(B, dtype=np.float32)
            mask[np.argsort(-p_np)[:budget]] = 1.0
            mask[p_np == 0.0] = 0.0
        else:
            mask = (rng.random(B) < p_np).astype(np.float32)
            if mask.sum() > budget:
                continue
        lv = float(val_loss_of(base, jnp.asarray(mask), rows_j, cols_j,
                               sign_j))
        if lv > best_loss:
            best_loss, best_mask = lv, mask

    sel = best_mask.astype(bool)
    add = sel & ~is_edge
    remove = sel & is_edge
    # apply flips host-side on the edge list
    ei = ei_base
    if remove.any():
        rm_keys = np.unique(rows[remove].astype(np.int64) * n
                            + cols[remove].astype(np.int64))
        lo = np.minimum(ei[0], ei[1]).astype(np.int64)
        hi = np.maximum(ei[0], ei[1]).astype(np.int64)
        keep_e = ~np.isin(lo * n + hi, rm_keys, assume_unique=False)
        ei = ei[:, keep_e]
    if add.any():
        ei = np.concatenate(
            [ei, np.stack([rows[add], cols[add]])], axis=1)
    log.info("PRBCD: budget=%d applied=%d (add=%d remove=%d) "
             "best_val_loss=%.4f", budget, int(sel.sum()),
             int(add.sum()), int(remove.sum()), best_loss)
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
