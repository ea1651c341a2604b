"""Shared utilities: metrics, seeding, losses, misc tensor helpers.

TPU-native counterpart of reference ``graphslim/utils.py`` (metrics at
``utils.py:516-612``, seeding at ``utils.py:86``). All metric functions are
pure jittable JAX.
"""

from __future__ import annotations

import os
import random

import jax
import jax.numpy as jnp
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed host RNGs and return a JAX PRNG key (the device-side seed)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.key(seed)


# ---------------------------------------------------------------------------
# Metrics (reference graphslim/utils.py:516-612)
# ---------------------------------------------------------------------------

def accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean((pred == labels).astype(jnp.float32))


def f1_macro(logits: jax.Array, labels: jax.Array, nclass: int) -> jax.Array:
    """Macro-averaged F1 over ``nclass`` classes (jittable)."""
    pred = jnp.argmax(logits, axis=-1)
    classes = jnp.arange(nclass)
    pred_oh = pred[None, :] == classes[:, None]      # [C, N]
    true_oh = labels[None, :] == classes[:, None]
    tp = jnp.sum(pred_oh & true_oh, axis=1).astype(jnp.float32)
    fp = jnp.sum(pred_oh & ~true_oh, axis=1).astype(jnp.float32)
    fn = jnp.sum(~pred_oh & true_oh, axis=1).astype(jnp.float32)
    precision = tp / jnp.maximum(tp + fp, 1.0)
    recall = tp / jnp.maximum(tp + fn, 1.0)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)
    # Match sklearn: classes absent from both pred and true contribute 0
    # to the macro average denominator only when support exists.
    return jnp.mean(f1)


def roc_auc(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """Binary ROC-AUC via the rank statistic (jittable).

    ``scores`` are positive-class scores; ties handled by average rank.
    """
    order = jnp.argsort(scores)
    ranks = jnp.empty_like(scores).at[order].set(
        jnp.arange(1, scores.shape[0] + 1, dtype=scores.dtype))
    pos = labels == 1
    n_pos = jnp.sum(pos)
    n_neg = scores.shape[0] - n_pos
    rank_sum = jnp.sum(jnp.where(pos, ranks, 0.0))
    auc = (rank_sum - n_pos * (n_pos + 1) / 2) / jnp.maximum(
        n_pos * n_neg, 1)
    return auc


def metric_fn(name: str, nclass: int):
    """Metric selector: f1_macro for yelp/amazon-style multiclass imbalance,
    accuracy otherwise (reference ``config.py:226-229``)."""
    if name == "f1_macro":
        return lambda logits, labels: f1_macro(logits, labels, nclass)
    if name == "roc_auc":
        return lambda logits, labels: roc_auc(logits[:, 1], labels)
    return accuracy


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def nll_loss(log_probs: jax.Array, labels: jax.Array,
             mask: jax.Array | None = None) -> jax.Array:
    """Mean negative log-likelihood over (optionally masked) rows."""
    ll = jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    if mask is not None:
        m = mask.astype(ll.dtype)
        return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)
    return -jnp.mean(ll)


def soft_ce_loss(log_probs: jax.Array, soft_targets: jax.Array,
                 mask: jax.Array | None = None) -> jax.Array:
    """KL-style soft-label cross entropy (GEOM soft-label path,
    reference ``condensation/geom.py:193-241``)."""
    ll = jnp.sum(soft_targets * log_probs, axis=-1)
    if mask is not None:
        m = mask.astype(ll.dtype)
        return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)
    return -jnp.mean(ll)


def one_hot(labels: jax.Array, nclass: int) -> jax.Array:
    return jax.nn.one_hot(labels, nclass)


# ---------------------------------------------------------------------------
# Regularizers (reference graphslim/utils.py:99-140)
# ---------------------------------------------------------------------------

def feature_smoothing(adj: jax.Array, x: jax.Array) -> jax.Array:
    """tr(X^T L X) smoothness with symmetric normalized Laplacian."""
    adj = (adj.T + adj) / 2
    deg = adj.sum(axis=1)
    lap = jnp.diag(deg) - adj
    r_inv = jnp.where(deg > 1e-8, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)),
                      0.0)
    l_norm = r_inv[:, None] * lap * r_inv[None, :]
    xlx = x.T @ l_norm @ x
    return jnp.trace(xlx) / int(adj.shape[0])


def cdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise Euclidean distances [n_a, n_b] — MXU-friendly expansion."""
    a2 = jnp.sum(a * a, axis=1)[:, None]
    b2 = jnp.sum(b * b, axis=1)[None, :]
    ab = a @ b.T
    return jnp.sqrt(jnp.maximum(a2 + b2 - 2 * ab, 0.0))
