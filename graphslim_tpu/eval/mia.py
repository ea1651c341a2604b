"""Membership-inference attack via confidence thresholding.

Re-design of reference ``inference_via_confidence``
(``graphslim/evaluation/utils.py:80-113``): sweep a confidence threshold
and report the best membership-inference accuracy between train
(member) and test (non-member) confidence distributions — vectorized.
"""

from __future__ import annotations

import numpy as np


def inference_via_confidence(conf_train: np.ndarray,
                             conf_test: np.ndarray,
                             y_train: np.ndarray,
                             y_test: np.ndarray) -> float:
    """Max over thresholds of 0.5·(TPR + 1 − FPR)."""
    c1 = conf_train[np.arange(len(y_train)), y_train]
    c2 = conf_test[np.arange(len(y_test)), y_test]
    thresholds = np.sort(np.concatenate([c1, c2]))
    # ratio of members/non-members above each threshold, vectorized
    r1 = 1.0 - np.searchsorted(np.sort(c1), thresholds, side="left") / \
        max(len(c1), 1)
    r2 = 1.0 - np.searchsorted(np.sort(c2), thresholds, side="left") / \
        max(len(c2), 1)
    acc = 0.5 * (r1 + 1.0 - r2)
    return float(max(0.5, acc.max()))


def mia_attack(model, params, data, metric_probs=True) -> float:
    """Run the confidence MIA on a trained eval model (reference
    ``eval_agent.py:193-224`` MIA branch)."""
    import jax.numpy as jnp
    from graphslim_tpu import graph as G

    d = data
    if d.setting == "ind":
        out_tr = model.apply(params, d.feat_train,
                             G.gcn_norm(d.adj_train))
        out_te = model.apply(params, d.feat_test, G.gcn_norm(d.adj_test))
        y_tr = np.asarray(d.labels_train)
        y_te = np.asarray(d.labels_test)
    else:
        adj = d.adj_norm_ell()
        out = model.apply(params, d.feat, adj)
        out_tr = out[jnp.asarray(d.idx_train)]
        out_te = out[jnp.asarray(d.idx_test)]
        y_tr = np.asarray(d.labels)[d.idx_train]
        y_te = np.asarray(d.labels)[d.idx_test]
    conf_tr = np.exp(np.asarray(out_tr))
    conf_te = np.exp(np.asarray(out_te))
    return inference_via_confidence(conf_tr, conf_te, y_tr, y_te)
