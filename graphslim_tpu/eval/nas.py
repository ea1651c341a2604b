"""NAS evaluation: architecture search-space correlation on syn vs
original graphs.

Re-design of reference ``graphslim/evaluation/nas_eval.py:42-233``: the
480-architecture APPNP space (k × nhid × alpha × activation) is evaluated
by validation accuracy on both graphs; the quality signal is the Pearson
correlation of accuracies and of ranks across the space.
"""

from __future__ import annotations

import itertools
import logging
import os

import jax
import numpy as np

from graphslim_tpu import graph as G
from graphslim_tpu import models as M

log = logging.getLogger("graphslim_tpu")

FULL_SPACE = {
    "ks": [2, 4, 6, 8, 10],
    "nhids": [16, 32, 64, 128, 256, 512],
    "alphas": [0.1, 0.2],
    "activations": ["sigmoid", "tanh", "relu", "linear", "softplus",
                    "leakyrelu", "relu6", "elu"],
}

QUICK_SPACE = {
    "ks": [2, 4],
    "nhids": [16, 64],
    "alphas": [0.1, 0.2],
    "activations": ["relu", "tanh"],
}


def pearson(a: np.ndarray, b: np.ndarray) -> float:
    a = a - a.mean()
    b = b - b.mean()
    denom = np.sqrt((a * a).sum() * (b * b).sum())
    return float((a * b).sum() / max(denom, 1e-12))


class NasEvaluator:
    def __init__(self, data: G.Dataset, args, space: dict | None = None):
        self.data = data
        self.args = args
        space = space or FULL_SPACE
        self.combos = list(itertools.product(
            space["ks"], space["nhids"], space["alphas"],
            space["activations"]))

    def _arch_val(self, params, reduced=None) -> float:
        """Validation accuracy of one APPNP architecture."""
        from graphslim_tpu.eval.evaluator import Evaluator

        k, nhid, alpha, act = params
        args = self.args.replace(nlayers=k, hidden=nhid, alpha=alpha,
                                 activation=act, ntrans=2)
        ev = Evaluator(self.data, args)
        cfg = M.ModelConfig(
            nfeat=self.data.n_feat if reduced is None
            else reduced.feat.shape[-1],
            nhid=nhid, nclass=self.data.nclass, nlayers=k, dropout=0.0,
            alpha=alpha, ntrans=2, activation=act)
        model = M.APPNP(cfg)
        if reduced is None:
            d = self.data
            adj = ev._full_adj("APPNP")
            if d.setting == "ind":
                train = (d.feat_train, G.gcn_norm(d.adj_train),
                         d.labels_train, None)
            else:
                import jax.numpy as jnp
                tr = jnp.asarray(d.idx_train)
                train = (d.feat, adj, d.labels[tr], tr)
            val = ev._val_tuple("APPNP")
            cfgT = M.TrainConfig(epochs=args.eval_epochs,
                                 lr=args.lr or 0.01, weight_decay=5e-4,
                                 metric=args.metric)
            _, best_val, _ = M.fit_with_val(
                model, jax.random.key(args.seed), train=train, val=val,
                cfg=cfgT)
            return float(best_val)
        return ev.nas_evaluate(reduced, model, seed=args.seed)

    def evaluate_ori(self) -> np.ndarray:
        return np.array([self._arch_val(p) for p in self.combos])

    def evaluate_syn(self, reduced: G.Reduced) -> np.ndarray:
        return np.array([self._arch_val(p, reduced) for p in self.combos])

    def correlation(self, reduced: G.Reduced) -> dict:
        """Pearson corr of accuracies and of ranks (reference
        ``nas_eval.py:200-233``)."""
        accs_ori = self.evaluate_ori()
        accs_syn = self.evaluate_syn(reduced)
        rank_ori = np.argsort(np.argsort(accs_ori))
        rank_syn = np.argsort(np.argsort(accs_syn))
        out = {
            "pearson_acc": pearson(accs_ori, accs_syn),
            "pearson_rank": pearson(rank_ori.astype(float),
                                    rank_syn.astype(float)),
            "best_ori": self.combos[int(np.argmax(accs_ori))],
            "best_syn": self.combos[int(np.argmax(accs_syn))],
        }
        log.info("NAS correlation: %s", out)
        return out
