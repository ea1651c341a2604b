"""GCSNTK — kernel ridge regression condensation with the SNTK.

Re-design of reference ``graphslim/condensation/gcsntk.py:19-163``:
``(x_s, y_s)`` (features + SOFT labels) are optimized directly against the
MSE of KRR predictions on real train nodes.  Small datasets use the full
train subgraph; large ones use KMeans feature-partitioned batches — the
reference's ``LargeDataLoader`` (``dataset/loader.py:232-372``)
re-designed as an on-device partition.  The whole epoch is jitted.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphslim_tpu import graph as G
from graphslim_tpu.kernels.kmeans import kmeans
from graphslim_tpu.models.sntk import SNTK, krr_forward
from graphslim_tpu.reduce.cond_base import CondensationBase

log = logging.getLogger("graphslim_tpu")

_LARGE_N = 20000
_BATCH = 3000


class GCSNTK(CondensationBase):
    with_structure = False

    def __init__(self, data, args):
        super().__init__(data, args)
        # GCSNTK sizes by round(n_train * r) with learnable soft labels
        n_train = len(data.idx_train) if data.setting != "ind" else \
            int(data.feat_train.shape[0])
        self.n_syn = max(round(n_train * args.reduction_rate),
                         data.nclass)
        self.sntk = SNTK(K=args.K, L=args.L, scale=args.scale)

    def _train_batches(self, data: G.Dataset):
        """[(x_t, y_t 1hot, E_t dense), ...] over the train split."""
        if data.setting == "ind":
            feat_tr = data.feat_train
            labels_tr = np.asarray(data.labels_train)
            adj_tr = data.adj_train
        else:
            feat_tr = jnp.take(data.feat, jnp.asarray(data.idx_train),
                               axis=0)
            labels_tr = np.asarray(data.labels)[data.idx_train]
            adj_tr = G.submatrix(data.adj, data.idx_train)
        n_tr = feat_tr.shape[0]
        dense = np.asarray(adj_tr.to_dense()) + np.eye(n_tr,
                                                       dtype=np.float32)
        onehot = np.eye(data.nclass, dtype=np.float32)[labels_tr]
        if n_tr <= _BATCH:
            return [(feat_tr, jnp.asarray(onehot), jnp.asarray(dense))]
        # KMeans partition (LargeDataLoader 'kmeans' split)
        k = -(-n_tr // _BATCH)
        _, assign = kmeans(jax.random.key(self.args.seed), feat_tr, k)
        assign = np.asarray(assign)
        batches = []
        for b in range(k):
            rows = np.flatnonzero(assign == b)
            if rows.size < 2:
                continue
            batches.append((
                jnp.take(feat_tr, jnp.asarray(rows), axis=0),
                jnp.asarray(onehot[rows]),
                jnp.asarray(dense[np.ix_(rows, rows)])))
        return batches

    def _reduce(self, data: G.Dataset, verbose: bool) -> G.Reduced:
        args = self.args
        batches = self._train_batches(data)
        key = jax.random.key(args.seed)
        k1, k2 = jax.random.split(key)
        x_s = jax.random.uniform(k1, (self.n_syn, self.d))
        y_s = jax.random.uniform(k2, (self.n_syn, data.nclass))
        E_s = jnp.eye(self.n_syn)
        opt = optax.adam(args.lr or 0.01)
        opt_state = opt.init((x_s, y_s))
        sntk = self.sntk
        ridge = float(args.ridge)

        @jax.jit
        def step(x_s, y_s, opt_state, x_t, y_t, E_t):
            def loss_of(xy):
                xs, ys = xy
                pred = krr_forward(sntk.nodes_gram, ridge, x_t, xs, ys,
                                   E_t, E_s)
                return jnp.mean((pred - y_t) ** 2)

            loss, g = jax.value_and_grad(loss_of)((x_s, y_s))
            updates, opt_state = opt.update(g, opt_state, (x_s, y_s))
            x_s, y_s = optax.apply_updates((x_s, y_s), updates)
            return x_s, y_s, opt_state, loss

        best_val = 0.0
        self._best_reduced = None
        for it in range(args.epochs):
            for x_t, y_t, E_t in batches:
                x_s, y_s, opt_state, loss = step(x_s, y_s, opt_state,
                                                 x_t, y_t, E_t)
            if it in args.checkpoints:
                red = G.Reduced(feat=jax.lax.stop_gradient(x_s), adj=None,
                                labels=jax.lax.stop_gradient(y_s))
                best_val = self._ckpt_eval(red, best_val, it, float(loss),
                                           verbose)
        if self._best_reduced is not None:
            return self._best_reduced
        return G.Reduced(feat=jax.lax.stop_gradient(x_s), adj=None,
                         labels=jax.lax.stop_gradient(y_s))

    def _ckpt_eval(self, reduced, best_val, it, loss, verbose):
        """Checkpoint eval with soft labels (MSE eval loss)."""
        from graphslim_tpu import models as M
        from graphslim_tpu.eval import Evaluator

        args = self.args
        ev = Evaluator(self.data, args)
        model = ev._eval_model(args.eval_model, reduced.feat.shape[-1])
        tx, tadj, ty = ev._train_tuple(reduced, args.eval_model)
        val = ev._val_tuple(args.eval_model)
        accs = []
        for s in range(args.run_inter_eval):
            _, bv, _ = M.fit_with_val(
                model, jax.random.key(args.seed + s),
                train=(tx, tadj, ty, None), val=val,
                cfg=M.TrainConfig(epochs=args.eval_epochs,
                                  lr=args.lr or 0.01, weight_decay=5e-4,
                                  metric=args.metric, loss="soft"))
            accs.append(float(bv))
        mean_val = float(np.mean(accs))
        log.info("gcsntk ckpt it=%d loss=%.4f val=%.4f", it, loss,
                 mean_val)
        if mean_val > best_val:
            best_val = mean_val
            from graphslim_tpu.data import save_reduced
            save_reduced(reduced, args.save_path, args.method,
                         self.data.name, args.reduction_rate, args.seed)
            self._best_reduced = reduced
        return best_val
