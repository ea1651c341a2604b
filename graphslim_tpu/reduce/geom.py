"""GEOM — curriculum trajectory matching with soft labels.

Re-design of reference ``graphslim/condensation/geom.py`` on top of the
SFGC machinery:

* **Curriculum buffer** (``buffer_cl``): experts train on an expanding
  easy→hard prefix of the train set, ordered by neighbor-label entropy
  (``condensation/utils.py:305-422``) under the linear/root/geom
  scheduler; the per-epoch subset is a mask inside the jitted scan, so the
  whole curriculum run stays one compiled program per expert (vmapped).
* **Alignment**: expanding start-epoch window ``[min_start,
  min(max_start_s + it, max_start))``; target = the fixed
  ``expert_epochs//10`` snapshot; loss = ‖θ_T−θ*‖/‖θ_0−θ*‖ (L2, not MSE);
  optional β·KL(final-expert output ‖ soft labels).
* **Soft labels**: initialized from the first expert's final logits with
  the true-class correction (``geom.py:60-82``), optimized with
  SGD(lr_y, momentum .9); student loss becomes log-target KL.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

from graphslim_tpu import graph as G
from graphslim_tpu.reduce.sfgc import SFGC
from graphslim_tpu.utils import nll_loss

log = logging.getLogger("graphslim_tpu")


def kl_log_target(log_input: jax.Array, log_target: jax.Array
                  ) -> jax.Array:
    """torch.nn.KLDivLoss(reduction='batchmean', log_target=True)."""
    return jnp.sum(jnp.exp(log_target) * (log_target - log_input)) \
        / log_input.shape[0]


def training_scheduler(lam: float, t, T: float, scheduler: str):
    """Expanding-subset schedule (reference
    ``condensation/utils.py:425-455``); jittable in ``t``."""
    if scheduler == "linear":
        return jnp.minimum(1.0, lam + (1 - lam) * t / T)
    if scheduler == "root":
        return jnp.minimum(1.0, jnp.sqrt(lam ** 2 + (1 - lam ** 2) * t / T))
    return jnp.minimum(1.0, 2.0 ** (np.log2(lam) - np.log2(lam) * t / T))


class GEOM(SFGC):
    def __init__(self, data, args):
        super().__init__(data, args)
        self.buf_path = os.path.join(
            args.save_path, "geom_buffer",
            f"{data.name}_{args.attack}_{args.ptb_r}_{args.seed}.npz")

    # -- curriculum difficulty -----------------------------------------
    def _sorted_train(self, data: G.Dataset) -> np.ndarray:
        """Train rows sorted easiest→hardest by neighbor-label entropy."""
        adj = self.adj_norm_full
        labels = np.asarray(self.labels_real)
        row = np.asarray(adj.row)
        col = np.asarray(adj.col)
        C = self.nclass
        n = adj.n_rows
        hist = np.zeros((n, C))
        np.add.at(hist, (row, labels[col]), 1.0)
        hist /= np.maximum(hist.sum(1, keepdims=True), 1e-12)
        entropy = -(hist * np.log(hist + np.exp(-20.0))).sum(1)
        if self.data.setting == "ind":
            order = np.argsort(entropy, kind="stable")
            return order
        tr = np.asarray(self.data.idx_train)
        order = np.argsort(entropy[tr], kind="stable")
        return tr[order]

    # -- stage 1: curriculum buffer ------------------------------------
    def build_buffer(self, data: G.Dataset, verbose: bool) -> np.ndarray:
        args = self.args
        if os.path.exists(self.buf_path):
            return np.load(self.buf_path)["traj"]
        if args.no_buff:
            raise FileNotFoundError(
                f"--no_buff set but no buffer at {self.buf_path}")
        model = self.expert_model
        feat, adj_fast = self.features, self.adj_norm_fast
        sorted_train = self._sorted_train(data)
        n_tr = sorted_train.shape[0]
        sorted_train_j = jnp.asarray(sorted_train)
        y_sorted = jnp.take(jnp.asarray(np.asarray(self.labels_real)),
                            sorted_train_j)
        if args.optim == "Adam":
            opt = optax.chain(optax.add_decayed_weights(args.wd_teacher),
                              optax.adam(args.lr_teacher))
        else:
            opt = optax.chain(
                optax.add_decayed_weights(args.wd_teacher),
                optax.sgd(args.lr_teacher, momentum=args.mom_teacher))
        epochs = args.teacher_epochs
        T = float(args.T)
        rank = jnp.arange(n_tr, dtype=jnp.float32)

        def train_expert(key):
            params = model.init(key)
            state = opt.init(params)
            flat0, _ = ravel_pytree(params)

            def epoch(carry, e):
                params, state = carry
                size = training_scheduler(args.lam, e.astype(jnp.float32),
                                          T, args.scheduler)
                mask = rank < jnp.floor(size * n_tr)

                def loss_of(p):
                    out = model.apply(p, feat, adj_fast)
                    out_tr = jnp.take(out, sorted_train_j, axis=0)
                    ll = jnp.take_along_axis(
                        out_tr, y_sorted[:, None], axis=-1)[:, 0]
                    m = mask.astype(ll.dtype)
                    return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)

                g = jax.grad(loss_of)(params)
                upd, state = opt.update(g, state, params)
                params = optax.apply_updates(params, upd)
                flat, _ = ravel_pytree(params)
                return (params, state), flat

            (_, _), flats = jax.lax.scan(epoch, (params, state),
                                         jnp.arange(epochs + 1))
            return jnp.concatenate([flat0[None], flats[9::10]], axis=0)

        keys = jax.random.split(jax.random.key(args.seed),
                                args.num_experts)
        traj = np.asarray(jax.jit(jax.vmap(train_expert))(keys))
        os.makedirs(os.path.dirname(self.buf_path), exist_ok=True)
        np.savez_compressed(self.buf_path, traj=traj)
        return traj

    # -- stage 2 --------------------------------------------------------
    def _soft_label_init(self, traj, feat_syn, adj_norm):
        """First expert's final logits with true-class correction
        (reference ``geom.py:60-82``)."""
        final = jnp.asarray(traj[0, -1])
        out = self.expert_model.apply(self.unravel(final), feat_syn,
                                      adj_norm)
        hard = np.asarray(self.labels_syn)
        out_np = np.asarray(out).copy()
        pred = out_np.argmax(1)
        mx = out_np.max(1)
        wrong = pred != hard
        out_np[np.arange(len(hard))[wrong], hard[wrong]] = mx[wrong]
        return jnp.asarray(out_np)

    def _reduce(self, data: G.Dataset, verbose: bool) -> G.Reduced:
        args = self.args
        traj = self.build_buffer(data, verbose)
        n_exp, n_snap, _ = traj.shape
        rng = np.random.default_rng(args.seed)

        from graphslim_tpu.reduce.registry import create_reducer
        init_args = args.replace(method=args.init)
        init_red = create_reducer(
            args.init, self.data, init_args,
            labels_syn_override=np.asarray(self.labels_syn)).reduce(
                self.data, verbose=verbose)
        feat_syn = jnp.asarray(init_red.feat)
        eye_norm = G.normalize_adj_dense(jnp.eye(self.n_syn),
                                         add_loops=False)

        soft = bool(args.soft_label)
        if soft:
            y_soft = self._soft_label_init(traj, feat_syn, eye_norm)
            opt_y = optax.sgd(args.lr_y, momentum=0.9)
            opt_y_state = opt_y.init(y_soft)
        else:
            y_soft, opt_y, opt_y_state = None, None, None

        syn_lr = jnp.float32(args.lr_student)
        self.opt_lr = optax.sgd(1e-6, momentum=0.5)
        opt_f = self.opt_feat.init(feat_syn)
        opt_l = self.opt_lr.init(syn_lr)
        model = self.expert_model
        unravel = self.unravel
        hard_labels = self.labels_syn
        beta = float(args.beta)

        def step(feat_syn, y_soft, syn_lr, opt_f, opt_y_state, opt_l,
                 start_p, target_p, clom_p):
            def loss_of(fs, ys, lr):
                def unroll(theta, _):
                    def inner(th):
                        out = model.apply(unravel(th), fs, eye_norm)
                        if soft:
                            return kl_log_target(out, ys)
                        return nll_loss(out, hard_labels)

                    g = jax.grad(inner)(theta)
                    return theta - lr * g, None

                theta_T, _ = jax.lax.scan(jax.checkpoint(unroll), start_p,
                                          None, length=args.syn_steps)
                grand = jnp.linalg.norm(theta_T - target_p) / jnp.maximum(
                    jnp.linalg.norm(start_p - target_p), 1e-12)
                if beta > 0:
                    out_clom = model.apply(unravel(clom_p), fs, eye_norm)
                    if soft:
                        grand = grand + beta * kl_log_target(out_clom, ys)
                    else:
                        grand = grand + beta * nll_loss(out_clom,
                                                        hard_labels)
                return grand

            if soft:
                loss, (g_f, g_y, g_lr) = jax.value_and_grad(
                    loss_of, argnums=(0, 1, 2))(feat_syn, y_soft, syn_lr)
                up_y, opt_y_state = opt_y.update(g_y, opt_y_state, y_soft)
                y_soft = optax.apply_updates(y_soft, up_y)
            else:
                loss, (g_f, g_lr) = jax.value_and_grad(
                    loss_of, argnums=(0, 2))(feat_syn, y_soft, syn_lr)
            up_f, opt_f = self.opt_feat.update(g_f, opt_f, feat_syn)
            feat_syn = optax.apply_updates(feat_syn, up_f)
            if args.optim_lr:
                up_l, opt_l = self.opt_lr.update(g_lr, opt_l, syn_lr)
                syn_lr = optax.apply_updates(syn_lr, up_l)
            return feat_syn, y_soft, syn_lr, opt_f, opt_y_state, opt_l, \
                loss

        step = jax.jit(step)
        target_idx = min(args.expert_epochs // 10, n_snap - 1)
        best_val = 0.0
        self._best_reduced = None
        for it in range(args.epochs):
            e = int(rng.integers(n_exp))
            upper = max(min(args.max_start_epoch_s + it,
                            args.max_start_epoch), args.min_start_epoch
                        + 1)
            s_ep = int(rng.integers(args.min_start_epoch, upper))
            s = min(s_ep // 10 if args.optim == "Adam" else s_ep,
                    n_snap - 1)
            if s == target_idx:
                s = max(target_idx - 1, 0)
            start_p = jnp.asarray(traj[e, s])
            target_p = jnp.asarray(traj[e, target_idx])
            clom_p = jnp.asarray(traj[e, -1])
            feat_syn, y_soft, syn_lr, opt_f, opt_y_state, opt_l, loss = \
                step(feat_syn, y_soft, syn_lr, opt_f, opt_y_state, opt_l,
                     start_p, target_p, clom_p)
            if not np.isfinite(float(loss)):
                log.warning("geom loss NaN at it=%d; stopping", it)
                break
            if it in args.checkpoints:
                # artifacts carry probability-space soft labels (the KL
                # optimization itself runs in log space)
                labels_out = jax.nn.softmax(
                    jax.lax.stop_gradient(y_soft), axis=-1) if soft \
                    else self.labels_syn
                red = G.Reduced(feat=jax.lax.stop_gradient(feat_syn),
                                adj=None, labels=labels_out)
                best_val = self._geom_ckpt(red, best_val, it, float(loss),
                                           verbose)
        if self._best_reduced is not None:
            return self._best_reduced
        labels_out = jax.nn.softmax(
            jax.lax.stop_gradient(y_soft), axis=-1) if soft else \
            self.labels_syn
        return G.Reduced(feat=jax.lax.stop_gradient(feat_syn), adj=None,
                         labels=labels_out)

    def _geom_ckpt(self, reduced, best_val, it, loss, verbose):
        from graphslim_tpu import models as M
        from graphslim_tpu.eval import Evaluator
        from graphslim_tpu.data import save_reduced

        args = self.args
        ev = Evaluator(self.data, args)
        model = ev._eval_model(args.eval_model, reduced.feat.shape[-1])
        tx, tadj, ty = ev._train_tuple(reduced, args.eval_model)
        val = ev._val_tuple(args.eval_model)
        loss_kind = "soft" if (hasattr(ty, "ndim") and ty.ndim == 2) \
            else "nll"
        accs = []
        for s in range(args.run_inter_eval):
            _, bv, _ = M.fit_with_val(
                model, jax.random.key(args.seed + s),
                train=(tx, tadj, ty, None), val=val,
                cfg=M.TrainConfig(epochs=args.eval_epochs,
                                  lr=args.lr or 0.01, weight_decay=5e-4,
                                  metric=args.metric, loss=loss_kind))
            accs.append(float(bv))
        mean_val = float(np.mean(accs))
        log.info("geom ckpt it=%d loss=%.4f val=%.4f", it, loss, mean_val)
        if mean_val > best_val:
            best_val = mean_val
            save_reduced(reduced, args.save_path, args.method,
                         self.data.name, args.reduction_rate, args.seed)
            self._best_reduced = reduced
        return best_val
