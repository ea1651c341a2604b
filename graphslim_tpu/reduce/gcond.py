"""GCond / DosCond / GCondX / DosCondX — gradient-matching condensation.

Re-designs of reference ``graphslim/condensation/{gcond,doscond,gcondx,
doscondx}.py`` on the :class:`CondensationBase` engine.  Each epoch —
model re-init, outer loop of (PGE → match loss → alternating updates),
inner model training — is ONE jitted program; the Python level only walks
epochs and checkpoints.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import optax

from graphslim_tpu import graph as G
from graphslim_tpu.reduce.cond_base import CondensationBase, masked_nll
from graphslim_tpu.utils import nll_loss

log = logging.getLogger("graphslim_tpu")


def _maybe_update(flag, opt, grads, state, params):
    """Conditionally apply an optax update (used for traced alternation)."""
    updates, new_state = opt.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    sel = lambda new, old: jax.tree.map(
        lambda a, b: jnp.where(flag, a, b), new, old)
    return sel(new_params, params), sel(new_state, state)


class GCond(CondensationBase):
    """Nested-loop gradient matching (reference ``gcond.py:17-81``)."""

    alternation = "epoch"   # it % 50 < 10 → pge step else feat step

    def _build_epoch_fn(self, update_pge: bool):
        args = self.args
        outer_loop, inner_loop = args.outer_loop, args.inner_loop
        struct = self.with_structure

        def epoch(key, feat_syn, pge_params, opt_f, opt_p, real):
            km, ko = jax.random.split(key)
            model_params = self.model.init(km)
            m_opt = self.opt_model.init(model_params)

            def outer(carry, per_iter):
                feat_syn, pge_params, opt_f, opt_p, mp, mo = carry
                k_ol, ol_idx = per_iter

                def objective(fs, pp):
                    adj_norm, aux = self.generator_forward(pp, fs)
                    return self.match_loss_total(mp, fs, adj_norm,
                                                 k_ol, real) + aux

                loss, (g_f, g_p) = jax.value_and_grad(
                    objective, argnums=(0, 1))(feat_syn, pge_params)

                if self.alternation == "epoch":
                    if update_pge and struct:
                        pge_params, opt_p = _maybe_update(
                            True, self.opt_pge, g_p, opt_p, pge_params)
                    else:
                        feat_syn, opt_f = _maybe_update(
                            True, self.opt_feat, g_f, opt_f, feat_syn)
                elif self.alternation == "outer":  # GCondX: ol % 5 >= 1
                    do_feat = (ol_idx % 5) >= 1
                    feat_syn, opt_f = _maybe_update(
                        do_feat, self.opt_feat, g_f, opt_f, feat_syn)
                else:  # 'both' — DosCond steps both every iteration
                    if struct:
                        pge_params, opt_p = _maybe_update(
                            True, self.opt_pge, g_p, opt_p, pge_params)
                    feat_syn, opt_f = _maybe_update(
                        True, self.opt_feat, g_f, opt_f, feat_syn)

                # Inner loop: train the matching model on the detached
                # synthetic graph (reference gcond.py:63-72).
                if inner_loop > 0:
                    fs_d = jax.lax.stop_gradient(feat_syn)
                    adj_inner = self.inner_adj(pge_params, fs_d) \
                        if struct else self.syn_adj_norm(None, fs_d)

                    def inner(c, _):
                        mp, mo = c

                        def inner_loss(p):
                            out = self.model.apply(p, fs_d, adj_inner)
                            return nll_loss(out, self.labels_syn)

                        g = jax.grad(inner_loss)(mp)
                        upd, mo = self.opt_model.update(g, mo, mp)
                        return (optax.apply_updates(mp, upd), mo), None

                    (mp, mo), _ = jax.lax.scan(inner, (mp, mo), None,
                                               length=inner_loop)

                return (feat_syn, pge_params, opt_f, opt_p, mp, mo), loss

            keys = jax.random.split(ko, outer_loop)
            carry0 = (feat_syn, pge_params, opt_f, opt_p, model_params,
                      m_opt)
            carry, losses = jax.lax.scan(
                outer, carry0, (keys, jnp.arange(outer_loop)))
            feat_syn, pge_params, opt_f, opt_p = carry[:4]
            return feat_syn, pge_params, opt_f, opt_p, jnp.sum(losses)

        return jax.jit(epoch)

    def _state_ckpt_path(self) -> str:
        import os
        args = self.args
        return os.path.join(
            args.save_path, "train_state", args.method,
            f"{self.data.name}_{args.reduction_rate}_{args.seed}.npz")

    def _reduce(self, data: G.Dataset, verbose: bool) -> G.Reduced:
        from graphslim_tpu.checkpoint import load_state, save_state

        args = self.args
        key = jax.random.key(args.seed)
        key, kp = jax.random.split(key)
        feat_syn = self.init_feat_syn(verbose)
        pge_params = self.pge.init(kp) if self.with_structure else {}
        opt_f = self.opt_feat.init(feat_syn)
        opt_p = self.opt_pge.init(pge_params) if self.with_structure \
            else None

        start_epoch = 0
        if args.resume:
            state, start_epoch = load_state(
                self._state_ckpt_path(),
                (feat_syn, pge_params, opt_f, opt_p))
            if state is not None:
                feat_syn, pge_params, opt_f, opt_p = state
                log.info("resumed %s from epoch %d", args.method,
                         start_epoch)

        fns = {}
        best_val, loss_avg = 0.0, 0.0
        self._best_reduced = None
        denom = max(self.nclass * args.outer_loop, 1)
        for it in range(start_epoch, args.epochs):
            update_pge = (it % 50) < 10
            if update_pge not in fns:
                fns[update_pge] = self._build_epoch_fn(update_pge)
            key, ke = jax.random.split(key)
            feat_syn, pge_params, opt_f, opt_p, loss_sum = fns[update_pge](
                ke, feat_syn, pge_params, opt_f, opt_p, self.real)
            if it in args.checkpoints:
                # device->host readback only at checkpoints: on the
                # tunneled backend a per-epoch float() costs more than
                # the epoch itself (docs/PERF.md remote-backend rules)
                loss_avg = float(loss_sum) / denom
                adj_syn = self.inference_adj(pge_params, feat_syn)
                best_val = self.intermediate_evaluation(
                    feat_syn, adj_syn, best_val, it, loss_avg, verbose)
                save_state(self._state_ckpt_path(),
                           (feat_syn, pge_params, opt_f, opt_p), it + 1)
        if self._best_reduced is not None:
            return self._best_reduced
        adj_syn = self.inference_adj(pge_params, feat_syn)
        return G.Reduced(feat=jax.lax.stop_gradient(feat_syn),
                         adj=adj_syn, labels=self.labels_syn)


class DosCond(GCond):
    """One-step variant: both optimizers step every outer iteration, no
    inner model training (reference ``doscond.py:17-68``)."""

    alternation = "both"

    def __init__(self, data, args):
        super().__init__(data, args.replace(inner_loop=0))


class GCondX(GCond):
    """Structure-free GCond: identity adjacency, feat steps on 4/5 of
    outer iterations (reference ``gcondx.py:17-79`` — the ol%5<1 'pge'
    steps are no-ops without structure)."""

    with_structure = False
    alternation = "outer"


class DosCondX(GCond):
    """Structure-free one-step: feat optimizer only
    (reference ``doscondx.py:17-64``)."""

    with_structure = False
    alternation = "both"

    def __init__(self, data, args):
        super().__init__(data, args.replace(inner_loop=0))
