"""SFGC — structure-free condensation via training-trajectory matching.

Re-design of reference ``graphslim/condensation/sfgc.py``:

* **Stage 1** (expert buffer): the reference trains 20 GCN experts in a
  Python loop and pickles snapshots (``sfgc.py:39-89``); here expert
  training is a ``vmap`` over init keys of a jitted ``lax.scan`` — all
  experts train simultaneously on the MXU, snapshotting flat parameters
  every 10 epochs into one [E, S, P] array (disk-cached as npz;
  ``--no_buff`` skips regeneration).  NB: the reference accidentally
  continues each expert from the previous one's weights (its
  ``initialize()`` is commented out); we use the intended fresh init.
* **Stage 2** (alignment): the student unrolls ``syn_steps`` SGD steps
  from a sampled expert snapshot with a learnable ``syn_lr``
  (``ReparamModule`` analog = ``ravel_pytree`` + rematerialized
  differentiable ``lax.scan``), loss ‖θ_T−θ*‖²/‖θ_0−θ*‖²
  (``sfgc.py:154-173``).  First iteration uses the init-selected
  adjacency, then identity (structure-free).
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
from graphslim_tpu import models as M
from graphslim_tpu.reduce.cond_base import CondensationBase
from graphslim_tpu.utils import nll_loss

log = logging.getLogger("graphslim_tpu")


class SFGC(CondensationBase):
    with_structure = False
    init_with_adj = True

    def __init__(self, data, args):
        if args.init == "random":
            args = args.replace(init="kcenter")
        args = args.replace(condense_model="GCN")
        super().__init__(data, args)
        self.buf_path = os.path.join(
            args.save_path, "sfgc_buffer",
            f"{data.name}_{args.attack}_{args.ptb_r}_{args.seed}.npz")
        cfg = M.ModelConfig(nfeat=self.d, nhid=args.hidden,
                            nclass=data.nclass, nlayers=args.nlayers,
                            dropout=0.0)
        self.expert_model = M.get_model("GCN", cfg)
        p0 = self.expert_model.init(jax.random.key(0))
        flat, unravel = ravel_pytree(p0)
        self.n_params = flat.shape[0]
        self.unravel = unravel

    # -- stage 1 --------------------------------------------------------
    def build_buffer(self, data: G.Dataset, verbose: bool) -> np.ndarray:
        """[n_experts, n_snaps, P] expert trajectories (vmapped)."""
        args = self.args
        if os.path.exists(self.buf_path):
            return np.load(self.buf_path)["traj"]
        if args.no_buff:
            raise FileNotFoundError(
                f"--no_buff set but no buffer at {self.buf_path}")
        model = self.expert_model
        feat, adj_fast = self.features, self.adj_norm_fast
        if data.setting == "ind":
            y, idx = self.labels_real, None
        else:
            idx = jnp.asarray(data.idx_train)
            y = jnp.take(data.labels, idx)
        if args.optim == "Adam":
            opt = optax.chain(optax.add_decayed_weights(args.wd_teacher),
                              optax.adam(args.lr_teacher))
        else:
            opt = optax.chain(
                optax.add_decayed_weights(args.wd_teacher),
                optax.sgd(args.lr_teacher, momentum=args.mom_teacher))
        epochs = args.teacher_epochs
        n_snap = epochs // 10 + 1

        def train_expert(key):
            params = model.init(key)
            state = opt.init(params)
            flat0, _ = ravel_pytree(params)

            def epoch(carry, e):
                params, state = carry

                def loss_of(p):
                    out = model.apply(p, feat, adj_fast)
                    if idx is not None:
                        out = jnp.take(out, idx, axis=0)
                    return nll_loss(out, y)

                g = jax.grad(loss_of)(params)
                upd, state = opt.update(g, state, params)
                params = optax.apply_updates(params, upd)
                flat, _ = ravel_pytree(params)
                return (params, state), flat

            (_, _), flats = jax.lax.scan(epoch, (params, state),
                                         jnp.arange(epochs))
            # snapshot at init and every 10th epoch (e % 10 == 0, e > 1 →
            # epochs 10, 20, ... in reference indexing)
            snaps = jnp.concatenate(
                [flat0[None], flats[9::10]], axis=0)
            return snaps

        keys = jax.random.split(jax.random.key(args.seed),
                                args.num_experts)
        traj = np.asarray(jax.jit(jax.vmap(train_expert))(keys))
        assert traj.shape[1] >= n_snap - 1
        os.makedirs(os.path.dirname(self.buf_path), exist_ok=True)
        np.savez_compressed(self.buf_path, traj=traj)
        log.info("sfgc buffer built: %s %s", self.buf_path, traj.shape)
        return traj

    # -- stage 2 --------------------------------------------------------
    def _build_align_step(self, adj_kind: str, adj_syn_norm):
        args = self.args
        model = self.expert_model
        unravel = self.unravel
        n_params = float(self.n_params)

        def step(feat_syn, syn_lr, opt_f_state, opt_lr_state,
                 start_params, target_params):
            def loss_of(fs, lr):
                def unroll(theta, _):
                    def inner(th):
                        out = model.apply(unravel(th), fs, adj_syn_norm)
                        return nll_loss(out, self.labels_syn)

                    g = jax.grad(inner)(theta)
                    return theta - lr * g, None

                theta_T, _ = jax.lax.scan(
                    jax.checkpoint(unroll), start_params, None,
                    length=args.syn_steps)
                num = jnp.sum((theta_T - target_params) ** 2)
                den = jnp.sum((start_params - target_params) ** 2)
                return (num / n_params) / jnp.maximum(
                    den / n_params, 1e-12)

            loss, (g_f, g_lr) = jax.value_and_grad(
                loss_of, argnums=(0, 1))(feat_syn, syn_lr)
            up_f, opt_f_state = self.opt_feat.update(g_f, opt_f_state,
                                                     feat_syn)
            feat_syn = optax.apply_updates(feat_syn, up_f)
            up_l, opt_lr_state = self.opt_lr.update(g_lr, opt_lr_state,
                                                    syn_lr)
            syn_lr = optax.apply_updates(syn_lr, up_l)
            return feat_syn, syn_lr, opt_f_state, opt_lr_state, loss

        return jax.jit(step)

    def sample_start(self, rng: np.random.Generator) -> int:
        args = self.args
        start_grid = np.linspace(0, args.start_epoch,
                                 num=args.start_epoch // 10 + 1)
        s = int(rng.choice(start_grid))
        if args.optim == "Adam":
            s //= 10
        return s

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
        adj_init = init_red.adj

        syn_lr = jnp.float32(args.lr_student)
        self.opt_lr = optax.sgd(1e-6, momentum=0.5)
        opt_f = self.opt_feat.init(feat_syn)
        opt_l = self.opt_lr.init(syn_lr)

        eye_norm = G.normalize_adj_dense(jnp.eye(self.n_syn),
                                         add_loops=False)
        if adj_init is not None and self.init_with_adj:
            first_adj = G.gcn_norm(adj_init).to_dense() \
                if isinstance(adj_init, G.SparseAdj) else \
                G.normalize_adj_dense(jnp.asarray(adj_init))
        else:
            first_adj = eye_norm
        step_first = self._build_align_step("init", first_adj)
        step_eye = self._build_align_step("eye", eye_norm)

        best_val = 0.0
        self._best_reduced = None
        max_snap_gap = args.expert_epochs // 10
        for it in range(args.epochs):
            e = int(rng.integers(n_exp))
            s = self.sample_start(rng)
            s = min(s, n_snap - 2)  # target must be a later snapshot
            t = min(s + max_snap_gap, n_snap - 1)
            start_p = jnp.asarray(traj[e, s])
            target_p = jnp.asarray(traj[e, t])
            step = step_first if it == 0 else step_eye
            feat_syn, syn_lr, opt_f, opt_l, loss = step(
                feat_syn, syn_lr, opt_f, opt_l, start_p, target_p)
            if not np.isfinite(float(loss)):
                log.warning("sfgc loss NaN at it=%d; stopping", it)
                break
            if it in args.checkpoints:
                best_val = self.intermediate_evaluation(
                    feat_syn, None, best_val, it, float(loss), verbose)
        if self._best_reduced is not None:
            return self._best_reduced
        return G.Reduced(feat=jax.lax.stop_gradient(feat_syn), adj=None,
                         labels=self.labels_syn)
