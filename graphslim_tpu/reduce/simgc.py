"""SimGC — training-free condensation via teacher inversion + alignment.

Re-design of reference ``graphslim/condensation/simgc.py:10-143``:

1. Train an SGC teacher on the real graph (dataset-dependent depth,
   ``simgc.py:29-50`` — mirrored here as explicit derived configs instead
   of the reference's mutate-and-restore of the shared args object).
2. Precompute per-class mean/std of the k-hop aggregated-feature
   concatenation on the real train nodes.
3. Optimize (feat_syn, PGE) against: teacher NLL on the synthetic graph
   (inversion), class mean/std alignment (×feat_alpha), and feature
   smoothness over generated edges (×smoothness_alpha); alternating
   updates on the it%50<10 schedule.  The whole epoch is one jitted step.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphslim_tpu import graph as G
from graphslim_tpu import models as M
from graphslim_tpu.reduce.cond_base import CondensationBase
from graphslim_tpu.utils import nll_loss

log = logging.getLogger("graphslim_tpu")


class SimGC(CondensationBase):
    def _train_teacher(self, data, verbose):
        args = self.args
        # reference branches on name ("cora"/"citeseer" → shallow clean
        # teacher, else the reddit-style deep BN teacher,
        # simgc.py:29-50); synthetic twins follow the SIZE class they
        # mimic (a 900-node twin belongs with cora/citeseer, not with
        # the deep-BN large-graph teacher)
        if (data.name in ("cora", "citeseer")
                or (data.name.startswith("synth")
                    and data.n_nodes <= 5000)):
            cfg = M.ModelConfig(nfeat=self.d, nhid=args.hidden,
                                nclass=data.nclass, nlayers=args.nlayers,
                                dropout=0.0, ntrans=2)
            iters = min(10000, max(args.eval_epochs * 4, 400))
            lr = args.lr_teacher
        else:
            cfg = M.ModelConfig(nfeat=self.d, nhid=args.hidden,
                                nclass=data.nclass, nlayers=3,
                                dropout=0.5, ntrans=2, with_bn=True)
            iters = min(1000, max(args.eval_epochs * 2, 200))
            lr = args.lr_teacher
        teacher = M.get_model("SGC", cfg)
        norm = self.adj_norm_fast
        if data.setting == "ind":
            train = (self.features, norm, self.labels_real, None)
            val = (data.feat_val, G.gcn_norm(data.adj_val),
                   data.labels_val, None)
        else:
            tr_idx = jnp.asarray(data.idx_train)
            v_idx = jnp.asarray(data.idx_val)
            train = (self.features, norm, data.labels[tr_idx], tr_idx)
            val = (self.features, norm, data.labels[v_idx], v_idx)
        params, best_val, _ = M.fit_with_val(
            teacher, jax.random.key(self.args.seed), train=train, val=val,
            cfg=M.TrainConfig(epochs=iters, lr=lr, weight_decay=5e-4,
                              metric=self.args.metric))
        log.info("SimGC teacher val acc %.4f", float(best_val))
        return teacher, params

    def _concat_stats(self, data):
        """Per-class mean/std of [X, ÂX, Â²X, ...] over train rows
        (reference ``simgc.py:56-76``)."""
        args = self.args
        norm = self.adj_norm_fast
        feats = [self.features]
        tmp = self.features
        for _ in range(args.nlayers):
            tmp = norm.matmul(tmp)
            feats.append(tmp)
        cat = jnp.concatenate(feats, axis=1)
        if data.setting != "ind":
            cat = jnp.take(cat, jnp.asarray(data.idx_train), axis=0)
            labels = np.asarray(data.labels)[data.idx_train]
        else:
            labels = np.asarray(self.labels_real)
        means, stds, coeffs = [], [], []
        max_b = max(self.budgets.values())
        for c in self.classes:
            rows = np.asarray(cat)[labels == c]
            means.append(rows.mean(0))
            stds.append(rows.std(0, ddof=1) if rows.shape[0] > 1
                        else np.zeros(rows.shape[1]))
            coeffs.append(self.budgets[c] / max_b)
        return (jnp.asarray(np.stack(means)), jnp.asarray(np.stack(stds)),
                jnp.asarray(coeffs, dtype=jnp.float32))

    def _build_step(self, teacher, t_params, stats, update_pge: bool):
        args = self.args
        means, stds, coeffs = stats
        coeff_sum = float(np.asarray(coeffs).sum())
        masks = self.class_masks  # [C, n_syn]
        counts = jnp.asarray([self.budgets[c] for c in self.classes],
                             dtype=jnp.float32)

        def step(feat_syn, pge_params, opt_f, opt_p):
            def objective(fs, pp):
                adj = self.pge.apply(pp, fs)
                adj = jnp.where(adj < args.threshold, 0.0, adj)
                w_sum = jnp.maximum(adj.sum(), 1e-12)
                # smoothness: exp(-(xi - xj)^2/2) weighted by edge mass;
                # row-blocked so the [n, n, d] difference tensor never
                # materializes at arxiv-scale n_syn
                blk = 128
                pad = (-self.n_syn) % blk
                fs_p = jnp.concatenate(
                    [fs, jnp.zeros((pad, fs.shape[1]), fs.dtype)]) \
                    if pad else fs
                adj_p = jnp.pad(adj, ((0, pad), (0, 0))) if pad else adj

                def row_block(args_):
                    fr, ar = args_
                    diff = fr[:, None, :] - fs[None, :, :]
                    sim = jnp.exp(-0.5 * diff ** 2).mean(-1)
                    return jnp.sum(ar * sim)

                sums = jax.lax.map(
                    jax.checkpoint(row_block),
                    (fs_p.reshape(-1, blk, fs.shape[1]),
                     adj_p.reshape(-1, blk, adj.shape[1])))
                smooth = jnp.sum(sums) / w_sum

                adj_norm = G.normalize_adj_dense(adj)
                # k-hop concat of the synthetic graph (hops detached,
                # reference simgc.py:99-105)
                feats = [fs]
                tmp = fs
                for _ in range(args.nlayers):
                    tmp = jax.lax.stop_gradient(adj_norm @ tmp)
                    feats.append(tmp)
                cat_syn = jnp.concatenate(feats, axis=1)

                out = teacher.apply(t_params, fs, adj_norm)
                hard = nll_loss(out, self.labels_syn)

                m = masks.astype(cat_syn.dtype)          # [C, n]
                cnt = jnp.maximum(counts, 1.0)[:, None]
                mean_syn = (m @ cat_syn) / cnt
                ex2 = (m @ (cat_syn ** 2)) / cnt
                var = jnp.maximum(
                    (ex2 - mean_syn ** 2) * cnt / jnp.maximum(cnt - 1, 1.0),
                    0.0)
                std_syn = jnp.sqrt(var)
                mean_l = jnp.mean((means - mean_syn) ** 2, axis=1)
                std_l = jnp.mean((stds - std_syn) ** 2, axis=1)
                std_l = jnp.where(counts > 1, std_l, 0.0)
                align = jnp.sum(coeffs * (mean_l + std_l)) / coeff_sum

                return (hard + args.feat_alpha * align
                        + args.smoothness_alpha * smooth)

            loss, (g_f, g_p) = jax.value_and_grad(
                objective, argnums=(0, 1))(feat_syn, pge_params)
            if update_pge:
                upd, opt_p = self.opt_pge.update(g_p, opt_p, pge_params)
                pge_params = optax.apply_updates(pge_params, upd)
            else:
                upd, opt_f = self.opt_feat.update(g_f, opt_f, feat_syn)
                feat_syn = optax.apply_updates(feat_syn, upd)
            return feat_syn, pge_params, opt_f, opt_p, loss

        return jax.jit(step)

    def _reduce(self, data: G.Dataset, verbose: bool) -> G.Reduced:
        args = self.args
        teacher, t_params = self._train_teacher(data, verbose)
        stats = self._concat_stats(data)
        key = jax.random.key(args.seed)
        k1, k2 = jax.random.split(key)
        feat_syn = jax.random.normal(k1, (self.n_syn, self.d)) * 0.1
        pge_params = self.pge.init(k2)
        opt_f = self.opt_feat.init(feat_syn)
        opt_p = self.opt_pge.init(pge_params)
        steps = {}
        best_val = 0.0
        self._best_reduced = None
        for it in range(args.epochs + 1):
            update_pge = (it % 50) < 10
            if update_pge not in steps:
                steps[update_pge] = self._build_step(
                    teacher, t_params, stats, update_pge)
            feat_syn, pge_params, opt_f, opt_p, loss = steps[update_pge](
                feat_syn, pge_params, opt_f, opt_p)
            if it in args.checkpoints:
                adj = self.pge.inference(pge_params, feat_syn)
                adj = jnp.where(adj < args.threshold, 0.0, adj)
                best_val = self.intermediate_evaluation(
                    feat_syn, adj, best_val, it, float(loss), verbose)
        if self._best_reduced is not None:
            return self._best_reduced
        adj = self.pge.inference(pge_params, feat_syn)
        adj = jnp.where(adj < args.threshold, 0.0, adj)
        return G.Reduced(feat=jax.lax.stop_gradient(feat_syn), adj=adj,
                         labels=self.labels_syn)
