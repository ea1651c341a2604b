"""Gradient-matching condensation engine (GCond family core).

TPU-native re-design of reference ``graphslim/condensation/gcond_base.py``
+ ``condensation/utils.py:12-106``:

* The reference's hottest loop — per-epoch Python iteration over
  outer×classes with CPU NeighborSampler round trips
  (``gcond_base.py:156-241``, SURVEY.md §3.1) — becomes ONE jitted
  ``epoch_step``: ``lax.scan`` over outer iterations, ``lax.scan`` over
  classes, on-device fixed-fanout sampling, nested ``jax.grad`` for the
  ``create_graph=True`` double backward (``gcond_base.py:234``).
* Model re-initialization per epoch happens inside jit from a fresh key.
* ``match_loss``/``distance_wb`` semantics preserved exactly, including
  the bias-gradient exclusion in the ``ours`` metric
  (``condensation/utils.py:102-104``: 1-D gradients contribute 0).
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphslim_tpu import graph as G
from graphslim_tpu import models as M
from graphslim_tpu import utils
from graphslim_tpu.data import save_reduced
from graphslim_tpu.kernels.sample import (BlockSample, PackedCsr,
                                          build_packed_csr,
                                          neighbor_sample_block)
from graphslim_tpu.models.pge import PGE, PGEConfig
from graphslim_tpu.reduce.base import Reducer, class_budgets

log = logging.getLogger("graphslim_tpu")


# ---------------------------------------------------------------------------
# match_loss (reference condensation/utils.py:12-106)
# ---------------------------------------------------------------------------

def _flat(tree):
    return jnp.concatenate([g.reshape(-1) for g in jax.tree.leaves(tree)])


def match_loss(gw_syn, gw_real, metric: str) -> jax.Array:
    if metric == "ours":
        dis = 0.0
        for gs, gr in zip(jax.tree.leaves(gw_syn),
                          jax.tree.leaves(gw_real)):
            if gs.ndim < 2:
                continue  # 1-D (bias) grads excluded, utils.py:102-104
            gs2 = gs.reshape(gs.shape[0], -1)
            gr2 = gr.reshape(gr.shape[0], -1)
            num = jnp.sum(gs2 * gr2, axis=-1)
            den = (jnp.linalg.norm(gs2, axis=-1) *
                   jnp.linalg.norm(gr2, axis=-1) + 1e-6)
            dis = dis + jnp.sum(1.0 - num / den)
        return dis
    gs, gr = _flat(gw_syn), _flat(gw_real)
    if metric == "mse":
        return jnp.sum((gs - gr) ** 2)
    if metric == "cos":
        return 1.0 - jnp.sum(gs * gr) / (
            jnp.linalg.norm(gs) * jnp.linalg.norm(gr) + 1e-6)
    raise ValueError(f"unknown dis_metric {metric!r}")


def fanouts_for(nlayers: int, dataset: str) -> list[int]:
    """Reference fanout policy (``dataset/loader.py:197-211``)."""
    if nlayers == 1:
        return [15]
    if nlayers == 2:
        return [15, 8] if dataset in ("reddit", "flickr") else [10, 5]
    return [15, 10, 5] + [5] * (nlayers - 3)


def masked_nll(log_probs: jax.Array, labels: jax.Array,
               mask: jax.Array) -> jax.Array:
    ll = jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    m = mask.astype(ll.dtype)
    return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

from typing import NamedTuple


class RealTensors(NamedTuple):
    """The large real-graph device arrays of the matching path, bundled so
    hot loops can thread them through ``jax.jit`` as ARGUMENTS.

    Closing over them instead (round-1 design) bakes them into the traced
    program as constants: at ogbn-arxiv scale that made the outer-step HLO
    hundreds of MB, inflated compile time ~10x on the remote-compile
    backend, and blew the persistent compile cache to ~370 MB.  Passing
    them as pytree args keeps programs small and cache entries in the MB
    range.  Engine methods accept ``real=None`` and fall back to
    ``self.real`` so eager/legacy callers are unaffected.
    """

    features: jax.Array      # [n, d] real node features
    labels_real: jax.Array   # [n] real labels
    pools: jax.Array         # [C, max_n] padded per-class train pools
    pool_counts: jax.Array   # [C]
    adj_off: G.SparseAdj     # normalized adjacency, diagonal removed
    self_vals: jax.Array     # [n] normalized self-loop values
    tables: PackedCsr        # precomputed sampler layout (kernels/sample)

class CondensationBase(Reducer):
    """Shared state for GCond/DosCond/±X/GCDM: budgets, syn params,
    sampler tables, optimizers, checkpoint evaluation."""

    save_output = False          # checkpoints handle persistence
    with_structure = True        # False → adj_syn = I (±X variants)
    sample_batch = 256           # reference NeighborSampler batch

    def __init__(self, data: G.Dataset, args):
        super().__init__(data, args)
        labels_pool = data.labels_for_reduction()
        self.budgets, labels_syn, self.class_ranges = class_budgets(
            labels_pool, args.reduction_rate, absorb_remainder=True)
        self.labels_syn = jnp.asarray(labels_syn)
        self.n_syn = int(labels_syn.shape[0])
        self.d = data.n_feat
        self.nclass = data.nclass

        # --- real-graph tensors (trans: full graph; ind: train subgraph,
        #     reference gcond.py:22-26) --------------------------------
        if data.setting == "ind":
            self.features, adj_raw, self.labels_real = (
                data.feat_train, data.adj_train, data.labels_train)
            pool_base = np.arange(len(data.idx_train))
            pool_labels = np.asarray(data.labels_train)
        else:
            self.features, adj_raw, self.labels_real = (
                data.feat, data.adj, data.labels)
            pool_base = np.asarray(data.idx_train)
            pool_labels = np.asarray(data.labels)[pool_base]

        # Normalized adjacency split into off-diagonal CSR + self values
        # for the on-device sampler.  Host mirrors avoid device readbacks
        # (SURVEY.md: the reference's GPU→scipy→GPU round trip analog).
        if data.setting != "ind":
            norm_host = data.adj_norm_host()
            norm = data.adj_norm()
        else:
            host = G.HostAdj(np.asarray(adj_raw.indptr),
                             np.asarray(adj_raw.row),
                             np.asarray(adj_raw.col),
                             None if adj_raw.val is None
                             else np.asarray(adj_raw.val))
            norm_host = G.host_gcn_norm(host)
            norm = norm_host.to_sparse()
        row, col = norm_host.row, norm_host.col
        val = norm_host.val
        diag = row == col
        self_vals = np.zeros(norm.n_rows, dtype=np.float32)
        self_vals[row[diag]] = val[diag]
        self.adj_off = G.from_edge_index(
            np.stack([row[~diag], col[~diag]]), norm.n_rows,
            edge_weight=val[~diag], dedup=False)
        self.self_vals = jnp.asarray(self_vals)
        # Precomputed sampler tables from the host COO — no device
        # readback, and no per-step in-jit layout build (~1.8 ms at
        # arxiv scale, benchmark/probe_step_phases.py).
        ro, co, vo = row[~diag], col[~diag], val[~diag]
        order = np.argsort(ro, kind="stable")
        indptr_off = np.zeros(norm.n_rows + 1, dtype=np.int64)
        np.cumsum(np.bincount(ro, minlength=norm.n_rows),
                  out=indptr_off[1:])
        self.sample_tables = build_packed_csr(
            indptr_off, co[order], vo[order], self_vals)
        self.adj_norm_full = norm
        from graphslim_tpu.kernels.ell import build_ell
        self.adj_norm_fast = build_ell(norm_host.indptr, norm_host.col,
                                       norm_host.val)  # scatter-free SpMM

        # --- per-class pools (padded) ---------------------------------
        classes = list(self.budgets.keys())
        classes.sort()
        self.classes = classes
        pools = [pool_base[pool_labels == c] for c in classes]
        self.pool_counts = jnp.asarray([len(p) for p in pools],
                                       dtype=jnp.int32)
        max_n = max(len(p) for p in pools)
        pool_pad = np.zeros((len(classes), max_n), dtype=np.int32)
        for i, p in enumerate(pools):
            pool_pad[i, :len(p)] = p
        self.pools = jnp.asarray(pool_pad)
        self.batch = int(min(self.sample_batch, max_n))
        self.real = RealTensors(
            features=self.features, labels_real=self.labels_real,
            pools=self.pools, pool_counts=self.pool_counts,
            adj_off=self.adj_off, self_vals=self.self_vals,
            tables=self.sample_tables)

        self._build_class_tables()

        # --- condense model + generators ------------------------------
        self.model = M.get_model(args.condense_model, M.ModelConfig(
            nfeat=self.d, nhid=args.hidden, nclass=data.nclass,
            nlayers=args.nlayers, dropout=0.0, alpha=args.alpha,
            ntrans=args.ntrans))
        self.fanouts = tuple(fanouts_for(args.nlayers, data.name))
        if self.with_structure:
            self.pge = PGE(PGEConfig.for_dataset(
                self.d, self.n_syn, data.name, args.reduction_rate))
        else:
            self.pge = None
        self.opt_feat = optax.adam(args.lr_feat)
        self.opt_pge = optax.adam(args.lr_adj)
        self.opt_model = optax.adam(args.lr or 0.01)

    def _build_class_tables(self):
        """Class masks over the synthetic-label vector used in matching
        (may be longer than n_syn, e.g. MSGC's batch-repeated labels)."""
        cls_arr = np.asarray(self.labels_syn)
        self.class_masks = jnp.asarray(
            np.stack([cls_arr == c for c in self.classes]))
        self.coeffs = jnp.asarray(
            [self.budgets[c] / self.n_syn for c in self.classes],
            dtype=jnp.float32)

    # ------------------------------------------------------------------
    def init_feat_syn(self, verbose: bool = False) -> jax.Array:
        """Initialize synthetic features by running the ``args.init``
        reducer (reference ``gcond_base.py:117-152``)."""
        from graphslim_tpu.reduce.registry import create_reducer

        init_args = self.args.replace(method=self.args.init)
        agent = create_reducer(self.args.init, self.data, init_args,
                               labels_syn_override=np.asarray(
                                   self.labels_syn))
        reduced = agent.reduce(self.data, verbose=verbose)
        feat = jnp.asarray(reduced.feat)
        assert feat.shape[0] == self.n_syn, (feat.shape, self.n_syn)
        return feat

    # ------------------------------------------------------------------
    # Jitted pieces
    # ------------------------------------------------------------------
    def _sample_class_block(self, key, class_idx, real=None):
        """Sample a padded B-target block for one class."""
        real = self.real if real is None else real
        pool = real.pools[class_idx]
        count = real.pool_counts[class_idx]
        B = self.batch
        from graphslim_tpu.kernels.sample import sampling_key
        k1, k2 = jax.random.split(sampling_key(key))
        slot = jnp.arange(B, dtype=jnp.int32)
        rand = jax.random.randint(k1, (B,), 0, jnp.maximum(count, 1))
        pos = jnp.where(count <= B, jnp.minimum(slot, count - 1), rand)
        targets = pool[pos]
        valid = (slot < count) | (count > B)
        block = neighbor_sample_block(
            k2, real.adj_off.indptr, real.adj_off.col,
            real.adj_off.values_or_ones(), real.self_vals, targets,
            self.fanouts, tables=real.tables)
        return block, targets, valid

    def _sample_all_class_blocks(self, key, real=None):
        """One flat fanout sample covering every class.

        Batching the per-class sampling into single gather ops (instead of
        a ``nclass``-iteration scan of small ops) removed ~8 ms from the
        44 ms arxiv outer step; the per-class structure is recovered by
        reshaping each block level to a leading class axis (children of a
        target occupy contiguous slots, so class segments stay contiguous).
        """
        real = self.real if real is None else real
        C, B = len(self.classes), self.batch
        from graphslim_tpu.kernels.sample import sampling_key
        k1, k2 = jax.random.split(sampling_key(key))
        counts = real.pool_counts
        slot = jnp.arange(B, dtype=jnp.int32)[None, :]
        rand = jax.random.randint(k1, (C, B), 0,
                                  jnp.maximum(counts, 1)[:, None])
        pos = jnp.where(counts[:, None] <= B,
                        jnp.minimum(slot, counts[:, None] - 1), rand)
        targets = jnp.take_along_axis(real.pools, pos, axis=1)   # [C, B]
        valid = (slot < counts[:, None]) | (counts[:, None] > B)
        block = neighbor_sample_block(
            k2, real.adj_off.indptr, real.adj_off.col,
            real.adj_off.values_or_ones(), real.self_vals,
            targets.reshape(-1), self.fanouts, tables=real.tables)
        ids = tuple(x.reshape(C, -1) for x in block.node_ids)
        ws = tuple(w.reshape(C, -1, w.shape[-1]) for w in block.weights)
        return ids, ws, targets, valid

    def _real_class_grad(self, model_params, key, class_idx, real=None):
        """Detached per-class real gradient from a sampled block."""
        real = self.real if real is None else real
        block, targets, valid = self._sample_class_block(key, class_idx,
                                                         real)
        feat_deep = jnp.take(real.features, block.node_ids[0], axis=0)
        y = jnp.take(real.labels_real, targets)

        def loss_of(p):
            out = self.model.apply(p, feat_deep, block)
            return masked_nll(out, y, valid)

        return jax.lax.stop_gradient(jax.grad(loss_of)(model_params))

    def _syn_class_grad(self, model_params, feat_syn, adj_syn_norm,
                        class_mask):
        """Per-class synthetic gradient (differentiable wrt feat/adj)."""
        def loss_of(p):
            out = self.model.apply(p, feat_syn, adj_syn_norm)
            return masked_nll(out, self.labels_syn, class_mask)

        return jax.grad(loss_of)(model_params)

    _sharded_match = None

    def enable_distributed(self, n_devices: Optional[int] = None,
                           axis: str = "data") -> None:
        """Shard the per-class gradient matching over a device mesh
        (classes partition across devices, scalar loss psums — see
        dist/matching.py).  Opt-in via ``--dist_devices N``."""
        from graphslim_tpu.dist import make_mesh
        from graphslim_tpu.dist.matching import build_sharded_match

        mesh = make_mesh(n_devices, axis=axis)
        self._sharded_match = build_sharded_match(self, mesh, axis=axis)
        log.info("distributed matching over %d devices",
                 mesh.shape[axis])

    def match_loss_total(self, model_params, feat_syn, adj_syn_norm, key,
                         real=None):
        """Σ_c coeff_c · match(gw_syn_c, gw_real_c) — scan over classes
        (reference ``train_class``, ``gcond_base.py:156-241``); when
        distributed matching is enabled, classes shard over the mesh.

        Pass ``real`` (``self.real`` or a sharded copy) explicitly when
        calling under ``jax.jit`` so the real-graph tensors are program
        arguments, not baked constants (see :class:`RealTensors`)."""
        real = self.real if real is None else real
        if self._sharded_match is not None:
            return self._sharded_match(model_params, feat_syn,
                                       adj_syn_norm, key)
        ids, ws, targets, valid = self._sample_all_class_blocks(key, real)

        # Real grads: scan over classes.  Measured FASTER than vmap here
        # (21.5 vs 31.9 ms incl. sampling at arxiv shapes — the batched
        # [C, 16k, d] layout loses to sequential full-width matmuls,
        # benchmark/outer_step_floor.py).  The stacked per-class grads
        # are tiny (C × |params|).
        def real_body(_, inputs):
            ids_c, ws_c, tgt, vld = inputs
            block = BlockSample(node_ids=ids_c, weights=ws_c)
            feat_deep = jnp.take(real.features, block.node_ids[0], axis=0)
            y = jnp.take(real.labels_real, tgt)

            def loss_of(p):
                out = self.model.apply(p, feat_deep, block)
                return masked_nll(out, y, vld)

            return None, jax.grad(loss_of)(model_params)

        _, gw_real = jax.lax.scan(real_body, None,
                                  (ids, ws, targets, valid))
        gw_real = jax.lax.stop_gradient(gw_real)

        # Syn grads: vmap over class masks.  The synthetic forward does
        # not depend on the mask, so vmap computes it ONCE with C
        # batched backward passes (measured 2.7 vs 3.7 ms scanned).
        gw_syn = jax.vmap(
            lambda mask: self._syn_class_grad(model_params, feat_syn,
                                              adj_syn_norm, mask)
        )(self.class_masks)

        mls = jax.vmap(
            lambda gs, gr: match_loss(gs, gr, self.args.dis_metric)
        )(gw_syn, gw_real)
        return jnp.sum(self.coeffs * mls)

    def syn_adj_norm(self, pge_params, feat_syn):
        if not self.with_structure:
            return G.normalize_adj_dense(
                jnp.eye(self.n_syn, dtype=feat_syn.dtype), add_loops=False)
        adj = self.pge.apply(pge_params, feat_syn)
        return G.normalize_adj_dense(adj)

    def generator_forward(self, pge_params, feat_syn):
        """(normalized syn adjacency, auxiliary generator loss).

        Subclasses with extra generator objectives (SGDD's spectral OT)
        override this."""
        return self.syn_adj_norm(pge_params, feat_syn), jnp.float32(0.0)

    def inference_adj(self, pge_params, feat_syn):
        """Detached synthetic adjacency for inner-loop training and
        checkpoint artifacts."""
        if not self.with_structure:
            return None
        return self.pge.inference(pge_params, feat_syn)

    def inner_adj(self, pge_params, feat_syn):
        """Normalized detached adjacency for inner-loop model training."""
        return G.normalize_adj_dense(
            self.inference_adj(pge_params, feat_syn))

    # ------------------------------------------------------------------
    def intermediate_evaluation(self, feat_syn, adj_syn, best_val: float,
                                it: int, loss_avg: float,
                                verbose: bool = False) -> float:
        """Checkpoint: run_inter_eval quick trainings on the current syn
        graph; save best-by-val (reference ``gcond_base.py:287-324``)."""
        from graphslim_tpu.eval import Evaluator

        args = self.args
        reduced = G.Reduced(
            feat=jax.lax.stop_gradient(feat_syn),
            adj=None if adj_syn is None else jax.lax.stop_gradient(adj_syn),
            labels=self.labels_syn)
        ev = Evaluator(self.data, args)
        accs = []
        for s in range(args.run_inter_eval):
            model = ev._eval_model(args.eval_model, reduced.feat.shape[-1])
            tx, tadj, ty = ev._train_tuple(reduced, args.eval_model)
            val = ev._val_tuple(args.eval_model)
            cfg = M.TrainConfig(epochs=args.eval_epochs,
                                lr=args.lr or 0.01, weight_decay=5e-4,
                                metric=args.metric,
                                seg=100 if jax.default_backend() == "tpu"
                                else 0)
            _, bv, _ = M.fit_with_val(
                model, jax.random.key(args.seed + s),
                train=(tx, tadj, ty, None), val=val, cfg=cfg)
            accs.append(float(bv))
        mean_val = float(np.mean(accs))
        log.info("checkpoint it=%d loss=%.4f val=%.4f (best %.4f)", it,
                 loss_avg, mean_val, best_val)
        if verbose:
            print(f"[it {it}] loss {loss_avg:.4f} val {mean_val:.4f}")
        if mean_val > best_val:
            best_val = mean_val
            save_reduced(reduced, args.save_path, args.method,
                         self.data.name, args.reduction_rate, args.seed,
                         attack=getattr(args, "attack", None))
            self._best_reduced = reduced
        return best_val
