"""Coreset selection: Random / KCenter / Herding / CentD / CentP (+agg).

Re-designs of reference ``graphslim/sparsification/{kcenter,herding,random,
cent_degree,cent_pagerank}.py`` over the class hierarchy ``CoreSet`` →
model-based (GCN embeddings) / model-free (raw or Â²X-aggregated features)
(``coreset_base.py``, ``model_based_coreset_base.py``,
``model_free_coreset_base.py``).

The greedy loops (k-center farthest-point, herding mean-matching) run as
jitted ``lax.fori_loop``s on device — the reference's per-step
``torch.cdist`` Python loops (``kcenter.py:8-24``) become one compiled
program per (class size, budget) shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from graphslim_tpu import graph as G
from graphslim_tpu import models as M
from graphslim_tpu import utils
from graphslim_tpu.reduce.base import Reducer, class_budgets


# ---------------------------------------------------------------------------
# Device-side greedy selection kernels
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1,))
def kcenter_select(feats: jax.Array, cnt: int) -> jax.Array:
    """Greedy farthest-point: start at the point closest to the class mean,
    then repeatedly add argmax of min-distance to selected centers."""
    n = feats.shape[0]
    mean = feats.mean(axis=0, keepdims=True)
    first = jnp.argmin(utils.cdist(feats, mean)[:, 0])
    selected = jnp.zeros((cnt,), dtype=jnp.int32).at[0].set(
        first.astype(jnp.int32))
    taken = jnp.zeros((n,), dtype=bool).at[first].set(True)
    min_dist = utils.cdist(feats, feats[first][None, :])[:, 0]

    def body(i, carry):
        selected, taken, min_dist = carry
        cand = jnp.where(taken, -jnp.inf, min_dist)
        nxt = jnp.argmax(cand).astype(jnp.int32)
        selected = selected.at[i].set(nxt)
        taken = taken.at[nxt].set(True)
        d = utils.cdist(feats, feats[nxt][None, :])[:, 0]
        return selected, taken, jnp.minimum(min_dist, d)

    selected, _, _ = jax.lax.fori_loop(1, cnt, body,
                                       (selected, taken, min_dist))
    return selected


@functools.partial(jax.jit, static_argnums=(1,))
def herding_select(feats: jax.Array, cnt: int) -> jax.Array:
    """Greedy mean-matching: pick argmin ‖(i+1)·μ − Σ selected − x‖."""
    n = feats.shape[0]
    mean = feats.mean(axis=0)

    def body(i, carry):
        selected, taken, acc = carry
        det = mean * (i + 1.0) - acc
        dist = jnp.linalg.norm(feats - det[None, :], axis=1)
        dist = jnp.where(taken, jnp.inf, dist)
        nxt = jnp.argmin(dist).astype(jnp.int32)
        return (selected.at[i].set(nxt), taken.at[nxt].set(True),
                acc + feats[nxt])

    selected = jnp.zeros((cnt,), dtype=jnp.int32)
    taken = jnp.zeros((n,), dtype=bool)
    acc = jnp.zeros_like(mean)
    selected, _, _ = jax.lax.fori_loop(0, cnt, body,
                                       (selected, taken, acc))
    return selected


@functools.partial(jax.jit, static_argnums=(1, 2))
def pagerank(adj: G.SparseAdj, max_iter: int = 100,
             damping: float = 0.85) -> jax.Array:
    """Power-iteration PageRank on device (reference
    ``cent_pagerank.py:28-55`` runs scipy on host)."""
    n = adj.n_rows
    out_deg = jnp.maximum(adj.sum_rows(), 1.0)
    pr = jnp.full((n,), 1.0 / n)
    base = (1.0 - damping) / n

    def body(_, pr):
        # transition^T @ pr: edge (r→c) carries pr[r]/deg[r] to c
        contrib = pr / out_deg
        gathered = jnp.take(contrib, adj.row) * adj.values_or_ones()
        agg = jax.ops.segment_sum(gathered, adj.col, num_segments=n)
        return damping * agg + base

    return jax.lax.fori_loop(0, max_iter, body, pr)


# ---------------------------------------------------------------------------
# Coreset reducers
# ---------------------------------------------------------------------------

class CoreSetBase(Reducer):
    """Shared: budgets, per-class dispatch, induced-subgraph assembly."""

    needs_model = False   # model-based variants train a GCN first
    use_agg = False       # aggregated-feature (Â²X) variants

    def __init__(self, data, args, labels_syn_override=None):
        super().__init__(data, args)
        labels_pool = data.labels_for_reduction()
        if labels_syn_override is not None:
            # Condensation init path: selection sizes come from the
            # caller's synthetic label budget.
            ls = np.asarray(labels_syn_override)
            classes, counts = np.unique(ls, return_counts=True)
            self.budgets = dict(zip(classes.tolist(), counts.tolist()))
            self.labels_syn = ls
            self.labels_syn_override = ls
        else:
            self.budgets, self.labels_syn, _ = class_budgets(
                labels_pool, args.reduction_rate)
            self.labels_syn_override = None
        self.labels_pool = labels_pool
        # Pool = train split (global ids for trans, local for ind)
        if data.setting == "ind":
            self.pool_idx = np.arange(len(data.idx_train))
        else:
            self.pool_idx = np.asarray(data.idx_train)

    # subclass hook: score/selection per class
    def select_class(self, feats: jax.Array, cnt: int,
                     pool_global: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def _embeddings(self, data: G.Dataset, verbose: bool) -> jax.Array:
        """Features to select on: raw, aggregated, or GCN embeddings."""
        feat, adj, labels = data.train_graph() if data.setting == "ind" \
            else (data.feat, data.adj, data.labels)
        if self.needs_model:
            cfg = M.ModelConfig(nfeat=data.n_feat, nhid=self.args.hidden,
                                nclass=data.nclass, nlayers=2,
                                dropout=0.0)
            model = M.get_model("GCN", cfg)
            norm = G.gcn_norm(adj)
            y = labels if data.setting == "ind" else \
                data.labels[jnp.asarray(data.idx_train)]
            idx = None if data.setting == "ind" else \
                jnp.asarray(data.idx_train)
            vidx = None if data.setting == "ind" else \
                jnp.asarray(data.idx_val)
            vy = data.labels[jnp.asarray(data.idx_val)] \
                if data.setting == "trans" else labels
            params, _, _ = M.fit_with_val(
                model, jax.random.key(self.args.seed),
                train=(feat, norm, y, idx),
                val=(feat, norm, vy, vidx),
                cfg=M.TrainConfig(epochs=self.args.eval_epochs,
                                  lr=self.args.lr or 0.01,
                                  weight_decay=5e-4,
                                  metric=self.args.metric))
            return model.apply(params, feat, norm)
        if self.use_agg:
            norm = G.gcn_norm(adj)
            return norm.matmul(norm.matmul(feat))
        return feat

    def _reduce(self, data: G.Dataset, verbose: bool) -> G.Reduced:
        embeds = self._embeddings(data, verbose)
        selected_by_class = {}
        for c, cnt in self.budgets.items():
            mask = self.labels_pool == c
            pool_c = self.pool_idx[mask]
            cnt = min(int(cnt), len(pool_c))
            feats_c = jnp.take(embeds, jnp.asarray(pool_c), axis=0)
            local = self.select_class(feats_c, cnt, pool_c)
            selected_by_class[c] = pool_c[np.asarray(local)][:cnt]
        if self.labels_syn_override is not None:
            # Position-aligned with the imposed labels_syn ordering; short
            # classes are padded by repetition.
            ls = self.labels_syn_override
            idx_selected = np.zeros(ls.shape[0], dtype=np.int64)
            for c, sel in selected_by_class.items():
                pos = np.flatnonzero(ls == c)
                reps = -(-len(pos) // max(len(sel), 1))
                idx_selected[pos] = np.tile(sel, reps)[: len(pos)]
        else:
            idx_selected = np.concatenate(list(selected_by_class.values()))

        if data.setting == "ind":
            feat_src, adj_src, labels_src = (data.feat_train,
                                             data.adj_train,
                                             data.labels_train)
        else:
            feat_src, adj_src, labels_src = data.feat, data.adj, data.labels
        if self.use_agg:
            # Aggregated variants keep Â²X features with identity structure
            # (reference model_free_coreset_base.py:21-29).
            feat_syn = jnp.take(embeds, jnp.asarray(idx_selected), axis=0)
            return G.Reduced(feat=feat_syn, adj=None,
                             labels=jnp.take(labels_src,
                                             jnp.asarray(idx_selected)))
        feat_syn = jnp.take(feat_src, jnp.asarray(idx_selected), axis=0)
        adj_syn = G.submatrix(adj_src, idx_selected)
        labels_syn = jnp.take(labels_src, jnp.asarray(idx_selected))
        return G.Reduced(feat=feat_syn, adj=adj_syn, labels=labels_syn)


class Random(CoreSetBase):
    """Per-class random permutation (reference ``random.py:6-17``)."""

    def select_class(self, feats, cnt, pool_global):
        rng = np.random.default_rng(self.args.seed + len(pool_global))
        return rng.permutation(len(pool_global))[:cnt]


class RandomAgg(Random):
    use_agg = True


class KCenter(CoreSetBase):
    needs_model = True

    def select_class(self, feats, cnt, pool_global):
        return np.asarray(kcenter_select(feats, int(cnt)))


class KCenterAgg(KCenter):
    needs_model = False
    use_agg = True


class Herding(CoreSetBase):
    needs_model = True

    def select_class(self, feats, cnt, pool_global):
        return np.asarray(herding_select(feats, int(cnt)))


class HerdingAgg(Herding):
    needs_model = False
    use_agg = True


class CentD(CoreSetBase):
    """Top-k degree per class (reference ``cent_degree.py:6-27``)."""

    def _reduce(self, data, verbose):
        adj = data.adj_train if data.setting == "ind" else data.adj
        self._deg = np.asarray(adj.sum_rows())
        return super()._reduce(data, verbose)

    def select_class(self, feats, cnt, pool_global):
        deg = self._deg[pool_global]
        return np.argsort(deg)[-cnt:]


class CentP(CoreSetBase):
    """Top-k PageRank per class (reference ``cent_pagerank.py:8-55``)."""

    def _reduce(self, data, verbose):
        adj = data.adj_train if data.setting == "ind" else data.adj
        self._pr = np.asarray(pagerank(adj))
        return super()._reduce(data, verbose)

    def select_class(self, feats, cnt, pool_global):
        return np.argsort(self._pr[pool_global])[-cnt:]
