"""MSGC — multiple sparse graphs condensation.

Re-design of reference ``graphslim/condensation/msgc.py``: a batch of
``batch_adj`` sparse skeleton graphs built by deterministic class-linking
(``reset_adj_batch``, ``msgc.py:183-221``), edges scored by a shared MLP,
normalized as batched dense [B, n, n] adjacencies (``get_adj_t_syn``),
gradient matching against labels repeated per batch, and window-averaged
snapshots at checkpoints (``FixLenList``).
"""

from __future__ import annotations

import collections
import logging

import jax
import jax.numpy as jnp
import numpy as np

from graphslim_tpu import graph as G
from graphslim_tpu.models import nn
from graphslim_tpu.reduce.gcond import GCond

log = logging.getLogger("graphslim_tpu")


def proportional_labels(labels_train: np.ndarray, n_syn: int,
                        nclass: int) -> np.ndarray:
    """MSGC's label allocation: floor(proportional) + 1 base, leftovers to
    the most under-represented class (``generate_labels_syn``,
    ``msgc.py:40-63``)."""
    n = labels_train.shape[0]
    rate = np.bincount(labels_train, minlength=nclass) / n
    n_each = np.floor((n_syn - nclass) * rate) + 1
    left = int(n_syn - n_each.sum())
    for _ in range(max(left, 0)):
        more = n_each / n_each.sum() / np.maximum(rate, 1e-12)
        n_each[np.argmin(more)] += 1
    n_each = n_each.astype(np.int64)
    y = np.concatenate([np.full(k, c) for c, k in enumerate(n_each)])
    return y.astype(np.int32)


def build_skeletons(y_syn: np.ndarray, nclass: int, batch: int,
                    seed: int) -> tuple[np.ndarray, np.ndarray,
                                        np.ndarray]:
    """Deterministic class-linking skeletons (``reset_adj_batch``,
    ``msgc.py:183-221``): each node links to ≤2 nodes of every class,
    preferring the least-connected candidate."""
    rng = np.random.default_rng(seed)
    n = y_syn.shape[0]
    rows, cols, batches = [], [], []
    for b in range(batch):
        n_neighbor = np.zeros((n, nclass))
        index = np.arange(n)
        for row_id in range(n):
            for c in range(nclass):
                c_mask = y_syn == c
                c_mask = c_mask.copy()
                c_mask[row_id] = False
                if not c_mask.any() or n_neighbor[row_id, c] > 1:
                    continue
                link_coef = n_neighbor[c_mask, y_syn[row_id]]
                best = link_coef.min()
                cands = index[c_mask][link_coef == best]
                col_id = int(cands[rng.integers(len(cands))]) \
                    if len(cands) > 1 else int(cands[0])
                n_neighbor[row_id, c] += 1
                n_neighbor[col_id, y_syn[row_id]] += 1
                rows.extend([row_id, col_id])
                cols.extend([col_id, row_id])
                batches.extend([b, b])
    return (np.asarray(rows, np.int32), np.asarray(cols, np.int32),
            np.asarray(batches, np.int32))


class MSGC(GCond):
    alternation = "epoch"

    def __init__(self, data, args):
        args = args.replace(batch_adj=max(args.batch_adj, 1))
        super().__init__(data, args)
        # MSGC sizes n_syn directly and allocates labels proportionally
        labels_pool = np.asarray(data.labels_for_reduction())
        self.n_syn = max(int(labels_pool.shape[0] * args.reduction_rate),
                         data.nclass)
        y_syn = proportional_labels(labels_pool, self.n_syn, data.nclass)
        self.y_syn = y_syn
        self.batch_size = args.batch_adj
        self.budgets = {c: int((y_syn == c).sum())
                        for c in range(data.nclass)}
        self.classes = sorted(self.budgets)
        # matching runs against labels repeated per skeleton
        self.labels_syn = jnp.asarray(np.tile(y_syn, self.batch_size))
        self._build_class_tables()
        self.rows, self.cols, self.batches = build_skeletons(
            y_syn, data.nclass, self.batch_size, args.seed)
        self.rows_j = jnp.asarray(self.rows)
        self.cols_j = jnp.asarray(self.cols)
        self.batches_j = jnp.asarray(self.batches)
        # shared edge-scorer MLP (256-wide, msgc.py:29-38)
        self._scorer_dims = (self.d * 2, 256, 256, 1)
        self._window: collections.deque = collections.deque(maxlen=20)

    # -- generator ------------------------------------------------------
    def pge_init(self, key):
        dims = self._scorer_dims
        keys = jax.random.split(key, len(dims) - 1)
        return {
            "layers": [nn.linear_init(k, a, b)
                       for k, a, b in zip(keys, dims[:-1], dims[1:])],
            "bns": [nn.bn_init(d) for d in dims[1:-1]],
        }

    def _score_edges(self, params, feat_syn):
        h = jnp.concatenate([feat_syn[self.rows_j],
                             feat_syn[self.cols_j]], axis=1)
        layers = params["layers"]
        for i, p in enumerate(layers):
            h = nn.linear_apply(p, h)
            if i != len(layers) - 1:
                h = jax.nn.relu(nn.bn_apply(params["bns"][i], h))
        return jax.nn.sigmoid(h.ravel())

    def get_adj_batch(self, params, feat_syn):
        """[B, n, n] normalized adjacencies (``get_adj_t_syn``)."""
        B, n = self.batch_size, self.n_syn
        scores = self._score_edges(params, feat_syn)
        adj = jnp.zeros((B, n, n))
        adj = adj.at[self.batches_j, self.rows_j, self.cols_j].set(scores)
        adj = (jnp.swapaxes(adj, 1, 2) + adj) / 2
        return G.normalize_adj_dense(adj, add_loops=True)

    def generator_forward(self, pge_params, feat_syn):
        return self.get_adj_batch(pge_params, feat_syn), jnp.float32(0.0)

    def inference_adj(self, pge_params, feat_syn):
        return jax.lax.stop_gradient(
            self.get_adj_batch(pge_params, feat_syn))

    def syn_adj_norm(self, pge_params, feat_syn):
        return self.get_adj_batch(pge_params, feat_syn)

    def inner_adj(self, pge_params, feat_syn):
        # get_adj_batch is already normalized
        return self.inference_adj(pge_params, feat_syn)

    # -- plumbing overrides --------------------------------------------
    def init_feat_syn(self, verbose: bool = False):
        """Init against the un-tiled label vector (features are shared
        across the skeleton batch)."""
        from graphslim_tpu.reduce.registry import create_reducer

        init_args = self.args.replace(method=self.args.init)
        agent = create_reducer(self.args.init, self.data, init_args,
                               labels_syn_override=self.y_syn)
        reduced = agent.reduce(self.data, verbose=verbose)
        return jnp.asarray(reduced.feat)

    def _reduce(self, data: G.Dataset, verbose: bool) -> G.Reduced:
        # patch PGE protocol onto self (GCond calls self.pge.*)
        outer = self

        class _Shim:
            def init(self, key):
                return outer.pge_init(key)

            def apply(self, params, fs):
                raise RuntimeError("MSGC uses generator_forward directly")

            def inference(self, params, fs):
                return outer.inference_adj(params, fs)

        self.pge = _Shim()
        return super()._reduce(data, verbose)

    def intermediate_evaluation(self, feat_syn, adj_syn, best_val, it,
                                loss_avg, verbose=False):
        # window-average snapshots (FixLenList, msgc.py:238-246)
        self._window.append((np.asarray(feat_syn), np.asarray(adj_syn)))
        feat_avg = jnp.asarray(
            np.mean([w[0] for w in self._window], axis=0))
        adj_avg = jnp.asarray(
            np.mean([w[1] for w in self._window], axis=0))
        return super().intermediate_evaluation(
            feat_avg, adj_avg, best_val, it, loss_avg, verbose)
