"""Evaluator: train a fresh GNN on the reduced graph, test on the original.

Re-design of reference ``Evaluator`` (``evaluation/eval_agent.py:21-402``):

* ``test``   — one seeded run (``eval_agent.py:159-232``)
* ``evaluate`` — the reference's 10× seeded Python repeat
  (``eval_agent.py:234-291``) becomes ONE vmapped compiled program that
  returns mean ± std.
* ``train_cross`` — cross-architecture evaluation over the model zoo
  (``eval_agent.py:55-157``).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphslim_tpu import graph as G
from graphslim_tpu import models as M
from graphslim_tpu.data.artifacts import sparsify

log = logging.getLogger("graphslim_tpu")


def _dense_to_sparse(adj: jax.Array) -> G.SparseAdj:
    a = np.asarray(adj)
    row, col = np.nonzero(a)
    return G.from_edge_index(np.stack([row, col]), a.shape[0],
                             edge_weight=a[row, col], dedup=False)


class Evaluator:
    """Evaluation agent bound to (dataset, args)."""

    def __init__(self, data: G.Dataset, args):
        self.data = data
        self.args = args
        self._dist_adj = None
        self._dist_val = None
        self._dist_test = None

    def enable_distributed(self, mesh, axis: str = "data") -> None:
        """Opt-in mesh path: full-graph val/test forwards run the ragged
        halo SpMM over ``mesh`` (node-sharded features), so evaluation
        scales past one chip's HBM (VERDICT r2 item 5).  The reduced
        training graph stays local (it is tiny by construction).

        The whole forward runs in the **padded partition domain**:
        features are permuted+padded once here, val/test node indices
        are remapped once, and every layer's ``matmul`` is a pure
        shard_map — no per-layer mesh-wide reshard (docs/PERF.md r4).

        Inductive datasets (the reference's reddit/flickr/yelp/amazon
        protocol) shard their val/test SUBGRAPH forwards the same way —
        each subgraph gets its own edge-cut partition."""
        from graphslim_tpu.dist.spmm import build_dist_adj

        d = self.data
        if d.setting == "ind":
            # subgraphs smaller than a few rows per shard stay local
            min_n = 2 * int(mesh.devices.size)

            def _shard_subgraph(adj, feat):
                if adj.n_rows < min_n or adj.nnz == 0:
                    return None, None
                dist = build_dist_adj(G.gcn_norm(adj), mesh, axis=axis)
                return dist, dist.pad_features(feat)

            self._dist_val, self._dist_val_feat = _shard_subgraph(
                d.adj_val, d.feat_val)
            self._dist_test, self._dist_test_feat = _shard_subgraph(
                d.adj_test, d.feat_test)
            # marker so chunk=1 sequential-seed logic engages whenever
            # EITHER subgraph forward runs shard_map collectives (a
            # distributed val forward under vmap is exactly the fragile
            # case the marker guards against)
            if self._dist_test is not None or self._dist_val is not None:
                self._dist_adj = self._dist_test or self._dist_val
            return
        self._dist_adj = build_dist_adj(
            G.gcn_norm(self.data.adj), mesh, axis=axis)
        self._dist_feat = self._dist_adj.pad_features(self.data.feat)

    # ------------------------------------------------------------------
    def _eval_model(self, model_type: str, nfeat: int):
        a = self.args
        cfg = M.ModelConfig(
            nfeat=nfeat, nhid=a.hidden, nclass=self.data.nclass,
            nlayers=a.nlayers, dropout=0.0,   # eval mode: dropout=0
            alpha=a.alpha, ntrans=1,          # eval mode forces ntrans=1
            trans_layers=getattr(a, "trans_layers", 2),
            activation=a.activation)
        return M.get_model(model_type, cfg)

    def _train_tuple(self, reduced: G.Reduced, model_type: str):
        """Normalized synthetic training batch (model-aware adj form)."""
        red = sparsify(reduced, model_type, self.args.method,
                       threshold=self.args.threshold)
        adj = red.adj
        if model_type == "GAT":
            if not isinstance(adj, G.SparseAdj):
                adj = _dense_to_sparse(red.dense_adj())
            adj_n = G.gcn_norm(adj)
        elif adj is None:
            adj_n = None
        elif isinstance(adj, G.SparseAdj):
            adj_n = G.gcn_norm(adj)
        else:
            adj_n = G.normalize_adj_dense(jnp.asarray(adj))
        return red.feat, adj_n, red.labels

    def _full_adj(self, model_type: str):
        """Normalized full adjacency in the ELL fast layout.  GAT included:
        its edge softmax runs scatter-free on the padded buckets
        (kernels/ell.attention_ell, measured in docs/PERF.md).  With the
        opt-in mesh path, non-attention models get the node-sharded
        DistAdj instead (GAT's edge softmax needs the ELL layout)."""
        if self._dist_adj is not None and model_type != "GAT":
            return self._dist_adj
        return self.data.adj_norm_ell()

    def _val_tuple(self, model_type: str):
        d = self.data
        if d.setting == "ind":
            if self._dist_val is not None and model_type != "GAT":
                # padded-domain subgraph forward; idx = the inverse
                # permutation (all real rows, original order)
                da = self._dist_val
                return (self._dist_val_feat, da.padded_view(),
                        d.labels_val,
                        da.remap_idx(jnp.arange(d.feat_val.shape[0])))
            adj = G.gcn_norm(d.adj_val)
            return (d.feat_val, adj, d.labels_val, None)
        adj = self._full_adj(model_type)
        return self._full_tuple(adj, d.idx_val)

    def _test_tuple(self, model_type: str):
        d = self.data
        if d.setting == "ind":
            if self._dist_test is not None and model_type != "GAT":
                da = self._dist_test
                return (self._dist_test_feat, da.padded_view(),
                        d.labels_test,
                        da.remap_idx(jnp.arange(d.feat_test.shape[0])))
            adj = G.gcn_norm(d.adj_test)
            return (d.feat_test, adj, d.labels_test, None)
        adj = self._full_adj(model_type)
        return self._full_tuple(adj, d.idx_test)

    def _full_tuple(self, adj, idx):
        """(x, adj, y, idx) for a full-graph forward; on the mesh path
        the forward runs in the padded partition domain (features
        pre-permuted+padded, idx remapped, labels untouched)."""
        d = self.data
        idx = jnp.asarray(idx)
        y = d.labels[idx]
        if self._dist_adj is not None and adj is self._dist_adj:
            return (self._dist_feat, self._dist_adj.padded_view(), y,
                    self._dist_adj.remap_idx(idx))
        return (d.feat, adj, y, idx)

    # ------------------------------------------------------------------
    def test(self, reduced: G.Reduced, model_type: str = "GCN",
             seed: int = 0, verbose: bool = False) -> float:
        """One seeded evaluation run (reference ``eval_agent.py:159-232``)."""
        accs = self.evaluate(reduced, model_type, runs=1, seed=seed,
                             verbose=verbose)
        return float(accs[0][0])

    def evaluate(self, reduced: G.Reduced, model_type: str = "GCN",
                 runs: Optional[int] = None, seed: Optional[int] = None,
                 verbose: bool = False):
        """``runs``× seeded eval via one vmapped program → (mean, std)."""
        a = self.args
        runs = runs if runs is not None else a.run_eval
        seed = seed if seed is not None else a.seed
        model = self._eval_model(model_type, reduced.feat.shape[-1])
        tx, tadj, ty = self._train_tuple(reduced, model_type)
        val = self._val_tuple(model_type)
        test = self._test_tuple(model_type)
        # Hoist input-side aggregations out of the 300-epoch loop where
        # exact (SGC ntrans=1: all of them; GCN: first layer) — see
        # models/hoist.py.  Skipped for batched-3D synthetic adjacencies.
        from graphslim_tpu.models.hoist import hoist_plan, hoist_batch

        def _hoistable(adj):
            return adj is None or not (hasattr(adj, "ndim")
                                       and adj.ndim == 3)
        plan = hoist_plan(model)
        if plan is not None and all(_hoistable(t) for t in
                                    (tadj, val[1], test[1])):
            model, hops, keep = plan
            tx, tadj, ty, _ = hoist_batch((tx, tadj, ty, None), hops,
                                          keep)
            val = hoist_batch(val, hops, keep)
            test = hoist_batch(test, hops, keep)
        # seg=100 on the tunneled TPU backend: single programs executing
        # >~10 s (300-epoch full-graph GCN fits) have crashed the remote
        # worker; segments are numerically identical (TrainConfig.seg)
        seg = 100 if jax.default_backend() == "tpu" else 0
        cfg = M.TrainConfig(epochs=a.eval_epochs, lr=a.lr or 0.01,
                            weight_decay=5e-4, metric=a.metric, seg=seg)
        keys = jax.random.split(jax.random.key(seed), runs)

        # jitted once per evaluate() call; reused across seeds (the
        # sequential chunk==1 path would otherwise run the full-graph
        # test forward eagerly — pathological on remote-compile backends)
        eval_fn = jax.jit(lambda p, x_t, adj_t, y_t, idx_t: M.evaluate(
            model, p, x_t, adj_t, y_t, idx_t, metric=a.metric))

        def one(key):
            ik, rk = jax.random.split(key)
            params0 = model.init(ik)
            from graphslim_tpu.models.trainer import _build_fit
            fit = _build_fit(None, type(model), model.cfg, cfg)
            best_params, best_val, _ = fit(rk, params0, tx, tadj, ty, None,
                                           *val)
            acc = eval_fn(best_params, test[0], test[1], test[2], test[3])
            return acc, best_val

        # Seed-vmap width is HBM-bounded on large full graphs: the test
        # forward's gather buffers scale with runs × nnz × d.  Chunk the
        # vmap so the working set stays inside one chip's HBM (16 GB
        # v5e); every chunk has equal width, so it is one compiled
        # program reused across chunks.
        adj_t = test[1]
        nnz_t = getattr(adj_t, "nnz", None)
        if nnz_t is None:
            chunk = runs
        else:
            nnz_t = nnz_t() if callable(nnz_t) else nnz_t
            per_seed = int(nnz_t) * int(test[0].shape[-1])
            budget = int(2e8)   # ≈0.8 GB of f32 gather buffers per chunk
            chunk = budget // max(per_seed, 1)
        chunk = max(1, min(runs, chunk))
        if self._dist_adj is not None:
            # mesh path: shard_map collectives under vmap are fragile —
            # run seeds sequentially (each seed is one compiled program,
            # reused across seeds)
            chunk = 1
        n_chunks = -(-runs // chunk)
        chunk = -(-runs // n_chunks)          # equal widths: one program
        if n_chunks * chunk > runs:           # pad keys, drop extras below
            keys = jax.random.split(jax.random.key(seed),
                                    n_chunks * chunk)
        acc_parts, val_parts = [], []
        vone = jax.vmap(one) if chunk > 1 else (
            lambda ks: jax.tree.map(lambda a: jnp.asarray(a)[None],
                                    one(ks[0])))
        for lo in range(0, n_chunks * chunk, chunk):
            a_c, v_c = vone(keys[lo:lo + chunk])
            acc_parts.append(np.asarray(a_c))
            val_parts.append(np.asarray(v_c))
        accs = np.concatenate(acc_parts)[:runs]
        best_vals = np.concatenate(val_parts)[:runs]
        mean, std = float(accs.mean()), float(accs.std())
        log.info("eval[%s] %d runs: %.4f ± %.4f", model_type, runs, mean,
                 std)
        if verbose:
            print(f"eval[{model_type}] {runs} runs: "
                  f"{mean * 100:.2f} ± {std * 100:.2f}")
        return (mean, std), (accs, np.asarray(best_vals))

    # ------------------------------------------------------------------
    # Hyperparameter grids per architecture (reference
    # ``eval_agent.py:119-145``)
    GRID = {
        "GCN": {"hidden": [64, 256], "lr": [0.01, 0.001],
                "weight_decay": [0.0, 5e-4]},
        "SGC": {"hidden": [64, 256], "lr": [0.01, 0.001],
                "weight_decay": [0.0, 5e-4], "ntrans": [1, 2]},
        "APPNP": {"hidden": [64, 256], "lr": [0.01, 0.001],
                  "weight_decay": [0.0, 5e-4], "alpha": [0.1, 0.2]},
        "Cheby": {"hidden": [64, 256], "lr": [0.01, 0.001],
                  "weight_decay": [0.0, 5e-4]},
        "GraphSage": {"hidden": [64, 256], "lr": [0.01, 0.001],
                      "weight_decay": [0.0, 5e-4]},
        "MLP": {"hidden": [64, 256], "lr": [0.01, 0.001],
                "weight_decay": [0.0, 5e-4]},
        "GAT": {"hidden": [64], "lr": [0.01, 0.001],
                "weight_decay": [0.0, 5e-4]},
        # Reference special-cases SGFormer with transformer-branch knobs
        # (eval_agent.py:135-136: trans_num_layers/lr/trans_weight_decay/
        # trans_dropout); dropout is forced to 0 in our eval mode, so the
        # depth axis + lr/wd carry the search.
        "SGFormer": {"trans_layers": [1, 2, 3], "lr": [0.01, 0.001],
                     "weight_decay": [1e-3, 1e-4]},
    }

    def grid_search(self, reduced: G.Reduced, model_type: str,
                    param_grid: Optional[dict] = None,
                    verbose: bool = False):
        """Best (test mean, std) by validation over a parameter grid
        (reference ``eval_agent.py:55-117``)."""
        import itertools

        grid = param_grid or self.GRID.get(model_type, self.GRID["GCN"])
        keys = sorted(grid)
        best_val, best_test, best_params = -1.0, (float("nan"),) * 2, None
        for combo in itertools.product(*(grid[k] for k in keys)):
            params = dict(zip(keys, combo))
            args = self.args.replace(**{
                k: v for k, v in params.items() if hasattr(self.args, k)})
            sub = Evaluator(self.data, args)
            (mean, std), accs_and_vals = sub.evaluate(reduced, model_type,
                                                      verbose=False)
            # rank by mean validation accuracy across runs
            val_score = float(np.mean(np.asarray(accs_and_vals[1]))) \
                if isinstance(accs_and_vals, tuple) else mean
            if val_score > best_val:
                best_val = val_score
                best_test, best_params = (mean, std), params
            if verbose:
                print(f"{model_type} {params}: {mean * 100:.2f}")
        return best_test, best_params

    def train_cross(self, reduced: G.Reduced,
                    model_types: Optional[list[str]] = None,
                    use_grid: bool = False,
                    verbose: bool = False) -> dict[str, tuple]:
        """Cross-architecture table (reference ``eval_agent.py:55-157``)."""
        model_types = model_types or ["MLP", "GCN", "SGC", "APPNP",
                                      "Cheby", "GraphSage", "GAT",
                                      "SGFormer"]
        out = {}
        for mt in model_types:
            try:
                if use_grid:
                    out[mt], _ = self.grid_search(reduced, mt,
                                                  verbose=verbose)
                else:
                    out[mt], _ = self.evaluate(reduced, mt,
                                               verbose=verbose)
            except Exception as e:  # GAT on empty sparse graphs etc.
                log.warning("train_cross[%s] failed: %s", mt, e)
                out[mt] = (float("nan"), float("nan"))
        return out

    def tsne_vis(self, reduced: G.Reduced, out_path: str,
                 max_real: int = 2000) -> str:
        """t-SNE of real train vs synthetic features
        (reference ``eval_agent.py:404-494``)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from sklearn.manifold import TSNE

        d = self.data
        if d.setting == "ind":
            feat_tr = np.asarray(d.feat_train)
            y_tr = np.asarray(d.labels_train)
        else:
            feat_tr = np.asarray(d.feat)[d.idx_train]
            y_tr = np.asarray(d.labels)[d.idx_train]
        if feat_tr.shape[0] > max_real:
            sel = np.random.default_rng(0).choice(
                feat_tr.shape[0], max_real, replace=False)
            feat_tr, y_tr = feat_tr[sel], y_tr[sel]
        feat_syn = np.asarray(reduced.feat)
        y_syn = np.asarray(reduced.labels)
        if y_syn.ndim == 2:
            y_syn = y_syn.argmax(1)
        all_data = np.concatenate([feat_tr, feat_syn])
        perplexity = min(30, max(all_data.shape[0] // 4, 2))
        pts = TSNE(n_components=2, random_state=0,
                   perplexity=perplexity).fit_transform(all_data)
        n_r = feat_tr.shape[0]
        fig, ax = plt.subplots(figsize=(6, 5))
        ax.scatter(pts[:n_r, 0], pts[:n_r, 1], c=y_tr, cmap="tab10",
                   s=8, alpha=0.4, label="real")
        ax.scatter(pts[n_r:, 0], pts[n_r:, 1], c=y_syn, cmap="tab10",
                   s=60, marker="*", edgecolors="black", label="syn")
        ax.legend()
        import os
        os.makedirs(os.path.dirname(os.path.abspath(out_path)),
                    exist_ok=True)
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path

    def nas_evaluate(self, reduced: G.Reduced, model,
                     runs: int = 1, seed: int = 0) -> float:
        """Validation-accuracy-only evaluation used by NAS
        (reference ``eval_agent.py:352-402``)."""
        a = self.args
        tx, tadj, ty = self._train_tuple(reduced, "APPNP")
        val = self._val_tuple("APPNP")
        # seg=100 on the tunneled TPU backend: single programs executing
        # >~10 s (300-epoch full-graph GCN fits) have crashed the remote
        # worker; segments are numerically identical (TrainConfig.seg)
        seg = 100 if jax.default_backend() == "tpu" else 0
        cfg = M.TrainConfig(epochs=a.eval_epochs, lr=a.lr or 0.01,
                            weight_decay=5e-4, metric=a.metric, seg=seg)
        keys = jax.random.split(jax.random.key(seed), runs)

        def one(key):
            ik, rk = jax.random.split(key)
            from graphslim_tpu.models.trainer import _build_fit
            fit = _build_fit(None, type(model), model.cfg, cfg)
            _, best_val, _ = fit(rk, model.init(ik), tx, tadj, ty, None,
                                 *val)
            return best_val

        if self._dist_adj is not None:
            # same guard as evaluate(): shard_map collectives in the val
            # forward are fragile under vmap — run seeds sequentially
            vals = [one(k) for k in keys]
            return float(np.mean(np.asarray(vals)))
        return float(np.mean(np.asarray(jax.vmap(one)(keys))))
