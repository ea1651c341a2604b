"""Benchmark: GCond match-steps/s on ogbn-arxiv-scale graph + SpMM edges/s.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Primary metric: full GCond outer steps per second (sample + real grads for
all 40 classes + PGE adjacency + nested-grad match loss + optimizer update)
on the ogbn-arxiv-profile graph at r=0.01 — the reference's hottest loop
(SURVEY.md §3.1).  ``vs_baseline`` compares against the A100 reference
estimate of ~1.0 outer-steps/s (GCond paper-scale runs: 600 epochs × 20
outer ≈ hours on A100-class GPUs; the CPU smoke reference is far slower,
BASELINE.md).  Secondary numbers (SpMM edges/s, eval accuracy on the
synthetic twin) are reported in "extra".
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MATCH_STEPS_PER_S = 1.0   # A100-reference estimate (see docstring)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from graphslim_tpu.config import Args, finalize
    from graphslim_tpu.data import load
    from graphslim_tpu.reduce.registry import create_reducer

    # --- dataset: ogbn-arxiv synthetic twin (169 343 nodes) -------------
    t0 = time.time()
    ds = load("ogbn-arxiv", split="fixed", seed=0)
    load_s = time.time() - t0

    args = finalize(
        Args(dataset="ogbn-arxiv", method="gcond",
             save_path="/tmp/graft_bench", run_eval=1, run_inter_eval=1,
             init="random"),
        explicit={"run_eval", "run_inter_eval", "init"})
    engine = create_reducer("gcond", ds, args)

    feat_syn = engine.init_feat_syn()
    key = jax.random.key(0)
    pge_params = engine.pge.init(key)
    model_params = engine.model.init(jax.random.key(1))
    opt = optax.adam(args.lr_feat)
    opt_state = opt.init(feat_syn)

    @jax.jit
    def outer_step(model_params, feat_syn, pge_params, opt_state, key):
        def objective(fs, pp):
            adj_norm = engine.syn_adj_norm(pp, fs)
            return engine.match_loss_total(model_params, fs, adj_norm, key)

        loss, (g_f, g_p) = jax.value_and_grad(
            objective, argnums=(0, 1))(feat_syn, pge_params)
        updates, opt_state = opt.update(g_f, opt_state, feat_syn)
        return optax.apply_updates(feat_syn, updates), opt_state, loss

    # warmup/compile
    t0 = time.time()
    feat_syn, opt_state, loss = outer_step(model_params, feat_syn,
                                           pge_params, opt_state, key)
    jax.block_until_ready(feat_syn)
    compile_s = time.time() - t0

    n_steps = 10
    t0 = time.time()
    for i in range(n_steps):
        key, k = jax.random.split(key)
        feat_syn, opt_state, loss = outer_step(model_params, feat_syn,
                                               pge_params, opt_state, k)
    jax.block_until_ready(feat_syn)
    step_s = (time.time() - t0) / n_steps
    match_steps_per_s = 1.0 / step_s

    # --- SpMM edges/s (ELL fast layout) ---------------------------------
    adj = ds.adj_norm()
    ell = ds.adj_norm_ell()
    x = ds.feat
    spmm = jax.jit(ell.matmul)
    jax.block_until_ready(spmm(x))
    n_rep = 50
    t0 = time.time()
    for _ in range(n_rep):
        out = spmm(x)
    jax.block_until_ready(out)
    spmm_s = (time.time() - t0) / n_rep
    edges_per_s = adj.nnz / spmm_s

    result = {
        "metric": "gcond_match_steps_per_s_arxiv_r0.01",
        "value": round(match_steps_per_s, 3),
        "unit": "outer-steps/s",
        "vs_baseline": round(match_steps_per_s /
                             BASELINE_MATCH_STEPS_PER_S, 2),
        "extra": {
            "spmm_edges_per_s": round(edges_per_s / 1e6, 1),
            "spmm_ms": round(spmm_s * 1e3, 3),
            "nnz": int(adj.nnz),
            "n_syn": int(engine.n_syn),
            "step_ms": round(step_s * 1e3, 1),
            "compile_s": round(compile_s, 1),
            "dataset_load_s": round(load_s, 1),
            "match_loss": round(float(loss), 4),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
