"""ogbn-products-scale on ONE chip: twin synthesis + SpMM + protocol.

The products twin (2 449 029 nodes, ~126M directed edge slots, d=100,
47 classes) is the largest scale this framework exercises on a single
chip — 3x the reddit twin (docs/PERF.md "Reddit-twin scale").  Stages,
each timed and each optional-failure-isolated:

1. synthesize/load the twin (disk-cached after first run)
2. slot-capped ELL build (kernels/ell.build_ell max_slots chunking)
3. full-graph SpMM on chip, steady-state Medges/s
4. random coreset at the reference's products-class rate + short SGC
   evaluation through the hoisted path (full protocol shape)

Run: python benchmark/products_scale.py [--eval]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval", action="store_true",
                    help="also run coreset + short SGC eval")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from graphslim_tpu.data import load

    t0 = time.time()
    ds = load("ogbn-products", seed=0)
    t_load = time.time() - t0
    nnz = int(ds.adj.nnz)
    print(f"[products] load/synth: {t_load:.1f}s  n={ds.n_nodes:,} "
          f"nnz={nnz:,} d={ds.n_feat} c={ds.nclass}", flush=True)

    t0 = time.time()
    ell = ds.adj_norm_ell()
    print(f"[products] ELL build: {time.time() - t0:.1f}s", flush=True)

    spmm = jax.jit(lambda e, x: e.matmul(x))
    peek = jax.jit(lambda o: jnp.sum(o[:64]))
    t0 = time.time()
    out = spmm(ell, ds.feat)
    _ = float(np.asarray(peek(out)))
    print(f"[products] SpMM compile+first: {time.time() - t0:.1f}s "
          f"(backend {jax.default_backend()})", flush=True)
    t0 = time.time()
    for _ in range(args.reps):
        out = spmm(ell, out)
    _ = float(np.asarray(peek(out)))
    dt = (time.time() - t0) / args.reps
    print(f"[products] SpMM steady: {dt * 1e3:.0f} ms = "
          f"{nnz / dt / 1e6:.1f} Medges/s", flush=True)

    if args.eval:
        from graphslim_tpu.config import Args, finalize
        from graphslim_tpu.eval import Evaluator
        from graphslim_tpu.reduce import create_reducer

        e_args = finalize(
            Args(dataset="ogbn-products", method="random",
                 reduction_rate=0.0005, save_path="/tmp/gs_products",
                 eval_epochs=100, run_eval=3),
            explicit={"reduction_rate", "eval_epochs", "run_eval"})
        t0 = time.time()
        red = create_reducer("random", ds, e_args).reduce(ds)
        (mean, std), _ = Evaluator(ds, e_args).evaluate(red, "SGC")
        print(f"[products] coreset r=0.0005 (n_syn={red.n_syn}) + "
              f"3-seed SGC eval: {mean:.4f} ± {std:.4f} "
              f"in {time.time() - t0:.1f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
