"""Per-phase floor analysis of the GCond outer step (VERDICT r4 items 1b/2).

The round-4 bench measured the full arxiv-twin outer step at 37.6 ms with an
XLA ``cost_analysis`` figure of 6.54 GFLOPs → 0.18% MFU.  That FLOP figure is
WRONG for a scanned program: XLA's cost analysis counts a ``while`` body
ONCE, not ×trip-count, so the 40-class ``lax.scan`` under-reports by ~40x.
This script does the honest accounting:

* analytic FLOPs/bytes per phase (sampling, real grads, syn grads, PGE,
  match) from the actual shapes — no cost_analysis;
* measures each phase as its own jitted program on the real chip;
* measures the scan-over-classes implementation against a vmap-over-classes
  variant (batched matmuls; the syn forward is computed once because the
  class mask only enters at the loss);
* prints a floor table: phase time vs max(HBM-bytes/BW, FLOPs/peak).

Reference being replaced: the per-class Python loop with CPU NeighborSampler
round-trips, ``/root/reference/graphslim/condensation/gcond_base.py:156-241``.

Usage:  python benchmark/outer_step_floor.py [--dataset ogbn-arxiv]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

HBM_GBPS = 819.0          # v5e
PEAK_F32 = 98.5e12        # v5e f32-on-MXU


def timeit(fn, *args, reps=20, warm=2):
    import jax
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def linear_flops(m, a, b):
    """fwd FLOPs of [m,a]@[a,b] (+bias add, negligible)."""
    return 2.0 * m * a * b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="ogbn-arxiv")
    ap.add_argument("--reps", type=int, default=20)
    args_cli = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax

    from graphslim_tpu.config import Args, finalize
    from graphslim_tpu.data import load
    from graphslim_tpu.kernels.sample import BlockSample
    from graphslim_tpu.reduce.cond_base import match_loss, masked_nll
    from graphslim_tpu.reduce.registry import create_reducer

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    ds = load(args_cli.dataset, split="fixed", seed=0)
    args = finalize(
        Args(dataset=args_cli.dataset, method="gcond",
             save_path="/tmp/graft_floor", run_eval=1, run_inter_eval=1,
             init="random"),
        explicit={"run_eval", "run_inter_eval", "init"})
    eng = create_reducer("gcond", ds, args)

    key = jax.random.key(0)
    feat_syn = eng.init_feat_syn()
    pge_params = eng.pge.init(key)
    model_params = eng.model.init(jax.random.key(1))
    real = eng.real

    C = len(eng.classes)
    B = eng.batch
    fo = list(eng.fanouts)
    d = eng.d
    nh = args.hidden
    nc = eng.nclass
    ns = eng.n_syn
    ntrans = args.ntrans

    # ---- analytic per-step FLOPs/bytes --------------------------------
    # level sizes target→deep: m_L = B, m_{k} = m_{k+1} * (fanout_k + 1)
    sizes = [B]
    for f in fo:
        sizes.append(sizes[-1] * (f + 1))
    deep = sizes[-1]
    trans_dims = ([d, nc] if ntrans == 1
                  else [d] + [nh] * (ntrans - 1) + [nc])

    def trans_flops(m):
        return sum(linear_flops(m, a, b)
                   for a, b in zip(trans_dims[:-1], trans_dims[1:]))

    def agg_flops(dim):
        # per-level einsum [m_out, s] x [m_out, s, dim]
        return sum(2.0 * sizes[len(fo) - 1 - i] * (fo[len(fo) - 1 - i] + 1)
                   * dim for i in range(len(fo)))

    # real phase: fwd + backward-wrt-params (~2x fwd matmul cost), x C
    real_fwd = trans_flops(deep) + agg_flops(nc)
    real_flops = C * 3.0 * real_fwd
    real_bytes = C * (deep * d * 4            # deep feature gather
                      + deep * (nh + nc) * 4  # activations write+read
                      ) * 2.0
    # syn phase: fwd once is cheap; per-class vjp ~2x fwd each; the nested
    # grad (d/dfeat of the match) roughly doubles the backward work again
    syn_fwd = trans_flops(ns) + 2.0 * len(fo) * ns * ns * nc
    syn_flops = syn_fwd + C * 2.0 * syn_fwd * 2.0
    syn_bytes = (ns * ns * 4) * (2 + 2 * min(C, 8))  # adj reads (cached-ish)
    # PGE: n_syn^2 pairs through MLP [2d -> nhid x (L-1) -> 1], fwd+bwd ~3x
    pge_dims = [2 * d] + [eng.pge.cfg.nhid] * (eng.pge.cfg.nlayers - 1) + [1]
    pge_fwd = sum(linear_flops(ns * ns, a, b)
                  for a, b in zip(pge_dims[:-1], pge_dims[1:]))
    pge_flops = 3.0 * pge_fwd
    pge_bytes = ns * ns * (2 * d) * 4 * 2.0
    total_flops = real_flops + syn_flops + pge_flops
    print(f"shapes: C={C} B={B} fanouts={fo} deep={deep} d={d} nhid={nh} "
          f"nclass={nc} n_syn={ns} ntrans={ntrans}")
    print(f"analytic GFLOPs/step: real={real_flops/1e9:.1f} "
          f"syn={syn_flops/1e9:.1f} pge={pge_flops/1e9:.1f} "
          f"total={total_flops/1e9:.1f}")
    print(f"flop floor @peak: {total_flops/PEAK_F32*1e3:.2f} ms; "
          f"byte floors: real={real_bytes/HBM_GBPS/1e6:.2f} ms "
          f"pge={pge_bytes/HBM_GBPS/1e6:.2f} ms")

    rows = []

    # ---- phase: sampling ----------------------------------------------
    @jax.jit
    def sample_only(key, real):
        ids, ws, targets, valid = eng._sample_all_class_blocks(key, real)
        return ids[0].sum() + ws[0].sum()

    t = timeit(sample_only, key, real, reps=args_cli.reps)
    rows.append(("sample (all classes)", t, None))

    # ---- phase: real grads, scan vs vmap ------------------------------
    def real_grads_of(mp, key, real, mode):
        ids, ws, targets, valid = eng._sample_all_class_blocks(key, real)

        def one(ids_c, ws_c, tgt, vld):
            block = BlockSample(node_ids=ids_c, weights=ws_c)
            feat_deep = jnp.take(real.features, block.node_ids[0], axis=0)
            y = jnp.take(real.labels_real, tgt)

            def loss_of(p):
                out = eng.model.apply(p, feat_deep, block)
                return masked_nll(out, y, vld)

            return jax.grad(loss_of)(mp)

        if mode == "vmap":
            return jax.vmap(one)(ids, ws, targets, valid)
        def body(acc, inp):
            g = one(*inp)
            return acc, jax.tree.map(lambda a: a.sum(), g)
        _, out = jax.lax.scan(body, 0.0, (ids, ws, targets, valid))
        return out

    for mode in ("scan", "vmap"):
        fn = jax.jit(lambda mp, k, r, m=mode: jax.tree.map(
            lambda a: a.sum(), real_grads_of(mp, k, r, m)))
        t = timeit(fn, model_params, key, real, reps=args_cli.reps)
        rows.append((f"real grads [{mode}]", t, real_flops))

    # ---- phase: syn grads (incl. nested grad), scan vs vmap -----------
    adj_syn = eng.syn_adj_norm(pge_params, feat_syn)
    adj_syn = jax.block_until_ready(adj_syn)

    def syn_match_of(fs, adj, mp, mode):
        """sum_c coeff_c * match(gw_syn_c, gw_syn_c_detached) — isolates
        the syn-side double-backward cost without the real phase."""
        def one(mask, coeff):
            def loss_of(p):
                out = eng.model.apply(p, fs, adj)
                return masked_nll(out, eng.labels_syn, mask)
            g = jax.grad(loss_of)(mp)
            gd = jax.lax.stop_gradient(g)
            return coeff * match_loss(g, gd, eng.args.dis_metric)

        if mode == "vmap":
            return jnp.sum(jax.vmap(one)(eng.class_masks, eng.coeffs))
        def body(acc, inp):
            return acc + one(*inp), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0),
                              (eng.class_masks, eng.coeffs))
        return tot

    for mode in ("scan", "vmap"):
        fn = jax.jit(lambda fs, adj, mp, m=mode: jax.grad(
            lambda f: syn_match_of(f, adj, mp, m))(fs).sum())
        t = timeit(fn, feat_syn, adj_syn, model_params, reps=args_cli.reps)
        rows.append((f"syn grads+nested [{mode}]", t, syn_flops))

    # ---- phase: PGE fwd + grad ----------------------------------------
    fn = jax.jit(lambda pp, fs: jax.grad(
        lambda f: eng.syn_adj_norm(pp, f).sum())(fs).sum())
    t = timeit(fn, pge_params, feat_syn, reps=args_cli.reps)
    rows.append(("pge fwd+bwd", t, pge_flops))

    # ---- full outer step: current (scan) vs vmap ----------------------
    opt = optax.adam(args.lr_feat)
    opt_state = opt.init(feat_syn)

    def full_step(mp, fs, pp, os_, key, real):
        def objective(f, p):
            adj_norm = eng.syn_adj_norm(p, f)
            return eng.match_loss_total(mp, f, adj_norm, key, real)
        loss, (g_f, g_p) = jax.value_and_grad(
            objective, argnums=(0, 1))(fs, pp)
        updates, os2 = opt.update(g_f, os_, fs)
        return optax.apply_updates(fs, updates), os2, loss

    fn = jax.jit(full_step)
    t_full = timeit(fn, model_params, feat_syn, pge_params, opt_state, key,
                    real, reps=args_cli.reps)
    rows.append(("FULL outer step (engine)", t_full, total_flops))

    # ---- report -------------------------------------------------------
    print(f"\n{'phase':<28}{'ms':>9}{'GFLOP':>8}{'TF/s':>8}{'MFU%':>7}")
    for name, t, fl in rows:
        if fl:
            print(f"{name:<28}{t*1e3:>9.2f}{fl/1e9:>8.1f}"
                  f"{fl/t/1e12:>8.1f}{fl/t/PEAK_F32*100:>7.1f}")
        else:
            print(f"{name:<28}{t*1e3:>9.2f}{'-':>8}{'-':>8}{'-':>7}")
    print(f"\nfull step: {t_full*1e3:.2f} ms -> {1/t_full:.1f} steps/s")


if __name__ == "__main__":
    main()
