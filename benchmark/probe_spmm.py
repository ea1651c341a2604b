"""SpMM design-space probes on the real chip (VERDICT round-1 item 4).

Measures, at ogbn-arxiv scale:
  1. XLA gather throughput vs element width (f32/bf16, d=64/128/256) —
     is the gather transaction-bound (rows/s flat) or bytes-bound?
  2. Mosaic VMEM-resident dynamic row gather (the enabler for a
     cache-blocked Pallas SpMM that streams x tiles at full HBM BW).
  3. Current ELL SpMM for reference + SOL%.

Run exclusively (nothing else on the chip); results land in
docs/PERF.md.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))

N = 169_343
E = 32_768          # gathered rows per probe call


_PEEK = None


def _drain(out):
    """Force the remote execution chain to finish.

    block_until_ready returns early on the tunneled backend (measured
    2026-08-21: 30 chained 1024^3 matmuls "ready" in 0.9 ms); only a data
    readback actually drains the queue, and tiny slices are cheap once
    the d2h channel is warm.
    """
    global _PEEK
    if _PEEK is None:
        _PEEK = jax.jit(lambda o: jnp.sum(o.ravel()[:64]))
    return float(np.asarray(_PEEK(out)))


def bench(fn, *args, reps=30):
    out = fn(*args)
    _drain(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _drain(out)
    return (time.time() - t0) / reps


def probe_xla_gather():
    key = jax.random.key(0)
    idx = jax.random.randint(jax.random.key(1), (4_600_000,), 0, N)
    g = jax.jit(lambda b, i: jnp.take(b, i, axis=0))
    for d in (64, 128, 256):
        for dt in (jnp.float32, jnp.bfloat16):
            big = jax.random.normal(key, (N, d), jnp.float32).astype(dt)
            dtm = bench(g, big, idx, reps=10)
            rows = idx.shape[0] / dtm / 1e6
            gbs = idx.shape[0] * d * big.dtype.itemsize / dtm / 1e9
            print(f"xla gather d={d} {big.dtype.name}: {dtm*1e3:6.2f} ms "
                  f"= {rows:6.1f} Mrows/s = {gbs:6.1f} GB/s", flush=True)


def probe_vmem_gather():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TS, D = 4096, 128

    def kern(idx_ref, x_ref, out_ref):
        out_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def vmem_gather(idx, x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((E, D), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, x)

    x = jax.random.normal(jax.random.key(0), (TS, D), jnp.float32)
    idx = jax.random.randint(jax.random.key(1), (E,), 0, TS, jnp.int32)
    t0 = time.time()
    try:
        out = vmem_gather(idx, x)
        jax.block_until_ready(out)
        print(f"vmem gather compiled in {time.time()-t0:.1f}s", flush=True)
        ok = bool(jnp.allclose(out, jnp.take(x, idx, axis=0)))
        dtm = bench(vmem_gather, idx, x, reps=50)
        print(f"pallas vmem gather: {dtm*1e6:7.1f} us = "
              f"{E/dtm/1e6:6.1f} Mrows/s (correct={ok})", flush=True)
    except Exception as e:
        print(f"pallas vmem gather FAILED: {repr(e)[:300]}", flush=True)


def probe_ell():
    from graphslim_tpu.data import load

    ds = load("ogbn-arxiv", seed=0)
    ell = ds.adj_norm_ell()
    x = ds.feat
    f = jax.jit(lambda e, xx: e.matmul(xx))
    dtm = bench(f, ell, x, reps=20)
    print(f"ell spmm f32 d=128: {dtm*1e3:6.2f} ms = "
          f"{ds.adj.nnz/dtm/1e6:6.1f} Medges/s", flush=True)
    xb = x.astype(jnp.bfloat16)
    fb = jax.jit(lambda e, xx: e.matmul(xx))
    dtb = bench(fb, ell, xb, reps=20)
    print(f"ell spmm bf16 d=128: {dtb*1e3:6.2f} ms = "
          f"{ds.adj.nnz/dtb/1e6:6.1f} Medges/s", flush=True)


def probe_blocked():
    """Cache-blocked chunked-COO Pallas SpMM vs the ELL baseline
    (kernels/pallas_spmm_blocked.py — the round-2 re-attempt)."""
    from graphslim_tpu.data import load
    from graphslim_tpu.kernels.pallas_spmm_blocked import (
        build_blocked, spmm_blocked)

    ds = load("ogbn-arxiv", seed=0)
    h = ds.adj_norm_host()
    x = ds.feat
    ell = ds.adj_norm_ell()
    ref = jax.jit(lambda e, xx: e.matmul(xx))(ell, x)
    t_ell = bench(jax.jit(lambda e, xx: e.matmul(xx)), ell, x, reps=20)
    nnz = h.col.shape[0]
    print(f"ELL baseline: {t_ell*1e3:6.2f} ms = {nnz/t_ell/1e6:6.1f} "
          f"Medges/s", flush=True)
    # compiled cumsum path requires td == ts == chunk (Mosaic same-shape
    # dynamic_gather); kept for re-testing on future toolchains — on this
    # one the dynamic_gather crashes the AOT compiler beyond one vreg
    # and the kernel is REJECTED (docs/PERF.md round 3)
    for td, ts, chunk, scatter in ((4096, 4096, 4096, "cumsum"),
                                   (8192, 8192, 8192, "cumsum"),
                                   (256, 4096, 2048, "onehot")):
        try:
            t0 = time.time()
            bc = build_blocked(h.indptr, h.col, h.val, td=td, ts=ts,
                               chunk=chunk)
            slots = bc.dst_local.shape[0] * chunk
            print(f"build td={td} ts={ts} chunk={chunk}: "
                  f"{time.time()-t0:5.1f}s, chunks={bc.dst_local.shape[0]}"
                  f", fill={bc.fill:.3f}, slots={slots/1e6:.1f}M",
                  flush=True)
            if slots > 40e6:
                print("  -> skipped (padding blow-up)", flush=True)
                continue
            f = jax.jit(lambda b, xx: spmm_blocked(b, xx, scatter=scatter))
            out = f(bc, x)
            ok = float(np.asarray(jax.jit(
                lambda a, b: jnp.max(jnp.abs(a - b)))(out, ref)))
            t = bench(f, bc, x, reps=20)
            print(f"  blocked({scatter}): {t*1e3:6.2f} ms = "
                  f"{nnz/t/1e6:6.1f} Medges/s  max|diff|={ok:.2e}",
                  flush=True)
        except Exception as e:
            print(f"  blocked td={td} {scatter} FAILED: {repr(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "xla"):
        probe_xla_gather()
    if which in ("all", "vmem"):
        probe_vmem_gather()
    if which in ("all", "ell"):
        probe_ell()
    if which in ("all", "blocked"):
        probe_blocked()
