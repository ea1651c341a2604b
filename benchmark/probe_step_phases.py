"""Drill-down probes for the two outer-step hotspots found by
outer_step_floor.py: sampling (14.8 ms, no FLOPs) and PGE (17.1 ms).

Sampling hypotheses: threefry PRNG cost vs gather cost.
PGE hypotheses: fwd vs bwd split; BN/relu VPU chain vs MXU dots.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

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

from graphslim_tpu.config import Args, finalize
from graphslim_tpu.data import load
from graphslim_tpu.reduce.registry import create_reducer


def timeit(fn, *args, reps=20, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


print(f"backend={jax.default_backend()}", file=sys.stderr)
ds = load("ogbn-arxiv", split="fixed", seed=0)
args = finalize(
    Args(dataset="ogbn-arxiv", method="gcond", save_path="/tmp/graft_floor",
         run_eval=1, run_inter_eval=1, init="random"),
    explicit={"run_eval", "run_inter_eval", "init"})
eng = create_reducer("gcond", ds, args)
real = eng.real
key = jax.random.key(0)
feat_syn = eng.init_feat_syn()
pge_params = eng.pge.init(key)

# ---------------- sampling drill-down ---------------------------------
C, B = len(eng.classes), eng.batch
fo = list(eng.fanouts)
sizes = [C * B]
for f in fo:
    sizes.append(sizes[-1] * (f + 1))

# (a) full sampler
fn_a = jax.jit(lambda k, r: jax.tree.map(
    lambda x: x.sum(), eng._sample_all_class_blocks(k, r)[0]))
print(f"sample full:            {timeit(fn_a, key, real)*1e3:8.2f} ms")

# (b) PRNG only: the randint calls the sampler makes, nothing else
def rng_only(k):
    k1, k2 = jax.random.split(k)
    tot = jax.random.randint(k1, (C, B), 0, 10_000).sum()
    kk = jax.random.split(k2, len(fo))
    for i, f in enumerate(fo):
        tot += jax.random.randint(kk[i], (sizes[i], f), 0, 10_000).sum()
    return tot

fn_b = jax.jit(rng_only)
print(f"prng only (threefry):   {timeit(fn_b, key)*1e3:8.2f} ms")

# (b2) rbg PRNG
def rng_rbg(k):
    tot = jnp.int32(0)
    kk = jax.random.split(k, len(fo))
    for i, f in enumerate(fo):
        tot += jax.random.randint(kk[i], (sizes[i], f), 0, 10_000).sum()
    return tot

kr = jax.random.key(0, impl="rbg")
fn_b2 = jax.jit(rng_rbg)
print(f"prng only (rbg):        {timeit(fn_b2, kr)*1e3:8.2f} ms")

# (c) gathers only: same index traffic, fixed random offsets
fixed = [jnp.asarray(
    np.random.default_rng(i).integers(0, 10_000, size=(sizes[i], f)),
    jnp.int32) for i, f in enumerate(fo)]
indptr, col = real.adj_off.indptr, real.adj_off.col
vals = real.adj_off.values_or_ones()

def gathers_only(targets0):
    frontier = targets0
    tot = jnp.float32(0.0)
    for i, f in enumerate(fo):
        start = jnp.take(indptr, frontier)
        deg = jnp.take(indptr, frontier + 1) - start
        off = jnp.minimum(fixed[i][: frontier.shape[0]] % jnp.maximum(
            deg, 1)[:, None], jnp.maximum(deg - 1, 0)[:, None])
        pos = start[:, None] + off
        src = jnp.take(col, pos)
        tot += jnp.take(vals, pos).sum()
        frontier = src.reshape(-1)
    return tot

t0 = jnp.asarray(np.random.default_rng(0).integers(0, 160_000, C * B),
                 jnp.int32)
fn_c = jax.jit(gathers_only)
print(f"gathers only:           {timeit(fn_c, t0)*1e3:8.2f} ms")

# ---------------- PGE drill-down --------------------------------------
fwd = jax.jit(lambda pp, fs: eng.pge.apply(pp, fs).sum())
print(f"pge fwd only:           {timeit(fwd, pge_params, feat_syn)*1e3:8.2f} ms")
fb = jax.jit(lambda pp, fs: jax.grad(
    lambda f: eng.pge.apply(pp, f).sum())(fs).sum())
print(f"pge fwd+bwd:            {timeit(fb, pge_params, feat_syn)*1e3:8.2f} ms")

# raw kernel fwd (no symmetrize/sigmoid)
from graphslim_tpu.kernels import pallas_pge

layers = pge_params["layers"]
d = feat_syn.shape[1]
w0 = layers[0]["w"]
a = feat_syn @ w0[:d]
b = feat_syn @ w0[d:] + layers[0]["b"]
wmid = jnp.stack([p["w"] for p in layers[1:-1]])
bmid = jnp.stack([p["b"] for p in layers[1:-1]])
gamma = jnp.stack([p["scale"] for p in pge_params["bns"]])
beta = jnp.stack([p["bias"] for p in pge_params["bns"]])
wlast = layers[-1]["w"].reshape(1, -1)
n = eng.n_syn
kf = jax.jit(lambda *xs: pallas_pge.pair_scores(*xs, n).sum())
print(f"kernel fwd only:        "
      f"{timeit(kf, a, b, wmid, bmid, gamma, beta, wlast)*1e3:8.2f} ms")
kb = jax.jit(lambda a_, *xs: jax.grad(
    lambda aa: pallas_pge.pair_scores(aa, *xs, n).sum())(a_).sum())
print(f"kernel fwd+bwd:         "
      f"{timeit(kb, a, b, wmid, bmid, gamma, beta, wlast)*1e3:8.2f} ms")

# MXU-only reference: the same dot sequence without BN/mask/relu chains,
# as one giant batched matmul — the pure-MXU floor for the pair MLP
P = 1360 * 1408


def mxu_floor(a_, b_, wmid_, wlast_):
    h = (a_[:, None, :] + b_[None, :, :]).reshape(-1, a_.shape[1])
    h = h.astype(jnp.bfloat16)
    for l in range(wmid_.shape[0]):
        h = jax.lax.dot(h, wmid_[l].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
    return jnp.sum(h * wlast_[0].astype(jnp.bfloat16))


mf = jax.jit(mxu_floor)
try:
    print(f"XLA dot-chain (no BN):  "
          f"{timeit(mf, a, b, wmid, wlast, reps=5)*1e3:8.2f} ms")
except Exception as e:
    print(f"XLA dot-chain failed: {e!r}")
