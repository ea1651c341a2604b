"""GAT edge-softmax design probe on the real chip (VERDICT r1 item 9).

Measures one full GAT attention layer (scores + edge softmax + weighted
aggregation) at ogbn-arxiv scale, comparing:
  1. segment path: edge-list gathers + segment_max/segment_sum softmax +
     message scatter (the PyG-equivalent formulation);
  2. ELL path: row-local softmax on padded degree buckets + gather+einsum
     aggregation (kernels/ell.attention_ell — zero scatters).

Also probes the on-device fixed-fanout sampler vs a host-side numpy
equivalent (VERDICT: "sampler never measured").  Results land in
docs/PERF.md.  Run exclusively (nothing else on the chip).
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


_PEEK = None


def _drain(out):
    """Tiny-slice readback: block_until_ready returns early on the
    tunneled backend; only a data readback drains the queue, and a
    64-element jitted slice is milliseconds once the channel is warm."""
    global _PEEK
    if _PEEK is None:
        _PEEK = jax.jit(lambda o: jnp.sum(o.ravel()[:64]))
    return float(np.asarray(_PEEK(jax.tree_util.tree_leaves(out)[0])))


def bench(fn, *args, reps=20):
    out = fn(*args)
    _drain(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _drain(out)
    return (time.time() - t0) / reps


def main() -> None:
    from graphslim_tpu.data import load
    from graphslim_tpu.kernels.ell import attention_ell
    from graphslim_tpu.kernels.segment import segment_softmax

    print("backend:", jax.default_backend(), flush=True)
    ds = load("ogbn-arxiv", split="fixed", seed=0)
    sp = ds.adj_norm()
    ell = ds.adj_norm_ell()
    n = ds.n_nodes
    e = sp.nnz

    def seg_layer(row, col, val, a_d, a_s, f):
        scores = jnp.take(a_d, row, axis=0) + jnp.take(a_s, col, axis=0)
        scores = jax.nn.leaky_relu(scores, 0.2)
        att = segment_softmax(scores, row, n, indices_are_sorted=True)
        att = att * val[:, None]
        msgs = jnp.take(f, col, axis=0) * att[..., None]
        return jax.ops.segment_sum(msgs, row, num_segments=n,
                                   indices_are_sorted=True)

    seg = jax.jit(seg_layer)
    ell_fn = jax.jit(lambda el, a_d, a_s, f: attention_ell(el, a_d, a_s, f))

    for H, h in ((8, 8), (8, 32)):
        feat = jax.random.normal(jax.random.key(0), (n, H, h), jnp.float32)
        a_dst = jax.random.normal(jax.random.key(1), (n, H), jnp.float32)
        a_src = jax.random.normal(jax.random.key(2), (n, H), jnp.float32)
        for name, fn, args in (
                ("segment", seg, (sp.row, sp.col, sp.val, a_dst, a_src,
                                  feat)),
                ("ELL    ", ell_fn, (ell, a_dst, a_src, feat))):
            try:
                t = bench(fn, *args, reps=10)
                print(f"{name} attention (E={e}, H={H}, h={h}): "
                      f"{t*1e3:7.2f} ms = {e / t / 1e6:6.1f} Medges/s",
                      flush=True)
            except Exception as ex:
                print(f"{name} attention (H={H}, h={h}): FAILED "
                      f"{repr(ex)[:160]}", flush=True)

    # --- sampler probe: on-device fanout sampler vs host numpy ----------
    from graphslim_tpu.kernels.sample import neighbor_sample_block
    h_adj = ds.adj_norm_host()
    indptr = jnp.asarray(h_adj.indptr)
    col = jnp.asarray(h_adj.col)
    val = jnp.asarray(h_adj.val)
    self_val = jnp.ones((n,), jnp.float32)
    seeds = jax.random.randint(jax.random.key(3), (1024,), 0, n)
    samp = jax.jit(lambda k, s: neighbor_sample_block(
        k, indptr, col, val, self_val, s, (15, 10)))
    t = bench(samp, jax.random.key(4), seeds, reps=20)
    print(f"on-device sampler (1024 seeds, fanouts 15,10): {t*1e3:7.2f} ms",
          flush=True)

    np_indptr = np.asarray(h_adj.indptr)
    np_col = np.asarray(h_adj.col)
    rng = np.random.default_rng(0)
    np_seeds = np.asarray(seeds)

    def host_sample(seeds_np):
        out = np.zeros((seeds_np.shape[0], 15), np.int32)
        for i, s in enumerate(seeds_np):
            nb = np_col[np_indptr[s]:np_indptr[s + 1]]
            if nb.size:
                out[i] = rng.choice(nb, 15, replace=True)
        return out

    t0 = time.time()
    for _ in range(5):
        hop1 = host_sample(np_seeds)                 # 1024 x 15
        host_sample(hop1.reshape(-1)[:4096])         # capped 2nd hop
    t = (time.time() - t0) / 5
    print(f"host numpy sampler (PARTIAL 2-hop, no device transfer "
          f"cost counted): {t*1e3:7.2f} ms", flush=True)


def probe_agg_variants() -> None:
    """A/B the bucket aggregation lowering: out = sum_k att*g.

    The einsum('nkh,nkhd->nhd') formulation measured 417.7 ms (h=8) —
    XLA lowers it as batched dot_generals with tiny contraction dims
    (MXU padding waste).  Candidate: VPU mul+reduce over the gathered
    block.  Gather itself is transaction-bound ~20 ms at this scale
    (docs/PERF.md), so the winner should land near that.
    """
    from graphslim_tpu.data import load
    from graphslim_tpu.kernels.segment import segment_softmax

    ds = load("ogbn-arxiv", seed=0)
    ell = ds.adj_norm_ell()
    n = ds.n_nodes
    H, h = 8, 8
    feat = jax.random.normal(jax.random.key(0), (n, H, h), jnp.float32)
    a_dst = jax.random.normal(jax.random.key(1), (n, H), jnp.float32)
    a_src = jax.random.normal(jax.random.key(2), (n, H), jnp.float32)

    def attn(agg):
        def run(ell, a_d_all, a_s_all, feat):
            parts = []
            for b in ell.buckets:
                a_d = jnp.take(a_d_all, b.rows, axis=0)
                a_s = jnp.take(a_s_all, b.idx, axis=0)
                s = jax.nn.leaky_relu(a_d[:, None, :] + a_s, 0.2)
                mask = (b.val != 0.0)[..., None]
                s = jnp.where(mask, s, -1e9)
                s = s - jax.lax.stop_gradient(
                    jnp.max(s, axis=1, keepdims=True))
                e = jnp.where(mask, jnp.exp(s), 0.0)
                att = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True),
                                      1e-16)
                att = att * b.val[..., None]
                g = jnp.take(feat, b.idx, axis=0)      # [nb, K, H, h]
                if agg == "einsum":
                    parts.append(jnp.einsum("nkh,nkhd->nhd", att, g))
                else:
                    parts.append(jnp.sum(g * att[..., None], axis=1))
            if ell.heavy_col is not None:
                a_d = jnp.take(jnp.take(a_d_all, ell.heavy_rows, axis=0),
                               ell.heavy_row, axis=0)
                a_s = jnp.take(a_s_all, ell.heavy_col, axis=0)
                s = jax.nn.leaky_relu(a_d + a_s, 0.2)
                att = segment_softmax(s, ell.heavy_row, ell.n_heavy,
                                      indices_are_sorted=True)
                att = att * ell.heavy_val[:, None]
                g = jnp.take(feat, ell.heavy_col, axis=0)
                parts.append(jax.ops.segment_sum(
                    g * att[..., None], ell.heavy_row,
                    num_segments=ell.n_heavy, indices_are_sorted=True))
            parts.append(jnp.zeros((1, H, h), feat.dtype))
            return jnp.take(jnp.concatenate(parts, 0), ell.inv_perm,
                            axis=0)
        return jax.jit(run)

    ref = None
    for agg in ("mulsum", "einsum"):
        f = attn(agg)
        try:
            out = f(ell, a_dst, a_src, feat)
            _drain(out)
            if ref is None:
                ref = out
            else:
                d = float(np.asarray(jax.jit(
                    lambda x, y: jnp.max(jnp.abs(x - y)))(out, ref)))
                print(f"{agg} vs ref max|diff| {d:.2e}", flush=True)
            t = bench(f, ell, a_dst, a_src, feat, reps=10)
            print(f"{agg}: {t*1e3:7.1f} ms = "
                  f"{ds.adj.nnz / t / 1e6:6.1f} Medges/s", flush=True)
        except Exception as ex:
            print(f"{agg} FAILED {repr(ex)[:160]}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("all", "attn"):
        main()
    if mode in ("agg",):
        probe_agg_variants()
