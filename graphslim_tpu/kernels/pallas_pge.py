"""Fused Pallas kernel for PGE pair scoring — the GCond hot op.

The PGE generator (reference ``graphslim/models/parametrized_adj.py``)
scores every (i, j) synthetic-node pair with an MLP.  At arxiv scale
(n_syn ≈ 1354, nhid 256) the XLA formulation is HBM-bound: every hidden
layer materializes an [n², nhid] tensor (≈1.9 GB of traffic per layer per
pass), which measured ~19 ms/forward on v5e against ~0.7 ms of MXU time.

This kernel fuses the whole pair MLP per (TI × TJ) tile of the score
matrix: the pair activations live only in VMEM, and the kernel reads just
the factorized row/col projections ``a = x·W₀ₐ`` / ``b = x·W₀ᵦ + bias₀``
(n × nhid each) and writes the n × n score matrix.  Matmuls run in bf16
on the MXU with f32 accumulation.

BatchNorm statistics are computed over each tile's pair population
(TI·TJ = 2048 pairs).  The reference's own statistics population is an
artifact of its chunking (all pairs, or n²/5 for reddit,
``parametrized_adj.py:41-55``); the XLA path here uses per-row-block
populations.  Tile-local statistics keep both passes single-sweep and
make the custom backward self-contained per tile.

The backward pass is a second Pallas kernel (custom_vjp): it recomputes
the tile's forward (rematerialization — nothing but a/b/params is saved),
then backpropagates through the final dot, BN (batch-stats backward) and
the hidden matmuls, accumulating dW/dγ/dβ in revisited output blocks and
d(a) across the fast grid axis; d(b) partials per i-row are reduced by
XLA afterwards.

Used automatically by ``models/pge.py`` on TPU for n ≥ 512; the XLA path
remains the fallback (CPU tests, tiny graphs, interpret-mode parity
tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TI = 16          # score-tile rows   (f32 sublane multiple)
TJ = 128         # score-tile cols   (lane width)
EPS = 1e-5       # BatchNorm epsilon (torch default, reference BN1d)
MM_DTYPE = jnp.bfloat16   # matmul input dtype (f32 accumulation either way)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_to(x: jax.Array, m: int) -> jax.Array:
    pad = (-x.shape[0]) % m
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _pair_mask(i, j, n: int, P: int, H: int):
    """Valid-pair mask in (P, H) layout (Mosaic: no (P,1) vectors)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (P, H), 0)
    gi = i * TI + p // TJ
    gj = j * TJ + p % TJ
    return ((gi < n) & (gj < n)).astype(jnp.float32)


def _fwd_kernel(n: int, L2: int,
                a_ref, b_ref, wmid_ref, bmid_ref, gamma_ref, beta_ref,
                wlast_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    a = a_ref[:]                      # (TI, H)
    b = b_ref[:]                      # (TJ, H)
    H = a.shape[1]
    P = TI * TJ

    # The kernel is VPU-bound (measured 18% of bf16 MXU peak, benchmark/
    # probe_step_phases.py): the elementwise BN/mask chain dominates the
    # per-layer dot.  Two VPU savings: (1) interior tiles — all but the
    # last row/col tile, ~90% at arxiv scale — skip the mask entirely;
    # (2) BN+affine folds to one fused multiply-add (h·scale + shift
    # with scale = invstd·γ, shift = β − mean·scale) instead of
    # materializing xhat.
    def compute(masked: bool):
        h = (a[:, None, :] + b[None, :, :]).reshape(P, H)
        if masked:
            mask = _pair_mask(i, j, n, P, H)
            count = jnp.maximum(jnp.sum(mask) / H, 1.0)
        for l in range(L2 + 1):
            if l > 0:
                h = jnp.dot(h.astype(MM_DTYPE),
                            wmid_ref[l - 1].astype(MM_DTYPE),
                            preferred_element_type=jnp.float32) \
                    + bmid_ref[l - 1]
            if masked:
                hm = h * mask
                mean = jnp.sum(hm, axis=0) / count
                var = jnp.sum(hm * hm, axis=0) / count - mean * mean
            else:
                mean = jnp.sum(h, axis=0) / P
                var = jnp.sum(h * h, axis=0) / P - mean * mean
            scale = jax.lax.rsqrt(var + EPS) * gamma_ref[l]
            shift = beta_ref[l] - mean * scale
            h = jnp.maximum(h * scale + shift, 0.0)
        return jnp.sum((h * wlast_ref[0]).reshape(TI, TJ, H), axis=2)

    full = ((i + 1) * TI <= n) & ((j + 1) * TJ <= n)

    @pl.when(full)
    def _():
        out_ref[:] = compute(False)

    @pl.when(jnp.logical_not(full))
    def _():
        out_ref[:] = compute(True)


def _fwd(a, b, wmid, bmid, gamma, beta, wlast, *, n: int, interpret: bool):
    """a: [n,H] f32, b: [n,H], wmid: [L2,H,H], bmid: [L2,H],
    gamma/beta: [L2+1,H], wlast: [1,H] → scores [n,n] (no final bias)."""
    H = a.shape[1]
    L2 = wmid.shape[0]
    ap = _pad_to(a, TI)
    bp = _pad_to(b, TJ)
    ni, nj = ap.shape[0] // TI, bp.shape[0] // TJ
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n, L2),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((TI, H), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ, H), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L2, H, H), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L2, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L2 + 1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L2 + 1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TI, TJ), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ap.shape[0], bp.shape[0]),
                                       jnp.float32),
        interpret=interpret,
    )(ap, bp, wmid, bmid, gamma, beta, wlast)
    return out[:n, :n]


# ---------------------------------------------------------------------------
# Backward kernel (recompute + tile-local BN backward)
# ---------------------------------------------------------------------------

def _bwd_kernel(n: int, L2: int,
                a_ref, b_ref, wmid_ref, bmid_ref, gamma_ref, beta_ref,
                wlast_ref, g_ref,
                da_ref, dbp_ref, dwmid_ref, dbmid_ref, dgamma_ref,
                dbeta_ref, dwlast_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    first = (i == 0) & (j == 0)

    a = a_ref[:]
    b = b_ref[:]
    H = a.shape[1]
    P = TI * TJ

    def compute(masked: bool):
        """Recompute forward + full backward for this tile.  The
        ``masked=False`` interior-tile path (all but the last row/col
        tile) drops every mask multiply — the VPU chain dominates the
        kernel (see _fwd_kernel)."""
        if masked:
            mask = _pair_mask(i, j, n, P, H)
            count = jnp.maximum(jnp.sum(mask) / H, 1.0)
        else:
            count = float(P)

        # --- recompute forward, keeping per-layer residuals -------------
        h = (a[:, None, :] + b[None, :, :]).reshape(P, H)
        xhats = []
        invstds = []
        inputs = []       # matmul inputs (post-relu of previous layer)
        for l in range(L2 + 1):
            if l > 0:
                inputs.append(h)
                h = jnp.dot(h.astype(MM_DTYPE),
                            wmid_ref[l - 1].astype(MM_DTYPE),
                            preferred_element_type=jnp.float32) \
                    + bmid_ref[l - 1]
            hm = h * mask if masked else h
            mean = jnp.sum(hm, axis=0) / count
            var = jnp.sum(hm * hm, axis=0) / count - mean * mean
            invstd = jax.lax.rsqrt(var + EPS)
            xhat = (h - mean) * invstd
            xhats.append(xhat)
            invstds.append(invstd)
            h = jnp.maximum(xhat * gamma_ref[l] + beta_ref[l], 0.0)

        # --- backward ---------------------------------------------------
        g = jnp.broadcast_to(g_ref[:][:, :, None],
                             (TI, TJ, H)).reshape(P, H)       # (P,H)
        if masked:
            g = g * mask
        dwlast = jnp.sum(h * g, axis=0, keepdims=True)        # (1,H)
        dh = g * wlast_ref[0]                                 # (P,H)

        dwmids = [None] * L2
        dbmids = [None] * L2
        dgammas = []
        dbetas = []
        for l in range(L2, -1, -1):
            xhat = xhats[l]
            pre_relu = xhat * gamma_ref[l] + beta_ref[l]
            dh = jnp.where(pre_relu > 0.0, dh, 0.0)
            if masked:
                dh = dh * mask
            dgammas.append(jnp.sum(dh * xhat, axis=0, keepdims=True))
            dbetas.append(jnp.sum(dh, axis=0, keepdims=True))
            # batch-stats BN backward (population of size `count`)
            dxhat = dh * gamma_ref[l]
            m1 = jnp.sum(dxhat, axis=0) / count
            m2 = jnp.sum(dxhat * xhat, axis=0) / count
            dh = (dxhat - m1 - xhat * m2) * invstds[l]
            if masked:
                dh = dh * mask
            if l > 0:
                x_in = inputs[l - 1]
                # x_inᵀ·dh and dh·Wᵀ as dot_general (no transposed copies)
                dwmids[l - 1] = jax.lax.dot_general(
                    x_in.astype(MM_DTYPE), dh.astype(MM_DTYPE),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dbmids[l - 1] = jnp.sum(dh, axis=0, keepdims=True)
                dh = jax.lax.dot_general(
                    dh.astype(MM_DTYPE),
                    wmid_ref[l - 1].astype(MM_DTYPE),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
        dgammas.reverse()
        dbetas.reverse()

        dh0 = dh.reshape(TI, TJ, H)
        da_tile = jnp.sum(dh0, axis=1)                  # (TI, H)
        db_tile = jnp.sum(dh0, axis=0)                  # (TJ, H)
        return (da_tile, db_tile, dwmids, dbmids, dgammas, dbetas,
                dwlast)

    def emit(res):
        da_tile, db_tile, dwmids, dbmids, dgammas, dbetas, dwlast = res

        # da: revisited consecutively across the fast (j) grid axis
        @pl.when(j == 0)
        def _():
            da_ref[:] = da_tile

        @pl.when(j != 0)
        def _():
            da_ref[:] += da_tile

        dbp_ref[0] = db_tile

        # parameter grads: one block revisited by every grid step
        @pl.when(first)
        def _():
            for l in range(L2):
                dwmid_ref[l] = dwmids[l]
                dbmid_ref[l] = dbmids[l][0]
            for l in range(L2 + 1):
                dgamma_ref[l] = dgammas[l][0]
                dbeta_ref[l] = dbetas[l][0]
            dwlast_ref[:] = dwlast

        @pl.when(jnp.logical_not(first))
        def _():
            for l in range(L2):
                dwmid_ref[l] += dwmids[l]
                dbmid_ref[l] += dbmids[l][0]
            for l in range(L2 + 1):
                dgamma_ref[l] += dgammas[l][0]
                dbeta_ref[l] += dbetas[l][0]
            dwlast_ref[:] += dwlast

    full = ((i + 1) * TI <= n) & ((j + 1) * TJ <= n)

    @pl.when(full)
    def _():
        emit(compute(False))

    @pl.when(jnp.logical_not(full))
    def _():
        emit(compute(True))


def _bwd(a, b, wmid, bmid, gamma, beta, wlast, g, *, n: int,
         interpret: bool):
    H = a.shape[1]
    L2 = wmid.shape[0]
    ap = _pad_to(a, TI)
    bp = _pad_to(b, TJ)
    ni, nj = ap.shape[0] // TI, bp.shape[0] // TJ
    gp = jnp.zeros((ap.shape[0], bp.shape[0]), jnp.float32)
    gp = gp.at[:n, :n].set(g)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n, L2),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((TI, H), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TJ, H), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L2, H, H), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L2, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L2 + 1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L2 + 1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, TJ), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TI, H), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TJ, H), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L2, H, H), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L2, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L2 + 1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L2 + 1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ap.shape[0], H), jnp.float32),
            jax.ShapeDtypeStruct((ni, bp.shape[0], H), jnp.float32),
            jax.ShapeDtypeStruct((L2, H, H), jnp.float32),
            jax.ShapeDtypeStruct((L2, H), jnp.float32),
            jax.ShapeDtypeStruct((L2 + 1, H), jnp.float32),
            jax.ShapeDtypeStruct((L2 + 1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ],
        interpret=interpret,
    )(ap, bp, wmid, bmid, gamma, beta, wlast, gp)
    da_p, db_parts, dwmid, dbmid, dgamma, dbeta, dwlast = outs
    da = da_p[:n]
    db = jnp.sum(db_parts, axis=0)[:n]
    return da, db, dwmid, dbmid, dgamma, dbeta, dwlast


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def pair_scores(a, b, wmid, bmid, gamma, beta, wlast, n: int,
                interpret: bool = False):
    """Fused pair-MLP scores [n, n] (pre symmetrize/sigmoid, no last bias).

    BN statistics are per (TI·TJ)-pair tile (see module docstring).
    """
    return _fwd(a, b, wmid, bmid, gamma, beta, wlast, n=n,
                interpret=interpret)


def _pair_scores_fwd(a, b, wmid, bmid, gamma, beta, wlast, n, interpret):
    out = _fwd(a, b, wmid, bmid, gamma, beta, wlast, n=n,
               interpret=interpret)
    return out, (a, b, wmid, bmid, gamma, beta, wlast)


def _pair_scores_bwd(n, interpret, res, g):
    a, b, wmid, bmid, gamma, beta, wlast = res
    return _bwd(a, b, wmid, bmid, gamma, beta, wlast, g, n=n,
                interpret=interpret)


pair_scores.defvjp(_pair_scores_fwd, _pair_scores_bwd)


# ---------------------------------------------------------------------------
# Pure-JAX emulation with identical tile-local BN semantics (test oracle
# and CPU reference for the Pallas path).
# ---------------------------------------------------------------------------

def pair_scores_ref(a, b, wmid, bmid, gamma, beta, wlast, n: int):
    """Pure-JAX (differentiable, f32 matmuls) implementation of exactly
    the kernel's tiled math — the grad/forward oracle for tests."""
    ap = _pad_to(jnp.asarray(a, jnp.float32), TI)
    bp = _pad_to(jnp.asarray(b, jnp.float32), TJ)
    ni, nj = ap.shape[0] // TI, bp.shape[0] // TJ
    H = ap.shape[1]
    L2 = wmid.shape[0]
    rows = []
    for i in range(ni):
        cols = []
        for j in range(nj):
            at = ap[i * TI:(i + 1) * TI]
            bt = bp[j * TJ:(j + 1) * TJ]
            h = (at[:, None, :] + bt[None, :, :]).reshape(TI * TJ, H)
            gi = i * TI + np.arange(TI)[:, None]
            gj = j * TJ + np.arange(TJ)[None, :]
            mask = jnp.asarray(
                ((gi < n) & (gj < n)).astype(np.float32).reshape(-1, 1))
            count = jnp.maximum(jnp.sum(mask), 1.0)
            for l in range(L2 + 1):
                if l > 0:
                    h = h @ wmid[l - 1] + bmid[l - 1]
                hm = h * mask
                mean = jnp.sum(hm, axis=0) / count
                var = jnp.sum(hm * hm, axis=0) / count - mean * mean
                xhat = (h - mean) * jax.lax.rsqrt(var + EPS)
                h = jnp.maximum(xhat * gamma[l] + beta[l], 0.0)
            cols.append((h * wlast[0]).sum(1).reshape(TI, TJ))
        rows.append(jnp.concatenate(cols, axis=1))
    return jnp.concatenate(rows, axis=0)[:n, :n]
