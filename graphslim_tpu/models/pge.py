"""PGE — the parametrized structure generator for GCond-family methods.

Re-design of reference ``graphslim/models/parametrized_adj.py``: an MLP
scores every (i, j) feature pair; the score matrix is symmetrized, squashed
with sigmoid and zero-diagonal'd.  Instead of materializing the [n², 2d]
pair tensor (the reference chunks it into 5 Python slices for reddit,
``parametrized_adj.py:41-55``), rows are processed with ``lax.map`` over
row blocks — constant memory, one compiled program, BatchNorm statistics
per block exactly like the reference's per-chunk BN.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from graphslim_tpu.models import nn


@dataclasses.dataclass(frozen=True)
class PGEConfig:
    nfeat: int
    nnodes: int
    nhid: int = 128
    nlayers: int = 3
    row_block: int = 0      # 0 = single shot; else lax.map over row blocks
    backend: str = "auto"   # 'auto' | 'xla' | 'pallas'

    @staticmethod
    def for_dataset(nfeat: int, nnodes: int, dataset: str,
                    reduction_rate: float) -> "PGEConfig":
        """Reference width policy (``parametrized_adj.py:9-17``)."""
        nhid = 128
        if dataset in ("ogbn-arxiv", "arxiv", "flickr", "reddit"):
            nhid = 256
        if dataset == "reddit" and reduction_rate == 0.01:
            nhid = 128
        # Blocked + rematerialized scoring above 512 nodes keeps peak
        # activation memory at ~row_block·n·nhid regardless of n².
        row_block = 64 if nnodes > 512 else 0
        return PGEConfig(nfeat=nfeat, nnodes=nnodes, nhid=nhid,
                         row_block=row_block)


class PGE:
    def __init__(self, cfg: PGEConfig):
        self.cfg = cfg

    def init(self, key: jax.Array) -> dict:
        c = self.cfg
        dims = [c.nfeat * 2] + [c.nhid] * (c.nlayers - 1) + [1]
        keys = jax.random.split(key, len(dims) - 1)
        return {
            "layers": [nn.linear_init(k, a, b)
                       for k, a, b in zip(keys, dims[:-1], dims[1:])],
            "bns": [nn.bn_init(d) for d in dims[1:-1]],
        }

    def _score_rows(self, params, x_rows: jax.Array, x: jax.Array
                    ) -> jax.Array:
        """Scores for a block of rows against all columns.

        The first linear factorizes over the pair concatenation
        (``[x_i|x_j] W = x_i W_a + x_j W_b``), so the [nb·n, 2d] pair
        tensor is never materialized; matmuls run in bf16 on the MXU
        with f32 accumulation (this MLP is the FLOPs bulk of a GCond
        outer step at arxiv scale).
        """
        nb, n = x_rows.shape[0], x.shape[0]
        layers = params["layers"]
        w0 = layers[0]["w"].astype(jnp.bfloat16)
        d = x.shape[1]
        xr = x_rows.astype(jnp.bfloat16)
        xc = x.astype(jnp.bfloat16)
        a = jax.lax.dot(xr, w0[:d], preferred_element_type=jnp.float32)
        b = jax.lax.dot(xc, w0[d:], preferred_element_type=jnp.float32)
        h = (a[:, None, :] + b[None, :, :]).reshape(nb * n, -1)
        h = h + layers[0]["b"]
        for i, p in enumerate(layers[1:], start=1):
            h = nn.bn_apply(params["bns"][i - 1], h)
            h = jax.nn.relu(h)
            h = jax.lax.dot(h.astype(jnp.bfloat16),
                            p["w"].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) + p["b"]
        return h.reshape(nb, n)

    def _use_pallas(self) -> bool:
        c = self.cfg
        if c.backend == "pallas":
            return True
        if c.backend != "auto":
            return False
        return (c.nnodes >= 512 and c.nlayers >= 3
                and jax.default_backend() == "tpu")

    def _pallas_scores(self, params: dict, x: jax.Array) -> jax.Array:
        """Fused tile-resident pair MLP (kernels/pallas_pge.py): reads the
        factorized projections, writes only the n×n scores."""
        from graphslim_tpu.kernels import pallas_pge

        c = self.cfg
        layers = params["layers"]
        d = x.shape[1]
        w0 = layers[0]["w"]
        xf = x.astype(jnp.float32)
        a = xf @ w0[:d].astype(jnp.float32)
        b = xf @ w0[d:].astype(jnp.float32) + layers[0]["b"]
        wmid = jnp.stack([p["w"] for p in layers[1:-1]]) \
            if c.nlayers > 2 else jnp.zeros((0, c.nhid, c.nhid), jnp.float32)
        bmid = jnp.stack([p["b"] for p in layers[1:-1]]) \
            if c.nlayers > 2 else jnp.zeros((0, c.nhid), jnp.float32)
        gamma = jnp.stack([p["scale"] for p in params["bns"]])
        beta = jnp.stack([p["bias"] for p in params["bns"]])
        wlast = layers[-1]["w"].reshape(1, -1)
        scores = pallas_pge.pair_scores(a, b, wmid, bmid, gamma, beta,
                                        wlast, c.nnodes)
        return scores + layers[-1]["b"][0]

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        c = self.cfg
        n = c.nnodes
        if self._use_pallas():
            adj = self._pallas_scores(params, x)
        elif c.row_block:
            # Blocked scoring with rematerialization: backward recomputes
            # each block's MLP activations instead of keeping the full
            # [n², nhid] tensor live.
            score = jax.checkpoint(
                lambda xr: self._score_rows(params, xr, x))
            nb = c.row_block
            pad = (-n) % nb
            xp = x if pad == 0 else jnp.concatenate(
                [x, jnp.zeros((pad, x.shape[-1]), x.dtype)])
            blocks = xp.reshape(-1, nb, x.shape[-1])
            adj = jax.lax.map(score, blocks)
            adj = adj.reshape(-1, n)[:n]
        else:
            adj = self._score_rows(params, x, x)
        adj = (adj + adj.T) / 2
        adj = jax.nn.sigmoid(adj)
        adj = adj - jnp.diag(jnp.diag(adj))
        return adj

    def inference(self, params: dict, x: jax.Array) -> jax.Array:
        return jax.lax.stop_gradient(self.apply(params, x))
