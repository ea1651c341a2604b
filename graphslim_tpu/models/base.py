"""Model base: adjacency dispatch + the shared stacked-GNN skeleton.

The reference's quadruple calling convention (SparseTensor | dense 2-D |
batched dense 3-D | list of sampled blocks — ``graphslim/models/base.py:
51-78``) maps to one ``aggregate`` entry point over:

* :class:`graphslim_tpu.graph.SparseAdj` — SpMM kernel
* dense ``[n, n]`` — MXU matmul (synthetic condensed graphs)
* batched dense ``[B, n, n]`` — batched matmul (MSGC)
* :class:`graphslim_tpu.kernels.sample.BlockSample` — contiguous-slot
  weighted reshape-sum (sampled neighborhoods; no segment ops needed)
* ``None`` — identity (structure-free methods)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from graphslim_tpu import graph as G
from graphslim_tpu.kernels.ell import EllAdj
from graphslim_tpu.kernels.sample import BlockSample
from graphslim_tpu.models import nn


def aggregate(adj: Any, x: jax.Array) -> jax.Array:
    """One propagation step A @ x for any supported adjacency form."""
    if adj is None:
        return x
    if isinstance(adj, (G.SparseAdj, EllAdj)):
        return adj.matmul(x)
    if hasattr(adj, "matmul"):     # duck-typed (e.g. dist.DistAdj)
        return adj.matmul(x)
    adj = jnp.asarray(adj)
    if adj.ndim == 3 and x.ndim == 2:
        return jnp.einsum("bij,jd->bid", adj, x)
    return adj @ x


def aggregate_block(weights: jax.Array, x: jax.Array) -> jax.Array:
    """Aggregate one sampled-block level: ``weights [m_out, s]``,
    ``x [m_out * s, d]`` → ``[m_out, d]`` (slots of a target contiguous)."""
    m_out, s = weights.shape
    xr = x.reshape(m_out, s, x.shape[-1])
    return jnp.einsum("ms,msd->md", weights.astype(x.dtype), xr)


def block_level_adj(adj: Any, layer: int):
    """Per-layer adjacency for list/BlockSample forms; identity otherwise."""
    if isinstance(adj, BlockSample):
        return ("block", adj.weights[layer])
    # NB: SparseAdj/EllAdj are NamedTuples — check before list/tuple.
    if isinstance(adj, (list, tuple)) and not isinstance(
            adj, (G.SparseAdj, EllAdj)):
        return ("plain", adj[layer])
    return ("plain", adj)


def layer_aggregate(adj: Any, layer: int, x: jax.Array) -> jax.Array:
    kind, a = block_level_adj(adj, layer)
    if kind == "block":
        return aggregate_block(a, x)
    return aggregate(a, x)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static hyperparameters shared by the zoo (reference args subset)."""

    nfeat: int
    nhid: int
    nclass: int
    nlayers: int = 2
    dropout: float = 0.5
    alpha: float = 0.1          # APPNP teleport
    ntrans: int = 1             # SGC/APPNP transformation layers
    with_bn: bool = False
    activation: str = "relu"
    nheads: int = 8             # GAT
    trans_layers: int = 2       # SGFormer transformer depth
    multi_label: bool = False


class GNNModel:
    """Base: subclasses define ``init`` and ``_forward``.

    ``apply`` returns log-probabilities (log_softmax) like the reference,
    or sigmoid scores when ``multi_label``.
    """

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg

    # -- subclass hooks --------------------------------------------------
    def init(self, key: jax.Array) -> dict:
        raise NotImplementedError

    def _forward(self, params: dict, x: jax.Array, adj: Any, *,
                 training: bool, key: Optional[jax.Array]) -> jax.Array:
        raise NotImplementedError

    # -- public ----------------------------------------------------------
    def apply(self, params: dict, x: jax.Array, adj: Any, *,
              training: bool = False, key: Optional[jax.Array] = None
              ) -> jax.Array:
        out = self._forward(params, x, adj, training=training, key=key)
        out = out.reshape(-1, out.shape[-1])
        if self.cfg.multi_label:
            return jax.nn.sigmoid(out)
        return jax.nn.log_softmax(out, axis=-1)

    def embed(self, params: dict, x: jax.Array, adj: Any) -> jax.Array:
        """Pre-softmax output (used by model-based coresets)."""
        out = self._forward(params, x, adj, training=False, key=None)
        return out.reshape(-1, out.shape[-1])

    def layer_features(self, params: dict, x: jax.Array, adj: Any
                       ) -> list[jax.Array]:
        """Per-layer activations (distribution matching — GCDM).

        Subclasses with a stacked structure override; default returns the
        final embedding only.
        """
        return [self.embed(params, x, adj)]

    def _dropout_keys(self, key: Optional[jax.Array], n: int):
        if key is None:
            return [None] * n
        return list(jax.random.split(key, n))
