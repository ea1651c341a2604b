"""IGNR — graphon learner used by SGDD.

Re-design of reference ``graphslim/models/ignr.py``: two edge-MLP stacks
(feature pairs and a 2-D meshgrid positional net) mixed per layer, with a
learnable Sinkhorn-normalized transport plan ``P`` and a Laplacian
spectral-OT loss via SVD pseudo-inverses (``ignr.py:13-46,190-208``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from graphslim_tpu.models import nn


def _pinv_parts(mx: jax.Array, eps: float = 0.009):
    """(M^-1/2, M^-1) through thresholded SVD (reference ``mx_inv`` /
    ``mx_inv_sqrt``)."""
    U, D, Vt = jnp.linalg.svd(mx)
    dmin = jnp.min(D)
    inv = jnp.where(D > dmin, 1.0 / jnp.maximum(D, 1e-12), 0.0)
    inv = jnp.where(dmin >= eps, 1.0 / jnp.maximum(D, 1e-12), inv)
    inv_rt = U @ jnp.diag(jnp.sqrt(inv)) @ Vt
    pinv = U @ jnp.diag(inv) @ Vt
    return inv_rt, pinv


def mx_inv(mx: jax.Array) -> jax.Array:
    return _pinv_parts(mx)[1]


def _mgrid(n: int) -> np.ndarray:
    g = np.stack(np.mgrid[:n, :n], axis=-1).astype(np.float32)
    g = g / max(n - 1, 1)
    g = (g - 0.5) * 2.0
    return g.reshape(-1, 2)


@dataclasses.dataclass(frozen=True)
class IGNRConfig:
    node_feature: int
    nnodes: int
    nfeat: int = 128
    ep_ratio: float = 0.5
    sinkhorn_iter: int = 10
    mx_size: int = 100


class IGNR:
    def __init__(self, cfg: IGNRConfig):
        self.cfg = cfg
        self._coords = jnp.asarray(_mgrid(cfg.nnodes))

    def init(self, key: jax.Array) -> dict:
        c = self.cfg
        k = jax.random.split(key, 7)
        return {
            "net0": [nn.linear_init(k[0], c.node_feature * 2, c.nfeat),
                     nn.linear_init(k[1], c.nfeat, c.nfeat),
                     nn.linear_init(k[2], c.nfeat, 1)],
            "bn0": [nn.bn_init(c.nfeat), nn.bn_init(c.nfeat)],
            "net1": [nn.linear_init(k[3], 2, c.nfeat),
                     nn.linear_init(k[4], c.nfeat, c.nfeat),
                     nn.linear_init(k[5], c.nfeat, 1)],
            "bn1": [nn.bn_init(c.nfeat), nn.bn_init(c.nfeat)],
            "P": jax.random.uniform(k[6], (c.mx_size, c.nnodes)),
        }

    def _adj(self, params: dict, feats: jax.Array) -> jax.Array:
        cfg = self.cfg
        n = cfg.nnodes
        idx = jnp.arange(n)
        c = jnp.concatenate([
            jnp.repeat(feats, n, axis=0),
            jnp.tile(feats, (n, 1))], axis=1)
        x = self._coords
        for layer in range(3):
            c = nn.linear_apply(params["net0"][layer], c)
            x = nn.linear_apply(params["net1"][layer], x)
            if layer != 2:
                c = jax.nn.relu(nn.bn_apply(params["bn0"][layer], c))
                x = jax.nn.relu(nn.bn_apply(params["bn1"][layer], x))
                x = x * c
            else:
                x = (1 - cfg.ep_ratio) * x + cfg.ep_ratio * c
        adj = x.reshape(n, n)
        adj = (adj + adj.T) / 2
        adj = jax.nn.sigmoid(adj)
        return adj - jnp.diag(jnp.diag(adj))

    def apply(self, params: dict, feats: jax.Array) -> jax.Array:
        return self._adj(params, feats)

    def inference(self, params: dict, feats: jax.Array) -> jax.Array:
        return jax.lax.stop_gradient(self._adj(params, feats))

    def opt_loss(self, params: dict, adj: jax.Array,
                 lx_inv: jax.Array) -> jax.Array:
        """Spectral OT distance between the real Laplacian corner and the
        synthetic graph (reference ``ignr.py:190-208``)."""
        cfg = self.cfg
        ly_inv_rt, ly_inv = _pinv_parts(adj)
        # NB: the reference normalizes a Sinkhorn copy of P but then uses
        # the RAW parameter in the bilinear form (``ignr.py:196-204``);
        # we mirror that exactly.
        P = params["P"]
        inner = ly_inv_rt @ P.T @ lx_inv @ P @ ly_inv_rt
        evals = jnp.linalg.eigvalsh((inner + inner.T) / 2)
        return jnp.abs(jnp.trace(ly_inv) * cfg.nnodes
                       - 2 * jnp.sqrt(jnp.clip(evals, 2e-20)).sum())
