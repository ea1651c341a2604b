"""SNTK — structure-based neural tangent kernel (GCSNTK).

Re-design of reference ``graphslim/models/sntk.py``: the reference applies
the aggregation operator as a sparse Kronecker product acting on the
vectorized kernel (``sparse_kron`` + spmv, ``sntk.py:14-44``); by the
identity ``(E1 ⊗ E2) vec(S) = E1 S E2ᵀ`` this is two dense MXU matmuls —
no sparse Kronecker needed on TPU.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SNTK:
    K: int = 2
    L: int = 2
    scale: str = "average"   # 'add' | 'average'

    def _scale_mat(self, E1, E2):
        if self.scale == "add":
            return 1.0
        d1 = E1.sum(axis=1)
        d2 = E2.sum(axis=1)
        denom = d1[:, None] * d2[None, :]
        return 1.0 / jnp.maximum(denom, 1e-12)

    @staticmethod
    def _aggr(S, E1, E2, scale_mat):
        return (E1 @ S @ E2.T) * scale_mat

    @staticmethod
    def _update_diag(S):
        diag = jnp.sqrt(jnp.maximum(jnp.diag(S), 1e-12))
        Sn = S / diag[:, None] / diag[None, :]
        Sn = jnp.clip(Sn, -0.9999, 0.9999)
        Sn = (Sn * (math.pi - jnp.arccos(Sn))
              + jnp.sqrt(1 - Sn * Sn)) / math.pi
        return Sn * diag[:, None] * diag[None, :], diag

    @staticmethod
    def _update_sigma(S, diag1, diag2):
        Sn = S / diag1[:, None] / diag2[None, :]
        Sn = jnp.clip(Sn, -0.9999, 0.9999)
        out = (Sn * (math.pi - jnp.arccos(Sn))
               + jnp.sqrt(1 - Sn * Sn)) / math.pi
        degree_sigma = (math.pi - jnp.arccos(Sn)) / math.pi
        return out * diag1[:, None] * diag2[None, :], degree_sigma

    def _diag_list(self, g, E):
        scale_mat = self._scale_mat(E, E)
        sigma = g @ g.T
        diags = []
        for _ in range(self.K):
            sigma = self._aggr(sigma, E, E, scale_mat)
            sigma, diag = self._update_diag(sigma)
            diags.append(diag)
        return diags

    def nodes_gram(self, g1: jax.Array, g2: jax.Array, E1: jax.Array,
                   E2: jax.Array) -> jax.Array:
        """NTK gram matrix between node sets (reference
        ``sntk.py:77-96``)."""
        scale_mat = self._scale_mat(E1, E2)
        sigma = g1 @ g2.T
        theta = sigma
        d1 = self._diag_list(g1, E1)
        d2 = self._diag_list(g2, E2)
        for k in range(self.K):
            sigma = self._aggr(sigma, E1, E2, scale_mat)
            theta = self._aggr(theta, E1, E2, scale_mat)
            for _ in range(self.L):
                sigma, degree_sigma = self._update_sigma(
                    sigma, d1[k], d2[k])
                theta = theta * degree_sigma + sigma
        return theta


def krr_forward(kernel, ridge: float, g_t, g_s, y_s, E_t, E_s):
    """Kernel ridge regression prediction (reference
    ``models/krr.py:12-22``): softmax(K_ts (K_ss + ridge·tr/n·I)^-1 y_s)."""
    K_ss = kernel(g_s, g_s, E_s, E_s)
    K_ts = kernel(g_t, g_s, E_t, E_s)
    n = g_s.shape[0]
    reg = ridge * jnp.trace(K_ss) * jnp.eye(n) / n
    b = jnp.linalg.solve(K_ss + reg, y_s)
    return jax.nn.softmax(K_ts @ b, axis=1)
