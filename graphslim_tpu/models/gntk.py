"""GNTK — graph neural tangent kernel (dense, whole-graph form).

Re-design of reference ``graphslim/models/gntk.py`` (NumPy implementation
used by SFGC's meta-evaluation, imported at ``sfgc.py:10``): K aggregation
rounds × L arccos-kernel layer recursions over dense adjacency operators —
the same recursion family as :mod:`graphslim_tpu.models.sntk` but with
per-graph aggregation operators ``A + I`` and jump-knowledge scaling.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GNTK:
    num_layers: int = 2     # L
    num_mlp_layers: int = 2
    scale: str = "degree"   # 'degree' | 'uniform'

    def _next(self, S, diag1, diag2):
        S = S / diag1[:, None] / diag2[None, :]
        S = jnp.clip(S, -0.9999, 0.9999)
        DS = (math.pi - jnp.arccos(S)) / math.pi
        S = (S * (math.pi - jnp.arccos(S))
             + jnp.sqrt(1 - S * S)) / math.pi
        return S * diag1[:, None] * diag2[None, :], DS

    def _diag(self, S):
        return jnp.sqrt(jnp.maximum(jnp.diag(S), 1e-12))

    def _agg_op(self, A):
        op = A + jnp.eye(A.shape[0], dtype=A.dtype)
        if self.scale == "degree":
            op = op / jnp.maximum(op.sum(1, keepdims=True), 1e-12)
        return op

    def diag_list(self, x, A):
        op = self._agg_op(A)
        sigma = x @ x.T
        diags = []
        for _ in range(self.num_layers):
            sigma = op @ sigma @ op.T
            for _ in range(self.num_mlp_layers - 1):
                d = self._diag(sigma)
                diags.append(d)
                sigma, _ = self._next(sigma, d, d)
        return diags

    def gntk(self, x1, x2, A1, A2):
        """NTK value matrix between two graphs' nodes (reference
        ``gntk.py`` ``gntk``/``calc`` entry, ``utils.py:164-165``)."""
        op1, op2 = self._agg_op(A1), self._agg_op(A2)
        sigma = x1 @ x2.T
        theta = sigma
        d1 = self.diag_list(x1, A1)
        d2 = self.diag_list(x2, A2)
        k = 0
        for _ in range(self.num_layers):
            sigma = op1 @ sigma @ op2.T
            theta = op1 @ theta @ op2.T
            for _ in range(self.num_mlp_layers - 1):
                sigma, DS = self._next(sigma, d1[k], d2[k])
                theta = theta * DS + sigma
                k += 1
        return theta
