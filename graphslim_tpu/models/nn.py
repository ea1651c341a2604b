"""Minimal functional NN primitives: linear, batchnorm, dropout, inits.

Deliberately framework-free (no flax/haiku): params are plain dicts of
arrays so nested ``jax.grad``-of-``jax.grad`` (gradient matching,
trajectory unrolls) and parameter flattening (the ReparamModule analog,
reference ``graphslim/models/reparam_module.py``) stay trivial.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def glorot_uniform(key: jax.Array, shape: tuple[int, ...],
                   dtype=jnp.float32) -> jax.Array:
    fan_in, fan_out = shape[0], shape[-1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def linear_init(key: jax.Array, nin: int, nout: int, bias: bool = True
                ) -> dict:
    p = {"w": glorot_uniform(key, (nin, nout))}
    if bias:
        p["b"] = jnp.zeros((nout,), dtype=jnp.float32)
    return p


def linear_apply(p: dict, x: jax.Array) -> jax.Array:
    out = x @ p["w"]
    if "b" in p:
        out = out + p["b"]
    return out


def bn_init(dim: int) -> dict:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def bn_apply(p: dict, x: jax.Array) -> jax.Array:
    """Batch norm over node dim using batch statistics.

    Full-batch graph training means batch stats equal dataset stats, so we
    use them in both modes (no running-average state to thread through
    nested grads).  Reference default is ``with_bn=False``.
    """
    mu = x.mean(axis=0)
    var = x.var(axis=0)
    xhat = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    return xhat * p["scale"] + p["bias"]


def dropout(key: Optional[jax.Array], x: jax.Array, rate: float,
            training: bool) -> jax.Array:
    if not training or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "linear": lambda x: x,
    "softplus": jax.nn.softplus,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "relu6": jax.nn.relu6,
    "elu": jax.nn.elu,
}
