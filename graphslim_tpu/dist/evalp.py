"""Seed-parallel evaluation: shard the multi-seed eval vmap over devices.

The reference repeats evaluation 10× in a Python loop
(``eval_agent.py:275-283``); the single-chip build vmaps it; here the vmap
axis shards across the mesh so 10 evaluation trainings run concurrently on
different chips.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_multi_seed(mesh: Mesh, fn, n_seeds: int, seed: int = 0,
                       axis: str = "data"):
    """Run ``fn(key) -> scalar/pytree`` for ``n_seeds`` keys, sharded.

    Pads seeds to a device multiple; returns the first ``n_seeds`` results.
    """
    n_dev = mesh.shape[axis]
    n_pad = -(-n_seeds // n_dev) * n_dev
    keys = jax.random.split(jax.random.key(seed), n_pad)
    keys = jax.device_put(
        keys, NamedSharding(mesh, P(axis)))
    out = jax.jit(jax.vmap(fn))(keys)
    return jax.tree.map(lambda a: a[:n_seeds], out)
