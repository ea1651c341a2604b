"""Cross-shard row gather — distributed feature lookup.

Each device requests arbitrary global rows of a node-sharded matrix (the
distributed-embedding-lookup pattern): requests ``all_gather`` around the
mesh (4 bytes/row — cheap), every owner answers with its rows (zeros
elsewhere), and a ``psum_scatter`` simultaneously sums the one-hot
contributions and routes each device exactly its own answer block.  All
shapes are static; both collectives ride ICI.

This is what lets the gradient-matching inner loop read **node-sharded**
real features instead of replicating the graph per device
(VERDICT round-1 item 3; the reference is single-device, SURVEY §2.10).

Cost per call: ``S·m`` index ints all-gathered + ``S·m·d`` floats through
psum_scatter, where ``m`` is the per-device request count — independent
of ``n_nodes``, so papers100M-scale features (57 GB replicated) fit at
``n·d/S`` per device while the per-step exchange stays in the tens of MB.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def sharded_row_gather_local(xs: jax.Array, idx: jax.Array,
                             rows_per: int, axis: str) -> jax.Array:
    """Inside-shard_map body: gather global rows ``idx`` [m] from the
    row-sharded matrix whose local block is ``xs`` [rows_per, d].

    Returns [m, d] — this device's requested rows.
    """
    my = jax.lax.axis_index(axis)
    n_dev = jax.lax.axis_size(axis)
    # [S, m] — every device's requests
    all_idx = jax.lax.all_gather(idx, axis, axis=0, tiled=False)
    rel = all_idx - my * rows_per
    ok = (rel >= 0) & (rel < rows_per)
    safe = jnp.clip(rel, 0, rows_per - 1)
    vals = jnp.where(ok[..., None],
                     jnp.take(xs, safe.reshape(-1), axis=0).reshape(
                         n_dev, idx.shape[0], xs.shape[-1]),
                     0.0)
    # Sum the owner contributions and hand device k its own block k.
    return jax.lax.psum_scatter(vals, axis, scatter_dimension=0,
                                tiled=False)


def make_sharded_row_gather(mesh: Mesh, rows_per: int, axis: str = "data"):
    """Standalone ``gather(x_sharded, idx_sharded) -> rows`` callable.

    ``x`` must be [S*rows_per, d] row-sharded over ``axis``; ``idx`` is
    [S, m] (row i = device i's requests); output is [S, m, d] sharded the
    same way.
    """
    def local(xs, idx):
        out = sharded_row_gather_local(xs, idx[0], rows_per, axis)
        return out[None]

    return shard_map(local, mesh=mesh, in_specs=(P(axis), P(axis)),
                     out_specs=P(axis))
