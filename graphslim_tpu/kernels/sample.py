"""On-device fixed-fanout neighborhood sampling.

TPU-native replacement for PyG's dynamic CPU ``NeighborSampler`` used by the
reference's gradient-matching inner loop (reference
``graphslim/dataset/loader.py:177-224``).  The reference builds the sampler on
the *normalized* full adjacency, so sampled blocks carry global
GCN-normalized edge weights; we preserve that by gathering weights from the
normalized CSR values.

Design (static shapes throughout — XLA requirement):

* Each hop samples exactly ``fanout`` neighbors per target (uniform with
  replacement when ``deg > fanout``; all neighbors + masked padding when
  ``deg <= fanout``) plus one self slot.
* **Deliberate divergence from PyG semantics**: sampled slots are
  rescaled by ``deg/fanout``, making the block aggregation an *unbiased
  estimator* of the full normalized aggregation (E over keys of the
  one-hop block sum equals ``A_norm @ x`` exactly — pinned by
  ``tests/test_kernels.py::TestNeighborSample::
  test_subsampled_unbiased_estimator``).  PyG's ``NeighborSampler``
  blocks keep the un-rescaled global weights, so their sampled
  aggregations are biased low on high-degree rows; at
  ``fanout >= max_deg`` both agree exactly
  (``tests/test_models.py::test_forward_blocks_match_full``).  See
  PARITY.md "sampler" row.
* A block between level k-1 and k stores only the per-slot weights
  ``[n_t, fanout+1]`` and global source ids ``[n_t, fanout+1]``; the sources
  of row ``i`` occupy contiguous slots, so aggregation is a dense
  reshape + weighted-sum — no segment ops, pure VPU/MXU work.
* Forward pass gathers features once at the deepest level, then applies
  ``transform -> reshape -> weighted sum`` per layer (see
  ``graphslim_tpu.models.base.aggregate_blocks``).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class BlockSample(NamedTuple):
    """Multi-hop sampled computation tree.

    ``node_ids[0]`` is the deepest (feature-gather) level; ``node_ids[-1]``
    are the target nodes.  ``weights[k]`` maps level ``k`` sources to level
    ``k+1`` targets: shape ``[m_{k+1}, fanout_k + 1]`` with
    ``m_k == m_{k+1} * (fanout_k + 1)``.  Slot ``fanout_k`` is the self loop.
    """

    node_ids: tuple[jax.Array, ...]
    weights: tuple[jax.Array, ...]

    @property
    def num_layers(self) -> int:
        return len(self.weights)


def _sample_one_hop(key: jax.Array, indptr: jax.Array, indices: jax.Array,
                    values: jax.Array, self_values: jax.Array,
                    targets: jax.Array, fanout: int
                    ) -> tuple[jax.Array, jax.Array]:
    """Sample ``fanout`` neighbors (+self) for each target node.

    Returns ``(src_ids [n_t, fanout+1], weights [n_t, fanout+1])``; padded
    slots have weight 0 and point at the target itself (any valid id works —
    the zero weight kills the contribution).
    """
    n_t = targets.shape[0]
    start = jnp.take(indptr, targets)
    deg = jnp.take(indptr, targets + 1) - start

    slot = jnp.arange(fanout, dtype=jnp.int32)[None, :]            # [1, f]
    rand = jax.random.randint(key, (n_t, fanout), 0, jnp.maximum(deg, 1)[:, None])
    # deg <= fanout: enumerate all neighbors (slots >= deg are padding);
    # deg  > fanout: uniform with replacement.
    offset = jnp.where(deg[:, None] <= fanout, slot, rand)
    edge_pos = start[:, None] + jnp.minimum(offset, jnp.maximum(deg - 1, 0)[:, None])
    valid = (slot < deg[:, None])

    src = jnp.take(indices, edge_pos)
    w = jnp.take(values, edge_pos) * valid.astype(values.dtype)
    # With-replacement correction: when deg > fanout each sampled edge
    # stands in for deg/fanout edges of the row's neighbor sum.
    scale = jnp.where(deg > fanout, deg.astype(w.dtype) / fanout, 1.0)
    w = w * scale[:, None]
    src = jnp.where(valid, src, targets[:, None])

    self_w = jnp.take(self_values, targets)[:, None]
    src = jnp.concatenate([src, targets[:, None]], axis=1)
    w = jnp.concatenate([w, self_w], axis=1)
    return src.astype(jnp.int32), w


def neighbor_sample_block(key: jax.Array, indptr: jax.Array,
                          indices: jax.Array, values: jax.Array,
                          self_values: jax.Array, targets: jax.Array,
                          fanouts: Sequence[int]) -> BlockSample:
    """Sample an L-hop computation tree for ``targets``.

    ``fanouts`` is ordered near-to-deep, matching the reference's PyG sizes
    argument (reference ``graphslim/dataset/loader.py:197-211``).
    """
    node_ids = [targets.astype(jnp.int32)]
    weights: list[jax.Array] = []
    frontier = targets.astype(jnp.int32)
    keys = jax.random.split(key, len(fanouts))
    for k, fanout in zip(keys, fanouts):
        src, w = _sample_one_hop(k, indptr, indices, values, self_values,
                                 frontier, int(fanout))
        weights.append(w)
        frontier = src.reshape(-1)
        node_ids.append(frontier)
    # Deepest level first.
    return BlockSample(node_ids=tuple(reversed(node_ids)),
                       weights=tuple(reversed(weights)))
