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

from typing import NamedTuple, Optional, Sequence

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


class PackedCsr(NamedTuple):
    """Gather-friendly CSR layout for the on-device sampler.

    TPU gathers are element-rate-bound (measured ~3.5 cycles/element for
    narrow rows, benchmark/probe_step_phases.py), so the layout minimizes
    gathered ELEMENTS and TRANSACTIONS per sampled edge:

    * ``edge`` [nnz, 2] f32: (col_bits, val) — one 8-byte row per edge
      fetch instead of two scalar gathers (measured 5.0 vs 12.7 ms at
      arxiv sampling volume);
    * ``node`` [n, 4] f32: (start_bits, end_bits, self_val, 0) — one row
      gather per target serves the degree lookup AND the self-loop
      weight.

    A contiguous-window variant (each row doubled + shuffled, one
    (fanout, 8) slice-gather per target) was built and MEASURED REJECTED:
    XLA lowers multi-row slice-gathers through a slow path (190 ms vs
    8.3 ms for the whole arxiv sampling phase).

    Build once per engine (:func:`build_packed_csr`, host-side — no
    device readback) and thread through jit as an argument; building
    inside the step costs ~1.8 ms/step at arxiv scale.
    """

    edge: jax.Array
    node: jax.Array


def build_packed_csr(indptr, indices, values, self_values) -> PackedCsr:
    """Host-side (NumPy) build of :class:`PackedCsr`."""
    import numpy as np

    indptr = np.asarray(indptr).astype(np.int32)
    col = np.asarray(indices).astype(np.int32)
    val = np.asarray(values).astype(np.float32)
    sv = np.asarray(self_values).astype(np.float32)
    edge = np.stack([col.view(np.float32), val], axis=1)
    node = np.zeros((indptr.shape[0] - 1, 4), dtype=np.float32)
    node[:, 0] = indptr[:-1].view(np.float32)
    node[:, 1] = indptr[1:].view(np.float32)
    node[:, 2] = sv
    return PackedCsr(edge=jnp.asarray(edge), node=jnp.asarray(node))


def _pack_tables(indptr: jax.Array, indices: jax.Array,
                 values: jax.Array,
                 self_values: jax.Array) -> PackedCsr:
    """In-jit :class:`PackedCsr` build (fallback when no precomputed
    tables are threaded in — costs ~1.8 ms/step at arxiv scale)."""
    edge = jnp.stack(
        [jax.lax.bitcast_convert_type(indices.astype(jnp.int32),
                                      jnp.float32),
         values.astype(jnp.float32)], axis=1)                 # [nnz, 2]
    iptr = indptr.astype(jnp.int32)
    node = jnp.stack(
        [jax.lax.bitcast_convert_type(iptr[:-1], jnp.float32),
         jax.lax.bitcast_convert_type(iptr[1:], jnp.float32),
         self_values.astype(jnp.float32),
         jnp.zeros_like(self_values, dtype=jnp.float32)], axis=1)
    return PackedCsr(edge=edge, node=node)


def _sample_one_hop(key: jax.Array, tables: PackedCsr,
                    targets: jax.Array, fanout: int
                    ) -> tuple[jax.Array, jax.Array]:
    """Sample ``fanout`` neighbors (+self) for each target node.

    Returns ``(src_ids [n_t, fanout+1], weights [n_t, fanout+1])``; padded
    slots have weight 0 and point at the target itself (any valid id works —
    the zero weight kills the contribution).
    """
    n_t = targets.shape[0]
    se = jnp.take(tables.node, targets, axis=0)                # [n_t, 4]
    start = jax.lax.bitcast_convert_type(se[:, 0], jnp.int32)
    deg = jax.lax.bitcast_convert_type(se[:, 1], jnp.int32) - start
    self_w = se[:, 2]

    slot = jnp.arange(fanout, dtype=jnp.int32)[None, :]            # [1, f]
    rand = jax.random.randint(key, (n_t, fanout), 0, jnp.maximum(deg, 1)[:, None])
    # deg <= fanout: enumerate all neighbors (slots >= deg are padding);
    # deg  > fanout: uniform with replacement.
    offset = jnp.where(deg[:, None] <= fanout, slot, rand)
    edge_pos = start[:, None] + jnp.minimum(offset, jnp.maximum(deg - 1, 0)[:, None])
    valid = (slot < deg[:, None])

    rows = jnp.take(tables.edge, edge_pos.reshape(-1),
                    axis=0).reshape(n_t, fanout, 2)
    src = jax.lax.bitcast_convert_type(rows[:, :, 0], jnp.int32)
    w = rows[:, :, 1] * valid.astype(rows.dtype)
    # With-replacement correction: when deg > fanout each sampled edge
    # stands in for deg/fanout edges of the row's neighbor sum.
    scale = jnp.where(deg > fanout, deg.astype(w.dtype) / fanout, 1.0)
    w = w * scale[:, None]
    src = jnp.where(valid, src, targets[:, None])

    src = jnp.concatenate([src, targets[:, None]], axis=1)
    w = jnp.concatenate([w, self_w[:, None]], axis=1)
    return src.astype(jnp.int32), w


def sampling_key(key: jax.Array) -> jax.Array:
    """Fold an arbitrary PRNG key into an ``rbg`` key for sampling.

    Threefry random bits measured 4.0 ms of the 8.9 ms arxiv sampling
    phase; the hardware ``RngBitGenerator`` produces the same volume in
    1.7 ms (benchmark/probe_step_phases.py).  Sampling needs statistical
    uniformity, not crypto strength or cross-backend reproducibility, so
    hot paths fold their key once and split the rbg key per hop.
    """
    if jax.random.key_impl(key) == "rbg":
        return key
    data = jax.random.bits(key, (4,), jnp.uint32)  # one tiny threefry call
    return jax.random.wrap_key_data(data, impl="rbg")


def neighbor_sample_block(key: jax.Array, indptr: jax.Array,
                          indices: jax.Array, values: jax.Array,
                          self_values: jax.Array, targets: jax.Array,
                          fanouts: Sequence[int],
                          tables: Optional[PackedCsr] = None
                          ) -> BlockSample:
    """Sample an L-hop computation tree for ``targets``.

    ``fanouts`` is ordered near-to-deep, matching the reference's PyG sizes
    argument (reference ``graphslim/dataset/loader.py:197-211``).  Pass a
    precomputed ``tables`` (:func:`build_packed_csr`) on hot paths to
    skip the in-jit layout build.
    """
    if tables is None:
        tables = _pack_tables(indptr, indices, values, self_values)
    node_ids = [targets.astype(jnp.int32)]
    weights: list[jax.Array] = []
    frontier = targets.astype(jnp.int32)
    keys = jax.random.split(key, len(fanouts))
    for k, fanout in zip(keys, fanouts):
        src, w = _sample_one_hop(k, tables, frontier, int(fanout))
        weights.append(w)
        frontier = src.reshape(-1)
        node_ids.append(frontier)
    # Deepest level first.
    return BlockSample(node_ids=tuple(reversed(node_ids)),
                       weights=tuple(reversed(weights)))
