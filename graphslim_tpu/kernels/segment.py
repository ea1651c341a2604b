"""Segment reductions (scatter_add/mean/max equivalents) and edge softmax.

TPU-native replacement for the reference's ``torch_scatter`` usage
(reference ``graphslim/utils.py:15``, ``graphslim/coarsening/clustering.py:6``)
and for PyG's MessagePassing scatter backend used by GATConv
(reference ``graphslim/models/layers.py:59-249``).

All functions take a static ``num_segments`` so the result shape is known at
trace time (XLA requirement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                indices_are_sorted: bool = False) -> jax.Array:
    """Sum ``data`` rows into ``num_segments`` buckets."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_mean(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                 indices_are_sorted: bool = False) -> jax.Array:
    """Mean of ``data`` rows per segment; empty segments yield 0."""
    total = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    ones = jnp.ones((data.shape[0],), dtype=total.dtype)
    count = segment_sum(ones, segment_ids, num_segments, indices_are_sorted)
    count = jnp.maximum(count, 1.0)
    if total.ndim > 1:
        count = count.reshape((-1,) + (1,) * (total.ndim - 1))
    return total / count


def segment_max(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                indices_are_sorted: bool = False) -> jax.Array:
    """Max of ``data`` rows per segment; empty segments yield -inf."""
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted)


def segment_softmax(scores: jax.Array, segment_ids: jax.Array,
                    num_segments: int,
                    indices_are_sorted: bool = False) -> jax.Array:
    """Numerically-stable softmax over edges grouped by segment.

    Used for GAT attention (edge-softmax over incoming edges of each target
    node).  Implemented as segment-max subtraction + exp + segment-sum
    normalization — the SDDMM/SpMM pair called out in SURVEY.md §2.9.
    """
    seg_max = segment_max(scores, segment_ids, num_segments,
                          indices_are_sorted)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = scores - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    denom = segment_sum(exp, segment_ids, num_segments, indices_are_sorted)
    denom = jnp.maximum(denom, 1e-16)
    return exp / denom[segment_ids]
