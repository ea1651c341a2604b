"""Kernel-level allclose tests vs dense references (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from graphslim_tpu import graph as G
from graphslim_tpu.kernels import (
    segment_sum, segment_mean, segment_max, segment_softmax,
    neighbor_sample_block,
)
from graphslim_tpu.kernels.spmm import sddmm, spmm_xla


def test_segment_ops():
    data = jnp.asarray([[1.0], [2.0], [3.0], [4.0]])
    seg = jnp.asarray([0, 0, 1, 1])
    np.testing.assert_allclose(
        np.asarray(segment_sum(data, seg, 2)), [[3.0], [7.0]])
    np.testing.assert_allclose(
        np.asarray(segment_mean(data, seg, 3)), [[1.5], [3.5], [0.0]])
    np.testing.assert_allclose(
        np.asarray(segment_max(data, seg, 2)), [[2.0], [4.0]])


def test_segment_softmax_sums_to_one():
    scores = jnp.asarray([0.1, 2.0, -1.0, 0.5, 3.0])
    seg = jnp.asarray([0, 0, 0, 1, 1])
    sm = segment_softmax(scores, seg, 2)
    sums = np.asarray(segment_sum(sm, seg, 2))
    np.testing.assert_allclose(sums, [1.0, 1.0], rtol=1e-5)


def test_sddmm():
    a = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)),
                    dtype=jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(4, 3)),
                    dtype=jnp.float32)
    row = jnp.asarray([0, 1, 3])
    col = jnp.asarray([2, 0, 3])
    out = np.asarray(sddmm(row, col, a, b))
    full = np.asarray(a) @ np.asarray(b).T
    np.testing.assert_allclose(out, full[[0, 1, 3], [2, 0, 3]], rtol=1e-5)


def test_spmm_weighted():
    row = jnp.asarray([0, 0, 1])
    col = jnp.asarray([1, 2, 0])
    val = jnp.asarray([2.0, 3.0, 4.0])
    x = jnp.asarray([[1.0], [10.0], [100.0]])
    out = np.asarray(spmm_xla(row, col, val, x, 3))
    np.testing.assert_allclose(out, [[320.0], [4.0], [0.0]])


class TestNeighborSample:
    def _norm_graph(self, tiny_graph):
        adj, _, _ = tiny_graph
        norm = G.gcn_norm(adj)
        # Split self-loop values out the way models consume blocks
        diag_mask = np.asarray(norm.row) == np.asarray(norm.col)
        dense = np.asarray(norm.to_dense())
        self_vals = jnp.asarray(np.diag(dense))
        off = ~diag_mask
        ei = np.stack([np.asarray(norm.row)[off], np.asarray(norm.col)[off]])
        offadj = G.from_edge_index(ei, norm.n_rows,
                                   edge_weight=np.asarray(norm.val)[off])
        return offadj, self_vals, dense

    def test_full_fanout_exact(self, tiny_graph):
        """fanout >= max degree ⇒ sampled aggregation equals exact SpMM."""
        offadj, self_vals, dense = self._norm_graph(tiny_graph)
        targets = jnp.arange(6, dtype=jnp.int32)
        block = neighbor_sample_block(
            jax.random.key(0), offadj.indptr, offadj.col,
            offadj.values_or_ones(), self_vals, targets, fanouts=[8])
        assert block.num_layers == 1
        src, w = block.node_ids[0], block.weights[0]
        x = jnp.asarray(np.eye(6), dtype=jnp.float32)
        gathered = jnp.take(x, src.reshape(6, -1), axis=0)
        agg = jnp.sum(gathered * w[..., None], axis=1)
        np.testing.assert_allclose(np.asarray(agg), dense @ np.eye(6),
                                   rtol=1e-5)

    def test_subsampled_unbiased_shape(self, tiny_graph):
        offadj, self_vals, dense = self._norm_graph(tiny_graph)
        targets = jnp.asarray([0, 1], dtype=jnp.int32)
        block = neighbor_sample_block(
            jax.random.key(1), offadj.indptr, offadj.col,
            offadj.values_or_ones(), self_vals, targets, fanouts=[2, 2])
        assert block.weights[0].shape == (2 * 3, 3)
        assert block.weights[1].shape == (2, 3)
        assert block.node_ids[0].shape == (2 * 3 * 3,)
