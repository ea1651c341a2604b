"""Graph container + normalization numerics vs dense NumPy oracles.

The reference's per-layer numerics are the golden oracle (SURVEY.md §4); here
we verify against explicit dense formulas.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from graphslim_tpu import graph as G


def dense_of(adj):
    return np.asarray(adj.to_dense())


def test_from_edge_index_symmetrize_dedup():
    ei = np.array([[0, 1, 1], [1, 0, 2]])
    adj = G.from_edge_index(ei, 3, symmetrize=True)
    d = dense_of(adj)
    expected = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], dtype=np.float32)
    np.testing.assert_allclose(d, expected)
    # CSR invariant
    assert np.all(np.diff(np.asarray(adj.row)) >= 0)
    indptr = np.asarray(adj.indptr)
    for r in range(3):
        rows = np.asarray(adj.row)[indptr[r]:indptr[r + 1]]
        assert np.all(rows == r)


def test_spmm_matches_dense(tiny_graph):
    adj, feat, _ = tiny_graph
    out = adj.matmul(feat)
    expected = dense_of(adj) @ np.asarray(feat)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_gcn_norm_matches_dense(tiny_graph):
    adj, _, _ = tiny_graph
    norm = G.gcn_norm(adj)
    a = dense_of(adj) + np.eye(adj.n_rows, dtype=np.float32)
    deg = a.sum(1)
    dinv = 1.0 / np.sqrt(deg)
    expected = a * dinv[:, None] * dinv[None, :]
    np.testing.assert_allclose(dense_of(norm), expected, rtol=1e-5)


def test_normalize_adj_dense_matches_sparse(tiny_graph):
    adj, _, _ = tiny_graph
    dense = jnp.asarray(dense_of(adj))
    nd = G.normalize_adj_dense(dense)
    ns = dense_of(G.gcn_norm(adj))
    np.testing.assert_allclose(np.asarray(nd), ns, rtol=1e-5)


def test_normalize_adj_dense_batched(tiny_graph):
    adj, _, _ = tiny_graph
    dense = jnp.asarray(dense_of(adj))
    batched = jnp.stack([dense, dense * 2])
    nb = G.normalize_adj_dense(batched)
    n0 = G.normalize_adj_dense(dense)
    np.testing.assert_allclose(np.asarray(nb[0]), np.asarray(n0), rtol=1e-5)


def test_submatrix(tiny_graph):
    adj, _, _ = tiny_graph
    idx = np.array([0, 1, 3])
    sub = G.submatrix(adj, idx)
    expected = dense_of(adj)[np.ix_(idx, idx)]
    np.testing.assert_allclose(dense_of(sub), expected)


def test_rmatmul(tiny_graph):
    adj, feat, _ = tiny_graph
    out = adj.rmatmul(feat, adj.n_rows)
    expected = dense_of(adj).T @ np.asarray(feat)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_row_normalize_and_standardize():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(5, 3)) * 4 + 1,
                    dtype=jnp.float32)
    rn = G.row_normalize(x)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rn), axis=1), np.ones(5), rtol=1e-5)
    st = np.asarray(G.standardize(x))
    np.testing.assert_allclose(st.mean(0), np.zeros(3), atol=1e-5)
    np.testing.assert_allclose(st.std(0), np.ones(3), rtol=1e-4)


def test_add_self_loops_replaces_diag():
    ei = np.array([[0, 0, 1], [0, 1, 0]])
    adj = G.from_edge_index(ei, 2, edge_weight=np.array([5.0, 1.0, 1.0]))
    out = G.add_self_loops(adj)
    d = dense_of(out)
    np.testing.assert_allclose(d, np.array([[1, 1], [1, 1]], dtype=np.float32))
