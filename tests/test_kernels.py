"""Kernel-level allclose tests vs dense references (SURVEY.md §4)."""

import numpy as np
import pytest
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

    def test_subsampled_unbiased_estimator(self, rng):
        """Small-fanout sampling with the deg/fanout rescale is an
        UNBIASED estimator of the full normalized aggregation: the mean
        of the one-hop block aggregation over many keys converges to
        A_norm @ x (VERDICT r3 item 4; the deliberate divergence from
        PyG's un-rescaled sampled blocks is documented in
        kernels/sample.py and PARITY.md)."""
        n, d, fanout, n_keys = 24, 5, 2, 4000
        src = np.arange(n)
        ei = np.concatenate([
            np.stack([src, (src + 1) % n]),
            np.stack([src, (src + 5) % n]),
            rng.integers(0, n, size=(2, 40)),
        ], axis=1)
        norm = G.gcn_norm(G.from_edge_index(ei, n, symmetrize=True))
        diag = np.asarray(norm.row) == np.asarray(norm.col)
        self_vals = np.zeros(n, dtype=np.float32)
        self_vals[np.asarray(norm.row)[diag]] = np.asarray(norm.val)[diag]
        off = ~diag
        offadj = G.from_edge_index(
            np.stack([np.asarray(norm.row)[off],
                      np.asarray(norm.col)[off]]), n,
            edge_weight=np.asarray(norm.val)[off], dedup=False)
        assert int(np.diff(np.asarray(offadj.indptr)).max()) > fanout
        x = jnp.asarray(rng.standard_normal((n, d)), dtype=jnp.float32)
        targets = jnp.arange(n, dtype=jnp.int32)

        def one(key):
            block = neighbor_sample_block(
                key, offadj.indptr, offadj.col, offadj.values_or_ones(),
                jnp.asarray(self_vals), targets, fanouts=[fanout])
            srcs, w = block.node_ids[0], block.weights[0]
            g = jnp.take(x, srcs.reshape(n, -1), axis=0)
            return jnp.sum(g * w[..., None], axis=1)

        keys = jax.random.split(jax.random.key(7), n_keys)
        mean = np.asarray(jnp.mean(jax.lax.map(one, keys, batch_size=200),
                                   axis=0))
        want = np.asarray(norm.to_dense()) @ np.asarray(x)
        # CLT tolerance: per-entry std/sqrt(n_keys) is small but nonzero
        np.testing.assert_allclose(mean, want, atol=0.05, rtol=0.05)


def test_precomputed_packed_csr_matches_in_jit_build(rng):
    """neighbor_sample_block with precomputed PackedCsr tables produces
    bit-identical blocks to the in-jit table build (same key)."""
    from graphslim_tpu.kernels.sample import build_packed_csr

    n = 14
    ei = rng.integers(0, n, size=(2, 50))
    norm = G.gcn_norm(G.from_edge_index(ei, n, symmetrize=True))
    diag = np.asarray(norm.row) == np.asarray(norm.col)
    self_vals = np.zeros(n, dtype=np.float32)
    self_vals[np.asarray(norm.row)[diag]] = np.asarray(norm.val)[diag]
    off = ~diag
    offadj = G.from_edge_index(
        np.stack([np.asarray(norm.row)[off],
                  np.asarray(norm.col)[off]]), n,
        edge_weight=np.asarray(norm.val)[off], dedup=False)
    tables = build_packed_csr(
        np.asarray(offadj.indptr), np.asarray(offadj.col),
        np.asarray(offadj.values_or_ones()), self_vals)
    targets = jnp.arange(n, dtype=jnp.int32)
    k = jax.random.key(11)
    args = (offadj.indptr, offadj.col, offadj.values_or_ones(),
            jnp.asarray(self_vals), targets)
    a = neighbor_sample_block(k, *args, fanouts=[3, 2])
    b = neighbor_sample_block(k, *args, fanouts=[3, 2], tables=tables)
    for xa, xb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


# ---------------------------------------------------------------------------
# Fused Pallas PGE pair-scoring kernel (interpret mode on CPU)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_pallas_pge_fwd_bwd_vs_oracle():
    """Kernel forward and custom-VJP backward match the pure-JAX oracle
    implementing identical tile-local-BN math (f32 matmuls isolate the
    logic from bf16 rounding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from graphslim_tpu.kernels import pallas_pge as pp

    old = pp.MM_DTYPE
    pp.MM_DTYPE = jnp.float32
    try:
        rng = np.random.default_rng(0)
        n, H, L2 = 45, 128, 1
        a = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
        wmid = jnp.asarray(rng.standard_normal((L2, H, H)) * 0.1,
                           jnp.float32)
        bmid = jnp.asarray(rng.standard_normal((L2, H)) * 0.1, jnp.float32)
        gamma = jnp.ones((L2 + 1, H), jnp.float32) * 1.1
        beta = jnp.ones((L2 + 1, H), jnp.float32) * 0.05
        wlast = jnp.asarray(rng.standard_normal((1, H)) * 0.1, jnp.float32)

        got = pp.pair_scores(a, b, wmid, bmid, gamma, beta, wlast, n, True)
        want = pp.pair_scores_ref(a, b, wmid, bmid, gamma, beta, wlast, n)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

        R = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)

        def loss_k(*args):
            return jnp.sum(pp.pair_scores(*args, n, True) * R)

        def loss_r(*args):
            return jnp.sum(pp.pair_scores_ref(*args, n) * R)

        gk = jax.grad(loss_k, argnums=tuple(range(7)))(
            a, b, wmid, bmid, gamma, beta, wlast)
        gr = jax.grad(loss_r, argnums=tuple(range(7)))(
            a, b, wmid, bmid, gamma, beta, wlast)
        for x, y in zip(gk, gr):
            x, y = np.asarray(x), np.asarray(y)
            # dbmid is analytically 0 (BN shift invariance): atol floor
            assert np.abs(x - y).max() < 1e-4 * np.abs(y).max() + 1e-5
    finally:
        pp.MM_DTYPE = old


def test_pge_pallas_backend_matches_tiling_semantics():
    """PGE.apply with backend='pallas' (interpret) stays close to the XLA
    row-block path: same architecture, BN-stat populations differ
    (tile-local vs row-block), so we check shape/symmetry/range and
    rough agreement."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from unittest import mock
    from graphslim_tpu.kernels import pallas_pge
    from graphslim_tpu.models.pge import PGE, PGEConfig

    rng = np.random.default_rng(0)
    n, d = 70, 32
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    cfg = PGEConfig(nfeat=d, nnodes=n, nhid=64, row_block=16,
                    backend="pallas")
    pge = PGE(cfg)
    params = pge.init(jax.random.key(0))

    real_pair_scores = pallas_pge.pair_scores
    with mock.patch.object(
            pallas_pge, "pair_scores",
            lambda *args, **kw: real_pair_scores(*args[:-1], args[-1],
                                                 True)):
        adj_p = np.asarray(pge.apply(params, x))
    adj_x = np.asarray(PGE(dataclasses_replace(cfg, backend="xla")
                           ).apply(params, x))
    assert adj_p.shape == (n, n)
    np.testing.assert_allclose(adj_p, adj_p.T, atol=1e-6)
    assert np.all(np.diag(adj_p) == 0)
    assert adj_p.min() >= 0 and adj_p.max() <= 1
    # same architecture, slightly different BN populations
    assert np.abs(adj_p - adj_x).mean() < 0.15


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def test_ell_slot_cap_split_parity():
    """max_slots splits buckets and chunks the heavy segment with
    bit-identical results (single-chip capacity at reddit scale —
    docs/PERF.md round 3)."""
    import numpy as np
    import jax.numpy as jnp
    from graphslim_tpu import graph as G
    from graphslim_tpu.kernels.ell import build_ell, spmm_ell

    rng = np.random.default_rng(3)
    n, d = 500, 12
    ei = rng.integers(0, n, (2, 6000))
    adj = G.gcn_norm(G.from_edge_index(ei, n, symmetrize=True))
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    args = (np.asarray(adj.indptr), np.asarray(adj.col),
            np.asarray(adj.values_or_ones()))
    whole = np.asarray(spmm_ell(build_ell(*args, cap=8), x))
    split = build_ell(*args, cap=8, max_slots=64)
    assert len(split.heavy_splits) > 1 or len(split.buckets) > \
        len(build_ell(*args, cap=8).buckets)
    np.testing.assert_array_equal(
        whole, np.asarray(spmm_ell(split, x)))
