"""Distributed layer: sharded SpMM, class-parallel matching, dist GCond."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphslim_tpu import graph as G
from graphslim_tpu.config import Args, finalize
from graphslim_tpu.data import load
from graphslim_tpu.dist import make_mesh, partition_rows, shard_spmm
from graphslim_tpu.dist.evalp import sharded_multi_seed
from graphslim_tpu.eval import Evaluator
from graphslim_tpu.reduce import create_reducer


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_sharded_spmm_both_modes(mesh, synth_dataset):
    ds = synth_dataset
    norm = ds.adj_norm()
    part = partition_rows(norm, 8)
    ref = np.asarray(norm.matmul(ds.feat))
    out_rep = np.asarray(shard_spmm(mesh, part, ds.feat,
                                    mode="replicated"))
    out_gat = np.asarray(shard_spmm(mesh, part, ds.feat, mode="gather"))
    np.testing.assert_allclose(out_rep, ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out_gat, ref, rtol=1e-4, atol=1e-4)


def test_sharded_multi_seed(mesh):
    def fn(key):
        return jax.random.uniform(key)

    out = np.asarray(sharded_multi_seed(mesh, fn, n_seeds=10))
    assert out.shape == (10,)
    assert len(np.unique(out)) == 10


@pytest.mark.slow
def test_distributed_gcond(tmp_path, synth_dataset):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ds = synth_dataset
    base = dict(dataset="synth-small", method="gcond",
                save_path=str(tmp_path), epochs=3, outer_loop=2,
                inner_loop=1, eval_epochs=50, run_eval=2,
                run_inter_eval=1, lr_feat=0.01, lr_adj=0.01,
                condense_model="SGC")
    args = finalize(Args(**base), explicit=set(base))
    agent = create_reducer("gcond", ds, args)
    agent.enable_distributed(8)
    red = agent.reduce(ds)
    assert np.isfinite(np.asarray(red.feat)).all()
    (mean, _), _ = Evaluator(ds, args).evaluate(red, "GCN")
    assert mean > 0.7, mean


def test_halo_spmm_matches_dense(mesh):
    """Halo-exchange sharded SpMM == dense oracle, and its per-peer halo
    volume is below the all_gather volume on a locality-ordered graph."""
    import numpy as np
    import jax.numpy as jnp
    from graphslim_tpu import graph as G
    from graphslim_tpu.dist import partition_rows_halo, shard_spmm_halo

    rng = np.random.default_rng(0)
    n, d = 257, 19    # deliberately not multiples of 8
    # locality-ordered ring-ish graph + a few long-range edges
    src = np.arange(n)
    ei = np.concatenate([
        np.stack([src, (src + 1) % n]),
        np.stack([src, (src + 2) % n]),
        rng.integers(0, n, size=(2, 40)),
    ], axis=1)
    adj = G.gcn_norm(G.from_edge_index(ei, n, symmetrize=True))
    x = rng.standard_normal((n, d)).astype(np.float32)

    hp = partition_rows_halo(adj, 8)
    out = np.asarray(shard_spmm_halo(mesh, hp, jnp.asarray(x)))
    want = np.asarray(adj.to_dense()) @ x
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)

    # communication: halo rows per peer << rows_per (all_gather volume)
    assert hp.halo_size < hp.base.rows_per_shard


@pytest.mark.slow
def test_ragged_halo_spmm_matches_dense(mesh):
    """Ragged halo layout (per-pair exact routing, ppermute rounds on
    CPU) == dense oracle; buffer is per-round-max, not global pair-max."""
    import numpy as np
    import jax.numpy as jnp
    from graphslim_tpu import graph as G
    from graphslim_tpu.dist.spmm import (partition_rows_halo,
                                         partition_rows_halo_ragged,
                                         shard_spmm_halo_ragged)

    rng = np.random.default_rng(1)
    n, d = 257, 19
    src = np.arange(n)
    ei = np.concatenate([
        np.stack([src, (src + 1) % n]),
        np.stack([src, (src + 3) % n]),
        rng.integers(0, n, size=(2, 60)),
    ], axis=1)
    adj = G.gcn_norm(G.from_edge_index(ei, n, symmetrize=True))
    x = rng.standard_normal((n, d)).astype(np.float32)
    hp = partition_rows_halo_ragged(adj, 8)
    out = np.asarray(shard_spmm_halo_ragged(mesh, hp, jnp.asarray(x)))
    want = np.asarray(adj.to_dense()) @ x
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
    # skew-robustness: receive buffer <= padded layout's S*H rows
    padded = partition_rows_halo(adj, 8)
    assert hp.recv_len <= 8 * padded.halo_size


@pytest.mark.slow
def test_evaluator_mesh_path_matches_local(mesh):
    """Evaluator.enable_distributed: full-graph val/test forwards through
    DistAdj (ragged halo SpMM) produce the same accuracies as the local
    ELL path, for both the fully-hoisted (SGC) and in-loop (GCN) cases."""
    import numpy as np
    from graphslim_tpu.config import Args, finalize
    from graphslim_tpu.data import load
    from graphslim_tpu.eval.evaluator import Evaluator
    from graphslim_tpu.reduce import create_reducer

    ds = load("synth-small", setting="trans", split="random", seed=0)
    args = finalize(
        Args(dataset="synth-small", method="random", reduction_rate=0.5,
             eval_epochs=30, run_eval=2),
        explicit={"eval_epochs", "run_eval"})
    red = create_reducer("random", ds, args).reduce(ds)
    for mt in ("SGC", "GCN"):
        (m0, s0), _ = Evaluator(ds, args).evaluate(red, mt)
        ev = Evaluator(ds, args)
        ev.enable_distributed(mesh)
        (m1, s1), _ = ev.evaluate(red, mt)
        assert abs(m0 - m1) < 1e-6, (mt, m0, m1)
        assert abs(s0 - s1) < 1e-6, (mt, s0, s1)


def test_edge_cut_partitioner_quality():
    """Multilevel C++ partitioner: balanced parts, and on a partitionable
    (locality) graph the cut beats a random-order contiguous split."""
    import numpy as np
    from graphslim_tpu import graph as G
    from graphslim_tpu import native
    from graphslim_tpu.dist.spmm import edge_cut_order, reorder_adj

    rng = np.random.default_rng(2)
    n, k = 4096, 8
    src = np.arange(n)
    ring = [np.stack([src, (src + off) % n]) for off in (1, 2, 5)]
    noise = rng.integers(0, n, size=(2, n // 4))
    ei = np.concatenate(ring + [noise], axis=1)
    # random node relabeling destroys id-order locality: the partitioner
    # must REDISCOVER the ring structure
    relab = rng.permutation(n)
    ei = relab[ei]
    adj = G.from_edge_index(ei, n, symmetrize=True)
    indptr, col = np.asarray(adj.indptr), np.asarray(adj.col)
    res = native.partition_graph(indptr, col, k, slack=0.05, passes=10)
    if res is None:
        import pytest
        pytest.skip("native library unavailable")
    part, cut = res
    sizes = np.bincount(part, minlength=k)
    assert sizes.min() > 0.85 * n / k and sizes.max() < 1.15 * n / k
    nnz = col.shape[0]
    row = np.repeat(np.arange(n), np.diff(indptr))
    rows_per = -(-n // k)
    cut_naive = int((row // rows_per != col // rows_per).sum())
    assert cut < 0.5 * cut_naive, (cut / nnz, cut_naive / nnz)
    # edge_cut_order + reorder composes into a contiguous-split layout
    order = edge_cut_order(adj, k)
    a2 = reorder_adj(adj, order)
    r2 = np.repeat(np.arange(n), np.diff(np.asarray(a2.indptr)))
    cut_ordered = int(
        (r2 // rows_per != np.asarray(a2.col) // rows_per).sum())
    assert cut_ordered < 0.7 * cut_naive


def test_sharded_row_gather(mesh):
    """Cross-shard gather returns exactly x[idx] per device."""
    from graphslim_tpu.dist.gather import make_sharded_row_gather

    rng = np.random.default_rng(0)
    n, d, S, m = 100, 16, 8, 33
    rows_per = -(-n // S)
    x = rng.normal(size=(S * rows_per, d)).astype(np.float32)
    idx = rng.integers(0, n, size=(S, m)).astype(np.int32)
    gather = make_sharded_row_gather(mesh, rows_per)
    out = np.asarray(gather(jnp.asarray(x), jnp.asarray(idx)))
    np.testing.assert_allclose(out, x[idx], rtol=1e-6)


def test_sharded_feature_matching_matches_replicated(tmp_path,
                                                     synth_dataset):
    """feature_mode='sharded' must produce the same match loss as
    replicated features for the same key (VERDICT round-1 item 3: the
    matching path no longer replicates the real feature matrix)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from graphslim_tpu.dist.matching import build_sharded_match

    ds = synth_dataset
    base = dict(dataset="synth-small", method="gcond",
                save_path=str(tmp_path), condense_model="SGC")
    args = finalize(Args(**base), explicit=set(base))
    engine = create_reducer("gcond", ds, args)
    mesh8 = make_mesh(8)
    m_rep = build_sharded_match(engine, mesh8)
    m_shd = build_sharded_match(engine, mesh8, feature_mode="sharded")
    key = jax.random.key(0)
    feat_syn = engine.init_feat_syn()
    pge_params = engine.pge.init(jax.random.key(1))
    adj_norm = engine.syn_adj_norm(pge_params, feat_syn)
    model_params = engine.model.init(jax.random.key(2))
    l_rep = float(m_rep(model_params, feat_syn, adj_norm, key))
    l_shd = float(m_shd(model_params, feat_syn, adj_norm, key))
    assert np.isfinite(l_rep) and np.isfinite(l_shd)
    np.testing.assert_allclose(l_shd, l_rep, rtol=1e-4)


@pytest.mark.slow
def test_evaluator_mesh_path_inductive(mesh):
    """Inductive datasets shard their val/test SUBGRAPH forwards
    (reference reddit/flickr protocol): the mesh path must reproduce the
    local accuracies exactly, as in the transductive case."""
    from graphslim_tpu.config import Args, finalize
    from graphslim_tpu.data import load
    from graphslim_tpu.eval.evaluator import Evaluator
    from graphslim_tpu.reduce import create_reducer

    ds = load("synth-ind-small", setting="ind", split="random", seed=0)
    args = finalize(
        Args(dataset="synth-ind-small", method="random",
             reduction_rate=0.5, eval_epochs=30, run_eval=2),
        explicit={"eval_epochs", "run_eval"})
    red = create_reducer("random", ds, args).reduce(ds)
    for mt in ("SGC", "GCN"):
        (m0, s0), _ = Evaluator(ds, args).evaluate(red, mt)
        ev = Evaluator(ds, args)
        ev.enable_distributed(mesh)
        assert ev._dist_test is not None
        (m1, s1), _ = ev.evaluate(red, mt)
        assert abs(m0 - m1) < 1e-6, (mt, m0, m1)
        assert abs(s0 - s1) < 1e-6, (mt, s0, s1)


def test_dist_adj_matmul_rejects_padded_shape():
    """DistAdj.matmul is original-order-only; a padded-domain array must
    go through padded_view() (shape-based dispatch was a silent-wrong
    trap when n_rows divides evenly into shards)."""
    import jax.numpy as jnp
    import pytest

    from graphslim_tpu.data import load
    from graphslim_tpu.dist import make_mesh
    from graphslim_tpu.dist.spmm import build_dist_adj

    ds = load("karate", split="random", seed=0)   # n=34: 4 shards pad to 36
    mesh = make_mesh(4)
    da = build_dist_adj(ds.adj_norm(), mesh)
    assert da.n_padded != da.hp.base.n_rows
    xp = da.pad_features(ds.feat)
    with pytest.raises(ValueError, match="padded_view"):
        da.matmul(xp)
    # padded_view + remapped crop matches the convenience path
    out_pad = da.padded_view().matmul(xp)
    out_conv = da.matmul(ds.feat)
    got = jnp.take(out_pad, da.remap_idx(jnp.arange(ds.feat.shape[0])),
                   axis=0)
    import numpy as np
    np.testing.assert_allclose(np.asarray(got), np.asarray(out_conv),
                               rtol=1e-4, atol=1e-5)
