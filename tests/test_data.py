"""Data layer: synthesis, splits, transforms, artifact round-trip."""

import numpy as np
import jax.numpy as jnp

from graphslim_tpu import graph as G
from graphslim_tpu.data import load, save_reduced, load_reduced, get_syn_data


def test_load_trans(synth_dataset):
    ds = synth_dataset
    assert ds.setting == "trans"
    assert ds.nclass == 4
    assert ds.feat.shape == (600, 32)
    # random split: 20 train / 30 val per class
    assert ds.idx_train.shape[0] == 4 * 20
    assert ds.idx_val.shape[0] == 4 * 30
    # splits are disjoint
    all_idx = np.concatenate([ds.idx_train, ds.idx_val, ds.idx_test])
    assert np.unique(all_idx).shape[0] == all_idx.shape[0]
    # row-normalized features
    norms = np.linalg.norm(np.asarray(ds.feat), axis=1)
    np.testing.assert_allclose(norms[norms > 1e-6],
                               np.ones((norms > 1e-6).sum()), rtol=1e-4)


def test_load_deterministic():
    a = load("synth-small", split="random", seed=0)
    b = load("synth-small", split="random", seed=0)
    np.testing.assert_array_equal(np.asarray(a.feat), np.asarray(b.feat))
    np.testing.assert_array_equal(a.idx_train, b.idx_train)


def test_load_inductive():
    ds = load("synth-ind-small", seed=0)
    assert ds.setting == "ind"
    assert ds.feat_train.shape[0] == ds.idx_train.shape[0]
    # induced train adjacency matches dense slicing
    full = np.asarray(ds.adj.to_dense())
    sub = np.asarray(ds.adj_train.to_dense())
    np.testing.assert_allclose(
        sub, full[np.ix_(ds.idx_train, ds.idx_train)])
    # standardized features: z-scored on train rows
    tr = np.asarray(ds.feat)[ds.idx_train]
    np.testing.assert_allclose(tr.mean(0), np.zeros(tr.shape[1]), atol=1e-4)


def test_synthetic_homophily():
    ds = load("synth-small", split="random", seed=0)
    labels = np.asarray(ds.labels)
    row, col = np.asarray(ds.adj.row), np.asarray(ds.adj.col)
    h = (labels[row] == labels[col]).mean()
    assert h > 0.6  # homophilous enough for GNNs to work


def test_artifact_roundtrip(tmp_path):
    feat = jnp.asarray(np.random.default_rng(0).normal(size=(10, 4)),
                       dtype=jnp.float32)
    labels = jnp.asarray(np.arange(10) % 3, dtype=jnp.int32)
    adj = jnp.asarray(np.random.default_rng(1).random((10, 10)),
                      dtype=jnp.float32)
    red = G.Reduced(feat=feat, adj=adj, labels=labels)
    save_reduced(red, str(tmp_path), "gcond", "cora", 0.5, 1)
    back = load_reduced(str(tmp_path), "gcond", "cora", 0.5, 1)
    np.testing.assert_allclose(np.asarray(back.feat), np.asarray(feat))
    np.testing.assert_allclose(np.asarray(back.adj), np.asarray(adj))
    # model-aware sparsify: MLP gets identity adjacency
    mlp = get_syn_data(str(tmp_path), "gcond", "cora", 0.5, 1,
                       model_type="MLP")
    assert mlp.adj is None
    np.testing.assert_allclose(np.asarray(mlp.dense_adj()), np.eye(10))
    # threshold path
    thr = get_syn_data(str(tmp_path), "gcond", "cora", 0.5, 1,
                       model_type="GCN", threshold=0.5)
    a = np.asarray(thr.adj)
    assert ((a == 0) | (a >= 0.5)).all()


def test_artifact_roundtrip_identity_and_sparse(tmp_path):
    feat = jnp.ones((4, 2))
    labels = jnp.zeros((4,), dtype=jnp.int32)
    save_reduced(G.Reduced(feat, None, labels), str(tmp_path), "m", "d",
                 0.1, 0)
    assert load_reduced(str(tmp_path), "m", "d", 0.1, 0).adj is None
    ei = np.array([[0, 1], [1, 0]])
    sadj = G.from_edge_index(ei, 4)
    save_reduced(G.Reduced(feat, sadj, labels), str(tmp_path), "m", "d",
                 0.2, 0)
    back = load_reduced(str(tmp_path), "m", "d", 0.2, 0)
    np.testing.assert_allclose(np.asarray(back.adj.to_dense()),
                               np.asarray(sadj.to_dense()))
