"""Model zoo: forward shapes on every adjacency form + end-to-end training.

The training test is the core acceptance gate: a 2-layer GCN must reach
>80% test accuracy on the homophilous synthetic dataset (mirrors the
reference's smoke protocol of running the real pipeline, SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphslim_tpu import graph as G
from graphslim_tpu import models as M
from graphslim_tpu.kernels import neighbor_sample_block


def _cfg(ds, nlayers=2, **kw):
    return M.ModelConfig(nfeat=ds.n_feat, nhid=64, nclass=ds.nclass,
                         nlayers=nlayers, **kw)


ALL_MODELS = ["MLP", "GCN", "SGC", "APPNP", "Cheby", "GraphSage"]


@pytest.mark.parametrize("name", ALL_MODELS + ["GAT"])
def test_forward_sparse(synth_dataset, name):
    ds = synth_dataset
    model = M.get_model(name, _cfg(ds))
    params = model.init(jax.random.key(0))
    adj = ds.adj_norm()
    out = model.apply(params, ds.feat, adj)
    assert out.shape == (ds.n_nodes, ds.nclass)
    # log-probabilities sum to 1
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1),
                               np.ones(ds.n_nodes), rtol=1e-4)


@pytest.mark.parametrize("name", ALL_MODELS)
def test_forward_dense_matches_sparse(synth_dataset, name):
    ds = synth_dataset
    model = M.get_model(name, _cfg(ds))
    params = model.init(jax.random.key(0))
    sp = ds.adj_norm()
    dense = sp.to_dense()
    out_sp = np.asarray(model.apply(params, ds.feat, sp))
    out_d = np.asarray(model.apply(params, ds.feat, dense))
    np.testing.assert_allclose(out_sp, out_d, rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("name", ["GCN", "SGC", "APPNP"])
def test_forward_batched_dense(synth_dataset, name):
    ds = synth_dataset
    n_syn = 16
    model = M.get_model(name, M.ModelConfig(
        nfeat=ds.n_feat, nhid=32, nclass=ds.nclass, nlayers=2))
    params = model.init(jax.random.key(0))
    adj = jnp.stack([jnp.eye(n_syn)] * 3)
    x = jnp.ones((n_syn, ds.n_feat))
    out = model.apply(params, x, adj)
    assert out.shape == (3 * n_syn, ds.nclass)


@pytest.mark.parametrize("name", ["GCN", "SGC", "APPNP", "GraphSage"])
@pytest.mark.slow
def test_forward_blocks_match_full(synth_dataset, name):
    """With fanout >= max degree, sampled-block forward == full forward."""
    ds = synth_dataset
    model = M.get_model(name, _cfg(ds))
    params = model.init(jax.random.key(0))
    norm = ds.adj_norm()
    # split diagonal out (self slots handled separately by the sampler)
    row, col = np.asarray(norm.row), np.asarray(norm.col)
    val = np.asarray(norm.val)
    diag = row == col
    self_vals = np.zeros(ds.n_nodes, dtype=np.float32)
    self_vals[row[diag]] = val[diag]
    off = G.from_edge_index(np.stack([row[~diag], col[~diag]]), ds.n_nodes,
                            edge_weight=val[~diag], dedup=False)
    max_deg = int(np.diff(np.asarray(off.indptr)).max())
    targets = jnp.arange(ds.n_nodes, dtype=jnp.int32)
    block = neighbor_sample_block(
        jax.random.key(0), off.indptr, off.col, off.values_or_ones(),
        jnp.asarray(self_vals), targets, fanouts=[max_deg, max_deg])
    out_full = np.asarray(model.apply(params, ds.feat, norm))
    feat_deep = jnp.take(ds.feat, block.node_ids[0], axis=0)
    out_block = np.asarray(model.apply(params, feat_deep, block))
    np.testing.assert_allclose(out_block, out_full, rtol=5e-3, atol=1e-3)


def test_gcn_trains_to_high_accuracy(synth_dataset):
    ds = synth_dataset
    model = M.get_model("GCN", _cfg(ds))
    norm = ds.adj_norm()
    cfg = M.TrainConfig(epochs=200, lr=0.01, weight_decay=5e-4)
    train = (ds.feat, norm, ds.labels[jnp.asarray(ds.idx_train)],
             jnp.asarray(ds.idx_train))
    val = (ds.feat, norm, ds.labels[jnp.asarray(ds.idx_val)],
           jnp.asarray(ds.idx_val))
    params, best_val, losses = M.fit_with_val(
        model, jax.random.key(0), train=train, val=val, cfg=cfg)
    test_acc = M.evaluate(model, params, ds.feat, norm,
                          ds.labels[jnp.asarray(ds.idx_test)],
                          jnp.asarray(ds.idx_test))
    assert float(best_val) > 0.8, float(best_val)
    assert float(test_acc) > 0.8, float(test_acc)
    # loss went down
    l = np.asarray(losses)
    assert l[-10:].mean() < l[:10].mean()


def test_fit_on_synthetic_graph_then_eval_full(synth_dataset):
    """The condensation eval pattern: train on a tiny dense synthetic graph,
    validate/test on the original (reference base.py:88-97)."""
    ds = synth_dataset
    rng = np.random.default_rng(0)
    n_syn = 40
    # crude synthetic graph: per-class feature means + noise
    labels_syn = jnp.asarray(np.arange(n_syn) % ds.nclass, dtype=jnp.int32)
    feats = np.asarray(ds.feat)
    labels_np = np.asarray(ds.labels)
    feat_syn = jnp.asarray(np.stack([
        feats[labels_np == (i % ds.nclass)].mean(0) +
        rng.normal(scale=0.01, size=ds.n_feat)
        for i in range(n_syn)]), dtype=jnp.float32)
    adj_syn = G.normalize_adj_dense(jnp.eye(n_syn), add_loops=False)
    model = M.get_model("GCN", _cfg(ds))
    norm = ds.adj_norm()
    cfg = M.TrainConfig(epochs=150)
    params, best_val, _ = M.fit_with_val(
        model, jax.random.key(1),
        train=(feat_syn, adj_syn, labels_syn, None),
        val=(ds.feat, norm, ds.labels[jnp.asarray(ds.idx_val)],
             jnp.asarray(ds.idx_val)),
        cfg=cfg)
    assert float(best_val) > 0.6, float(best_val)


def test_multi_seed_eval(synth_dataset):
    ds = synth_dataset
    model = M.get_model("SGC", _cfg(ds, nlayers=2))
    norm = ds.adj_norm()
    cfg = M.TrainConfig(epochs=60)
    keys = jax.random.split(jax.random.key(0), 3)
    params, accs, _ = M.fit_multi_seed(
        model, keys,
        train=(ds.feat, norm, ds.labels[jnp.asarray(ds.idx_train)],
               jnp.asarray(ds.idx_train)),
        val=(ds.feat, norm, ds.labels[jnp.asarray(ds.idx_val)],
             jnp.asarray(ds.idx_val)),
        cfg=cfg)
    accs = np.asarray(accs)
    assert accs.shape == (3,)
    assert (accs > 0.5).all(), accs
    # params stacked along seed axis
    leaf = jax.tree.leaves(params)[0]
    assert leaf.shape[0] == 3


def test_bce_loss_matches_torch_semantics():
    """'bce' branch (reference base.py:117-118 nclass==1) == stable BCE."""
    import numpy as np
    import jax.numpy as jnp
    from graphslim_tpu.models.trainer import TrainConfig, _loss_fn
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((8, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 2, 8))
    got = float(_loss_fn(TrainConfig(loss="bce"), logits, y, None))
    p = 1 / (1 + np.exp(-np.asarray(logits[:, 0])))
    want = -np.mean(np.asarray(y) * np.log(p) +
                    (1 - np.asarray(y)) * np.log(1 - p))
    assert abs(got - want) < 1e-6


@pytest.mark.slow
def test_gat_ell_matches_segment(synth_dataset):
    """GAT's scatter-free ELL attention path (kernels/ell.attention_ell)
    must match the segment-softmax edge-list path bit-for-bit semantics
    (same softmax over each row's incoming edges, same val scaling)."""
    ds = synth_dataset
    model = M.get_model("GAT", _cfg(ds))
    params = model.init(jax.random.key(0))
    sp = ds.adj_norm()
    ell = ds.adj_norm_ell()
    out_sp = np.asarray(model.apply(params, ds.feat, sp))
    out_ell = np.asarray(model.apply(params, ds.feat, ell))
    np.testing.assert_allclose(out_sp, out_ell, rtol=2e-3, atol=2e-4)


def test_gat_ell_heavy_path_matches_segment(synth_dataset):
    """Small cap forces the heavy-row fallback branch of attention_ell
    (double-gather alpha_dst + segment_softmax tail) plus multiple
    buckets — the branch CI otherwise never exercises (ADVICE r2)."""
    from graphslim_tpu.kernels.ell import ell_from_sparse

    ds = synth_dataset
    model = M.get_model("GAT", _cfg(ds))
    params = model.init(jax.random.key(0))
    sp = ds.adj_norm()
    ell = ell_from_sparse(sp, cap=4)
    assert ell.heavy_col is not None, "cap=4 must produce heavy rows"
    assert len(ell.buckets) >= 2, "cap=4 must produce multiple buckets"
    out_sp = np.asarray(model.apply(params, ds.feat, sp))
    out_ell = np.asarray(model.apply(params, ds.feat, ell))
    np.testing.assert_allclose(out_sp, out_ell, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_gat_ell_grads_finite(synth_dataset):
    ds = synth_dataset
    model = M.get_model("GAT", _cfg(ds))
    params = model.init(jax.random.key(1))
    ell = ds.adj_norm_ell()
    y = jnp.asarray(np.asarray(ds.labels))

    def loss(p):
        out = model.apply(p, ds.feat, ell, training=True,
                          key=jax.random.key(2))
        return -jnp.mean(jnp.take_along_axis(out, y[:, None], 1))

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_gat_bf16_inference_parity(synth_dataset):
    """The wide-head inference fast path (bf16 combined gather — the
    per-edge source logits ride it and are rounded to bf16 too, see
    models/gat.py) must agree with the f32 edge-list path: same argmax
    predictions and logits within bf16 rounding."""
    ds = synth_dataset
    cfg = M.ModelConfig(nfeat=ds.n_feat, nhid=256, nclass=ds.nclass,
                        nheads=8)          # h = 32 >= 16: bf16 path on
    model = M.get_model("GAT", cfg)
    params = model.init(jax.random.key(0))
    ell = ds.adj_norm_ell()
    sp = ds.adj_norm()
    out_bf = np.asarray(model.apply(params, ds.feat, ell))   # bf16 path
    out_f32 = np.asarray(model.apply(params, ds.feat, sp))   # f32 path
    agree = (out_bf.argmax(1) == out_f32.argmax(1)).mean()
    assert agree >= 0.99, agree
    np.testing.assert_allclose(out_bf, out_f32, rtol=0.05, atol=0.05)
