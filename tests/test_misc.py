"""SGFormer, visualization, compat, native ops, run_eval CLI."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphslim_tpu import graph as G
from graphslim_tpu import models as M


@pytest.mark.slow
def test_sgformer_forward_and_train(synth_dataset):
    ds = synth_dataset
    model = M.get_model("SGFormer", M.ModelConfig(
        nfeat=ds.n_feat, nhid=32, nclass=ds.nclass, dropout=0.0))
    params = model.init(jax.random.key(0))
    out = model.apply(params, ds.feat, ds.adj_norm())
    assert out.shape == (ds.n_nodes, ds.nclass)
    tr = jnp.asarray(ds.idx_train)
    va = jnp.asarray(ds.idx_val)
    p, best, _ = M.fit_with_val(
        model, jax.random.key(0),
        train=(ds.feat, ds.adj_norm(), ds.labels[tr], tr),
        val=(ds.feat, ds.adj_norm(), ds.labels[va], va),
        cfg=M.TrainConfig(epochs=80))
    assert float(best) > 0.6, float(best)


def test_visualization(tmp_path, synth_dataset):
    from graphslim_tpu.visualization import draw_graph_pair

    ds = synth_dataset
    red = G.Reduced(feat=ds.feat[:20], adj=jnp.eye(20),
                    labels=ds.labels[:20])
    out = draw_graph_pair(ds, red, str(tmp_path / "pair.png"),
                          title="test")
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_compat_torch_roundtrip(synth_dataset):
    from graphslim_tpu.compat import to_torch, from_torch

    ds = synth_dataset
    blob = to_torch(ds)
    assert blob["x"].shape == (ds.n_nodes, ds.n_feat)
    assert blob["edge_index"].shape[0] == 2
    feat, adj, labels = from_torch(blob["x"], blob["edge_index"],
                                   blob["y"], blob["edge_weight"])
    np.testing.assert_allclose(np.asarray(adj.to_dense()),
                               np.asarray(ds.adj.to_dense()))
    # reduced with identity adj
    red = G.Reduced(feat=ds.feat[:5], adj=None, labels=ds.labels[:5])
    blob2 = to_torch(red)
    assert blob2["edge_index"].shape[1] == 5  # self loops


def test_native_ops():
    from graphslim_tpu import native

    if native.load() is None:
        pytest.skip("no compiler for native lib")
    # spanner drops the shortcut-able heavy edge
    keep = native.t_spanner(np.array([0, 1, 0]), np.array([1, 2, 2]),
                            np.array([1.0, 1.0, 10.0]), 3, 4.0)
    assert sorted(keep.tolist()) == [0, 1]
    # dedup sums duplicate weights
    r, c, v = native.csr_sort_dedup(np.array([1, 0, 1]),
                                    np.array([0, 1, 0]),
                                    np.array([1.0, 2.0, 3.0]))
    assert v.tolist() == [2.0, 4.0]
    ncomp, comp = native.connected_components(
        np.array([0, 1]), np.array([1, 2]), 5)
    assert ncomp == 3


def test_run_eval_cli(tmp_path, synth_dataset):
    import sys
    from graphslim_tpu.config import Args, finalize
    from graphslim_tpu.reduce import create_reducer
    from graphslim_tpu import run_eval

    ds = synth_dataset
    args = finalize(Args(dataset="synth-small", method="random",
                         save_path=str(tmp_path), eval_epochs=40,
                         run_eval=2),
                    explicit={"eval_epochs", "run_eval"})
    create_reducer("random", ds, args).reduce(ds)
    argv = sys.argv
    sys.argv = ["x", "-D", "synth-small", "-M", "random",
                "--save_path", str(tmp_path), "--eval_epochs", "40",
                "--run_eval", "2", "--reduction_rate", "0.25",
                "--split", "random"]
    try:
        mean, std = run_eval.main()
    finally:
        sys.argv = argv
    assert mean > 0.5


def test_segmented_fit_bit_identical():
    """TrainConfig.seg splits the epoch scan into carry-threaded jit
    segments; results must be bit-identical to the single-program fit
    (the TPU backend kills single programs executing >~10 s, so the
    evaluator runs seg=100 there — docs/PERF.md round 3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from graphslim_tpu import models as M
    from graphslim_tpu.data import load
    from graphslim_tpu.models.trainer import TrainConfig, _build_fit

    ds = load("synth-small", seed=0)
    model = M.get_model("GCN", M.ModelConfig(
        nfeat=ds.n_feat, nhid=16, nclass=ds.nclass))
    adj = ds.adj_norm()
    args = (jax.random.key(1), model.init(jax.random.key(0)), ds.feat,
            adj, ds.labels[jnp.asarray(ds.idx_train)],
            jnp.asarray(ds.idx_train), ds.feat, adj,
            ds.labels[jnp.asarray(ds.idx_val)],
            jnp.asarray(ds.idx_val))
    ref = None
    for seg in (0, 7, 100):
        fit = _build_fit(None, type(model), model.cfg,
                         TrainConfig(epochs=23, seg=seg))
        bp, bv, losses = fit(*args)
        got = (float(bv), np.asarray(losses))
        if ref is None:
            ref = got
        else:
            assert got[0] == ref[0], (seg, got[0], ref[0])
            np.testing.assert_array_equal(got[1], ref[1])
