"""NAS / property / MIA / attack / grid-search tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphslim_tpu import graph as G
from graphslim_tpu.config import Args, finalize
from graphslim_tpu.data import load
from graphslim_tpu.eval import (Evaluator, NasEvaluator,
                                PropertyEvaluator,
                                inference_via_confidence, mia_attack)
from graphslim_tpu.eval.nas import QUICK_SPACE, pearson
from graphslim_tpu.reduce import create_reducer


def _args(tmp_path, **kw):
    base = dict(dataset="synth-small", method="random",
                save_path=str(tmp_path), eval_epochs=50, run_eval=2)
    base.update(kw)
    return finalize(Args(**base), explicit=set(base))


def test_property_evaluator(tmp_path, synth_dataset):
    ds = synth_dataset
    args = _args(tmp_path)
    red = create_reducer("random", ds, args).reduce(ds)
    props = PropertyEvaluator(ds, args).compare(red)
    ori = props["original"]
    assert 0 < ori["density"] < 1
    assert ori["homophily"] > 0.6
    assert ori["spectral_radius"] > 0
    assert ori["davies_bouldin"] > 0
    assert set(props["reduced"]) >= {"density", "homophily"}


def test_mia():
    rng = np.random.default_rng(0)
    n = 200
    y1 = rng.integers(0, 3, n)
    y2 = rng.integers(0, 3, n)
    # members confident, non-members not → attack succeeds
    conf1 = np.full((n, 3), 0.05)
    conf1[np.arange(n), y1] = 0.9
    conf2 = np.full((n, 3), 1 / 3)
    acc = inference_via_confidence(conf1, conf2, y1, y2)
    assert acc > 0.9
    # identical distributions → chance
    acc2 = inference_via_confidence(conf2, conf2, y2, y2)
    assert acc2 == pytest.approx(0.5, abs=0.05)


@pytest.mark.parametrize("attack_name", ["random_adj", "random_feat",
                                         "metattack"])
@pytest.mark.slow
def test_attacks(tmp_path, attack_name):
    from graphslim_tpu.data.attack import attack

    ds = load("synth-small", split="random", seed=0)
    args = _args(tmp_path, attack=attack_name, ptb_r=0.2,
                 eval_epochs=40, prbcd_epochs=12, prbcd_fine_tune=4,
                 prbcd_block=4000)
    out = attack(ds, args)
    if attack_name == "random_feat":
        assert not np.allclose(np.asarray(out.feat), np.asarray(ds.feat))
        assert out.adj.nnz == ds.adj.nnz
    elif attack_name == "metattack":
        # PRBCD may both add and remove edges; the perturbation must be
        # non-empty and within the flip budget
        budget = int(0.2 * ds.adj.nnz / 2)
        assert out.adj.nnz != ds.adj.nnz
        assert abs(out.adj.nnz - ds.adj.nnz) <= 2 * budget
    else:
        assert out.adj.nnz > ds.adj.nnz
    # cache hit path
    out2 = attack(ds, args)
    assert out2.adj.nnz == out.adj.nnz


@pytest.mark.slow
def test_nas_quick(tmp_path, synth_dataset):
    ds = synth_dataset
    args = _args(tmp_path, eval_epochs=30)
    red = create_reducer("random", ds, args).reduce(ds)
    nas = NasEvaluator(ds, args, space={
        "ks": [2], "nhids": [16, 32], "alphas": [0.1],
        "activations": ["relu"]})
    out = nas.correlation(red)
    assert -1.0 <= out["pearson_acc"] <= 1.0
    assert len(out["best_ori"]) == 4


def test_pearson():
    a = np.array([1.0, 2, 3, 4])
    assert pearson(a, 2 * a + 1) == pytest.approx(1.0)
    assert pearson(a, -a) == pytest.approx(-1.0)


@pytest.mark.slow
def test_grid_search(tmp_path, synth_dataset):
    ds = synth_dataset
    args = _args(tmp_path, run_eval=2)
    red = create_reducer("random", ds, args).reduce(ds)
    (mean, std), params = Evaluator(ds, args).grid_search(
        red, "GCN", param_grid={"hidden": [32, 64], "lr": [0.01]})
    assert mean > 0.5
    assert params["hidden"] in (32, 64)


@pytest.mark.slow
def test_mia_on_trained_model(tmp_path, synth_dataset):
    from graphslim_tpu import models as M

    ds = synth_dataset
    model = M.get_model("GCN", M.ModelConfig(nfeat=ds.n_feat, nhid=32,
                                             nclass=ds.nclass))
    norm = ds.adj_norm()
    tr = jnp.asarray(ds.idx_train)
    params, _, _ = M.fit_with_val(
        model, jax.random.key(0),
        train=(ds.feat, norm, ds.labels[tr], tr),
        val=(ds.feat, norm, ds.labels[jnp.asarray(ds.idx_val)],
             jnp.asarray(ds.idx_val)),
        cfg=M.TrainConfig(epochs=100))
    acc = mia_attack(model, params, ds)
    assert 0.5 <= acc <= 1.0
