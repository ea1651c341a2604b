"""Condensation engine: match_loss numerics + GCond-family e2e."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphslim_tpu.config import Args, finalize
from graphslim_tpu.eval import Evaluator
from graphslim_tpu.reduce import create_reducer
from graphslim_tpu.reduce.cond_base import match_loss, fanouts_for
from graphslim_tpu.models.pge import PGE, PGEConfig


def test_match_loss_ours_excludes_bias():
    gw1 = {"w": jnp.asarray([[1.0, 0.0], [0.0, 1.0]]),
           "b": jnp.asarray([1.0, 2.0])}
    gw2 = {"w": jnp.asarray([[1.0, 0.0], [0.0, 1.0]]),
           "b": jnp.asarray([-5.0, 7.0])}
    # identical weights, different biases -> ours distance 0
    assert float(match_loss(gw1, gw2, "ours")) == pytest.approx(0.0,
                                                                abs=1e-5)
    # orthogonal rows -> 1 - cos = 1 per row
    gw3 = {"w": jnp.asarray([[0.0, 1.0], [1.0, 0.0]]),
           "b": jnp.asarray([0.0, 0.0])}
    assert float(match_loss(gw1, gw3, "ours")) == pytest.approx(2.0,
                                                                rel=1e-4)


def test_match_loss_mse_cos():
    gw1 = {"w": jnp.asarray([[1.0, 2.0]])}
    gw2 = {"w": jnp.asarray([[3.0, 0.0]])}
    assert float(match_loss(gw1, gw2, "mse")) == pytest.approx(8.0)
    cos = float(match_loss(gw1, gw1, "cos"))
    assert cos == pytest.approx(0.0, abs=1e-4)


def test_fanout_policy():
    assert fanouts_for(1, "cora") == [15]
    assert fanouts_for(2, "cora") == [10, 5]
    assert fanouts_for(2, "reddit") == [15, 8]
    assert fanouts_for(3, "cora") == [15, 10, 5]
    assert fanouts_for(5, "cora") == [15, 10, 5, 5, 5]


def test_pge_symmetric_zero_diag():
    cfg = PGEConfig(nfeat=8, nnodes=12, nhid=16)
    pge = PGE(cfg)
    params = pge.init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(12, 8)),
                    dtype=jnp.float32)
    adj = np.asarray(pge.apply(params, x))
    np.testing.assert_allclose(adj, adj.T, rtol=1e-5)
    np.testing.assert_allclose(np.diag(adj), np.zeros(12), atol=1e-6)
    assert (adj >= 0).all() and (adj <= 1).all()


def test_pge_row_block_matches_single_shot():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(12, 8)),
                    dtype=jnp.float32)
    p_cfg = PGEConfig(nfeat=8, nnodes=12, nhid=16, row_block=0)
    pge = PGE(p_cfg)
    params = pge.init(jax.random.key(0))
    full = np.asarray(pge.apply(params, x))
    # NB: row-blocked BN uses per-block stats (reference per-chunk BN), so
    # only shapes/invariants match, not exact values
    blocked = PGE(PGEConfig(nfeat=8, nnodes=12, nhid=16, row_block=4))
    adj_b = np.asarray(blocked.apply(params, x))
    assert adj_b.shape == full.shape
    np.testing.assert_allclose(adj_b, adj_b.T, rtol=1e-5)


def _run(method, ds, tmp_path, **extra):
    base = dict(dataset="synth-small", method=method,
                save_path=str(tmp_path), epochs=4, outer_loop=2,
                inner_loop=1, eval_epochs=50, run_eval=2,
                run_inter_eval=1, lr_feat=0.01, lr_adj=0.01,
                condense_model="SGC")
    base.update(extra)
    args = finalize(Args(**base), explicit=set(base))
    red = create_reducer(method, ds, args).reduce(ds)
    (mean, std), _ = Evaluator(ds, args).evaluate(red, "GCN")
    return red, mean


@pytest.mark.parametrize("method", ["gcond", "doscond"])
@pytest.mark.slow
def test_gcond_structured(tmp_path, synth_dataset, method):
    # doscond (one optimizer step per outer iter) needs a hotter lr to
    # converge inside the 4-epoch test budget robustly across RNG streams
    extra = {"lr_feat": 0.03, "lr_adj": 0.03} if method == "doscond" else {}
    red, acc = _run(method, synth_dataset, tmp_path, **extra)
    assert red.adj is not None
    adj = np.asarray(red.adj)
    assert adj.shape == (red.n_syn, red.n_syn)
    np.testing.assert_allclose(adj, adj.T, rtol=1e-4)
    assert acc > 0.7, acc


@pytest.mark.parametrize("method", ["gcondx", "doscondx", "gcdm"])
@pytest.mark.slow
def test_gcond_structure_free(tmp_path, synth_dataset, method):
    extra = {"condense_model": "GCN", "dis_metric": "mse",
             "lr_feat": 0.05} if method == "gcdm" else {}
    red, acc = _run(method, synth_dataset, tmp_path, **extra)
    assert red.adj is None
    assert acc > 0.7, acc


def test_gcond_labels_budget(tmp_path, synth_dataset):
    ds = synth_dataset
    red, _ = _run("doscondx", ds, tmp_path)
    n_train = ds.idx_train.shape[0]
    assert red.n_syn == max(int(n_train * 0.25), ds.nclass)
    labels = np.asarray(red.labels)
    # every class represented
    assert set(np.unique(labels)) == set(range(ds.nclass))


def test_matmul_precision_knob(tmp_path, synth_dataset):
    """args.matmul_precision='highest' wraps reduce() in
    jax.default_matmul_precision — the TPU-quality knob for nested-grad
    structure learning (docs/PERF.md round 5: gcond 0.558 -> 0.696 at
    identical budget on the hard-twin leaderboard).  On CPU this is
    numerics-neutral; the test pins that the knob threads through
    Args -> Reducer.reduce -> jit tracing without error."""
    red, acc = _run("gcondx", synth_dataset, tmp_path, epochs=1,
                    outer_loop=1, matmul_precision="highest")
    assert np.isfinite(acc) and red.feat.shape[0] > 0


def test_sgdd_tpu_precision_default(tmp_path, synth_dataset, monkeypatch):
    """On a TPU backend SGDD defaults matmul_precision to 'highest' —
    the default bf16-multiply lowering both crashes the on-device
    eigensolver behind its spectral-OT loss and costs ~0.4 accuracy
    (docs/PERF.md round 5).  An explicit user setting wins."""
    import jax as _jax

    from graphslim_tpu.reduce.sgdd import SGDD

    base = dict(dataset="synth-small", method="sgdd",
                save_path=str(tmp_path), epochs=2, outer_loop=1,
                inner_loop=1, condense_model="SGC")
    args = finalize(Args(**base), explicit=set(base))
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    eng = SGDD(synth_dataset, args)
    assert eng.args.matmul_precision == "highest"
    # explicit setting respected
    args2 = args.replace(matmul_precision="default")
    assert SGDD(synth_dataset, args2).args.matmul_precision == "default"
    # opt_scale=0 disables the decomposition path -> no override
    args3 = args.replace(opt_scale=0.0)
    assert SGDD(synth_dataset, args3).args.matmul_precision is None
