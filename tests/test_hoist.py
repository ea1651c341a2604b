"""Hoisted-aggregation exactness + evaluator integration."""

import numpy as np
import jax
import jax.numpy as jnp

from graphslim_tpu import graph as G
from graphslim_tpu import models as M
from graphslim_tpu.models.hoist import hoist
from graphslim_tpu.config import Args, finalize
from graphslim_tpu.eval import Evaluator
from graphslim_tpu.reduce import create_reducer


def test_hoisted_sgc_exact(synth_dataset):
    ds = synth_dataset
    model = M.get_model("SGC", M.ModelConfig(
        nfeat=ds.n_feat, nhid=64, nclass=ds.nclass, nlayers=2, ntrans=1))
    params = model.init(jax.random.key(0))
    adj = ds.adj_norm()
    ref = np.asarray(model.apply(params, ds.feat, adj))
    hm, x_pre, adj_out = hoist(model, ds.feat, adj)
    assert adj_out is None  # SGC: all SpMMs hoisted
    out = np.asarray(hm.apply(params, x_pre, adj_out))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_hoisted_gcn_exact(synth_dataset):
    ds = synth_dataset
    model = M.get_model("GCN", M.ModelConfig(
        nfeat=ds.n_feat, nhid=64, nclass=ds.nclass, nlayers=2,
        dropout=0.0))
    params = model.init(jax.random.key(0))
    adj = ds.adj_norm()
    ref = np.asarray(model.apply(params, ds.feat, adj))
    hm, x_pre, adj_out = hoist(model, ds.feat, adj)
    out = np.asarray(hm.apply(params, x_pre, adj_out))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_hoisted_identity_adj(synth_dataset):
    ds = synth_dataset
    model = M.get_model("SGC", M.ModelConfig(
        nfeat=ds.n_feat, nhid=64, nclass=ds.nclass, nlayers=2, ntrans=1))
    params = model.init(jax.random.key(1))
    ref = np.asarray(model.apply(params, ds.feat, None))
    from graphslim_tpu.models.hoist import hoist_plan, hoist_batch
    hm, hops, keep = hoist_plan(model)
    x_pre, adj_out, _, _ = hoist_batch((ds.feat, None, None, None), hops,
                                       keep)
    out = np.asarray(hm.apply(params, x_pre, adj_out))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_evaluator_with_hoisting_matches(tmp_path, synth_dataset):
    """Eval accuracy with hoisting (GCN/SGC path) stays sane."""
    ds = synth_dataset
    args = finalize(Args(dataset="synth-small", method="random",
                         save_path=str(tmp_path), eval_epochs=60,
                         run_eval=2),
                    explicit={"eval_epochs", "run_eval"})
    red = create_reducer("random", ds, args).reduce(ds)
    for mt in ("GCN", "SGC"):
        (mean, _), _ = Evaluator(ds, args).evaluate(red, mt)
        assert mean > 0.6, (mt, mean)


def test_hoisted_cheby_exact(synth_dataset):
    """Shared-weight Cheby layer 1 == lin(Σ_k T_k(A) X) + b, so the
    Chebyshev-sum input is exactly hoistable (round 3)."""
    import jax
    import numpy as np
    from graphslim_tpu import models as M
    from graphslim_tpu.models.hoist import hoist_batch, hoist_plan

    ds = synth_dataset
    model = M.get_model("Cheby", M.ModelConfig(
        nfeat=ds.n_feat, nhid=32, nclass=ds.nclass, dropout=0.0))
    p = model.init(jax.random.key(0))
    adj = ds.adj_norm()
    out_plain = np.asarray(model.apply(p, ds.feat, adj))
    hm, hops, keep = hoist_plan(model)
    assert hops == ("chebsum", 2)
    x_pre, adj_h, _, _ = hoist_batch((ds.feat, adj, None, None), hops,
                                     keep)
    out_h = np.asarray(hm.apply(p, x_pre, adj_h))
    np.testing.assert_allclose(out_plain, out_h, rtol=1e-5, atol=1e-5)
    # identity-adjacency branch: every T_k(I) X == X
    out_plain_i = np.asarray(model.apply(p, ds.feat, None))
    x_pre_i, adj_i, _, _ = hoist_batch((ds.feat, None, None, None),
                                       hops, keep)
    np.testing.assert_allclose(
        out_plain_i, np.asarray(hm.apply(p, x_pre_i, adj_i)),
        rtol=1e-5, atol=1e-5)
