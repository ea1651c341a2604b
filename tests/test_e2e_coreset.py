"""End-to-end coreset pipeline + registry + config precedence tests."""

import numpy as np
import pytest

from graphslim_tpu.config import Args, finalize
from graphslim_tpu.reduce import create_reducer, get_method_spec, \
    list_methods
from graphslim_tpu.eval import Evaluator
from graphslim_tpu.data import load


def _args(tmp_path, **kw):
    base = dict(dataset="synth-small", save_path=str(tmp_path),
                eval_epochs=100, run_eval=2, run_reduction=1)
    base.update(kw)
    return finalize(Args(**base))


@pytest.mark.parametrize("method", ["random", "kcenter", "herding",
                                    "cent_d", "cent_p"])
def test_coreset_e2e(tmp_path, method, synth_dataset):
    ds = synth_dataset
    args = _args(tmp_path, method=method,
                 eval_epochs=60 if method in ("kcenter", "herding") else 100)
    agent = create_reducer(method, ds, args)
    reduced = agent.reduce(ds)
    n_train = ds.idx_train.shape[0]
    # budget: per-class max(int(num*r),1)
    assert reduced.n_syn <= n_train
    assert reduced.n_syn >= ds.nclass
    labels = np.asarray(reduced.labels)
    assert set(np.unique(labels)) <= set(range(ds.nclass))
    (mean, std), accs = Evaluator(ds, args).evaluate(reduced, "GCN")
    assert mean > 0.5, (method, mean)


def test_agg_variant(tmp_path, synth_dataset):
    ds = synth_dataset
    args = _args(tmp_path, method="kcenter", agg=True)
    agent = create_reducer("kcenter", ds, args)
    reduced = agent.reduce(ds)
    assert reduced.adj is None  # aggregated variants use identity structure
    assert type(agent).__name__ == "KCenterAgg"


@pytest.mark.slow
def test_inductive_coreset(tmp_path):
    ds = load("synth-ind-small", seed=0)
    args = _args(tmp_path, dataset="synth-ind-small", method="random")
    assert args.setting == "ind"
    reduced = create_reducer("random", ds, args).reduce(ds)
    (mean, _), _ = Evaluator(ds, args).evaluate(reduced, "GCN")
    assert mean > 0.4, mean


def test_registry():
    assert get_method_spec("algebraic_JC").name == "algebraic_jc"
    assert get_method_spec("tspanner").name == "t_spanner"
    fams = {get_method_spec(m).family for m in list_methods()}
    assert fams == {"sparsification", "coarsening", "condensation"}
    assert len(list_methods()) >= 30
    with pytest.raises(ValueError):
        get_method_spec("nope")
    # full surface pin: every reference *registered* name (registry.py:
    # 41-142, 36 entries) must resolve.  kcenter_sample and mirage are
    # first-party additions beyond those 36: upstream ships kcenter_sample
    # only as an unregistered file and mirage commented out.
    reference_names = [
        "random", "kcenter", "kcenter_sample", "herding", "cent_d",
        "cent_p", "random_edge", "g_spar", "local_degree", "scan",
        "spanning_forest", "rank_degree", "t_spanner",
        "variation_neighborhoods", "variation_edges", "variation_cliques",
        "heavy_edge", "algebraic_jc", "affinity_gs", "kron", "clustering",
        "averaging", "vng", "gcond", "doscond", "gcondx", "doscondx",
        "gcdm", "gcdmx", "sgdd", "msgc", "sfgc", "geom", "gcsntk",
        "simgc", "gdem", "gecc",
    ]
    assert set(list_methods()) == set(reference_names) | {"mirage"}
    assert get_method_spec("mirage").family == "condensation"


def test_config_precedence():
    # method config applies, CLI-explicit wins, init protected
    args = finalize(Args(dataset="cora", method="gcond"))
    assert args.outer_loop == 20 and args.inner_loop == 15
    assert args.condense_model == "SGC"
    assert args.reduction_rate == 0.5  # representative r
    args2 = finalize(Args(dataset="cora", method="gcond", outer_loop=3),
                     explicit={"outer_loop"})
    assert args2.outer_loop == 3
    # msgc batch_adj override
    args3 = finalize(Args(dataset="cora", method="msgc"))
    assert args3.batch_adj == 16
    # setting forced per dataset + metric
    args4 = finalize(Args(dataset="yelp", method="random"))
    assert args4.setting == "ind" and args4.metric == "f1_macro"
    # checkpoints schedule
    assert args.checkpoints[0] == -1 and args.eval_interval == \
        args.epochs // 10


def test_budget_remainder_absorption():
    from graphslim_tpu.reduce.base import class_budgets
    labels = np.array([0] * 70 + [1] * 20 + [2] * 10)
    b, syn, ranges = class_budgets(labels, 0.1, absorb_remainder=True)
    assert sum(b.values()) == 10  # int(100*0.1)
    assert b[2] == 1 and b[1] == 2 and b[0] == 7
    b2, syn2, _ = class_budgets(labels, 0.1)
    assert b2 == {0: 7, 1: 2, 2: 1}
    # tiny r: every class still gets >= 1
    b3, _, _ = class_budgets(labels, 0.001)
    assert all(v == 1 for v in b3.values())
