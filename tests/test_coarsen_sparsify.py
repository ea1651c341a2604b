"""Coarsening + edge sparsification e2e tests."""

import numpy as np
import pytest

from graphslim_tpu.config import Args, finalize
from graphslim_tpu.eval import Evaluator
from graphslim_tpu.reduce import create_reducer
from graphslim_tpu import graph as G


def _args(tmp_path, method, **kw):
    base = dict(dataset="synth-small", method=method,
                save_path=str(tmp_path), eval_epochs=60, run_eval=2,
                condense_model="GCN")
    base.update(kw)
    return finalize(Args(**base), explicit=set(base))


COARSEN = ["variation_neighborhoods", "variation_edges",
           "variation_cliques", "heavy_edge", "algebraic_jc",
           "affinity_gs", "kron"]


@pytest.mark.parametrize("method", COARSEN)
def test_coarsening_e2e(tmp_path, synth_dataset, method):
    ds = synth_dataset
    args = _args(tmp_path, method)
    red = create_reducer(method, ds, args).reduce(ds)
    assert red.n_syn < ds.n_nodes
    assert red.n_syn > 0
    assert isinstance(red.adj, G.SparseAdj) or red.adj is not None
    (mean, _), _ = Evaluator(ds, args).evaluate(red, "GCN")
    assert mean > 0.4, (method, mean, red.n_syn)


@pytest.mark.parametrize("method", ["clustering", "averaging", "vng"])
def test_structure_free_coarsening(tmp_path, synth_dataset, method):
    ds = synth_dataset
    args = _args(tmp_path, method)
    red = create_reducer(method, ds, args).reduce(ds)
    (mean, _), _ = Evaluator(ds, args).evaluate(red, "GCN")
    assert mean > 0.5, (method, mean)


def test_cluster_as_condensation_init(tmp_path, synth_dataset):
    """Init path: labels_syn_override produces aligned features."""
    ds = synth_dataset
    args = _args(tmp_path, "clustering")
    labels_syn = np.array([0] * 5 + [1] * 3 + [2] * 4 + [3] * 2)
    red = create_reducer("clustering", ds, args,
                         labels_syn_override=labels_syn).reduce(ds)
    assert red.n_syn == len(labels_syn)
    np.testing.assert_array_equal(np.asarray(red.labels), labels_syn)


EDGE = ["random_edge", "g_spar", "local_degree", "scan",
        "spanning_forest", "rank_degree", "t_spanner"]


@pytest.mark.parametrize("method", EDGE)
def test_edge_sparsify_e2e(tmp_path, synth_dataset, method):
    ds = synth_dataset
    args = _args(tmp_path, method, reduction_rate=0.5)
    red = create_reducer(method, ds, args).reduce(ds)
    # same node set, fewer edges
    assert red.n_syn == ds.n_nodes
    assert red.adj.nnz <= ds.adj.nnz
    if method not in ("spanning_forest",):
        assert red.adj.nnz > 0
    (mean, _), _ = Evaluator(ds, args).evaluate(red, "GCN")
    assert mean > 0.4, (method, mean)


def test_jaccard_scores_sane(synth_dataset):
    from graphslim_tpu.reduce.edge_sparsify import (
        GSpar, _to_scipy, _upper_edges, _common_neighbors)
    ds = synth_dataset
    W = _to_scipy(ds.adj)
    edges, w = _upper_edges(W)
    common = _common_neighbors(W, edges)
    # oracle on a few edges
    Wb = (W > 0).toarray()
    for e in [0, 5, 17]:
        u, v = edges[:, e]
        expected = int(np.sum(Wb[u] & Wb[v]))
        assert common[e] == expected
