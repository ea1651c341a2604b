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
@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Optimal (blossom) matching strategy
# ---------------------------------------------------------------------------

def test_native_blossom_exact_vs_bruteforce():
    """Native Edmonds blossom matches a bitmask-DP oracle exactly."""
    import itertools
    from graphslim_tpu import native
    if native.load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    for _ in range(40):
        n = int(rng.integers(2, 11))
        edges = [(i, j) for i, j in itertools.combinations(range(n), 2)
                 if rng.random() < 0.6]
        if not edges:
            continue
        src = np.array([e[0] for e in edges])
        dst = np.array([e[1] for e in edges])
        w = rng.integers(1, 20, size=len(edges)).astype(np.float64)
        pairs = native.max_weight_matching(src, dst, w, n)
        W = np.zeros((n, n))
        W[src, dst] = w
        W += W.T
        got = sum(W[i, j] for i, j in pairs)
        # oracle: DP over vertex subsets
        best = np.full(1 << n, -1.0)
        best[0] = 0.0
        for mask in range(1 << n):
            if best[mask] < 0:
                continue
            i = 0
            while i < n and (mask >> i) & 1:
                i += 1
            if i == n:
                continue
            m2 = mask | (1 << i)
            best[m2] = max(best[m2], best[mask])
            for j in range(i + 1, n):
                if not (mask >> j) & 1 and W[i, j] > 0:
                    m3 = m2 | (1 << j)
                    best[m3] = max(best[m3], best[mask] + W[i, j])
        assert got == best[-1], (n, got, best[-1])
        flat = pairs.ravel().tolist()
        assert len(set(flat)) == len(flat)


@pytest.mark.parametrize("method", ["heavy_edge", "variation_edges",
                                    "algebraic_jc"])
def test_coarsening_optimal_strategy(tmp_path, synth_dataset, method):
    """coarsen_strategy=optimal (reference `matching_optimal`) end-to-end."""
    ds = synth_dataset
    args = _args(tmp_path, method, coarsen_strategy="optimal")
    red = create_reducer(method, ds, args).reduce(ds)
    assert 0 < red.n_syn < ds.n_nodes
    (mean, _), _ = Evaluator(ds, args).evaluate(red, "GCN")
    assert mean > 0.4, (method, mean, red.n_syn)
