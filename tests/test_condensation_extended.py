"""SimGC / SGDD / MSGC + ELL layout tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphslim_tpu import graph as G
from graphslim_tpu.config import Args, finalize
from graphslim_tpu.eval import Evaluator
from graphslim_tpu.reduce import create_reducer
from graphslim_tpu.kernels.ell import ell_from_sparse


def _run(method, ds, tmp_path, **extra):
    base = dict(dataset="synth-small", method=method,
                save_path=str(tmp_path), epochs=3, outer_loop=2,
                inner_loop=1, eval_epochs=50, run_eval=2,
                run_inter_eval=1, lr_feat=0.01, lr_adj=0.01,
                condense_model="SGC")
    base.update(extra)
    args = finalize(Args(**base), explicit=set(base))
    red = create_reducer(method, ds, args).reduce(ds)
    (mean, std), _ = Evaluator(ds, args).evaluate(red, "GCN")
    return red, mean


def test_ell_matches_sparse(synth_dataset):
    ds = synth_dataset
    norm = ds.adj_norm()
    ell = ell_from_sparse(norm, cap=16)
    x = ds.feat
    np.testing.assert_allclose(np.asarray(ell.matmul(x)),
                               np.asarray(norm.matmul(x)),
                               rtol=1e-4, atol=1e-5)
    # dataset-level cache
    ell2 = ds.adj_norm_ell()
    np.testing.assert_allclose(np.asarray(ell2.matmul(x)),
                               np.asarray(norm.matmul(x)),
                               rtol=1e-4, atol=1e-5)


def test_ell_bf16_features_close_to_f32(synth_dataset):
    """bf16-feature ELL SpMM (half the gather bytes — the bandwidth
    lever of VERDICT r4 item 3) accumulates in f32 and must stay within
    bf16 storage rounding of the f32 result."""
    ds = synth_dataset
    ell = ds.adj_norm_ell()
    x = ds.feat
    out32 = np.asarray(ell.matmul(x))
    out16 = np.asarray(ell.matmul(x.astype(jnp.bfloat16)))
    assert out16.dtype == np.float32        # f32 accumulation/output
    np.testing.assert_allclose(out16, out32, rtol=2e-2, atol=2e-2)
    # relative error bounded by input rounding (~2^-8), not degree
    denom = np.maximum(np.abs(out32), 1e-3)
    assert np.median(np.abs(out16 - out32) / denom) < 5e-3


def test_ell_in_model_forward(synth_dataset):
    from graphslim_tpu import models as M
    ds = synth_dataset
    model = M.get_model("GCN", M.ModelConfig(
        nfeat=ds.n_feat, nhid=32, nclass=ds.nclass))
    params = model.init(jax.random.key(0))
    out_sp = np.asarray(model.apply(params, ds.feat, ds.adj_norm()))
    out_ell = np.asarray(model.apply(params, ds.feat, ds.adj_norm_ell()))
    np.testing.assert_allclose(out_ell, out_sp, rtol=5e-3, atol=5e-4)


@pytest.mark.slow
def test_simgc(tmp_path, synth_dataset):
    red, acc = _run("simgc", synth_dataset, tmp_path, epochs=30,
                    lr_teacher=0.01, threshold=0.05)
    assert red.adj is not None
    assert acc > 0.7, acc


@pytest.mark.slow
def test_sgdd(tmp_path, synth_dataset):
    red, acc = _run("sgdd", synth_dataset, tmp_path,
                    opt_scale=1e-11, mx_size=100)
    assert red.adj is not None
    adj = np.asarray(red.adj)
    np.testing.assert_allclose(adj, adj.T, rtol=1e-4)
    assert acc > 0.5, acc


@pytest.mark.slow
def test_msgc(tmp_path, synth_dataset):
    ds = synth_dataset
    red, acc = _run("msgc", ds, tmp_path, batch_adj=3)
    adj = np.asarray(red.dense_adj())
    assert adj.ndim == 3 and adj.shape[0] == 3
    n_syn = adj.shape[1]
    assert np.asarray(red.labels).shape[0] == 3 * n_syn
    assert acc > 0.7, acc


def test_msgc_proportional_labels():
    from graphslim_tpu.reduce.msgc import proportional_labels
    labels = np.array([0] * 60 + [1] * 30 + [2] * 10)
    y = proportional_labels(labels, 20, 3)
    assert y.shape[0] == 20
    counts = np.bincount(y, minlength=3)
    assert counts.min() >= 1
    assert counts[0] > counts[2]


def test_mirage(tmp_path, synth_dataset):
    """Mirage: WL-tree mining condensation (reference mirage.py:17-230,
    unregistered upstream) runs end-to-end and evaluates well."""
    ds = synth_dataset
    base = dict(dataset="synth-small", method="mirage",
                save_path=str(tmp_path), eval_epochs=50, run_eval=2)
    args = finalize(Args(**base), explicit=set(base))
    red = create_reducer("mirage", ds, args).reduce(ds)
    assert red.feat.shape[0] == red.labels.shape[0] > 0
    # budget respected: n_syn <= ~r * n_train (+1 per class rounding)
    assert red.feat.shape[0] <= int(ds.n_nodes * args.reduction_rate) + ds.nclass
    (mean, _), _ = Evaluator(ds, args).evaluate(red, "GCN")
    assert mean > 0.7, mean


def test_mirage_no_label_leak(tmp_path, synth_dataset):
    """Scrambling every non-train label must not change mirage's output:
    in the transductive setting val/test labels are unobserved, so the
    synthetic graph may depend only on structure, features, and train
    labels (regression test for the round-1 leak where labels[origin]
    emitted test nodes' ground truth)."""
    import dataclasses

    ds = synth_dataset
    base = dict(dataset="synth-small", method="mirage",
                save_path=str(tmp_path), eval_epochs=50, run_eval=1)
    args = finalize(Args(**base), explicit=set(base))

    labels = np.asarray(ds.labels).copy()
    non_train = np.setdiff1d(np.arange(labels.shape[0]), ds.idx_train)
    rng = np.random.default_rng(7)
    labels_scrambled = labels.copy()
    labels_scrambled[non_train] = rng.integers(
        0, ds.nclass, size=non_train.shape[0])
    ds_scrambled = dataclasses.replace(
        ds, labels=jnp.asarray(labels_scrambled))

    red_a = create_reducer("mirage", ds, args).reduce(ds)
    red_b = create_reducer("mirage", ds_scrambled, args).reduce(ds_scrambled)
    np.testing.assert_array_equal(np.asarray(red_a.labels),
                                  np.asarray(red_b.labels))
    np.testing.assert_allclose(np.asarray(red_a.feat),
                               np.asarray(red_b.feat))
    # per-class output counts match the computed budgets exactly
    from graphslim_tpu.reduce.base import class_budgets
    budgets, _, _ = class_budgets(ds.labels_for_reduction(),
                                  args.reduction_rate)
    out_counts = dict(zip(*[a.tolist() for a in np.unique(
        np.asarray(red_a.labels), return_counts=True)]))
    assert out_counts == {c: b for c, b in budgets.items() if b > 0}


def test_mirage_fpgrowth_matches_bruteforce():
    """FP-growth output equals brute-force frequent-itemset enumeration."""
    import itertools
    from graphslim_tpu.reduce.mirage import fpgrowth

    rng = np.random.default_rng(3)
    transactions = [tuple(sorted(set(rng.integers(0, 8, size=rng.integers(1, 6)))))
                    for _ in range(30)]
    min_support = 5
    got = {tuple(sorted(p)): c
           for p, c in fpgrowth(transactions, min_support).items()}
    # brute force over all itemsets up to size 4
    items = sorted({i for t in transactions for i in t})
    want = {}
    for k in range(1, 5):
        for combo in itertools.combinations(items, k):
            s = sum(1 for t in transactions if set(combo) <= set(t))
            if s >= min_support:
                want[tuple(combo)] = s
    got_k = {p: c for p, c in got.items() if len(p) <= 4}
    assert got_k == want


def test_gdem_device_eigensolver_matches_arpack():
    """The accelerator eigensolver path (reduce/gdem._eigsh_smallest,
    eigen_backend='device': Chebyshev-filtered subspace iteration,
    residual-gated) reproduces ARPACK's smallest-k eigenpairs of the
    normalized Laplacian: eigenvalues allclose, eigenvector subspaces
    aligned (projector difference on well-separated pairs)."""
    import numpy as np
    import scipy.sparse as sp
    from graphslim_tpu.config import Args, finalize
    from graphslim_tpu.reduce.gdem import _eigsh_smallest

    rng = np.random.default_rng(3)
    n, k = 1200, 12
    src = np.arange(n)
    rows = np.concatenate([src, src, rng.integers(0, n, 3 * n)])
    cols = np.concatenate([(src + 1) % n, (src + 17) % n,
                           rng.integers(0, n, 3 * n)])
    m = rows != cols
    rows, cols = rows[m], cols[m]
    W = sp.csr_matrix((np.ones(2 * len(rows)),
                       (np.concatenate([rows, cols]),
                        np.concatenate([cols, rows]))), shape=(n, n))
    W.data[:] = 1.0
    W = W + sp.eye(n)
    d = np.asarray(W.sum(1)).ravel()
    dinv = 1.0 / np.sqrt(d)
    An = sp.diags(dinv) @ W @ sp.diags(dinv)

    a_host = finalize(Args(eigen_backend="host"),
                      explicit={"eigen_backend"})
    a_dev = finalize(Args(eigen_backend="device"),
                     explicit={"eigen_backend"})
    vh, Uh = _eigsh_smallest(An, k, a_host)
    vd, Ud = _eigsh_smallest(An, k, a_dev)
    np.testing.assert_allclose(np.sort(vd), np.sort(vh), atol=5e-3)
    # subspace agreement on the clearly-converged leading pairs
    kk = 8
    Ph = Uh[:, :kk] @ Uh[:, :kk].T
    Pd = Ud[:, :kk] @ Ud[:, :kk].T
    assert np.abs(Ph - Pd).max() < 5e-2
