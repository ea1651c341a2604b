"""File-ingestion path tests (reference ``dataset/loader.py:380-515``
DataGraphSAINT + ``loader.py:39-97`` ``get_dataset`` with local files).

Real Planetoid/OGB downloads are impossible in this zero-egress container,
so the checked-in fixture is a small graph saved in the exact GraphSAINT
on-disk format (``adj_full.npz`` scipy CSR, ``feats.npy``,
``class_map.json`` with both scalar and one-hot entries, ``role.json``)
— the loader cannot distinguish it from a real download, so every branch
of the file path (scipy npz parse, class-map argmax, role split) is
exercised exactly as real data would.
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from graphslim_tpu.config import Args, finalize
from graphslim_tpu.data import load
from graphslim_tpu.eval import Evaluator
from graphslim_tpu.reduce import create_reducer

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "saint-small")


def test_saint_ingestion_files_win_over_synthesis():
    ds = load("synth-small", data_dir=FIXTURE, seed=0)
    # graph must equal the files, not the (different-seed) synthetic twin
    import scipy.sparse as sp
    A = sp.load_npz(os.path.join(FIXTURE, "synth-small", "adj_full.npz"))
    assert ds.adj.nnz == int((A + A.T > 0).sum())
    feats = np.load(os.path.join(FIXTURE, "synth-small", "feats.npy"))
    assert ds.feat.shape == feats.shape
    role = json.load(open(os.path.join(FIXTURE, "synth-small",
                                       "role.json")))
    np.testing.assert_array_equal(ds.idx_train, np.sort(role["tr"]))
    np.testing.assert_array_equal(ds.idx_test, np.sort(role["te"]))
    # class_map one-hot entries decode via argmax
    cm = json.load(open(os.path.join(FIXTURE, "synth-small",
                                     "class_map.json")))
    labels = np.asarray(ds.labels)
    for k in ("0", "3", "9"):   # one-hot rows (i % 3 == 0)
        assert labels[int(k)] == int(np.argmax(cm[k]))
    for k in ("1", "2"):        # scalar rows
        assert labels[int(k)] == cm[k]


@pytest.mark.parametrize("method", ["kcenter", "gcond"])
@pytest.mark.slow
def test_reduce_on_ingested_files(tmp_path, method):
    """kcenter + gcond end-to-end on file-ingested data via load_path
    (VERDICT r1 item 8's 'done' criterion)."""
    base = dict(dataset="synth-small", method=method,
                save_path=str(tmp_path), load_path=FIXTURE,
                eval_epochs=50, run_eval=2)
    if method == "gcond":
        base.update(epochs=3, outer_loop=2, inner_loop=1,
                    run_inter_eval=1, lr_feat=0.01, lr_adj=0.01,
                    condense_model="SGC")
    args = finalize(Args(**base), explicit=set(base))
    ds = load(args.dataset, data_dir=args.load_path, seed=0)
    red = create_reducer(method, ds, args).reduce(ds, verbose=False)
    assert np.isfinite(np.asarray(red.feat)).all()
    (mean, _), _ = Evaluator(ds, args).evaluate(red, "GCN")
    assert mean > 0.5, (method, mean)


def test_planetoid_raw_format(tmp_path):
    """The Planetoid ind.* pickle parser reconstructs features/labels in
    node order through the test.index permutation AND the isolated-node
    (citeseer) zero-fill, from a fixture written in the real format
    (reference Planetoid branch, `dataset/loader.py:61`; VERDICT r3
    item 7)."""
    from graphslim_tpu.data import load

    fdir = os.path.join(os.path.dirname(__file__), "fixtures",
                        "raw-planetoid")
    ds = load("cora", data_dir=fdir, split="fixed", seed=0)
    want_feat = np.load(os.path.join(fdir, "expected_feat.npy"))
    want_lab = np.load(os.path.join(fdir, "expected_labels.npy"))
    want_test = np.load(os.path.join(fdir, "expected_test.npy"))
    # spec transform is row_norm — undo by comparing normalized oracle
    norms = np.linalg.norm(want_feat, axis=1, keepdims=True)
    want_norm = want_feat / np.maximum(norms, 1e-12)
    np.testing.assert_allclose(np.asarray(ds.feat), want_norm,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ds.labels), want_lab)
    np.testing.assert_array_equal(np.asarray(ds.idx_test), want_test)
    # standard split: first len(y) nodes train
    np.testing.assert_array_equal(np.asarray(ds.idx_train), np.arange(9))
    assert ds.adj.nnz > 0


def test_ogb_raw_format():
    """The OGB node-prop csv.gz parser (edge/node-feat/node-label +
    split/<scheme>) loads a fixture written in the real layout
    (reference PygNodePropPredDataset branch, `dataset/loader.py:67`)."""
    from graphslim_tpu.data import load

    fdir = os.path.join(os.path.dirname(__file__), "fixtures", "raw-ogb")
    ds = load("ogbn-products", data_dir=fdir, seed=0)
    want_feat = np.load(os.path.join(fdir, "expected_feat.npy"))
    want_lab = np.load(os.path.join(fdir, "expected_labels.npy"))
    want_tr = np.load(os.path.join(fdir, "expected_train.npy"))
    # products spec standardizes on train stats — undo via the oracle
    mu = want_feat[want_tr].mean(0)
    sd = np.maximum(want_feat[want_tr].std(0), 1e-12)
    want_norm = (want_feat - mu) / sd
    np.testing.assert_allclose(np.asarray(ds.feat), want_norm,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ds.labels), want_lab)
    np.testing.assert_array_equal(np.asarray(ds.idx_train), want_tr)


def test_gnn_benchmark_npz_format():
    """The gnn-benchmark CSR-keyed npz parser (PyG CitationFull/
    Coauthor/Amazon raw format — reference `dataset/loader.py:57-64`)
    loads a fixture written in the real schema."""
    from graphslim_tpu.data import load

    fdir = os.path.join(os.path.dirname(__file__), "fixtures",
                        "raw-gnnbench")
    ds = load("cora_ml", data_dir=fdir, split="random", seed=0)
    want_feat = np.load(os.path.join(fdir, "expected_feat.npy"))
    want_lab = np.load(os.path.join(fdir, "expected_labels.npy"))
    norms = np.linalg.norm(want_feat, axis=1, keepdims=True)
    want_norm = want_feat / np.maximum(norms, 1e-12)
    np.testing.assert_allclose(np.asarray(ds.feat), want_norm,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ds.labels), want_lab)
    assert ds.adj.nnz > 0
    # no public split in the format: random class-wise split applied
    assert len(ds.idx_train) > 0 and len(ds.idx_test) > 0


def test_fraud_mat_format(tmp_path):
    """The DGL FraudDataset .mat parser (yelp/amazon raw files —
    reference `dataset/loader.py:72-73` via `from_dgl(hetero=False)`,
    `convertor.py:15-58`) unions the net_* relation edges, adds
    self-loops, and reads sparse features + labels."""
    import scipy.sparse as sp
    from scipy.io import savemat

    from graphslim_tpu.data import load

    n = 40
    rng = np.random.default_rng(3)
    feat = rng.normal(size=(n, 6)).astype(np.float32)
    labels = (rng.random(n) < 0.3).astype(np.int64)
    # two relations with one shared edge (dedup in the union)
    r1 = sp.coo_matrix((np.ones(3), ([0, 1, 2], [1, 2, 3])), (n, n))
    r2 = sp.coo_matrix((np.ones(2), ([0, 5], [1, 6])), (n, n))
    root = tmp_path / "yelp"
    root.mkdir()
    savemat(str(root / "YelpChi.mat"),
            {"features": sp.csr_matrix(feat), "label": labels,
             "net_rur": r1.tocsr(), "net_rtr": r2.tocsr()})

    ds = load("yelp", data_dir=str(tmp_path), split="random", seed=0)
    np.testing.assert_array_equal(np.asarray(ds.labels), labels)
    # spec transform standardizes on train stats — undo via the oracle
    tr = np.asarray(ds.idx_train)
    mu, sd = feat[tr].mean(0), np.maximum(feat[tr].std(0), 1e-12)
    np.testing.assert_allclose(np.asarray(ds.feat), (feat - mu) / sd,
                               rtol=1e-4, atol=1e-5)
    # union of relations (4 unique directed edges) + n self-loops,
    # symmetrized by the loader
    A = np.zeros((n, n))
    for u, v in [(0, 1), (1, 2), (2, 3), (5, 6)]:
        A[u, v] = A[v, u] = 1.0
    np.fill_diagonal(A, 1.0)
    got = np.zeros((n, n))
    got[ds.adj_host.row, ds.adj_host.col] = 1.0
    np.testing.assert_array_equal(got, (A != 0).astype(float))


def test_fraud_mat_homo_fallback(tmp_path):
    """A FraudDataset .mat with only the precomputed `homo` union (no
    net_* relation keys) still loads."""
    import scipy.sparse as sp
    from scipy.io import savemat

    from graphslim_tpu.data.ingest import _load_fraud_mat

    n = 10
    feat = np.eye(n, dtype=np.float32)
    homo = sp.coo_matrix((np.ones(2), ([0, 1], [1, 2])), (n, n)).tocsr()
    p = tmp_path / "Amazon.mat"
    savemat(str(p), {"features": feat, "label": np.zeros(n, np.int64),
                     "homo": homo})
    ei, f, lab, role = _load_fraud_mat(str(p))
    assert role is None and f.shape == (n, n)
    # 2 homo edges + n self-loops
    assert ei.shape == (2, 2 + n)
