"""PRBCD attack tests (reference ``graphslim/models/prbcd.py:65-440``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphslim_tpu import graph as G
from graphslim_tpu import models as M
from graphslim_tpu.config import Args, finalize
from graphslim_tpu.data import load
from graphslim_tpu.data.attack import (_edge_key_set, _is_existing_edge,
                                       _triu_pairs, prbcd_attack)


def test_triu_pairs_valid():
    rng = np.random.default_rng(0)
    for n in (10, 137, 600):
        r, c = _triu_pairs(rng, n, 2000)
        assert (r < c).all()
        assert r.min() >= 0 and c.max() < n


def test_edge_membership_oracle():
    rng = np.random.default_rng(1)
    n = 300
    ei = np.stack([rng.integers(0, n, 800), rng.integers(0, n, 800)])
    keys = _edge_key_set(ei, n)
    r, c = _triu_pairs(rng, n, 1500)
    got = _is_existing_edge(keys, r, c, n)
    lo = np.minimum(ei[0], ei[1])
    hi = np.maximum(ei[0], ei[1])
    truth_set = set(zip(lo.tolist(), hi.tolist()))
    want = np.array([(a, b) in truth_set
                     for a, b in zip(r.tolist(), c.tolist())])
    assert (got == want).all()


def _gcn_acc(ds, adj, seed=0, epochs=150):
    cfg = M.ModelConfig(nfeat=ds.n_feat, nhid=64, nclass=ds.nclass,
                        nlayers=2)
    model = M.get_model("GCN", cfg)
    norm = G.gcn_norm(adj)
    tr = jnp.asarray(ds.idx_train)
    va = jnp.asarray(ds.idx_val)
    te = jnp.asarray(ds.idx_test)
    params, _, _ = M.fit_with_val(
        model, jax.random.key(seed),
        train=(ds.feat, norm, ds.labels[tr], tr),
        val=(ds.feat, norm, ds.labels[va], va),
        cfg=M.TrainConfig(epochs=epochs))
    return float(M.evaluate(model, params, ds.feat, norm,
                            ds.labels[te], te))


@pytest.mark.slow
def test_prbcd_respects_budget_and_degrades(tmp_path):
    """The attacked graph must stay within the flip budget and reduce GCN
    accuracy more than no attack (reference's robustness protocol)."""
    ds = load("synth-small", split="random", seed=0)
    args = finalize(Args(dataset="synth-small", method="gcond",
                         save_path=str(tmp_path), attack="metattack",
                         ptb_r=0.25))
    budget = int(args.ptb_r * ds.adj.nnz / 2)
    adj2 = prbcd_attack(ds, args, block_size=5000, epochs=20,
                        fine_tune_epochs=5)
    # symmetric graph: each flip changes nnz by 2 at most
    assert abs(adj2.nnz - ds.adj.nnz) <= 2 * budget
    clean = _gcn_acc(ds, ds.adj)
    attacked = _gcn_acc(ds, adj2)
    assert attacked < clean - 0.02, (clean, attacked)
