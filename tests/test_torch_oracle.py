"""Per-layer activation parity against an independent torch oracle.

BASELINE.md target: "per-layer activations allclose vs the mounted PyG
implementation".  PyG itself is not installed in this image, so the
oracle re-implements the reference's exact layer math (cited per model in
``models/zoo.py``) in plain PyTorch, with the JAX models' weights
injected — an independent-framework numerical check of the full forward
path (normalization → linear → aggregation → activation → log_softmax).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from graphslim_tpu import graph as G
from graphslim_tpu import models as M

torch.set_grad_enabled(False)


@pytest.fixture(scope="module")
def small_graph():
    rng = np.random.default_rng(0)
    n, e, d, c = 60, 240, 16, 4
    ei = rng.integers(0, n, size=(2, e))
    adj = G.from_edge_index(ei, n, symmetrize=True)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return adj, x, d, c


def _dense_norm_oracle(adj):
    """Reference ``normalize_adj_tensor`` (SparseTensor path,
    ``utils.py:36-48``): fill_diag(1) then D^-1/2 A D^-1/2 (torch)."""
    A = torch.tensor(np.asarray(adj.to_dense()), dtype=torch.float64)
    A.fill_diagonal_(1.0)
    d = A.sum(1)
    dinv = d.pow(-0.5)
    dinv[torch.isinf(dinv)] = 0.0
    return dinv[:, None] * A * dinv[None, :]


def _t(a) -> torch.Tensor:
    return torch.tensor(np.asarray(a), dtype=torch.float64)


def test_gcn_norm_matches_oracle(small_graph):
    adj, x, d, c = small_graph
    ours = np.asarray(G.gcn_norm(adj).to_dense())
    want = _dense_norm_oracle(adj).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-6)


def _jax_forward(name, adj, x, d, c, **cfg_kw):
    cfg = M.ModelConfig(nfeat=d, nhid=32, nclass=c, dropout=0.0,
                        with_bn=False, **cfg_kw)
    model = M.get_model(name, cfg)
    params = model.init(jax.random.key(0))
    out = model.apply(params, jnp.asarray(x), G.gcn_norm(adj))
    return params, np.asarray(out)


def test_gcn_layer_activations(small_graph):
    """GCN: per layer A@(XW+b), ReLU between, log_softmax head
    (reference ``models/layers.py:36-51``, ``gcn.py:8-23``)."""
    adj, x, d, c = small_graph
    params, got = _jax_forward("GCN", adj, x, d, c, nlayers=2)
    An = _dense_norm_oracle(adj)
    h = _t(x)
    acts = []
    for i, p in enumerate(params["layers"]):
        h = An @ (h @ _t(p["w"]) + _t(p["b"]))
        if i != len(params["layers"]) - 1:
            h = torch.relu(h)
        acts.append(h)
    want = torch.log_softmax(h, dim=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # per-layer activations via layer_features
    model = M.get_model("GCN", M.ModelConfig(nfeat=d, nhid=32, nclass=c,
                                             dropout=0.0, with_bn=False,
                                             nlayers=2))
    feats = model.layer_features(params, jnp.asarray(x), G.gcn_norm(adj))
    for f, a in zip(feats, acts):
        np.testing.assert_allclose(np.asarray(f), a.numpy(), rtol=1e-4,
                                   atol=1e-5)


def test_sgc_activations(small_graph):
    """SGC: ntrans linears (ReLU between) then nlayers propagations
    (reference ``sgc.py:37-57``)."""
    adj, x, d, c = small_graph
    params, got = _jax_forward("SGC", adj, x, d, c, nlayers=2, ntrans=2)
    An = _dense_norm_oracle(adj)
    h = _t(x)
    for i, p in enumerate(params["layers"]):
        h = h @ _t(p["w"]) + _t(p["b"])
        if i != len(params["layers"]) - 1:
            h = torch.relu(h)
    for _ in range(2):
        h = An @ h
    want = torch.log_softmax(h, dim=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_appnp_activations(small_graph):
    """APPNP: linear then K steps (1−α)Ax + αh (reference
    ``appnp.py:35-88``)."""
    adj, x, d, c = small_graph
    alpha, K = 0.1, 10
    params, got = _jax_forward("APPNP", adj, x, d, c, nlayers=K,
                               ntrans=1, alpha=alpha)
    An = _dense_norm_oracle(adj)
    h = _t(x) @ _t(params["layers"][0]["w"]) + _t(params["layers"][0]["b"])
    z = h
    for _ in range(K):
        z = (1 - alpha) * (An @ z) + alpha * h
    want = torch.log_softmax(z, dim=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cheby_activations(small_graph):
    """Cheby: K=2 recurrence with single shared weight per layer
    (reference ``layers.py:288-351``, single_param)."""
    adj, x, d, c = small_graph
    params, got = _jax_forward("Cheby", adj, x, d, c, nlayers=2)
    An = _dense_norm_oracle(adj)
    h = _t(x)
    for i, p in enumerate(params["layers"]):
        W = _t(p["lin"]["w"])
        out = h @ W + (An @ h) @ W + _t(p["b"])
        if i != len(params["layers"]) - 1:
            out = torch.relu(out)
        h = out
    want = torch.log_softmax(h, dim=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_graphsage_activations(small_graph):
    """SAGE: W(A@x) + W(x) shared-weight root term (reference
    ``layers.py:252-285``)."""
    adj, x, d, c = small_graph
    params, got = _jax_forward("GraphSage", adj, x, d, c, nlayers=2)
    An = _dense_norm_oracle(adj)
    h = _t(x)
    for i, p in enumerate(params["layers"]):
        W = _t(p["lin"]["w"])
        out = (An @ h) @ W + h @ W
        if i != len(params["layers"]) - 1:
            out = torch.relu(out)
        h = out
    want = torch.log_softmax(h, dim=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mlp_activations(small_graph):
    adj, x, d, c = small_graph
    params, got = _jax_forward("MLP", adj, x, d, c, nlayers=2)
    h = _t(x)
    for i, p in enumerate(params["layers"]):
        h = h @ _t(p["w"]) + _t(p["b"])
        if i != len(params["layers"]) - 1:
            h = torch.relu(h)
    want = torch.log_softmax(h, dim=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
