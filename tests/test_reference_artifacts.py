"""Consume the reference's checked-in real reduced-cora artifacts.

The reference ships real condensation outputs for its interactive
browser (``/root/reference/interface/reduced_graph/{method}/
{adj,label}_cora_{rate}_1.pt`` — layout read by
``interface/vis_glim.py`` / ``vis_graphslim.py:26-117``).  These are the
only *real-graph* data in this environment (no network), so loading
them through :mod:`graphslim_tpu.compat` gives real-data artifact
interop and a structural ground truth for what the reference's methods
actually produce (VERDICT r2 item 4).

Half the checked-in files were corrupted upstream by a UTF-8
``errors='replace'`` re-encode; :func:`compat._salvage_mangled_pt`
recovers the ones whose tensor payloads are ASCII-safe (int64 labels)
and refuses — rather than silently mis-reading — the rest.
"""

import os

import numpy as np
import pytest

from graphslim_tpu import compat

ROOT = "/root/reference/interface/reduced_graph"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ROOT), reason="reference artifacts not mounted")

# (method, rate, n, structure) — the recoverable subset; 0.25 adjacency
# float payloads and kcenter labels lost bytes in the upstream mangle.
RECOVERABLE = [
    ("gcond", 0.1, 14), ("gcond", 0.5, 70),
    ("gcondx", 0.1, 14), ("gcondx", 0.5, 70),
    ("random", 0.1, 14), ("random", 0.5, 70),
]


@pytest.mark.parametrize("method,rate,n", RECOVERABLE)
def test_load_reference_reduced(method, rate, n):
    red = compat.load_reference_reduced(ROOT, method, "cora", rate)
    adj = np.asarray(red.adj)
    labels = np.asarray(red.labels)
    assert adj.shape == (n, n)
    assert labels.shape == (n,)
    # cora has 7 classes; reference budgets are balanced per class
    assert labels.min() >= 0 and labels.max() <= 6
    counts = np.bincount(labels, minlength=7)
    assert (counts == counts[0]).all(), counts
    # adjacency is symmetric & non-negative
    np.testing.assert_allclose(adj, adj.T, atol=1e-6)
    assert float(adj.min()) >= 0.0


def test_unrecoverable_artifacts_refuse_loudly():
    """Lossy payloads must raise, never silently return garbage."""
    with pytest.raises(compat.SalvageError):
        compat.load_reference_reduced(ROOT, "gcond", "cora", 0.25)
    with pytest.raises(compat.SalvageError):
        compat.load_reference_reduced(ROOT, "kcenter", "cora", 0.1)


def test_reference_gcond_structure_is_near_dense():
    """The reference's real with-structure GCond output on cora is
    near-dense (the learned sigmoid adjacency keeps almost every entry
    above the eval threshold) — the structural regime our twin
    investigation reproduced (docs/PERF.md 'learned-structure
    investigation').  GCondX by contrast stores the identity."""
    gc = np.asarray(
        compat.load_reference_reduced(ROOT, "gcond", "cora", 0.5).adj)
    gx = np.asarray(
        compat.load_reference_reduced(ROOT, "gcondx", "cora", 0.5).adj)
    n = gc.shape[0]
    gc_density = (gc > 0).sum() / (n * n)
    assert gc_density > 0.9, gc_density
    # gcondx: exactly the n self-loop entries
    assert ((gx > 0).sum()) == n
    offdiag = gx - np.diag(np.diag(gx))
    assert float(np.abs(offdiag).max()) == 0.0


def test_property_evaluator_on_reference_artifacts():
    """PropertyEvaluator runs end-to-end on the real reference outputs."""
    from graphslim_tpu.eval.property import PropertyEvaluator

    red = compat.load_reference_reduced(ROOT, "gcond", "cora", 0.5)
    pe = PropertyEvaluator.__new__(PropertyEvaluator)   # no Dataset needed
    props = pe.properties(red.adj, red.feat, red.labels)
    for k in ("density", "laplacian_trace", "spectral_radius",
              "cluster_coefficient", "homophily", "davies_bouldin"):
        assert np.isfinite(props[k]), (k, props[k])
    assert props["density"] > 0.9
    # near-dense weighted graph: high clustering, homophily ≈ chance
    # (1/7 ≈ 0.14) because every class pair is connected
    assert props["homophily"] < 0.5


def test_torch_artifact_roundtrip(tmp_path):
    """compat.to_torch -> torch.save -> load_torch_artifact closes the
    interop loop for clean archives (the salvage path is exercised by
    the corrupted reference files above)."""
    import torch
    import jax.numpy as jnp

    from graphslim_tpu import graph as G

    feat = jnp.asarray(np.eye(4, dtype=np.float32))
    adj = jnp.asarray([[0, 1, 0, 0], [1, 0, 1, 0],
                       [0, 1, 0, 1], [0, 0, 1, 0]], dtype=jnp.float32)
    labels = jnp.asarray([0, 1, 0, 1], dtype=jnp.int32)
    red = G.Reduced(feat=feat, adj=adj, labels=labels)
    blob = compat.to_torch(red)
    p = tmp_path / "y.pt"
    torch.save(blob["y"], str(p))
    got = compat.load_torch_artifact(str(p))
    np.testing.assert_array_equal(got, np.asarray(labels))
    # dense adjacency tensor round-trip
    p2 = tmp_path / "adj.pt"
    torch.save(torch.from_numpy(np.asarray(adj)), str(p2))
    np.testing.assert_allclose(compat.load_torch_artifact(str(p2)),
                               np.asarray(adj))


def test_save_reference_layout_roundtrip(tmp_path):
    """Bidirectional artifact interop: our writer emits the reference's
    exact layout and our reader loads it back."""
    import jax.numpy as jnp

    from graphslim_tpu import graph as G

    labels = jnp.asarray([0, 1, 2, 0, 1, 2], dtype=jnp.int32)
    adj = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (6, 6)).astype(np.float32))
    adj = (adj + adj.T) / 2
    red = G.Reduced(feat=jnp.eye(6), adj=adj, labels=labels)
    compat.save_reference_layout(red, str(tmp_path), "gcond", "cora",
                                 0.5)
    back = compat.load_reference_reduced(str(tmp_path), "gcond", "cora",
                                         0.5)
    np.testing.assert_allclose(np.asarray(back.adj), np.asarray(adj),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(back.labels),
                                  np.asarray(labels))
    # structure-free: identity adjacency like reference gcondx
    red2 = G.Reduced(feat=jnp.eye(6), adj=None, labels=labels)
    compat.save_reference_layout(red2, str(tmp_path), "gcondx", "cora",
                                 0.5)
    back2 = compat.load_reference_reduced(str(tmp_path), "gcondx",
                                          "cora", 0.5)
    np.testing.assert_allclose(np.asarray(back2.adj), np.eye(6))


def test_reddit_dist_artifact_loads():
    """The committed round-5 distributed-condensation output (8-device
    mesh over the 44M-edge reddit twin, docs/PERF.md) stays loadable
    through the artifact reader."""
    import os

    import numpy as np

    path = os.path.join(os.path.dirname(__file__), "..", "benchmark",
                        "artifacts", "reddit_dist_gcondx_r0.001.npz")
    data = np.load(path, allow_pickle=False)
    assert data["feat"].shape == (186, 602)
    assert data["labels"].shape == (186,)
    assert str(data["adj_kind"]) == "identity"
    assert np.isfinite(data["feat"]).all()
    # labels must cover many of reddit's 41 classes (r=0.001 budgets)
    assert len(np.unique(data["labels"])) >= 30
