"""Extra kernel tests (round 2): cache-blocked Pallas SpMM."""

import numpy as np


def test_blocked_spmm_matches_reference():
    """Cache-blocked Pallas SpMM (interpret mode) == COO SpMM."""
    import jax.numpy as jnp

    from graphslim_tpu import graph as G
    from graphslim_tpu.kernels.pallas_spmm_blocked import (build_blocked,
                                                           spmm_blocked)

    rng = np.random.default_rng(3)
    n, e, d = 500, 3000, 16
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    adj = G.gcn_norm(G.from_edge_index(ei, n, symmetrize=True, dedup=True))
    bc = build_blocked(np.asarray(adj.indptr), np.asarray(adj.col),
                       np.asarray(adj.val), td=128, ts=128, chunk=256)
    assert 0.0 < bc.fill <= 1.0
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    ref = np.asarray(adj.matmul(x))
    for mode in ("onehot", "cumsum"):
        out = spmm_blocked(bc, x, interpret=True, scatter=mode)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
