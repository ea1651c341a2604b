"""Pallas SpMM dispatch hooks — resolved by measurement (docs/PERF.md).

The planned Pallas fast path was benchmarked against the alternatives on
a v5e chip at ogbn-arxiv scale (4.6 M edges, d=128):

* XLA gather runs at ~103 GB/s effective **independent of index locality
  and element width** — the per-row transaction is the unit of cost;
* a Pallas kernel issuing per-row HBM→VMEM DMAs is descriptor-rate bound
  (≫10× slower than the vectorized gather);
* MXU one-hot/block-dense formulations lose at this sparsity (0.4 %
  within-class tile density after clustering reorder);
* the scatter half of SpMM — which *was* 75 % of the runtime — is
  eliminated entirely by the degree-bucketed ELL layout
  (:mod:`graphslim_tpu.kernels.ell`), which is the production fast path.

Conclusion: ELL + XLA gather sits at the practical ceiling for this op on
this hardware generation, so ``supported()`` intentionally returns False
and dispatch stays on the ELL/XLA paths.  Revisit if a future backend
exposes a higher-throughput gather primitive.
"""

from __future__ import annotations

import jax


def supported(row, col, val, x, n_rows) -> bool:  # noqa: ANN001
    return False


def spmm_pallas(row: jax.Array, col: jax.Array, val: jax.Array, x: jax.Array,
                n_rows: int) -> jax.Array:
    raise NotImplementedError(
        "measured slower than the ELL layout on TPU — see docs/PERF.md")
