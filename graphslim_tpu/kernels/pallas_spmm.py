"""Pallas TPU SpMM kernel (row-block CSR / padded-ELL layout).

Placeholder dispatch hooks for the Pallas fast path; ``spmm`` in
:mod:`graphslim_tpu.kernels.spmm` falls back to the XLA gather+segment path
until this kernel reports support.  Filled in by the performance pass — see
bench.py for the edges/s target (SURVEY.md §6 north-star).
"""

from __future__ import annotations

import jax


def supported(row, col, val, x, n_rows) -> bool:  # noqa: ANN001
    return False


def spmm_pallas(row: jax.Array, col: jax.Array, val: jax.Array, x: jax.Array,
                n_rows: int) -> jax.Array:
    raise NotImplementedError("Pallas SpMM fast path not yet enabled")
