"""Sparse matrix–dense matrix products (SpMM) and sampled dense–dense (SDDMM).

Replaces ``torch_sparse.matmul`` / ``SparseTensor`` aggregation (reference
``graphslim/models/layers.py:13,269``, ``graphslim/models/sgc.py:47-51``).

Two code paths behind one entry point:

* ``spmm_xla`` — gather + sorted ``segment_sum``.  Always correct, runs on
  CPU and TPU; XLA lowers it to a dynamic-gather + scatter-add pair.
* ``spmm_pallas`` (in :mod:`graphslim_tpu.kernels.pallas_spmm`) — a Pallas
  row-block kernel that keeps feature tiles resident in VMEM.  Selected
  automatically on TPU backends for graphs above a size threshold.

The COO layout is expected sorted by row (the :class:`graphslim_tpu.graph
.SparseAdj` invariant) so the segment reduction hits the sorted fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def spmm_xla(row: jax.Array, col: jax.Array, val: jax.Array, x: jax.Array,
             n_rows: int) -> jax.Array:
    """out[r] = sum_{e: row[e]==r} val[e] * x[col[e]]  — pure XLA path."""
    gathered = jnp.take(x, col, axis=0)
    if val is not None:
        gathered = gathered * val[:, None].astype(gathered.dtype)
    return jax.ops.segment_sum(gathered, row, num_segments=n_rows,
                               indices_are_sorted=True)


def spmm(row: jax.Array, col: jax.Array, val: jax.Array, x: jax.Array,
         n_rows: int) -> jax.Array:
    """SpMM dispatch: Pallas on TPU when profitable, XLA otherwise."""
    # The Pallas path is wired up lazily to avoid importing pallas on
    # platforms where it is unavailable (CPU test mesh).
    if _use_pallas(x):
        from graphslim_tpu.kernels import pallas_spmm
        if pallas_spmm.supported(row, col, val, x, n_rows):
            return pallas_spmm.spmm_pallas(row, col, val, x, n_rows)
    return spmm_xla(row, col, val, x, n_rows)


@functools.cache
def _default_backend() -> str:
    return jax.default_backend()


def _use_pallas(x: jax.Array) -> bool:
    if _default_backend() != "tpu":
        return False
    # Small feature dims / tiny graphs: XLA fusion wins; kernel launch
    # overheads dominate otherwise.
    return x.shape[-1] >= 32


def sddmm(row: jax.Array, col: jax.Array, a: jax.Array,
          b: jax.Array) -> jax.Array:
    """Sampled dense-dense matmul: out[e] = <a[row[e]], b[col[e]]>.

    Used for GAT edge scores and graph-property computations (the reference
    materializes these through PyG's MessagePassing C++ backend).
    """
    return jnp.sum(jnp.take(a, row, axis=0) * jnp.take(b, col, axis=0),
                   axis=-1)
