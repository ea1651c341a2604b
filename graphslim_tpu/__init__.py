"""graphslim_tpu — a TPU-native graph-reduction + GNN framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
Emory-Melody/GraphSlim (reference mounted at /root/reference): graph
sparsification, coarsening, and condensation, plus a functional GNN model zoo,
a unified jit-compiled trainer/evaluator, and multi-chip scaling via
``jax.sharding`` meshes.

Design principles (differ deliberately from the torch/PyG reference):

* Immutable pytree data containers instead of a mutable ``TransAndInd`` object
  (reference ``graphslim/dataset/loader.py:100``).
* One adjacency abstraction (:mod:`graphslim_tpu.graph`) covering dense,
  batched-dense, sparse-COO and sampled-block forms — the reference's
  quadruple calling convention (``graphslim/models/base.py:51-78``) —
  dispatched through a single ``aggregate`` kernel entry point.
* All hot loops are ``jit``-compiled with static shapes; neighborhood
  sampling is fixed-fanout + padded instead of PyG's dynamic CPU sampler.
* Multi-device scaling via ``Mesh`` + ``shard_map`` collectives; the
  reference has no distributed path at all (SURVEY.md §2.10).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("GRAPHSLIM_PLATFORM"):
    # Honor a CPU/TPU override for CLI/script runs.  The bare
    # JAX_PLATFORMS env var is ineffective in environments whose
    # sitecustomize registers a backend unconditionally; jax.config is
    # the authoritative switch and must flip before first backend use.
    import jax as _jax

    _jax.config.update("jax_platforms",
                       _os.environ["GRAPHSLIM_PLATFORM"])

from graphslim_tpu import graph as graph
from graphslim_tpu import kernels as kernels
