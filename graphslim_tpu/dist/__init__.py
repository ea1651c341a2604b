"""Multi-chip scaling: meshes, sharded SpMM, distributed condensation.

The reference has ZERO multi-device support (SURVEY.md §2.10) — this layer
is a new TPU-native design:

* **Node-partitioned full-graph SpMM** (:mod:`graphslim_tpu.dist.spmm`):
  rows sharded across devices, features gathered over ICI — the graph
  analog of sequence/context parallelism.
* **Class-parallel gradient matching** (:mod:`graphslim_tpu.dist.matching`):
  GCond's per-class match terms are embarrassingly parallel; classes shard
  across the mesh and the scalar loss psums.
* **Seed-parallel evaluation** (:mod:`graphslim_tpu.dist.evalp`): the
  10-seed evaluation vmap shards over devices.
"""

from graphslim_tpu.dist.mesh import make_mesh
from graphslim_tpu.dist.spmm import (shard_spmm, shard_spmm_halo,
                                     partition_rows, partition_rows_halo)
