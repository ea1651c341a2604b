"""TPU kernels: sparse matmul, segment reductions, sampling.

Replaces the reference's third-party compiled dependencies
(``torch_sparse``/``torch_scatter``/PyG C++ samplers — SURVEY.md §2.9) with
first-party JAX/Pallas implementations.  Every op has a pure-XLA fallback so
the full framework also runs on CPU for tests.
"""

from graphslim_tpu.kernels.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
)
from graphslim_tpu.kernels.spmm import spmm, spmm_xla, sddmm
from graphslim_tpu.kernels.sample import neighbor_sample_block
