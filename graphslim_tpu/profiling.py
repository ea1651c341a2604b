"""Profiling/observability utilities.

The reference's only tracing is a wall-time+MB decorator
(``evaluation/utils.py:115-175``, SURVEY.md §5); the TPU build adds real
tooling: ``jax.profiler`` trace capture around any reduction run
(``--profile``), and a throughput meter for kernel-level edges/s.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

log = logging.getLogger("graphslim_tpu")


@contextlib.contextmanager
def trace(out_dir: str | None, enabled: bool = True):
    """jax.profiler trace context; view with TensorBoard/XProf."""
    if not enabled or not out_dir:
        yield
        return
    import jax

    os.makedirs(out_dir, exist_ok=True)
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", out_dir)


class Throughput:
    """edges/s / items/s meter around repeated kernel calls."""

    def __init__(self, items_per_call: int, unit: str = "edges"):
        self.items = items_per_call
        self.unit = unit
        self.calls = 0
        self.elapsed = 0.0

    @contextlib.contextmanager
    def measure(self):
        import jax

        t0 = time.perf_counter()
        yield
        self.elapsed += time.perf_counter() - t0
        self.calls += 1

    @property
    def per_second(self) -> float:
        if self.elapsed == 0:
            return 0.0
        return self.items * self.calls / self.elapsed

    def report(self) -> str:
        return (f"{self.per_second / 1e6:.1f} M {self.unit}/s "
                f"({self.calls} calls, {self.elapsed:.3f}s)")


def gcond_step_flops(*, n_classes: int, batch: int, fanouts, nfeat: int,
                     nhid: int, nclass: int, ntrans: int, n_syn: int,
                     pge_nhid: int, pge_nlayers: int,
                     deep_rows: int | None = None) -> dict:
    """Analytic FLOPs of one GCond outer step (fwd+bwd, f32 semantics).

    XLA's ``compiled.cost_analysis()`` counts a ``lax.scan`` body ONCE,
    not ×trip-count — at arxiv shapes it under-reported the outer step
    ~260× (6.5 vs ~1700 GFLOPs), which produced round 4's misleading
    0.18% MFU figure.  This counter walks the actual shapes instead.

    ``deep_rows`` overrides the deepest block size (use the padded
    ``batch·Π(fanout+1)`` for this repo's sampler; PyG's deduplicating
    sampler yields fewer unique rows — pass the smaller estimate when
    bounding the reference).
    """
    sizes = [batch]
    for f in fanouts:
        sizes.append(sizes[-1] * (f + 1))
    deep = deep_rows if deep_rows is not None else sizes[-1]
    trans_dims = ([nfeat, nclass] if ntrans == 1
                  else [nfeat] + [nhid] * (ntrans - 1) + [nclass])

    def mlp(m, dims):
        return sum(2.0 * m * a * b for a, b in zip(dims[:-1], dims[1:]))

    # real phase: fwd + backward-wrt-params (~2x fwd matmuls), per class
    real = n_classes * 3.0 * mlp(deep, trans_dims)
    # syn phase: one shared forward + per-class vjp (~2x fwd each), and
    # the nested d/dfeat backward roughly doubles the backward work
    syn_fwd = mlp(n_syn, trans_dims) + 2.0 * len(fanouts) * n_syn ** 2 \
        * nclass
    syn = syn_fwd + n_classes * 4.0 * syn_fwd
    # PGE pair MLP over n_syn^2 pairs, fwd + bwd ~3x
    pge_dims = [2 * nfeat] + [pge_nhid] * (pge_nlayers - 1) + [1]
    pge = 3.0 * mlp(n_syn * n_syn, pge_dims)
    return {"real": real, "syn": syn, "pge": pge,
            "total": real + syn + pge}


def a100_reference_ceiling_steps_per_s() -> tuple[float, dict]:
    """Derived upper bound on the reference GCond outer-step rate on an
    A100 (VERDICT r4 item 1a) — replaces the former hardcoded 1.0
    steps/s estimate.

    The reference loop (``/root/reference/graphslim/condensation/
    gcond_base.py:156-241`` at ``configs/gcond/ogbn-arxiv.json``:
    SGC ntrans=2, hidden 256, outer 20, r=0.01) does per outer step:
    40 per-class sampled real fwd+bwd, 40 synthetic fwd+bwd with
    create_graph, and one PGE n²-pair MLP fwd+bwd.  Granting the
    reference every break — PyG's deduplicating sampler at ~10k unique
    deep rows per class (vs our padded 16.9k), zero sampling cost, zero
    host↔device staging, zero launch overhead, and 100% FLOP
    utilization — the remaining floor is arithmetic: ~0.8 TFLOP/step
    against A100 fp32 peak 19.5 TF/s (PyTorch ships TF32 matmuls OFF
    and the reference never enables them — verified by grep).  Even
    granting TF32 (156 TF/s), the serialized per-class CPU
    NeighborSampler + synchronous ``.to(device)`` staging
    (``gcond_base.py:213-218``) bounds the step at ~40×(1-3 ms sample +
    0.2 ms PCIe) → ≤8-20 steps/s, below the fp32 bound; we use the
    cleaner fp32 arithmetic ceiling.
    """
    f = gcond_step_flops(n_classes=40, batch=256, fanouts=(10, 5),
                         nfeat=128, nhid=256, nclass=40, ntrans=2,
                         n_syn=909, pge_nhid=256, pge_nlayers=3,
                         deep_rows=10_000)
    a100_fp32 = 19.5e12
    return a100_fp32 / f["total"], f
