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
