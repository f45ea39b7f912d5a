"""Profiling / tracing hooks (SURVEY.md section 5.1: the reference has none;
throughput is a first-class metric here).

* `trace(log_dir)` — context manager around `jax.profiler` producing a
  TensorBoard-compatible trace of the enclosed device work;
* `StepTimer` — wall-clock steps/sec and items/sec with explicit
  `block_until_ready` fencing so compiled-async dispatch doesn't lie;
* `annotate(name)` — named TraceAnnotation visible in the trace viewer.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace: `with trace('/tmp/tb'): run_steps()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region in the trace viewer (host-side annotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Throughput measurement with correct async fencing.

    >>> timer = StepTimer(items_per_step=batch_size)
    >>> with timer.measure():
    ...     for _ in range(n):
    ...         out = step(...)
    ...     timer.fence(out)   # readiness of `out` ends the timing
    >>> timer.items_per_sec(n)
    """

    def __init__(self, items_per_step: int = 1):
        self.items_per_step = items_per_step
        self.elapsed: float = 0.0

    @contextlib.contextmanager
    def measure(self):
        self._fence_out = None
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            if self._fence_out is not None:
                jax.block_until_ready(self._fence_out)
            self.elapsed = time.perf_counter() - t0

    def fence(self, out):
        """Register the value whose readiness marks the end of timing."""
        self._fence_out = out
        return out

    def steps_per_sec(self, n_steps: int) -> float:
        return n_steps / self.elapsed if self.elapsed else float("inf")

    def items_per_sec(self, n_steps: int) -> float:
        return self.steps_per_sec(n_steps) * self.items_per_step
