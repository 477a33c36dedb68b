"""Profiling helpers: XLA traces, samples/s meters, cost analysis.

The reference's profiling story is ad-hoc (SURVEY.md §5: hook-based GFLOP
counting utils/utils.py:117-233, wall-clock samples/s in the train logs).
Here the equivalents are first-class:
- ``trace`` context manager around ``jax.profiler`` (view in TensorBoard)
- ``Throughput`` running samples/s meter (train-log parity)
- ``flops_of`` — XLA's own cost analysis for any jittable fn
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace"):
    """Capture a device trace: ``with trace('...'): step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Running samples/s with warmup skip (reference evaluate_2D.py:229-231
    skips the first 20 batches before timing)."""

    def __init__(self, warmup_batches: int = 20):
        self.warmup = warmup_batches
        self.n_batches = 0
        self.n_samples = 0
        self.t0: Optional[float] = None

    def update(self, batch_size: int) -> None:
        self.n_batches += 1
        if self.n_batches == self.warmup:
            self.t0 = time.perf_counter()
            self.n_samples = 0
        elif self.n_batches > self.warmup:
            self.n_samples += batch_size

    @property
    def samples_per_sec(self) -> float:
        if self.t0 is None or self.n_samples == 0:
            return 0.0
        return self.n_samples / max(time.perf_counter() - self.t0, 1e-9)


def flops_of(fn: Callable, *args) -> float:
    """Total FLOPs of the compiled fn per XLA cost analysis (replaces the
    reference's hand-counted conv multiply-adds)."""
    compiled = jax.jit(fn).lower(*args).compile()
    return float(compiled.cost_analysis().get("flops", 0.0))
