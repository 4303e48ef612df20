"""Micro-benchmark harness.

Analog of `altro/utils/benchmarking.hpp:21-113`: run a callable N times and
report mean/median/std/min/max.  JAX-aware: blocks on the result each
iteration so device time is measured, and warms up once to exclude
compilation (the reference has no compile step to exclude).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional

import numpy as np


@dataclasses.dataclass
class BenchmarkResults:
    samples_ms: np.ndarray

    @property
    def mean(self) -> float:
        return float(self.samples_ms.mean())

    @property
    def median(self) -> float:
        return float(np.median(self.samples_ms))

    @property
    def std(self) -> float:
        return float(self.samples_ms.std())

    @property
    def min(self) -> float:
        return float(self.samples_ms.min())

    @property
    def max(self) -> float:
        return float(self.samples_ms.max())

    def __repr__(self) -> str:
        return (
            f"BenchmarkResults(mean={self.mean:.3f}ms, median={self.median:.3f}ms, "
            f"std={self.std:.3f}, min={self.min:.3f}, max={self.max:.3f}, "
            f"n={len(self.samples_ms)})"
        )


def benchmark(
    fn: Callable[[], Any],
    samples: int = 10,
    warmup: int = 1,
    block: bool = True,
) -> BenchmarkResults:
    """Time `fn()` `samples` times (milliseconds)."""
    import jax

    for _ in range(warmup):
        out = fn()
        if block:
            jax.block_until_ready(out)
    times = np.zeros(samples)
    for i in range(samples):
        t0 = time.perf_counter()
        out = fn()
        if block:
            jax.block_until_ready(out)
        times[i] = (time.perf_counter() - t0) * 1e3
    return BenchmarkResults(samples_ms=times)
