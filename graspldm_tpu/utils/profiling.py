"""Profiling / tracing utilities.

The reference has no tracer (SURVEY.md §5); its closest tools are CUDA-event
timing in `ext/pvcnn/benchmark.py` and ad-hoc `time.time()` probes. The TPU
rebuild provides:

  * :func:`trace` — context manager around `jax.profiler` emitting a
    TensorBoard-compatible trace directory (xplane) for any code region.
  * :class:`Timer` — `block_until_ready`-based wall timing with percentile
    summaries (the XLA analogue of CUDA events).
  * :func:`log_compile_time` — measures first-call (compile) vs steady-state
    latency of a jitted function.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

__all__ = ["trace", "Timer", "log_compile_time"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace("/tmp/trace"): fn()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timing of device work with proper synchronization."""

    def __init__(self):
        self.samples_ms: List[float] = []

    def measure(self, fn: Callable[[], Any], iters: int = 10, warmup: int = 2):
        for _ in range(warmup):
            jax.block_until_ready(fn())
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            self.samples_ms.append((time.perf_counter() - t0) * 1e3)
        return self

    def summary(self) -> Dict[str, float]:
        t = np.asarray(self.samples_ms)
        return {
            "avg_ms": float(t.mean()),
            "p50_ms": float(np.percentile(t, 50)),
            "p95_ms": float(np.percentile(t, 95)),
            "p99_ms": float(np.percentile(t, 99)),
        }


def log_compile_time(fn: Callable[[], Any]) -> Dict[str, float]:
    """(compile+run, steady-state) seconds for a jitted thunk."""
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    steady_s = time.perf_counter() - t0
    return {"compile_s": compile_s, "steady_s": steady_s}
