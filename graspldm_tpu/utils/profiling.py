"""Profiling / tracing utilities.

The reference has no tracer (SURVEY.md §5); its closest tools are CUDA-event
timing in `ext/pvcnn/benchmark.py` and ad-hoc `time.time()` probes. The TPU
rebuild provides:

  * :func:`trace` — context manager around `jax.profiler` emitting a
    TensorBoard-compatible trace directory (xplane) for any code region.
  * :func:`materialize` / :func:`timeit` — reliable device timing: the
    sync is an actual D2H read of computed bytes. A bare
    ``jax.block_until_ready`` can return EARLY through a remote-chip
    transport (observed reading a 24.7 ms train step as 7.6 ms), so no
    timing here trusts it.
  * :class:`Timer` — per-call wall timing with percentile summaries (the
    XLA analogue of CUDA events); each sample includes one sync round
    trip (~30 ms through a chip tunnel) — use :func:`timeit` for
    throughput numbers, Timer for latency distributions.
  * :func:`log_compile_time` — measures first-call (compile) vs steady-state
    latency of a jitted function.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

__all__ = ["trace", "Timer", "log_compile_time", "materialize", "timeit"]


def materialize(out: Any) -> None:
    """Synchronize on ``out`` by READING one element of its first leaf.

    The read round-trips actual computed bytes to the host, so it cannot
    return before the producing program finishes — unlike
    ``block_until_ready`` over a remote-chip transport. One call costs a
    host<->device round trip (~30 ms through a tunnel); amortize it over
    a queued loop of dispatches (the device executes them in order, so
    one final read drains the queue).
    """
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])


def timeit(fn: Callable, *args: Any, iters: int = 20) -> float:
    """Steady-state seconds per call of an already-compiled thunk.

    Queues ``iters`` dispatches and materializes once at the end; the
    measured cost of one bare sync round trip (read of a ready value) is
    subtracted so the figure is pure device throughput.
    """
    out = fn(*args)
    materialize(out)
    t0 = time.perf_counter()
    materialize(out)  # bare round-trip cost on an already-ready value
    sync_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    materialize(out)
    return max(time.perf_counter() - t0 - sync_s, 1e-9) / iters


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
            materialize(fn())
        for _ in range(iters):
            t0 = time.perf_counter()
            materialize(fn())
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
    materialize(fn())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    materialize(fn())
    steady_s = time.perf_counter() - t0
    return {"compile_s": compile_s, "steady_s": steady_s}
