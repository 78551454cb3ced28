"""Host->device input prefetching.

The reference hides host latency behind DataLoader workers + pin_memory
(`trainers/trainer.py:175-186`); the TPU equivalent is double-buffering:
while the device runs step N, the host stages batch N+1 with a non-blocking
`device_put`. With the fixed shapes used everywhere in this framework the
transfer fully overlaps compute.
"""

from __future__ import annotations

import collections
from typing import Any, Dict, Iterable, Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["prefetch_to_device", "stack_batches"]


def stack_batches(
    batches: Iterable[Dict[str, Any]], steps: int
) -> Iterator[Dict[str, np.ndarray]]:
    """Stack ``steps`` consecutive host batches along a new leading axis.

    Feeds the K-steps-per-dispatch training path (the trainer's
    ``steps_per_dispatch``): one stacked ``[K, ...]`` transfer + one
    ``lax.scan`` dispatch per K steps amortizes per-call host->device RPC
    latency, which dominates the loop when the chip sits behind a network
    tunnel. An incomplete trailing chunk (finite iterators only) is
    dropped — callers run whole chunks.
    """
    it = iter(batches)
    while True:
        chunk = []
        try:
            for _ in range(steps):
                chunk.append(next(it))
        except StopIteration:
            return
        yield {k: np.stack([b[k] for b in chunk]) for k in chunk[0]}


def prefetch_to_device(
    batches: Iterable[Dict[str, Any]],
    size: int = 2,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
    chunked: bool = False,
) -> Iterator[Dict[str, Any]]:
    """Yield device-resident batches, keeping ``size`` transfers in flight.

    Args:
        batches: host (numpy) batch iterator.
        mesh: when given, arrays are placed with leading-axis sharding over
            ``axis``; otherwise committed to the default device.
        chunked: batches are ``stack_batches`` chunks ``[K, B, ...]`` — the
            data axis is axis 1, so the sharding spec is ``P(None, axis)``.
    """
    spec = P(None, axis) if chunked else P(axis)
    sharding = NamedSharding(mesh, spec) if mesh is not None else None

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        if jax.process_count() > 1:
            # multi-host: this process's batch is its LOCAL slice of the
            # global batch (see parallel/distributed.py)
            import numpy as np

            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)
                ),
                batch,
            )
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    queue: collections.deque = collections.deque()
    it = iter(batches)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
