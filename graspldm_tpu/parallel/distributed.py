"""Multi-host (multi-process) training bootstrap.

Rebuild of the reference's multi-node story — Lightning DDP over
``num_nodes`` with a per-host DataLoader
(`grasp_ldm/trainers/trainer.py:43,199-224`) — the JAX way:

  * every process calls :func:`initialize` (``jax.distributed.initialize``)
    and then sees the GLOBAL device set; the mesh spans all hosts and the
    jitted train step is one SPMD program — XLA inserts the gradient
    all-reduce over ICI/DCN exactly as in the single-host case;
  * each process loads only ITS slice of the dataset
    (:func:`shard_dataset_records` — the per-host DataLoader equivalent)
    and assembles its local batches;
  * :func:`make_global_batch` stitches the process-local batch into a
    global jax.Array sharded over the mesh's data axis
    (``jax.make_array_from_process_local_data``), and
    :func:`replicate_tree` gives every process the same replicated
    parameter arrays.

On real TPU pods ``jax.distributed.initialize()`` auto-discovers the
coordinator from the TPU environment; the explicit arguments exist for
CPU/GPU clusters and for the 2-process CPU parity test
(tests/test_multiprocess.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize",
    "is_distributed",
    "shard_dataset_records",
    "make_global_batch",
    "replicate_tree",
    "process_batch_slice",
]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[str] = None,
) -> None:
    """``jax.distributed.initialize`` with pass-through arguments.

    Call ONCE per process, before any other jax API touches the backend.
    With no arguments, TPU pod environments auto-configure.
    """
    kwargs: Dict[str, Any] = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = [
            int(d) for d in str(local_device_ids).split(",")
        ]
    jax.distributed.initialize(**kwargs)


def is_distributed() -> bool:
    return jax.process_count() > 1


def shard_dataset_records(dataset, process_id: Optional[int] = None,
                          num_processes: Optional[int] = None):
    """Keep only this process's strided slice of the dataset's records.

    The per-host data-loading half of DDP (reference
    `trainers/trainer.py:175-186` + DistributedSampler semantics): process
    p of n keeps records ``p, p+n, p+2n, ...``. Mutates and returns the
    dataset. Works on any dataset whose record list lives in ``objects``
    (full-pc) or ``items`` (partial-pc), including classifier wrappers
    (sharded through ``.base``).
    """
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    if n <= 1:
        return dataset
    target = dataset.base if hasattr(dataset, "base") else dataset
    for attr in ("objects", "items"):
        if hasattr(target, attr):
            recs = getattr(target, attr)
            if len(recs) < n:
                raise ValueError(
                    f"{len(recs)} records cannot be sharded over {n} "
                    "processes"
                )
            setattr(target, attr, recs[pid::n])
            return dataset
    raise TypeError(
        f"{type(target).__name__} exposes neither .objects nor .items"
    )


def make_global_batch(
    batch: Dict[str, np.ndarray], mesh: Mesh, axis: str = "data",
    chunked: bool = False,
) -> Dict[str, jax.Array]:
    """Process-local numpy batch -> global jax.Arrays sharded over ``axis``.

    Every process contributes its local leading-axis slice; the global
    batch size is ``local_B * num_processes`` (per-process batch sizes,
    torch-DataLoader style). Single-process meshes take the plain
    device_put path in the trainer instead. ``chunked`` batches are
    ``stack_batches`` chunks ``[K, local_B, ...]`` — the data axis is
    axis 1.
    """
    sharding = NamedSharding(mesh, P(None, axis) if chunked else P(axis))
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }


def replicate_tree(tree, mesh: Mesh):
    """Replicate a host-side pytree onto every device of a (possibly
    multi-process) mesh. All processes must hold the same values (true for
    deterministic init / checkpoint restore)."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree.map(put, tree)


def process_batch_slice(global_batch_size: int) -> int:
    """Per-process batch size for a target GLOBAL batch size."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes"
        )
    return global_batch_size // n
