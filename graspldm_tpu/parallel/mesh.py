"""Device mesh + sharding helpers (the framework's distributed layer).

Replaces the reference's Lightning-DDP/NCCL story (`trainers/trainer.py:204-208`,
SURVEY.md §2.3) with the TPU-native equivalent: a `jax.sharding.Mesh` over the
ICI with a ``data`` axis (optionally a ``dcn`` axis for multi-slice), batches
sharded on their leading axis, parameters replicated, and gradient/metric
all-reduces emitted by XLA inside `jit`.

The models here are small (SURVEY.md §2.3: no TP/PP needed); throughput comes
from sharding the ``B*G`` grasp axis at generation time and the object batch
at train time. Both use the same ``data`` axis.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "get_mesh", "batch_sharding", "shard_batch", "replicate"]

_MESH: Optional[Mesh] = None


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over all local devices (1-D ``data`` axis by default).

    For multi-slice topologies pass ``axis_names=("dcn", "data")`` and a shape
    ``(num_slices, chips_per_slice)`` so data-parallel collectives ride the
    ICI within a slice.
    """
    devs = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devs),) if len(axis_names) == 1 else None
    assert shape is not None, "shape required for multi-axis meshes"
    dev_array = np.asarray(devs).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def get_mesh() -> Mesh:
    """Process-global default mesh (created on first use)."""
    global _MESH
    if _MESH is None:
        _MESH = make_mesh()
    return _MESH


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading axis across ``axis``."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Any, mesh: Optional[Mesh] = None, axis: str = "data") -> Any:
    """Place a host batch pytree with leading-axis sharding."""
    mesh = mesh or get_mesh()
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Optional[Mesh] = None) -> Any:
    """Fully replicate a pytree (parameters) over the mesh."""
    mesh = mesh or get_mesh()
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
