"""Point sampling ops: furthest point sampling (FPS) and gather.

TPU-native rebuild of `.../functional/src/sampling/sampling.cu:87-170` (FPS)
and `:18-74` (gather). FPS is the one inherently sequential op in the stack;
at PVCNN sizes (N=1024, M<=1024) a ``lax.fori_loop`` over selection steps with
a ``[B, N]`` min-distance state runs entirely in registers/VMEM and jits into a
single fused loop — no host round-trips, no atomics.

Semantics (matching the CUDA kernel):
  * the first selected index is 0;
  * each step selects argmax over the running min-squared-distance to the
    selected set; ties resolve to the lowest index (CUDA reduction picks the
    first-best in its tree; we use argmax which also picks the lowest index on
    ties).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["furthest_point_sample", "gather_points"]


@functools.partial(jax.jit, static_argnames=("num_samples",))
def furthest_point_sample(coords: jax.Array, num_samples: int) -> jax.Array:
    """Iterative farthest point sampling.

    Args:
        coords: ``[B, N, 3]`` point coordinates.
        num_samples: number of centers M to select.

    Returns:
        ``[B, M]`` int32 indices into the N axis.
    """
    B, N, _ = coords.shape
    M = num_samples

    def body(j, state):
        dists, indices, last = state
        # last: [B] most recently selected index
        last_xyz = jnp.take_along_axis(coords, last[:, None, None], axis=1)  # [B,1,3]
        d = jnp.sum((coords - last_xyz) ** 2, axis=-1)  # [B, N]
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists, axis=-1).astype(jnp.int32)  # [B]
        indices = indices.at[:, j].set(nxt)
        return dists, indices, nxt

    init_dists = jnp.full((B, N), jnp.inf, dtype=coords.dtype)
    init_indices = jnp.zeros((B, M), dtype=jnp.int32)
    init_last = jnp.zeros((B,), dtype=jnp.int32)
    _, indices, _ = jax.lax.fori_loop(1, M, body, (init_dists, init_indices, init_last))
    return indices


def gather_points(features: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather rows of ``features [B, N, C]`` by ``indices [B, M]`` -> ``[B, M, C]``.

    Gradient is the scatter-add of the CUDA backward (`sampling.cu:53-67`),
    generated automatically by XLA.
    """
    return jnp.take_along_axis(features, indices[..., None], axis=1)
