"""Pallas TPU kernel for furthest point sampling.

The XLA formulation (`ops/sampling.py`) lowers to M sequential tiny
dispatches (argmax + min over ``[B, N]`` per step), which is launch-overhead
bound. This kernel runs the WHOLE selection loop inside one Pallas program
per batch item: coords live in VMEM in ``[3, N]`` layout (3 sublanes x N
lanes), the min-distance state stays on-chip, and each step is a fused
VPU reduction — no HBM round trips between steps.

Semantics identical to `ops.sampling.furthest_point_sample` (first index 0,
argmax ties to the lowest index), tested against it in
`tests/test_pallas_fps.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["furthest_point_sample_pallas"]


def _fps_kernel(coords_ref, out_ref, dists_ref, *, num_samples: int):
    # coords_ref: [1, 3, N] VMEM block; out_ref: [1, 1, M_pad] int32;
    # dists_ref: [1, N] f32 scratch.
    N = coords_ref.shape[2]

    dists_ref[:] = jnp.full((1, N), jnp.inf, dtype=jnp.float32)
    out_ref[0, 0, 0] = 0

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)

    def body(j, last):
        # distance of every point to the last selected point
        last_pt = coords_ref[0, :, pl.ds(last, 1)]  # [3, 1]
        diff = coords_ref[0] - last_pt
        d = jnp.sum(diff * diff, axis=0, keepdims=True)  # [1, N]
        dists = jnp.minimum(dists_ref[:], d)
        dists_ref[:] = dists
        # argmax with lowest-index tie-break
        best = jnp.max(dists)
        nxt = jnp.min(jnp.where(dists == best, col_ids, N)).astype(jnp.int32)
        out_ref[0, 0, j] = nxt
        return nxt

    jax.lax.fori_loop(1, num_samples, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def furthest_point_sample_pallas(
    coords: jax.Array, num_samples: int, interpret: bool = False
) -> jax.Array:
    """``coords [B, N, 3]`` -> indices ``[B, M]`` int32 (Pallas TPU kernel)."""
    B, N, _ = coords.shape
    M = num_samples
    M_pad = max(128, ((M + 127) // 128) * 128)

    coords_t = coords.transpose(0, 2, 1).astype(jnp.float32)  # [B, 3, N]

    out = pl.pallas_call(
        functools.partial(_fps_kernel, num_samples=M),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, M_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, M_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, N), jnp.float32)],
        interpret=interpret,
    )(coords_t)
    return out[:, 0, :M]
