"""AOT export of the generation programs via ``jax.export`` (StableHLO).

The reference has no deployment story: serving a model requires the full
Python framework, the config system, and a torch checkpoint at runtime
(`/root/reference/tools/inference.py:401-566` rebuilds everything from
files on every load).  On TPU the natural deployment artifact is an
AOT-lowered program: ``jax.export`` serializes the jitted generation
function — model weights baked in as constants — into one self-contained
bytes blob that any JAX runtime for the same platform can execute with
**no model code, no flax, no config system** (and no Python at all when
loaded through PjRT's C++ ``Execute``).

The exported signature is deployment-shaped::

    (pc [B, N, 3] f32, seed u32 [, meta])  ->  result dict

* ``pc`` is the NORMALIZED point cloud (the host does centering/scaling —
  cheap O(N) work that would otherwise force per-request recompiles).
* ``seed`` is a scalar; the program derives its PRNG key internally so
  callers never handle key arrays.
* ``meta`` (optional, ``with_meta=True``): the per-object
  :class:`NormalizationMeta` pytree (leading batch dim B), so the program
  emits world-frame 4x4 transforms directly.

Shapes (B, N, G, steps) are static — by design: the serving batcher
(:mod:`graspldm_tpu.serving.batcher`) already buckets requests to a fixed
grid, and static shapes are what keeps the whole sampler one fused XLA
program (SURVEY.md §3.4).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..diffusion import GaussianDiffusion1D
from ..inference.pipeline import ldm_generate, vae_generate
from ..utils.normalization import NormalizationMeta

__all__ = [
    "make_vae_program",
    "make_ldm_program",
    "export_program",
    "save_exported",
    "load_exported",
]

# serialized programs carry their pytree signature; the meta NamedTuple
# must be registered once per process for serialize/deserialize
jax.export.register_namedtuple_serialization(
    NormalizationMeta,
    serialized_name="graspldm_tpu.NormalizationMeta",
)


def make_vae_program(
    vae,
    vae_variables: Dict[str, Any],
    *,
    num_grasps: int,
    with_meta: bool = True,
    decoder_impl: str = "auto",
) -> Callable:
    """Close ``vae_generate`` over the model into an exportable function."""

    def fn(pc, seed, meta=None):
        rng = jax.random.PRNGKey(seed)
        return vae_generate(
            vae, vae_variables, pc, num_grasps, rng,
            meta=meta, decoder_impl=decoder_impl,
        )

    if with_meta:
        return fn
    return lambda pc, seed: fn(pc, seed, None)


def make_ldm_program(
    vae,
    vae_variables: Dict[str, Any],
    ddm,
    ddm_variables: Dict[str, Any],
    diffusion: GaussianDiffusion1D,
    *,
    num_grasps: int,
    num_inference_steps: int = 100,
    sampler: str = "ddim",
    with_meta: bool = True,
    denoiser_impl: str = "auto",
    decoder_impl: str = "auto",
) -> Callable:
    """Close ``ldm_generate`` (full reverse diffusion) into an exportable fn."""

    def fn(pc, seed, meta=None):
        rng = jax.random.PRNGKey(seed)
        return ldm_generate(
            vae, vae_variables, ddm, ddm_variables, diffusion,
            pc, num_grasps, rng,
            num_inference_steps=num_inference_steps,
            sampler=sampler, meta=meta,
            denoiser_impl=denoiser_impl, decoder_impl=decoder_impl,
        )

    if with_meta:
        return fn
    return lambda pc, seed: fn(pc, seed, None)


def _meta_specs(batch: int, dtype=jnp.float32) -> NormalizationMeta:
    return NormalizationMeta(
        pc_mean=jax.ShapeDtypeStruct((batch, 3), dtype),
        pc_std=jax.ShapeDtypeStruct((batch, 3), dtype),
        grasp_mean=jax.ShapeDtypeStruct((batch, 6), dtype),
        grasp_std=jax.ShapeDtypeStruct((batch, 6), dtype),
    )


def export_program(
    fn: Callable,
    batch: int,
    num_points: int,
    *,
    with_meta: bool = True,
    platforms: Optional[Sequence[str]] = None,
    dtype=jnp.float32,
):
    """AOT-lower ``fn`` at fixed shapes; returns a ``jax.export.Exported``.

    ``platforms`` pins the target backend(s) (e.g. ``["tpu"]`` to produce
    a TPU artifact from any host); None exports for the default backend.
    """
    args = [
        jax.ShapeDtypeStruct((batch, num_points, 3), dtype),
        jax.ShapeDtypeStruct((), jnp.uint32),
    ]
    if with_meta:
        args.append(_meta_specs(batch, dtype))
    jitted = jax.jit(fn)
    return jax.export.export(jitted, platforms=platforms)(*args)


def save_exported(exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


@dataclasses.dataclass
class LoadedProgram:
    """A deserialized generation program.

    ``call(pc, seed[, meta])`` executes on the current backend; the result
    is the reference schema dict (``grasps [B, G, 4, 4]``, ``grasp_tmrp``,
    ``confidence``[, ``qualities``]).
    """

    exported: Any

    @property
    def in_avals(self):
        return self.exported.in_avals

    @property
    def platforms(self):
        return self.exported.platforms

    def call(self, *args):
        return self.exported.call(*args)

    __call__ = call


def load_exported(path: str) -> LoadedProgram:
    with open(path, "rb") as f:
        blob = f.read()
    return LoadedProgram(jax.export.deserialize(blob))
