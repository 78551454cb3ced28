"""Multi-chip grasp generation: ``ldm_generate`` sharded over a device mesh.

The generation workload is embarrassingly parallel over objects — the
reference scales it only by growing the CUDA batch on one GPU
(`grasp_ldm/models/grasp_ldm.py:189-233` repeat_interleave); here the object
batch B shards over the mesh's ``data`` axis, each chip encodes its B/n point
clouds and reverse-diffuses its ``(B/n) * G`` grasp latents locally, and NO
collectives run anywhere in the hot path (the layout SURVEY.md §2.3 calls
for: throughput from sharding ``B*G``, gradients/metrics are the only
all-reduces in the framework and they belong to training).

``shard_map`` (not plain ``jit``-with-shardings) is load-bearing: the
production denoiser is a set of Pallas kernels, which XLA's SPMD partitioner
cannot split automatically — shard_map runs the whole per-chip program,
Pallas launches included, on each chip's local shard.

Per-chip PRNG: fold the chip's ``data``-axis index into the key, so the
global sample set equals running :func:`ldm_generate` per shard with
``jax.random.fold_in(key, shard_index)`` (tested on the virtual 8-CPU mesh).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.normalization import NormalizationMeta
from .pipeline import ldm_generate, vae_generate

__all__ = ["make_sharded_ldm_generate", "make_sharded_vae_generate"]


def _out_specs_for(result: Dict[str, Any], axis: str):
    return {k: P(axis) for k in result}


def _make_sharded_runner(mesh, axis, n_weight_args, per_chip, shape_fn):
    """Shared scaffolding for the sharded generation entry points.

    ``per_chip(*weights, pc, key)`` is the per-shard body; ``shape_fn``
    gives the result tree via eval_shape on the B/n shard. Programs are
    compiled once per (pc shape, dtype); weights/key replicate, pc shards.
    """
    n = mesh.shape[axis]
    compiled: Dict = {}

    def run(*args):
        *weights, pc, key = args
        if pc.shape[0] % n:
            raise ValueError(
                f"object batch {pc.shape[0]} not divisible by the "
                f"{axis!r} axis size {n}"
            )
        sig = (pc.shape, str(pc.dtype))
        if sig not in compiled:
            out_tree = jax.eval_shape(
                shape_fn,
                *weights,
                jax.ShapeDtypeStruct(
                    (pc.shape[0] // n,) + pc.shape[1:], pc.dtype
                ),
                jax.ShapeDtypeStruct(key.shape, key.dtype),
            )
            compiled[sig] = jax.jit(
                jax.shard_map(
                    per_chip,
                    mesh=mesh,
                    in_specs=(P(),) * n_weight_args + (P(axis), P()),
                    out_specs=_out_specs_for(out_tree, axis),
                    # the per-chip body may launch Pallas kernels, whose
                    # out_shapes carry no varying-mesh-axes metadata —
                    # skip the vma check
                    check_vma=False,
                )
            )
        repl = NamedSharding(mesh, P())
        return compiled[sig](
            *(jax.device_put(w, repl) for w in weights),
            jax.device_put(pc, NamedSharding(mesh, P(axis))),
            jax.device_put(key, repl),
        )

    return run


def make_sharded_ldm_generate(
    mesh: Mesh,
    vae,
    ddm,
    diffusion,
    num_grasps: int,
    num_inference_steps: int = 100,
    sampler: str = "ddim",
    meta: Optional[NormalizationMeta] = None,
    denoiser_impl: str = "auto",
    axis: str = "data",
):
    """Build a jitted ``(vae_vars, ddm_vars, pc, key) -> results`` program
    with ``pc [B, N, 3]`` sharded over ``axis`` (B divisible by its size).

    Every result leaf comes back sharded on its leading (object) axis;
    weights are replicated. The per-chip body is exactly
    :func:`ldm_generate`, so the Pallas fast path runs when it qualifies.
    """
    def per_chip(vae_vars, ddm_vars, pc, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return ldm_generate(
            vae, vae_vars, ddm, ddm_vars, diffusion, pc, num_grasps, key,
            num_inference_steps=num_inference_steps, sampler=sampler,
            meta=meta, denoiser_impl=denoiser_impl,
        )

    # out_specs depend on the result dict's keys; resolved lazily from an
    # abstract evaluation so optional keys (qualities) are covered.
    def shape_fn(vv, dv, p, k):
        return ldm_generate(
            vae, vv, ddm, dv, diffusion, p, num_grasps, k,
            num_inference_steps=num_inference_steps, sampler=sampler,
            meta=meta, denoiser_impl="flax",
        )

    return _make_sharded_runner(mesh, axis, 2, per_chip, shape_fn)


def make_sharded_vae_generate(
    mesh: Mesh,
    vae,
    num_grasps: int,
    meta: Optional[NormalizationMeta] = None,
    axis: str = "data",
):
    """Sharded VAE-mode generation (latents straight from the prior)."""

    def per_chip(vae_vars, pc, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return vae_generate(vae, vae_vars, pc, num_grasps, key, meta=meta)

    def shape_fn(vv, p, k):
        return vae_generate(vae, vv, p, num_grasps, k, meta=meta)

    return _make_sharded_runner(mesh, axis, 1, per_chip, shape_fn)
