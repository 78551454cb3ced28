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
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.normalization import NormalizationMeta
from .pipeline import ldm_generate, vae_generate

__all__ = ["make_sharded_ldm_generate", "make_sharded_vae_generate"]


def _out_specs_for(result: Dict[str, Any], axis: str):
    return {k: P(axis) for k in result}


def _check_build_meta(meta: Optional[NormalizationMeta]):
    """Build-time meta closes over the program as a REPLICATED constant, so
    it must be batch-free (one shift/scale for every object). Per-object
    meta (leading batch dim, e.g. from ``normalize_pc_and_grasps`` on a
    batch) must instead be passed at CALL time — the runner shards it over
    the data axis alongside ``pc``."""
    if meta is None:
        return
    for leaf in jax.tree.leaves(meta):
        if jnp.ndim(leaf) > 1:
            raise ValueError(
                "build-time meta must be unbatched (leaf shapes [3]/[6]); "
                f"got a leaf of shape {jnp.shape(leaf)}. Pass per-object "
                "meta at call time: run(..., meta=meta) shards it over the "
                "data axis."
            )


def _make_sharded_runner(mesh, axis, n_weight_args, per_chip, shape_fn):
    """Shared scaffolding for the sharded generation entry points.

    ``per_chip(*weights, pc, key, meta)`` is the per-shard body; ``shape_fn``
    gives the result tree via eval_shape on the B/n shard. Programs are
    compiled once per (pc shape, dtype, meta shapes); weights/key replicate,
    pc — and per-object runtime meta — shard over ``axis``.
    """
    n = mesh.shape[axis]
    compiled: Dict = {}

    def run(*args, meta: Optional[NormalizationMeta] = None):
        *weights, pc, key = args
        if pc.shape[0] % n:
            raise ValueError(
                f"object batch {pc.shape[0]} not divisible by the "
                f"{axis!r} axis size {n}"
            )
        meta_leaves = jax.tree.leaves(meta)
        for leaf in meta_leaves:
            if jnp.ndim(leaf) < 2 or jnp.shape(leaf)[0] != pc.shape[0]:
                raise ValueError(
                    "runtime meta must be per-object (leading batch dim "
                    f"{pc.shape[0]}); got a leaf of shape {jnp.shape(leaf)}"
                )

        def shard(s):
            return jax.ShapeDtypeStruct(
                (s.shape[0] // n,) + s.shape[1:], s.dtype
            )

        sig = (
            pc.shape, str(pc.dtype),
            tuple((l.shape, str(l.dtype)) for l in meta_leaves),
        )
        if sig not in compiled:
            meta_abs = jax.tree.map(
                lambda l: shard(jax.ShapeDtypeStruct(l.shape, l.dtype)), meta
            )
            out_tree = jax.eval_shape(
                shape_fn,
                *weights,
                shard(pc),
                jax.ShapeDtypeStruct(key.shape, key.dtype),
                meta_abs,
            )
            compiled[sig] = jax.jit(
                jax.shard_map(
                    per_chip,
                    mesh=mesh,
                    in_specs=(P(),) * n_weight_args
                    + (P(axis), P(), P(axis)),
                    out_specs=_out_specs_for(out_tree, axis),
                    # the per-chip body may launch Pallas kernels, whose
                    # out_shapes carry no varying-mesh-axes metadata —
                    # skip the vma check
                    check_vma=False,
                )
            )
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(axis))
        return compiled[sig](
            *(jax.device_put(w, repl) for w in weights),
            jax.device_put(pc, data),
            jax.device_put(key, repl),
            jax.tree.map(lambda l: jax.device_put(l, data), meta),
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
    guidance_scale: Optional[float] = None,
):
    """Build a jitted ``(vae_vars, ddm_vars, pc, key) -> results`` program
    with ``pc [B, N, 3]`` sharded over ``axis`` (B divisible by its size).

    Every result leaf comes back sharded on its leading (object) axis;
    weights are replicated. The per-chip body is exactly
    :func:`ldm_generate`, so the Pallas fast path runs when it qualifies.

    ``meta`` here must be UNBATCHED (it replicates into every chip's
    program); per-object meta is a call-time kwarg of the returned runner —
    ``run(vae_vars, ddm_vars, pc, key, meta=meta)`` — sharded over ``axis``
    with ``pc`` so each chip unnormalizes with its own objects' stats.

    ``guidance_scale`` enables decoder-success guidance per chip (the
    guidance VJP runs on each chip's own shard; still collective-free).
    CFG (``cfg_scale``) needs the conditioning tensors sharded alongside
    ``pc`` and is not plumbed here — use :func:`ldm_generate` per shard.
    """
    _check_build_meta(meta)

    def per_chip(vae_vars, ddm_vars, pc, key, rt_meta):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return ldm_generate(
            vae, vae_vars, ddm, ddm_vars, diffusion, pc, num_grasps, key,
            num_inference_steps=num_inference_steps, sampler=sampler,
            meta=rt_meta if rt_meta is not None else meta,
            denoiser_impl=denoiser_impl,
            guidance_scale=guidance_scale,
        )

    # out_specs depend on the result dict's keys; resolved lazily from an
    # abstract evaluation so optional keys (qualities) are covered.
    def shape_fn(vv, dv, p, k, m):
        return ldm_generate(
            vae, vv, ddm, dv, diffusion, p, num_grasps, k,
            num_inference_steps=num_inference_steps, sampler=sampler,
            meta=m if m is not None else meta, denoiser_impl="flax",
            guidance_scale=guidance_scale,
        )

    return _make_sharded_runner(mesh, axis, 2, per_chip, shape_fn)


def make_sharded_vae_generate(
    mesh: Mesh,
    vae,
    num_grasps: int,
    meta: Optional[NormalizationMeta] = None,
    axis: str = "data",
):
    """Sharded VAE-mode generation (latents straight from the prior).

    Build-time ``meta`` must be unbatched; per-object meta goes to the
    runner at call time (``run(vae_vars, pc, key, meta=meta)``).
    """
    _check_build_meta(meta)

    def per_chip(vae_vars, pc, key, rt_meta):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return vae_generate(
            vae, vae_vars, pc, num_grasps, key,
            meta=rt_meta if rt_meta is not None else meta,
        )

    def shape_fn(vv, p, k, m):
        return vae_generate(
            vae, vv, p, num_grasps, k, meta=m if m is not None else meta
        )

    return _make_sharded_runner(mesh, axis, 1, per_chip, shape_fn)
