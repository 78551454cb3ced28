"""Multi-chip grasp generation: ``ldm_generate`` sharded over a device mesh.

The generation workload is embarrassingly parallel over objects — the
reference scales it only by growing the CUDA batch on one GPU
(`grasp_ldm/models/grasp_ldm.py:189-233` repeat_interleave); here EITHER
generation axis shards over the mesh's ``data`` axis — the object batch B
(``shard="objects"``, throughput: each chip encodes its B/n point clouds and
reverse-diffuses its ``(B/n) * G`` grasp latents locally) or the grasp count
G (``shard="grasps"``, latency: pc replicates and each chip samples its own
G/n grasps, so ONE object's sampler work spreads over the whole mesh) — and
NO collectives run anywhere in the hot path (the layout SURVEY.md §2.3 calls
for: scaling from sharding ``B*G``, gradients/metrics are the only
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


def _make_sharded_runner(
    mesh, axis, n_weight_args, per_chip, shape_fn, grasp_axis=False,
    supports_cond=False,
):
    """Shared scaffolding for the sharded generation entry points.

    ``per_chip(*weights, pc, key, meta, cond)`` is the per-shard body;
    ``shape_fn`` gives the result tree via eval_shape on the per-chip shard.
    Programs are compiled once per (pc shape, dtype, meta/cond shapes);
    weights/key replicate.

    Two sharding modes:
      * object mode (default): pc — and per-object runtime meta — shard
        their leading B axis over ``axis``; results shard on axis 0.
      * ``grasp_axis=True``: pc and meta REPLICATE (every chip sees every
        object) and each chip generates its own G/n grasps (``per_chip``
        closes over the per-chip grasp count and folds the chip index
        into the key); results shard on axis 1 — the grasp axis of
        ``grasps [B, G, 4, 4]`` / ``confidence [B, G]``.

    ``cond`` is a dict of per-(object, grasp) conditioning tensors with
    leading dims ``[B, G, ...]`` (``cls_cond [B, G]``,
    ``region_points [B, G, P, 3]``): the object axis shards in object mode,
    the GRASP axis shards in grasp mode — each chip conditions exactly the
    grasps it generates.
    """
    n = mesh.shape[axis]
    compiled: Dict = {}

    def run(
        *args,
        meta: Optional[NormalizationMeta] = None,
        cls_cond=None,
        region_points=None,
    ):
        *weights, pc, key = args
        cond = {
            k: jnp.asarray(v)
            for k, v in
            dict(cls_cond=cls_cond, region_points=region_points).items()
            if v is not None
        }
        if cond and not supports_cond:
            raise ValueError(
                "conditioning tensors are only supported by the LDM runner"
            )
        if not grasp_axis and pc.shape[0] % n:
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
        for name, leaf in cond.items():
            if jnp.ndim(leaf) < 2 or leaf.shape[0] != pc.shape[0]:
                raise ValueError(
                    f"{name} must be per-(object, grasp) with leading dims "
                    f"[B={pc.shape[0]}, G, ...]; got shape {leaf.shape}"
                )
            if grasp_axis and leaf.shape[1] % n:
                raise ValueError(
                    f"{name} grasp axis {leaf.shape[1]} not divisible by "
                    f"the {axis!r} axis size {n}"
                )

        def shard(s):
            if grasp_axis:
                return s  # every chip sees the full object batch
            return jax.ShapeDtypeStruct(
                (s.shape[0] // n,) + s.shape[1:], s.dtype
            )

        def shard_cond(s):
            if grasp_axis:  # the G axis (dim 1) shards
                return jax.ShapeDtypeStruct(
                    (s.shape[0], s.shape[1] // n) + s.shape[2:], s.dtype
                )
            return shard(s)

        sig = (
            pc.shape, str(pc.dtype),
            tuple((l.shape, str(l.dtype)) for l in meta_leaves),
            tuple((k, v.shape, str(v.dtype)) for k, v in sorted(cond.items())),
        )
        if sig not in compiled:
            meta_abs = jax.tree.map(
                lambda l: shard(jax.ShapeDtypeStruct(l.shape, l.dtype)), meta
            )
            cond_abs = {
                k: shard_cond(jax.ShapeDtypeStruct(v.shape, v.dtype))
                for k, v in cond.items()
            }
            out_tree = jax.eval_shape(
                shape_fn,
                *weights,
                shard(pc),
                jax.ShapeDtypeStruct(key.shape, key.dtype),
                meta_abs,
                cond_abs,
            )
            data_spec = P() if grasp_axis else P(axis)
            cond_spec = P(None, axis) if grasp_axis else P(axis)
            out_specs = (
                {k: P(None, axis) for k in out_tree}
                if grasp_axis
                else _out_specs_for(out_tree, axis)
            )
            compiled[sig] = jax.jit(
                jax.shard_map(
                    per_chip,
                    mesh=mesh,
                    in_specs=(P(),) * n_weight_args
                    + (data_spec, P(), data_spec, cond_spec),
                    out_specs=out_specs,
                    # the per-chip body may launch Pallas kernels, whose
                    # out_shapes carry no varying-mesh-axes metadata —
                    # skip the vma check
                    check_vma=False,
                )
            )
        repl = NamedSharding(mesh, P())
        data = repl if grasp_axis else NamedSharding(mesh, P(axis))
        cond_sh = NamedSharding(
            mesh, P(None, axis) if grasp_axis else P(axis)
        )
        return compiled[sig](
            *(jax.device_put(w, repl) for w in weights),
            jax.device_put(pc, data),
            jax.device_put(key, repl),
            jax.tree.map(lambda l: jax.device_put(l, data), meta),
            {k: jax.device_put(v, cond_sh) for k, v in cond.items()},
        )

    return run


def _check_grasp_shard(shard: str, num_grasps: int, mesh: Mesh, axis: str):
    if shard not in ("objects", "grasps"):
        raise ValueError(f"shard must be 'objects'|'grasps', got {shard!r}")
    if shard == "grasps" and num_grasps % mesh.shape[axis]:
        raise ValueError(
            f"num_grasps {num_grasps} not divisible by the {axis!r} axis "
            f"size {mesh.shape[axis]}"
        )


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
    cfg_scale: Optional[float] = None,
    shard: str = "objects",
):
    """Build a jitted ``(vae_vars, ddm_vars, pc, key) -> results`` program
    with ``pc [B, N, 3]`` sharded over ``axis`` (B divisible by its size).

    Every result leaf comes back sharded on its leading (object) axis;
    weights are replicated. The per-chip body is exactly
    :func:`ldm_generate`, so the Pallas fast path runs when it qualifies.

    ``shard`` picks WHICH generation axis rides the mesh (SURVEY.md §2.3:
    scale by sharding ``B*G``):

      * ``"objects"`` (default, throughput): pc's leading B axis shards;
        each chip runs its B/n objects end-to-end. Results shard on
        axis 0.
      * ``"grasps"`` (latency): pc REPLICATES and the G grasps shard —
        each chip encodes every object once and reverse-diffuses its own
        G/n latents (``fold_in(key, chip)``), so a SINGLE object's
        sampler work spreads over the whole mesh with zero collectives.
        Results shard on axis 1; ``num_grasps`` must divide by the axis
        size. The global sample set equals concatenating per-chip
        :func:`ldm_generate` calls with ``num_grasps/n`` on the grasp
        axis (tested on the virtual 8-CPU mesh).

    ``meta`` here must be UNBATCHED (it replicates into every chip's
    program); per-object meta is a call-time kwarg of the returned runner —
    ``run(vae_vars, ddm_vars, pc, key, meta=meta)`` — sharded over ``axis``
    with ``pc`` so each chip unnormalizes with its own objects' stats.

    ``guidance_scale`` enables decoder-success guidance per chip (the
    guidance VJP runs on each chip's own shard; still collective-free).
    ``cfg_scale`` enables classifier-free guidance for conditioned
    checkpoints: pass the conditioning tensors at CALL time —
    ``run(..., cls_cond=[B, G], region_points=[B, G, P, 3])`` — and they
    shard alongside the generation axis (object mode: leading B axis;
    grasp mode: the G axis), so each chip conditions exactly the grasps
    it generates. Per-chip parity with :func:`ldm_generate` on the
    matching cond slice is tested on the virtual 8-CPU mesh.
    """
    _check_build_meta(meta)
    _check_grasp_shard(shard, num_grasps, mesh, axis)
    g_chip = (
        num_grasps // mesh.shape[axis] if shard == "grasps" else num_grasps
    )

    def _cond_kwargs(cond):
        # per-chip [B_chip, G_chip, ...] -> the flat [B_chip*G_chip, ...]
        # layout ldm_generate expects (object-major, matching its
        # jnp.repeat(z_pc, G) ordering)
        kw = {}
        if "cls_cond" in cond:
            kw["cls_cond"] = cond["cls_cond"].reshape(-1)
        if "region_points" in cond:
            rp = cond["region_points"]
            kw["region_points"] = rp.reshape((-1,) + rp.shape[2:])
        return kw

    def per_chip(vae_vars, ddm_vars, pc, key, rt_meta, cond):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return ldm_generate(
            vae, vae_vars, ddm, ddm_vars, diffusion, pc, g_chip, key,
            num_inference_steps=num_inference_steps, sampler=sampler,
            meta=rt_meta if rt_meta is not None else meta,
            denoiser_impl=denoiser_impl,
            guidance_scale=guidance_scale,
            cfg_scale=cfg_scale,
            **_cond_kwargs(cond),
        )

    # out_specs depend on the result dict's keys; resolved lazily from an
    # abstract evaluation so optional keys (qualities) are covered.
    def shape_fn(vv, dv, p, k, m, cond):
        return ldm_generate(
            vae, vv, ddm, dv, diffusion, p, g_chip, k,
            num_inference_steps=num_inference_steps, sampler=sampler,
            meta=m if m is not None else meta, denoiser_impl="flax",
            guidance_scale=guidance_scale,
            cfg_scale=cfg_scale,
            **_cond_kwargs(cond),
        )

    return _make_sharded_runner(
        mesh, axis, 2, per_chip, shape_fn, grasp_axis=shard == "grasps",
        supports_cond=True,
    )


def make_sharded_vae_generate(
    mesh: Mesh,
    vae,
    num_grasps: int,
    meta: Optional[NormalizationMeta] = None,
    axis: str = "data",
    shard: str = "objects",
):
    """Sharded VAE-mode generation (latents straight from the prior).

    Build-time ``meta`` must be unbatched; per-object meta goes to the
    runner at call time (``run(vae_vars, pc, key, meta=meta)``).
    ``shard="grasps"`` replicates pc and shards the G grasps instead
    (see :func:`make_sharded_ldm_generate`).
    """
    _check_build_meta(meta)
    _check_grasp_shard(shard, num_grasps, mesh, axis)
    g_chip = (
        num_grasps // mesh.shape[axis] if shard == "grasps" else num_grasps
    )

    def per_chip(vae_vars, pc, key, rt_meta, cond):
        del cond  # VAE-mode generation takes no conditioning tensors
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return vae_generate(
            vae, vae_vars, pc, g_chip, key,
            meta=rt_meta if rt_meta is not None else meta,
        )

    def shape_fn(vv, p, k, m, cond):
        del cond
        return vae_generate(
            vae, vv, p, g_chip, k, meta=m if m is not None else meta
        )

    return _make_sharded_runner(
        mesh, axis, 1, per_chip, shape_fn, grasp_axis=shard == "grasps"
    )
