"""Generation pipelines: pc -> grasp poses, as single jitted programs.

Rebuild of the reference inference stack's compute core
(`tools/inference.py:770-815` VAE mode, `:593-656` LDM mode,
`grasp_ldm/models/grasp_ldm.py:189-233`): encode the point cloud once,
sample ``num_grasps`` latents (from N(0,I) or by reverse diffusion), decode,
unnormalize, convert tmrp -> 4x4 transforms, sigmoid the success logit.

Everything after the host handoff is ONE pure function
``(variables, pc, key) -> results`` — the reference's per-step Python
loop + host scheduler math (SURVEY.md §3.4) collapses into a fused
`lax.scan` on device. Shard the ``B*G`` axis over the mesh's ``data`` axis
for multi-chip generation.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..diffusion import GaussianDiffusion1D
from ..utils.normalization import NormalizationMeta, unnormalize_grasps
from ..utils.rotations import tmrp_to_H

__all__ = ["vae_generate", "ldm_generate", "decode_and_postprocess"]


def _make_decode_fn(vae, vae_variables, impl: str = "auto"):
    """Resolve the decoder hot path.

    The decoder core is a plain conditional ResNet1D — the z16-shaped
    sibling of the denoiser — and it processes the FULL ``B*G`` batch once
    per generation (~20% of an LDM call, ~all of a VAE-mode call). "auto"
    routes it through the generic-L Pallas kernels on TPU.
    """
    from ..models.grasp_vae import GraspCVAE

    qualifies = (
        isinstance(vae, GraspCVAE)
        and vae.intermediate_feature_resolution in (4, 16)
    )
    if impl == "auto":
        impl = (
            "pallas"
            if qualifies and jax.default_backend() not in ("cpu",)
            else "flax"
        )
    if impl == "pallas" and not qualifies:
        raise ValueError(
            "decoder_impl='pallas' supports GraspCVAE with an intermediate "
            "feature resolution of 4 or 16; got "
            f"{type(vae).__name__} / resolution "
            f"{getattr(vae, 'intermediate_feature_resolution', None)!r}"
        )
    if impl == "pallas":
        from ..models.fast_decoder import (
            decoder_dims_for,
            decoder_fast_apply,
            pack_decoder_weights,
        )

        # compute precision follows the model's declared decoder dtype
        # (GraspCVAE.decoder_dtype), matching the denoiser path below —
        # an fp32-trained decoder is not silently downcast
        dtype = (
            jnp.bfloat16
            if getattr(vae, "decoder_dtype", None) == jnp.bfloat16
            else jnp.float32
        )
        dims = decoder_dims_for(vae)
        w = pack_decoder_weights(vae_variables, dims, dtype=dtype)

        def decode(z_h, z_pc_rep):
            return decoder_fast_apply(w, z_h, z_pc_rep, dims)

        return decode

    def decode(z_h, z_pc_rep):
        return vae.apply(vae_variables, z_h, z_pc_rep, method="decode")

    return decode


def decode_and_postprocess(
    vae,
    vae_variables: Dict[str, Any],
    z_h: jax.Array,
    z_pc_rep: jax.Array,
    num_grasps: int,
    meta: Optional[NormalizationMeta],
    decode_fn=None,
) -> Dict[str, jax.Array]:
    """Decode latents and convert to world-frame grasp transforms.

    Returns the reference result schema (`tools/inference.py:806-815`):
    ``grasps [B, G, 4, 4]``, ``grasp_tmrp [B, G, 6]`` (unnormalized),
    ``confidence [B, G]``, ``qualities [B, G, nq]`` or None.
    """
    if decode_fn is None:
        decode_fn = _make_decode_fn(vae, vae_variables, "flax")
    out = decode_fn(z_h, z_pc_rep)
    tmrp_n, cls_logits = out[0], out[1]
    qualities = out[2] if len(out) > 2 else None

    B = z_pc_rep.shape[0] // num_grasps
    tmrp_n = tmrp_n.reshape(B, num_grasps, 6)
    if meta is not None:
        tmrp = unnormalize_grasps(tmrp_n, meta)
    else:
        tmrp = tmrp_n
    H = tmrp_to_H(tmrp)
    conf = jax.nn.sigmoid(cls_logits.reshape(B, num_grasps))
    result = {
        "grasps": H,
        "grasp_tmrp": tmrp,
        "confidence": conf,
    }
    if qualities is not None:
        result["qualities"] = qualities.reshape(B, num_grasps, -1)
    return result


def _resolve_denoiser_impl(ddm, cond_kwargs, impl):
    """Resolve ``denoiser_impl`` ("auto" -> "pallas"/"flax") and validate.

    The kernel paths support class/region conditioning because it is a
    STEP-INVARIANT additive embedding, folded into the hoisted input
    embedding (see stacked_denoiser.compute_extra_emb).
    """
    from ..models.conditioning import (
        ClassConditionedGraspLatentDDM,
        RegionConditionedGraspLatentDDM,
    )
    from ..models.grasp_ldm import GraspLatentDDM

    cond_ok = (
        (not cond_kwargs and isinstance(ddm, GraspLatentDDM))
        or (
            set(cond_kwargs) == {"cls_cond"}
            and isinstance(ddm, ClassConditionedGraspLatentDDM)
        )
        or (
            set(cond_kwargs) == {"region_points"}
            and isinstance(ddm, RegionConditionedGraspLatentDDM)
        )
    )
    qualifies = (
        cond_ok
        and ddm.latent_in_features in (4, 16)
        and not getattr(ddm, "learned_variance", False)
        and ddm.random_fourier_features
    )
    if impl == "auto":
        impl = (
            "pallas"
            if qualifies and jax.default_backend() not in ("cpu",)
            else "flax"
        )
    if impl in ("pallas", "stacked") and not qualifies:
        raise ValueError(
            f"denoiser_impl={impl!r} supports GraspLatentDDM (z4/z16, "
            "random Fourier time embedding), ClassConditionedGraspLatentDDM "
            "with cls_cond, or RegionConditionedGraspLatentDDM with "
            "region_points"
        )
    return impl


def _denoiser_dims(ddm):
    from ..models.fused_denoiser import DenoiserDims

    return DenoiserDims(
        seq_len=ddm.latent_in_features,
        block_channels=tuple(ddm.block_channels),
        groups=ddm.resnet_block_groups,
        emb_dim=ddm.latent_in_features * 4,
        cond_channels=3,
        cond_dim=ddm.pc_latent_size,
        fourier_dim=ddm.learned_sinusoidal_dim,
    )


def _pallas_pack(ddm, ddm_variables, cond_kwargs, z_cond):
    """(packed weights, dims, hoisted input_emb) for the kernel sampler.

    ``input_emb`` folds the class/region embedding when present — both are
    constant across sampler steps, so they live OUTSIDE the scan.
    """
    from ..models.stacked_denoiser import (
        compute_extra_emb,
        compute_input_emb,
    )
    from ..models.stacked_pallas import pack_pallas_weights

    dims = _denoiser_dims(ddm)
    # compute precision follows the model's declared compute dtype
    # (FlagshipConfig.denoiser_dtype), not silently bf16
    dtype = (
        jnp.bfloat16
        if getattr(ddm, "dtype", None) == jnp.bfloat16
        else jnp.float32
    )
    w = pack_pallas_weights(ddm_variables, dims, dtype=dtype)
    extra_emb = compute_extra_emb(w, **cond_kwargs)
    input_emb = (
        compute_input_emb(w, z_cond.astype(jnp.float32))
        if z_cond is not None
        else None
    )
    if input_emb is not None and extra_emb is not None:
        input_emb = input_emb + extra_emb[:, None, :]
    return w, dims, input_emb, extra_emb


def _make_denoise_fn(ddm, ddm_variables, cond_kwargs, p_dtype, impl,
                     z_cond=None):
    """Resolve the denoiser hot path (see ``ldm_generate.denoiser_impl``).

    ``z_cond`` (when known up front) lets the kernel paths hoist the
    step-invariant conditioning embedding out of the sampler scan.
    """
    impl = _resolve_denoiser_impl(ddm, cond_kwargs, impl)

    if impl in ("pallas", "stacked"):
        dims = _denoiser_dims(ddm)

    if impl == "pallas":
        from ..models.stacked_denoiser import compute_input_emb
        from ..models.stacked_pallas import stacked_denoiser_pallas_apply

        # both the pc-conditioning and the class/region embeddings are
        # constant across sampler steps: computing them HERE (outside the
        # sampler's lax.scan) means the scan body only fuses the tiny
        # per-step time embedding
        w, dims, input_emb, extra_emb = _pallas_pack(
            ddm, ddm_variables, cond_kwargs, z_cond
        )

        def denoise(x, t, z):
            if input_emb is not None:
                ie = input_emb
            else:
                ie = compute_input_emb(w, z.astype(jnp.float32))
                if extra_emb is not None:
                    ie = ie + extra_emb[:, None, :]
            out = stacked_denoiser_pallas_apply(
                w, x, t, z, dims, input_emb=ie
            )
            return out.astype(x.dtype)

        return denoise

    if impl == "stacked":
        from ..models.stacked_denoiser import (
            compute_extra_emb,
            pack_stacked_weights,
            stacked_denoiser_apply,
        )

        w = pack_stacked_weights(ddm_variables, dims)
        extra_emb = compute_extra_emb(w, **cond_kwargs)  # fp32 weights
        cast = (
            jnp.bfloat16
            if getattr(ddm, "dtype", None) == jnp.bfloat16
            else None
        )
        if cast is not None:
            w = {k: v.astype(cast) for k, v in w.items()}

        def denoise(x, t, z):
            out = stacked_denoiser_apply(
                w, x, t, z, dims, compute_dtype=cast, extra_emb=extra_emb
            )
            return out.astype(x.dtype)

        return denoise

    if impl != "flax":
        raise ValueError(f"unknown denoiser_impl {impl!r}")

    def denoise(x, t, z):
        out = ddm.apply(
            ddm_variables, x.astype(p_dtype), t, z.astype(p_dtype),
            **cond_kwargs,
        )
        return out.astype(x.dtype)

    return denoise


def _make_cfg_denoise_fn(
    ddm, ddm_variables, cond_kwargs, p_dtype, impl, z_pc_rep, cfg_scale,
):
    """Classifier-free-guidance denoise fn: one doubled-batch call.

    Rows ``[:BG]`` run conditioned, rows ``[BG:]`` unconditional (the
    conditioning embedding zeroed — matching ``cond_mask=0``, the null class
    the model saw under ``cond_dropout`` training), combined as
    ``eps_u + w (eps_c - eps_u)``. On the kernel paths the two halves differ
    only in the STEP-INVARIANT extra embedding, so CFG costs exactly 2x the
    denoiser rows and zero extra launches per step.
    """
    if not cond_kwargs:
        raise ValueError(
            "cfg_scale requires a conditioned denoiser (cls_cond or "
            "region_points)"
        )
    impl = _resolve_denoiser_impl(ddm, cond_kwargs, impl)
    BG = z_pc_rep.shape[0]
    z2 = jnp.concatenate([z_pc_rep, z_pc_rep], axis=0)
    w_cfg = jnp.asarray(cfg_scale, jnp.float32)

    def combine(eps2, dtype):
        e_c, e_u = eps2[:BG], eps2[BG:]
        return (e_u + w_cfg * (e_c - e_u)).astype(dtype)

    if impl in ("pallas", "stacked"):
        from ..models.stacked_denoiser import (
            compute_extra_emb,
            compute_input_emb,
            pack_stacked_weights,
            stacked_denoiser_apply,
        )

        dims = _denoiser_dims(ddm)
        if impl == "pallas":
            from ..models.stacked_pallas import stacked_denoiser_pallas_apply

            # same pack + precision routing as the unconditional path; the
            # doubled-batch embedding fold is the only CFG-specific part
            # (conditioned rows [:BG] get the extra embedding, rows [BG:]
            # stay null — the cond_mask=0 class from dropout training)
            w, dims, _, extra = _pallas_pack(
                ddm, ddm_variables, cond_kwargs, None
            )
            ie = compute_input_emb(w, z2.astype(jnp.float32))
            ie = ie.at[:BG].add(extra[:, None, :])

            def denoise(x, t, z):
                x2 = jnp.concatenate([x, x], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                eps2 = stacked_denoiser_pallas_apply(
                    w, x2, t2, z2, dims, input_emb=ie
                )
                return combine(eps2, x.dtype)

            return denoise

        w = pack_stacked_weights(ddm_variables, dims)
        extra = compute_extra_emb(w, **cond_kwargs)
        extra2 = jnp.concatenate([extra, jnp.zeros_like(extra)], axis=0)
        cast = (
            jnp.bfloat16 if getattr(ddm, "dtype", None) == jnp.bfloat16 else None
        )
        if cast is not None:
            w = {k: v.astype(cast) for k, v in w.items()}
            extra2 = extra2.astype(cast)

        def denoise(x, t, z):
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            eps2 = stacked_denoiser_apply(
                w, x2, t2, z2, dims, compute_dtype=cast, extra_emb=extra2
            )
            return combine(eps2, x.dtype)

        return denoise

    if impl != "flax":
        raise ValueError(f"unknown denoiser_impl {impl!r}")

    mask2 = jnp.concatenate(
        [jnp.ones((BG,), jnp.float32), jnp.zeros((BG,), jnp.float32)]
    )
    ck2 = {k: jnp.concatenate([v, v], axis=0) for k, v in cond_kwargs.items()}

    def denoise(x, t, z):
        x2 = jnp.concatenate([x, x], axis=0).astype(p_dtype)
        t2 = jnp.concatenate([t, t], axis=0)
        eps2 = ddm.apply(
            ddm_variables, x2, t2, z2.astype(p_dtype), cond_mask=mask2, **ck2
        )
        return combine(eps2, x.dtype)

    return denoise


def vae_generate(
    vae,
    vae_variables: Dict[str, Any],
    pc: jax.Array,
    num_grasps: int,
    rng: jax.Array,
    meta: Optional[NormalizationMeta] = None,
    decoder_impl: str = "auto",
) -> Dict[str, jax.Array]:
    """VAE-mode generation: latents straight from the N(0, I) prior.

    Args:
        pc: ``[B, N, 3]`` normalized point clouds.
    """
    z_pc = vae.apply(vae_variables, pc, method="encode_pc")
    z_pc_rep = jnp.repeat(z_pc, num_grasps, axis=0)
    B = pc.shape[0]
    z_h = jax.random.normal(
        rng, (B * num_grasps, vae.grasp_latent_size), pc.dtype
    )
    return decode_and_postprocess(
        vae, vae_variables, z_h, z_pc_rep, num_grasps, meta,
        decode_fn=_make_decode_fn(vae, vae_variables, decoder_impl),
    )


def ldm_generate(
    vae,
    vae_variables: Dict[str, Any],
    ddm,
    ddm_variables: Dict[str, Any],
    diffusion: GaussianDiffusion1D,
    pc: jax.Array,
    num_grasps: int,
    rng: jax.Array,
    num_inference_steps: int = 100,
    sampler: str = "ddim",
    meta: Optional[NormalizationMeta] = None,
    return_trajectory: bool = False,
    cls_cond: Optional[jax.Array] = None,
    region_points: Optional[jax.Array] = None,
    denoiser_impl: str = "auto",
    decoder_impl: str = "auto",
    cfg_scale: Optional[float] = None,
    guidance_scale: Optional[float] = None,
    guidance_fn=None,
) -> Dict[str, jax.Array]:
    """LDM-mode generation: reverse diffusion in the grasp latent space.

    The whole sampler (S denoiser calls) runs as one `lax.scan`; with
    ``return_trajectory`` the per-step latents are decoded too
    (reference `tools/inference.py:630-643` "all_diffusion_grasps").
    ``cls_cond`` (``[B*G]`` scalars) / ``region_points`` (``[B*G, P, 3]``)
    enable class/region-conditioned denoisers (reference
    `tools/inference.py:330-398` conditioning modes).

    Guided sampling (:mod:`graspldm_tpu.diffusion.guidance` — the BASELINE
    "guided sampling in latent space" capability; the reference has none):

      * ``cfg_scale``: classifier-free guidance weight ``w`` for conditioned
        denoisers trained with ``cond_dropout`` (w=1 is plain conditional;
        w>1 sharpens adherence to the class/region condition). One
        doubled-batch denoiser call per step.
      * ``guidance_scale``: success guidance — steer each step's x0 estimate
        uphill on the VAE decoder's ``log p(success|z_h, z_pc)`` (one
        decoder VJP per step). ``guidance_fn`` overrides the guidance
        gradient with a custom ``x0 [BG,1,D] -> grad`` hook (scaled by
        ``guidance_scale``, default 1).

    Both disable the kernels-only fused sampler (their per-step XLA work —
    the eps combine / decoder VJP — lives in the scan body) but keep the
    per-stage Pallas denoiser kernels.

    ``denoiser_impl`` selects the denoiser hot path:
      * "pallas"  — per-stage fused TPU kernels (activations in VMEM;
                    ~2.6x faster per step than the flax lowering at
                    BG=8192 bf16), unconditional fpc-z4 / ppc-z16 dims;
      * "stacked" — banded-matmul XLA formulation (~1.7x);
      * "flax"    — the plain module apply;
      * "auto"    — "pallas" on TPU when the model qualifies, else "flax".
    """
    z_pc = vae.apply(vae_variables, pc, method="encode_pc")
    z_pc_rep = jnp.repeat(z_pc, num_grasps, axis=0)
    B = pc.shape[0]

    # Run the denoiser in the parameter dtype (bf16 weights -> bf16 MXU
    # compute); scheduler math stays in the latent dtype (fp32).
    p_dtype = jax.tree.leaves(ddm_variables["params"])[0].dtype

    cond_kwargs = {}
    if cls_cond is not None:
        cond_kwargs["cls_cond"] = cls_cond
    if region_points is not None:
        cond_kwargs["region_points"] = region_points

    from ..diffusion import ElucidatedDiffusion

    # Kernels-only sampler: when the pallas denoiser qualifies and the
    # sampler is plain DDIM/DDPM, fold the time embedding, init matmul and
    # the scheduler update into the stage kernels too — the scan body
    # becomes n_stages+1 `pallas_call`s with ZERO XLA ops
    # (models/pallas_sampler.py). Opt out with GRASPLDM_FUSED_SAMPLER=0.
    resolved_impl = _resolve_denoiser_impl(ddm, cond_kwargs, denoiser_impl)
    is_elucidated = isinstance(diffusion, ElucidatedDiffusion)

    if guidance_fn is None and guidance_scale is not None:
        from ..diffusion.guidance import make_success_guidance

        guidance_fn = make_success_guidance(vae, vae_variables, z_pc_rep)
    g_scale = 1.0 if guidance_scale is None else float(guidance_scale)
    guided = guidance_fn is not None or cfg_scale is not None

    use_fused = (
        resolved_impl == "pallas"
        and not guided
        and (is_elucidated or sampler in ("ddim", "ddpm"))
        and os.environ.get("GRASPLDM_FUSED_SAMPLER", "1") != "0"
    )
    if use_fused:
        from ..models.pallas_sampler import (
            fused_sample,
            fused_sample_churn,
            fused_sample_dpmpp,
        )

        w, dims, input_emb, _ = _pallas_pack(
            ddm, ddm_variables, cond_kwargs, z_pc_rep
        )
        if is_elucidated:
            # `sampler == "dpmpp"` selects DPM-Solver++(2M); anything else
            # is the stochastic churn sampler, matching `diffusion.sample`
            fused_ed = (
                fused_sample_dpmpp if sampler == "dpmpp" else fused_sample_churn
            )
            x0, traj = fused_ed(
                w, dims, diffusion, input_emb, rng,
                batch_size=B * num_grasps,
                num_sample_steps=num_inference_steps,
                return_trajectory=return_trajectory,
            )
        else:
            x0, traj = fused_sample(
                w, dims, diffusion.schedule, input_emb, rng,
                batch_size=B * num_grasps,
                num_inference_steps=num_inference_steps,
                sampler=sampler,
                variance_type=diffusion.variance_type,
                return_trajectory=return_trajectory,
            )
        decode_fn = _make_decode_fn(vae, vae_variables, decoder_impl)
        return _finish_ldm(
            vae, vae_variables, x0, traj, z_pc_rep, num_grasps, meta,
            return_trajectory, decode_fn,
        )

    if cfg_scale is not None:
        denoise = _make_cfg_denoise_fn(
            ddm, ddm_variables, cond_kwargs, p_dtype, resolved_impl,
            z_pc_rep, cfg_scale,
        )
    else:
        denoise = _make_denoise_fn(
            ddm, ddm_variables, cond_kwargs, p_dtype, resolved_impl,
            z_cond=z_pc_rep,
        )

    if isinstance(diffusion, ElucidatedDiffusion):
        # EDM samplers: churn (stochastic) or DPM++(2M); the reference wires
        # DPM++ with 32 steps for elucidated checkpoints
        # (`tools/inference.py:472-477`).
        x0, traj = diffusion.sample(
            denoise,
            rng,
            batch_size=B * num_grasps,
            z_cond=z_pc_rep,
            num_sample_steps=num_inference_steps,
            use_dpmpp=(sampler == "dpmpp"),
            return_trajectory=return_trajectory,
            guidance_fn=guidance_fn,
            guidance_scale=g_scale,
        )
    else:
        x0, traj = diffusion.sample(
            denoise,
            rng,
            batch_size=B * num_grasps,
            z_cond=z_pc_rep,
            num_inference_steps=num_inference_steps,
            sampler=sampler,
            return_trajectory=return_trajectory,
            guidance_fn=guidance_fn,
            guidance_scale=g_scale,
        )
    decode_fn = _make_decode_fn(vae, vae_variables, decoder_impl)
    return _finish_ldm(
        vae, vae_variables, x0, traj, z_pc_rep, num_grasps, meta,
        return_trajectory, decode_fn,
    )


def _finish_ldm(
    vae, vae_variables, x0, traj, z_pc_rep, num_grasps, meta,
    return_trajectory, decode_fn,
):
    result = decode_and_postprocess(
        vae, vae_variables, x0[:, 0, :], z_pc_rep, num_grasps, meta,
        decode_fn=decode_fn,
    )
    if return_trajectory:
        result["latent_trajectory"] = traj
        # decode <= 50 evenly spaced intermediate latents to grasp poses —
        # the reference's "all_diffusion_grasps" visualization output
        # (`tools/inference.py:630-643`, `grasp_ldm.py:214-233`)
        S = traj.shape[0]
        idx = jnp.linspace(0, S - 1, num=min(50, S)).astype(jnp.int32)

        def _decode_step(z):
            return decode_and_postprocess(
                vae, vae_variables, z[:, 0, :], z_pc_rep, num_grasps, meta,
                decode_fn=decode_fn,
            )["grasps"]

        result["all_diffusion_grasps"] = jax.lax.map(
            _decode_step, traj[idx]
        )  # [S', B, G, 4, 4]
    return result
