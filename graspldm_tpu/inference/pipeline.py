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

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..diffusion import GaussianDiffusion1D
from ..utils.normalization import NormalizationMeta, unnormalize_grasps
from ..utils.rotations import tmrp_to_H

__all__ = ["vae_generate", "ldm_generate", "decode_and_postprocess"]


def decode_and_postprocess(
    vae,
    vae_variables: Dict[str, Any],
    z_h: jax.Array,
    z_pc_rep: jax.Array,
    num_grasps: int,
    meta: Optional[NormalizationMeta],
) -> Dict[str, jax.Array]:
    """Decode latents and convert to world-frame grasp transforms.

    Returns the reference result schema (`tools/inference.py:806-815`):
    ``grasps [B, G, 4, 4]``, ``grasp_tmrp [B, G, 6]`` (unnormalized),
    ``confidence [B, G]``, ``qualities [B, G, nq]`` or None.
    """
    out = vae.apply(vae_variables, z_h, z_pc_rep, method="decode")
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


def vae_generate(
    vae,
    vae_variables: Dict[str, Any],
    pc: jax.Array,
    num_grasps: int,
    rng: jax.Array,
    meta: Optional[NormalizationMeta] = None,
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
    return decode_and_postprocess(vae, vae_variables, z_h, z_pc_rep, num_grasps, meta)


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
) -> Dict[str, jax.Array]:
    """LDM-mode generation: reverse diffusion in the grasp latent space.

    The whole sampler (S denoiser calls) runs as one `lax.scan`; with
    ``return_trajectory`` the per-step latents are decoded too
    (reference `tools/inference.py:630-643` "all_diffusion_grasps").
    ``cls_cond`` (``[B*G]`` scalars) / ``region_points`` (``[B*G, P, 3]``)
    enable class/region-conditioned denoisers (reference
    `tools/inference.py:330-398` conditioning modes).
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

    def denoise(x, t, z):
        out = ddm.apply(
            ddm_variables, x.astype(p_dtype), t, z.astype(p_dtype),
            **cond_kwargs,
        )
        return out.astype(x.dtype)

    from ..diffusion import ElucidatedDiffusion

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
        )
    result = decode_and_postprocess(
        vae, vae_variables, x0[:, 0, :], z_pc_rep, num_grasps, meta
    )
    if return_trajectory:
        result["latent_trajectory"] = traj
    return result
