"""Flagship model factory: the fpc_1a_latentc3_z4_pc64 GraspLDM configuration.

One place that builds the full-pc VAE + latent DDM pair with the shipped
config's hyperparameters (`configs/generation/fpc/fpc_1a_latentc3_z4_pc64_180k.py`):
pc 1024 pts -> z_pc [3, 64]; grasp latent 4; linear betas 5e-5..1e-3, T=1000,
fixed_large, epsilon prediction, l2 loss.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax

from .diffusion import DiffusionSchedule, GaussianDiffusion1D
from .models import GraspCVAE, GraspLatentDDM

__all__ = ["FlagshipConfig", "build_flagship", "jit_init"]


@dataclasses.dataclass(frozen=True)
class FlagshipConfig:
    pc_num_points: int = 1024
    pc_latent_size: int = 64
    pc_latent_channels: int = 3
    grasp_latent_size: int = 4
    grasp_representation_dims: int = 7  # tmrp(6) + success(1)
    num_output_qualities: Optional[int] = None
    block_channels: Tuple[int, ...] = (32, 64, 128, 256)
    resnet_block_groups: int = 4
    dropout: Optional[float] = 0.1
    pc_scale_channels: float = 0.75
    pc_scale_voxel_resolution: float = 0.75
    diffusion_timesteps: int = 1000
    beta_start: float = 5e-5
    beta_end: float = 1e-3
    beta_schedule: str = "linear"
    variance_type: str = "fixed_large"
    diffusion_loss: str = "l2"
    # compute dtype for the denoiser hot path (None = fp32); params stay fp32
    denoiser_dtype: object = None
    # compute dtype for the TRAINING hot path: the VAE encode stack (PVCNN
    # pc encoder + grasp-encoder core), which both train stages run every
    # step. Params, optimizer state, losses, and the mu/logvar + output
    # heads stay fp32 — this is mixed precision, not low-precision
    # training. Accepts a jnp dtype or the string "bfloat16"/"float32"
    # (configs are plain-Python dicts). None = full fp32.
    train_dtype: object = None
    # EDM (elucidated) diffusion instead of DDPM/DDIM
    elucidated: bool = False
    edm_num_sample_steps: int = 32
    # task conditioning for the denoiser: None | "class" | "region"
    # (reference `tools/inference.py:330-398` conditioning modes)
    conditioning: Optional[str] = None
    # points per region for the region-conditioned denoiser
    region_num_points: int = 128
    # per-sample probability of dropping the class/region conditioning
    # embedding during DDM training (cond_mask) — enables classifier-free
    # guidance at sampling time (ldm_generate(cfg_scale=...))
    cond_dropout: float = 0.0


def _resolve_dtype(d):
    """None | jnp dtype | "bfloat16"-style string -> jnp dtype or None."""
    if d is None or not isinstance(d, str):
        return d
    if d in ("float32", "fp32"):
        return None
    import jax.numpy as jnp

    # canonical jnp attribute (jnp.bfloat16 etc.) so identity checks like
    # `dtype == jnp.bfloat16` in the kernel-path routing hold
    return getattr(jnp, str(jnp.dtype(d)))


def build_flagship(cfg: FlagshipConfig = FlagshipConfig()):
    """Returns (vae, ddm, diffusion)."""
    denoiser_dtype = _resolve_dtype(cfg.denoiser_dtype)
    train_dtype = _resolve_dtype(cfg.train_dtype)
    vae = GraspCVAE(
        grasp_latent_size=cfg.grasp_latent_size,
        pc_latent_size=cfg.pc_latent_size,
        pc_latent_channels=cfg.pc_latent_channels,
        grasp_representation_dims=cfg.grasp_representation_dims,
        block_channels=cfg.block_channels,
        resnet_block_groups=cfg.resnet_block_groups,
        dropout=cfg.dropout,
        num_output_qualities=cfg.num_output_qualities,
        pc_num_points=cfg.pc_num_points,
        pc_scale_channels=cfg.pc_scale_channels,
        pc_scale_voxel_resolution=cfg.pc_scale_voxel_resolution,
        # the decoder is on the generation hot path next to the denoiser —
        # both declare the same compute dtype so the kernel fast paths
        # (stacked_pallas / fast_decoder) pack at the declared precision
        decoder_dtype=denoiser_dtype,
        encoder_dtype=train_dtype,
    )
    if cfg.conditioning == "class":
        from .models.conditioning import ClassConditionedGraspLatentDDM

        ddm = ClassConditionedGraspLatentDDM(
            latent_in_features=cfg.grasp_latent_size,
            pc_latent_size=cfg.pc_latent_size,
            block_channels=cfg.block_channels,
            resnet_block_groups=cfg.resnet_block_groups,
            dropout=cfg.dropout,
        )
    elif cfg.conditioning == "region":
        from .models.conditioning import RegionConditionedGraspLatentDDM

        ddm = RegionConditionedGraspLatentDDM(
            latent_in_features=cfg.grasp_latent_size,
            pc_latent_size=cfg.pc_latent_size,
            block_channels=cfg.block_channels,
            resnet_block_groups=cfg.resnet_block_groups,
            dropout=cfg.dropout,
        )
    elif cfg.conditioning is None:
        ddm = GraspLatentDDM(
            latent_in_features=cfg.grasp_latent_size,
            pc_latent_size=cfg.pc_latent_size,
            block_channels=cfg.block_channels,
            resnet_block_groups=cfg.resnet_block_groups,
            dropout=cfg.dropout,
            dtype=denoiser_dtype,
        )
    else:
        raise ValueError(
            f"unknown conditioning {cfg.conditioning!r}; "
            "expected None, 'class' or 'region'"
        )
    if cfg.elucidated:
        from .diffusion import ElucidatedDiffusion

        diffusion = ElucidatedDiffusion(
            n_dims=cfg.grasp_latent_size,
            num_sample_steps=cfg.edm_num_sample_steps,
        )
    else:
        schedule = DiffusionSchedule.create(
            num_steps=cfg.diffusion_timesteps,
            beta_schedule=cfg.beta_schedule,
            beta_start=cfg.beta_start,
            beta_end=cfg.beta_end,
        )
        diffusion = GaussianDiffusion1D(
            schedule=schedule,
            n_dims=cfg.grasp_latent_size,
            loss_type=cfg.diffusion_loss,
            variance_type=cfg.variance_type,
        )
    return vae, ddm, diffusion


def jit_init(module, rngs, *args, **kwargs):
    """Initialize module variables under one jit (fast on 1-CPU hosts)."""
    fn = jax.jit(lambda r: module.init(r, *args, **kwargs))
    return fn(rngs)
