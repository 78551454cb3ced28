"""Latent diffusion model over grasp latents (GraspLatentDDM), TPU-native.

Rebuild of `grasp_ldm/models/grasp_ldm.py:10-246`: a DDPM/DDIM prior over the
VAE's grasp latent ``z_h`` conditioned on the point-cloud latent ``z_pc``.

Decomposition (vs the reference's stateful module that owns a frozen VAE):
  * :class:`GraspLatentDDM` is ONLY the denoiser network (flax module).
  * The frozen-VAE coupling is functional: training and generation take the
    VAE apply/params explicitly and use ``stop_gradient`` + a disjoint
    optimizer pytree instead of `requires_grad=False`
    (`grasp_ldm.py:128-133`).
  * Generation (`grasp_ldm.py:189-233`) is a pure function
    ``(params, pc, z_T, key) -> grasps`` whose sampler is a fused `lax.scan`
    — see :mod:`graspldm_tpu.diffusion.gaussian`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from flax import linen as nn

from .resnet1d import TimeConditionedResNet1D

__all__ = ["GraspLatentDDM"]


class GraspLatentDDM(nn.Module):
    """Conditional epsilon-prediction denoiser over ``z_h [B, 1, D]``.

    Config mirrors the reference denoiser entry
    (`configs/generation/fpc/...:100-115`).
    """

    latent_in_features: int = 4
    pc_latent_size: int = 64
    block_channels: Sequence[int] = (32, 64, 128, 256)
    resnet_block_groups: int = 4
    dropout: Optional[float] = 0.1
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = True
    learned_sinusoidal_dim: int = 16
    dtype: object = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        time: jax.Array,
        z_cond: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        """``x [B, 1, D]`` (channel-first like the latent layout), ``time [B]``,
        ``z_cond [B, C_pc, D_pc]`` -> eps ``[B, 1, D]``.
        """
        # Internal layout is [B, L=D, C=1]; the public latent layout is
        # [B, 1, D] to match the reference API.
        h = x.transpose(0, 2, 1)
        h = TimeConditionedResNet1D(
            dim=self.latent_in_features,
            block_channels=tuple(self.block_channels),
            channels=1,
            input_conditioning_dims=self.pc_latent_size,
            resnet_block_groups=self.resnet_block_groups,
            dropout=self.dropout,
            learned_variance=self.learned_variance,
            is_time_conditioned=True,
            learned_sinusoidal_cond=self.learned_sinusoidal_cond,
            random_fourier_features=self.random_fourier_features,
            learned_sinusoidal_dim=self.learned_sinusoidal_dim,
            dtype=self.dtype,
            name="denoiser",
        )(h, time=time, z_cond=z_cond, deterministic=not train)
        return h.transpose(0, 2, 1).astype(x.dtype)
