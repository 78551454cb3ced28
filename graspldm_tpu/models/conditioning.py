"""Conditioned denoiser variants: class- and region-conditioned sampling.

Rebuild of `grasp_ldm/models/modules/class_conditioned_resnet.py:9-122` (a
scalar class label embedded and added to the time embedding) and the
region-conditioning metas path (`tools/inference.py:366-398`, which injects
``grasp_region_labels`` / ``region_points`` for task-conditioned models).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import RandomOrLearnedSinusoidalPosEmb, SinusoidalPosEmb
from .resnet1d import _ResNet1DCore

__all__ = [
    "ClassTimeConditionedResNet1D",
    "ClassConditionedGraspLatentDDM",
    "RegionTimeConditionedResNet1D",
    "RegionConditionedGraspLatentDDM",
]


class ClassTimeConditionedResNet1D(nn.Module):
    """Time + input + scalar-class conditioned denoiser core.

    The class label (a scalar per sample, e.g. grasp mode/task id) goes
    through Dense(1 -> emb_dim) + SiLU and is summed into the time embedding
    before the conditioning broadcast (`class_conditioned_resnet.py:43-100`).

    ``cond_mask`` (``[B]``, 1 = keep, 0 = drop) zeroes the class-embedding
    contribution per sample — conditioning dropout at train time and the
    unconditional branch of classifier-free guidance at sampling time
    (see :mod:`graspldm_tpu.diffusion.guidance`).
    """

    dim: int
    block_channels: Sequence[int] = (32, 64, 128, 256)
    channels: int = 1
    out_channels: Optional[int] = None
    input_conditioning_dims: Optional[int] = None
    resnet_block_groups: int = 8
    learned_variance: bool = False
    dropout: Optional[float] = None
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = True
    learned_sinusoidal_dim: int = 16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        time: jax.Array,
        z_cond: Optional[jax.Array] = None,
        cls_cond: Optional[jax.Array] = None,
        cond_mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        assert cls_cond is not None, "class conditioning tensor is required"
        emb_dim = self.dim * 4

        if self.learned_sinusoidal_cond or self.random_fourier_features:
            t_emb = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim,
                is_random=self.random_fourier_features,
                name="sinu_pos_emb",
            )(time)
        else:
            t_emb = SinusoidalPosEmb(self.dim, name="sinu_pos_emb")(time)
        t_emb = nn.Dense(emb_dim, name="time_mlp_1")(t_emb)
        t_emb = nn.gelu(t_emb, approximate=False)
        latent_emb = nn.Dense(emb_dim, name="time_mlp_2")(t_emb)

        cls = cls_cond.reshape(-1, 1).astype(x.dtype)
        cls_emb = nn.silu(nn.Dense(emb_dim, name="cls_embed")(cls))
        if cond_mask is not None:
            cls_emb = cls_emb * cond_mask.reshape(-1, 1).astype(cls_emb.dtype)
        latent_emb = latent_emb + cls_emb

        if self.input_conditioning_dims is not None:
            assert z_cond is not None
            input_emb = nn.silu(nn.Dense(emb_dim, name="input_emb")(z_cond))
            if input_emb.ndim == 3:
                latent_emb = jnp.broadcast_to(
                    latent_emb[:, None, :],
                    (latent_emb.shape[0], input_emb.shape[1], latent_emb.shape[1]),
                )
            latent_emb = latent_emb + input_emb

        out_ch = self.out_channels
        if out_ch is None:
            out_ch = self.channels * (2 if self.learned_variance else 1)
        return _ResNet1DCore(
            dim=self.dim,
            block_channels=tuple(self.block_channels),
            channels=self.channels,
            out_channels=out_ch,
            resnet_block_groups=self.resnet_block_groups,
            dropout=self.dropout,
            name="core",
        )(x, latent_emb, deterministic=deterministic)


class RegionTimeConditionedResNet1D(nn.Module):
    """Time + input + region-points conditioned denoiser core.

    The reference's region-conditioned path injects per-grasp
    ``region_points`` metas into a points-conditioned denoiser
    (`tools/inference.py:366-398`; the module it names is not shipped
    upstream). Here the selected region's points ``[B, P, 3]`` go through a
    small shared-MLP PointNet (Dense-SiLU-Dense + max-pool over P) and the
    pooled embedding is summed into the time embedding — the same injection
    point as the scalar class label, but carrying the region geometry.
    """

    dim: int
    block_channels: Sequence[int] = (32, 64, 128, 256)
    channels: int = 1
    out_channels: Optional[int] = None
    input_conditioning_dims: Optional[int] = None
    resnet_block_groups: int = 8
    learned_variance: bool = False
    dropout: Optional[float] = None
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = True
    learned_sinusoidal_dim: int = 16
    region_hidden: int = 64

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        time: jax.Array,
        z_cond: Optional[jax.Array] = None,
        region_points: Optional[jax.Array] = None,
        cond_mask: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        assert region_points is not None, "region_points tensor is required"
        emb_dim = self.dim * 4

        if self.learned_sinusoidal_cond or self.random_fourier_features:
            t_emb = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim,
                is_random=self.random_fourier_features,
                name="sinu_pos_emb",
            )(time)
        else:
            t_emb = SinusoidalPosEmb(self.dim, name="sinu_pos_emb")(time)
        t_emb = nn.Dense(emb_dim, name="time_mlp_1")(t_emb)
        t_emb = nn.gelu(t_emb, approximate=False)
        latent_emb = nn.Dense(emb_dim, name="time_mlp_2")(t_emb)

        # PointNet over the region: per-point MLP + max pool (order-invariant)
        pts = region_points.astype(x.dtype)
        h = nn.silu(nn.Dense(self.region_hidden, name="region_mlp_1")(pts))
        h = nn.Dense(emb_dim, name="region_mlp_2")(h)
        region_emb = nn.silu(jnp.max(h, axis=-2))  # [B, emb_dim]
        if cond_mask is not None:
            region_emb = region_emb * cond_mask.reshape(-1, 1).astype(
                region_emb.dtype
            )
        latent_emb = latent_emb + region_emb

        if self.input_conditioning_dims is not None:
            assert z_cond is not None
            input_emb = nn.silu(nn.Dense(emb_dim, name="input_emb")(z_cond))
            if input_emb.ndim == 3:
                latent_emb = jnp.broadcast_to(
                    latent_emb[:, None, :],
                    (latent_emb.shape[0], input_emb.shape[1], latent_emb.shape[1]),
                )
            latent_emb = latent_emb + input_emb

        out_ch = self.out_channels
        if out_ch is None:
            out_ch = self.channels * (2 if self.learned_variance else 1)
        return _ResNet1DCore(
            dim=self.dim,
            block_channels=tuple(self.block_channels),
            channels=self.channels,
            out_channels=out_ch,
            resnet_block_groups=self.resnet_block_groups,
            dropout=self.dropout,
            name="core",
        )(x, latent_emb, deterministic=deterministic)


class RegionConditionedGraspLatentDDM(nn.Module):
    """Latent DDM with a region-points-conditioned denoiser (public latent
    layout ``[B, 1, D]``); ``region_points [B, P, 3]`` selects where on the
    object the grasps should concentrate."""

    latent_in_features: int = 4
    pc_latent_size: int = 64
    block_channels: Sequence[int] = (32, 64, 128, 256)
    resnet_block_groups: int = 4
    dropout: Optional[float] = 0.1
    random_fourier_features: bool = True
    learned_sinusoidal_dim: int = 16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        time: jax.Array,
        z_cond: Optional[jax.Array] = None,
        region_points: Optional[jax.Array] = None,
        cond_mask: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        h = x.transpose(0, 2, 1)
        h = RegionTimeConditionedResNet1D(
            dim=self.latent_in_features,
            block_channels=tuple(self.block_channels),
            channels=1,
            input_conditioning_dims=self.pc_latent_size,
            resnet_block_groups=self.resnet_block_groups,
            dropout=self.dropout,
            random_fourier_features=self.random_fourier_features,
            learned_sinusoidal_dim=self.learned_sinusoidal_dim,
            name="denoiser",
        )(
            h,
            time=time,
            z_cond=z_cond,
            region_points=region_points,
            cond_mask=cond_mask,
            deterministic=not train,
        )
        return h.transpose(0, 2, 1)


class ClassConditionedGraspLatentDDM(nn.Module):
    """Latent DDM with a class-conditioned denoiser (public latent layout
    ``[B, 1, D]`` like :class:`graspldm_tpu.models.grasp_ldm.GraspLatentDDM`)."""

    latent_in_features: int = 4
    pc_latent_size: int = 64
    block_channels: Sequence[int] = (32, 64, 128, 256)
    resnet_block_groups: int = 4
    dropout: Optional[float] = 0.1
    random_fourier_features: bool = True
    learned_sinusoidal_dim: int = 16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        time: jax.Array,
        z_cond: Optional[jax.Array] = None,
        cls_cond: Optional[jax.Array] = None,
        cond_mask: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        h = x.transpose(0, 2, 1)
        h = ClassTimeConditionedResNet1D(
            dim=self.latent_in_features,
            block_channels=tuple(self.block_channels),
            channels=1,
            input_conditioning_dims=self.pc_latent_size,
            resnet_block_groups=self.resnet_block_groups,
            dropout=self.dropout,
            random_fourier_features=self.random_fourier_features,
            learned_sinusoidal_dim=self.learned_sinusoidal_dim,
            name="denoiser",
        )(
            h,
            time=time,
            z_cond=z_cond,
            cls_cond=cls_cond,
            cond_mask=cond_mask,
            deterministic=not train,
        )
        return h.transpose(0, 2, 1)
