"""Conditional grasp-pose VAE (GraspCVAE), TPU-native.

Rebuild of `grasp_ldm/models/grasp_vae.py:17-575`: a point-cloud-conditioned
VAE over 6-DoF grasp poses in tmrp representation.

Structure (flagship fpc config, `configs/generation/fpc/...:118-134`):
  * pc encoder: PVCNNEncoder -> ``z_pc [B, C_pc=3, D_pc=64]``
  * grasp encoder: Dense(7->16) -> ResNet1D(dim=16, cond=z_pc) -> Dense(16->4)
  * bottleneck: Dense mu/logvar heads + reparameterization
  * decoder: Dense(4->16) -> ResNet1D(dim=16, cond=z_pc) -> heads
    (tmrp 6, class logit 1, optional qualities)

The pc batch (B point clouds) and grasp batch (B*G grasps) are decoupled:
``z_pc`` is computed once per cloud and repeated per grasp — on TPU the
``B*G`` axis is the data-parallel axis sharded across chips.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .pvcnn import PVCNNEncoder
from .resnet1d import ResNet1D

__all__ = ["GraspCVAE", "VAEBottleneck"]


class VAEBottleneck(nn.Module):
    """mu/logvar heads + reparameterization. Reference `grasp_vae.py:539-574`."""

    latent_size: int

    @nn.compact
    def __call__(self, z: jax.Array) -> Tuple[jax.Array, jax.Array]:
        mu = nn.Dense(self.latent_size, name="mu")(z)
        logvar = nn.Dense(self.latent_size, name="logvar")(z)
        return mu, logvar

    @staticmethod
    def reparameterize(key: jax.Array, mu: jax.Array, logvar: jax.Array) -> jax.Array:
        std = jnp.exp(0.5 * logvar)
        return mu + std * jax.random.normal(key, mu.shape, mu.dtype)


class _ConditionalCore(nn.Module):
    """Dense in-layer -> ResNet1D core -> optional Dense out-layer.

    Shared shape logic of the reference's ConditionalGraspPoseEncoder /
    Decoder (`grasp_vae.py:353-536`): scalars are lifted to a 1-channel
    sequence of length ``feature_resolution`` and run through the conditioned
    ResNet core.
    """

    feature_resolution: int
    block_channels: Sequence[int]
    cond_dims: int
    groups: int
    dropout: Optional[float]
    out_features: Optional[int]  # None: return core output [B, R]
    dtype: object = None  # compute dtype of the ResNet core (params fp32)

    @nn.compact
    def __call__(
        self, x: jax.Array, cond: jax.Array, *, deterministic: bool = True
    ) -> jax.Array:
        # x: [B, D_in]
        x = nn.Dense(self.feature_resolution, name="in_layer")(x)
        x = x[:, :, None]  # [B, L=R, C=1]
        x = ResNet1D(
            dim=self.feature_resolution,
            block_channels=tuple(self.block_channels),
            channels=1,
            input_conditioning_dims=self.cond_dims,
            resnet_block_groups=self.groups,
            dropout=self.dropout,
            dtype=self.dtype,
            name="net",
        )(x, z_cond=cond, deterministic=deterministic)
        x = x.squeeze(-1)  # [B, R]
        if self.out_features is not None:
            x = nn.Dense(self.out_features, name="out_layer")(x)
        return x


class GraspCVAE(nn.Module):
    """Point-cloud-conditioned grasp VAE.

    Args mirror the reference config surface (`grasp_vae.py:17-93`).
    ``grasp_representation_dims`` is 6 (tmrp) + 1 (success) + num qualities.
    """

    grasp_latent_size: int = 4
    pc_latent_size: int = 64
    pc_latent_channels: int = 3
    grasp_representation_dims: int = 7
    block_channels: Sequence[int] = (32, 64, 128, 256)
    resnet_block_groups: int = 4
    dropout: Optional[float] = 0.1
    intermediate_feature_resolution: int = 16
    num_output_qualities: Optional[int] = None
    # pc encoder config
    pc_num_points: int = 1024
    pc_scale_channels: float = 0.75
    pc_scale_voxel_resolution: float = 0.75
    pc_num_blocks: Sequence[int] = (1, 1, 1, 1)
    pc_use_global_attention: bool = False
    # declared compute dtype of the DECODER core — the generation hot path.
    # None = fp32. The kernel fast path (`models/fast_decoder.py`) packs its
    # weights in this dtype, so flax and kernel decodes agree on precision.
    decoder_dtype: object = None
    # compute dtype of the ENCODE path (PVCNN pc encoder + grasp-encoder
    # core) — the training hot path for BOTH stages (the DDM stage runs the
    # frozen VAE encode every step). Params, the bottleneck mu/logvar heads
    # and the output heads stay fp32 (flax dtype=None promotes back), so
    # losses/KL are computed at full precision. None = fp32.
    encoder_dtype: object = None

    @property
    def use_qualities(self) -> bool:
        return (
            self.num_output_qualities is not None and self.num_output_qualities > 0
        )

    def setup(self):
        self.pc_encoder = PVCNNEncoder(
            out_features=self.pc_latent_size,
            n_points=self.pc_num_points,
            scale_channels=self.pc_scale_channels,
            scale_voxel_resolution=self.pc_scale_voxel_resolution,
            num_blocks=tuple(self.pc_num_blocks),
            use_global_attention=self.pc_use_global_attention,
            out_channels=self.pc_latent_channels,
            dtype=self.encoder_dtype,
        )
        self.grasp_encoder = _ConditionalCore(
            feature_resolution=self.intermediate_feature_resolution,
            block_channels=tuple(self.block_channels),
            cond_dims=self.pc_latent_size,
            groups=self.resnet_block_groups,
            dropout=self.dropout,
            out_features=self.grasp_latent_size,
            dtype=self.encoder_dtype,
        )
        self.bottleneck = VAEBottleneck(latent_size=self.grasp_latent_size)
        self.decoder_core = _ConditionalCore(
            feature_resolution=self.intermediate_feature_resolution,
            block_channels=tuple(self.block_channels),
            cond_dims=self.pc_latent_size,
            groups=self.resnet_block_groups,
            dropout=self.dropout,
            out_features=None,
            dtype=self.decoder_dtype,
        )
        self.head_tmrp = nn.Dense(6, name="head_tmrp")
        self.head_class = nn.Dense(1, name="head_class")
        if self.use_qualities:
            self.head_qualities = nn.Dense(
                self.num_output_qualities, name="head_qualities"
            )

    # ---- pc conditioning ----

    def encode_pc(self, xyz: jax.Array, *, train: bool = False) -> jax.Array:
        """``[B, N, 3]`` -> ``z_pc [B, C_pc, D_pc]`` (or ``[B, D_pc]`` if 1 channel)."""
        return self.pc_encoder(xyz, train=train)

    # ---- grasp encoding ----

    def encode_grasp(
        self,
        grasp: jax.Array,
        z_pc: jax.Array,
        *,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """``grasp [BG, D_g]``, ``z_pc [BG, C_pc, D_pc]`` -> (mu, logvar)."""
        z = self.grasp_encoder(grasp, z_pc, deterministic=deterministic)
        return self.bottleneck(z)

    def decode(
        self,
        z_h: jax.Array,
        z_pc: jax.Array,
        *,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, ...]:
        """``z_h [BG, L]``, ``z_pc [BG, C_pc, D_pc]`` -> (tmrp, cls_logits[, qualities])."""
        h = self.decoder_core(z_h, z_pc, deterministic=deterministic)
        out = (self.head_tmrp(h), self.head_class(h))
        if self.use_qualities:
            out = out + (self.head_qualities(h),)
        return out

    # ---- full paths ----

    def __call__(
        self,
        xyz: jax.Array,
        grasp: jax.Array,
        *,
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ):
        """Training forward: returns (outputs, (mu, logvar)).

        Args:
            xyz: ``[B, N, 3]`` point clouds.
            grasp: ``[B*G, D_g]`` grasp rows (G grasps per cloud).
            rng: PRNG key for the reparameterization sample.
        """
        B = xyz.shape[0]
        BG = grasp.shape[0]
        repeats = BG // B

        z_pc = self.encode_pc(xyz, train=train)
        z_pc_rep = jnp.repeat(z_pc, repeats, axis=0)

        mu, logvar = self.encode_grasp(
            grasp, z_pc_rep, deterministic=not train
        )
        if rng is None:
            z_h = mu
        else:
            z_h = VAEBottleneck.reparameterize(rng, mu, logvar)
        out = self.decode(z_h, z_pc_rep, deterministic=not train)
        return out, (mu, logvar)

    def generate(
        self,
        xyz: jax.Array,
        num_grasps: int,
        *,
        rng: jax.Array,
        z_pc: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, ...]:
        """Sample grasps from the N(0, I) prior. Reference `grasp_vae.py:226-255`.

        Args:
            xyz: ``[B, N, 3]``; ignored when ``z_pc`` is given.
        Returns:
            (tmrp ``[B*G, 6]``, cls_logits ``[B*G, 1]``[, qualities]).
        """
        if z_pc is None:
            z_pc = self.encode_pc(xyz)
        B = z_pc.shape[0]
        z_pc_rep = jnp.repeat(z_pc, num_grasps, axis=0)
        z_h = jax.random.normal(
            rng, (B * num_grasps, self.grasp_latent_size), z_pc.dtype
        )
        return self.decode(z_h, z_pc_rep)
