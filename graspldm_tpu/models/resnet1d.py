"""Conditional 1-D ResNet cores (non-temporal and time-conditioned).

TPU-native rebuild of `grasp_ldm/models/modules/resnets.py:263-616`:
a stack of FiLM-conditioned ResNet blocks + linear attention operating on a
small fixed feature resolution (the grasp latent expanded to ``[B, L, C]``).
These are the VAE encoder/decoder cores and the latent-diffusion denoiser.

Everything here is static-shape and jit-friendly; with the flagship configs
the spatial length L is 16 (VAE) or 4 (denoiser) and channels ramp
(32, 64, 128, 256), so the whole network is a chain of small matmuls that XLA
fuses aggressively — the win on TPU comes from batching thousands of grasps
through it in one program.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Attention1D,
    ChannelLayerNorm,
    LinearAttention1D,
    RandomOrLearnedSinusoidalPosEmb,
    ResnetBlock1D,
    SinusoidalPosEmb,
)

__all__ = ["ResNet1D", "TimeConditionedResNet1D"]


class _ResNet1DCore(nn.Module):
    """Shared forward: init conv, conditioned blocks, final head."""

    dim: int
    block_channels: Sequence[int]
    channels: int
    out_channels: int
    resnet_block_groups: int
    dropout: Optional[float]
    dtype: object = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        latent_emb: Optional[jax.Array],
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        # x: [B, L=dim, C=channels]
        x = nn.Conv(self.dim, (7,), padding=3, dtype=self.dtype, name="init_conv")(x)

        for i, ch in enumerate(self.block_channels):
            in_ch = x.shape[-1]
            x = ResnetBlock1D(
                in_ch, groups=self.resnet_block_groups, dtype=self.dtype,
                name=f"blocks_{i}_res1",
            )(x, latent_emb)
            x = ResnetBlock1D(
                in_ch, groups=self.resnet_block_groups, dtype=self.dtype,
                name=f"blocks_{i}_res2",
            )(x, latent_emb)
            # Residual(PreNorm(LinearAttention))
            x = x + LinearAttention1D(dtype=self.dtype, name=f"blocks_{i}_attn")(
                ChannelLayerNorm(name=f"blocks_{i}_attn_norm")(x)
            )
            x = nn.Conv(ch, (3,), padding=1, dtype=self.dtype,
                        name=f"blocks_{i}_proj")(x)
            if self.dropout is not None:
                x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)

        x = ResnetBlock1D(
            self.block_channels[-1],
            groups=self.resnet_block_groups,
            dtype=self.dtype,
            name="final_res_block",
        )(x, latent_emb)
        return nn.Conv(self.out_channels, (1,), dtype=self.dtype,
                       name="final_conv")(x)


class ResNet1D(nn.Module):
    """Input-conditioned (non-temporal) 1-D ResNet. Reference `resnets.py:263-424`.

    Call with ``x [B, L=dim, C=channels]`` and optional conditioning
    ``z_cond [B, cond_dims]`` or multi-channel ``[B, Ce, cond_dims]``;
    returns ``[B, L, out_channels]``.
    """

    dim: int
    block_channels: Sequence[int] = (16, 64, 128, 64, 16)
    channels: int = 1
    out_channels: Optional[int] = None
    input_conditioning_dims: Optional[int] = None
    resnet_block_groups: int = 8
    learned_variance: bool = False
    dropout: Optional[float] = None
    dtype: object = None

    @property
    def out_features(self) -> int:
        return self.dim

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        z_cond: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        latent_emb = None
        emb_dim = self.dim * 4
        if self.input_conditioning_dims is not None:
            assert z_cond is not None, "model is input-conditioned; z_cond required"
            latent_emb = nn.silu(
                nn.Dense(emb_dim, dtype=self.dtype, name="input_emb")(z_cond)
            )

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
            dtype=self.dtype,
            name="core",
        )(x, latent_emb, deterministic=deterministic)


class TimeConditionedResNet1D(nn.Module):
    """Denoiser core: time + input conditioning. Reference `resnets.py:427-616`.

    The timestep embedding (random-Fourier by default in the shipped configs)
    is summed with the conditioning embedding; when the conditioning latent is
    multi-channel (``z_cond [B, Ce, D]``) the time embedding broadcasts over
    the conditioning channels.
    """

    dim: int
    block_channels: Sequence[int] = (16, 64, 128, 64, 16)
    channels: int = 1
    out_channels: Optional[int] = None
    input_conditioning_dims: Optional[int] = None
    resnet_block_groups: int = 8
    learned_variance: bool = False
    dropout: Optional[float] = None
    is_time_conditioned: bool = True
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    dtype: object = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        time: Optional[jax.Array] = None,
        z_cond: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        emb_dim = self.dim * 4

        latent_emb = None
        if self.is_time_conditioned:
            assert time is not None, "time-conditioned model requires `time`"
            if self.learned_sinusoidal_cond or self.random_fourier_features:
                t_emb = RandomOrLearnedSinusoidalPosEmb(
                    self.learned_sinusoidal_dim,
                    is_random=self.random_fourier_features,
                    name="sinu_pos_emb",
                )(time)
            else:
                t_emb = SinusoidalPosEmb(self.dim, name="sinu_pos_emb")(time)
            t_emb = nn.Dense(emb_dim, dtype=self.dtype, name="time_mlp_1")(t_emb)
            t_emb = nn.gelu(t_emb, approximate=False)
            latent_emb = nn.Dense(emb_dim, dtype=self.dtype, name="time_mlp_2")(t_emb)

        if self.input_conditioning_dims is not None:
            assert z_cond is not None, "model is input-conditioned; z_cond required"
            input_emb = nn.silu(
                nn.Dense(emb_dim, dtype=self.dtype, name="input_emb")(z_cond)
            )
            if input_emb.ndim == 3 and latent_emb is not None:
                # broadcast time emb over conditioning channels: [B,E] -> [B,Ce,E]
                latent_emb = jnp.broadcast_to(
                    latent_emb[:, None, :],
                    (latent_emb.shape[0], input_emb.shape[1], latent_emb.shape[1]),
                )
            latent_emb = (
                input_emb if latent_emb is None else latent_emb + input_emb
            )

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
            dtype=self.dtype,
            name="core",
        )(x, latent_emb, deterministic=deterministic)
