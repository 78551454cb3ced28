"""1-D U-Net (down/up paths with skip connections and mid attention).

Rebuild of `grasp_ldm/models/modules/resnets.py:622-857` (Unet1D): registered
in the reference's model zoo as an alternative VAE/denoiser core (unused by
the shipped configs but part of the model surface). Structure per resolution:
two conditioned ResNet blocks + linear attention, then down/up-sampling;
a full-attention middle; skip concatenation on the way up.
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

__all__ = ["Unet1D"]


class Unet1D(nn.Module):
    """Conditioned 1-D U-Net over ``[B, L, C]`` (feature-last)."""

    dim: int
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 1
    out_channels: Optional[int] = None
    input_conditioning_dims: Optional[int] = None
    resnet_block_groups: int = 8
    learned_variance: bool = False
    is_time_conditioned: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    dtype: object = None

    @property
    def out_features(self) -> int:
        return self.dim

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
            assert time is not None
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
            assert z_cond is not None
            input_emb = nn.silu(
                nn.Dense(emb_dim, dtype=self.dtype, name="input_emb")(z_cond)
            )
            if input_emb.ndim == 3 and latent_emb is not None:
                latent_emb = jnp.broadcast_to(
                    latent_emb[:, None, :],
                    (latent_emb.shape[0], input_emb.shape[1], latent_emb.shape[1]),
                )
            latent_emb = input_emb if latent_emb is None else latent_emb + input_emb

        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        groups = self.resnet_block_groups

        x = nn.Conv(self.dim, (7,), padding=3, dtype=self.dtype, name="init_conv")(x)
        r = x

        skips = []
        # down path
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            is_last = i == len(self.dim_mults) - 1
            x = ResnetBlock1D(din, groups=groups, dtype=self.dtype,
                              name=f"down_{i}_res1")(x, latent_emb)
            skips.append(x)
            x = ResnetBlock1D(din, groups=groups, dtype=self.dtype,
                              name=f"down_{i}_res2")(x, latent_emb)
            x = x + LinearAttention1D(dtype=self.dtype, name=f"down_{i}_attn")(
                ChannelLayerNorm(name=f"down_{i}_attn_norm")(x)
            )
            skips.append(x)
            if not is_last:
                # strided downsample (k=4, s=2)
                x = nn.Conv(dout, (4,), strides=(2,), padding=1,
                            dtype=self.dtype, name=f"down_{i}_down")(x)
            else:
                x = nn.Conv(dout, (3,), padding=1, dtype=self.dtype,
                            name=f"down_{i}_proj")(x)

        # middle
        mid = dims[-1]
        x = ResnetBlock1D(mid, groups=groups, dtype=self.dtype,
                          name="mid_res1")(x, latent_emb)
        x = x + Attention1D(dtype=self.dtype, name="mid_attn")(
            ChannelLayerNorm(name="mid_attn_norm")(x)
        )
        x = ResnetBlock1D(mid, groups=groups, dtype=self.dtype,
                          name="mid_res2")(x, latent_emb)

        # up path
        for i, (din, dout) in enumerate(zip(dims[:0:-1], dims[-2::-1])):
            is_last = i == len(self.dim_mults) - 1
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock1D(din, groups=groups, dtype=self.dtype,
                              name=f"up_{i}_res1")(x, latent_emb)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock1D(din, groups=groups, dtype=self.dtype,
                              name=f"up_{i}_res2")(x, latent_emb)
            x = x + LinearAttention1D(dtype=self.dtype, name=f"up_{i}_attn")(
                ChannelLayerNorm(name=f"up_{i}_attn_norm")(x)
            )
            if not is_last:
                # nearest upsample + conv
                x = jnp.repeat(x, 2, axis=1)
                x = nn.Conv(dout, (3,), padding=1, dtype=self.dtype,
                            name=f"up_{i}_up")(x)
            else:
                x = nn.Conv(dout, (3,), padding=1, dtype=self.dtype,
                            name=f"up_{i}_proj")(x)

        out_ch = self.out_channels
        if out_ch is None:
            out_ch = self.channels * (2 if self.learned_variance else 1)
        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock1D(self.dim, groups=groups, dtype=self.dtype,
                          name="final_res_block")(x, latent_emb)
        return nn.Conv(out_ch, (1,), dtype=self.dtype, name="final_conv")(x)
