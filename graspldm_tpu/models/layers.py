"""Shared 1-D network building blocks (flax.linen, feature-last layout).

TPU-native rebuild of the reference's `grasp_ldm/models/modules/resnets.py:29-260`
building blocks (which follow lucidrains/denoising-diffusion-pytorch):
weight-standardized convs, FiLM-conditioned ResNet blocks, linear attention,
sinusoidal/random-Fourier time embeddings.

Layout convention: all 1-D tensors are ``[B, L, C]`` (length, channels-last) —
the layout XLA prefers on TPU. The reference uses torch ``[B, C, L]``; the
channel axis here is the torch channel axis, transposed.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "SinusoidalPosEmb",
    "RandomOrLearnedSinusoidalPosEmb",
    "WSConv1d",
    "ChannelLayerNorm",
    "Block1D",
    "ResnetBlock1D",
    "LinearAttention1D",
    "Attention1D",
    "film_scale_shift",
]


class SinusoidalPosEmb(nn.Module):
    """Classic transformer sinusoidal embedding of scalar timesteps.

    Reference: `resnets.py:29-41`.
    """

    dim: int

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        half = self.dim // 2
        scale = math.log(10000.0) / (half - 1)
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -scale)
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    """Random (fixed) or learned Fourier features of the timestep.

    Output dim = ``dim + 1`` (the raw timestep is concatenated).
    Reference: `resnets.py:44-56`; shipped configs use random (frozen) weights.
    """

    dim: int
    is_random: bool = True

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        half = self.dim // 2
        if self.is_random:
            # Frozen random weights: a non-trainable variable so they persist
            # in checkpoints but receive no gradient.
            weights = self.variable(
                "constants",
                "weights",
                lambda: jax.random.normal(self.make_rng("params"), (half,)),
            ).value
        else:
            weights = self.param(
                "weights", lambda key: jax.random.normal(key, (half,))
            )
        t = t.astype(jnp.float32)[:, None]
        freqs = t * weights[None, :] * (2.0 * math.pi)
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class WSConv1d(nn.Module):
    """Weight-standardized 1-D convolution (https://arxiv.org/abs/1903.10520).

    Reference: `resnets.py:79-101`. Kernel is standardized per output channel
    over (spatial, in-channel) with biased variance, eps 1e-5 (fp32).
    """

    features: int
    kernel_size: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # standardize in fp32, then cast to the compute dtype
        eps = 1e-5 if kernel.dtype == jnp.float32 else 1e-3
        mean = jnp.mean(kernel, axis=(0, 1), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1), keepdims=True)
        kernel = (kernel - mean) * jax.lax.rsqrt(var + eps)
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
            x = x.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(self.kernel_size // 2, self.kernel_size // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias


class ChannelLayerNorm(nn.Module):
    """Gain-only LayerNorm over the channel axis (per position).

    Reference `resnets.py:104-113`: biased variance over channels, learned
    gain, no bias.
    """

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (dim,))
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps) * g


def film_scale_shift(
    x: jax.Array, scale: jax.Array, shift: jax.Array
) -> jax.Array:
    """Apply FiLM conditioning, supporting multi-channel conditioning latents.

    Single-channel (``scale [B, C]``): ``x * (scale + 1) + shift``.
    Multi-channel (``scale [B, E, C]``, reference `resnets.py:163-176`): the
    transform is applied once per conditioning channel and summed, which
    algebraically reduces to ``x * (sum_e scale_e + E) + sum_e shift_e``.

    Args:
        x: ``[B, L, C]``.
    """
    if scale.ndim == 2:
        return x * (scale[:, None, :] + 1.0) + shift[:, None, :]
    elif scale.ndim == 3:
        e = scale.shape[1]
        return (
            x * (jnp.sum(scale, axis=1)[:, None, :] + float(e))
            + jnp.sum(shift, axis=1)[:, None, :]
        )
    raise ValueError(f"Unsupported FiLM scale ndim: {scale.ndim}")


class Block1D(nn.Module):
    """WSConv(k=3) -> GroupNorm -> FiLM -> SiLU. Reference `resnets.py:127-177`."""

    features: int
    groups: int = 8
    dtype: object = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        scale_shift: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = WSConv1d(self.features, kernel_size=3, dtype=self.dtype, name="proj")(x)
        x = nn.GroupNorm(
            num_groups=self.groups, epsilon=1e-5, dtype=self.dtype, name="norm"
        )(x)
        if scale_shift is not None:
            x = film_scale_shift(x, *scale_shift)
        return nn.silu(x)


class ResnetBlock1D(nn.Module):
    """Two FiLM blocks + residual 1x1. Reference `resnets.py:180-208`.

    The conditioning embedding goes through SiLU -> Dense(2*features) and is
    chunked into (scale, shift) for the FIRST block only.
    """

    features: int
    groups: int = 8
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array, emb: Optional[jax.Array] = None) -> jax.Array:
        scale_shift = None
        if emb is not None:
            h = nn.Dense(self.features * 2, dtype=self.dtype, name="mlp_dense")(
                nn.silu(emb)
            )
            # emb [B, E] -> scale/shift [B, F]; emb [B, Ce, E] -> [B, Ce, F]
            scale, shift = jnp.split(h, 2, axis=-1)
            scale_shift = (scale, shift)

        h = Block1D(
            self.features, groups=self.groups, dtype=self.dtype, name="block1"
        )(x, scale_shift)
        h = Block1D(
            self.features, groups=self.groups, dtype=self.dtype, name="block2"
        )(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1,), dtype=self.dtype, name="res_conv")(x)
        return h + x


class LinearAttention1D(nn.Module):
    """Softmax-kernel linear attention over the length axis.

    Reference `resnets.py:211-235`: q softmaxed over the head-channel dim,
    k over the length dim; output through a 1x1 conv + channel LayerNorm.
    """

    heads: int = 4
    dim_head: int = 32
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, L, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # [B, L, h*d] -> [B, h, d, L]
            return t.reshape(B, L, self.heads, self.dim_head).transpose(0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)
        q = jax.nn.softmax(q, axis=-2)  # over d
        k = jax.nn.softmax(k, axis=-1)  # over L
        q = q * (self.dim_head**-0.5)
        context = jnp.einsum(
            "bhdn,bhen->bhde", k, v, preferred_element_type=jnp.float32
        )
        out = jnp.einsum(
            "bhde,bhdn->bhen", context, q, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = out.transpose(0, 3, 1, 2).reshape(B, L, hidden)  # [B, L, h*e]
        out = nn.Dense(C, dtype=self.dtype, name="to_out")(out)
        return ChannelLayerNorm(name="out_norm")(out)


class Attention1D(nn.Module):
    """Full softmax attention over the length axis. Reference `resnets.py:238-260`."""

    heads: int = 4
    dim_head: int = 32
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, L, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # [B, L, h*d] -> [B, h, L, d]
            return t.reshape(B, L, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        q = q * (self.dim_head**-0.5)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
        out = jnp.einsum(
            "bhij,bhjd->bhid", attn, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, hidden)
        return nn.Dense(C, dtype=self.dtype, name="to_out")(out)
