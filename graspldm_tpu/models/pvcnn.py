"""Point-Voxel CNN (PVCNN) encoder stack, TPU-native.

Rebuild of the reference's vendored PVCNN
(`grasp_ldm/models/modules/ext/pvcnn/pvcnn_base.py:15-177`,
`.../modules/pvconv.py:13-84`, `.../modules/shared_mlp.py`, `.../modules/se.py`)
on top of the dense XLA ops in :mod:`graspldm_tpu.ops`.

TPU design notes:
  * Point features are ``[B, N, C]`` so SharedMLP 1x1 convs are plain Dense
    matmuls over the channel axis — N=1024 rows feed the MXU directly.
  * The voxel branch runs NDHWC ``[B, r, r, r, C]`` Conv3D, which XLA lowers
    to implicit-GEMM on the MXU.
  * Voxelization uses the one-hot matmul scatter-mean (`ops/voxel.py`) —
    deterministic, differentiable, atomics-free.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import avg_voxelize, normalize_coords_for_voxelization, trilinear_devoxelize
from .layers import Attention1D

__all__ = [
    "SharedMLP",
    "SE",
    "PVConv",
    "PVCNN",
    "PVCNNEncoder",
    "pvcnn_block_spec",
]


class SharedMLP(nn.Module):
    """Per-point MLP: (Dense -> BatchNorm -> ReLU) x len(features).

    Reference `shared_mlp.py:6-36` (Conv1d(1x1)+BN+ReLU in torch layout).
    BatchNorm keeps running stats in the ``batch_stats`` collection.
    """

    features: Sequence[int]
    dtype: object = None  # compute dtype (params stay fp32; BN stats fp32)

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name=f"bn_{i}",
            )(x)
            x = nn.relu(x)
        return x


class SE(nn.Module):
    """Squeeze-and-excitation over a voxel grid ``[B, r, r, r, C]``.

    Reference `se.py:12-25` (reduction 8, Swish gate by default).
    """

    reduction: int = 8
    use_relu: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2, 3))  # [B, C]
        s = nn.Dense(
            c // self.reduction, use_bias=False, dtype=self.dtype, name="fc1"
        )(s)
        s = nn.relu(s) if self.use_relu else nn.silu(s)
        s = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, None, :]


class PVConv(nn.Module):
    """Point-voxel convolution: voxel Conv3D branch + per-point MLP branch.

    Reference `pvconv.py:13-84`. The voxel branch is
    voxelize -> [Conv3D(k) -> GroupNorm(8) -> Swish -> Dropout ->
    Conv3D(k) -> GroupNorm(8) -> Swish|Attention -> SE] -> devoxelize,
    summed with a SharedMLP point branch.
    """

    out_channels: int
    kernel_size: int = 3
    resolution: int = 32
    with_se: bool = True
    with_se_relu: bool = False
    use_attention: bool = False
    normalize: bool = False
    eps: float = 0.0
    dropout: Optional[float] = 0.1
    dtype: object = None

    @nn.compact
    def __call__(
        self,
        features: jax.Array,
        coords: jax.Array,
        *,
        train: bool = False,
    ) -> jax.Array:
        """features ``[B, N, C]``, coords ``[B, N, 3]`` -> ``[B, N, out_channels]``."""
        r = self.resolution
        k = self.kernel_size

        vox_coords = normalize_coords_for_voxelization(
            coords, r, normalize=self.normalize, eps=self.eps
        )
        if self.dtype is not None:
            features = features.astype(self.dtype)
        grid = avg_voxelize(features, vox_coords, r)  # [B, r^3, C]
        grid = grid.reshape(grid.shape[0], r, r, r, -1)

        grid = nn.Conv(
            self.out_channels, (k, k, k), padding=k // 2, dtype=self.dtype,
            name="voxel_conv1",
        )(grid)
        grid = nn.GroupNorm(
            num_groups=8, epsilon=1e-5, dtype=self.dtype, name="voxel_norm1"
        )(grid)
        grid = nn.silu(grid)
        if self.dropout is not None:
            grid = nn.Dropout(rate=self.dropout, deterministic=not train)(grid)
        grid = nn.Conv(
            self.out_channels, (k, k, k), padding=k // 2, dtype=self.dtype,
            name="voxel_conv2",
        )(grid)
        grid = nn.GroupNorm(
            num_groups=8, epsilon=1e-5, dtype=self.dtype, name="voxel_norm2"
        )(grid)
        if self.use_attention:
            B = grid.shape[0]
            flat = grid.reshape(B, r * r * r, self.out_channels)
            flat = Attention1D(dtype=self.dtype, name="voxel_attn")(flat)
            grid = flat.reshape(B, r, r, r, self.out_channels)
        else:
            grid = nn.silu(grid)
        if self.with_se:
            grid = SE(use_relu=self.with_se_relu, dtype=self.dtype, name="se")(grid)

        grid = grid.reshape(grid.shape[0], r * r * r, self.out_channels)
        voxel_features = trilinear_devoxelize(grid, vox_coords, r)

        point_features = SharedMLP(
            [self.out_channels], dtype=self.dtype, name="point_features"
        )(features, train=train)
        return voxel_features + point_features


def pvcnn_block_spec(
    scale_channels: float,
    scale_voxel_resolution: float,
    num_blocks: Sequence[int],
    extra_block_channels: Optional[Sequence[int]] = None,
) -> Tuple[Tuple[int, int, Optional[int]], ...]:
    """Base PVCNN stage spec scaled by channel/resolution multipliers.

    Reference `pvcnn_base.py:82-112`: base channels (64, 128, 1024, 2048),
    base voxel resolutions (32, 16, None, None).
    """
    nb1, nb2, nb3, nb4 = num_blocks
    c = [int(64 * scale_channels), int(128 * scale_channels),
         int(1024 * scale_channels), int(2048 * scale_channels)]
    r = [int(32 * scale_voxel_resolution), int(16 * scale_voxel_resolution)]
    assert all(ci % 2 == 0 for ci in c) and all(ri % 2 == 0 for ri in r)
    blocks = [
        (c[0], nb1, r[0]),
        (c[1], nb2, r[1]),
        (c[2], nb3, None),
        (c[3], nb4, None),
    ]
    if extra_block_channels is not None:
        blocks += [(ec, 1, None) for ec in extra_block_channels]
    return tuple(blocks)


class PVCNN(nn.Module):
    """Stacked PVConv/SharedMLP stages over a point cloud.

    Reference `pvcnn_base.py:15-177`. Stages with a voxel resolution are
    PVConv; the rest are SharedMLP. Optional FiLM conditioning applies
    per-stage scale/shift computed from a conditioning vector
    (`pvcnn_base.py:60-80,142-167`).
    """

    scale_channels: float = 0.25
    scale_voxel_resolution: float = 0.75
    num_blocks: Sequence[int] = (1, 2, 1, 1)
    extra_feature_channels: int = 0
    is_conditioned: bool = False
    cond_dims: Optional[int] = None
    extra_block_channels: Optional[Sequence[int]] = None
    voxelization_normalize: bool = False
    dtype: object = None  # compute dtype (None = fp32; params always fp32)

    @property
    def block_spec(self):
        return pvcnn_block_spec(
            self.scale_channels,
            self.scale_voxel_resolution,
            self.num_blocks,
            self.extra_block_channels,
        )

    @property
    def out_channels(self) -> int:
        return self.block_spec[-1][0]

    @nn.compact
    def __call__(
        self,
        features: jax.Array,
        *,
        cond: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        """features ``[B, N, 3+extra]`` (xyz first) -> ``[B, N, C_out]``."""
        coords = features[..., :3]

        layer_idx = 0
        for out_ch, n_blocks, resolution in self.block_spec:
            for _ in range(n_blocks):
                if self.is_conditioned:
                    assert cond is not None, "conditioned PVCNN requires cond"
                    c_in = features.shape[-1]
                    emb = nn.Dense(
                        2 * c_in, dtype=self.dtype, name=f"cond_emb_{layer_idx}_1"
                    )(cond)
                    emb = nn.silu(emb)
                    emb = nn.Dense(
                        2 * c_in, dtype=self.dtype, name=f"cond_emb_{layer_idx}_2"
                    )(emb)
                    scale, shift = jnp.split(emb, 2, axis=-1)
                    features = features * (1.0 + scale[:, None, :]) + shift[:, None, :]
                if resolution is None:
                    features = SharedMLP(
                        [out_ch], dtype=self.dtype, name=f"stage_{layer_idx}"
                    )(features, train=train)
                else:
                    features = PVConv(
                        out_channels=out_ch,
                        kernel_size=3,
                        resolution=resolution,
                        with_se=True,
                        normalize=self.voxelization_normalize,
                        dtype=self.dtype,
                        name=f"stage_{layer_idx}",
                    )(features, coords, train=train)
                layer_idx += 1
        return features


class PVCNNEncoder(nn.Module):
    """Point cloud ``[B, N, 3]`` -> conditioning latent ``z_pc``.

    Reference `grasp_ldm/models/modules/pc_encoders.py:8-137`:
    PVCNN backbone -> 1x1 conv halving channels -> optional global attention
    -> 1x1 conv to ``out_channels`` -> Dense over the point axis to
    ``out_features``. Output ``[B, out_channels, out_features]``, squeezed to
    ``[B, out_features]`` when ``out_channels == 1``.
    """

    out_features: int = 32
    n_points: int = 1024
    in_features: int = 3
    extra_feature_channels: int = 0
    scale_channels: float = 0.25
    scale_voxel_resolution: float = 0.75
    num_blocks: Sequence[int] = (1, 1, 1, 1)
    is_conditioned: bool = False
    cond_dims: Optional[int] = None
    extra_block_channels: Optional[Sequence[int]] = None
    use_global_attention: bool = False
    out_channels: int = 1
    dtype: object = None  # compute dtype (None = fp32; params always fp32)

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        *,
        cond: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        backbone = PVCNN(
            scale_channels=self.scale_channels,
            scale_voxel_resolution=self.scale_voxel_resolution,
            num_blocks=self.num_blocks,
            extra_feature_channels=self.extra_feature_channels,
            is_conditioned=self.is_conditioned,
            cond_dims=self.cond_dims,
            extra_block_channels=self.extra_block_channels,
            dtype=self.dtype,
            name="pvcnn",
        )
        out = backbone(xyz, cond=cond, train=train)  # [B, N, C]

        half = backbone.out_channels // 2
        out = nn.Dense(half, dtype=self.dtype, name="conv_downscale")(out)

        if self.use_global_attention:
            out = _GlobalAttention(dtype=self.dtype, name="global_attention")(out)

        out = nn.Dense(
            self.out_channels, dtype=self.dtype, name="out_conv"
        )(out)  # [B, N, C_out]
        out = out.transpose(0, 2, 1)  # [B, C_out, N]
        out = nn.Dense(
            self.out_features, dtype=self.dtype, name="out_proj"
        )(out)  # [B, C_out, F]
        if self.out_channels == 1:
            out = out.squeeze(1)
        return out


class _GlobalAttention(nn.Module):
    """PVD-style global attention + GroupNorm/Swish residual block.

    Reference `grasp_ldm/models/modules/modules.py:14-57` (D=1 variant,
    num_groups 8): single-head full attention over the point axis with
    post-residual GroupNorm and Swish. Input/output ``[B, N, C]``.
    """

    num_groups: int = 8
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        B, N, C = x.shape
        q = nn.Dense(C, dtype=self.dtype, name="q")(x)
        k = nn.Dense(C, dtype=self.dtype, name="k")(x)
        v = nn.Dense(C, dtype=self.dtype, name="v")(x)
        # qk: [B, N, N] (no scaling, matching the reference)
        w = jax.nn.softmax(
            jnp.einsum("bic,bjc->bij", q, k, preferred_element_type=jnp.float32),
            axis=-1,
        ).astype(x.dtype)
        h = jnp.einsum("bij,bjc->bic", w, v, preferred_element_type=jnp.float32)
        h = nn.Dense(C, dtype=self.dtype, name="out")(h.astype(x.dtype))
        x = x + h
        x = nn.GroupNorm(
            num_groups=self.num_groups, epsilon=1e-5, dtype=self.dtype, name="norm"
        )(x)
        return nn.silu(x)
