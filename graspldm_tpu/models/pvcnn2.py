"""PVCNN2: PointNet++-style set-abstraction / feature-propagation with PVConv.

Rebuild of `grasp_ldm/models/modules/ext/pvcnn/pvcnn_base.py:180-279` and the
SA/FP modules (`.../modules/pointnet.py:11-135`) on the dense TPU ops:
FPS (`ops/sampling.py`), ball-query grouping (`ops/neighborhood.py`), 3-NN
feature propagation, PVConv voxel branches (`models/pvcnn.py`).

All stage shapes are static (fixed num_centers / num_neighbors per stage), so
the whole encoder jits into one fused program; grouping/FPS keep the CUDA
contracts tested in `tests/test_ops.py`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import ball_query, furthest_point_sample, gather_points, group_points, three_nn_interpolate
from .pvcnn import PVConv, SharedMLP

__all__ = [
    "PointNetSAModule",
    "PointNetAModule",
    "PointNetFPModule",
    "PVCNN2",
    "PVCNN2Encoder",
    "PointNet2",
    "PointNet2SSG",
    "PointNet2MSG",
]

# (pvconv cfg (out_ch, num_blocks, voxel_res) | None,
#  sa cfg (num_centers, radius, num_neighbors, mlp_channels))
SA_BLOCKS = (
    ((32, 1, 32), (1024, 0.1, 32, (32, 64))),
    ((64, 2, 16), (256, 0.2, 32, (64, 128))),
    ((128, 1, 8), (64, 0.4, 32, (128, 256))),
    (None, (16, 0.8, 32, (256, 256, 512))),
)
# ((fp mlp channels), pvconv cfg (out_ch, num_blocks, voxel_res))
FP_BLOCKS = (
    ((256, 256), (256, 1, 8)),
    ((256, 256), (256, 1, 8)),
    ((256, 128), (128, 2, 16)),
    ((128, 128, 64), (64, 1, 32)),
)


class PointNetSAModule(nn.Module):
    """Set abstraction: FPS centers -> ball-query groups -> MLP -> max-pool.

    Reference `pointnet.py:52-113`: grouped neighbor coords are centered on
    their center and concatenated to neighbor features before the shared MLP.
    """

    num_centers: int
    radius: float
    num_neighbors: int
    mlp_channels: Sequence[int]
    include_coordinates: bool = True

    @nn.compact
    def __call__(
        self, features: jax.Array, coords: jax.Array, *, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        """``[B, N, C]``, ``[B, N, 3]`` -> (``[B, M, C']``, centers ``[B, M, 3]``)."""
        center_idx = furthest_point_sample(coords, self.num_centers)
        centers = gather_points(coords, center_idx)  # [B, M, 3]

        nbr_idx = ball_query(centers, coords, self.radius, self.num_neighbors)
        nbr_coords = group_points(coords, nbr_idx) - centers[:, :, None, :]
        nbr_feats = group_points(features, nbr_idx)  # [B, M, U, C]
        if self.include_coordinates:
            nbr_feats = jnp.concatenate([nbr_coords, nbr_feats], axis=-1)

        h = SharedMLP(list(self.mlp_channels), name="mlp")(nbr_feats, train=train)
        return jnp.max(h, axis=2), centers


class PointNetMSGSAModule(nn.Module):
    """Multi-scale-grouping set abstraction: one ball-query + MLP branch per
    radius, features concatenated (reference `pointnet.py:52-113` with list
    configs, used by PointNet2MSG)."""

    num_centers: int
    radii: Sequence[float]
    num_neighbors: Sequence[int]
    mlp_channels: Sequence[Sequence[int]]
    include_coordinates: bool = True

    @nn.compact
    def __call__(
        self, features: jax.Array, coords: jax.Array, *, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        center_idx = furthest_point_sample(coords, self.num_centers)
        centers = gather_points(coords, center_idx)
        outs = []
        for bi, (radius, num_nbr, mlp_ch) in enumerate(
            zip(self.radii, self.num_neighbors, self.mlp_channels)
        ):
            nbr_idx = ball_query(centers, coords, radius, num_nbr)
            nbr_coords = group_points(coords, nbr_idx) - centers[:, :, None, :]
            nbr_feats = group_points(features, nbr_idx)
            if self.include_coordinates:
                nbr_feats = jnp.concatenate([nbr_coords, nbr_feats], axis=-1)
            h = SharedMLP(list(mlp_ch), name=f"mlp_{bi}")(nbr_feats, train=train)
            outs.append(jnp.max(h, axis=2))
        return jnp.concatenate(outs, axis=-1), centers


class PointNetAModule(nn.Module):
    """Global-pool set abstraction: shared MLP over ALL points, max-pooled
    to one "center" at the origin (reference `pointnet.py:11-49`).

    ``mlp_channels`` may be a list of branch specs whose pooled outputs are
    concatenated (matching the reference's multi-MLP form).
    """

    mlp_channels: Sequence
    include_coordinates: bool = True

    @nn.compact
    def __call__(
        self, features: jax.Array, coords: jax.Array, *, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        """``[B, N, C]``, ``[B, N, 3]`` -> (``[B, 1, C']``, zeros ``[B, 1, 3]``)."""
        mlps = self.mlp_channels
        if not isinstance(mlps[0], (list, tuple)):
            mlps = [mlps]
        if self.include_coordinates:
            features = jnp.concatenate([features, coords], axis=-1)
        outs = []
        for bi, mlp_ch in enumerate(mlps):
            h = SharedMLP(list(mlp_ch), name=f"mlp_{bi}")(features, train=train)
            outs.append(jnp.max(h, axis=1, keepdims=True))  # [B, 1, C]
        out = jnp.concatenate(outs, axis=-1)
        return out, jnp.zeros((coords.shape[0], 1, 3), coords.dtype)


class PointNetFPModule(nn.Module):
    """Feature propagation: 3-NN interpolate + skip concat + shared MLP.

    Reference `pointnet.py:117-135`.
    """

    mlp_channels: Sequence[int]

    @nn.compact
    def __call__(
        self,
        points_coords: jax.Array,
        centers_coords: jax.Array,
        centers_features: jax.Array,
        points_features: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        if centers_coords.shape[1] < 3:
            # fewer than 3 centers (e.g. after a global PointNetAModule):
            # repeating the centers makes 3-NN exact (weights sum to 1 over
            # identical features, matching the CUDA kernel's M=1 behavior)
            reps = 3 - centers_coords.shape[1] + 1
            centers_coords = jnp.concatenate([centers_coords] * reps, axis=1)
            centers_features = jnp.concatenate([centers_features] * reps, axis=1)
        interp = three_nn_interpolate(points_coords, centers_coords, centers_features)
        if points_features is not None and points_features.shape[-1] > 0:
            interp = jnp.concatenate([interp, points_features], axis=-1)
        return SharedMLP(list(self.mlp_channels), name="mlp")(interp, train=train)


class PVCNN2(nn.Module):
    """Full SA/FP hourglass (reference class attrs `pvcnn_base.py:186-202`)."""

    extra_feature_channels: int = 0
    sa_blocks: Tuple = SA_BLOCKS
    fp_blocks: Tuple = FP_BLOCKS
    dropout: float = 0.1

    @property
    def out_channels(self) -> int:
        return self.fp_blocks[-1][1][0]

    @nn.compact
    def __call__(self, features: jax.Array, *, train: bool = False) -> jax.Array:
        """``[B, N, 3+extra]`` (xyz first) -> ``[B, N, C_out]``."""
        coords = features[..., :3]
        extras = features[..., 3:]

        skip_feats = []
        skip_coords = []
        for si, (conv_cfg, sa_cfg) in enumerate(self.sa_blocks):
            skip_feats.append(features)
            skip_coords.append(coords)
            if conv_cfg is not None:
                out_ch, n_blocks, res = conv_cfg
                for b in range(n_blocks):
                    features = PVConv(
                        out_channels=out_ch,
                        resolution=res,
                        with_se=True,
                        with_se_relu=True,
                        normalize=True,
                        dropout=self.dropout,
                        name=f"sa{si}_conv{b}",
                    )(features, coords, train=train)
            num_centers, radius, num_neighbors, mlp_ch = sa_cfg
            features, coords = PointNetSAModule(
                num_centers=num_centers,
                radius=radius,
                num_neighbors=num_neighbors,
                mlp_channels=mlp_ch,
                name=f"sa{si}_module",
            )(features, coords, train=train)

        # only raw extra features skip into the last FP (`pvcnn_base.py:237`)
        skip_feats[0] = extras

        for fi, (fp_ch, conv_cfg) in enumerate(self.fp_blocks):
            points_coords = skip_coords[-1 - fi]
            features = PointNetFPModule(mlp_channels=fp_ch, name=f"fp{fi}_module")(
                points_coords, coords, features, skip_feats[-1 - fi], train=train
            )
            coords = points_coords
            if conv_cfg is not None:
                out_ch, n_blocks, res = conv_cfg
                for b in range(n_blocks):
                    features = PVConv(
                        out_channels=out_ch,
                        resolution=res,
                        with_se=True,
                        with_se_relu=True,
                        normalize=True,
                        dropout=self.dropout,
                        name=f"fp{fi}_conv{b}",
                    )(features, coords, train=train)
        return features


class PointNet2(nn.Module):
    """Pure PointNet++ segmentation hourglass (no PVConv).

    Rebuild of `ext/pvcnn/pointnet2.py:13-96`: SA stages (single- or
    multi-scale grouping, optionally a global PointNetAModule) followed by FP
    stages with skip connections. ``sa_blocks`` entries are the reference's
    ``(num_centers, radius, num_neighbors, mlp_channels)`` tuples (lists for
    MSG, Nones for global); ``fp_blocks`` are MLP channel tuples.
    """

    sa_blocks: Tuple = ()
    fp_blocks: Tuple = ()
    extra_feature_channels: int = 3

    @nn.compact
    def __call__(self, features: jax.Array, *, train: bool = False) -> jax.Array:
        """``[B, N, 3+extra]`` (xyz first) -> ``[B, N, C_out]``."""
        coords = features[..., :3]

        skip_feats, skip_coords = [], []
        for si, sa_cfg in enumerate(self.sa_blocks):
            num_centers, radius, num_neighbors, mlp_ch = sa_cfg
            skip_feats.append(features)
            skip_coords.append(coords)
            if num_centers is None:
                features, coords = PointNetAModule(
                    mlp_channels=mlp_ch, name=f"sa{si}_global"
                )(features, coords, train=train)
            elif isinstance(radius, (list, tuple)):
                features, coords = PointNetMSGSAModule(
                    num_centers=num_centers,
                    radii=radius,
                    num_neighbors=num_neighbors,
                    mlp_channels=mlp_ch,
                    name=f"sa{si}_msg",
                )(features, coords, train=train)
            else:
                features, coords = PointNetSAModule(
                    num_centers=num_centers,
                    radius=radius,
                    num_neighbors=num_neighbors,
                    mlp_channels=mlp_ch,
                    name=f"sa{si}_module",
                )(features, coords, train=train)

        for fi, fp_ch in enumerate(self.fp_blocks):
            points_coords = skip_coords[-1 - fi]
            features = PointNetFPModule(
                mlp_channels=fp_ch, name=f"fp{fi}_module"
            )(points_coords, coords, features, skip_feats[-1 - fi], train=train)
            coords = points_coords
        return features


class PointNet2SSG(PointNet2):
    """Single-scale-grouping config (`pointnet2.py:98-123`)."""

    sa_blocks: Tuple = (
        (512, 0.2, 64, (64, 64, 128)),
        (128, 0.4, 64, (128, 128, 256)),
        (None, None, None, (256, 512, 1024)),
    )
    fp_blocks: Tuple = ((256, 256), (256, 128), (128, 128, 128))


class PointNet2MSG(PointNet2):
    """Multi-scale-grouping config (`pointnet2.py:126-159`)."""

    sa_blocks: Tuple = (
        (512, (0.1, 0.2, 0.4), (32, 64, 128),
         ((32, 32, 64), (64, 64, 128), (64, 96, 128))),
        (128, (0.4, 0.8), (64, 128), ((128, 128, 256), (128, 196, 256))),
        (None, None, None, (256, 512, 1024)),
    )
    fp_blocks: Tuple = ((256, 256), (256, 128), (128, 128, 128))


class PVCNN2Encoder(nn.Module):
    """PVCNN2 backbone with the PVCNNEncoder head (reference
    `pc_encoders.py:139-220`)."""

    out_features: int = 32
    n_points: int = 1024
    extra_feature_channels: int = 0
    out_channels: int = 1

    @nn.compact
    def __call__(self, xyz: jax.Array, *, train: bool = False) -> jax.Array:
        backbone = PVCNN2(
            extra_feature_channels=self.extra_feature_channels, name="pvcnn2"
        )
        out = backbone(xyz, train=train)  # [B, N, C]
        half = backbone.out_channels // 2
        out = nn.Dense(half, name="conv_downscale")(out)
        out = nn.Dense(self.out_channels, name="out_conv")(out)
        out = out.transpose(0, 2, 1)
        out = nn.Dense(self.out_features, name="out_proj")(out)
        if self.out_channels == 1:
            out = out.squeeze(1)
        return out
