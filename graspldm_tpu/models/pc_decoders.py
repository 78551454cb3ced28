"""Point-cloud decoders (latent -> point features/coords).

Rebuild of `grasp_ldm/models/modules/pc_decoders.py:14-353` — support code
for point-cloud generation experiments (registered by no shipped config, but
part of the reference's model surface): "inverted" PVCNN stacks whose channel
ramp descends (64, 512, 256, 128 at scale 1) and whose voxel resolutions
ascend (16, 32), so a coarse latent cloud is progressively refined.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .pvcnn import PVConv, SharedMLP

__all__ = ["PVCNNInvert", "PVCNNDecoder", "PVCNN2Invert", "PVCNN2Decoder"]


def invert_block_spec(
    scale_channels: float,
    scale_voxel_resolution: float,
    num_blocks: Sequence[int],
) -> Tuple[Tuple[int, int, Optional[int]], ...]:
    """Descending-channel / ascending-resolution spec
    (`pc_decoders.py:57-88`)."""
    nb1, nb2, nb3, nb4 = num_blocks
    c = [int(64 * scale_channels), int(512 * scale_channels),
         int(256 * scale_channels), int(128 * scale_channels)]
    r = [int(16 * scale_voxel_resolution), int(32 * scale_voxel_resolution)]
    return ((c[0], nb1, r[0]), (c[1], nb2, r[1]), (c[2], nb3, None),
            (c[3], nb4, None))


class PVCNNInvert(nn.Module):
    """Inverted PVCNN stack over a latent point set.

    Input ``[B, N, 3+extra]`` (xyz first); returns per-point features and the
    (unchanged) coords, mirroring `pc_decoders.py:90-99`.
    """

    scale_channels: float = 0.25
    scale_voxel_resolution: float = 0.75
    num_blocks: Sequence[int] = (1, 1, 1, 1)
    extra_feature_channels: int = 0

    @property
    def block_spec(self):
        return invert_block_spec(
            self.scale_channels, self.scale_voxel_resolution, self.num_blocks
        )

    @property
    def out_channels(self) -> int:
        return self.block_spec[-1][0]

    @nn.compact
    def __call__(
        self, features: jax.Array, *, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        coords = features[..., :3]
        li = 0
        for out_ch, n_blocks, resolution in self.block_spec:
            for _ in range(n_blocks):
                if resolution is None:
                    features = SharedMLP([out_ch], name=f"stage_{li}")(
                        features, train=train
                    )
                else:
                    features = PVConv(
                        out_channels=out_ch,
                        resolution=resolution,
                        with_se=True,
                        normalize=False,
                        name=f"stage_{li}",
                    )(features, coords, train=train)
                li += 1
        return features, coords


class PVCNNDecoder(nn.Module):
    """Latent vector -> point cloud.

    A Dense seeds ``n_points`` coarse points from the latent; the inverted
    PVCNN refines them; an xyz head emits coordinates (the reference's
    PVCNNDecoder shape contract, `pc_decoders.py:208-292`).
    """

    n_points: int = 1024
    latent_dims: int = 128
    scale_channels: float = 0.25
    scale_voxel_resolution: float = 0.75
    num_blocks: Sequence[int] = (1, 1, 1, 1)

    @nn.compact
    def __call__(self, z: jax.Array, *, train: bool = False) -> jax.Array:
        """``z [B, D]`` -> ``[B, n_points, 3]``."""
        B = z.shape[0]
        seed = nn.Dense(self.n_points * 3, name="seed")(z)
        coords = seed.reshape(B, self.n_points, 3)
        feats, _ = PVCNNInvert(
            scale_channels=self.scale_channels,
            scale_voxel_resolution=self.scale_voxel_resolution,
            num_blocks=tuple(self.num_blocks),
            name="invert",
        )(coords, train=train)
        return coords + nn.Dense(3, name="xyz_head")(feats)


class PVCNN2Invert(nn.Module):
    """Inverted PVCNN2: the full SA/FP hourglass over a latent point set.

    Reference `pc_decoders.py:100-205`: identical SA/FP specs to PVCNN2 but
    consuming an expanded latent cloud whose first 3 channels act as
    pseudo-coordinates. Returns (features, coords).
    """

    extra_feature_channels: int = 0
    dropout: float = 0.1
    sa_blocks: Optional[Tuple] = None  # None = PVCNN2 defaults
    fp_blocks: Optional[Tuple] = None

    @nn.compact
    def __call__(
        self, features: jax.Array, *, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        from .pvcnn2 import FP_BLOCKS, SA_BLOCKS, PVCNN2

        backbone = PVCNN2(
            extra_feature_channels=features.shape[-1] - 3,
            dropout=self.dropout,
            sa_blocks=self.sa_blocks or SA_BLOCKS,
            fp_blocks=self.fp_blocks or FP_BLOCKS,
            name="hourglass",
        )
        out = backbone(features, train=train)
        return out, features[..., :3]


class PVCNN2Decoder(nn.Module):
    """Latent vector -> point cloud via the PVCNN2Invert hourglass.

    Reference `pc_decoders.py:292-353` (PVCNNDecoder with the PVCNN2Invert
    backbone): a Dense seeds ``n_points`` coarse positions, a 1x1-conv stack
    expands the single latent channel, the hourglass refines, an xyz head
    emits coordinates.
    """

    n_points: int = 1024
    latent_dims: int = 128
    expand_channels: int = 16
    sa_blocks: Optional[Tuple] = None
    fp_blocks: Optional[Tuple] = None

    @nn.compact
    def __call__(self, z: jax.Array, *, train: bool = False) -> jax.Array:
        """``z [B, D]`` -> ``[B, n_points, 3]``."""
        B = z.shape[0]
        seed = nn.Dense(self.n_points, name="in_layer")(z)  # [B, N]
        h = seed[:, :, None]  # [B, N, 1]
        h = nn.Dense(self.expand_channels, use_bias=False, name="expand")(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="expand_bn",
        )(h)
        h = nn.relu(h)
        feats, coords = PVCNN2Invert(
            sa_blocks=self.sa_blocks, fp_blocks=self.fp_blocks, name="invert"
        )(h, train=train)
        return coords + nn.Dense(3, name="xyz_head")(feats)
