"""Points-based grasp success classifier, TPU-native.

Rebuild of `grasp_ldm/models/grasp_classifier.py:13-143`: the object point
cloud (label channel 0) and the gripper-keypoint cloud under a candidate
grasp pose (label channel 1) are concatenated into one labeled cloud
``[B, Np+Ng, 4]``, passed through a PVCNN backbone, and reduced to a single
success logit via a small MLP head
(`create_mlp_components([128, dropout .5, 1])`, `ext/pvcnn/utils.py:30-62`)
plus a Dense over the point axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .pvcnn import PVCNN

__all__ = ["PointsBasedGraspClassifier"]


class PointsBasedGraspClassifier(nn.Module):
    """Binary grasp-success classifier over labeled point clouds."""

    num_pc_points: int  # Np + Ng (total labeled points fed to the backbone)
    scale_channels: float = 0.25
    scale_voxel_resolution: float = 0.75
    num_blocks: Sequence[int] = (1, 1, 1, 1)
    extra_feature_channels: int = 1  # the 0/1 object-vs-gripper label
    head_hidden: int = 128
    head_dropout: float = 0.5

    @nn.compact
    def __call__(
        self,
        pc: jax.Array,
        grasp_points: jax.Array,
        *,
        train: bool = False,
    ) -> jax.Array:
        """``pc [B, Np, 3]``, ``grasp_points [B, Ng, 3]`` -> logits ``[B]``."""
        obj = jnp.concatenate([pc, jnp.zeros_like(pc[..., :1])], axis=-1)
        grp = jnp.concatenate(
            [grasp_points, jnp.ones_like(grasp_points[..., :1])], axis=-1
        )
        labeled = jnp.concatenate([obj, grp], axis=-2)  # [B, N, 4]

        x = PVCNN(
            scale_channels=self.scale_channels,
            scale_voxel_resolution=self.scale_voxel_resolution,
            num_blocks=tuple(self.num_blocks),
            extra_feature_channels=self.extra_feature_channels,
            name="backbone",
        )(labeled, train=train)  # [B, N, C]

        # MLP head: SharedMLP(C->128) + dropout + 1x1 conv logit per point,
        # then Dense over the point axis to one logit per cloud.
        h = nn.Dense(self.head_hidden, name="head_dense")(x)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="head_bn",
        )(h)
        h = nn.relu(h)
        h = nn.Dropout(rate=self.head_dropout, deterministic=not train)(h)
        h = nn.Dense(1, name="head_logit")(h)  # [B, N, 1]
        logit = nn.Dense(1, name="point_pool")(h[..., 0])  # [B, 1]
        return logit[..., 0]

    def classify(self, variables, pc, grasp_points) -> jax.Array:
        """Sigmoid success probabilities (pure helper)."""
        logits = self.apply(variables, pc, grasp_points)
        return jax.nn.sigmoid(logits)
