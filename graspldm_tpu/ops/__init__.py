"""TPU-native point-cloud ops (dense-XLA with Pallas fast paths).

Replaces the reference's CUDA functional backend
(`grasp_ldm/models/modules/ext/pvcnn/modules/functional/`).
"""

from .neighborhood import (
    ball_query,
    group_points,
    pairwise_sq_dists,
    three_nn_interpolate,
)
from .masking import logits_mask
from .pallas_fps import furthest_point_sample_pallas
from .sampling import furthest_point_sample, gather_points
from .voxel import (
    avg_voxelize,
    normalize_coords_for_voxelization,
    trilinear_devoxelize,
)

__all__ = [
    "ball_query",
    "group_points",
    "pairwise_sq_dists",
    "three_nn_interpolate",
    "logits_mask",
    "furthest_point_sample",
    "furthest_point_sample_pallas",
    "gather_points",
    "avg_voxelize",
    "normalize_coords_for_voxelization",
    "trilinear_devoxelize",
]
