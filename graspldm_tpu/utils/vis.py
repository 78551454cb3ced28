"""Visualization helpers (optional; requires trimesh).

Rebuild of `grasp_ldm/utils/vis.py:7-100`: gripper wireframe markers colored
by confidence over an xyz-colored point cloud. trimesh is not part of the
baked environment, so everything here degrades gracefully: importing this
module is safe, calling the trimesh-backed functions raises a clear error.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .gripper import SimplePandaGripper

try:  # pragma: no cover - availability depends on environment
    import trimesh

    _HAS_TRIMESH = True
except ImportError:  # pragma: no cover
    trimesh = None
    _HAS_TRIMESH = False

__all__ = [
    "create_gripper_marker",
    "visualize_pc",
    "visualize_pc_grasps",
    "grasp_segments",
]


def grasp_segments(H: np.ndarray) -> np.ndarray:
    """Transform the gripper wireframe segments by grasp poses.

    Args:
        H: ``[G, 4, 4]`` grasp transforms.
    Returns:
        ``[G, S, 2, 3]`` line segments per grasp (trimesh-free primitive
        usable by any renderer).
    """
    segs = np.asarray(SimplePandaGripper.open_segments(), dtype=np.float64)
    pts = segs.reshape(-1, 3)  # [S*2, 3]
    pts_h = np.concatenate([pts, np.ones((len(pts), 1))], axis=-1)
    out = np.einsum("gij,nj->gni", np.asarray(H, np.float64), pts_h)[..., :3]
    return out.reshape(H.shape[0], -1, 2, 3)


def _require_trimesh():
    if not _HAS_TRIMESH:
        raise ImportError(
            "trimesh is required for 3-D visualization; install it or use "
            "grasp_segments() with your own renderer."
        )


def create_gripper_marker(
    color=(0, 0, 255), tube_radius: float = 0.002, sections: int = 6
):
    """Cylinder wireframe of the open Panda gripper (trimesh mesh)."""
    _require_trimesh()
    cylinders = [
        trimesh.creation.cylinder(
            radius=tube_radius, sections=sections, segment=np.asarray(seg)
        )
        for seg in SimplePandaGripper.open_segments()
    ]
    marker = trimesh.util.concatenate(cylinders)
    marker.visual.face_colors = list(color) + [255]
    return marker


def visualize_pc(pc: np.ndarray):
    """Show a point cloud colored by xyz (`grasp_ldm/utils/vis.py:51-64`)."""
    trimesh = _require_trimesh()
    pc = np.asarray(pc).reshape(-1, 3)
    maxs = np.maximum(np.abs(pc).max(axis=0), 1e-9)
    colors = np.clip(
        np.stack(
            [
                pc[:, 0] * 255 / maxs[0],
                pc[:, 1] * 200 / maxs[1],
                pc[:, 2] * 175 / maxs[2],
                np.full(pc.shape[0], 200.0),
            ],
            axis=1,
        ),
        0,
        255,
    )
    cloud = trimesh.points.PointCloud(pc, colors=colors.astype(np.uint8))
    return trimesh.Scene(cloud)


def visualize_pc_grasps(
    pc: np.ndarray,
    H: np.ndarray,
    confidence: Optional[np.ndarray] = None,
    show: bool = True,
):
    """Scene with xyz-colored points and confidence-colored grippers."""
    _require_trimesh()
    pc = np.asarray(pc)
    colors = (pc - pc.min(0)) / (np.ptp(pc, 0) + 1e-9)
    cloud = trimesh.points.PointCloud(
        pc, colors=(np.concatenate([colors, np.ones((len(pc), 1))], -1) * 255)
    )
    geoms = [cloud]
    conf = (
        np.asarray(confidence)
        if confidence is not None
        else np.ones((H.shape[0],))
    )
    for h, c in zip(np.asarray(H), conf):
        color = [int(255 * (1 - c)), int(255 * c), 0]
        geoms.append(create_gripper_marker(color=color).apply_transform(h))
    scene = trimesh.Scene(geoms)
    if show:  # pragma: no cover
        scene.show()
    return scene
