"""Franka Panda parallel-jaw gripper model.

Rebuild of `grasp_ldm/utils/gripper.py:6-251` + the serialized control points
(`grasp_ldm/dataset/acronym/gripper_ctrl_pts.json`). The keypoints are the
physical dimensions of the Panda hand (also used by NVlabs/acronym); control
points are generated procedurally as 11 evenly spaced samples along each of
the four open-gripper segments (44 points total), reproducing the reference's
serialized values exactly.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

__all__ = [
    "SimplePandaGripper",
    "gripper_control_points",
    "transform_to_fingertip_frame",
    "transform_to_gripper_wrist",
]


class SimplePandaGripper:
    """Keypoints of the Panda gripper; origin at the wrist top, +z toward tips."""

    TOP = np.array([0.0, 0.0, 0.0])
    CENTER = np.array([0.0, 0.0, 0.0659999996])
    CENTER_RIGHT = np.array([-4.1e-02, 0.0, 6.59999996e-02])
    CENTER_LEFT = np.array([4.1e-02, 0.0, 6.59999996e-02])
    BOTTOM_RIGHT = np.array([-4.1e-02, 0.0, 1.12169998e-01])
    BOTTOM_LEFT = np.array([4.1e-02, 0.0, 1.12169998e-01])
    BOTTOM_CENTER = np.array([0.0, 0.0, 1.12169998e-01])

    # Open-gripper wireframe segments (order matches the serialized control
    # points: spine, palm bar, left finger, right finger).
    @classmethod
    def open_segments(cls) -> Sequence[tuple]:
        return (
            (cls.TOP, cls.CENTER),
            (cls.CENTER_LEFT, cls.CENTER_RIGHT),
            (cls.CENTER_LEFT, cls.BOTTOM_LEFT),
            (cls.CENTER_RIGHT, cls.BOTTOM_RIGHT),
        )

    # Finger-sweep segments used for collision probing markers
    # (`gripper.py:34-48`).
    @classmethod
    def collision_segments(cls) -> Sequence[tuple]:
        return (
            (np.array([4.1e-02, 0.0, 1.08169998e-01]),
             np.array([-4.1e-02, 0.0, 1.08169998e-01])),
            (np.array([4.1e-02, 0.0, 9.8169998e-02]),
             np.array([-4.1e-02, 0.0, 9.8169998e-02])),
        )


def gripper_control_points(points_per_segment: int = 11) -> np.ndarray:
    """``[44, 3]`` control points: linspace along each open segment."""
    pts = []
    for a, b in SimplePandaGripper.open_segments():
        ts = np.linspace(0.0, 1.0, points_per_segment)[:, None]
        pts.append(a[None, :] * (1 - ts) + b[None, :] * ts)
    return np.concatenate(pts, axis=0).astype(np.float32)


def transform_to_fingertip_frame(grasps: np.ndarray) -> np.ndarray:
    """Re-express ``[..., 4, 4]`` grasp poses in the FINGERTIP frame.

    Right-multiplies a pure translation to BOTTOM_CENTER (the point between
    the fingertips), matching `grasp_ldm/utils/gripper.py:170-218` — used
    when handing grasps to a robot controller whose TCP is at the tips.
    """
    t = np.eye(4, dtype=np.asarray(grasps).dtype)
    t[:3, 3] = SimplePandaGripper.BOTTOM_CENTER
    return np.asarray(grasps) @ t


def transform_to_gripper_wrist(grasps: np.ndarray) -> np.ndarray:
    """Re-express ``[..., 4, 4]`` grasp poses in the WRIST/center frame
    (`grasp_ldm/utils/gripper.py:220-251`)."""
    t = np.eye(4, dtype=np.asarray(grasps).dtype)
    t[:3, 3] = SimplePandaGripper.CENTER
    return np.asarray(grasps) @ t
