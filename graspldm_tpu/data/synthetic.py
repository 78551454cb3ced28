"""Synthetic mini-ACRONYM fixture for tests and CI (SURVEY.md §4).

Generates a tiny on-disk dataset with the real layout — ``splits/*.json``,
``grasps/*.h5`` (ACRONYM schema), ``meshes/{Cat}/{id}.obj`` — so the data
pipeline and end-to-end train smoke tests run without the real dataset.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import h5py
import numpy as np
from scipy.spatial.transform import Rotation

__all__ = ["make_synthetic_acronym"]

_CUBE_VERTS = np.array(
    [
        [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
        [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
    ],
    dtype=np.float64,
)
_CUBE_FACES = np.array(
    [
        [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
        [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
        [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3],
    ],
    dtype=np.int64,
)


def _write_obj(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")


def make_synthetic_acronym(
    root: str,
    categories: Sequence[str] = ("Cup", "Mug"),
    objects_per_category: int = 2,
    grasps_per_object: int = 64,
    seed: int = 0,
) -> str:
    """Create the fixture under ``root`` and return it."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "splits"), exist_ok=True)
    os.makedirs(os.path.join(root, "grasps"), exist_ok=True)

    for cat in categories:
        os.makedirs(os.path.join(root, "meshes", cat), exist_ok=True)
        train_files, test_files = [], []
        for i in range(objects_per_category):
            obj_id = f"{cat.lower()}{i:04d}"
            scale = float(rng.uniform(0.01, 0.05))
            fname = f"{cat}_{obj_id}_{scale:.6f}.h5"
            # irregular convex-ish blob: jittered cube
            verts = _CUBE_VERTS * rng.uniform(0.5, 1.5, size=(1, 3))
            verts += rng.normal(0, 0.05, size=verts.shape)
            _write_obj(
                os.path.join(root, "meshes", cat, obj_id + ".obj"),
                verts,
                _CUBE_FACES,
            )

            G = grasps_per_object
            quats = Rotation.random(G, random_state=int(rng.integers(1 << 30)))
            H = np.tile(np.eye(4), (G, 1, 1))
            H[:, :3, :3] = quats.as_matrix()
            H[:, :3, 3] = rng.normal(0, 0.03, size=(G, 3))
            success = (rng.random(G) > 0.3).astype(np.int64)
            # guarantee enough good grasps
            success[: G // 2] = 1

            with h5py.File(os.path.join(root, "grasps", fname), "w") as f:
                f["grasps/transforms"] = H
                f["grasps/qualities/flex/object_in_gripper"] = success
                for qname in ("force_closure", "antipodal", "torque", "wrench"):
                    f[f"grasps/qualities/flex/{qname}"] = rng.random(G)
                f["object/scale"] = scale
            (train_files if i % 2 == 0 else test_files).append(fname)

        with open(os.path.join(root, "splits", f"{cat}.json"), "w") as f:
            json.dump({"train": train_files, "test": test_files}, f)
    return root


def make_synthetic_partial_scenes(
    root: str,
    split: str = "train",
    num_scenes: int = 2,
    cams_per_scene: int = 2,
    grasps_per_scene: int = 64,
    depth_px_scale: float = 10000.0,
    seed: int = 0,
) -> str:
    """Synthetic partial-pc fixture with the pre-rendered scene layout.

    Layout (matching `acronym_partial_pointclouds.py:663-776`):
    ``{root}/{split}/scene_{id}/scene_{id}_cam_{k}.png`` (uint16 depth) +
    ``{root}/{split}/scene_{id}/{id}.npz`` with grasps/renders/obj_path.
    Depth images contain a synthetic blob in front of the camera.
    """
    import cv2

    rng = np.random.default_rng(seed)
    for s in range(num_scenes):
        scene_dir = os.path.join(root, split, f"scene_{s}")
        os.makedirs(scene_dir, exist_ok=True)

        G = grasps_per_scene
        quats = Rotation.random(G, random_state=seed + s)
        H = np.tile(np.eye(4), (G, 1, 1))
        H[:, :3, :3] = quats.as_matrix()
        H[:, :3, 3] = rng.normal([0, 0, 0.6], 0.03, size=(G, 3))
        success = np.ones(G, np.int64)
        success[G // 2 :] = (rng.random(G - G // 2) > 0.4).astype(np.int64)

        cam_poses = {}
        for k in range(cams_per_scene):
            cam_poses[str(k)] = np.eye(4)
            # gaussian bump depth image around the principal point
            h, w = 480, 640
            ys, xs = np.mgrid[0:h, 0:w]
            r2 = ((xs - 320) / 60.0) ** 2 + ((ys - 240) / 60.0) ** 2
            depth = np.where(r2 < 1.0, 0.6 - 0.05 * np.sqrt(1 - np.minimum(r2, 1)), 0.0)
            depth_png = (depth * depth_px_scale).astype(np.uint16)
            cv2.imwrite(
                os.path.join(scene_dir, f"scene_{s}_cam_{k}.png"), depth_png
            )

        np.savez(
            os.path.join(scene_dir, f"{s}.npz"),
            grasps={
                "transforms": H,
                "success": success,
                "qualities": {
                    "force_closure": rng.random(G),
                    "torque": rng.random(G),
                },
            },
            renders={"cam_poses": cam_poses},
            obj_path=f"meshes/synthetic/{s}.obj",
        )
    return root
