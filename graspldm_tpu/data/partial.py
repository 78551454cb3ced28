"""Partial (depth-rendered) point-cloud dataset.

Rebuild of `grasp_ldm/dataset/acronym/acronym_partial_pointclouds.py:26-824`:
pre-rendered scenes live as
``{root}/{split}/scene_{id}/scene_{id}_cam_{k}.png`` (uint16 depth scaled by
``depth_px_scale``) plus ``{root}/{split}/scene_{id}/{id}.npz`` with a
``grasps`` dict (transforms/success/qualities), ``renders`` dict (cam_poses
keyed by camera index, optional visible_grasp_indices), and ``obj_path``.

Per item: back-project the depth image, random-subsample to N points,
transform grasps into the camera frame (``cam_pose @ H``), optionally mix
failed grasps with a randomized count, then the same center/normalize
pipeline as the full-pc dataset. Everything is preloaded to RAM.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
from scipy.spatial.transform import Rotation

from ..config import DATASETS
from ..utils.normalization import ROTATION_SCALE_FACTOR, TRANSLATION_SCALE_FACTOR
from .acronym import minmax_normalize
from .augmentations import build_augmentations
from .camera import PinholeCamera, depth_to_pointcloud_np

__all__ = ["AcronymPartialPointclouds"]


def _H_to_tmrp_np(H: np.ndarray) -> np.ndarray:
    if H.shape[0] == 0:
        return np.zeros((0, 6), np.float32)
    mrp = Rotation.from_matrix(H[:, :3, :3]).as_mrp()
    return np.concatenate([H[:, :3, 3], mrp], axis=-1).astype(np.float32)


def _read_depth_png(path: str, depth_px_scale: float) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path, -1)
    except ImportError:  # pragma: no cover
        from PIL import Image

        img = np.asarray(Image.open(path))
    return img.astype(np.float32) / depth_px_scale


@DATASETS.register
class AcronymPartialPointclouds:
    """Depth-rendered partial-view training dataset."""

    def __init__(
        self,
        data_root_dir: str,
        split: str = "train",
        camera: Optional[PinholeCamera] = None,
        camera_json: Optional[str] = None,
        num_points_per_pc: int = 1024,
        num_grasps_per_obj: int = 100,
        rotation_repr: str = "mrp",
        augs_config: Optional[List[dict]] = None,
        depth_px_scale: float = 10000.0,
        scene_prefix: str = "scene_",
        max_scenes: Optional[int] = None,
        num_pc_per_scene: Optional[int] = None,
        min_usable_pc_points: int = 1024,
        use_failed_grasps: bool = False,
        failed_grasp_ratio: float = 0.3,
        load_fixed_grasp_transforms=None,
        is_input_dataset_normalized: bool = False,
        preempt_load_data: bool = True,
        num_repeat_dataset: int = 2,
        seed: int = 0,
        return_region_metas: bool = False,
        num_regions: int = 4,
        region_num_points: int = 128,
    ):
        assert rotation_repr == "mrp"
        self.return_region_metas = return_region_metas
        self.num_regions = num_regions
        self.region_num_points = region_num_points
        self.data_dir = os.path.join(data_root_dir, split)
        self.num_points = num_points_per_pc
        self.num_grasps = num_grasps_per_obj
        self.use_failed = use_failed_grasps
        self.failed_ratio = failed_grasp_ratio
        self.num_repeat = num_repeat_dataset
        self.depth_px_scale = depth_px_scale
        self.scene_prefix = scene_prefix
        self.min_usable_pc_points = min_usable_pc_points
        self.augmentations = build_augmentations(augs_config)
        self._rng = np.random.default_rng(seed)
        if camera is None and camera_json and os.path.exists(camera_json):
            camera = PinholeCamera.from_json(camera_json)
        self.camera = camera or PinholeCamera.default_d435i()

        self.items: List[Dict] = []
        scene_dirs = sorted(
            glob.glob(os.path.join(self.data_dir, f"{scene_prefix}*"))
        )
        if max_scenes is not None:
            scene_dirs = scene_dirs[:max_scenes]
        for scene_dir in scene_dirs:
            self._load_scene(scene_dir, num_pc_per_scene)
        if not self.items:
            raise FileNotFoundError(
                f"No usable partial-pc scenes under {self.data_dir}"
            )

    # ---- loading ----

    def _load_scene(self, scene_dir: str, num_pc_per_scene: Optional[int]) -> None:
        scene_id = os.path.basename(scene_dir).split(self.scene_prefix)[-1]
        npz_path = os.path.join(scene_dir, f"{scene_id}.npz")
        depth_paths = sorted(
            glob.glob(
                os.path.join(scene_dir, f"{self.scene_prefix}{scene_id}_cam_*.png")
            )
        )
        if num_pc_per_scene is not None:
            depth_paths = depth_paths[:num_pc_per_scene]
        if not depth_paths or not os.path.isfile(npz_path):
            return

        npz = np.load(npz_path, allow_pickle=True)
        grasp_dict = npz["grasps"][()]
        render_data = npz["renders"][()]
        transforms = np.asarray(grasp_dict["transforms"], np.float64)
        if transforms.ndim != 3:
            return
        success = np.asarray(grasp_dict["success"])
        quality_dict = grasp_dict.get("qualities", {})

        for depth_fp in depth_paths:
            cam_idx = os.path.basename(depth_fp).split("cam_")[-1].split(".")[0]
            cam_poses = render_data["cam_poses"]
            cam_pose = np.asarray(
                cam_poses[cam_idx]
                if isinstance(cam_poses, dict)
                else cam_poses[int(cam_idx)],
                np.float64,
            )

            visible = None
            if "visible_grasp_indices" in render_data:
                vis = render_data["visible_grasp_indices"]
                visible = np.asarray(
                    vis[cam_idx] if isinstance(vis, dict) else vis[int(cam_idx)]
                )
                if visible.size == 0:
                    continue

            if visible is not None:
                good_mask = np.zeros(len(transforms), bool)
                good_mask[visible] = True
            else:
                good_mask = success > 0
            if good_mask.sum() < self.num_grasps:
                continue

            quals = (
                np.stack(
                    [
                        np.asarray(v)
                        for k, v in sorted(quality_dict.items())
                        if k != "object_in_gripper"
                    ],
                    axis=-1,
                )
                if quality_dict
                else np.zeros((len(transforms), 0))
            )

            depth = _read_depth_png(depth_fp, self.depth_px_scale)
            pc_cam = depth_to_pointcloud_np(depth, self.camera)
            if pc_cam.shape[0] < self.min_usable_pc_points:
                continue

            H_cam = cam_pose[None] @ transforms
            self.items.append(
                dict(
                    pc=pc_cam.astype(np.float32),
                    grasps=_H_to_tmrp_np(H_cam[good_mask]),
                    grasp_qualities=(
                        minmax_normalize(-quals[good_mask]).astype(np.float32)
                        if quals.shape[-1]
                        else quals[good_mask].astype(np.float32)
                    ),
                    failed_grasps=_H_to_tmrp_np(H_cam[~good_mask]),
                    failed_grasp_qualities=(
                        minmax_normalize(-quals[~good_mask]).astype(np.float32)
                        if quals.shape[-1]
                        else quals[~good_mask].astype(np.float32)
                    ),
                )
            )

    # ---- item assembly ----

    def __len__(self) -> int:
        return len(self.items) * self.num_repeat

    @property
    def num_qualities(self) -> int:
        return self.items[0]["grasp_qualities"].shape[-1]

    def _mix_good_and_bad_grasps(
        self, rec: Dict, rng: np.random.Generator
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Randomized failed-grasp mixing
        (`acronym_partial_pointclouds.py:334-385`)."""
        G = self.num_grasps
        n_bad = 0
        if self.use_failed and len(rec["failed_grasps"]):
            n_bad = int(rng.integers(0, int(G * self.failed_ratio) + 1))
            n_bad = min(n_bad, len(rec["failed_grasps"]))
        n_good = G - n_bad

        gi = rng.choice(
            len(rec["grasps"]), size=n_good, replace=len(rec["grasps"]) < n_good
        )
        tmrp = rec["grasps"][gi]
        quals = rec["grasp_qualities"][gi]
        success = np.ones((n_good,), np.float32)
        if n_bad:
            bi = rng.choice(len(rec["failed_grasps"]), size=n_bad, replace=False)
            tmrp = np.concatenate([tmrp, rec["failed_grasps"][bi]])
            quals = np.concatenate([quals, rec["failed_grasp_qualities"][bi]])
            success = np.concatenate([success, np.zeros((n_bad,), np.float32)])
        perm = rng.permutation(G)
        return tmrp[perm], success[perm], quals[perm]

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rec = self.items[index % len(self.items)]
        rng = self._rng

        pc_full = rec["pc"]
        sel = rng.permutation(pc_full.shape[0])[: self.num_points]
        if len(sel) < self.num_points:  # pad by resampling
            extra = rng.integers(0, pc_full.shape[0], self.num_points - len(sel))
            sel = np.concatenate([sel, extra])
        pc = pc_full[sel].copy()

        tmrp, success, quals = self._mix_good_and_bad_grasps(rec, rng)
        tmrp = tmrp.copy()

        pc, tmrp = self.augmentations(pc, tmrp, rng)

        pc_mean = pc.mean(axis=0)
        pc = (pc - pc_mean) / TRANSLATION_SCALE_FACTOR
        tmrp[:, :3] = (tmrp[:, :3] - pc_mean) / TRANSLATION_SCALE_FACTOR
        tmrp[:, 3:6] = tmrp[:, 3:6] / ROTATION_SCALE_FACTOR

        grasps = np.concatenate([tmrp, success[:, None]], axis=-1)
        if quals.shape[-1]:
            grasps = np.concatenate([grasps, quals], axis=-1)

        metas = {
            "pc_mean": pc_mean.astype(np.float32),
            "pc_std": np.full((3,), TRANSLATION_SCALE_FACTOR, np.float32),
            "grasp_mean": np.concatenate(
                [pc_mean, np.zeros(3)]
            ).astype(np.float32),
            "grasp_std": np.array(
                [TRANSLATION_SCALE_FACTOR] * 3 + [ROTATION_SCALE_FACTOR] * 3,
                np.float32,
            ),
        }
        if self.return_region_metas:
            from .acronym import compute_pc_regions

            region_pts, seeds = compute_pc_regions(
                pc.astype(np.float32), self.num_regions,
                self.region_num_points, rng,
            )
            d = np.linalg.norm(tmrp[:, None, :3] - seeds[None, :, :], axis=-1)
            metas["region_points"] = region_pts
            metas["grasp_region_labels"] = d.argmin(axis=1).astype(np.int32)
        return {
            "pc": pc.astype(np.float32),
            "grasps": grasps.astype(np.float32),
            "metas": metas,
        }

    def worker_copy(self, seed: int) -> "AcronymPartialPointclouds":
        """Shallow copy with an independent RNG for one loader-worker
        thread (see `AcronymShapenetPointclouds.worker_copy`)."""
        import copy

        c = copy.copy(self)
        c._rng = np.random.default_rng(seed)
        return c

    def batches(
        self, batch_size: int, *, shuffle: bool = True
    ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self))
        if shuffle:
            self._rng.shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            items = [self[int(i)] for i in order[start : start + batch_size]]
            yield {
                "pc": np.stack([it["pc"] for it in items]),
                "grasps": np.stack([it["grasps"] for it in items]),
                "metas": {
                    k: np.stack([it["metas"][k] for it in items])
                    for k in items[0]["metas"]
                },
            }
