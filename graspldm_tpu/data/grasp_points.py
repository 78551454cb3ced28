"""Classifier datasets: grasp poses -> labeled gripper point clouds.

Rebuild of `grasp_ldm/dataset/acronym/acronym_grasp_points.py:17-448`:
each candidate grasp is rendered as a gripper-keypoint cloud transformed by
its pose; negatives mix (a) annotated failed grasps and (b) "bogus" grasps —
free-space (gripper pulled away along its approach), colliding (pushed into
the object), and randomly perturbed poses (`get_bogus_grasps`, `:165-238`).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np
from scipy.spatial.transform import Rotation

from ..config import DATASETS
from ..utils.gripper import SimplePandaGripper, gripper_control_points
from .acronym import AcronymShapenetPointclouds

__all__ = [
    "gripper_surface_points",
    "AcronymGraspPointsDataset",
    "AcronymPartialGraspPointsDataset",
]


def gripper_surface_points(num_points: int = 76) -> np.ndarray:
    """``[num_points, 3]`` points spread along the gripper wireframe.

    Functional equivalent of the reference's serialized
    ``data/gripper/gripper_points_76.npy`` (`acronym_grasp_points.py:292`):
    evenly spaced samples along the open-gripper segments, allocated
    proportionally to segment length.
    """
    segs = [np.asarray(s, np.float64) for s in SimplePandaGripper.open_segments()]
    lengths = np.array([np.linalg.norm(b - a) for a, b in segs])
    alloc = np.maximum(
        np.round(lengths / lengths.sum() * num_points).astype(int), 2
    )
    while alloc.sum() > num_points:
        alloc[np.argmax(alloc)] -= 1
    while alloc.sum() < num_points:
        alloc[np.argmax(lengths)] += 1
    pts = []
    for (a, b), n in zip(segs, alloc):
        t = np.linspace(0.0, 1.0, n)[:, None]
        pts.append(a[None] * (1 - t) + b[None] * t)
    return np.concatenate(pts, 0).astype(np.float32)


def _tmrp_to_H(tmrp: np.ndarray) -> np.ndarray:
    H = np.tile(np.eye(4, dtype=np.float32), (tmrp.shape[0], 1, 1))
    H[:, :3, 3] = tmrp[:, :3]
    H[:, :3, :3] = Rotation.from_mrp(tmrp[:, 3:6]).as_matrix().astype(np.float32)
    return H


def _transform_points(H: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """``H [G, 4, 4]``, ``pts [P, 3]`` -> ``[G, P, 3]``."""
    pts_h = np.concatenate([pts, np.ones((len(pts), 1), pts.dtype)], -1)
    return np.einsum("gij,pj->gpi", H, pts_h)[..., :3]


@DATASETS.register
class AcronymGraspPointsDataset:
    """Wraps a pointcloud dataset into classifier training items.

    Item: ``pc [N, 3]``, ``grasp_points [G, P, 3]``, ``labels [G]``.

    Any base dataset yielding the framework item schema (``pc``/``grasps``/
    ``metas`` with per-object normalization stats) works — pass it as
    ``base``. Without one, the full-pc ACRONYM dataset is built from the
    remaining kwargs (the reference's AcronymFullPcGraspPointsClassification,
    `acronym_grasp_points.py:275-374`); see
    :class:`AcronymPartialGraspPointsDataset` for the partial-pc wrap.
    """

    def __init__(
        self,
        data_root_dir: Optional[str] = None,
        split: str = "train",
        num_gripper_points: int = 76,
        bogus_grasp_fraction: float = 0.3,
        batch_num_points_per_pc: int = 1024,
        batch_num_grasps_per_pc: int = 20,
        batch_failed_grasps_ratio: float = 0.3,
        seed: int = 0,
        base=None,
        **base_kwargs,
    ):
        if base is None:
            if data_root_dir is None:
                raise ValueError("data_root_dir is required without `base`")
            base = AcronymShapenetPointclouds(
                data_root_dir=data_root_dir,
                split=split,
                batch_num_points_per_pc=batch_num_points_per_pc,
                batch_num_grasps_per_pc=batch_num_grasps_per_pc,
                batch_failed_grasps_ratio=batch_failed_grasps_ratio,
                seed=seed,
                **base_kwargs,
            )
        self.base = base
        self.gripper_points = gripper_surface_points(num_gripper_points)
        self.bogus_fraction = bogus_grasp_fraction
        self._rng = np.random.default_rng(seed + 1)

    def worker_copy(self, seed: int) -> "AcronymGraspPointsDataset":
        """Shallow copy with independent RNGs (self + base) for one
        loader-worker thread (`parallel/workers.py`)."""
        import copy

        c = copy.copy(self)
        c._rng = np.random.default_rng(seed + 1)
        c.base = self.base.worker_copy(seed)
        return c

    def __len__(self) -> int:
        return len(self.base)

    def _bogus_grasp_points(
        self, pc: np.ndarray, tmrp: np.ndarray, num_bogus: int,
        fraction_perturbed: float = 0.5,
    ) -> np.ndarray:
        """Free-space / colliding / perturbed negatives (`:165-238`)."""
        rng = self._rng
        H = _tmrp_to_H(tmrp[:num_bogus])
        bottom = np.asarray(SimplePandaGripper.BOTTOM_CENTER, np.float32)
        pull = self.gripper_points - bottom  # free-space
        push = self.gripper_points + bottom  # colliding

        n_pert = int(num_bogus * fraction_perturbed)
        pert_idx = rng.permutation(num_bogus)[:n_pert]
        pc_size = pc.max(0) - pc.min(0)
        H_aug = np.tile(np.eye(4, dtype=np.float32), (num_bogus, 1, 1))
        if n_pert:
            H_aug[pert_idx, :3, :3] = (
                Rotation.random(n_pert, random_state=int(rng.integers(1 << 30)))
                .as_matrix()
                .astype(np.float32)
            )
            H_aug[pert_idx, :3, 3] = (
                rng.random((n_pert, 3)).astype(np.float32) * pc_size / 3
            )

        choice = rng.integers(0, 2, size=num_bogus)
        out = np.empty((num_bogus, len(self.gripper_points), 3), np.float32)
        for variant, pts in ((0, pull), (1, push)):
            sel = choice == variant
            if sel.any():
                out[sel] = _transform_points(H[sel] @ H_aug[sel], pts)
        return out

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        item = self.base[index]
        pc = item["pc"]
        grasps = item["grasps"]
        metas = item["metas"]
        labels = grasps[:, 6]

        # The gripper keypoints are METRIC geometry, so the gripper clouds
        # must be built from metric poses and only then normalized with the
        # SAME pc stats — matching the reference pipeline, which transforms
        # gripper points with raw poses before `preprocess_data` centers and
        # scales pc and grasp points together
        # (`acronym_grasp_points.py:23-127`). The base item's tmrp rows are
        # normalized (t/0.05, mrp/0.5): using them directly would rotate by
        # from_mrp(mrp/0.5) and mix a /0.05 translation frame with metric
        # gripper offsets — a ~20x scale mismatch.
        tmrp_metric = grasps[:, :6] * metas["grasp_std"] + metas["grasp_mean"]
        pc_metric = pc * metas["pc_std"] + metas["pc_mean"]
        grasp_points = _transform_points(
            _tmrp_to_H(tmrp_metric), self.gripper_points
        )

        n_bogus = int(self.bogus_fraction * len(tmrp_metric))
        if n_bogus > 0:
            bogus = self._bogus_grasp_points(pc_metric, tmrp_metric, n_bogus)
            grasp_points = np.concatenate([grasp_points, bogus], 0)
            labels = np.concatenate([labels, np.zeros((n_bogus,), np.float32)])
            perm = self._rng.permutation(len(labels))
            grasp_points = grasp_points[perm]
            labels = labels[perm]

        # normalize the gripper clouds into the pc's normalized frame
        grasp_points = (grasp_points - metas["pc_mean"]) / metas["pc_std"]
        return {
            "pc": pc,
            "grasp_points": grasp_points.astype(np.float32),
            "labels": labels,
        }

    def batches(self, batch_size: int, shuffle: bool = True) -> Iterator[Dict]:
        order = np.arange(len(self))
        if shuffle:
            self._rng.shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            items = [self[int(i)] for i in order[start : start + batch_size]]
            yield {
                "pc": np.stack([it["pc"] for it in items]),
                "grasp_points": np.stack([it["grasp_points"] for it in items]),
                "labels": np.stack([it["labels"] for it in items]),
            }


@DATASETS.register
class AcronymPartialGraspPointsDataset(AcronymGraspPointsDataset):
    """Partial-pc classifier dataset: depth-rendered scene pointclouds +
    labeled gripper clouds.

    Rebuild of the reference's AcronymPartialPcGraspPointsClassification
    (`acronym_grasp_points.py:377-448`): the same grasp-points item
    construction over the partial (depth-camera) pointcloud base, with the
    reference's 0.2 default bogus fraction.
    """

    def __init__(
        self,
        data_root_dir: str,
        split: str = "train",
        camera_json: Optional[str] = None,
        num_gripper_points: int = 76,
        bogus_grasp_fraction: float = 0.2,
        batch_num_points_per_pc: int = 1024,
        batch_num_grasps_per_pc: int = 20,
        batch_failed_grasps_ratio: float = 0.3,
        max_num_pc_per_scene: Optional[int] = 20,
        seed: int = 0,
        **base_kwargs,
    ):
        from .partial import AcronymPartialPointclouds

        use_failed = (
            batch_failed_grasps_ratio is not None
            and batch_failed_grasps_ratio > 0
        )
        # setdefault: configs may pass the partial base's own kwarg names
        # directly (e.g. a shared data.train.args block)
        base_kwargs.setdefault("num_points_per_pc", batch_num_points_per_pc)
        base_kwargs.setdefault("num_grasps_per_obj", batch_num_grasps_per_pc)
        base_kwargs.setdefault("use_failed_grasps", use_failed)
        base_kwargs.setdefault(
            "failed_grasp_ratio",
            batch_failed_grasps_ratio if use_failed else 0.0,
        )
        base_kwargs.setdefault("num_pc_per_scene", max_num_pc_per_scene)
        base = AcronymPartialPointclouds(
            data_root_dir=data_root_dir,
            split=split,
            camera_json=camera_json,
            seed=seed,
            **base_kwargs,
        )
        super().__init__(
            num_gripper_points=num_gripper_points,
            bogus_grasp_fraction=bogus_grasp_fraction,
            seed=seed,
            base=base,
        )
