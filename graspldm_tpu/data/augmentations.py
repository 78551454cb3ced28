"""Host-side data augmentations (numpy).

Rebuild of `grasp_ldm/dataset/augmentations.py:114-353`: joint SO(3) rotation
of cloud + grasps, per-point jitter, random dropout (dropped points replaced
by the first point so shapes stay static — a gift for XLA), tiny pose
perturbations. Augmentations run on host in the input pipeline; each declares
whether it transforms the pc, the grasps, or both, and the pipeline dispatches
accordingly (`augmentations.py:16-29,300-353`).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from scipy.spatial.transform import Rotation

from ..config import AUGMENTATIONS

__all__ = [
    "BaseAugmentation",
    "RandomRotation",
    "RandomRotationPerGrasp",
    "RandomRotationTransform",
    "PointcloudJitter",
    "RandomPointcloudDropout",
    "RandomTinyPosePerturbation",
    "AugmentationPipeline",
    "build_augmentations",
]


def _tmrp_to_H_np(tmrp: np.ndarray) -> np.ndarray:
    H = np.tile(np.eye(4, dtype=tmrp.dtype), (tmrp.shape[0], 1, 1))
    H[:, :3, 3] = tmrp[:, :3]
    H[:, :3, :3] = Rotation.from_mrp(tmrp[:, 3:6]).as_matrix()
    return H


def _H_to_tmrp_np(H: np.ndarray) -> np.ndarray:
    mrp = Rotation.from_matrix(H[:, :3, :3]).as_mrp()
    return np.concatenate([H[:, :3, 3], mrp], axis=-1).astype(H.dtype)


class BaseAugmentation:
    transforms_pc = False
    transforms_grasps = False
    # stateful "general" augmentations (the reference's
    # BaseGeneralAugmentation family) draw ONE transform per sample via
    # reset(rng) and expose apply(pc) / apply_to_poses(H) so the pipeline
    # can apply it jointly to the cloud and the grasp poses
    is_stateful = False


@AUGMENTATIONS.register
class RandomRotation(BaseAugmentation):
    """Joint random rotation of pc and grasp poses. Reference `:114-153`."""

    transforms_pc = True
    transforms_grasps = True

    def __init__(self, p: float = 0.5, max_angle: float = 180.0, is_degree: bool = True):
        self.p = p
        self.max_angle = np.radians(max_angle) if is_degree else max_angle

    def __call__(
        self, pc: np.ndarray, grasps: np.ndarray, rng: np.random.Generator
    ) -> Tuple[np.ndarray, np.ndarray]:
        if rng.random() >= self.p:
            return pc, grasps
        axis = rng.random(3)
        axis /= np.linalg.norm(axis)
        angle = rng.random() * self.max_angle
        R = Rotation.from_rotvec(axis * angle).as_matrix().astype(pc.dtype)
        pc = pc @ R.T
        H = _tmrp_to_H_np(grasps)
        H4 = np.eye(4, dtype=pc.dtype)
        H4[:3, :3] = R
        return pc, _H_to_tmrp_np(H4[None] @ H)


@AUGMENTATIONS.register
class PointcloudJitter(BaseAugmentation):
    """Clipped gaussian per-point jitter. Reference `:214-237`."""

    transforms_pc = True

    def __init__(self, p: float = 0.5, sigma: float = 0.01, clip: float = 0.05):
        self.p = p
        self.sigma = abs(sigma)
        self.clip = clip

    def __call__(self, pc: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.random() >= self.p:
            return pc
        jitter = np.clip(
            self.sigma * rng.standard_normal(pc.shape), -self.clip, self.clip
        ).astype(pc.dtype)
        return pc + jitter


@AUGMENTATIONS.register
class RandomPointcloudDropout(BaseAugmentation):
    """Random dropout replacing dropped points with the first point.

    Reference `:240-269` — keeps the point count static.
    """

    transforms_pc = True

    def __init__(self, p: float = 0.7, max_dropout_ratio: float = 0.6):
        self.p = p
        self.max_dropout_ratio = max_dropout_ratio

    def __call__(self, pc: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.random() >= self.p:
            return pc
        n = pc.shape[-2]
        out = pc.copy()
        ratio = rng.random() * self.max_dropout_ratio
        k = int(ratio * n)
        if k > 0:
            drop = rng.permutation(n)[:k]
            out[..., drop, :] = out[..., 0:1, :]
        return out


@AUGMENTATIONS.register
class RandomTinyPosePerturbation(BaseAugmentation):
    """Tiny uniform perturbation of grasp tmrp poses. Reference `:156-168`:
    ONE shared U(-max, max) 6-vector added to every grasp in the batch
    (both the translation and the MRP rotation components)."""

    transforms_grasps = True

    def __init__(self, max_perturb: float = 0.005):
        self.max_perturb = max_perturb

    def __call__(self, grasps: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        noise = (rng.random(6) * 2 - 1) * self.max_perturb
        return grasps + noise.astype(grasps.dtype)


@AUGMENTATIONS.register
class RandomRotationPerGrasp(BaseAugmentation):
    """Independent random rotation of a subset of grasp poses.

    Reference `:171-208` — there it is unused and broken (shape-mismatched
    tuple unpack, per-grasp H applied to one shared pc). This implements
    the intended semantics of its grasp side, ``H_g' = H_g @ H_rot``
    (`:203`): each selected grasp is rotated IN ITS OWN FRAME, so positions
    stay put and orientations randomize locally. The point cloud is left
    unchanged — one shared cloud cannot consistently follow per-grasp
    rotations, which is the reference bug this version does not reproduce.
    """

    transforms_grasps = True

    def __init__(self, p: float = 0.5, max_angle: float = 180.0,
                 is_degree: bool = True):
        self.p = p
        self.max_angle = np.radians(max_angle) if is_degree else max_angle

    def __call__(self, grasps: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        b = grasps.shape[0]
        n_sel = int(self.p * b)
        if n_sel == 0:
            return grasps
        sel = rng.permutation(b)[:n_sel]
        axes = rng.standard_normal((n_sel, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        angles = rng.random(n_sel) * self.max_angle
        R = Rotation.from_rotvec(axes * angles[:, None]).as_matrix()
        H = _tmrp_to_H_np(grasps)
        H_rot = np.tile(np.eye(4, dtype=grasps.dtype), (n_sel, 1, 1))
        H_rot[:, :3, :3] = R.astype(grasps.dtype)
        H[sel] = H[sel] @ H_rot
        return _H_to_tmrp_np(H)


@AUGMENTATIONS.register
class RandomRotationTransform(BaseAugmentation):
    """Stateful random rotation, constant between ``reset()`` calls.

    Reference `:56-109` (``BaseGeneralAugmentation``): sample one rotation
    (probability ``p``, angle <= ``max_angle``) at ``reset``, then apply
    the SAME transform to any number of inputs — used when several arrays
    (e.g. a scene's clouds and its grasp sets) must rotate together.
    ``apply`` accepts ``[..., 3]`` points or ``[..., 4]`` homogeneous rows
    (row-vector convention ``x @ H``, matching the reference); pose
    matrices go through :meth:`apply_to_poses`, and tmrp grasp batches are
    routed there by :class:`AugmentationPipeline` (which calls ``reset``
    once per sample — the reference never wired this class into its
    pipeline, leaving it dead code)."""

    transforms_pc = True
    transforms_grasps = True
    is_stateful = True

    def __init__(self, p: float = 0.5, max_angle: float = 180.0,
                 is_degree: bool = True):
        self.p = p
        self.max_angle = np.radians(max_angle) if is_degree else max_angle
        self.transform: Optional[np.ndarray] = None

    def reset(self, rng: np.random.Generator) -> None:
        H = np.eye(4)
        if rng.random() < self.p:
            axis = rng.standard_normal(3)
            axis /= np.linalg.norm(axis)
            angle = rng.random() * self.max_angle
            H[:3, :3] = Rotation.from_rotvec(axis * angle).as_matrix()
        self.transform = H

    def apply(self, x: np.ndarray) -> np.ndarray:
        if self.transform is None:
            raise RuntimeError("call reset(rng) before apply()")
        if x.shape[-1] == 3:
            return (x @ self.transform[:3, :3]).astype(x.dtype)
        if x.shape[-1] == 4:
            return (x @ self.transform).astype(x.dtype)
        raise ValueError(
            f"expected [..., 3] points or [..., 4] homogeneous, got {x.shape}"
        )

    def apply_to_poses(self, H_poses: np.ndarray) -> np.ndarray:
        """World-rotate 4x4 poses consistently with :meth:`apply`.

        ``apply`` maps row-vector points ``x -> x @ T``; in column
        convention that is ``x' = T^T x``, so poses update as
        ``H' = T^T @ H``.
        """
        if self.transform is None:
            raise RuntimeError("call reset(rng) before apply_to_poses()")
        return (self.transform.T.astype(H_poses.dtype) @ H_poses)

    __call__ = apply


class AugmentationPipeline:
    """Applies a sequence of augmentations, routing pc/grasp transforms."""

    def __init__(self, augs: Sequence[BaseAugmentation]):
        self.augs = list(augs)

    def __call__(
        self, pc: np.ndarray, grasps: np.ndarray, rng: np.random.Generator
    ) -> Tuple[np.ndarray, np.ndarray]:
        for aug in self.augs:
            if aug.is_stateful:
                # stateful general augmentation: one transform per sample,
                # applied jointly to the cloud and the grasp poses
                aug.reset(rng)
                pc = aug.apply(pc)
                grasps = _H_to_tmrp_np(
                    aug.apply_to_poses(_tmrp_to_H_np(grasps))
                )
            elif aug.transforms_pc and aug.transforms_grasps:
                pc, grasps = aug(pc, grasps, rng)
            elif aug.transforms_pc:
                pc = aug(pc, rng)
            elif aug.transforms_grasps:
                grasps = aug(grasps, rng)
        return pc, grasps


def build_augmentations(augs_config: Optional[List[dict]]) -> AugmentationPipeline:
    if not augs_config:
        return AugmentationPipeline([])
    augs = []
    for cfg in augs_config:
        cls = AUGMENTATIONS.get(cfg["type"])
        augs.append(cls(**cfg.get("args", {})))
    return AugmentationPipeline(augs)
