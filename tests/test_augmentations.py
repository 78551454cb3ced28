"""Host-side augmentations vs the reference contracts
(`grasp_ldm/dataset/augmentations.py`)."""

import numpy as np
import pytest

from graspldm_tpu.data.augmentations import (
    AugmentationPipeline,
    PointcloudJitter,
    RandomPointcloudDropout,
    RandomRotation,
    RandomRotationPerGrasp,
    RandomRotationTransform,
    RandomTinyPosePerturbation,
    build_augmentations,
)
from graspldm_tpu.data.augmentations import _H_to_tmrp_np, _tmrp_to_H_np


def _rand_pose_batch(rng, n):
    t = rng.standard_normal((n, 3)).astype(np.float32)
    mrp = (rng.random((n, 3)).astype(np.float32) - 0.5) * 0.8
    return np.concatenate([t, mrp], axis=-1)


def test_random_rotation_joint_consistency():
    """pc and grasps rotate by the SAME matrix: relative geometry between
    any grasp origin and any point is invariant (reference `:114-153`)."""
    rng = np.random.default_rng(0)
    aug = RandomRotation(p=1.0, max_angle=180.0)
    pc = rng.standard_normal((64, 3)).astype(np.float32)
    grasps = _rand_pose_batch(rng, 10)
    pc2, grasps2 = aug(pc, grasps, rng)

    d_before = np.linalg.norm(pc[None, :, :] - grasps[:, None, :3], axis=-1)
    d_after = np.linalg.norm(pc2[None, :, :] - grasps2[:, None, :3], axis=-1)
    np.testing.assert_allclose(d_after, d_before, atol=1e-4)
    # actually rotated
    assert np.abs(pc2 - pc).max() > 1e-3


def test_random_rotation_p0_identity():
    rng = np.random.default_rng(1)
    aug = RandomRotation(p=0.0)
    pc = rng.standard_normal((16, 3)).astype(np.float32)
    grasps = _rand_pose_batch(rng, 4)
    pc2, grasps2 = aug(pc, grasps, rng)
    np.testing.assert_array_equal(pc2, pc)
    np.testing.assert_array_equal(grasps2, grasps)


def test_jitter_clipped_and_shape():
    rng = np.random.default_rng(2)
    aug = PointcloudJitter(p=1.0, sigma=0.05, clip=0.02)
    pc = np.zeros((128, 3), np.float32)
    pc2 = aug(pc, rng)
    assert pc2.shape == pc.shape
    assert np.abs(pc2).max() <= 0.02 + 1e-7
    assert np.abs(pc2).max() > 0.0


def test_dropout_replaces_with_first_point():
    """Dropped points become copies of point 0 — static shape (reference
    `:240-269`)."""
    rng = np.random.default_rng(3)
    aug = RandomPointcloudDropout(p=1.0, max_dropout_ratio=0.9)
    pc = np.arange(300, dtype=np.float32).reshape(100, 3)
    pc2 = aug(pc, rng)
    assert pc2.shape == pc.shape
    changed = np.any(pc2 != pc, axis=-1)
    assert changed.any()
    np.testing.assert_array_equal(pc2[changed], np.tile(pc[0], (changed.sum(), 1)))


def test_tiny_perturbation_shared_6vector():
    """Reference `:156-168`: ONE U(-max, max) 6-vector added to every
    grasp (translation AND mrp components)."""
    rng = np.random.default_rng(4)
    aug = RandomTinyPosePerturbation(max_perturb=0.005)
    grasps = _rand_pose_batch(rng, 8)
    out = aug(grasps, rng)
    delta = out - grasps
    # same delta for every grasp, bounded, and touching all 6 dims
    # float32 addition rounding makes the recovered deltas differ per grasp
    # at the last ulp
    np.testing.assert_allclose(delta, np.tile(delta[0], (8, 1)), atol=1e-6)
    assert np.abs(delta).max() <= 0.005
    assert np.abs(delta[0]).min() > 0.0


def test_per_grasp_rotation_local_frame():
    """Selected grasps rotate in their own frame: translations unchanged,
    rotation columns changed; unselected grasps untouched."""
    rng = np.random.default_rng(5)
    aug = RandomRotationPerGrasp(p=0.5, max_angle=180.0)
    grasps = _rand_pose_batch(rng, 10)
    out = aug(grasps, rng)
    np.testing.assert_allclose(out[:, :3], grasps[:, :3], atol=1e-5)
    changed = np.abs(out[:, 3:] - grasps[:, 3:]).max(axis=-1) > 1e-5
    assert changed.sum() == 5  # int(p * b) grasps selected
    # still valid rotations
    H = _tmrp_to_H_np(out)
    RtR = np.einsum("bij,bik->bjk", H[:, :3, :3], H[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)


def test_stateful_transform_constant_until_reset():
    rng = np.random.default_rng(6)
    aug = RandomRotationTransform(p=1.0, max_angle=90.0)
    with pytest.raises(RuntimeError):
        aug.apply(np.zeros((4, 3)))
    aug.reset(rng)
    x = rng.standard_normal((32, 3)).astype(np.float64)
    a1 = aug.apply(x)
    a2 = aug.apply(x)  # same transform until reset
    np.testing.assert_array_equal(a1, a2)
    T1 = aug.transform.copy()
    aug.reset(rng)
    assert np.abs(aug.transform - T1).max() > 1e-6

    # homogeneous input round-trips consistently with the [..., 3] path
    xh = np.concatenate([x, np.ones((32, 1))], axis=-1)
    np.testing.assert_allclose(aug.apply(xh)[:, :3], aug.apply(x), atol=1e-12)


def test_stateful_transform_pose_consistency():
    """apply_to_poses matches apply on points: transforming the gripper
    origin via the pose equals transforming it as a point."""
    rng = np.random.default_rng(7)
    aug = RandomRotationTransform(p=1.0)
    aug.reset(rng)
    grasps = _rand_pose_batch(rng, 6).astype(np.float64)
    H = _tmrp_to_H_np(grasps)
    H2 = aug.apply_to_poses(H)
    np.testing.assert_allclose(H2[:, :3, 3], aug.apply(H[:, :3, 3]), atol=1e-12)
    # local offsets are preserved: H2 rotates a gripper keypoint exactly as
    # the point path rotates the world-frame keypoint
    kp_local = np.array([0.0, 0.02, 0.08, 1.0])
    world = (H @ kp_local)[:, :3]
    world2 = (H2 @ kp_local)[:, :3]
    np.testing.assert_allclose(world2, aug.apply(world), atol=1e-12)


def test_pipeline_routes_stateful_transform():
    rng = np.random.default_rng(8)
    pipe = build_augmentations(
        [dict(type="RandomRotationTransform", args=dict(p=1.0))]
    )
    assert isinstance(pipe, AugmentationPipeline)
    pc = rng.standard_normal((32, 3)).astype(np.float32)
    grasps = _rand_pose_batch(rng, 5)
    pc2, grasps2 = pipe(pc, grasps, rng)
    assert pc2.shape == pc.shape and grasps2.shape == grasps.shape
    # joint consistency, as for RandomRotation
    d_before = np.linalg.norm(pc[None] - grasps[:, None, :3], axis=-1)
    d_after = np.linalg.norm(pc2[None] - grasps2[:, None, :3], axis=-1)
    np.testing.assert_allclose(d_after, d_before, atol=1e-4)
    assert np.abs(pc2 - pc).max() > 1e-3
