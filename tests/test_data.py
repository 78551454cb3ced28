"""Data pipeline tests on the synthetic ACRONYM fixture."""

import numpy as np
import pytest

from graspldm_tpu.data import (
    AcronymShapenetPointclouds,
    Mesh,
    load_obj,
    make_synthetic_acronym,
)
from graspldm_tpu.data.camera import PinholeCamera, depth_to_pointcloud_np
from graspldm_tpu.utils.normalization import (
    ROTATION_SCALE_FACTOR,
    TRANSLATION_SCALE_FACTOR,
)


@pytest.fixture(scope="module")
def acronym_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("acronym")
    return make_synthetic_acronym(str(root))


class TestMesh:
    def test_obj_roundtrip_and_sampling(self, acronym_root):
        import glob

        obj = glob.glob(f"{acronym_root}/meshes/*/*.obj")[0]
        mesh = load_obj(obj)
        assert mesh.vertices.shape[1] == 3
        assert mesh.faces.shape == (12, 3)
        pts = mesh.sample(256, np.random.default_rng(0))
        assert pts.shape == (256, 3)
        # samples lie within the bounding box
        lo, hi = mesh.vertices.min(0), mesh.vertices.max(0)
        assert np.all(pts >= lo - 1e-5) and np.all(pts <= hi + 1e-5)

    def test_area_weighting(self):
        # two triangles, one 100x larger: most samples land on it
        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [10, 10, 0], [20, 10, 0], [10, 20, 0]],
            float,
        )
        faces = np.array([[0, 1, 2], [3, 4, 5]])
        mesh = Mesh(verts, faces)
        pts = mesh.sample(500, np.random.default_rng(1))
        frac_big = np.mean(pts[:, 0] > 5)
        assert frac_big > 0.95


class TestAcronymDataset:
    def test_item_shapes_and_normalization(self, acronym_root):
        ds = AcronymShapenetPointclouds(
            acronym_root,
            split="train",
            batch_num_points_per_pc=128,
            batch_num_grasps_per_pc=16,
            batch_failed_grasps_ratio=0.25,
            min_num_grasps=4,
            num_repeat_dataset=2,
        )
        assert len(ds) == 2 * len(ds.objects)
        item = ds[0]
        assert item["pc"].shape == (128, 3)
        assert item["grasps"].shape == (16, 7 + ds.num_qualities)
        # pc is centered before scaling: mean ~ 0
        np.testing.assert_allclose(item["pc"].mean(0), 0.0, atol=1e-3)
        # success flags are 0/1
        flags = item["grasps"][:, 6]
        assert set(np.unique(flags)).issubset({0.0, 1.0})
        # unnormalization round trip
        m = item["metas"]
        t_un = item["grasps"][:, :3] * m["grasp_std"][:3] + m["grasp_mean"][:3]
        assert np.abs(t_un).max() < 1.0  # plausible metric scale

    def test_failed_ratio_zero_gives_all_success(self, acronym_root):
        ds = AcronymShapenetPointclouds(
            acronym_root,
            split="train",
            batch_num_points_per_pc=64,
            batch_num_grasps_per_pc=8,
            batch_failed_grasps_ratio=0.0,
            min_num_grasps=4,
        )
        item = ds[1]
        assert np.all(item["grasps"][:, 6] == 1.0)

    def test_batching(self, acronym_root):
        ds = AcronymShapenetPointclouds(
            acronym_root,
            split="train",
            batch_num_points_per_pc=64,
            batch_num_grasps_per_pc=8,
            min_num_grasps=4,
            num_repeat_dataset=4,
        )
        batches = list(ds.batches(2))
        assert len(batches) >= 1
        b = batches[0]
        assert b["pc"].shape == (2, 64, 3)
        assert b["grasps"].shape[0] == 2
        assert b["metas"]["grasp_std"].shape == (2, 6)

    def test_split_filtering(self, acronym_root):
        train = AcronymShapenetPointclouds(
            acronym_root, split="train", min_num_grasps=4
        )
        test = AcronymShapenetPointclouds(acronym_root, split="test", min_num_grasps=4)
        train_paths = {o.mesh_path for o in train.objects}
        test_paths = {o.mesh_path for o in test.objects}
        assert train_paths.isdisjoint(test_paths)


class TestCamera:
    def test_depth_backprojection(self):
        cam = PinholeCamera.default_d435i()
        depth = np.zeros((480, 640), np.float32)
        depth[240, 320] = 1.0  # principal point at 1m -> (0, 0, 1)
        depth[0, 0] = 2.0
        pc = depth_to_pointcloud_np(depth, cam)
        assert pc.shape == (2, 3)
        center = pc[np.argmin(np.abs(pc[:, 2] - 1.0))]
        np.testing.assert_allclose(center, [0, 0, 1], atol=1e-5)

    def test_gripper_control_points_match_reference_serialization(self):
        import json
        import os

        from graspldm_tpu.utils.gripper import gripper_control_points

        ref_json = "/root/reference/grasp_ldm/dataset/acronym/gripper_ctrl_pts.json"
        pts = gripper_control_points()
        assert pts.shape == (44, 3)
        if os.path.exists(ref_json):
            ref = np.array(json.load(open(ref_json)), np.float32)
            np.testing.assert_allclose(pts, ref, atol=1e-6)
