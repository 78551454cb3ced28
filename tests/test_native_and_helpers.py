"""Native host-ops vs numpy/jax references + pointcloud helper tests."""

import numpy as np
import pytest

from graspldm_tpu.native import (
    available,
    depth_to_pointcloud_native,
    farthest_point_sample_native,
    sample_surface_native,
)
from graspldm_tpu.utils.pointcloud_helpers import (
    estimate_normals,
    farthest_point_sample_np,
    meshify_delaunay,
    regularize_pc_point_count,
)


needs_native = pytest.mark.skipif(not available(), reason="native lib unavailable")


class TestNative:
    @needs_native
    def test_fps_matches_jax_op(self):
        import jax.numpy as jnp

        from graspldm_tpu.ops import furthest_point_sample

        rng = np.random.default_rng(0)
        pts = rng.normal(size=(128, 3)).astype(np.float32)
        native = farthest_point_sample_native(pts, 32)
        device = np.asarray(furthest_point_sample(jnp.asarray(pts)[None], 32))[0]
        np.testing.assert_array_equal(native, device)

    @needs_native
    def test_surface_sampling_on_unit_square(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
        f = np.array([[0, 1, 2], [0, 2, 3]])
        pts = sample_surface_native(v, f, 2000, 7)
        assert pts.shape == (2000, 3)
        assert pts[:, 2].max() == 0.0
        assert 0 <= pts[:, 0].min() and pts[:, 0].max() <= 1
        # roughly uniform: mean near center
        np.testing.assert_allclose(pts.mean(0)[:2], [0.5, 0.5], atol=0.05)

    @needs_native
    def test_depth_backprojection_matches_numpy(self):
        from graspldm_tpu.data.camera import PinholeCamera, depth_to_pointcloud_np

        cam = PinholeCamera.default_d435i()
        rng = np.random.default_rng(1)
        depth = np.zeros((48, 64), np.float32)
        mask = rng.random((48, 64)) > 0.7
        depth[mask] = rng.uniform(0.3, 2.0, mask.sum())
        native = depth_to_pointcloud_native(depth, cam.fx, cam.fy, cam.cx, cam.cy)
        ref = depth_to_pointcloud_np(depth, cam)
        np.testing.assert_allclose(native, ref, atol=1e-5)


class TestHelpers:
    def test_regularize_downsample_and_pad(self):
        rng = np.random.default_rng(2)
        pc = rng.normal(size=(100, 3)).astype(np.float32)
        down = regularize_pc_point_count(pc, 50, rng=rng)
        assert down.shape == (50, 3)
        up = regularize_pc_point_count(pc, 150, rng=rng)
        assert up.shape == (150, 3)
        # padded points are duplicates of existing ones
        assert all(
            np.any(np.all(np.isclose(pc, p), axis=-1)) for p in up[100:][:5]
        )

    def test_regularize_fps_mode(self):
        rng = np.random.default_rng(3)
        pc = rng.normal(size=(64, 3)).astype(np.float32)
        out = regularize_pc_point_count(pc, 16, use_farthest_point=True)
        assert out.shape == (16, 3)
        np.testing.assert_array_equal(out[0], pc[0])  # FPS starts at index 0

    def test_normals_on_plane(self):
        rng = np.random.default_rng(4)
        xy = rng.uniform(-1, 1, size=(256, 2))
        pc = np.concatenate([xy, np.zeros((256, 1))], -1)
        normals = estimate_normals(pc, k=8)
        # all normals ~ +-z
        assert np.all(np.abs(np.abs(normals[:, 2]) - 1.0) < 1e-4)

    def test_meshify(self):
        rng = np.random.default_rng(5)
        xy = rng.uniform(-1, 1, size=(50, 2))
        pc = np.concatenate([xy, 0.01 * rng.normal(size=(50, 1))], -1)
        verts, faces = meshify_delaunay(pc)
        assert verts.shape == (50, 3)
        assert faces.ndim == 2 and faces.shape[1] == 3
        assert faces.max() < 50


class TestPartialDataset:
    def test_partial_pipeline(self, tmp_path):
        from graspldm_tpu.data.partial import AcronymPartialPointclouds
        from graspldm_tpu.data.synthetic import make_synthetic_partial_scenes

        root = str(tmp_path / "partial")
        make_synthetic_partial_scenes(root, num_scenes=2, cams_per_scene=2,
                                      grasps_per_scene=32)
        ds = AcronymPartialPointclouds(
            root,
            split="train",
            num_points_per_pc=256,
            num_grasps_per_obj=16,
            min_usable_pc_points=100,
            num_repeat_dataset=1,
        )
        assert len(ds) == 4  # 2 scenes x 2 cams
        item = ds[0]
        assert item["pc"].shape == (256, 3)
        assert item["grasps"].shape[0] == 16
        np.testing.assert_allclose(item["pc"].mean(0), 0.0, atol=1e-3)
        b = next(ds.batches(2))
        assert b["pc"].shape == (2, 256, 3)


class TestClassifierDataset:
    def test_grasp_points_dataset(self, tmp_path):
        from graspldm_tpu.data.grasp_points import (
            AcronymGraspPointsDataset,
            gripper_surface_points,
        )
        from graspldm_tpu.data.synthetic import make_synthetic_acronym

        gp = gripper_surface_points(76)
        assert gp.shape == (76, 3)

        root = make_synthetic_acronym(str(tmp_path / "acr"))
        ds = AcronymGraspPointsDataset(
            root,
            split="train",
            batch_num_points_per_pc=64,
            batch_num_grasps_per_pc=8,
            bogus_grasp_fraction=0.5,
            min_num_grasps=4,
        )
        item = ds[0]
        assert item["pc"].shape == (64, 3)
        assert item["grasp_points"].shape == (12, 76, 3)  # 8 + 4 bogus
        assert item["labels"].shape == (12,)
        assert set(np.unique(item["labels"])).issubset({0.0, 1.0})

    def test_grasp_points_metric_consistency(self, tmp_path):
        """Gripper clouds must live in the pc's normalized frame: rigid
        gripper geometry (built from METRIC poses) scaled by 1/pc_std.

        Regression test for the frame-mixing bug where normalized tmrp was
        fed to Rotation.from_mrp and metric gripper offsets were mixed with
        /0.05 translations (reference contract:
        `acronym_grasp_points.py:88-127` normalizes pc and grasp points
        together AFTER transforming with raw poses).
        """
        from graspldm_tpu.data.grasp_points import (
            AcronymGraspPointsDataset,
            gripper_surface_points,
        )
        from graspldm_tpu.data.synthetic import make_synthetic_acronym
        from graspldm_tpu.utils.normalization import TRANSLATION_SCALE_FACTOR

        root = make_synthetic_acronym(str(tmp_path / "acr"))
        ds = AcronymGraspPointsDataset(
            root,
            split="train",
            batch_num_points_per_pc=64,
            batch_num_grasps_per_pc=8,
            bogus_grasp_fraction=0.0,  # only true annotated grasps
            min_num_grasps=4,
        )
        item = ds[0]
        gp = gripper_surface_points(76)
        # rotation/translation-invariant: the cloud diameter of every grasp
        # equals the metric gripper diameter divided by the pc scale.
        metric_diam = np.linalg.norm(gp[None] - gp[:, None], axis=-1).max()
        pts = item["grasp_points"]
        diffs = pts[:, None, :, :] - pts[:, :, None, :]
        diams = np.linalg.norm(diffs, axis=-1).max(axis=(1, 2))
        np.testing.assert_allclose(
            diams, metric_diam / TRANSLATION_SCALE_FACTOR, rtol=1e-4
        )

    def test_partial_region_metas(self, tmp_path):
        """Region conditioning metas also available from the partial-pc
        dataset (parity with the full-pc path)."""
        from graspldm_tpu.data.partial import AcronymPartialPointclouds
        from graspldm_tpu.data.synthetic import make_synthetic_partial_scenes

        root = str(tmp_path / "partial")
        make_synthetic_partial_scenes(root, num_scenes=1, cams_per_scene=1,
                                      grasps_per_scene=16)
        ds = AcronymPartialPointclouds(
            root, split="train", num_points_per_pc=128,
            num_grasps_per_obj=8, min_usable_pc_points=64,
            num_repeat_dataset=1, return_region_metas=True,
            num_regions=3, region_num_points=32,
        )
        item = ds[0]
        m = item["metas"]
        assert m["region_points"].shape == (3, 32, 3)
        assert m["grasp_region_labels"].shape == (8,)
        assert m["grasp_region_labels"].min() >= 0
        assert m["grasp_region_labels"].max() < 3


def test_gripper_frame_transforms():
    """Fingertip/wrist frame re-expression (`gripper.py:170-251`): pure
    translation along the grasp's own z axis, rotation unchanged."""
    from scipy.spatial.transform import Rotation

    from graspldm_tpu.utils.gripper import (
        SimplePandaGripper,
        transform_to_fingertip_frame,
        transform_to_gripper_wrist,
    )

    H = np.tile(np.eye(4), (3, 1, 1))
    H[:, :3, :3] = Rotation.random(3, random_state=0).as_matrix()
    H[:, :3, 3] = np.random.default_rng(0).normal(size=(3, 3))

    ft = transform_to_fingertip_frame(H)
    np.testing.assert_allclose(ft[:, :3, :3], H[:, :3, :3])
    np.testing.assert_allclose(
        ft[:, :3, 3],
        H[:, :3, 3] + H[:, :3, :3] @ SimplePandaGripper.BOTTOM_CENTER,
        atol=1e-12,
    )
    wr = transform_to_gripper_wrist(H)
    np.testing.assert_allclose(
        wr[:, :3, 3],
        H[:, :3, 3] + H[:, :3, :3] @ SimplePandaGripper.CENTER,
        atol=1e-12,
    )


def test_camera_csv_and_json_roundtrip(tmp_path):
    """read_csv_realsense (working rebuild of the broken upstream parser,
    `camera.py:17-52`) and PinholeCamera.write_json/from_json."""
    from graspldm_tpu.data.camera import (
        PinholeCamera,
        calculate_view_frustum,
        read_csv_realsense,
    )

    csv_path = tmp_path / "frame.csv"
    csv_path.write_text(
        "Type,Depth\nResolution x,640\nResolution y,480\n"
        "Fx,616.0\nFy,616.0\nPPx,320.5\nPPy,240.5\nsolo\n"
    )
    d = read_csv_realsense(str(csv_path))
    assert d["width"] == 640 and d["height"] == 480
    np.testing.assert_allclose(d["cameraMatrix"][0], [616.0, 0.0, 320.5])
    assert 0 < d["hfov"] < 180

    cam = PinholeCamera.default_d435i()
    jp = tmp_path / "cam.json"
    cam.write_json(str(jp))
    cam2 = PinholeCamera.from_json(str(jp))
    assert cam2 == cam

    fr = calculate_view_frustum((0, 0, 0), (0, 0, 2.0), 90.0)
    assert len(fr) == 2
    np.testing.assert_allclose(fr[1][2], 2.0)
