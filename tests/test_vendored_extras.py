"""Vendored-extra parity components: PointNetAModule, PointNet2 SSG/MSG,
PVCNN2Invert/PVCNN2Decoder, FrustumPointNet loss (SURVEY §2.2 tail)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# tiny specs (the reference class-attr specs assume N >= 512; shapes here
# are scaled for the 1-CPU test host — the spec VALUES are config data)
TINY_SSG_SA = (
    (16, 0.3, 8, (8, 16)),
    (8, 0.6, 8, (16, 32)),
    (None, None, None, (32, 48)),
)
TINY_SSG_FP = ((24, 16), (16, 16), (16, 8))
TINY_MSG_SA = (
    (16, (0.2, 0.4), (4, 8), ((8, 8), (8, 16))),
    (None, None, None, (24, 32)),
)
TINY_MSG_FP = ((16, 16), (16, 8))


class TestPointNetAModule:
    def test_global_pool_shapes_and_invariance(self):
        from graspldm_tpu.models.pvcnn2 import PointNetAModule

        rng = jax.random.PRNGKey(0)
        B, N, C = 2, 32, 6
        feats = jax.random.normal(rng, (B, N, C))
        coords = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3))
        mod = PointNetAModule(mlp_channels=(8, 16))
        v = mod.init({"params": rng}, feats, coords)
        out, out_coords = mod.apply(v, feats, coords)
        assert out.shape == (B, 1, 16)
        assert out_coords.shape == (B, 1, 3)
        np.testing.assert_allclose(np.asarray(out_coords), 0.0)

        # permutation invariance of the max pool
        perm = jax.random.permutation(jax.random.PRNGKey(2), N)
        out_p, _ = mod.apply(v, feats[:, perm], coords[:, perm])
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out), atol=1e-6
        )

    def test_multi_branch(self):
        from graspldm_tpu.models.pvcnn2 import PointNetAModule

        rng = jax.random.PRNGKey(0)
        feats = jax.random.normal(rng, (1, 16, 4))
        coords = jax.random.normal(rng, (1, 16, 3))
        mod = PointNetAModule(mlp_channels=((8,), (4, 12)))
        v = mod.init({"params": rng}, feats, coords)
        out, _ = mod.apply(v, feats, coords)
        assert out.shape == (1, 1, 8 + 12)


class TestPointNet2Nets:
    @pytest.mark.parametrize(
        "cls_name,sa,fp",
        [
            ("PointNet2SSG", TINY_SSG_SA, TINY_SSG_FP),
            ("PointNet2MSG", TINY_MSG_SA, TINY_MSG_FP),
        ],
    )
    def test_forward_shapes(self, cls_name, sa, fp):
        import graspldm_tpu.models.pvcnn2 as m

        cls = getattr(m, cls_name)
        net = cls(sa_blocks=sa, fp_blocks=fp, extra_feature_channels=0)
        rng = jax.random.PRNGKey(0)
        B, N = 2, 32
        x = jax.random.normal(rng, (B, N, 3))
        v = net.init({"params": rng}, x)
        out = net.apply(v, x)
        assert out.shape == (B, N, fp[-1][-1])
        assert np.all(np.isfinite(np.asarray(out)))

    def test_default_specs_match_reference(self):
        """The shipped class specs are the reference's (`pointnet2.py:98-159`)."""
        from graspldm_tpu.models.pvcnn2 import PointNet2MSG, PointNet2SSG

        assert PointNet2SSG.sa_blocks[0] == (512, 0.2, 64, (64, 64, 128))
        assert PointNet2SSG.sa_blocks[-1][0] is None  # global stage
        assert PointNet2MSG.sa_blocks[0][1] == (0.1, 0.2, 0.4)
        assert PointNet2SSG.fp_blocks == ((256, 256), (256, 128), (128, 128, 128))


class TestPVCNN2Decoders:
    def test_pvcnn2_decoder_generates_points(self):
        from graspldm_tpu.models.pc_decoders import PVCNN2Decoder

        tiny_sa = (
            ((8, 1, 4), (16, 0.3, 8, (8, 16))),
            (None, (8, 0.6, 8, (16, 24))),
        )
        tiny_fp = (((16, 16), (8, 1, 4)), ((16, 8), None))
        dec = PVCNN2Decoder(
            n_points=32, latent_dims=8, sa_blocks=tiny_sa, fp_blocks=tiny_fp
        )
        rng = jax.random.PRNGKey(0)
        z = jax.random.normal(rng, (2, 8))
        v = dec.init({"params": rng, "dropout": rng}, z)
        out = dec.apply(v, z)
        assert out.shape == (2, 32, 3)
        assert np.all(np.isfinite(np.asarray(out)))


class TestFrustumLoss:
    def _make_io(self, rng, B=4, NH=12, NS=8, N=32):
        k = iter(jax.random.split(rng, 16))
        inputs = {
            "mask_logits": jax.random.normal(next(k), (B, 2, N)),
            "center_reg": jax.random.normal(next(k), (B, 3)),
            "center": jax.random.normal(next(k), (B, 3)),
            "heading_scores": jax.random.normal(next(k), (B, NH)),
            "heading_residuals_normalized": jax.random.normal(next(k), (B, NH)),
            "heading_residuals": jax.random.normal(next(k), (B, NH)) * 0.1,
            "size_scores": jax.random.normal(next(k), (B, NS)),
            "size_residuals_normalized": jax.random.normal(next(k), (B, NS, 3)),
            "size_residuals": jax.random.normal(next(k), (B, NS, 3)) * 0.1,
        }
        targets = {
            "mask_logits": jax.random.randint(next(k), (B, N), 0, 2),
            "center": jax.random.normal(next(k), (B, 3)),
            "heading_bin_id": jax.random.randint(next(k), (B,), 0, NH),
            "heading_residual": jax.random.normal(next(k), (B,)) * 0.1,
            "size_template_id": jax.random.randint(next(k), (B,), 0, NS),
            "size_residual": jax.random.normal(next(k), (B, 3)) * 0.05,
        }
        templates = jnp.abs(jax.random.normal(next(k), (NS, 3))) + 0.5
        return inputs, targets, templates

    def test_finite_and_positive(self):
        from graspldm_tpu.losses.frustum import frustum_pointnet_loss

        inputs, targets, templates = self._make_io(jax.random.PRNGKey(0))
        loss = frustum_pointnet_loss(
            inputs, targets, templates, num_heading_angle_bins=12
        )
        assert np.isfinite(float(loss)) and float(loss) > 0

    def test_perfect_regression_leaves_only_classification(self):
        from graspldm_tpu.losses.frustum import frustum_pointnet_loss

        inputs, targets, templates = self._make_io(jax.random.PRNGKey(1))
        B = 4
        b = jnp.arange(B)
        h_id, s_id = targets["heading_bin_id"], targets["size_template_id"]
        NH = inputs["heading_scores"].shape[1]
        import math

        # make every regression head exactly right
        inputs["center"] = targets["center"]
        inputs["center_reg"] = targets["center"]
        inputs["heading_residuals"] = (
            inputs["heading_residuals"].at[b, h_id].set(targets["heading_residual"])
        )
        inputs["heading_residuals_normalized"] = (
            inputs["heading_residuals_normalized"]
            .at[b, h_id]
            .set(targets["heading_residual"] / (math.pi / NH))
        )
        inputs["size_residuals"] = (
            inputs["size_residuals"].at[b, s_id].set(targets["size_residual"])
        )
        inputs["size_residuals_normalized"] = (
            inputs["size_residuals_normalized"]
            .at[b, s_id]
            .set(targets["size_residual"] / templates[s_id])
        )
        # and the classifications confidently right
        inputs["heading_scores"] = (
            jnp.full_like(inputs["heading_scores"], -30.0).at[b, h_id].set(30.0)
        )
        inputs["size_scores"] = (
            jnp.full_like(inputs["size_scores"], -30.0).at[b, s_id].set(30.0)
        )
        inputs["mask_logits"] = (
            jax.nn.one_hot(targets["mask_logits"], 2, axis=1) * 60.0 - 30.0
        )
        loss = frustum_pointnet_loss(
            inputs, targets, templates, num_heading_angle_bins=12
        )
        assert float(loss) < 1e-5

    def test_box_corners_flip(self):
        from graspldm_tpu.losses.frustum import get_box_corners_3d

        centers = jnp.zeros((2, 3))
        headings = jnp.asarray([0.0, 1.2])
        sizes = jnp.ones((2, 3))
        c, c_flip = get_box_corners_3d(centers, headings, sizes, with_flip=True)
        assert c.shape == (2, 3, 8)
        # flip = rotation by pi: same box, corner order rotated; the corner
        # SETS must coincide
        a = np.sort(np.asarray(c[0]).round(5).T.tolist(), axis=0)
        bb = np.sort(np.asarray(c_flip[0]).round(5).T.tolist(), axis=0)
        np.testing.assert_allclose(a, bb, atol=1e-5)
