"""logits_mask op + ground-truth inference model tests."""

import numpy as np
import jax
import jax.numpy as jnp


class TestLogitsMask:
    def test_selection_semantics(self):
        from graspldm_tpu.ops import logits_mask

        B, N, M = 2, 32, 8
        rng = np.random.default_rng(0)
        coords = rng.normal(size=(B, N, 3)).astype(np.float32)
        logits = np.zeros((B, N, 2), np.float32)
        # batch 0: first 16 points are foreground; batch 1: only 3
        logits[0, :16, 1] = 1.0
        logits[1, :3, 1] = 1.0

        sel, mean, mask = logits_mask(
            jnp.asarray(coords), jnp.asarray(logits), M, jax.random.PRNGKey(0)
        )
        sel, mean, mask = map(np.asarray, (sel, mean, mask))
        assert sel.shape == (B, M, 3)
        assert mask[0].sum() == 16 and mask[1].sum() == 3

        # masked mean correct
        np.testing.assert_allclose(mean[0], coords[0, :16].mean(0), atol=1e-5)
        # selected points (re-centered) come from the candidate set
        cand = coords[0, :16] - mean[0]
        for p in sel[0]:
            assert np.any(np.all(np.isclose(cand, p, atol=1e-5), axis=-1))
        # batch 1 has only 3 candidates: selections repeat them
        cand1 = coords[1, :3] - mean[1]
        for p in sel[1]:
            assert np.any(np.all(np.isclose(cand1, p, atol=1e-5), axis=-1))

    def test_no_candidates_is_finite(self):
        from graspldm_tpu.ops import logits_mask

        coords = jnp.ones((1, 8, 3))
        logits = jnp.zeros((1, 8, 2))  # bg == fg -> no candidates
        sel, mean, mask = logits_mask(coords, logits, 4, jax.random.PRNGKey(0))
        assert not bool(mask.any())
        assert np.all(np.isfinite(np.asarray(sel)))


class TestGroundTruthModel:
    def test_returns_unnormalized_gt(self, tmp_path):
        from graspldm_tpu.data import AcronymShapenetPointclouds, make_synthetic_acronym
        from graspldm_tpu.inference import AcronymGroundTruthModel

        root = make_synthetic_acronym(str(tmp_path / "acr"))
        ds = AcronymShapenetPointclouds(
            root, split="train", batch_num_points_per_pc=64,
            batch_num_grasps_per_pc=8, min_num_grasps=4,
        )
        gt = AcronymGroundTruthModel(ds)
        res = gt.infer(0, num_grasps=5)
        assert res["grasps"].shape == (1, 5, 4, 4)
        assert res["pc"].shape == (1, 64, 3)
        # homogeneous row + orthonormal rotations
        np.testing.assert_allclose(res["grasps"][0, :, 3], [[0, 0, 0, 1]] * 5)
        dets = np.linalg.det(res["grasps"][0, :, :3, :3])
        np.testing.assert_allclose(dets, 1.0, atol=1e-4)
