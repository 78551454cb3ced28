"""Generation-quality metrics: analytic properties + GT self-consistency."""

import numpy as np
import pytest

from graspldm_tpu.metrics import (
    grasp_pairwise_distances,
    grasp_set_metrics,
)


def _random_tmrp(rng, n, scale=0.1):
    t = rng.normal(size=(n, 3)) * scale
    mrp = rng.normal(size=(n, 3)) * 0.3
    return np.concatenate([t, mrp], -1).astype(np.float32)


class TestSetMetrics:
    def test_identical_sets_are_perfect(self):
        rng = np.random.default_rng(0)
        g = _random_tmrp(rng, 32)
        m = grasp_set_metrics(g, g, coverage_tau=1e-6, rot_weight=0.1)
        assert m["coverage"] == 1.0
        assert m["mmd_gen_to_gt"] == pytest.approx(0.0, abs=1e-7)
        assert m["mmd_gt_to_gen"] == pytest.approx(0.0, abs=1e-7)
        assert m["emd_translation"] == pytest.approx(0.0, abs=1e-7)

    def test_known_shift(self):
        rng = np.random.default_rng(1)
        g = _random_tmrp(rng, 16)
        shifted = g.copy()
        shifted[:, 0] += 0.05  # 5 cm x-shift
        m = grasp_set_metrics(shifted, g, coverage_tau=0.02)
        assert m["coverage"] == 0.0  # nothing within 2 cm
        # identical rotations + pure shift: min distance <= 5 cm exactly when
        # matching each grasp with its shifted copy
        assert m["mmd_gt_to_gen"] <= 0.05 + 1e-6
        assert m["emd_translation"] <= 0.05 + 1e-6
        m2 = grasp_set_metrics(shifted, g, coverage_tau=0.06)
        assert m2["coverage"] == 1.0

    def test_rotation_term(self):
        # same translations, rotations differ by a known angle
        n = 8
        t = np.zeros((n, 3), np.float32)
        mrp_a = np.zeros((n, 3), np.float32)
        angle = np.pi / 2
        mrp_b = np.tile(
            np.array([np.tan(angle / 4), 0, 0], np.float32), (n, 1)
        )  # mrp = axis * tan(theta/4)
        a = np.concatenate([t, mrp_a], -1)
        b = np.concatenate([t, mrp_b], -1)
        d = grasp_pairwise_distances(a, b, rot_weight=1.0)
        np.testing.assert_allclose(np.diag(d), angle, atol=1e-5)
        assert grasp_pairwise_distances(a, b, rot_weight=0.0).max() < 1e-7

    def test_precision_recall_asymmetry(self):
        """A collapsed generator (one mode) has good precision, bad recall."""
        rng = np.random.default_rng(2)
        gt = _random_tmrp(rng, 64, scale=0.2)
        collapsed = np.tile(gt[:1], (64, 1))
        m = grasp_set_metrics(collapsed, gt, coverage_tau=0.02)
        assert m["mmd_gen_to_gt"] < 1e-6  # every gen grasp IS a gt grasp
        assert m["mmd_gt_to_gen"] > 0.05  # most gt grasps uncovered
        assert m["coverage"] < 0.2


@pytest.mark.slow
def test_ground_truth_model_scores_perfectly(tmp_path):
    """The AcronymGroundTruthModel evaluated against its own dataset must be
    near-perfect — the end-to-end sanity anchor for the eval harness."""
    import jax

    from graspldm_tpu.data import AcronymShapenetPointclouds, make_synthetic_acronym
    from graspldm_tpu.inference.runner import AcronymGroundTruthModel
    from graspldm_tpu.metrics import evaluate_against_ground_truth

    root = make_synthetic_acronym(str(tmp_path / "acr"))
    ds = AcronymShapenetPointclouds(
        root, split="train", batch_num_points_per_pc=32,
        batch_num_grasps_per_pc=8, min_num_grasps=4,
        batch_failed_grasps_ratio=0.0, num_repeat_dataset=1, seed=0,
    )

    class _GTRunner(AcronymGroundTruthModel):
        # evaluate_against_ground_truth indexes the dataset twice per object
        # (GT fetch + infer); freeze per-index items so both see the same
        # grasp selection despite the dataset's stochastic sampling.
        def __init__(self, dataset):
            super().__init__(dataset)
            self._cache = {}
            ds_ref = dataset

            class _Frozen:
                def __getitem__(s, i):
                    if i not in self._cache:
                        self._cache[i] = ds_ref[i]
                    return self._cache[i]

                def __len__(s):
                    return len(ds_ref)

            self.dataset = _Frozen()

        def infer(self, idx, num_grasps=None, rng=None):
            return super().infer(idx, num_grasps=num_grasps)

    runner = _GTRunner(ds)
    m = evaluate_against_ground_truth(
        runner, indices=[0, 1], num_grasps=8, rng=jax.random.PRNGKey(0),
        coverage_tau=1e-4,
    )
    assert m["coverage"] == 1.0
    assert m["mmd_gt_to_gen"] < 1e-6
