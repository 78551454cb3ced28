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


class TestConfidenceFilterCombination:
    """Decoder-head and classifier confidence filters must intersect when
    both are given (tools/evaluate.py accepts both flags)."""

    G = 12  # generated grasps: dec passes 0..7, clf passes 4..11

    def _runner_scorer(self, clf_hi):
        import jax  # noqa: F401  (metrics imports jax for fold_in)

        rng = np.random.default_rng(3)
        gt = _random_tmrp(rng, 8)
        item = {
            "grasps": np.concatenate(
                [gt, np.ones((8, 1), np.float32)], -1
            ),
            "metas": {
                "grasp_std": np.ones(6, np.float32),
                "grasp_mean": np.zeros(6, np.float32),
            },
        }
        # gen grasps: only those passing BOTH filters coincide with GT;
        # everything else is 10 m away, so mmd_gen_to_gt ~ 0 iff the
        # intersection (and nothing looser) was used.
        both = sorted(set(range(0, 8)) & set(clf_hi))
        gen = _random_tmrp(rng, self.G)
        gen[:, 0] += 10.0
        for k, g_idx in enumerate(both):
            gen[g_idx] = gt[k % len(gt)]
        conf = np.where(np.arange(self.G) < 8, 0.9, 0.1).astype(np.float32)
        probs = np.full(self.G, 0.1, np.float32)
        probs[list(clf_hi)] = 0.9

        class _Runner:
            dataset = {0: item}

            def infer(self, idx, num_grasps, rng, **kw):
                return {
                    "grasp_tmrp": gen[None],
                    "confidence": conf[None],
                    "pc": np.zeros((1, 16, 3), np.float32),
                }

        class _Scorer:
            def score_grasps(self, pc, grasps=None, tmrp=None):
                return probs[None]

        return _Runner(), _Scorer()

    def _run(self, clf_hi, **kw):
        import jax

        from graspldm_tpu.metrics import evaluate_against_ground_truth

        runner, scorer = self._runner_scorer(clf_hi)
        return evaluate_against_ground_truth(
            runner, indices=[0], num_grasps=self.G,
            rng=jax.random.PRNGKey(0), scorer=scorer, **kw,
        )

    def test_both_filters_intersect(self):
        m = self._run(
            clf_hi=range(4, 12),
            min_confidence=0.5, min_classifier_confidence=0.5,
        )
        # intersection = {4..7}, all equal to GT grasps -> near-zero mmd
        assert m["mmd_gen_to_gt"] < 1e-6
        assert m["classifier_confidence"] == pytest.approx(
            (8 * 0.9 + 4 * 0.1) / 12, abs=1e-6
        )

    def test_decoder_only_filter_keeps_far_grasps(self):
        # sanity: without the classifier filter the far grasps (0..3)
        # survive the decoder filter and blow up mmd_gen_to_gt
        m = self._run(clf_hi=range(4, 12), min_confidence=0.5)
        assert m["mmd_gen_to_gt"] > 1.0

    def test_intersection_fallback_to_decoder_only(self):
        # clf passes only grasp 7 -> intersection has 1 grasp (<2), so the
        # filter relaxes to decoder-only {0..7}; grasp 7 == gt so mmd is
        # bounded by the far grasps that remain
        m = self._run(
            clf_hi=[7],
            min_confidence=0.5, min_classifier_confidence=0.5,
        )
        assert m["mmd_gen_to_gt"] > 1.0  # decoder-only set incl. far ones
        assert m["num_objects"] == 1.0

    def test_classifier_only_filter(self):
        m = self._run(clf_hi=range(4, 12), min_classifier_confidence=0.5)
        # clf-only set {4..11}: 4..7 are GT, 8..11 far
        assert 1.0 < m["mmd_gen_to_gt"] < 10.0


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
