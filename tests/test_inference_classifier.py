"""Classifier-in-the-loop scoring (`graspldm_tpu/inference/classifier.py`).

The reference trains a grasp classifier but never applies it to generated
grasps; `InferenceClassifier` loads the `{exp}/classifier` stage and
re-scores (pc, grasp) pairs with the training-time normalization contract
(`data/grasp_points.py`: metric gripper clouds, then center on the pc mean
and divide by the fixed translation scale).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graspldm_tpu.inference import InferenceClassifier
from graspldm_tpu.models.grasp_classifier import PointsBasedGraspClassifier
from graspldm_tpu.training import build_optimizer
from graspldm_tpu.training.experiment import save_checkpoint
from graspldm_tpu.training.state import TrainState

NP_POINTS = 32
NG_POINTS = 16

CFG_TEXT = """
data = dict(
    train=dict(
        type="AcronymShapenetPointclouds",
        args=dict(batch_num_points_per_pc=32),
    ),
)
classifier = dict(scale_voxel_resolution=0.25)
"""


@pytest.fixture(scope="module")
def clf_exp(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("clf_exp")
    mode_dir = tmp / "classifier"
    os.makedirs(mode_dir / "checkpoints", exist_ok=True)
    (mode_dir / "cfg.py").write_text(CFG_TEXT)

    model = PointsBasedGraspClassifier(
        num_pc_points=NP_POINTS, scale_voxel_resolution=0.25
    )
    rng = jax.random.PRNGKey(3)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, NP_POINTS, 3)),
        jnp.zeros((1, NG_POINTS, 3)),
    )
    tx = build_optimizer(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        ema_params=None,
        batch_stats=variables.get("batch_stats"),
    )
    save_checkpoint(str(mode_dir / "checkpoints" / "last"), state)
    return str(tmp)


@pytest.fixture(scope="module")
def scorer(clf_exp):
    return InferenceClassifier(clf_exp, num_gripper_points=NG_POINTS)


def _random_inputs(key, B=2, G=3):
    kp, kt, km = jax.random.split(key, 3)
    pc = jax.random.normal(kp, (B, NP_POINTS, 3)) * 0.03
    t = jax.random.normal(kt, (B, G, 3)) * 0.03
    mrp = jax.random.normal(km, (B, G, 3)) * 0.2
    return pc, jnp.concatenate([t, mrp], axis=-1)


def test_scores_shape_range_determinism(scorer):
    pc, tmrp = _random_inputs(jax.random.PRNGKey(0))
    probs = np.asarray(scorer.score_grasps(pc, grasps=None, tmrp=tmrp))
    assert probs.shape == (2, 3)
    assert np.all((probs >= 0) & (probs <= 1))
    again = np.asarray(scorer.score_grasps(pc, grasps=None, tmrp=tmrp))
    np.testing.assert_array_equal(probs, again)


def test_h_and_tmrp_inputs_agree(scorer):
    from graspldm_tpu.utils.rotations import tmrp_to_H

    pc, tmrp = _random_inputs(jax.random.PRNGKey(1))
    B, G = tmrp.shape[:2]
    H = tmrp_to_H(tmrp.reshape(B * G, 6)).reshape(B, G, 4, 4)
    via_h = np.asarray(scorer.score_grasps(pc, grasps=H))
    via_t = np.asarray(scorer.score_grasps(pc, grasps=None, tmrp=tmrp))
    np.testing.assert_allclose(via_h, via_t, atol=1e-5, rtol=1e-5)


def test_translation_invariance(scorer):
    """Scoring centers on the pc mean, so shifting the whole scene —
    cloud AND grasp translations — must not change the scores."""
    pc, tmrp = _random_inputs(jax.random.PRNGKey(2))
    shift = jnp.array([0.5, -0.25, 1.0])
    tmrp_shifted = tmrp.at[..., :3].add(shift)
    base = np.asarray(scorer.score_grasps(pc, grasps=None, tmrp=tmrp))
    moved = np.asarray(
        scorer.score_grasps(pc + shift, grasps=None, tmrp=tmrp_shifted)
    )
    np.testing.assert_allclose(base, moved, atol=1e-4, rtol=1e-4)


def test_score_result_adds_key(scorer):
    pc, tmrp = _random_inputs(jax.random.PRNGKey(4))
    result = {"pc": np.asarray(pc), "grasp_tmrp": np.asarray(tmrp)}
    probs = scorer.score_result(result)
    assert result["classifier_confidence"] is probs
    assert probs.shape == (2, 3)


def test_mismatched_point_count_resampled(scorer):
    """Clouds with the wrong N are regularized to the training size (the
    reference applies `regularize_pc_point_count` as a matter of course)
    instead of raising."""
    pc, tmrp = _random_inputs(jax.random.PRNGKey(5))

    # oversized: duplicate the cloud -> subsampling only ever picks
    # original points, so scores stay in-distribution and deterministic
    big = jnp.concatenate([pc, pc], axis=1)  # [B, 2N, 3]
    probs_big = np.asarray(scorer.score_grasps(big, grasps=None, tmrp=tmrp))
    assert probs_big.shape == tuple(tmrp.shape[:2])
    assert np.all((probs_big >= 0) & (probs_big <= 1))
    again = np.asarray(scorer.score_grasps(big, grasps=None, tmrp=tmrp))
    np.testing.assert_array_equal(probs_big, again)

    # undersized: padded by resampling existing points
    small = pc[:, : NP_POINTS // 2]
    probs_small = np.asarray(
        scorer.score_grasps(small, grasps=None, tmrp=tmrp)
    )
    assert probs_small.shape == tuple(tmrp.shape[:2])
    assert np.all(np.isfinite(probs_small))
