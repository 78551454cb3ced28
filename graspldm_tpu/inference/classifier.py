"""Classifier-in-the-loop inference: re-score generated grasps.

The reference trains a points-based grasp-success classifier
(`grasp_ldm/models/grasp_classifier.py:13-143`) but ships no tooling that
applies it to generated grasps — the generation CLI only reports the VAE
decoder's own confidence head. This module closes that loop:
:class:`InferenceClassifier` loads a trained classifier experiment (the
``{exp}/classifier`` stage written by ``tools/train.py --model classifier``)
and scores arbitrary (point cloud, grasp pose) pairs with one jitted
program, so generation results can be re-ranked or filtered by an
INDEPENDENT success model (``tools/generate_grasps.py --classifier_exp``).

Scoring follows the classifier's training conventions exactly
(`graspldm_tpu/data/grasp_points.py`): gripper keypoint clouds are built
from METRIC poses, then pc and gripper clouds are normalized together with
the per-object pc mean and the fixed translation scale.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, ConfigDict
from ..data.grasp_points import gripper_surface_points
from ..models.grasp_classifier import PointsBasedGraspClassifier
from ..training import build_optimizer
from ..training.experiment import restore_checkpoint
from ..training.state import TrainState
from ..utils.normalization import TRANSLATION_SCALE_FACTOR
from ..utils.pointcloud_helpers import regularize_pc_point_count
from ..utils.rotations import H_to_tmrp, tmrp_to_H
from .runner import ExperimentPaths

__all__ = ["InferenceClassifier"]


class InferenceClassifier:
    """Load a trained grasp-success classifier and score grasps.

    Args:
        exp_path: experiment directory holding a ``classifier/`` stage
            (config copy + ``checkpoints/last``), as written by
            ``tools/train.py --model classifier``.
        num_gripper_points: keypoints per gripper cloud; must match
            training (default 76, the reference's ``gripper_points_76``).
    """

    def __init__(self, exp_path: str, num_gripper_points: int = 76):
        paths = ExperimentPaths(exp_path, "classifier")
        cfg = (
            Config.fromfile(paths.config_path)
            if paths.config_path
            else ConfigDict()
        )
        # model hyperparameters follow the train CLI's resolution
        # (tools/train.py classifier branch)
        num_pc_points = int(
            cfg.get_path(
                "data.classifier.args.batch_num_points_per_pc",
                cfg.get_path("data.train.args.batch_num_points_per_pc", 1024),
            )
        )
        self.model = PointsBasedGraspClassifier(
            num_pc_points=num_pc_points,
            scale_voxel_resolution=float(
                cfg.get_path("classifier.scale_voxel_resolution", 0.75)
            ),
        )
        self.gripper_points = jnp.asarray(
            gripper_surface_points(num_gripper_points)
        )

        rng = jax.random.PRNGKey(0)
        pc = jnp.zeros((1, num_pc_points, 3))
        gp = jnp.zeros((1, num_gripper_points, 3))
        variables = self.model.init({"params": rng, "dropout": rng}, pc, gp)
        tx = build_optimizer(1e-3)
        template = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            opt_state=tx.init(variables["params"]),
            ema_params=None,
            batch_stats=variables.get("batch_stats"),
        )
        state = restore_checkpoint(paths.ckpt_path, template)
        self.variables: Dict[str, Any] = {"params": state.params}
        if state.batch_stats is not None:
            self.variables["batch_stats"] = state.batch_stats
        self._score_jit = jax.jit(self._score)

    # -- scoring --

    def _score(self, variables, pc, tmrp):
        """``pc [B, N, 3]`` metric, ``tmrp [B, G, 6]`` metric -> ``[B, G]``."""
        B, G = tmrp.shape[:2]
        H = tmrp_to_H(tmrp.reshape(B * G, 6))  # [B*G, 4, 4]
        gp = (
            jnp.einsum("bij,pj->bpi", H[:, :3, :3], self.gripper_points)
            + H[:, None, :3, 3]
        )  # [B*G, P, 3] metric gripper clouds

        # training normalization: center on the per-object pc mean, divide
        # by the fixed translation scale (grasp_points.py __getitem__)
        pc_mean = jnp.mean(pc, axis=1, keepdims=True)  # [B, 1, 3]
        pc_n = (pc - pc_mean) / TRANSLATION_SCALE_FACTOR
        gp_n = (
            gp.reshape(B, G, -1, 3) - pc_mean[:, None]
        ) / TRANSLATION_SCALE_FACTOR

        pc_rep = jnp.repeat(pc_n, G, axis=0)  # [B*G, N, 3]
        logits = self.model.apply(
            variables, pc_rep, gp_n.reshape(B * G, -1, 3)
        )
        return jax.nn.sigmoid(logits).reshape(B, G)

    def score_grasps(
        self, pc: Any, grasps: Any, tmrp: Optional[Any] = None
    ) -> jax.Array:
        """Success probabilities for grasp poses on metric point clouds.

        Args:
            pc: ``[B, N, 3]`` (or ``[N, 3]``) METRIC point cloud(s) — e.g.
                the ``pc`` entry of a generation result.
            grasps: ``[B, G, 4, 4]`` homogeneous grasp poses (the
                ``grasps`` entry of a generation result), ignored when
                ``tmrp`` is given.
            tmrp: optional ``[B, G, 6]`` metric [t, mrp] rows instead.

        Returns:
            ``[B, G]`` sigmoid success probabilities.
        """
        pc = np.asarray(pc, np.float32)
        if pc.ndim == 2:
            pc = pc[None]
        if pc.shape[1] != self.model.num_pc_points:
            # The point_pool head is shape-bound to the training point
            # count; resample each cloud the way the reference pipeline
            # does (`pointcloud_helpers.py:124-160`) rather than raising.
            rng = np.random.default_rng(0)
            pc = np.stack(
                [
                    regularize_pc_point_count(
                        cloud, self.model.num_pc_points, rng=rng
                    )
                    for cloud in pc
                ]
            )
        pc = jnp.asarray(pc)
        if tmrp is None:
            H = jnp.asarray(grasps, jnp.float32)
            B, G = H.shape[:2]
            tmrp = H_to_tmrp(H.reshape(B * G, 4, 4)).reshape(B, G, 6)
        else:
            tmrp = jnp.asarray(tmrp, jnp.float32)
        return self._score_jit(self.variables, pc, tmrp)

    def score_result(self, result: Dict[str, Any]) -> np.ndarray:
        """Score a generation result dict in place.

        Adds ``classifier_confidence [B, G]`` next to the decoder-head
        ``confidence`` and returns it.
        """
        probs = np.asarray(
            self.score_grasps(result["pc"], grasps=None, tmrp=result["grasp_tmrp"])
        )
        result["classifier_confidence"] = probs
        return probs
