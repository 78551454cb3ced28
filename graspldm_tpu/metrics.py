"""Generation-quality metrics: grasp-set distances vs ground truth.

The reference has NO automated generation eval (its validation loop is a
stub, `grasp_ldm/trainers/grasp_generation_trainer.py:112-140`); SURVEY.md §4
tasks the rebuild to do better. These metrics quantify how well a set of
generated 6-DoF grasps covers the annotated ground-truth set for an object:

  * ``coverage``      — fraction of GT grasps with a generated grasp within
                        ``tau`` (combined translation+rotation distance);
                        the standard coverage metric from the grasp-
                        generation literature.
  * ``mmd_gen_to_gt`` — mean over generated grasps of the distance to the
                        nearest GT grasp ("precision": are generated grasps
                        near real ones?).
  * ``mmd_gt_to_gen`` — mean over GT grasps of the distance to the nearest
                        generated grasp ("recall"/minimum matching distance).
  * ``emd_translation`` — earth-mover's distance between the translation
                        sets (Hungarian assignment on an equal-size subset).

Distances combine Euclidean translation with the geodesic rotation angle:
``d = ||t_a - t_b|| + rot_weight * angle(R_a, R_b)`` (angle in radians).
All functions take tmrp rows ``[G, 6]`` in METRIC (unnormalized) units.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from scipy.spatial.transform import Rotation

__all__ = [
    "grasp_pairwise_distances",
    "grasp_set_metrics",
    "evaluate_against_ground_truth",
]


def _quats(tmrp: np.ndarray) -> np.ndarray:
    return Rotation.from_mrp(tmrp[:, 3:6]).as_quat()


def grasp_pairwise_distances(
    tmrp_a: np.ndarray, tmrp_b: np.ndarray, rot_weight: float = 0.0
) -> np.ndarray:
    """``[Ga, Gb]`` combined translation(+rotation) distances."""
    t_d = np.linalg.norm(
        tmrp_a[:, None, :3] - tmrp_b[None, :, :3], axis=-1
    )
    if rot_weight == 0.0:
        return t_d
    qa = _quats(np.asarray(tmrp_a, np.float64))
    qb = _quats(np.asarray(tmrp_b, np.float64))
    # geodesic angle = 2*arccos(|<qa, qb>|)
    dots = np.clip(np.abs(qa @ qb.T), 0.0, 1.0)
    ang = 2.0 * np.arccos(dots)
    return t_d + rot_weight * ang


def grasp_set_metrics(
    gen_tmrp: np.ndarray,
    gt_tmrp: np.ndarray,
    coverage_tau: float = 0.02,
    rot_weight: float = 0.0,
    emd_max_points: int = 256,
    rng: Optional[np.random.Generator] = None,
) -> Dict[str, float]:
    """Set-level metrics between generated and GT grasps (metric units).

    Args:
        coverage_tau: distance threshold for counting a GT grasp as covered
            (default 2 cm translation-only).
        rot_weight: weight (meters/radian) of the rotation term; 0 gives the
            translation-only metrics.
    """
    d = grasp_pairwise_distances(gen_tmrp, gt_tmrp, rot_weight)
    min_gen_to_gt = d.min(axis=1)
    min_gt_to_gen = d.min(axis=0)
    out = {
        "coverage": float((min_gt_to_gen < coverage_tau).mean()),
        "mmd_gen_to_gt": float(min_gen_to_gt.mean()),
        "mmd_gt_to_gen": float(min_gt_to_gen.mean()),
    }

    # EMD over translations (equal-size subsets, Hungarian assignment)
    from scipy.optimize import linear_sum_assignment

    rng = rng or np.random.default_rng(0)
    n = min(len(gen_tmrp), len(gt_tmrp), emd_max_points)
    gi = rng.choice(len(gen_tmrp), n, replace=False)
    ti = rng.choice(len(gt_tmrp), n, replace=False)
    cost = np.linalg.norm(
        gen_tmrp[gi][:, None, :3] - gt_tmrp[ti][None, :, :3], axis=-1
    )
    r, c = linear_sum_assignment(cost)
    out["emd_translation"] = float(cost[r, c].mean())
    return out


def evaluate_against_ground_truth(
    runner,
    indices,
    num_grasps: int,
    rng,
    coverage_tau: float = 0.02,
    rot_weight: float = 0.0,
    min_confidence: Optional[float] = None,
    infer_kwargs: Optional[Dict] = None,
    scorer=None,
    min_classifier_confidence: Optional[float] = None,
) -> Dict[str, float]:
    """Per-object generation quality against the dataset's GT grasps.

    ``runner`` is an InferenceVAE/InferenceLDM (needs ``.dataset`` and
    ``.infer``); GT grasps come from the same dataset item metas. Returns
    metrics averaged over ``indices``. ``infer_kwargs`` are forwarded to
    ``runner.infer`` (e.g. ``guidance_scale`` / ``cfg_scale`` to measure
    guided sampling). ``scorer`` (an
    :class:`~graspldm_tpu.inference.InferenceClassifier`) re-scores every
    generated grasp with the independent success classifier: the mean
    score is reported as ``classifier_confidence`` and
    ``min_classifier_confidence`` filters grasps by it (like
    ``min_confidence`` does for the decoder head's own score).
    """
    import jax

    per_obj = []
    clf_means = []
    for j, idx in enumerate(indices):
        item = runner.dataset[int(idx)]
        m = item["metas"]
        gt = (
            item["grasps"][:, :6] * m["grasp_std"][None]
            + m["grasp_mean"][None]
        )
        keep = item["grasps"][:, 6] > 0.5  # only successful GT grasps
        if keep.sum() < 2:
            continue
        res = runner.infer(
            int(idx), num_grasps=num_grasps, rng=jax.random.fold_in(rng, j),
            **(infer_kwargs or {}),
        )
        gen = np.asarray(res["grasp_tmrp"][0])
        dec_sel = None
        if min_confidence is not None:
            conf = np.asarray(res["confidence"][0])
            dec_sel = conf >= min_confidence
        clf_sel = None
        if scorer is not None:
            probs = np.asarray(
                scorer.score_grasps(
                    res["pc"], grasps=None, tmrp=res["grasp_tmrp"]
                )
            )[0]
            clf_means.append(float(probs.mean()))
            if min_classifier_confidence is not None:
                clf_sel = probs >= min_classifier_confidence
        # Both filters act on the UNFILTERED grasp set and are intersected
        # when both are given. A filter (or the intersection) only applies
        # when it leaves >= 2 grasps, relaxing combined -> decoder-only ->
        # classifier-only -> unfiltered.
        candidates = []
        if dec_sel is not None and clf_sel is not None:
            candidates.append(dec_sel & clf_sel)
        if dec_sel is not None:
            candidates.append(dec_sel)
        if clf_sel is not None:
            candidates.append(clf_sel)
        for sel in candidates:
            if sel.sum() >= 2:
                gen = gen[sel]
                break
        per_obj.append(
            grasp_set_metrics(
                gen, gt[keep], coverage_tau=coverage_tau,
                rot_weight=rot_weight,
            )
        )
    if not per_obj:
        raise ValueError("no objects with enough GT grasps")
    out = {
        k: float(np.mean([o[k] for o in per_obj])) for k in per_obj[0]
    } | {"num_objects": float(len(per_obj))}
    if clf_means:
        out["classifier_confidence"] = float(np.mean(clf_means))
    return out
