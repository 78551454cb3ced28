"""Periodic in-training generation evaluation.

The reference's validation loop is a stub
(`grasp_ldm/trainers/grasp_generation_trainer.py:112-140`), so a 180k-step
run has no quality signal until someone evaluates the checkpoints offline.
This hook closes that gap: every ``trainer.eval_every`` steps the trainer
calls it with the live state, it generates grasps for a small held-out set
of objects with the CURRENT (EMA-preferred) weights, and scores them
against the ground-truth grasp annotations (:mod:`graspldm_tpu.metrics`).
The returned ``score`` (coverage) also drives the ``best`` checkpoint.

All K objects run in ONE jitted generation program (compiled once at the
first eval); the per-object metric math is tiny host numpy.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics import grasp_set_metrics
from ..utils.normalization import NormalizationMeta

__all__ = ["make_generation_eval_fn"]


def make_generation_eval_fn(
    trainer,
    dataset,
    indices: Sequence[int],
    num_grasps: int = 64,
    num_inference_steps: int = 25,
    coverage_tau: float = 0.02,
    rot_weight: float = 0.0,
    seed: int = 0,
):
    """Build an ``(state, frozen_vae) -> metrics`` hook for
    :meth:`GraspGenerationTrainer.fit`.

    Args:
        trainer: the GraspGenerationTrainer (provides stage + modules).
        dataset: item-style dataset (normalized pc/grasps + metas).
        indices: held-out object indices to evaluate (fixed for the run).
        num_grasps: generated grasps per object.
        num_inference_steps: DDIM/DPM++ steps for the ddm stages (kept
            small — this runs inside training).

    Returns a callable producing ``{"score", "coverage", "mmd_gen_to_gt",
    ...}`` — ``score`` is the mean coverage (higher is better). The same
    PRNG key is reused every call so consecutive evals are comparable.
    """
    from ..inference.pipeline import ldm_generate, vae_generate

    items = [dataset[int(i)] for i in indices]
    pcs = jnp.asarray(np.stack([it["pc"] for it in items]))
    metas = [it["metas"] for it in items]
    meta = NormalizationMeta(
        pc_mean=jnp.asarray(np.stack([m["pc_mean"] for m in metas])),
        pc_std=jnp.asarray(np.stack([m["pc_std"] for m in metas])),
        grasp_mean=jnp.asarray(np.stack([m["grasp_mean"] for m in metas])),
        grasp_std=jnp.asarray(np.stack([m["grasp_std"] for m in metas])),
    )
    # metric-frame successful GT grasps, per object (ragged -> host list)
    gts = []
    for it in items:
        g = it["grasps"]
        keep = g[:, 6] > 0.5
        gt = (
            g[:, :6] * it["metas"]["grasp_std"][None]
            + it["metas"]["grasp_mean"][None]
        )
        gts.append(gt[keep])
    key = jax.random.PRNGKey(seed)
    stage = trainer.stage
    sampler = "dpmpp" if stage == "elucidated_ddm" else "ddim"

    @jax.jit
    def _gen_vae(variables, pcs, meta, key):
        return vae_generate(
            trainer.vae, variables, pcs, num_grasps, key, meta=meta
        )

    @jax.jit
    def _gen_ldm(frozen_vae, ddm_variables, pcs, meta, key):
        return ldm_generate(
            trainer.vae, frozen_vae, trainer.ddm, ddm_variables,
            trainer.diffusion, pcs, num_grasps, key,
            num_inference_steps=num_inference_steps, sampler=sampler,
            meta=meta,
        )

    def eval_fn(state, frozen_vae: Optional[dict]) -> Dict[str, float]:
        params = (
            state.ema_params if state.ema_params is not None else state.params
        )
        variables = {"params": params}
        if getattr(state, "batch_stats", None) is not None:
            variables["batch_stats"] = state.batch_stats
        if getattr(state, "constants", None) is not None:
            # e.g. the denoiser's random-Fourier time-embedding weights
            variables["constants"] = state.constants
        if stage == "vae":
            res = _gen_vae(variables, pcs, meta, key)
        else:
            res = _gen_ldm(frozen_vae, variables, pcs, meta, key)
        gen = np.asarray(res["grasp_tmrp"])  # [K, G, 6] metric frame
        per_obj = [
            grasp_set_metrics(
                gen[i], gts[i], coverage_tau=coverage_tau,
                rot_weight=rot_weight,
            )
            for i in range(len(gts))
            if len(gts[i]) >= 2
        ]
        if not per_obj:
            return {"score": 0.0, "num_objects": 0.0}
        out = {
            k: float(np.mean([o[k] for o in per_obj])) for k in per_obj[0]
        }
        out["num_objects"] = float(len(per_obj))
        out["score"] = out["coverage"]
        return out

    return eval_fn
