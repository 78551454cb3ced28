"""Training losses, pure-JAX.

Rebuild of `grasp_ldm/losses/loss.py:22-225`. All losses are pure functions /
frozen dataclasses so they live inside jitted train steps; the KL annealing
weight is a closed-form function of the step (evaluated in-graph) instead of
the reference's precomputed host-side table
(`loss.py:22-33,190-199`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LOSSES
from ..utils.gripper import gripper_control_points
from ..utils.rotations import tmrp_to_H

__all__ = [
    "cyclical_annealing_weight",
    "VAEReconstructionLoss",
    "GraspReconstructionLoss",
    "GraspControlPointsReconstructionLoss",
    "VAELatentLoss",
    "ClassificationLoss",
    "QualityLoss",
    "bce_with_logits",
]


def cyclical_annealing_weight(
    step: jax.Array,
    num_steps: int,
    start: float = 0.0,
    stop: float = 1.0,
    num_cycles: int = 4,
    ratio: float = 0.5,
) -> jax.Array:
    """Linear cyclical annealing schedule, evaluated in-graph.

    Matches `loss.py:22-33`: within each cycle of length ``num_steps /
    num_cycles`` the weight ramps linearly from ``start`` to ``stop`` over the
    first ``ratio`` fraction, then stays at ``stop``. Steps beyond
    ``num_steps`` clamp to ``stop``.
    """
    period = num_steps / num_cycles
    slope = (stop - start) / (period * ratio)
    pos = jnp.mod(step.astype(jnp.float32), period)
    w = jnp.minimum(start + slope * pos, stop)
    return jnp.where(step >= num_steps, stop, w)


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean binary cross-entropy with logits (numerically stable)."""
    return jnp.mean(
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


@LOSSES.register
@dataclasses.dataclass(frozen=True)
class VAEReconstructionLoss:
    """Plain MSE. Reference `loss.py:36-44`."""

    weight: float = 1.0
    name: str = "reconstruction_loss"

    def __call__(self, x_in: jax.Array, x_out: jax.Array) -> jax.Array:
        return self.weight * jnp.mean((x_in - x_out) ** 2)


@LOSSES.register
@dataclasses.dataclass(frozen=True)
class GraspReconstructionLoss:
    """MSE over tmrp rows with separately weighted t / mrp slices.

    Reference `loss.py:47-74` scales both prediction and target slices by the
    weights before the MSE, i.e. each slice's squared error is multiplied by
    weight^2 — reproduced here.
    """

    translation_weight: float = 10.0
    rotation_weight: float = 1.0
    name: str = "reconstruction_loss"

    def __call__(self, x_out: jax.Array, x_in: jax.Array, **_) -> jax.Array:
        w = jnp.concatenate(
            [
                jnp.full((3,), self.translation_weight),
                jnp.full((x_in.shape[-1] - 3,), self.rotation_weight),
            ]
        )
        return jnp.mean(((x_out - x_in) * w) ** 2)


@LOSSES.register
@dataclasses.dataclass(frozen=True)
class GraspControlPointsReconstructionLoss:
    """MSE between gripper control points under predicted vs target poses.

    Reference `loss.py:77-127`: poses are unnormalized with the per-object
    grasp mean/std, lifted to 4x4 transforms, applied to the 44 gripper
    control points, and compared with MSE (homogeneous coordinate included).
    """

    weight: float = 1.0
    name: str = "reconstruction_loss"

    def __call__(
        self,
        x_target: jax.Array,
        x_pred: jax.Array,
        *,
        grasp_mean: jax.Array,
        grasp_std: jax.Array,
        **_,
    ) -> jax.Array:
        # x_* : [BG, 6] normalized tmrp; mean/std: [B, 6]
        B = grasp_mean.shape[0]
        tgt = x_target.reshape(B, -1, 6) * grasp_std[:, None, :] + grasp_mean[:, None, :]
        prd = x_pred.reshape(B, -1, 6) * grasp_std[:, None, :] + grasp_mean[:, None, :]

        ctrl = jnp.asarray(gripper_control_points())  # [44, 3]
        ctrl_h = jnp.concatenate([ctrl, jnp.ones((ctrl.shape[0], 1))], axis=-1)

        H_t = tmrp_to_H(tgt.reshape(-1, 6))  # [BG, 4, 4]
        H_p = tmrp_to_H(prd.reshape(-1, 6))
        pts_t = jnp.einsum("bij,nj->bni", H_t, ctrl_h)
        pts_p = jnp.einsum("bij,nj->bni", H_p, ctrl_h)
        return self.weight * jnp.mean((pts_t - pts_p) ** 2)


@LOSSES.register
@dataclasses.dataclass(frozen=True)
class VAELatentLoss:
    """Closed-form KL(N(mu, sigma) || N(0, I)) with optional cyclical annealing.

    Reference `loss.py:130-199`: sum over latent dims, mean over batch; the
    weight follows the annealing schedule of the current step (passed in).
    """

    weight: float = 1.0
    name: str = "grasp_latent"
    cyclical_annealing: bool = False
    num_steps: Optional[int] = None
    num_cycles: Optional[int] = None
    start: float = 1e-7
    stop: float = 0.2
    ratio: float = 0.25

    def weight_at(self, step: jax.Array) -> jax.Array:
        if not self.cyclical_annealing:
            return jnp.asarray(self.weight, jnp.float32)
        return cyclical_annealing_weight(
            step,
            num_steps=self.num_steps,
            start=self.start,
            stop=self.stop,
            num_cycles=self.num_cycles,
            ratio=self.ratio,
        )

    def __call__(
        self,
        mu: jax.Array,
        logvar: jax.Array,
        step: Optional[jax.Array] = None,
        **_,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (weighted_kl, unweighted_kl)."""
        kl = -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=1)
        kl = jnp.mean(kl)
        w = self.weight_at(step) if step is not None else self.weight
        return w * kl, kl


@LOSSES.register
@dataclasses.dataclass(frozen=True)
class ClassificationLoss:
    """Weighted BCE-with-logits. Reference `loss.py:202-212`."""

    weight: float = 1.0
    name: str = "classification_loss"

    def __call__(self, output: jax.Array, targets: jax.Array, **_) -> jax.Array:
        return self.weight * bce_with_logits(output, targets)


@LOSSES.register
@dataclasses.dataclass(frozen=True)
class QualityLoss:
    """Weighted smooth-L1 (huber, delta=1). Reference `loss.py:215-225`."""

    weight: float = 1.0
    name: str = "quality_loss"

    def __call__(self, quals_in: jax.Array, quals_target: jax.Array, **_) -> jax.Array:
        d = quals_in - quals_target
        a = jnp.abs(d)
        return self.weight * jnp.mean(jnp.where(a < 1.0, 0.5 * d * d, a - 0.5))
