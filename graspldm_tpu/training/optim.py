"""Optimizer and LR-schedule factories (optax).

Mirrors the reference trainer's optimizer surface
(`grasp_ldm/trainers/trainer.py:226-257`): Adam with one of
{MultiStepLR, StepLR, ConstantLR, LinearLR, ExponentialLR}, stepped per
optimizer step, plus global-norm gradient clipping (default 0.5,
`trainer.py:47`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import optax

__all__ = ["build_lr_schedule", "build_optimizer"]


def build_lr_schedule(
    initial_lr: float, scheduler: Optional[Dict[str, Any]] = None
) -> optax.Schedule:
    if scheduler is None:
        return optax.constant_schedule(initial_lr)
    kind = scheduler.get("type", "ConstantLR")
    args = dict(scheduler.get("args", {}))
    if kind == "MultiStepLR":
        gamma = args.get("gamma", 0.1)
        milestones = sorted(args["milestones"])
        return optax.piecewise_constant_schedule(
            initial_lr, {int(m): gamma for m in milestones}
        )
    if kind == "StepLR":
        step_size = int(args["step_size"])
        gamma = args.get("gamma", 0.1)
        return lambda step: initial_lr * gamma ** (step // step_size)
    if kind == "ConstantLR":
        return optax.constant_schedule(initial_lr)
    if kind == "LinearLR":
        # torch LinearLR: ramp from start_factor to end_factor over total_iters
        start = args.get("start_factor", 1.0 / 3.0)
        end = args.get("end_factor", 1.0)
        total = int(args.get("total_iters", 5))
        return optax.linear_schedule(initial_lr * start, initial_lr * end, total)
    if kind == "ExponentialLR":
        gamma = args["gamma"]
        return lambda step: initial_lr * gamma**step
    raise ValueError(f"Unknown scheduler type: {kind}")


def build_optimizer(
    initial_lr: float = 1e-3,
    scheduler: Optional[Dict[str, Any]] = None,
    grad_clip: Optional[float] = 0.5,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    schedule = build_lr_schedule(initial_lr, scheduler)
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay > 0:
        parts.append(optax.adamw(schedule, weight_decay=weight_decay))
    else:
        parts.append(optax.adam(schedule))
    return optax.chain(*parts)
