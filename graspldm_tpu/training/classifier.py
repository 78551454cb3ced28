"""Classifier training step + binary metrics.

Rebuild of `grasp_ldm/trainers/grasp_classification_trainer.py:27-216`:
the object pc is repeated per candidate grasp, each (pc, gripper-points) pair
is classified, BCE-with-logits trains it; validation computes binary
accuracy / precision / recall / F1 / average-precision (the reference's
torcheval metrics) as pure-jnp reductions.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses import bce_with_logits
from .ema import EMAConfig, ema_update
from .state import TrainState

__all__ = ["make_classifier_train_step", "binary_classification_metrics"]


def binary_classification_metrics(
    preds: jax.Array, targets: jax.Array, threshold: float = 0.5
) -> Dict[str, jax.Array]:
    """Accuracy / precision / recall / F1 / AP over sigmoid scores."""
    pred_pos = preds >= threshold
    pos = targets > 0.5
    tp = jnp.sum(pred_pos & pos)
    fp = jnp.sum(pred_pos & ~pos)
    fn = jnp.sum(~pred_pos & pos)
    tn = jnp.sum(~pred_pos & ~pos)
    eps = 1e-9
    precision = tp / (tp + fp + eps)
    recall = tp / (tp + fn + eps)
    f1 = 2 * precision * recall / (precision + recall + eps)
    accuracy = (tp + tn) / (tp + tn + fp + fn + eps)

    # Average precision (area under PR curve, step interpolation):
    order = jnp.argsort(-preds)
    sorted_t = targets[order] > 0.5
    cum_tp = jnp.cumsum(sorted_t)
    ranks = jnp.arange(1, len(preds) + 1)
    prec_at_k = cum_tp / ranks
    ap = jnp.sum(prec_at_k * sorted_t) / jnp.maximum(jnp.sum(sorted_t), 1)

    return {
        "accuracy": accuracy,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "auprc": ap,
    }


def make_classifier_train_step(
    model,
    tx: optax.GradientTransformation,
    ema_cfg: EMAConfig | None = None,
) -> Callable[[TrainState, Dict[str, jax.Array], jax.Array], Tuple[TrainState, Dict]]:
    """Batch: ``pc [B, N, 3]``, ``grasp_points [B, G, P, 3]``, ``labels [B, G]``."""

    def step_fn(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        pc = batch["pc"]
        gp = batch["grasp_points"]
        labels = batch["labels"].reshape(-1)
        B, G = gp.shape[:2]
        pc_rep = jnp.repeat(pc, G, axis=0)  # [(B*G), N, 3]
        gp_flat = gp.reshape(B * G, gp.shape[2], 3)
        k_drop = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            logits, updates = model.apply(
                variables,
                pc_rep,
                gp_flat,
                train=True,
                rngs={"dropout": k_drop},
                mutable=["batch_stats"],
            )
            loss = bce_with_logits(logits, labels)
            preds = jax.nn.sigmoid(logits)
            metrics = {"loss": loss}
            metrics.update(binary_classification_metrics(preds, labels))
            return loss, (metrics, updates.get("batch_stats"))

        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_step = state.step + 1
        new_ema = state.ema_params
        if ema_cfg is not None and state.ema_params is not None:
            new_ema = ema_update(state.ema_params, new_params, new_step, ema_cfg)
        return (
            state.replace(
                step=new_step,
                params=new_params,
                opt_state=new_opt,
                ema_params=new_ema,
                batch_stats=new_bs if new_bs is not None else state.batch_stats,
            ),
            metrics,
        )

    return step_fn
