"""High-level classifier trainer (host loop around the jitted step).

Rebuild of `grasp_ldm/trainers/grasp_classification_trainer.py:27-216`:
trains :class:`PointsBasedGraspClassifier` on
:class:`AcronymGraspPointsDataset` batches; validation accumulates
predictions and reports binary accuracy/precision/recall/F1/AUPRC.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

import os

from ..models.grasp_classifier import PointsBasedGraspClassifier
from .classifier import binary_classification_metrics, make_classifier_train_step
from .experiment import Experiment, restore_checkpoint, save_checkpoint
from .optim import build_optimizer
from .state import TrainState

__all__ = ["GraspClassificationTrainer"]


class GraspClassificationTrainer:
    def __init__(
        self,
        experiment: Experiment,
        num_pc_points: int,
        optimizer_cfg: Optional[dict] = None,
        scale_voxel_resolution: float = 0.75,
        log_every: int = 100,
        ckpt_every: int = 1000,
        logger_cfg: Optional[dict] = None,
        steps_per_dispatch: int = 1,
    ):
        """``steps_per_dispatch`` > 1 scans K steps per device dispatch
        over ``stack_batches`` chunks (see ``make_chunked_step``); safe
        because the classifier step folds its RNG with ``state.step``."""
        from .loggers import build_logger

        self.logger = build_logger(logger_cfg, experiment.log_dir)
        self.experiment = experiment
        self.model = PointsBasedGraspClassifier(
            num_pc_points=num_pc_points,
            scale_voxel_resolution=scale_voxel_resolution,
        )
        opt = optimizer_cfg or {}
        self.tx = build_optimizer(
            initial_lr=opt.get("initial_lr", 1e-3),
            scheduler=opt.get("scheduler"),
            grad_clip=opt.get("grad_clip", 0.5),
        )
        self.log_every = log_every
        self.ckpt_every = ckpt_every
        self.steps_per_dispatch = steps_per_dispatch
        self._step_fn = None

    def maybe_resume(self, state: TrainState) -> TrainState:
        """Resume from the stage's last checkpoint when present."""
        path = self.experiment.checkpoint_path("last")
        if os.path.exists(path):
            state = restore_checkpoint(path, state)
            print(f"[classifier] resumed from {path} at step {int(state.step)}")
        return state

    def init_state(self, rng: jax.Array, example_batch: Dict) -> TrainState:
        B, G = example_batch["grasp_points"].shape[:2]
        pc = jnp.asarray(example_batch["pc"][:1]).repeat(G, axis=0)
        gp = jnp.asarray(example_batch["grasp_points"][0])
        variables = self.model.init({"params": rng, "dropout": rng}, pc, gp)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            opt_state=self.tx.init(variables["params"]),
            ema_params=None,
            batch_stats=variables.get("batch_stats"),
        )

    def fit(
        self,
        state: TrainState,
        batches: Iterable[Dict[str, np.ndarray]],
        max_steps: int,
        rng: jax.Array,
    ) -> TrainState:
        if self._step_fn is None:
            fn = make_classifier_train_step(self.model, self.tx)
            if self.steps_per_dispatch > 1:
                from .steps import make_chunked_step

                fn = make_chunked_step(fn)
            self._step_fn = jax.jit(fn, donate_argnums=0)
        # host-side step counter: synced once on entry (resume-aware), then
        # counted locally so the loop never blocks on the device per step;
        # with steps_per_dispatch=K each iteration advances K steps and
        # log/ckpt fire on cadence-boundary crossings
        K = self.steps_per_dispatch
        step = int(state.step)
        for batch in batches:
            if step >= max_steps:
                break
            dev = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = self._step_fn(state, dev, rng)
            prev = step
            step += K
            if step // self.log_every > prev // self.log_every or prev == 0:
                from .trainer import _fetch_metrics

                m = _fetch_metrics(metrics)
                self.logger.log(step, m)
                print(f"[classifier] step {step}: " +
                      " ".join(f"{k}={v:.4f}" for k, v in m.items()))
            if (
                step // self.ckpt_every > prev // self.ckpt_every
                or step >= max_steps
            ):
                save_checkpoint(self.experiment.checkpoint_path("last"), state)
        return state

    def evaluate(self, state: TrainState, batches: Iterable[Dict]) -> Dict[str, float]:
        """Validation pass: accumulate predictions, compute binary metrics
        (`grasp_classification_trainer.py:98-140,199-216`)."""
        preds, targets = [], []
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        for batch in batches:
            pc = jnp.asarray(batch["pc"])
            gp = jnp.asarray(batch["grasp_points"])
            B, G = gp.shape[:2]
            pc_rep = jnp.repeat(pc, G, axis=0)
            logits = self.model.apply(
                variables, pc_rep, gp.reshape(B * G, -1, 3)
            )
            preds.append(np.asarray(jax.nn.sigmoid(logits)))
            targets.append(np.asarray(batch["labels"]).reshape(-1))
        p = jnp.asarray(np.concatenate(preds))
        t = jnp.asarray(np.concatenate(targets))
        return {k: float(v) for k, v in binary_classification_metrics(p, t).items()}
