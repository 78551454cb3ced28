"""Two-stage training orchestration (VAE -> frozen-VAE latent DDM).

Rebuild of the reference trainer layer (`grasp_ldm/trainers/trainer.py:23-332`,
`grasp_ldm/trainers/grasp_generation_trainer.py:204-328`) without Lightning:
a thin host loop around jitted train steps. Data parallelism is a
`jax.sharding.Mesh`: the step is jitted once with the batch sharded on its
leading axis and the state replicated; XLA inserts the gradient all-reduce
(replaces DDPStrategy/NCCL, SURVEY.md §2.3).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..flagship import FlagshipConfig, build_flagship, jit_init
from ..training import (
    EMAConfig,
    TrainState,
    VAELossConfig,
    build_optimizer,
    init_train_state,
    make_ddm_train_step,
    make_vae_train_step,
)
import os

from .experiment import Experiment, restore_checkpoint, save_checkpoint

__all__ = ["GraspGenerationTrainer"]


def _conditioning_example(model_cfg: FlagshipConfig, bg: int) -> tuple:
    """Extra positional example args for conditioned denoiser init."""
    if model_cfg.conditioning == "class":
        return (jnp.zeros((bg,)),)
    if model_cfg.conditioning == "region":
        return (jnp.zeros((bg, model_cfg.region_num_points, 3)),)
    return ()


class GraspGenerationTrainer:
    """Host-side trainer for one stage over an infinite batch iterator."""

    def __init__(
        self,
        experiment: Experiment,
        model_cfg: FlagshipConfig,
        stage: str,  # "vae" | "ddm" | "elucidated_ddm"
        optimizer_cfg: Optional[Dict[str, Any]] = None,
        ema_cfg: Optional[EMAConfig] = EMAConfig(),
        vae_loss_cfg: Optional[VAELossConfig] = None,
        mesh: Optional[Mesh] = None,
        log_every: int = 100,
        ckpt_every: int = 1000,
        use_vae_ema_for_ddm: bool = True,
    ):
        assert stage in ("vae", "ddm", "elucidated_ddm")
        if stage == "elucidated_ddm" and not model_cfg.elucidated:
            # the stage name implies the EDM diffusion process
            # (reference `tools/inference.py:472-477` / experiment modes)
            import dataclasses

            model_cfg = dataclasses.replace(model_cfg, elucidated=True)
        self.experiment = experiment
        self.stage = stage
        self.model_cfg = model_cfg
        self.mesh = mesh
        self.log_every = log_every
        self.ckpt_every = ckpt_every
        self.use_vae_ema_for_ddm = use_vae_ema_for_ddm

        self.vae, self.ddm, self.diffusion = build_flagship(model_cfg)
        opt = optimizer_cfg or {}
        self.tx = build_optimizer(
            initial_lr=opt.get("initial_lr", 1e-3),
            scheduler=opt.get("scheduler"),
            grad_clip=opt.get("grad_clip", 0.5),
        )
        self.ema_cfg = ema_cfg
        self.vae_loss_cfg = vae_loss_cfg or VAELossConfig()
        self._step_fn = None
        self._frozen_vae = None

    # ---- initialization ----

    def maybe_resume(self, state: TrainState) -> TrainState:
        """Resume from the stage's last checkpoint when present
        (reference `resume_training_from_last`, `trainers/experiment.py:80-104`)."""
        path = self.experiment.checkpoint_path("last")
        if os.path.exists(path):
            state = restore_checkpoint(path, state)
            print(f"[{self.stage}] resumed from {path} at step {int(state.step)}")
        return state

    def init_state(self, rng: jax.Array, example_batch: Dict[str, np.ndarray]) -> TrainState:
        pc = jnp.asarray(example_batch["pc"])
        grasps = jnp.asarray(example_batch["grasps"]).reshape(
            -1, example_batch["grasps"].shape[-1]
        )
        if self.stage == "vae":
            return init_train_state(
                self.vae, self.tx, rng, (pc, grasps), {"rng": rng}
            )
        BG = grasps.shape[0]
        x = jnp.zeros((BG, 1, self.model_cfg.grasp_latent_size))
        t = jnp.zeros((BG,), jnp.int32)
        zc = jnp.zeros(
            (BG, self.model_cfg.pc_latent_channels, self.model_cfg.pc_latent_size)
        )
        args = (x, t, zc) + _conditioning_example(self.model_cfg, BG)
        return init_train_state(self.ddm, self.tx, rng, args)

    def load_frozen_vae(self, rng: jax.Array, example_batch) -> dict:
        """Load stage-1 weights for stage-2 (EMA by default, like
        `grasp_generation_trainer.py:260-263,296-328`)."""
        vae_exp = self.experiment.sibling("vae")
        pc = jnp.asarray(example_batch["pc"])
        grasps = jnp.asarray(example_batch["grasps"]).reshape(
            -1, example_batch["grasps"].shape[-1]
        )
        template = init_train_state(self.vae, self.tx, rng, (pc, grasps), {"rng": rng})
        state = restore_checkpoint(vae_exp.checkpoint_path("last"), template)
        params = (
            state.ema_params
            if (self.use_vae_ema_for_ddm and state.ema_params is not None)
            else state.params
        )
        frozen = {"params": params}
        if state.batch_stats is not None:
            frozen["batch_stats"] = state.batch_stats
        return frozen

    # ---- run ----

    def _build_step(self):
        if self.stage == "vae":
            fn = make_vae_train_step(
                self.vae, self.tx, self.vae_loss_cfg, self.ema_cfg
            )
            return jax.jit(fn, donate_argnums=0)
        fn = make_ddm_train_step(
            self.vae, self.ddm, self.diffusion, self.tx, ema_cfg=self.ema_cfg
        )
        return jax.jit(fn, donate_argnums=0)

    def _place(self, state: TrainState, batch):
        if self.mesh is None:
            return state, batch
        data = NamedSharding(self.mesh, P("data"))
        batch = {
            k: jax.device_put(jnp.asarray(v), data) for k, v in batch.items()
        }
        return state, batch

    def fit(
        self,
        state: TrainState,
        batches: Iterable[Dict[str, np.ndarray]],
        max_steps: int,
        rng: jax.Array,
        frozen_vae: Optional[dict] = None,
    ) -> TrainState:
        if self._step_fn is None:
            self._step_fn = self._build_step()
        if self.mesh is not None:
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
            if frozen_vae is not None:
                frozen_vae = jax.device_put(
                    frozen_vae, NamedSharding(self.mesh, P())
                )
        else:
            # commit to device ONCE: restored checkpoints are host numpy, and
            # leaving them on host would re-transfer the whole frozen VAE
            # every step (measured ~1 s/step through a remote-chip tunnel)
            state = jax.device_put(state)
            if frozen_vae is not None:
                frozen_vae = jax.device_put(frozen_vae)

        t_last = time.perf_counter()
        best_loss = float("inf")
        for batch in batches:
            step = int(state.step)
            if step >= max_steps:
                break
            state, batch_dev = self._place(state, batch)
            if self.stage == "vae":
                state, metrics = self._step_fn(state, batch_dev, rng)
            else:
                state, metrics = self._step_fn(state, batch_dev, rng, frozen_vae)
            step = int(state.step)
            if step % self.log_every == 0 or step == 1:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                metrics["steps_per_sec"] = self.log_every / max(dt, 1e-9)
                self.experiment.log_metrics(step, metrics)
                print(
                    f"[{self.stage}] step {step}: "
                    + " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
                )
            if step % self.ckpt_every == 0 or step >= max_steps:
                save_checkpoint(self.experiment.checkpoint_path("last"), state)
                # best-by-loss checkpoint (reference keeps top-k by `loss`,
                # `grasp_generation_trainer.py:146-173`)
                loss = float(metrics.get("loss", float("inf")))
                if loss < best_loss:
                    best_loss = loss
                    save_checkpoint(self.experiment.checkpoint_path("best"), state)
        return state
