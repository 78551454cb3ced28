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


def _fetch_metrics(metrics: Dict[str, jax.Array]) -> Dict[str, float]:
    """Device metrics -> host floats in ONE transfer.

    ``float(v)`` per metric costs one device round trip each (~30 ms
    through a remote-chip tunnel); stacking on device and reading once
    collapses N round trips to one program + one read."""
    keys = sorted(metrics)
    vals = np.asarray(jnp.stack([metrics[k] for k in keys]))
    return {k: float(v) for k, v in zip(keys, vals)}


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
        logger_cfg: Optional[Dict[str, Any]] = None,
        eval_every: int = 0,
        steps_per_dispatch: int = 1,
        dispatch_unroll: int = 1,
        keep_top_k: int = 0,
    ):
        """``steps_per_dispatch`` > 1 runs K train steps per device
        dispatch (``lax.scan`` over a stacked ``[K, ...]`` batch, see
        :func:`make_chunked_step`); ``fit`` then expects ``stack_batches``
        chunks. Amortizes per-dispatch host overhead — use when the
        loop measures below the device step rate (remote-chip tunnels).
        ``dispatch_unroll`` unrolls that many scanned steps into one XLA
        computation (+19% measured at 8, costs compile time)."""
        assert stage in ("vae", "ddm", "elucidated_ddm")
        assert steps_per_dispatch >= 1
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
        self.eval_every = eval_every
        self.keep_top_k = keep_top_k
        self.steps_per_dispatch = steps_per_dispatch
        self.dispatch_unroll = dispatch_unroll
        self.use_vae_ema_for_ddm = use_vae_ema_for_ddm
        # config-selected metric logger (reference
        # `grasp_generation_trainer.py:175-201`); the JSONL fallback writes
        # the same logs/metrics.jsonl the Experiment API reads
        from .loggers import build_logger

        self.logger = build_logger(logger_cfg, experiment.log_dir)

        self.vae, self.ddm, self.diffusion = build_flagship(model_cfg)
        opt = optimizer_cfg or {}
        self.tx = build_optimizer(
            initial_lr=opt.get("initial_lr", 1e-3),
            scheduler=opt.get("scheduler"),
            grad_clip=opt.get("grad_clip", 0.5),
        )
        # logged next to the losses (the reference's LearningRateMonitor,
        # `grasp_generation_trainer.py:169`)
        from .optim import build_lr_schedule

        self._lr_schedule = build_lr_schedule(
            opt.get("initial_lr", 1e-3), opt.get("scheduler")
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
        else:
            fn = make_ddm_train_step(
                self.vae, self.ddm, self.diffusion, self.tx,
                ema_cfg=self.ema_cfg,
                cond_dropout=self.model_cfg.cond_dropout,
            )
        if self.steps_per_dispatch > 1:
            from .steps import make_chunked_step

            fn = make_chunked_step(fn, unroll=self.dispatch_unroll)
        return jax.jit(fn, donate_argnums=0)

    def _place(self, state: TrainState, batch):
        if self.mesh is None:
            return state, batch
        chunked = self.steps_per_dispatch > 1
        if jax.process_count() > 1:
            # multi-host: each process contributes its LOCAL batch slice;
            # skip if the prefetcher already assembled global arrays
            if all(isinstance(v, jax.Array) for v in batch.values()):
                return state, batch
            from ..parallel.distributed import make_global_batch

            return state, make_global_batch(
                batch, self.mesh, chunked=chunked
            )
        data = NamedSharding(
            self.mesh, P(None, "data") if chunked else P("data")
        )
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
        eval_fn=None,
    ) -> TrainState:
        """Run the training loop to ``max_steps``.

        Args:
            eval_fn: optional ``(state, frozen_vae) -> {"score": ..., ...}``
                periodic evaluation hook (``score``: higher is better), run
                every ``eval_every`` steps and logged with an ``eval_``
                prefix. When present, the ``best`` checkpoint tracks the
                best eval score; otherwise it tracks the lowest
                window-averaged train loss since the previous checkpoint
                (not one instantaneous batch loss).
        """
        if self._step_fn is None:
            self._step_fn = self._build_step()
        is_main = jax.process_index() == 0
        if self.mesh is not None and jax.process_count() > 1:
            # multi-host: every process holds the same host values
            # (deterministic init / restored checkpoint) — build global
            # replicated arrays across the whole mesh
            from ..parallel.distributed import replicate_tree

            state = replicate_tree(state, self.mesh)
            if frozen_vae is not None:
                frozen_vae = replicate_tree(frozen_vae, self.mesh)
        elif self.mesh is not None:
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
        best_score = -float("inf")
        topk = None
        if self.keep_top_k > 0:
            from .experiment import TopKCheckpoints

            topk = TopKCheckpoints(self.experiment, k=self.keep_top_k)
        window_losses: list = []  # logged losses since the last checkpoint
        # the step counter lives on the HOST: reading int(state.step) every
        # iteration would block on the device result and serialize host
        # dispatch with device compute (VERDICT r2); sync once on entry
        # (resume-aware) and count locally — one step per iteration.
        step = int(state.step)
        # K-steps-per-dispatch: each loop iteration advances K steps (the
        # batch is a stacked [K, ...] chunk and the step fn scans it), so
        # log/eval/ckpt fire on cadence-boundary CROSSINGS; the final
        # chunk may overshoot max_steps by up to K-1 steps.
        K = self.steps_per_dispatch
        if K > 1 and (max_steps - step) % K and is_main:
            print(
                f"[{self.stage}] note: {max_steps - step} steps not a "
                f"multiple of steps_per_dispatch={K}; the run will end at "
                f"step {step + ((max_steps - step + K - 1) // K) * K}"
            )
        last_logged = step
        for batch in batches:
            if step >= max_steps:
                break
            state, batch_dev = self._place(state, batch)
            if self.stage == "vae":
                state, metrics = self._step_fn(state, batch_dev, rng)
            else:
                state, metrics = self._step_fn(state, batch_dev, rng, frozen_vae)
            prev = step
            step += K
            if step // self.log_every > prev // self.log_every or prev == 0:
                metrics = _fetch_metrics(metrics)
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                metrics["steps_per_sec"] = (step - last_logged) / max(dt, 1e-9)
                last_logged = step
                metrics["lr"] = float(self._lr_schedule(step))
                if "loss" in metrics:
                    window_losses.append(metrics["loss"])
                if is_main:
                    self.logger.log(step, metrics)
                    print(
                        f"[{self.stage}] step {step}: "
                        + " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
                    )
            if (
                eval_fn is not None
                and self.eval_every
                and (
                    step // self.eval_every > prev // self.eval_every
                    or step >= max_steps
                )
            ):
                t_eval0 = time.perf_counter()
                eval_metrics = eval_fn(state, frozen_vae)
                if is_main:
                    self.logger.log(
                        step,
                        {f"eval_{k}": v for k, v in eval_metrics.items()},
                    )
                    print(
                        f"[{self.stage}] step {step} eval: "
                        + " ".join(
                            f"{k}={v:.4f}" for k, v in eval_metrics.items()
                        )
                    )
                # the score is replicated-identical across processes, so
                # every process takes the same branch and joins the
                # collective save (experiment.save_checkpoint)
                if eval_metrics.get("score", -float("inf")) > best_score:
                    best_score = eval_metrics["score"]
                    save_checkpoint(
                        self.experiment.checkpoint_path("best"), state
                    )
                # don't bill the eval span as train time — shift t_last by
                # the eval duration instead of resetting it, so train time
                # accrued since the last LOG boundary stays in the
                # steps_per_sec denominator
                t_last += time.perf_counter() - t_eval0
            if (
                step // self.ckpt_every > prev // self.ckpt_every
                or step >= max_steps
            ):
                save_checkpoint(self.experiment.checkpoint_path("last"), state)
                # window-averaged loss since the previous checkpoint — one
                # lucky batch can't pin `best` (or a top-k slot) forever
                if not window_losses:
                    # no log crossing since the previous checkpoint
                    # (ckpt cadence finer than log cadence): score this
                    # boundary on the current step's loss rather than
                    # skipping the update entirely
                    m = _fetch_metrics(metrics)
                    if "loss" in m:
                        window_losses.append(m["loss"])
                loss = (
                    float(np.mean(window_losses))
                    if window_losses
                    else float("inf")
                )
                # top-3-by-loss retention next to last/best (reference PL
                # ModelCheckpoint, `grasp_generation_trainer.py:146-173`)
                if topk is not None and np.isfinite(loss):
                    topk.update(step, loss, state)
                # best-by-loss fallback when no eval hook drives `best`
                if eval_fn is None or not self.eval_every:
                    if loss < best_loss:
                        best_loss = loss
                        save_checkpoint(
                            self.experiment.checkpoint_path("best"), state
                        )
                window_losses = []
        return state
