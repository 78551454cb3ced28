"""Experiment directory layout + Orbax checkpointing.

Rebuild of `grasp_ldm/trainers/experiment.py:7-118` and the PL ModelCheckpoint
behavior (`grasp_ldm/trainers/grasp_generation_trainer.py:146-173`): an
experiment dir ``{out_root}/{exp_name}/{model_mode}/`` holds ``checkpoints/``
(``last`` + best-by-loss) and ``logs/``; the config file is copied next to the
checkpoints so the dir is self-describing.

Checkpoints are Orbax pytrees ``{params, ema_params, opt_state, batch_stats,
constants, step}`` — the functional equivalent of the reference's dual-prefix
torch checkpoints (`model.` / `ema_model.online_model.`).
"""

from __future__ import annotations

import json
import os
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState

__all__ = [
    "Experiment",
    "TopKCheckpoints",
    "save_checkpoint",
    "restore_checkpoint",
]


class Experiment:
    """Filesystem layout for a two-stage experiment."""

    MODES = ("vae", "ddm", "elucidated_ddm", "classifier")

    def __init__(self, out_root: str, exp_name: str, mode: str):
        assert mode in self.MODES, f"mode must be one of {self.MODES}"
        self.out_root = out_root
        self.exp_name = exp_name
        self.mode = mode
        self.exp_dir = os.path.join(out_root, exp_name)
        self.mode_dir = os.path.join(self.exp_dir, mode)
        self.ckpt_dir = os.path.join(self.mode_dir, "checkpoints")
        self.log_dir = os.path.join(self.mode_dir, "logs")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)

    def copy_config(self, config_path: str) -> None:
        if config_path and os.path.exists(config_path):
            shutil.copy(config_path, self.mode_dir)

    def checkpoint_path(self, name: str = "last") -> str:
        return os.path.join(self.ckpt_dir, name)

    def sibling(self, mode: str) -> "Experiment":
        """Experiment for another stage of the same run (e.g. vae for ddm)."""
        return Experiment(self.out_root, self.exp_name, mode)

    def log_metrics(self, step: int, metrics: dict) -> None:
        """Append a CSV-ish JSONL metrics record."""
        rec = {"step": int(step)}
        for k, v in metrics.items():
            rec[k] = float(v) if np.isscalar(v) or hasattr(v, "item") else v
        with open(os.path.join(self.log_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")


class TopKCheckpoints:
    """Retain the k best checkpoints by a score next to ``last``/``best``.

    The reference keeps the top-3 checkpoints by loss via a PL
    ModelCheckpoint (`grasp_ldm/trainers/grasp_generation_trainer.py:146-173`)
    so a late-training regression still leaves fallback candidates. Saved
    checkpoints are named ``topk_step{N}``; a ``topk.json`` index next to
    them records scores and survives restarts (stale entries whose
    checkpoint dir disappeared are dropped on load).

    Multi-host: the underlying :func:`save_checkpoint` is a collective, so
    every process must call :meth:`update`; the decision is deterministic
    given replicated scores, and index/prune filesystem mutations run on
    the primary process only.
    """

    def __init__(self, experiment: Experiment, k: int = 3,
                 higher_better: bool = False):
        self.experiment = experiment
        self.k = int(k)
        self.higher_better = higher_better
        self.index_path = os.path.join(experiment.ckpt_dir, "topk.json")
        self.entries: list = []  # sorted best-first
        if os.path.exists(self.index_path):
            try:
                with open(self.index_path) as f:
                    loaded = json.load(f)
            except (json.JSONDecodeError, OSError):
                loaded = []
            self.entries = [
                e for e in loaded
                if os.path.exists(experiment.checkpoint_path(e["name"]))
            ]
            self._sort()

    def _sort(self) -> None:
        self.entries.sort(
            key=lambda e: e["score"], reverse=self.higher_better
        )

    def _better(self, a: float, b: float) -> bool:
        return a > b if self.higher_better else a < b

    def update(self, step: int, score: float, state: TrainState) -> bool:
        """Consider ``(step, score)``; save and prune when it ranks top-k.

        Returns True when a checkpoint was written.
        """
        if self.k <= 0:
            return False
        score = float(score)
        if len(self.entries) >= self.k and not self._better(
            score, self.entries[-1]["score"]
        ):
            return False
        name = f"topk_step{int(step):08d}"
        save_checkpoint(self.experiment.checkpoint_path(name), state)
        self.entries = [e for e in self.entries if e["name"] != name]
        self.entries.append(
            {"step": int(step), "score": score, "name": name}
        )
        self._sort()
        primary = jax.process_index() == 0
        while len(self.entries) > self.k:
            drop = self.entries.pop()
            path = self.experiment.checkpoint_path(drop["name"])
            if primary and os.path.exists(path):
                shutil.rmtree(path)
        if primary:
            with open(self.index_path, "w") as f:
                json.dump(self.entries, f, indent=1)
        return True


def save_checkpoint(path: str, state: TrainState) -> None:
    """Save a TrainState with Orbax (overwrites atomically).

    The previous checkpoint is kept until the replacement is fully written:
    save to a sibling temp dir, then swap. A crash or preemption mid-save
    therefore never destroys the only resume point.

    Multi-host: Orbax's save is a COLLECTIVE (it synchronizes all
    processes internally), so every process must call this — gating it on
    process 0 deadlocks the barrier. The filesystem mutations (cleanup +
    atomic swap) run on the primary only, fenced by global syncs.
    """
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    old = path + ".old"
    multihost = jax.process_count() > 1
    primary = jax.process_index() == 0
    if primary:
        for stale in (tmp, old):
            if os.path.exists(stale):
                shutil.rmtree(stale)
    if multihost:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"graspldm:ckpt_pre:{path}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp, jax.device_get(state))
    ckptr.wait_until_finished()
    if multihost:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"graspldm:ckpt_mid:{path}")
    if primary:
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)
    if multihost:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"graspldm:ckpt_post:{path}")


def restore_checkpoint(path: str, target: TrainState) -> TrainState:
    """Restore a TrainState saved by :func:`save_checkpoint`."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=jax.device_get(target))
