"""Metric loggers: JSONL (always), W&B / TensorBoard when available.

Mirrors the reference's logger selection
(`grasp_ldm/trainers/__init__.py:5-9`, `grasp_generation_trainer.py:175-201`:
{WandbLogger, TensorBoardLogger, CSVLogger}); the baked environment may lack
wandb/tensorboard, so both are optional and the JSONL fallback always works.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

__all__ = ["build_logger", "JsonlLogger", "WandbLogger", "TensorBoardLogger"]


class JsonlLogger:
    """Append-only JSONL metrics (the CSV-logger equivalent)."""

    def __init__(self, log_dir: str, **_):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def finish(self) -> None:
        pass


class WandbLogger(JsonlLogger):
    def __init__(self, log_dir: str, project: str = "graspldm-tpu", **kwargs):
        super().__init__(log_dir)
        import wandb  # raises ImportError when unavailable

        self._run = wandb.init(project=project, dir=log_dir, **kwargs)

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        super().log(step, metrics)
        self._run.log({k: float(v) for k, v in metrics.items()}, step=int(step))

    def finish(self) -> None:
        self._run.finish()


class TensorBoardLogger(JsonlLogger):
    def __init__(self, log_dir: str, **_):
        super().__init__(log_dir)
        from flax.metrics import tensorboard  # needs tensorflow

        self._writer = tensorboard.SummaryWriter(log_dir)

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        super().log(step, metrics)
        for k, v in metrics.items():
            self._writer.scalar(k, float(v), int(step))

    def finish(self) -> None:
        self._writer.flush()


def build_logger(cfg: Optional[Dict[str, Any]], log_dir: str):
    """``dict(type="WandbLogger"|"TensorBoardLogger"|..., **args)`` -> logger.

    Falls back to JSONL when the requested backend's deps are missing.
    """
    kind = (cfg or {}).get("type", "JsonlLogger")
    args = {k: v for k, v in (cfg or {}).items() if k != "type"}
    try:
        cls = {
            "JsonlLogger": JsonlLogger,
            "CSVLogger": JsonlLogger,
            "WandbLogger": WandbLogger,
            "TensorBoardLogger": TensorBoardLogger,
        }[kind]
        return cls(log_dir, **args)
    except (ImportError, KeyError):
        return JsonlLogger(log_dir)
