"""Train state pytrees."""

from __future__ import annotations

from typing import Any

import jax
from flax import struct

__all__ = ["TrainState"]


class TrainState(struct.PyTreeNode):
    """Parameters + optimizer + EMA + mutable collections for one model.

    The checkpoint layout {params, ema_params, opt_state, step} mirrors the
    reference's dual-prefix checkpoints (`model.` / `ema_model.online_model.`,
    SURVEY.md §5 checkpoint/resume) as separate pytrees instead of key
    prefixes.
    """

    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any = None
    batch_stats: Any = None
    constants: Any = None  # frozen variables (e.g. random Fourier weights)

    def variables(self, use_ema: bool = False) -> dict:
        v = {"params": self.ema_params if use_ema else self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        if self.constants is not None:
            v["constants"] = self.constants
        return v
