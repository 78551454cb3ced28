"""Exponential moving average of parameters, in-graph.

Reproduces the semantics of the `ema_pytorch.EMA` wrapper used by the
reference trainer (`grasp_ldm/trainers/mixins.py:8-65`; defaults beta=0.990,
update_after_step=1000, update_every=5 and hidden defaults inv_gamma=1,
power=2/3):

  * before ``update_after_step`` the EMA copies the online weights;
  * afterwards, every ``update_every`` optimizer steps the decay ramps as
    ``min(beta, 1 - (1 + epoch/inv_gamma)^(-power))`` with
    ``epoch = step - update_after_step - 1``.

Implemented as a pure pytree function with `lax`-friendly control flow so it
lives inside the jitted train step (no host-side EMA object).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["EMAConfig", "ema_update"]


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    beta: float = 0.990
    update_after_step: int = 1000
    update_every: int = 5
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0


def current_decay(step: jax.Array, cfg: EMAConfig) -> jax.Array:
    """Decay at optimizer step ``step`` (0 during warm-up/copy phase)."""
    epoch = jnp.maximum(step.astype(jnp.float32) - cfg.update_after_step - 1, 0.0)
    value = 1.0 - (1.0 + epoch / cfg.inv_gamma) ** (-cfg.power)
    return jnp.where(epoch <= 0.0, 0.0, jnp.minimum(cfg.beta, value))


def ema_update(
    ema_params: Any, online_params: Any, step: jax.Array, cfg: EMAConfig
) -> Any:
    """One conditional EMA update (called once per optimizer step).

    Between scheduled updates the EMA is left untouched; at update steps
    ``ema = decay * ema + (1 - decay) * online`` (decay 0 -> plain copy).
    """
    do_update = (step % cfg.update_every) == 0
    decay = current_decay(step, cfg)

    def blend(e, o):
        new = decay * e + (1.0 - decay) * o
        return jnp.where(do_update, new, e)

    return jax.tree.map(blend, ema_params, online_params)
