from .ema import EMAConfig, ema_update
from .optim import build_lr_schedule, build_optimizer
from .state import TrainState
from .steps import (
    VAELossConfig,
    init_train_state,
    make_ddm_train_step,
    make_chunked_step,
    make_vae_train_step,
)

__all__ = [
    "EMAConfig",
    "ema_update",
    "build_lr_schedule",
    "build_optimizer",
    "TrainState",
    "VAELossConfig",
    "init_train_state",
    "make_ddm_train_step",
    "make_chunked_step",
    "make_vae_train_step",
]
