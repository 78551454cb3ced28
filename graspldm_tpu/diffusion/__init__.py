from .elucidated import ElucidatedDiffusion
from .gaussian import GaussianDiffusion1D
from .schedules import DiffusionSchedule, make_beta_schedule

__all__ = [
    "ElucidatedDiffusion",
    "GaussianDiffusion1D",
    "DiffusionSchedule",
    "make_beta_schedule",
]
