from .elucidated import ElucidatedDiffusion
from .gaussian import GaussianDiffusion1D
from .guidance import make_success_guidance
from .schedules import DiffusionSchedule, make_beta_schedule

__all__ = [
    "ElucidatedDiffusion",
    "GaussianDiffusion1D",
    "DiffusionSchedule",
    "make_beta_schedule",
    "make_success_guidance",
]
