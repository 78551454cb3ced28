from .gaussian import GaussianDiffusion1D
from .schedules import DiffusionSchedule, make_beta_schedule

__all__ = ["GaussianDiffusion1D", "DiffusionSchedule", "make_beta_schedule"]
