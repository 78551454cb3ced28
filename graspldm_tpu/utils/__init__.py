from . import normalization, rotations

__all__ = ["normalization", "rotations"]
