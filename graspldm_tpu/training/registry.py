"""Trainer registry (the reference's E_Trainers equivalent).

`grasp_ldm/trainers/__init__.py:12-53` maps string names to trainer classes
for the CLI; this is the same surface for the TPU trainers.
"""

from __future__ import annotations

from typing import Callable, Dict

__all__ = ["TRAINERS", "get_trainer"]


def _vae(**kwargs):
    from .trainer import GraspGenerationTrainer

    return GraspGenerationTrainer(stage="vae", **kwargs)


def _ddm(**kwargs):
    from .trainer import GraspGenerationTrainer

    return GraspGenerationTrainer(stage="ddm", **kwargs)


def _elucidated_ddm(**kwargs):
    from .trainer import GraspGenerationTrainer

    return GraspGenerationTrainer(stage="elucidated_ddm", **kwargs)


def _classifier(**kwargs):
    from .classifier_trainer import GraspClassificationTrainer

    return GraspClassificationTrainer(**kwargs)


TRAINERS: Dict[str, Callable] = {
    "vae": _vae,
    "ddm": _ddm,
    "elucidated_ddm": _elucidated_ddm,
    "classifier": _classifier,
}


def get_trainer(name: str) -> Callable:
    if name not in TRAINERS:
        raise KeyError(f"Unknown trainer {name!r}; available: {sorted(TRAINERS)}")
    return TRAINERS[name]
