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


def _classifier(**kwargs):
    raise NotImplementedError(
        "Use graspldm_tpu.training.classifier.make_classifier_train_step with a "
        "host loop; a high-level classifier trainer lands with the next round."
    )


TRAINERS: Dict[str, Callable] = {
    "vae": _vae,
    "ddm": _ddm,
    "classifier": _classifier,
}


def get_trainer(name: str) -> Callable:
    if name not in TRAINERS:
        raise KeyError(f"Unknown trainer {name!r}; available: {sorted(TRAINERS)}")
    return TRAINERS[name]
