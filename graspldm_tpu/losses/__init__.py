from .losses import (
    ClassificationLoss,
    GraspControlPointsReconstructionLoss,
    GraspReconstructionLoss,
    QualityLoss,
    VAELatentLoss,
    VAEReconstructionLoss,
    bce_with_logits,
    cyclical_annealing_weight,
)

__all__ = [
    "ClassificationLoss",
    "GraspControlPointsReconstructionLoss",
    "GraspReconstructionLoss",
    "QualityLoss",
    "VAELatentLoss",
    "VAEReconstructionLoss",
    "bce_with_logits",
    "cyclical_annealing_weight",
]
