from .pipeline import decode_and_postprocess, ldm_generate, vae_generate
from .sharded import make_sharded_ldm_generate, make_sharded_vae_generate
from .classifier import InferenceClassifier
from .runner import (
    AcronymGroundTruthModel,
    ExperimentPaths,
    InferenceBase,
    InferenceLDM,
    InferenceVAE,
)

__all__ = [
    "decode_and_postprocess",
    "ldm_generate",
    "vae_generate",
    "make_sharded_ldm_generate",
    "make_sharded_vae_generate",
    "AcronymGroundTruthModel",
    "ExperimentPaths",
    "InferenceBase",
    "InferenceClassifier",
    "InferenceLDM",
    "InferenceVAE",
]
