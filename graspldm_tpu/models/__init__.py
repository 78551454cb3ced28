from .conditioning import ClassConditionedGraspLatentDDM, ClassTimeConditionedResNet1D
from .grasp_classifier import PointsBasedGraspClassifier
from .grasp_ldm import GraspLatentDDM
from .grasp_vae import GraspCVAE, VAEBottleneck
from .pc_decoders import PVCNNDecoder, PVCNNInvert
from .pvcnn import PVCNN, PVCNNEncoder, PVConv, SharedMLP
from .pvcnn2 import PVCNN2, PVCNN2Encoder, PointNetFPModule, PointNetSAModule
from .resnet1d import ResNet1D, TimeConditionedResNet1D
from .unet1d import Unet1D

from ..config import MODELS

for _m in (
    GraspCVAE,
    GraspLatentDDM,
    ClassConditionedGraspLatentDDM,
    PointsBasedGraspClassifier,
    PVCNNEncoder,
    PVCNN2Encoder,
    PVCNNDecoder,
    ResNet1D,
    TimeConditionedResNet1D,
    ClassTimeConditionedResNet1D,
    Unet1D,
):
    if _m.__name__ not in MODELS:
        MODELS.register(_m)

__all__ = [
    "ClassConditionedGraspLatentDDM",
    "ClassTimeConditionedResNet1D",
    "PointsBasedGraspClassifier",
    "GraspLatentDDM",
    "GraspCVAE",
    "VAEBottleneck",
    "PVCNNDecoder",
    "PVCNNInvert",
    "PVCNN",
    "PVCNNEncoder",
    "PVConv",
    "SharedMLP",
    "PVCNN2",
    "PVCNN2Encoder",
    "PointNetFPModule",
    "PointNetSAModule",
    "ResNet1D",
    "TimeConditionedResNet1D",
    "Unet1D",
]
