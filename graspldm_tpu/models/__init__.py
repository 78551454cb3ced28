from .grasp_ldm import GraspLatentDDM
from .grasp_vae import GraspCVAE, VAEBottleneck
from .pvcnn import PVCNN, PVCNNEncoder, PVConv, SharedMLP
from .resnet1d import ResNet1D, TimeConditionedResNet1D

__all__ = [
    "GraspLatentDDM",
    "GraspCVAE",
    "VAEBottleneck",
    "PVCNN",
    "PVCNNEncoder",
    "PVConv",
    "SharedMLP",
    "ResNet1D",
    "TimeConditionedResNet1D",
]
