from .acronym import (
    AcronymShapenetPointclouds,
    ObjectGrasps,
    load_data_splits,
    minmax_normalize,
)
from .augmentations import (
    AugmentationPipeline,
    PointcloudJitter,
    RandomPointcloudDropout,
    RandomRotation,
    RandomTinyPosePerturbation,
    build_augmentations,
)
from .camera import PinholeCamera, depth_to_pointcloud_np
from .grasp_points import (
    AcronymGraspPointsDataset,
    AcronymPartialGraspPointsDataset,
    gripper_surface_points,
)
from .mesh import Mesh, load_obj, sample_surface
from .partial import AcronymPartialPointclouds
from .synthetic import make_synthetic_acronym

__all__ = [
    "AcronymShapenetPointclouds",
    "AcronymPartialPointclouds",
    "AcronymGraspPointsDataset",
    "gripper_surface_points",
    "ObjectGrasps",
    "load_data_splits",
    "minmax_normalize",
    "AugmentationPipeline",
    "PointcloudJitter",
    "RandomPointcloudDropout",
    "RandomRotation",
    "RandomTinyPosePerturbation",
    "build_augmentations",
    "PinholeCamera",
    "depth_to_pointcloud_np",
    "Mesh",
    "load_obj",
    "sample_surface",
    "make_synthetic_acronym",
]
