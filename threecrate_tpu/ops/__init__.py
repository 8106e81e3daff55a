"""Compute ops: the TPU-native threecrate-algorithms."""

from . import (
    colorization,
    features,
    filtering,
    gicp,
    global_registration,
    ground,
    kiss_icp,
    linalg,
    mesh_boolean,
    mesh_smoothing,
    morton,
    ndt,
    neighbors,
    normals,
    point_cloud_ops,
    registration,
    segmentation,
    tsdf,
    voxel_hash,
)

__all__ = [
    "colorization", "features", "filtering", "gicp",
    "global_registration", "ground", "kiss_icp", "linalg",
    "mesh_boolean", "mesh_smoothing", "morton", "ndt", "neighbors",
    "normals", "point_cloud_ops", "registration", "segmentation",
    "tsdf", "voxel_hash",
]
