"""Compute ops: the TPU-native threecrate-algorithms."""

from . import (
    colorization,
    features,
    filtering,
    frame_to_model,
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
    tsdf_raycast,
    tsdf_sparse,
    voxel_hash,
)

__all__ = [
    "colorization", "features", "filtering", "frame_to_model", "gicp",
    "global_registration", "ground", "kiss_icp", "linalg",
    "mesh_boolean", "mesh_smoothing", "morton", "ndt", "neighbors",
    "normals", "point_cloud_ops", "registration", "segmentation",
    "tsdf", "tsdf_raycast", "tsdf_sparse", "voxel_hash",
]
