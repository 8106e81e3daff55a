"""Sharding / distributed layer: device meshes, ring collectives, and
the out-of-core streaming pipeline."""

from .mesh import (
    POINTS_AXIS,
    make_mesh,
    put_replicated,
    put_sharded,
    replicated_spec,
    shard_cloud_spec,
)
from .sharded import (
    global_stats_local,
    icp_sharded_loop,
    icp_sharded_step,
    make_distributed_morton_sort,
    make_sharded_batch_icp,
    make_sharded_gicp,
    make_sharded_icp,
    make_sharded_icp_p2plane,
    make_sharded_fpfh,
    make_sharded_global_registration,
    make_sharded_knn,
    make_sharded_match_descriptors,
    make_sharded_ndt,
    make_sharded_normals,
    make_sharded_normals_window,
    make_sharded_tsdf,
    morton_presort,
    make_sharded_outlier_stats,
    make_sharded_voxel_filter,
    ring_knn_local,
    ShardedTsdf,
    ShardedTsdfState,
    ShardedFrameToModelOdometry,
)

__all__ = [
    "POINTS_AXIS", "make_mesh", "put_replicated", "put_sharded",
    "replicated_spec", "shard_cloud_spec",
    "global_stats_local", "icp_sharded_loop", "icp_sharded_step",
    "make_distributed_morton_sort",
    "make_sharded_batch_icp", "make_sharded_gicp", "make_sharded_icp",
    "make_sharded_icp_p2plane", "make_sharded_knn",
    "make_sharded_fpfh", "make_sharded_match_descriptors",
    "make_sharded_global_registration",
    "make_sharded_ndt",
    "make_sharded_normals", "make_sharded_normals_window",
    "make_sharded_tsdf",
    "morton_presort", "make_sharded_outlier_stats",
    "make_sharded_voxel_filter",
    "ring_knn_local",
    "ShardedTsdf", "ShardedTsdfState", "ShardedFrameToModelOdometry",
]
