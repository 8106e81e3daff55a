"""KISS-ICP odometry registration (Vizzo et al., IROS 2023).

TPU-native rework of threecrate-algorithms/src/kiss_icp.rs: range
gating [min,max] (kiss_icp.rs:57-70), voxel downsampling of the source
scan, the adaptive correspondence threshold
``σ = clamp(3·‖motion‖, 3·voxel, 10·voxel)`` (kiss_icp.rs:72-96), and a
point-to-point loop with per-iteration Kabsch (kiss_icp.rs:98-151,
:231-290). The preprocessing reuses ops.filtering; the loop reuses the
jitted registration skeleton with the adaptive threshold as the
correspondence gate.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..core.point_cloud import PointCloud
from ..core.transform import Transform
from . import filtering, registration


@dataclasses.dataclass(frozen=True)
class KissIcpConfig:
    """Mirrors KissIcpConfig defaults (kiss_icp.rs:28-49)."""

    voxel_size: float = 1.0
    max_range: float = 100.0
    min_range: float = 0.5
    max_iterations: int = 50
    convergence_threshold: float = 1e-6


def motion_magnitude(t: Transform) -> float:
    """Characteristic displacement of a rigid motion: ‖t‖ plus the
    rotational sweep at 10 m lever arm (used for the adaptive σ)."""
    trans = float(jnp.linalg.norm(t.translation))
    cos_theta = (float(jnp.trace(t.rotation)) - 1.0) / 2.0
    theta = float(np.arccos(np.clip(cos_theta, -1.0, 1.0)))
    return trans + 10.0 * theta


def adaptive_threshold(config: KissIcpConfig,
                       init: Optional[Transform]) -> float:
    """σ = clamp(3·‖motion(init)‖, 3·voxel, 10·voxel) (kiss_icp.rs:72-96)."""
    motion = motion_magnitude(init) if init is not None else 0.0
    return float(np.clip(3.0 * motion,
                         3.0 * config.voxel_size,
                         10.0 * config.voxel_size))


def preprocess(cloud: PointCloud, config: KissIcpConfig) -> PointCloud:
    """Range gate + voxel downsample (kiss_icp.rs:57-70)."""
    gated = filtering.range_filter(cloud, config.min_range,
                                   config.max_range).cloud
    return filtering.voxel_grid_filter(gated, config.voxel_size)


def kiss_icp(source: PointCloud, target: PointCloud,
             config: KissIcpConfig = KissIcpConfig(),
             init: Optional[Transform] = None) -> registration.ICPResult:
    """Register a LiDAR scan against a local map, KISS-ICP style."""
    src = preprocess(source, config)
    tgt_gated = filtering.range_filter(target, config.min_range,
                                       config.max_range).cloud
    sigma = adaptive_threshold(config, init)
    return registration.icp_point_to_point(
        src, tgt_gated,
        max_iterations=config.max_iterations,
        convergence_threshold=config.convergence_threshold,
        max_correspondence_distance=sigma,
        init=init)


class KissIcpOdometry:
    """Frame-to-map odometry pipeline: keeps a voxel-downsampled local
    map and a constant-velocity motion prior, mirroring the intended
    usage of the reference's kiss_icp entry.

    The local map is DEVICE-RESIDENT at a fixed padded capacity: the
    first formulation round-tripped the map through numpy every frame
    (~50 MB of host<->device transfers per 1M-point frame — several
    seconds over a tunneled TPU, and needless PCIe traffic on any
    host), and let the map's padded shape grow, re-tracing the
    registration program every few frames. Fixed shapes + resident
    arrays = one compile per program and zero per-frame transfers.
    """

    def __init__(self, config: KissIcpConfig = KissIcpConfig(),
                 map_capacity: int = 1 << 18):
        from ..utils import padding
        self.config = config
        self.map_capacity = padding.round_up(map_capacity, 128)
        self.pose = Transform.identity()
        self._prev_delta = Transform.identity()
        self._map_pc: Optional[PointCloud] = None

    @property
    def local_map(self) -> Optional[PointCloud]:
        return self._map_pc

    def register_frame(self, scan: PointCloud) -> Transform:
        src = preprocess(scan, self.config)
        if self._map_pc is None:
            self.pose = Transform.identity()
            self._update_map(src, self.pose)
            return self.pose
        prior = self.pose @ self._prev_delta  # constant-velocity prediction
        result = kiss_icp(src, self.local_map, self.config, init=prior)
        new_pose = Transform(result.transformation)
        self._prev_delta = self.pose.inverse() @ new_pose
        self.pose = new_pose
        self._update_map(src, new_pose)
        return self.pose

    def _update_map(self, scan: PointCloud, pose: Transform) -> None:
        import jax.numpy as jnp
        world = scan.transform(pose)               # device
        if self._map_pc is None:
            merged = PointCloud(world.points, world.mask, {})
        else:
            merged = PointCloud(
                jnp.concatenate([self._map_pc.points, world.points]),
                jnp.concatenate([self._map_pc.mask, world.mask]), {})
        dedup = filtering.voxel_grid_filter(merged,
                                            self.config.voxel_size)
        # voxel output packs valid centroids to the front: cropping to
        # the fixed map capacity keeps shapes pinned; overflow drops
        # the back of the voxel order (spatially arbitrary — size the
        # capacity for the scene)
        self._map_pc = PointCloud(dedup.points[:self.map_capacity],
                                  dedup.mask[:self.map_capacity], {})
