"""End-to-end pipeline models.

The reference ships its pipelines as examples (examples/*.rs:
las_laz_example, pipeline examples, kiss-icp demo); here they are
first-class jittable objects so a production deployment compiles each
pipeline ONCE and replays it at sensor rate. Everything runs on fixed
shapes: construct a model for a capacity, feed any scan padded to it.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.point_cloud import PointCloud
from ..core.transform import Transform


class PerceptionResult(NamedTuple):
    transform: jnp.ndarray      # (4, 4) src → tgt alignment
    mse: jnp.ndarray            # () final correspondence MSE
    normals: jnp.ndarray        # (N, 3) target normals
    curvature: jnp.ndarray      # (N,) target surface variation


class PerceptionStep:
    """Normals + ICP scan-pair alignment as ONE fused device program —
    the framework's flagship forward step (the two headline workloads
    of BASELINE.md in a single jit, zero host syncs in between).

    >>> step = PerceptionStep(k=10, max_iterations=20)
    >>> res = step(src_pts, src_mask, tgt_pts, tgt_mask)
    """

    def __init__(self, k: int = 10, max_iterations: int = 20,
                 conv_thresh: float = 1e-6):
        self.k = int(k)
        self.max_iterations = int(max_iterations)
        self.conv_thresh = float(conv_thresh)
        self._fn = jax.jit(functools.partial(
            _perception_step, k=self.k,
            max_iterations=self.max_iterations,
            conv_thresh=self.conv_thresh))

    def __call__(self, src, src_mask, tgt, tgt_mask) -> PerceptionResult:
        t, mse, nrm, curv = self._fn(jnp.asarray(src), jnp.asarray(src_mask),
                                     jnp.asarray(tgt), jnp.asarray(tgt_mask))
        return PerceptionResult(t, mse, nrm, curv)


@functools.partial(jax.jit, static_argnames=("k", "max_iterations"))
def _perception_step(src, src_mask, tgt, tgt_mask, *, k, max_iterations,
                     conv_thresh):
    from ..ops.normals import _estimate
    from ..ops.registration import _icp_p2p

    big = jnp.float32(3e38)
    mn = jnp.min(jnp.where(tgt_mask[:, None], tgt, big), 0)
    mx = jnp.max(jnp.where(tgt_mask[:, None], tgt, -big), 0)
    vp = (mn + mx) * 0.5 + jnp.array([0.0, 0.0, 1.0]) * \
        jnp.maximum(mx[2] - mn[2], 1.0)
    # shapes are static under jit, so the same size thresholds the
    # public entries use dispatch here at trace time: the fused union
    # window normals and the static-sort ICP correspondence above the
    # brute-force crossover (hardcoding the exact paths made the
    # flagship step O(N²) at 1M — caught on hardware in round 2)
    from ..ops.normals import AUTO_WINDOW_THRESHOLD
    from ..ops.registration import CORRESPONDENCE_WINDOW_THRESHOLD
    n_t = tgt.shape[0]
    big_cloud = n_t >= AUTO_WINDOW_THRESHOLD
    nrm, curv, _valid = _estimate(
        tgt, tgt_mask, k, False, jnp.float32(0.0), vp, True,
        moments=big_cloud, window_merge="union" if big_cloud else "tighter")
    use_window = src.shape[0] * n_t > CORRESPONDENCE_WINDOW_THRESHOLD
    t, mse, _it, _conv, _n = _icp_p2p(
        src, src_mask, tgt, tgt_mask, jnp.eye(4, dtype=jnp.float32),
        max_iterations, jnp.float32(conv_thresh), jnp.float32(jnp.inf),
        window=use_window)
    return t, mse, nrm, curv


class OdometryModel:
    """Scan-to-map LiDAR odometry (KISS-ICP): feed scans, read poses.

    Thin model wrapper over :class:`ops.kiss_icp.KissIcpOdometry` so
    the odometry pipeline sits beside the other flagship models.
    """

    def __init__(self, **config):
        from ..ops.kiss_icp import KissIcpConfig, KissIcpOdometry
        cfg = KissIcpConfig(**config) if config else KissIcpConfig()
        self._odom = KissIcpOdometry(cfg)
        self.poses = []

    def step(self, scan: PointCloud) -> Transform:
        """Register one scan; returns the (4, 4) world pose."""
        pose = self._odom.register_frame(scan)
        self.poses.append(pose)
        return pose

    @property
    def local_map(self):
        return self._odom.local_map


class RegistrationModel:
    """Global init (FPFH + RANSAC) → ICP refinement, the full
    coarse-to-fine registration recipe (reference:
    global_registration.rs:185-207 + registration.rs chained)."""

    def __init__(self, max_iterations: int = 30, **global_config):
        from ..ops.global_registration import GlobalRegistrationConfig
        self.max_iterations = int(max_iterations)
        self.config = (GlobalRegistrationConfig(**global_config)
                       if global_config else GlobalRegistrationConfig())

    def __call__(self, source: PointCloud, target: PointCloud):
        from ..ops import global_registration, registration
        init = global_registration.global_registration(
            source, target, self.config)
        res = registration.icp_point_to_point(
            source, target, max_iterations=self.max_iterations,
            init=init.as_transform())
        return res


class ReconstructionModel:
    """Points → mesh: outlier filter → normals → surface
    reconstruction (data-driven algorithm choice + fallback chain) →
    simplification (reference: pipeline.rs:814-846 auto_reconstruct)."""

    def __init__(self, k: int = 10, target_faces: Optional[int] = None):
        self.k = int(k)
        self.target_faces = target_faces

    def __call__(self, cloud: PointCloud):
        from ..ops import filtering, normals as normals_mod
        from ..reconstruction import pipeline as recon
        from .. import simplification

        filt = filtering.statistical_outlier_removal(cloud, k=self.k)
        clean = filt.cloud.compact()
        withn = normals_mod.estimate_normals(clean, k=self.k)
        mesh = recon.auto_reconstruct(withn)
        if self.target_faces is not None:
            mesh = simplification.simplify_mesh(mesh, self.target_faces)
        return mesh
