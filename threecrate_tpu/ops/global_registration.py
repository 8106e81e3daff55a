"""FPFH + RANSAC global registration.

TPU-native rework of threecrate-algorithms/src/global_registration.rs:
normals → FPFH on both clouds → brute-force descriptor matching
(global_registration.rs:93-111) → RANSAC over 3-point samples with SVD
transform estimation (:115-150) and inlier counting (:152-168) →
optional ICP refinement (:185-213).

The reference runs its ≤50k RANSAC iterations sequentially with early
exit; here hypotheses are **vmapped in parallel batches** — sample all
3-point triples at once with a JAX PRNG, fit all transforms as one
batched Kabsch, and score every hypothesis against every correspondence
as a batched matmul. Early exit becomes "process batches until the
inlier-ratio target is met" at the batch level.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.errors import InvalidDataError
from ..core.point_cloud import PointCloud
from ..core.transform import Transform
from . import features, linalg, registration
from .normals import NormalEstimationConfig, estimate_normals_detailed


@dataclasses.dataclass(frozen=True)
class GlobalRegistrationConfig:
    """Mirrors GlobalRegistrationConfig (global_registration.rs:27-62)."""

    ransac_iterations: int = 50_000
    distance_threshold: float = 0.05
    inlier_ratio: float = 0.25
    fpfh_radius: float = 0.25
    max_correspondences: int = 2048
    # Source descriptors are strided down to this many before matching
    # (0 = use all). At 1M x 1M the all-pairs 33-d matching is ~66
    # TFLOP; 16k well-distributed queries give RANSAC the same pose
    # evidence at 1/60th the cost (the reference brute-forces all
    # pairs on CPU threads — global_registration.rs:93-111 — which is
    # exactly what does not scale).
    max_query_descriptors: int = 16384
    # Opt-in FPFH fast tier (FpfhConfig.band): ±band Morton-window SPFH
    # candidates instead of the exact 3-tile sweep. Because global
    # registration matches descriptors ACROSS two differently-oriented
    # clouds, only use this with a band density-matched to fpfh_radius
    # (coverage is Morton-order-dependent once neighborhoods outgrow
    # ~2·(2·band+1) candidates — see FpfhConfig.band).
    fpfh_band: Optional[int] = None
    refine_with_icp: bool = True
    icp_max_iterations: int = 30
    k_normals: int = 10
    hypothesis_batch: int = 4096
    mutual_check: bool = True
    seed: int = 0


class GlobalRegistrationResult(NamedTuple):
    """Mirrors GlobalRegistrationResult (global_registration.rs:70-80)."""

    transformation: jnp.ndarray
    inlier_count: jnp.ndarray
    inlier_ratio: jnp.ndarray
    converged: jnp.ndarray
    mse: jnp.ndarray

    def as_transform(self) -> Transform:
        return Transform(self.transformation)


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def _ransac_batch(key, src_pts, tgt_pts, corr_ok, n_hyp, dist_thresh):
    """Fit + score ``n_hyp`` hypotheses at once.

    src_pts/tgt_pts: (M, 3) matched pairs (invalid pairs masked).
    Returns (best transform, best inlier count).
    """
    m = src_pts.shape[0]
    # sample 3 correspondence indices per hypothesis, biased to valid
    # pairs by resampling invalid picks through modular probing
    probs = corr_ok.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    idx = jax.random.choice(key, m, shape=(n_hyp, 3), p=probs)

    s3 = src_pts[idx]                       # (H, 3, 3)
    t3 = tgt_pts[idx]
    w3 = jnp.ones((n_hyp, 3), jnp.float32)
    fit = jax.vmap(linalg.kabsch)(s3, t3, w3)   # (H, 4, 4)

    # score: ‖R s + t − t‖ < τ for every correspondence (batched matmul)
    moved = jnp.einsum("hij,mj->hmi", fit[:, :3, :3], src_pts,
                       precision=jax.lax.Precision.HIGHEST) \
        + fit[:, None, :3, 3]
    d2 = jnp.sum((moved - tgt_pts[None]) ** 2, axis=-1)     # (H, M)
    inlier = (d2 <= dist_thresh * dist_thresh) & corr_ok[None, :]
    counts = jnp.sum(inlier, axis=1)
    best = jnp.argmax(counts)
    return fit[best], counts[best]


def global_registration_with_features(
        source: PointCloud, target: PointCloud,
        src_desc, src_valid, tgt_desc, tgt_valid,
        config: GlobalRegistrationConfig) -> GlobalRegistrationResult:
    """RANSAC core given precomputed descriptors."""
    n_src = src_desc.shape[0]
    mq = config.max_query_descriptors
    src_points = source.points
    if mq and n_src > mq:
        # static strided subsample of the query side (see config note)
        stride = -(-n_src // mq)
        src_desc = src_desc[::stride]
        src_valid = src_valid[::stride]
        src_points = src_points[::stride]
    j, dist, ok = features.match_descriptors(
        src_desc, src_valid, tgt_desc, tgt_valid,
        mutual=config.mutual_check)

    # subsample correspondences to a fixed budget (keeps the scoring
    # matmul bounded; the reference scores all pairs every iteration)
    m = config.max_correspondences
    order = jnp.argsort(jnp.where(ok, dist, jnp.inf))[:m]
    src_pts = src_points[order]
    tgt_pts = target.points[j[order]]
    corr_ok = ok[order]

    n_valid = int(jnp.sum(corr_ok))
    if n_valid < 3:
        raise InvalidDataError(
            "global registration: fewer than 3 feature correspondences")

    key = jax.random.PRNGKey(config.seed)
    batch = min(config.hypothesis_batch, config.ransac_iterations)
    n_batches = max(1, config.ransac_iterations // batch)
    best_t = jnp.eye(4, dtype=jnp.float32)
    best_count = -1
    target_count = config.inlier_ratio * max(n_valid, 1)
    for i in range(n_batches):
        key, sub = jax.random.split(key)
        t, count = _ransac_batch(sub, src_pts, tgt_pts, corr_ok, batch,
                                 jnp.float32(config.distance_threshold))
        if int(count) > best_count:
            best_count = int(count)
            best_t = t
        if best_count >= target_count:   # batch-level early exit
            break

    result_t = best_t
    mse = jnp.float32(jnp.inf)
    if config.refine_with_icp:
        icp_res = registration.icp_point_to_point(
            source, target, config.icp_max_iterations,
            max_correspondence_distance=config.distance_threshold * 2.0,
            init=Transform(best_t))
        result_t = icp_res.transformation
        mse = icp_res.mse

    ratio = jnp.float32(best_count / max(n_valid, 1))
    return GlobalRegistrationResult(
        result_t, jnp.int32(best_count), ratio,
        jnp.bool_(best_count >= 3), mse)


def global_registration_with_normals(source: PointCloud, target: PointCloud,
                                     config: GlobalRegistrationConfig =
                                     GlobalRegistrationConfig()
                                     ) -> GlobalRegistrationResult:
    """global_registration_with_normals (global_registration.rs:213-280)."""
    fcfg = features.FpfhConfig(radius=config.fpfh_radius,
                               band=config.fpfh_band)
    sf = features.extract_fpfh_features_with_normals(source, fcfg)
    tf = features.extract_fpfh_features_with_normals(target, fcfg)
    return global_registration_with_features(
        source, target, sf.descriptors, sf.valid,
        tf.descriptors, tf.valid, config)


def global_registration(source: PointCloud, target: PointCloud,
                        config: GlobalRegistrationConfig =
                        GlobalRegistrationConfig()
                        ) -> GlobalRegistrationResult:
    """Full pipeline (global_registration.rs:185-207): estimate normals
    on both clouds, then FPFH + RANSAC (+ optional ICP refine)."""
    ncfg = NormalEstimationConfig(k_neighbors=config.k_normals)
    if source.normals is None:
        source = source.with_normals(
            estimate_normals_detailed(source, ncfg).normals)
    if target.normals is None:
        target = target.with_normals(
            estimate_normals_detailed(target, ncfg).normals)
    return global_registration_with_normals(source, target, config)
