"""Segmentation: RANSAC plane fitting and Euclidean clustering.

TPU-native rework of threecrate-algorithms/src/segmentation.rs:

* ``segment_plane`` (segmentation.rs:117-180): the reference's serial
  RANSAC (and rayon-batched variant, :194) becomes a **vmapped
  hypothesis batch** — all candidate planes are fit from random point
  triples at once and scored against all points as one broadcasted
  distance computation, then refined by a masked PCA fit.
* ``extract_euclidean_clusters`` (segmentation.rs:396-460): the
  reference BFS-flood-fills over KD-tree radius neighbors; BFS is
  inherently sequential, so the TPU formulation is **parallel label
  propagation with pointer jumping** (min-label relaxation over the
  radius graph + path compression), which converges in O(log N)
  device-resident iterations — the classic GPU/TPU connected-components
  algorithm.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.errors import InvalidDataError
from ..core.point_cloud import PointCloud
from . import linalg, neighbors


# ---------------------------------------------------------------------------
# plane RANSAC
# ---------------------------------------------------------------------------

class PlaneModel(NamedTuple):
    """ax + by + cz + d = 0, ‖(a,b,c)‖ = 1 (segmentation.rs:14-93)."""

    normal: jnp.ndarray  # (3,)
    d: jnp.ndarray       # scalar

    def distances(self, points: jnp.ndarray) -> jnp.ndarray:
        return jnp.abs(points @ self.normal + self.d)

    @property
    def coefficients(self):
        return jnp.concatenate([self.normal, self.d[None]])


class PlaneSegmentationResult(NamedTuple):
    """Native fields plus the reference class surface
    (threecrate-python/src/lib.rs:643-693: ``plane_coefficients()``,
    ``inlier_indices()``, ``num_inliers``, ``inlier_cloud()``)."""

    model: PlaneModel
    inlier_mask: jnp.ndarray   # (N,) bool
    inlier_count: jnp.ndarray  # scalar int32

    def plane_coefficients(self):
        """[a, b, c, d] as a host (4,) float32 array (lib.rs:655)."""
        import numpy as np
        return np.asarray(self.model.coefficients, dtype=np.float32)

    def inlier_indices(self):
        """Sorted indices of inlier rows (lib.rs:661)."""
        import numpy as np
        return np.flatnonzero(np.asarray(self.inlier_mask))

    @property
    def num_inliers(self) -> int:
        return int(jnp.sum(self.inlier_mask))

    def inlier_cloud(self, cloud: PointCloud) -> PointCloud:
        """Compacted cloud of just the inliers (lib.rs:672)."""
        return cloud.select(self.inlier_mask).compact()


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def _plane_ransac(key, points, mask, n_hyp, dist_thresh):
    n = points.shape[0]
    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    idx = jax.random.choice(key, n, shape=(n_hyp, 3), p=probs)
    tri = points[idx]                                   # (H, 3, 3)
    nrm = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    nn = jnp.linalg.norm(nrm, axis=1, keepdims=True)
    ok_h = nn[:, 0] > 1e-12                             # non-collinear triple
    nrm = nrm / jnp.maximum(nn, 1e-30)
    d = -jnp.sum(nrm * tri[:, 0], axis=1)               # (H,)

    # score every hypothesis against every point: (H, N) via one matmul
    dist = jnp.abs(points @ nrm.T + d[None, :])         # (N, H)
    inlier = (dist <= dist_thresh) & mask[:, None]
    counts = jnp.where(ok_h, jnp.sum(inlier, axis=0), -1)
    best = jnp.argmax(counts)
    return nrm[best], d[best], counts[best]


@jax.jit
def _refine_plane(points, inlier_mask):
    """Least-squares refit on the inlier set (PCA smallest axis)."""
    w = inlier_mask.astype(jnp.float32)
    mean, cov = linalg.weighted_covariance(points[None], w[None])
    nrm, _ = linalg.smallest_eigenvector_sym3x3(cov[0])
    d = -jnp.dot(nrm, mean[0])
    return nrm, d


def segment_plane(cloud: PointCloud, distance_threshold: float = 0.01,
                  max_iterations: int = 1000, seed: int = 0,
                  refine: bool = True) -> PlaneSegmentationResult:
    """RANSAC plane segmentation (segmentation.rs:117-180). All
    ``max_iterations`` hypotheses are evaluated in parallel."""
    if cloud.capacity < 3:
        raise InvalidDataError("plane segmentation needs >= 3 points")
    key = jax.random.PRNGKey(seed)
    nrm, d, _ = _plane_ransac(key, cloud.points, cloud.mask,
                              max_iterations,
                              jnp.float32(distance_threshold))
    model = PlaneModel(nrm, d)
    inliers = cloud.mask & (model.distances(cloud.points)
                            <= distance_threshold)
    if refine:
        nrm, d = _refine_plane(cloud.points, inliers)
        model = PlaneModel(nrm, d)
        inliers = cloud.mask & (model.distances(cloud.points)
                                <= distance_threshold)
    return PlaneSegmentationResult(model, inliers,
                                   jnp.sum(inliers).astype(jnp.int32))


# parity alias: the reference ships a rayon-parallel variant
# (segmentation.rs:194); on TPU the base implementation is already the
# parallel one.
segment_plane_parallel = segment_plane


def extract_plane(cloud: PointCloud, result: PlaneSegmentationResult,
                  negative: bool = False) -> PointCloud:
    """Keep inliers (or the complement when ``negative``)."""
    keep = ~result.inlier_mask if negative else result.inlier_mask
    return cloud.select(keep)


# ---------------------------------------------------------------------------
# euclidean clustering
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class EuclideanClusterConfig:
    """Mirrors EuclideanClusterConfig (segmentation.rs:328-357)."""

    tolerance: float = 0.02
    min_cluster_size: int = 1
    max_cluster_size: int = 2 ** 31 - 1
    max_neighbors: int = 32

    def __post_init__(self):
        if self.tolerance <= 0:
            raise ValueError(
                f"tolerance must be positive, got {self.tolerance}")
        if self.min_cluster_size < 1:
            raise ValueError(
                f"min_cluster_size must be >= 1, got {self.min_cluster_size}")
        if self.max_cluster_size < self.min_cluster_size:
            raise ValueError("max_cluster_size must be >= min_cluster_size")
        if self.max_neighbors < 1:
            raise ValueError(
                f"max_neighbors must be >= 1, got {self.max_neighbors}")


class ClusterResult(NamedTuple):
    labels: jnp.ndarray      # (N,) int32 cluster id by size rank, -1 = noise
    n_clusters: jnp.ndarray  # scalar int32
    sizes: jnp.ndarray       # (N,) int32, sizes[i] = size of cluster i (padded 0)


@functools.partial(jax.jit, static_argnames=("max_neighbors",))
def _connected_components(points, mask, tolerance, max_neighbors):
    n = points.shape[0]
    res = neighbors.radius_neighbors(points, mask, points, mask,
                                     tolerance, max_neighbors)
    nbr_idx = jnp.where(res.mask, res.indices, jnp.arange(n)[:, None])
    labels0 = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), n - 1)

    def cond(state):
        labels, changed, it = state
        return changed & (it < n)

    def body(state):
        labels, _, it = state
        nbr_min = jnp.min(labels[nbr_idx], axis=1)      # min over neighbors
        new = jnp.minimum(labels, nbr_min)
        new = jnp.where(mask, new, labels)
        # pointer jumping: labels ← labels[labels] until stable (log n)
        new = new[new]
        new = new[new]
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))
    return labels


@functools.partial(jax.jit, static_argnames=())
def _rank_clusters(roots, mask, min_size, max_size):
    n = roots.shape[0]
    sizes_by_root = jax.ops.segment_sum(
        mask.astype(jnp.int32), jnp.where(mask, roots, n - 1),
        num_segments=n)
    size_of = sizes_by_root[roots]
    keep = mask & (size_of >= min_size) & (size_of <= max_size)

    # rank roots by size descending (largest-first, segmentation.rs:455)
    is_root = (jnp.arange(n) == roots) & keep
    root_size = jnp.where(is_root, sizes_by_root, -1)
    order = jnp.argsort(-root_size)                       # roots big→small
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    labels = jnp.where(keep, rank[roots], -1)
    n_clusters = jnp.sum(is_root).astype(jnp.int32)
    sizes_ranked = jnp.where(root_size[order] > 0, root_size[order], 0)
    return labels, n_clusters, sizes_ranked


def extract_euclidean_clusters(cloud: PointCloud,
                               config: EuclideanClusterConfig =
                               EuclideanClusterConfig()) -> ClusterResult:
    """Connected components over the ``tolerance``-radius graph,
    size-filtered and sorted largest-first (segmentation.rs:396-460).

    Caveat vs the reference: neighbor capacity is ``max_neighbors``
    per point (fixed shape); in dense blobs connectivity still holds
    because capped neighbors are the *nearest* ones, which chain.
    """
    roots = _connected_components(cloud.points, cloud.mask,
                                  jnp.float32(config.tolerance),
                                  config.max_neighbors)
    labels, n_clusters, sizes = _rank_clusters(
        roots, cloud.mask, config.min_cluster_size, config.max_cluster_size)
    return ClusterResult(labels, n_clusters, sizes)


def cluster_indices(result: ClusterResult, cluster_id: int):
    """Host helper: numpy indices of one cluster."""
    import numpy as np
    return np.nonzero(np.asarray(result.labels) == cluster_id)[0]
