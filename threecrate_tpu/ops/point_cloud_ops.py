"""PointCloud neighbor convenience extensions.

Covers threecrate-algorithms/src/point_cloud_ops.rs:7-40: the
``PointCloudNeighbors`` extension trait — all-points k-NN and
single-query variants — as free functions plus method attachment onto
PointCloud (Python's version of a Rust extension trait).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..core.point_cloud import PointCloud
from . import neighbors


def k_nearest_neighbors(cloud: PointCloud, k: int,
                        exclude_self: bool = True) -> neighbors.KnnResult:
    """kNN of every point against its own cloud
    (point_cloud_ops.rs:7-40)."""
    return neighbors.knn(cloud.points, cloud.mask, cloud.points,
                         cloud.mask, k, exclude_self=exclude_self)


def nearest_neighbor(cloud: PointCloud, query) -> Tuple[int, float]:
    """Single-query nearest point: (index, distance)."""
    q = jnp.atleast_2d(jnp.asarray(query, jnp.float32))
    res = neighbors.knn(cloud.points, cloud.mask, q, None, 1)
    return int(res.indices[0, 0]), float(res.distances[0, 0])


def neighbors_within(cloud: PointCloud, query, radius: float,
                     max_neighbors: int = 64) -> np.ndarray:
    """Indices of cloud points within ``radius`` of one query point."""
    q = jnp.atleast_2d(jnp.asarray(query, jnp.float32))
    res = neighbors.radius_neighbors(cloud.points, cloud.mask, q, None,
                                     radius, max_neighbors)
    m = np.asarray(res.mask[0])
    return np.asarray(res.indices[0])[m]


# attach as methods (extension-trait style)
PointCloud.k_nearest_neighbors = (
    lambda self, k, exclude_self=True:
    k_nearest_neighbors(self, k, exclude_self))
PointCloud.nearest_neighbor = lambda self, q: nearest_neighbor(self, q)
PointCloud.neighbors_within = (
    lambda self, q, radius, max_neighbors=64:
    neighbors_within(self, q, radius, max_neighbors))
