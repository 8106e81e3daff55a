"""PointCloud neighbor convenience extensions.

Covers threecrate-algorithms/src/point_cloud_ops.rs:7-40: the
``PointCloudNeighbors`` extension trait — all-points k-NN and
single-query variants — as free functions plus method attachment onto
PointCloud (Python's version of a Rust extension trait).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.errors import InvalidDataError
from ..core.point_cloud import PointCloud
from . import neighbors


def concatenate(clouds: Sequence[PointCloud]) -> PointCloud:
    """Merge point clouds into one (threecrate-python/src/lib.rs:1634).

    One ``jnp.concatenate`` per array family — capacities add, masks
    concatenate, attribute keys are unioned (a cloud missing an
    attribute contributes zero rows for it; see
    ``PointCloud.extend``). Jit-stable: output capacity is the static
    sum of input capacities. ``compact()`` afterwards to re-bucket.
    """
    clouds = list(clouds)
    if not clouds:
        raise InvalidDataError("concatenate requires at least one cloud")
    if len(clouds) == 1:
        return clouds[0]
    pts = jnp.concatenate([c.points for c in clouds], axis=0)
    mask = jnp.concatenate([c.mask for c in clouds], axis=0)
    keys = set()
    for c in clouds:
        keys |= set(c.attrs)
    attrs = {}
    for k in keys:
        proto = next(c.attrs[k] for c in clouds if k in c.attrs)
        parts = [c.attrs[k] if k in c.attrs
                 else jnp.zeros((c.capacity,) + proto.shape[1:],
                                proto.dtype)
                 for c in clouds]
        attrs[k] = jnp.concatenate(parts, axis=0)
    return PointCloud(pts, mask, attrs)


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
