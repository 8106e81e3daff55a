"""OrganizedPointCloud: H×W structured grids (depth cameras, LiDAR rings).

TPU-native rework of the reference's ``OrganizedPointCloud<T>``
(threecrate-core/src/organized_point_cloud.rs:25-233): row-major
width×height grid of optional points with an ``is_dense`` flag mirroring
``sensor_msgs/PointCloud2``, pinhole depth-image back-projection, and
unorganized conversion. The ``Option<T>`` grid becomes a dense
``(H, W, 3)`` array + ``(H, W)`` validity mask — and back-projection is
one vectorised expression over the whole image instead of a pixel loop,
which is exactly the memory-bound elementwise shape XLA fuses well.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .errors import InvalidDataError
from .point_cloud import PointCloud

ArrayLike = Union[jnp.ndarray, np.ndarray]


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """Pinhole intrinsics (organized_point_cloud.rs:17-23)."""

    fx: float
    fy: float
    cx: float
    cy: float

    def as_matrix(self) -> np.ndarray:
        return np.array([[self.fx, 0, self.cx],
                         [0, self.fy, self.cy],
                         [0, 0, 1]], dtype=np.float32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class OrganizedPointCloud:
    """(H, W, 3) structured point grid with validity mask."""

    points: jnp.ndarray  # (H, W, 3) float32
    mask: jnp.ndarray    # (H, W) bool

    def tree_flatten(self):
        return (self.points, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_numpy(cls, points: ArrayLike, mask: Optional[ArrayLike] = None
                   ) -> "OrganizedPointCloud":
        p = jnp.asarray(points, jnp.float32)
        if p.ndim != 3 or p.shape[-1] != 3:
            raise InvalidDataError(f"points must be (H, W, 3), got {p.shape}")
        if mask is None:
            mask = jnp.all(jnp.isfinite(p), axis=-1)
        return cls(p, jnp.asarray(mask, bool))

    @classmethod
    def from_depth_image(cls, depth: ArrayLike, intrinsics: CameraIntrinsics,
                         depth_scale: float = 1000.0) -> "OrganizedPointCloud":
        """Back-project a u16/float depth image through a pinhole model.

        Matches from_depth_image (organized_point_cloud.rs:150-196):
        z = depth/scale; x = (u-cx) z / fx; y = (v-cy) z / fy; zero depth
        is invalid.
        """
        d = jnp.asarray(depth)
        if d.ndim != 2:
            raise InvalidDataError(f"depth must be (H, W), got {d.shape}")
        z = d.astype(jnp.float32) / jnp.float32(depth_scale)
        h, w = d.shape
        v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        x = (u - intrinsics.cx) * z / intrinsics.fx
        y = (v - intrinsics.cy) * z / intrinsics.fy
        pts = jnp.stack([x, y, z], axis=-1)
        valid = z > 0
        return cls(jnp.where(valid[..., None], pts, 0.0), valid)

    # -- info ----------------------------------------------------------------
    @property
    def height(self) -> int:
        return self.points.shape[0]

    @property
    def width(self) -> int:
        return self.points.shape[1]

    def is_dense(self) -> jnp.ndarray:
        """True when every cell is valid (PointCloud2's is_dense)."""
        return jnp.all(self.mask)

    def size(self) -> jnp.ndarray:
        return jnp.sum(self.mask).astype(jnp.int32)

    # -- accessors -------------------------------------------------------
    def at(self, row, col):
        """(point, valid) at a grid cell; padded cells return zeros."""
        return self.points[row, col], self.mask[row, col]

    def row(self, r):
        return self.points[r], self.mask[r]

    def ring(self, r):
        """LiDAR alias: a 'ring' is a row (organized_point_cloud.rs:118)."""
        return self.row(r)

    # -- conversion ---------------------------------------------------------
    def to_unorganized(self) -> PointCloud:
        """Flatten to an (H*W,)-capacity PointCloud keeping the mask."""
        return PointCloud(self.points.reshape(-1, 3), self.mask.reshape(-1), {})

    def to_numpy(self) -> np.ndarray:
        m = np.asarray(self.mask).reshape(-1)
        return np.asarray(self.points).reshape(-1, 3)[m]
