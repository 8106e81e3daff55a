"""PointCloud: the central container, as a padded-array pytree.

TPU-native rework of the reference's ``PointCloud<T>`` family
(threecrate-core/src/point_cloud.rs:123-261, src/point.rs:41-84). Where
the reference parameterises a ``Vec<T>`` over point *types*
(Point3f / ColoredPoint3f / NormalPoint3f / ColoredNormalPoint3f), the
TPU design is structure-of-arrays: one ``(capacity, 3)`` float32
position array, a ``(capacity,)`` validity mask, and optional attribute
arrays (normals, colors, intensity) that fill the roles of the typed
variants. Dense SoA arrays are the only layout XLA can tile onto the
VPU/MXU; masks replace dynamic lengths so every op is jit-stable.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import padding
from .errors import InvalidDataError
from .transform import Transform

ArrayLike = Union[jnp.ndarray, np.ndarray]

# Attribute keys with reserved semantics (mirroring the typed point variants)
NORMALS = "normals"    # (N, 3) float32 unit vectors  — NormalPoint3f
COLORS = "colors"      # (N, 3) float32 in [0, 1]     — ColoredPoint3f ([u8;3] in ref)
INTENSITY = "intensity"  # (N,) float32               — LiDAR return strength


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """Padded point cloud.

    Attributes:
      points: ``(capacity, 3)`` float32. Rows where ``mask`` is False are
        padding (kept finite — zeros — so masked math stays NaN-free).
      mask: ``(capacity,)`` bool validity mask.
      attrs: dict of per-point attribute arrays, each with leading dim
        ``capacity`` (invalid rows are padding).
    """

    points: jnp.ndarray
    mask: jnp.ndarray
    attrs: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)

    # -- pytree ----------------------------------------------------------
    def tree_flatten(self):
        keys = tuple(sorted(self.attrs))
        children = (self.points, self.mask) + tuple(self.attrs[k] for k in keys)
        return children, keys

    @classmethod
    def tree_unflatten(cls, keys, children):
        points, mask, *vals = children
        return cls(points, mask, dict(zip(keys, vals)))

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_numpy(cls, points: ArrayLike, capacity: Optional[int] = None,
                   pad_multiple: int = padding.LANE, **attrs: ArrayLike) -> "PointCloud":
        """Build from an ``(N, 3)`` host array, padding to a size bucket."""
        pts = np.asarray(points, dtype=np.float32)
        if pts.ndim != 2 or pts.shape[1] != 3:
            raise InvalidDataError(f"points must be (N, 3), got {pts.shape}")
        n = pts.shape[0]
        cap = capacity if capacity is not None else padding.pad_capacity(n, pad_multiple)
        out_attrs = {}
        for k, v in attrs.items():
            if v is None:
                continue
            v = np.asarray(v, dtype=np.float32)
            if v.shape[0] != n:
                raise InvalidDataError(f"attribute {k!r} length {v.shape[0]} != {n} points")
            out_attrs[k] = jnp.asarray(padding.pad_array(v, cap))
        return cls(
            points=jnp.asarray(padding.pad_array(pts, cap)),
            mask=jnp.asarray(padding.make_mask(n, cap)),
            attrs=out_attrs,
        )

    @classmethod
    def from_points(cls, points: ArrayLike, mask: Optional[ArrayLike] = None,
                    **attrs: ArrayLike) -> "PointCloud":
        """Wrap already-device ``(capacity, 3)`` arrays without copying."""
        points = jnp.asarray(points, dtype=jnp.float32)
        if mask is None:
            mask = jnp.ones(points.shape[:1], dtype=bool)
        return cls(points, jnp.asarray(mask, dtype=bool),
                   {k: jnp.asarray(v) for k, v in attrs.items() if v is not None})

    @classmethod
    def empty(cls, capacity: int = padding.LANE) -> "PointCloud":
        return cls(jnp.zeros((capacity, 3), jnp.float32),
                   jnp.zeros((capacity,), bool), {})

    # -- basic info --------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def size(self) -> jnp.ndarray:
        """Number of valid points (traced scalar)."""
        return jnp.sum(self.mask).astype(jnp.int32)

    def __len__(self) -> int:
        """Host-side count of valid points (blocks; avoid under jit)."""
        return int(np.asarray(self.size()))

    def is_empty(self) -> jnp.ndarray:
        return ~jnp.any(self.mask)

    def has(self, key: str) -> bool:
        return key in self.attrs

    @property
    def normals(self) -> Optional[jnp.ndarray]:
        return self.attrs.get(NORMALS)

    @property
    def colors(self) -> Optional[jnp.ndarray]:
        return self.attrs.get(COLORS)

    # -- functional updates -------------------------------------------------
    def with_attr(self, key: str, value: jnp.ndarray) -> "PointCloud":
        """Attach a per-point attribute. Rows align with array SLOTS
        (not compact valid order); a value shorter than the padded
        capacity is zero-padded — the natural fit for clouds built by
        ``from_numpy``, whose valid points occupy the leading slots.
        A value longer than the capacity is an error (it cannot
        correspond to this cloud)."""
        value = jnp.asarray(value)
        cap = self.points.shape[0]
        if value.shape[0] > cap:
            raise InvalidDataError(
                f"attribute {key!r} has {value.shape[0]} rows but the "
                f"cloud capacity is {cap}")
        if value.shape[0] < cap:
            pad = [(0, cap - value.shape[0])] + [(0, 0)] * (value.ndim - 1)
            value = jnp.pad(value, pad)
        new = dict(self.attrs)
        new[key] = value
        return PointCloud(self.points, self.mask, new)

    def with_normals(self, normals: jnp.ndarray) -> "PointCloud":
        return self.with_attr(NORMALS, normals)

    def with_colors(self, colors: jnp.ndarray) -> "PointCloud":
        return self.with_attr(COLORS, colors)

    def with_points(self, points: jnp.ndarray) -> "PointCloud":
        return PointCloud(points, self.mask, self.attrs)

    def with_mask(self, mask: jnp.ndarray) -> "PointCloud":
        """Replace validity mask (e.g. after a filter). Same capacity."""
        return PointCloud(self.points, mask, self.attrs)

    def select(self, keep: jnp.ndarray) -> "PointCloud":
        """Mask-and intersection: keep points where ``keep`` & valid."""
        return self.with_mask(self.mask & keep)

    def transform(self, t: Transform) -> "PointCloud":
        """Apply a rigid transform; rotates normals if present.

        Matches PointCloud::transform (point_cloud.rs:214-236) but as one
        fused matmul over the whole array.
        """
        new_attrs = dict(self.attrs)
        if NORMALS in new_attrs:
            new_attrs[NORMALS] = t.apply_vector(new_attrs[NORMALS])
        return PointCloud(t.apply(self.points), self.mask, new_attrs)

    def extend(self, other: "PointCloud") -> "PointCloud":
        """Concatenate another cloud after this one (new cloud).

        The padded analog of ``Extend for PointCloud``
        (point_cloud.rs:128-140): capacities add, masks concatenate,
        so the result is jit-stable (static output shape) and valid
        rows stay where they were. Attributes are the UNION of both
        clouds' keys; a side missing an attribute contributes zero
        rows for it (its mask still marks those points valid — check
        ``has()`` before relying on a merged attribute). Call
        ``compact()``/``pack()`` afterwards to squeeze padding.
        """
        pts = jnp.concatenate([self.points, other.points], axis=0)
        mask = jnp.concatenate([self.mask, other.mask], axis=0)
        attrs = {}
        for k in set(self.attrs) | set(other.attrs):
            a = self.attrs.get(k)
            b = other.attrs.get(k)
            if a is None:
                a = jnp.zeros((self.capacity,) + b.shape[1:], b.dtype)
            if b is None:
                b = jnp.zeros((other.capacity,) + a.shape[1:], a.dtype)
            attrs[k] = jnp.concatenate([a, b], axis=0)
        return PointCloud(pts, mask, attrs)

    def __add__(self, other: "PointCloud") -> "PointCloud":
        return self.extend(other)

    # -- geometry ------------------------------------------------------------
    def bounding_box(self):
        """(min_xyz, max_xyz) over valid points (traits.rs:564-632)."""
        return padding.bounding_box(self.points, self.mask)

    def center(self) -> jnp.ndarray:
        mn, mx = self.bounding_box()
        return (mn + mx) * 0.5

    def centroid(self) -> jnp.ndarray:
        return padding.masked_mean(self.points, self.mask)

    # -- host interop ---------------------------------------------------------
    def to_numpy(self) -> np.ndarray:
        """Valid points as a host ``(n, 3)`` array (drops padding; blocks)."""
        m = np.asarray(self.mask)
        return np.asarray(self.points)[m]

    def attr_to_numpy(self, key: str) -> np.ndarray:
        m = np.asarray(self.mask)
        return np.asarray(self.attrs[key])[m]

    def compact(self, pad_multiple: int = padding.LANE) -> "PointCloud":
        """Host-side repack: drop invalid rows, re-bucket capacity.

        Not jittable (data-dependent size); call between pipeline stages
        when a filter has invalidated most of the cloud.
        """
        m = np.asarray(self.mask)
        pts = np.asarray(self.points)[m]
        attrs = {k: np.asarray(v)[m] for k, v in self.attrs.items()}
        return PointCloud.from_numpy(pts, pad_multiple=pad_multiple, **attrs)

    def pack(self) -> "PointCloud":
        """Device-side repack: valid rows to the front, SAME capacity.

        Fully jittable (shape-preserving): one stable single-key sort
        with the rows as payloads, no scatters — use inside fused
        device pipelines where ``compact()``'s host round-trip would
        break the jit. Row order among valid points is preserved.
        """
        n = self.capacity
        key = jnp.where(self.mask, jnp.int32(0), jnp.int32(1))
        iota = jnp.arange(n, dtype=jnp.int32)
        _, order = jax.lax.sort((key, iota), num_keys=1)
        return PointCloud(self.points[order], self.mask[order],
                          {k: v[order] for k, v in self.attrs.items()})
