"""TriangleMesh: padded vertex/face arrays as a pytree.

TPU-native rework of the reference ``TriangleMesh``
(threecrate-core/src/mesh.rs:270-409): vertices, faces, optional
per-vertex normals/colors, face-normal computation. The reference stores
``Vec<Point3f>`` + ``Vec<[usize;3]>``; here both are padded dense arrays
with masks so mesh ops (smoothing, simplification quadrics, booleans'
batched plane tests) can run jitted.
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


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TriangleMesh:
    """Padded triangle mesh.

    Attributes:
      vertices: ``(VC, 3)`` float32; rows past the valid count are padding.
      faces: ``(FC, 3)`` int32 vertex indices; invalid faces point at 0.
      vertex_mask: ``(VC,)`` bool.
      face_mask: ``(FC,)`` bool.
      attrs: optional per-vertex arrays ("normals": (VC,3), "colors": (VC,3)).
    """

    vertices: jnp.ndarray
    faces: jnp.ndarray
    vertex_mask: jnp.ndarray
    face_mask: jnp.ndarray
    attrs: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)

    # -- pytree ----------------------------------------------------------
    def tree_flatten(self):
        keys = tuple(sorted(self.attrs))
        children = (self.vertices, self.faces, self.vertex_mask, self.face_mask)
        children += tuple(self.attrs[k] for k in keys)
        return children, keys

    @classmethod
    def tree_unflatten(cls, keys, children):
        v, f, vm, fm, *vals = children
        return cls(v, f, vm, fm, dict(zip(keys, vals)))

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_numpy(cls, vertices: ArrayLike, faces: ArrayLike,
                   normals: Optional[ArrayLike] = None,
                   colors: Optional[ArrayLike] = None,
                   vertex_capacity: Optional[int] = None,
                   face_capacity: Optional[int] = None) -> "TriangleMesh":
        v = np.asarray(vertices, dtype=np.float32)
        f = np.asarray(faces, dtype=np.int32)
        if v.ndim != 2 or v.shape[1] != 3:
            raise InvalidDataError(f"vertices must be (V, 3), got {v.shape}")
        if f.ndim != 2 or f.shape[1] != 3:
            raise InvalidDataError(f"faces must be (F, 3), got {f.shape}")
        if f.size and (f.min() < 0 or f.max() >= max(v.shape[0], 1)):
            raise InvalidDataError("face indices out of vertex range")
        vc = vertex_capacity or padding.pad_capacity(v.shape[0])
        fc = face_capacity or padding.pad_capacity(f.shape[0])
        attrs = {}
        for key, arr in (("normals", normals), ("colors", colors)):
            if arr is None:
                continue
            arr = np.asarray(arr, dtype=np.float32)
            if arr.shape[0] != v.shape[0]:
                raise InvalidDataError(
                    f"{key} length {arr.shape[0]} != vertex count {v.shape[0]}"
                )
            attrs[key] = jnp.asarray(padding.pad_array(arr, vc))
        return cls(
            vertices=jnp.asarray(padding.pad_array(v, vc)),
            faces=jnp.asarray(padding.pad_array(f, fc)),
            vertex_mask=jnp.asarray(padding.make_mask(v.shape[0], vc)),
            face_mask=jnp.asarray(padding.make_mask(f.shape[0], fc)),
            attrs=attrs,
        )

    @classmethod
    def empty(cls, vertex_capacity: int = padding.LANE,
              face_capacity: int = padding.LANE) -> "TriangleMesh":
        return cls(jnp.zeros((vertex_capacity, 3), jnp.float32),
                   jnp.zeros((face_capacity, 3), jnp.int32),
                   jnp.zeros((vertex_capacity,), bool),
                   jnp.zeros((face_capacity,), bool), {})

    # -- info -------------------------------------------------------------
    @property
    def vertex_capacity(self) -> int:
        return self.vertices.shape[0]

    @property
    def face_capacity(self) -> int:
        return self.faces.shape[0]

    def vertex_count(self) -> jnp.ndarray:
        return jnp.sum(self.vertex_mask).astype(jnp.int32)

    def face_count(self) -> jnp.ndarray:
        return jnp.sum(self.face_mask).astype(jnp.int32)

    def is_empty(self) -> jnp.ndarray:
        return ~jnp.any(self.vertex_mask)

    @property
    def normals(self) -> Optional[jnp.ndarray]:
        return self.attrs.get("normals")

    @property
    def colors(self) -> Optional[jnp.ndarray]:
        return self.attrs.get("colors")

    # -- ops ----------------------------------------------------------------
    def triangles(self) -> jnp.ndarray:
        """Gather face corner positions: ``(FC, 3, 3)``."""
        return self.vertices[self.faces]

    def face_normals(self, normalize: bool = True) -> jnp.ndarray:
        """Per-face normals via the cross product, one fused gather+cross.

        Matches calculate_face_normals (mesh.rs:330-352); invalid faces
        yield zeros.
        """
        tri = self.triangles()
        n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        if normalize:
            n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
        return jnp.where(self.face_mask[:, None], n, 0.0)

    def face_areas(self) -> jnp.ndarray:
        tri = self.triangles()
        n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        return jnp.where(self.face_mask, 0.5 * jnp.linalg.norm(n, axis=-1), 0.0)

    def compute_vertex_normals(self) -> "TriangleMesh":
        """Area-weighted vertex normals via segment-sum scatter over faces."""
        tri = self.triangles()
        fn = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])  # area-weighted
        fn = jnp.where(self.face_mask[:, None], fn, 0.0)
        acc = jnp.zeros_like(self.vertices)
        for c in range(3):
            acc = acc.at[self.faces[:, c]].add(fn)
        acc = acc / jnp.maximum(jnp.linalg.norm(acc, axis=-1, keepdims=True), 1e-30)
        acc = jnp.where(self.vertex_mask[:, None], acc, 0.0)
        return self.with_attr("normals", acc)

    def with_attr(self, key: str, value: jnp.ndarray) -> "TriangleMesh":
        new = dict(self.attrs)
        new[key] = value
        return TriangleMesh(self.vertices, self.faces, self.vertex_mask,
                            self.face_mask, new)

    def with_vertices(self, vertices: jnp.ndarray) -> "TriangleMesh":
        return TriangleMesh(vertices, self.faces, self.vertex_mask,
                            self.face_mask, self.attrs)

    def set_normals(self, normals: ArrayLike) -> "TriangleMesh":
        """Length-guarded like mesh.rs:378-390."""
        normals = jnp.asarray(normals, jnp.float32)
        if normals.shape != self.vertices.shape:
            raise InvalidDataError(
                f"normals shape {normals.shape} != vertices {self.vertices.shape}")
        return self.with_attr("normals", normals)

    def set_colors(self, colors: ArrayLike) -> "TriangleMesh":
        colors = jnp.asarray(colors, jnp.float32)
        if colors.shape != self.vertices.shape:
            raise InvalidDataError(
                f"colors shape {colors.shape} != vertices {self.vertices.shape}")
        return self.with_attr("colors", colors)

    def transform(self, t: Transform) -> "TriangleMesh":
        new_attrs = dict(self.attrs)
        if "normals" in new_attrs:
            new_attrs["normals"] = t.apply_vector(new_attrs["normals"])
        return TriangleMesh(t.apply(self.vertices), self.faces,
                            self.vertex_mask, self.face_mask, new_attrs)

    def bounding_box(self):
        return padding.bounding_box(self.vertices, self.vertex_mask)

    def center(self) -> jnp.ndarray:
        mn, mx = self.bounding_box()
        return (mn + mx) * 0.5

    # -- host interop -----------------------------------------------------
    def to_numpy(self):
        """(vertices, faces) host arrays with padding removed & reindexed."""
        vm = np.asarray(self.vertex_mask)
        fm = np.asarray(self.face_mask)
        v = np.asarray(self.vertices)[vm]
        remap = np.cumsum(vm) - 1  # old index -> new index
        f = remap[np.asarray(self.faces)[fm]].astype(np.int32)
        return v, f

    def attr_to_numpy(self, key: str) -> np.ndarray:
        vm = np.asarray(self.vertex_mask)
        return np.asarray(self.attrs[key])[vm]

    def as_point_cloud(self):
        from .point_cloud import PointCloud
        return PointCloud(self.vertices, self.vertex_mask,
                          {k: v for k, v in self.attrs.items()})
