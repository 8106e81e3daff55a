"""Artifact checkpointing: save/load framework objects losslessly.

The reference's checkpoint story is serde on every core type
(SURVEY §5: point_cloud.rs:122, mesh.rs:269 derive Serialize, bincode
ProgressiveMesh). Here every pytree container round-trips through one
compressed ``.npz`` (masks, attrs and metadata included) — the resume
format for long pipelines (e.g. TSDF volumes mid-fusion).
"""

from __future__ import annotations

import json
from typing import Union

import jax.numpy as jnp
import numpy as np

from ..core.errors import InvalidDataError
from ..core.mesh import TriangleMesh
from ..core.point_cloud import PointCloud
from ..ops.tsdf import TsdfVolume

_KIND_KEY = "__tc_kind__"


def save_artifact(path, obj) -> None:
    """Save a PointCloud / TriangleMesh / TsdfVolume to .npz."""
    if isinstance(obj, PointCloud):
        arrays = {"points": np.asarray(obj.points),
                  "mask": np.asarray(obj.mask)}
        for k, v in obj.attrs.items():
            arrays[f"attr_{k}"] = np.asarray(v)
        kind = "point_cloud"
    elif isinstance(obj, TriangleMesh):
        arrays = {"vertices": np.asarray(obj.vertices),
                  "faces": np.asarray(obj.faces),
                  "vertex_mask": np.asarray(obj.vertex_mask),
                  "face_mask": np.asarray(obj.face_mask)}
        for k, v in obj.attrs.items():
            arrays[f"attr_{k}"] = np.asarray(v)
        kind = "triangle_mesh"
    elif isinstance(obj, TsdfVolume):
        arrays = {"tsdf": np.asarray(obj.tsdf),
                  "weight": np.asarray(obj.weight),
                  "origin": np.asarray(obj.origin),
                  "voxel_size": np.asarray(obj.voxel_size),
                  "truncation": np.asarray(obj.truncation)}
        if obj.color is not None:
            arrays["color"] = np.asarray(obj.color)
        kind = "tsdf_volume"
    else:
        raise InvalidDataError(f"cannot checkpoint {type(obj).__name__}")
    arrays[_KIND_KEY] = np.asarray(kind)
    np.savez_compressed(path, **arrays)


def load_artifact(path) -> Union[PointCloud, TriangleMesh, TsdfVolume]:
    with np.load(path, allow_pickle=False) as z:
        if _KIND_KEY not in z:
            raise InvalidDataError("not a threecrate-tpu artifact")
        kind = str(z[_KIND_KEY])
        if kind == "point_cloud":
            attrs = {k[len("attr_"):]: jnp.asarray(z[k])
                     for k in z.files if k.startswith("attr_")}
            return PointCloud(jnp.asarray(z["points"]),
                              jnp.asarray(z["mask"]), attrs)
        if kind == "triangle_mesh":
            attrs = {k[len("attr_"):]: jnp.asarray(z[k])
                     for k in z.files if k.startswith("attr_")}
            return TriangleMesh(jnp.asarray(z["vertices"]),
                                jnp.asarray(z["faces"]),
                                jnp.asarray(z["vertex_mask"]),
                                jnp.asarray(z["face_mask"]), attrs)
        if kind == "tsdf_volume":
            return TsdfVolume(
                jnp.asarray(z["tsdf"]), jnp.asarray(z["weight"]),
                jnp.asarray(z["color"]) if "color" in z.files else None,
                jnp.asarray(z["origin"]), jnp.asarray(z["voxel_size"]),
                jnp.asarray(z["truncation"]))
        raise InvalidDataError(f"unknown artifact kind {kind!r}")
