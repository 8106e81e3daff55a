"""Point-cloud colorization from registered RGB images.

TPU-native rework of threecrate-algorithms/src/colorization.rs: project
every point through a world→camera isometry and pinhole intrinsics,
bounds/z>0 test, nearest or bilinear sampling, multi-image first-hit
priority (colorize_from_images, colorization.rs:261). The reference
rayon-loops points; here one projection is a single fused matmul +
gather over the whole cloud per image.
"""

from __future__ import annotations

import dataclasses
import enum
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.organized import CameraIntrinsics
from ..core.point_cloud import PointCloud
from ..core.transform import Transform


class InterpolationMode(enum.Enum):
    """colorization.rs:134."""

    NEAREST = "nearest"
    BILINEAR = "bilinear"


@dataclasses.dataclass(frozen=True)
class RgbImageView:
    """An RGB image + its camera (colorization.rs:49).

    image: (H, W, 3) float32 in [0,1] or uint8.
    world_to_camera: (4, 4) extrinsics.
    """

    image: jnp.ndarray
    intrinsics: CameraIntrinsics
    world_to_camera: jnp.ndarray

    def normalized_image(self) -> jnp.ndarray:
        img = jnp.asarray(self.image)
        if img.dtype == jnp.uint8:
            return img.astype(jnp.float32) / 255.0
        return img.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("h", "w", "bilinear"))
def _project_sample(points, mask, img, intr, w2c, h, w, bilinear):
    cam = jnp.matmul(points, w2c[:3, :3].T,
                     precision=jax.lax.Precision.HIGHEST) + w2c[:3, 3]
    z = cam[:, 2]
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    u = cam[:, 0] / jnp.maximum(z, 1e-9) * fx + cx
    v = cam[:, 1] / jnp.maximum(z, 1e-9) * fy + cy
    inside = mask & (z > 1e-6) & (u >= 0) & (u <= w - 1) & \
        (v >= 0) & (v <= h - 1)
    if bilinear:
        u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
        v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
        du = jnp.clip(u - u0, 0.0, 1.0)[:, None]
        dv = jnp.clip(v - v0, 0.0, 1.0)[:, None]
        c00 = img[v0, u0]
        c01 = img[v0, u0 + 1]
        c10 = img[v0 + 1, u0]
        c11 = img[v0 + 1, u0 + 1]
        color = (c00 * (1 - du) * (1 - dv) + c01 * du * (1 - dv)
                 + c10 * (1 - du) * dv + c11 * du * dv)
    else:
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, h - 1)
        color = img[vi, ui]
    return color, inside


def colorize_point_cloud(cloud: PointCloud, view: RgbImageView,
                         mode: InterpolationMode = InterpolationMode.NEAREST,
                         default_color=(0.0, 0.0, 0.0)) -> PointCloud:
    """Colorize from a single registered image (colorize_point_cloud,
    colorization.rs:217)."""
    img = view.normalized_image()
    h, w = img.shape[:2]
    intr = jnp.asarray([view.intrinsics.fx, view.intrinsics.fy,
                        view.intrinsics.cx, view.intrinsics.cy], jnp.float32)
    color, inside = _project_sample(
        cloud.points, cloud.mask, img, intr,
        jnp.asarray(view.world_to_camera, jnp.float32), h, w,
        mode == InterpolationMode.BILINEAR)
    base = jnp.broadcast_to(jnp.asarray(default_color, jnp.float32),
                            color.shape)
    out = jnp.where(inside[:, None], color, base)
    return cloud.with_colors(out)


def colorize_from_images(cloud: PointCloud, views: Sequence[RgbImageView],
                         mode: InterpolationMode = InterpolationMode.NEAREST,
                         default_color=(0.0, 0.0, 0.0)) -> PointCloud:
    """Multi-image colorization with first-hit priority
    (colorize_from_images, colorization.rs:261): earlier views win."""
    colors = jnp.broadcast_to(jnp.asarray(default_color, jnp.float32),
                              (cloud.capacity, 3))
    assigned = jnp.zeros((cloud.capacity,), bool)
    for view in views:
        img = view.normalized_image()
        h, w = img.shape[:2]
        intr = jnp.asarray([view.intrinsics.fx, view.intrinsics.fy,
                            view.intrinsics.cx, view.intrinsics.cy],
                           jnp.float32)
        c, inside = _project_sample(
            cloud.points, cloud.mask, img, intr,
            jnp.asarray(view.world_to_camera, jnp.float32), h, w,
            mode == InterpolationMode.BILINEAR)
        take = inside & ~assigned
        colors = jnp.where(take[:, None], c, colors)
        assigned = assigned | take
    return cloud.with_colors(colors)
