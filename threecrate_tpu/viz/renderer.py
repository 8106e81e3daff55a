"""Device-side rendering: point splatting and mesh rasterization.

TPU-native rework of threecrate-gpu's render stack (PointCloudRenderer,
gpu/src/renderer.rs:139-550 + shaders/point_cloud.wgsl; MeshRenderer
with flat/PBR shading, gpu/src/mesh.rs:14-1208). Where the reference
drives a wgpu raster pipeline, here rendering is expressed as array
math XLA compiles like any other op:

* point clouds: project → pixel id → **scatter-min z-buffer** (one
  segment-min over pixel ids) → color resolve;
* meshes: brute-force coverage — barycentric tests of (pixel tile ×
  triangle) pairs with a running depth/color merge over face tiles via
  ``lax.scan``. O(HW·F) flops is the TPU-friendly trade: no sorting,
  no divergent control flow, everything dense.

Output is a plain (H, W, 3) float image — usable headless (PNG), in
notebooks, or by the viewer.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import TriangleMesh
from ..core.point_cloud import PointCloud
from .camera import OrbitCamera

BACKGROUND = jnp.asarray([0.08, 0.09, 0.11], jnp.float32)


def _project(points, view, fx, fy, cx, cy):
    cam = points @ view[:3, :3].T + view[:3, 3]
    z = -cam[:, 2]  # camera looks down -z
    u = cam[:, 0] / jnp.maximum(z, 1e-9) * fx + cx
    v = -cam[:, 1] / jnp.maximum(z, 1e-9) * fy + cy
    return u, v, z


@functools.partial(jax.jit, static_argnames=("width", "height",
                                             "point_size"))
def render_points_jit(points, mask, colors, view, intr, width, height,
                      point_size=1):
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    u, v, z = _project(points, view, fx, fy, cx, cy)
    n_pix = width * height
    big = jnp.float32(3e38)

    depth = jnp.full((n_pix,), big)
    color = jnp.zeros((n_pix, 3), jnp.float32)
    r = point_size // 2
    offsets = [(dx, dy) for dx in range(-r, r + 1)
               for dy in range(-r, r + 1)] or [(0, 0)]
    for dx, dy in offsets:
        ui = jnp.round(u).astype(jnp.int32) + dx
        vi = jnp.round(v).astype(jnp.int32) + dy
        ok = mask & (z > 1e-6) & (ui >= 0) & (ui < width) & \
            (vi >= 0) & (vi < height)
        pix = jnp.where(ok, vi * width + ui, 0)
        zval = jnp.where(ok, z, big)
        depth = depth.at[pix].min(zval)
    # second pass: write color where this point owns the depth buffer
    for dx, dy in offsets:
        ui = jnp.round(u).astype(jnp.int32) + dx
        vi = jnp.round(v).astype(jnp.int32) + dy
        ok = mask & (z > 1e-6) & (ui >= 0) & (ui < width) & \
            (vi >= 0) & (vi < height)
        pix = jnp.where(ok, vi * width + ui, 0)
        owns = ok & (z <= depth[pix] * (1 + 1e-6))
        color = color.at[jnp.where(owns, pix, n_pix - 1)].set(
            jnp.where(owns[:, None], colors, color[jnp.where(
                owns, pix, n_pix - 1)]), mode="drop")
    img = jnp.where((depth < big)[:, None], color, BACKGROUND)
    return img.reshape(height, width, 3)


def render_point_cloud(cloud: PointCloud,
                       camera: Optional[OrbitCamera] = None,
                       width: int = 640, height: int = 480,
                       point_size: int = 2,
                       color=(0.85, 0.85, 0.9)) -> np.ndarray:
    """Render a cloud to an (H, W, 3) image (PointCloudRenderer role).

    Uses per-point colors when present; otherwise shades by depth.
    """
    if camera is None:
        camera = OrbitCamera.fit(cloud.to_numpy())
    fx, fy, cx, cy = camera.intrinsics(width, height)
    view = jnp.asarray(camera.view_matrix())
    if cloud.colors is not None:
        colors = cloud.colors
    else:
        # depth-shade fallback
        u, v, z = _project(cloud.points, view, fx, fy, cx, cy)
        zr = (z - jnp.min(z)) / jnp.maximum(jnp.max(z) - jnp.min(z), 1e-9)
        base = jnp.asarray(color, jnp.float32)
        colors = base * (1.0 - 0.6 * zr[:, None])
    img = render_points_jit(cloud.points, cloud.mask, colors, view,
                            jnp.asarray([fx, fy, cx, cy], jnp.float32),
                            width, height, point_size)
    return np.asarray(img)


@functools.partial(jax.jit, static_argnames=("width", "height",
                                             "face_tile", "flat"))
def render_mesh_jit(verts, faces, face_mask, vert_colors, view, intr,
                    light_dir, width, height, face_tile=512, flat=True):
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    u, v, z = _project(verts, view, fx, fy, cx, cy)
    # (per-vertex screen coords; faces gather them)
    fu = u[faces]                        # (F, 3)
    fv = v[faces]
    fz = z[faces]
    fcol = vert_colors[faces].mean(1)    # (F, 3) flat per-face color

    # lambertian shade from world normals
    tri = verts[faces]
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    lam = jnp.abs(n @ light_dir)
    shade = (0.25 + 0.75 * lam)[:, None] * fcol

    px = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5
    py = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5
    px = px.reshape(-1)
    py = py.reshape(-1)

    n_faces = faces.shape[0]
    pad = (-n_faces) % face_tile
    if pad:
        fu = jnp.pad(fu, ((0, pad), (0, 0)))
        fv = jnp.pad(fv, ((0, pad), (0, 0)))
        fz = jnp.pad(fz, ((0, pad), (0, 0)), constant_values=3e38)
        shade = jnp.pad(shade, ((0, pad), (0, 0)))
        face_mask = jnp.pad(face_mask, (0, pad))
    t = fu.shape[0] // face_tile

    def body(carry, tile):
        depth, color = carry
        tu, tv, tz, tc, tm = tile
        # barycentric coords of every pixel in every tile face
        x0, x1, x2 = tu[:, 0], tu[:, 1], tu[:, 2]
        y0, y1, y2 = tv[:, 0], tv[:, 1], tv[:, 2]
        den = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        # (P, T) barycentrics
        w0 = ((y1 - y2)[None, :] * (px[:, None] - x2[None, :])
              + (x2 - x1)[None, :] * (py[:, None] - y2[None, :])) / den
        w1 = ((y2 - y0)[None, :] * (px[:, None] - x2[None, :])
              + (x0 - x2)[None, :] * (py[:, None] - y2[None, :])) / den
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & tm[None, :]
        zpix = w0 * tz[None, :, 0] + w1 * tz[None, :, 1] + w2 * tz[None, :, 2]
        zpix = jnp.where(inside & (zpix > 1e-6), zpix, 3e38)
        best = jnp.argmin(zpix, axis=1)
        best_z = jnp.take_along_axis(zpix, best[:, None], 1)[:, 0]
        best_c = tc[best]
        better = best_z < depth
        depth = jnp.where(better, best_z, depth)
        color = jnp.where(better[:, None], best_c, color)
        return (depth, color), None

    depth0 = jnp.full((height * width,), 3e38)
    color0 = jnp.broadcast_to(BACKGROUND, (height * width, 3))
    tiles = (fu.reshape(t, face_tile, 3), fv.reshape(t, face_tile, 3),
             fz.reshape(t, face_tile, 3), shade.reshape(t, face_tile, 3),
             face_mask.reshape(t, face_tile))
    (depth, color), _ = jax.lax.scan(body, (depth0, color0), tiles)
    return color.reshape(height, width, 3)


def render_mesh(mesh: TriangleMesh, camera: Optional[OrbitCamera] = None,
                width: int = 640, height: int = 480,
                color=(0.7, 0.72, 0.78),
                light_dir=(0.4, 0.3, 0.85)) -> np.ndarray:
    """Render a mesh with flat lambertian shading (MeshRenderer role,
    ShadingMode::Flat; PBR parameters map to the same pipeline with a
    different shade function)."""
    if camera is None:
        v, _ = mesh.to_numpy()
        camera = OrbitCamera.fit(v)
    fx, fy, cx, cy = camera.intrinsics(width, height)
    if mesh.colors is not None:
        vcol = mesh.colors
    else:
        vcol = jnp.broadcast_to(jnp.asarray(color, jnp.float32),
                                mesh.vertices.shape)
    ld = np.asarray(light_dir, np.float32)
    ld = ld / np.linalg.norm(ld)
    img = render_mesh_jit(
        mesh.vertices, mesh.faces, mesh.face_mask, vcol,
        jnp.asarray(camera.view_matrix()),
        jnp.asarray([fx, fy, cx, cy], jnp.float32),
        jnp.asarray(ld), width, height)
    return np.asarray(img)


def save_image(path, image: np.ndarray) -> None:
    """Write an (H, W, 3) float image to PNG."""
    from PIL import Image
    arr = np.clip(np.asarray(image) * 255 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(str(path))
