"""Mesh op tests: smoothing shrinks noise, booleans on unit cubes,
colorization projection, TSDF integrate/extract round trip."""

import numpy as np
import pytest

from threecrate_tpu import CameraIntrinsics, PointCloud, TriangleMesh
from threecrate_tpu.ops import (
    colorization, mesh_boolean, mesh_smoothing, tsdf)


def cube_mesh(center=(0, 0, 0), size=1.0):
    c = np.asarray(center, np.float32)
    h = size / 2
    v = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                  for z in (-h, h)], np.float32) + c
    f = np.array([
        [0, 1, 3], [0, 3, 2],   # x-
        [4, 6, 7], [4, 7, 5],   # x+
        [0, 4, 5], [0, 5, 1],   # y-
        [2, 3, 7], [2, 7, 6],   # y+
        [0, 2, 6], [0, 6, 4],   # z-
        [1, 5, 7], [1, 7, 3],   # z+
    ], np.int32)
    return TriangleMesh.from_numpy(v, f)


def mesh_volume(mesh: TriangleMesh) -> float:
    v, f = mesh.to_numpy()
    tri = v[f].astype(np.float64)
    return float(np.abs(np.einsum(
        "ij,ij->i", tri[:, 0], np.cross(tri[:, 1], tri[:, 2])).sum() / 6.0))


def noisy_sphere_mesh(n_sub=12, noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    # UV sphere
    thetas = np.linspace(0.2, np.pi - 0.2, n_sub)
    phis = np.linspace(0, 2 * np.pi, n_sub, endpoint=False)
    verts = []
    for t in thetas:
        for p in phis:
            verts.append([np.sin(t) * np.cos(p), np.sin(t) * np.sin(p),
                          np.cos(t)])
    verts = np.asarray(verts, np.float32)
    faces = []
    for i in range(n_sub - 1):
        for j in range(n_sub):
            a = i * n_sub + j
            b = i * n_sub + (j + 1) % n_sub
            c = (i + 1) * n_sub + j
            d = (i + 1) * n_sub + (j + 1) % n_sub
            faces += [[a, b, c], [b, d, c]]
    verts += noise * rng.normal(size=verts.shape).astype(np.float32)
    return TriangleMesh.from_numpy(verts, np.asarray(faces, np.int32))


def noisy_grid_mesh(n=20, noise=0.05, seed=0):
    """Flat z=0 grid with z-noise; interior vertices isolate smoothing
    behavior from boundary shrinkage."""
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    z = noise * rng.normal(size=xs.shape)
    v = np.stack([xs.ravel(), ys.ravel(), z.ravel()], -1).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b = i * n + j, i * n + j + 1
            c, d = (i + 1) * n + j, (i + 1) * n + j + 1
            faces += [[a, b, c], [b, d, c]]
    interior = np.zeros(n * n, bool)
    interior.reshape(n, n)[2:-2, 2:-2] = True
    return TriangleMesh.from_numpy(v, np.asarray(faces, np.int32)), interior


class TestSmoothing:
    def _z_noise(self, mesh, interior):
        v, _ = mesh.to_numpy()
        return v[interior, 2].std()

    def test_laplacian_reduces_noise(self):
        m, interior = noisy_grid_mesh()
        before = self._z_noise(m, interior)
        out = mesh_smoothing.smooth_laplacian(
            m, mesh_smoothing.LaplacianConfig(iterations=5))
        assert self._z_noise(out, interior) < before * 0.4

    def test_taubin_reduces_noise_less_shrinkage(self):
        m, interior = noisy_grid_mesh()
        before = self._z_noise(m, interior)
        out = mesh_smoothing.smooth_taubin(
            m, mesh_smoothing.TaubinConfig(iterations=10))
        assert self._z_noise(out, interior) < before * 0.5
        # xy positions barely move (pure tangential drift is tiny)
        v0, _ = m.to_numpy()
        v1, _ = out.to_numpy()
        assert np.abs(v1[interior, :2] - v0[interior, :2]).max() < 0.05

    def test_hc_reduces_noise_keeps_shape(self):
        m, interior = noisy_grid_mesh()
        before = self._z_noise(m, interior)
        out = mesh_smoothing.smooth_hc(
            m, mesh_smoothing.HcConfig(iterations=10))
        # HC trades less noise reduction for shape retention
        assert self._z_noise(out, interior) < before
        v0, _ = m.to_numpy()
        v1, _ = out.to_numpy()
        # the original-position correction keeps vertices close
        assert np.abs(v1[interior] - v0[interior]).max() < 0.2


class TestBoolean:
    def test_union_disjoint_keeps_both(self):
        a = cube_mesh((0, 0, 0), 1.0)
        b = cube_mesh((5, 0, 0), 1.0)
        u = mesh_boolean.mesh_union(a, b)
        assert abs(mesh_volume(u) - 2.0) < 0.01

    def test_union_overlapping(self):
        a = cube_mesh((0, 0, 0), 1.0)
        b = cube_mesh((0.5, 0, 0), 1.0)
        u = mesh_boolean.mesh_union(a, b)
        assert abs(mesh_volume(u) - 1.5) < 0.02

    def test_intersection(self):
        a = cube_mesh((0, 0, 0), 1.0)
        b = cube_mesh((0.5, 0, 0), 1.0)
        i = mesh_boolean.mesh_intersection(a, b)
        assert abs(mesh_volume(i) - 0.5) < 0.02

    def test_difference(self):
        a = cube_mesh((0, 0, 0), 1.0)
        b = cube_mesh((0.5, 0, 0), 1.0)
        d = mesh_boolean.mesh_difference(a, b)
        assert abs(mesh_volume(d) - 0.5) < 0.02

    def test_empty_rejected(self):
        from threecrate_tpu.core.errors import InvalidDataError
        with pytest.raises(InvalidDataError):
            mesh_boolean.mesh_union(cube_mesh(), TriangleMesh.empty())


class TestColorization:
    def test_single_image_projection(self):
        # camera at origin looking +z; two points: one red-pixel, one out
        img = np.zeros((4, 4, 3), np.float32)
        img[2, 2] = [1.0, 0.0, 0.0]
        intr = CameraIntrinsics(fx=4.0, fy=4.0, cx=2.0, cy=2.0)
        view = colorization.RgbImageView(
            image=img, intrinsics=intr, world_to_camera=np.eye(4, dtype=np.float32))
        pts = np.array([[0, 0, 1.0],     # projects to (2, 2) → red
                        [0, 0, -1.0]],   # behind camera → default
                       np.float32)
        pc = PointCloud.from_numpy(pts)
        out = colorization.colorize_point_cloud(pc, view)
        c = out.attr_to_numpy("colors")
        np.testing.assert_allclose(c[0], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(c[1], [0, 0, 0], atol=1e-6)

    def test_bilinear_blends(self):
        img = np.zeros((2, 2, 3), np.float32)
        img[:, 1] = 1.0  # right column white
        intr = CameraIntrinsics(fx=1.0, fy=1.0, cx=0.5, cy=0.5)
        view = colorization.RgbImageView(
            image=img, intrinsics=intr,
            world_to_camera=np.eye(4, dtype=np.float32))
        pts = np.array([[0, 0, 1.0]], np.float32)  # u=v=0.5 center
        pc = PointCloud.from_numpy(pts)
        out = colorization.colorize_point_cloud(
            pc, view, colorization.InterpolationMode.BILINEAR)
        c = out.attr_to_numpy("colors")
        np.testing.assert_allclose(c[0], [0.5, 0.5, 0.5], atol=1e-6)

    def test_first_hit_priority(self):
        img1 = np.full((2, 2, 3), 0.25, np.float32)
        img2 = np.full((2, 2, 3), 0.75, np.float32)
        intr = CameraIntrinsics(1.0, 1.0, 0.5, 0.5)
        eye = np.eye(4, dtype=np.float32)
        v1 = colorization.RgbImageView(img1, intr, eye)
        v2 = colorization.RgbImageView(img2, intr, eye)
        pc = PointCloud.from_numpy(np.array([[0, 0, 1.0]], np.float32))
        out = colorization.colorize_from_images(pc, [v1, v2])
        np.testing.assert_allclose(out.attr_to_numpy("colors")[0],
                                   [0.25] * 3, atol=1e-6)


class TestTsdf:
    def test_flat_wall_integration(self):
        # wall at z=0.5 seen by a camera at origin looking +z
        vol = tsdf.create_volume((32, 32, 32), voxel_size=1.0 / 32,
                                 origin=(-0.5, -0.5, 0.0))
        depth = np.full((32, 32), 0.5, np.float32)
        intr = np.array([32.0, 32.0, 16.0, 16.0], np.float32)
        pose = np.eye(4, dtype=np.float32)
        out = tsdf.integrate(vol, depth, intr, pose)
        t = np.asarray(out.tsdf)
        w = np.asarray(out.weight)
        assert w.sum() > 0
        # voxels well in front of the wall → +1, behind → untouched or -1
        zi = np.arange(32)
        front = t[16, 16, 4]   # z ≈ 0.14 < 0.5 → positive
        near = t[16, 16, 16]   # z ≈ 0.5 → ~0
        assert front > 0.9
        assert abs(near) < 0.2

    def test_extract_surface_finds_wall(self):
        vol = tsdf.create_volume((32, 32, 32), voxel_size=1.0 / 32,
                                 origin=(-0.5, -0.5, 0.0))
        depth = np.full((64, 64), 0.5, np.float32)
        intr = np.array([64.0, 64.0, 32.0, 32.0], np.float32)
        pose = np.eye(4, dtype=np.float32)
        out = tsdf.integrate(vol, depth, intr, pose)
        surf = tsdf.extract_surface(out)
        pts = surf.cloud.to_numpy()
        assert int(surf.count) > 50
        # surface points near z = 0.5
        assert np.abs(pts[:, 2] - 0.5).mean() < 0.05

    def test_extract_surface_banded_bitexact(self):
        """Banded extraction = dense extraction, bitwise (same value
        arithmetic on the same inputs; only the compaction differs)."""
        vol = tsdf.create_volume((48, 48, 48), voxel_size=0.05,
                                 origin=(-1.2, -1.2, -1.2))
        ax = (np.arange(48) + 0.5) * 0.05 - 1.2
        x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
        sdf = np.sqrt(x * x + y * y + z * z) - 0.8
        t = np.clip(sdf / float(vol.truncation), -1, 1).astype(np.float32)
        w = (np.abs(sdf) < 0.5).astype(np.float32) * 2.0
        import jax.numpy as jnp
        vol = vol._replace(tsdf=jnp.asarray(t), weight=jnp.asarray(w))
        d = tsdf.extract_surface(vol)
        b = tsdf.extract_surface_banded_auto(vol)
        assert int(d.count) == int(b.count) > 1000
        qd = np.asarray(d.cloud.points)[np.asarray(d.cloud.mask)]
        qb = np.asarray(b.cloud.points)[np.asarray(b.cloud.mask)]
        qd = qd[np.lexsort(qd.T)]
        qb = qb[np.lexsort(qb.T)]
        assert np.array_equal(qd, qb)

    def test_extract_surface_banded_dense_fallback(self):
        """Fields crossing everywhere must fall back to the dense
        sweep (identical SurfacePoints shape contract)."""
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        vol = tsdf.create_volume((16, 16, 16), voxel_size=0.1)
        t = rng.normal(size=(16, 16, 16)).astype(np.float32)
        vol = vol._replace(tsdf=jnp.asarray(t),
                           weight=jnp.ones((16, 16, 16), jnp.float32))
        d = tsdf.extract_surface(vol)
        b = tsdf.extract_surface_banded_auto(vol)
        assert b.cloud.points.shape == d.cloud.points.shape
        assert int(d.count) == int(b.count)

    def test_sequence_scan(self):
        vol = tsdf.create_volume((16, 16, 16), voxel_size=0.1,
                                 origin=(-0.8, -0.8, 0.0))
        depths = np.full((3, 16, 16), 0.7, np.float32)
        poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        intr = np.array([16.0, 16.0, 8.0, 8.0], np.float32)
        out = tsdf.integrate_sequence(vol, depths, intr, poses)
        w = np.asarray(out.weight)
        assert w.max() == 3.0  # three frames fused

    def test_color_fusion(self):
        vol = tsdf.create_volume((8, 8, 8), voxel_size=0.1,
                                 origin=(-0.4, -0.4, 0.0), with_color=True)
        depth = np.full((8, 8), 0.3, np.float32)
        rgb = np.full((8, 8, 3), 0.5, np.float32)
        intr = np.array([8.0, 8.0, 4.0, 4.0], np.float32)
        out = tsdf.integrate(vol, depth, intr, np.eye(4, dtype=np.float32),
                             rgb=rgb)
        c = np.asarray(out.color)
        w = np.asarray(out.weight)
        assert np.allclose(c[w > 0], 0.5, atol=1e-5)
