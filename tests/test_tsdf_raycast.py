"""Raycast over dense and block-sparse TSDF volumes.

Oracles: analytic ray-surface intersections (plane / sphere scenes) and
dense↔sparse agreement on identical integrations.
"""

import numpy as np
import jax.numpy as jnp

from threecrate_tpu.ops import tsdf as dense_mod
from threecrate_tpu.ops import tsdf_sparse as sp
from threecrate_tpu.ops import tsdf_raycast as rc


RES = (64, 64, 64)
VOX = 4.0 / 64
ORIGIN = (-2.0, -2.0, 0.5)
H, W = 48, 64
INTR = jnp.asarray([60.0, 60.0, W / 2 - 0.5, H / 2 - 0.5], jnp.float32)
EYE = jnp.eye(4, dtype=jnp.float32)


def _plane_volume(depth_z=2.0):
    """Integrate a constant-depth frame from the identity pose."""
    vol = dense_mod.create_volume(RES, VOX, origin=ORIGIN)
    depth = jnp.full((H, W), jnp.float32(depth_z))
    return dense_mod.integrate(vol, depth, INTR, EYE)


def _sphere_volume(center=(0.0, 0.0, 2.0), radius=0.8):
    """Analytic clipped-SDF sphere, observed everywhere (weight 1)."""
    vol = dense_mod.create_volume(RES, VOX, origin=ORIGIN)
    nx, ny, nz = RES
    ax = np.arange(nx) + 0.5
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    p = np.stack([gx, gy, gz], -1) * VOX + np.asarray(ORIGIN)
    d = np.linalg.norm(p - np.asarray(center), axis=-1) - radius
    trunc = float(vol.truncation)
    tsdf = np.clip(d / trunc, -1.0, 1.0).astype(np.float32)
    return vol._replace(tsdf=jnp.asarray(tsdf),
                        weight=jnp.ones(RES, jnp.float32))


class TestDenseRaycast:
    def test_plane_depth_and_normals(self):
        vol = _plane_volume(2.0)
        res = rc.raycast(vol, INTR, EYE, H, W, near=0.6, far=3.5)
        m = np.asarray(res.mask)
        # central pixels hit (borders may graze partially-observed voxels)
        assert m[8:-8, 8:-8].mean() > 0.95
        d = np.asarray(res.depth)[m]
        assert np.abs(d - 2.0).max() < 1.5 * VOX
        n = np.asarray(res.normals)[m]
        # TSDF gradient points toward the camera (free space)
        assert (n[:, 2] < -0.97).mean() > 0.95
        # vertices reproject to the plane
        v = np.asarray(res.vertices)[m]
        assert np.abs(v[:, 2] - 2.0).max() < 1.5 * VOX

    def test_sphere_depth_and_radial_normals(self):
        c, r = np.array([0.0, 0.0, 2.0]), 0.8
        vol = _sphere_volume(tuple(c), r)
        res = rc.raycast(vol, INTR, EYE, H, W, near=0.6, far=3.5)
        m = np.asarray(res.mask)
        assert m[H // 2, W // 2]
        # central ray: analytic first intersection at z = cz - r
        d_center = float(res.depth[H // 2, W // 2])
        assert abs(d_center - (2.0 - r)) < VOX
        v = np.asarray(res.vertices)[m]
        n = np.asarray(res.normals)[m]
        radial = v - c
        radial /= np.linalg.norm(radial, axis=1, keepdims=True)
        dots = np.sum(n * radial, axis=1)
        assert np.quantile(dots, 0.05) > 0.9
        # hit points lie on the sphere
        err = np.abs(np.linalg.norm(v - c, axis=1) - r)
        assert np.quantile(err, 0.95) < VOX

    def test_miss_rays_masked(self):
        vol = _plane_volume(2.0)
        # far plane short of the surface: every ray must miss
        res = rc.raycast(vol, INTR, EYE, H, W, near=0.6, far=1.2)
        assert not bool(np.asarray(res.mask).any())
        assert float(jnp.max(jnp.abs(res.depth))) == 0.0

    def test_unobserved_volume_yields_no_hits(self):
        vol = dense_mod.create_volume(RES, VOX, origin=ORIGIN)
        res = rc.raycast(vol, INTR, EYE, H, W, near=0.6, far=3.5)
        assert not bool(np.asarray(res.mask).any())


class TestSparseRaycast:
    GRID = (8, 8, 8)

    def _both(self):
        depth = jnp.full((H, W), jnp.float32(2.0))
        dense = dense_mod.create_volume(RES, VOX, origin=ORIGIN)
        dense = dense_mod.integrate(dense, depth, INTR, EYE)
        sparse = sp.create_sparse_volume(VOX, origin=ORIGIN,
                                         grid_blocks=self.GRID, block=8,
                                         max_blocks=512)
        sparse = sp.sparse_integrate(sparse, depth, INTR, EYE,
                                     grid_blocks=self.GRID, block=8)
        return dense, sparse

    def test_matches_dense(self):
        dense, sparse = self._both()
        rd = rc.raycast(dense, INTR, EYE, H, W, near=0.6, far=3.5)
        rs = rc.sparse_raycast(sparse, INTR, EYE, H, W,
                               grid_blocks=self.GRID, block=8,
                               near=0.6, far=3.5)
        md, ms = np.asarray(rd.mask), np.asarray(rs.mask)
        both = md & ms
        assert both[8:-8, 8:-8].mean() > 0.9
        dd = np.asarray(rd.depth)[both]
        ds = np.asarray(rs.depth)[both]
        # allocation samples rays at ±truncation only, so blocks with
        # sliver overlap of the band can stay unallocated and read 1.0
        # where dense has a real value — shifting the secant by up to a
        # voxel on border pixels. Bulk must agree exactly.
        diff = np.abs(dd - ds)
        assert np.median(diff) < 0.05 * VOX
        assert (diff < 0.5 * VOX).mean() > 0.97
        assert diff.max() < 1.5 * VOX
        nd = np.asarray(rd.normals)[both]
        ns = np.asarray(rs.normals)[both]
        assert np.quantile(np.sum(nd * ns, axis=1), 0.05) > 0.99

    def test_shade_range_and_background(self):
        _, sparse = self._both()
        rs = rc.sparse_raycast(sparse, INTR, EYE, H, W,
                               grid_blocks=self.GRID, block=8,
                               near=0.6, far=3.5)
        img = np.asarray(rc.shade(rs, background=0.0))
        assert img.shape == (H, W)
        assert img.min() >= 0.0 and img.max() <= 1.0
        assert np.all(img[np.asarray(rs.mask)] >= 0.15 - 1e-6)
        assert np.all(img[~np.asarray(rs.mask)] == 0.0)


class TestHierarchicalSeeding:
    """coarse_factor>1 runs a 1/f² seed pass; results must match the
    flat march away from silhouette borders, and all-miss regions
    (declared misses without marching) must stay misses."""

    def test_matches_flat_on_plane(self):
        vol = _plane_volume(2.0)
        flat = rc.raycast(vol, INTR, EYE, H, W, near=0.6, far=3.5,
                          coarse_factor=1)
        hier = rc.raycast(vol, INTR, EYE, H, W, near=0.6, far=3.5,
                          coarse_factor=4)
        mf = np.asarray(flat.mask)[8:-8, 8:-8]
        mh = np.asarray(hier.mask)[8:-8, 8:-8]
        # central hits identical
        assert (mf == mh).mean() > 0.99
        both = mf & mh
        df = np.asarray(flat.depth)[8:-8, 8:-8][both]
        dh = np.asarray(hier.depth)[8:-8, 8:-8][both]
        assert np.abs(df - dh).max() < 0.51 * VOX
        assert np.median(np.abs(df - dh)) < 0.05 * VOX

    def test_sphere_center_depth(self):
        c, r = np.array([0.0, 0.0, 2.0]), 0.8
        vol = _sphere_volume(tuple(c), r)
        res = rc.raycast(vol, INTR, EYE, H, W, near=0.6, far=3.5,
                         coarse_factor=4)
        assert bool(res.mask[H // 2, W // 2])
        assert abs(float(res.depth[H // 2, W // 2]) - (2.0 - r)) < VOX

    def test_far_short_of_surface_all_miss(self):
        vol = _plane_volume(2.0)
        res = rc.raycast(vol, INTR, EYE, H, W, near=0.6, far=1.2,
                         coarse_factor=4)
        assert not bool(np.asarray(res.mask).any())

    def test_sparse_hier_matches_flat(self):
        depth = jnp.full((H, W), jnp.float32(2.0))
        sparse = sp.create_sparse_volume(VOX, origin=ORIGIN,
                                         grid_blocks=(8, 8, 8), block=8,
                                         max_blocks=512)
        sparse = sp.sparse_integrate(sparse, depth, INTR, EYE,
                                     grid_blocks=(8, 8, 8), block=8)
        flat = rc.sparse_raycast(sparse, INTR, EYE, H, W,
                                 grid_blocks=(8, 8, 8), block=8,
                                 near=0.6, far=3.5, coarse_factor=1)
        hier = rc.sparse_raycast(sparse, INTR, EYE, H, W,
                                 grid_blocks=(8, 8, 8), block=8,
                                 near=0.6, far=3.5, coarse_factor=4)
        mf, mh = np.asarray(flat.mask), np.asarray(hier.mask)
        both = (mf & mh)[8:-8, 8:-8]
        assert both.mean() > 0.9
        df = np.asarray(flat.depth)[8:-8, 8:-8][both]
        dh = np.asarray(hier.depth)[8:-8, 8:-8][both]
        assert np.median(np.abs(df - dh)) < 0.05 * VOX


class TestColorRaycast:
    """Color channel sampling: volumes integrated with_color=True give
    per-hit nearest-voxel colors; shade_rgb lights them."""

    def test_dense_color_roundtrip(self):
        vol = dense_mod.create_volume(RES, VOX, origin=ORIGIN,
                                      with_color=True)
        depth = jnp.full((H, W), jnp.float32(2.0))
        rgb = jnp.broadcast_to(jnp.asarray([0.8, 0.4, 0.1], jnp.float32),
                               (H, W, 3))
        vol = dense_mod.integrate(vol, depth, INTR, EYE, rgb=rgb)
        res = rc.raycast(vol, INTR, EYE, H, W, near=0.6, far=3.5)
        m = np.asarray(res.mask)
        assert res.color is not None and res.color.shape == (H, W, 3)
        c = np.asarray(res.color)[m]
        # hit colors match the constant input (nearest-voxel, weighted
        # average of identical samples)
        assert np.allclose(np.median(c, axis=0), [0.8, 0.4, 0.1],
                           atol=0.02)
        img = rc.shade_rgb(res)
        assert img.shape == (H, W, 3)
        assert float(img.max()) <= 1.0 and float(img.min()) >= 0.0
        # background black, lit pixels tinted toward the input hue
        assert np.all(np.asarray(img)[~m] == 0.0)

    def test_sparse_color_matches_dense(self):
        depth = jnp.full((H, W), jnp.float32(2.0))
        rgb = jnp.broadcast_to(jnp.asarray([0.2, 0.9, 0.5], jnp.float32),
                               (H, W, 3))
        sparse = sp.create_sparse_volume(VOX, origin=ORIGIN,
                                         grid_blocks=(8, 8, 8), block=8,
                                         max_blocks=512, with_color=True)
        sparse = sp.sparse_integrate(sparse, depth, INTR, EYE,
                                     grid_blocks=(8, 8, 8), block=8,
                                     rgb=rgb)
        res = rc.sparse_raycast(sparse, INTR, EYE, H, W,
                                grid_blocks=(8, 8, 8), block=8,
                                near=0.6, far=3.5)
        m = np.asarray(res.mask)
        assert res.color is not None
        c = np.asarray(res.color)[m]
        assert np.allclose(np.median(c, axis=0), [0.2, 0.9, 0.5],
                           atol=0.02)

    def test_no_color_volume_gives_none(self):
        vol = _plane_volume(2.0)
        res = rc.raycast(vol, INTR, EYE, H, W, near=0.6, far=3.5)
        assert res.color is None
        img = rc.shade_rgb(res)      # shades white
        assert img.shape == (H, W, 3)


class TestMaterializedParity:
    """materialize=True (block-major dense copy, default ≤512³) and
    materialize=False (row-map + table chain) must agree exactly —
    the sentinel encodings are equivalent by construction."""

    def test_paths_identical(self):
        depth = jnp.full((H, W), jnp.float32(2.0))
        sparse = sp.create_sparse_volume(VOX, origin=ORIGIN,
                                         grid_blocks=(8, 8, 8), block=8,
                                         max_blocks=512)
        sparse = sp.sparse_integrate(sparse, depth, INTR, EYE,
                                     grid_blocks=(8, 8, 8), block=8)
        a = rc.sparse_raycast(sparse, INTR, EYE, H, W,
                              grid_blocks=(8, 8, 8), block=8,
                              near=0.6, far=3.5, materialize=True)
        b = rc.sparse_raycast(sparse, INTR, EYE, H, W,
                              grid_blocks=(8, 8, 8), block=8,
                              near=0.6, far=3.5, materialize=False)
        assert np.array_equal(np.asarray(a.mask), np.asarray(b.mask))
        np.testing.assert_allclose(np.asarray(a.depth),
                                   np.asarray(b.depth), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.normals),
                                   np.asarray(b.normals), atol=1e-5)
