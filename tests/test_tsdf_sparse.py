"""Block-sparse TSDF vs the dense volume (same projective semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from threecrate_tpu.ops import tsdf as dense_mod
from threecrate_tpu.ops import tsdf_sparse as sp


GRID = (8, 8, 8)     # 8^3 blocks of 8^3 voxels = 64^3 virtual
BLOCK = 8
VOX = 4.0 / 64


def _frame(seed=0, h=120, w=160):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 2.0 + 0.3 * np.sin(xx / 20.0) * np.cos(yy / 15.0)
    return (base + 0.005 * rng.normal(0, 1, (h, w))).astype(np.float32), \
        jnp.asarray([130.0, 130.0, w / 2, h / 2], jnp.float32)


class TestSparseTsdf:
    def _fuse_both(self, n_frames=3):
        depth, intr = _frame()
        pose = np.eye(4, dtype=np.float32)
        dense = dense_mod.create_volume((64, 64, 64), VOX,
                                        origin=(-2.0, -2.0, 0.5))
        sparse = sp.create_sparse_volume(VOX, origin=(-2.0, -2.0, 0.5),
                                         grid_blocks=GRID, block=BLOCK,
                                         max_blocks=512)
        for i in range(n_frames):
            p = pose.copy()
            p[0, 3] = 0.02 * i
            dense = dense_mod.integrate(dense, jnp.asarray(depth), intr,
                                        jnp.asarray(p))
            sparse = sp.sparse_integrate(sparse, jnp.asarray(depth),
                                         intr, jnp.asarray(p),
                                         grid_blocks=GRID, block=BLOCK)
        return dense, sparse

    def test_allocates_only_near_surface(self):
        _, sparse = self._fuse_both()
        n = int(sparse.n_blocks)
        assert 0 < n < 512
        # surface band blocks only: far fewer than the full 8^3 grid
        assert n < 8 ** 3

    def test_tsdf_matches_dense_on_allocated(self):
        dense, sparse = self._fuse_both()
        d2 = sp.sparse_to_dense(sparse, GRID, BLOCK)
        dt = np.asarray(dense.tsdf)
        dw = np.asarray(dense.weight)
        st = np.asarray(d2.tsdf)
        sw = np.asarray(d2.weight)
        # wherever the sparse volume has weight, it must agree with the
        # dense fusion exactly (same update math on the same voxels)
        m = sw > 0
        assert m.sum() > 1000
        np.testing.assert_allclose(st[m], dt[m], atol=1e-5)
        np.testing.assert_allclose(sw[m], dw[m], atol=1e-5)
        # and the sparse volume covers the dense surface band: every
        # dense voxel with |tsdf| < 0.5 and weight must be allocated
        band = (np.abs(dt) < 0.5) & (dw > 0)
        assert (sw[band] > 0).mean() > 0.98

    def test_surface_points_match_dense(self):
        dense, sparse = self._fuse_both()
        res_d = dense_mod.extract_surface(dense)
        res_s = sp.sparse_extract_surface(sparse, GRID, BLOCK)
        nd, ns = int(res_d.count), int(res_s.count)
        assert abs(nd - ns) <= 0.02 * max(nd, 1), (nd, ns)
        pd = np.asarray(res_d.cloud.points)[np.asarray(res_d.cloud.mask)]
        ps = np.asarray(res_s.cloud.points)[np.asarray(res_s.cloud.mask)]
        # same point sets (order-free compare via sorted rows)
        kd = np.sort(pd.round(5).view([("x", "f4"), ("y", "f4"),
                                       ("z", "f4")]).ravel())
        ks = np.sort(ps.round(5).view([("x", "f4"), ("y", "f4"),
                                       ("z", "f4")]).ravel())
        common = np.intersect1d(kd, ks).size
        assert common > 0.97 * max(nd, ns)

    def test_overflow_reports(self):
        depth, intr = _frame()
        tiny = sp.create_sparse_volume(VOX, origin=(-2.0, -2.0, 0.5),
                                       grid_blocks=GRID, block=BLOCK,
                                       max_blocks=8)
        out = sp.sparse_integrate(tiny, jnp.asarray(depth), intr,
                                  jnp.asarray(np.eye(4, dtype=np.float32)),
                                  grid_blocks=GRID, block=BLOCK)
        assert int(out.n_blocks) == 8   # clamped at capacity


class TestSparseMarchingCubes:
    def test_mesh_matches_dense_mc(self):
        from threecrate_tpu.reconstruction.marching_cubes import (
            VolumetricGrid, marching_cubes, soup_to_mesh)
        depth, intr = _frame()
        pose = jnp.asarray(np.eye(4, dtype=np.float32))
        dense = dense_mod.create_volume((64, 64, 64), VOX,
                                        origin=(-2.0, -2.0, 0.5))
        sparse = sp.create_sparse_volume(VOX, origin=(-2.0, -2.0, 0.5),
                                         grid_blocks=GRID, block=BLOCK,
                                         max_blocks=512)
        dense = dense_mod.integrate(dense, jnp.asarray(depth), intr, pose)
        sparse = sp.sparse_integrate(sparse, jnp.asarray(depth), intr,
                                     pose, grid_blocks=GRID, block=BLOCK)
        # dense MC: mask unobserved voxels the same way
        vals = np.where(np.asarray(dense.weight) >= 1.0,
                        np.asarray(dense.tsdf), 1.0)
        g = VolumetricGrid(jnp.asarray(vals),
                           dense.origin + 0.5 * dense.voxel_size,
                           dense.voxel_size)
        mesh_d = marching_cubes(g, 0.0)
        soup_s = sp.sparse_marching_cubes_soup(sparse, GRID, BLOCK)
        mesh_s = soup_to_mesh(soup_s)
        fd, fs = int(mesh_d.face_count()), int(mesh_s.face_count())
        assert fs > 0
        # same triangle count up to the virtual-grid boundary seam
        assert abs(fd - fs) <= 0.03 * max(fd, 1), (fd, fs)
        # vertex sets match (rounded-row intersection)
        vd = np.asarray(mesh_d.vertices)[:int(mesh_d.vertex_count())]
        vs = np.asarray(mesh_s.vertices)[:int(mesh_s.vertex_count())]
        kd = set(map(tuple, vd.round(4).tolist()))
        ks = set(map(tuple, vs.round(4).tolist()))
        inter = len(kd & ks)
        assert inter > 0.95 * max(len(kd), len(ks)), (len(kd), len(ks),
                                                     inter)


class TestSparseSequence:
    def test_scan_matches_loop(self):
        depth, intr = _frame()
        n_frames = 3
        depths = np.stack([depth] * n_frames)
        poses = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
        poses[:, 0, 3] = np.linspace(0, 0.04, n_frames)
        v_loop = sp.create_sparse_volume(VOX, origin=(-2.0, -2.0, 0.5),
                                         grid_blocks=GRID, block=BLOCK,
                                         max_blocks=512)
        for i in range(n_frames):
            v_loop = sp.sparse_integrate(v_loop, jnp.asarray(depths[i]),
                                         intr, jnp.asarray(poses[i]),
                                         grid_blocks=GRID, block=BLOCK)
        v_scan = sp.sparse_integrate_sequence(
            sp.create_sparse_volume(VOX, origin=(-2.0, -2.0, 0.5),
                                    grid_blocks=GRID, block=BLOCK,
                                    max_blocks=512),
            jnp.asarray(depths), intr, jnp.asarray(poses),
            grid_blocks=GRID, block=BLOCK)
        assert int(v_loop.n_blocks) == int(v_scan.n_blocks)
        np.testing.assert_array_equal(np.asarray(v_loop.block_keys),
                                      np.asarray(v_scan.block_keys))
        np.testing.assert_allclose(np.asarray(v_loop.tsdf),
                                   np.asarray(v_scan.tsdf), atol=1e-6)


class TestSparseColor:
    def test_color_fuses_like_dense(self):
        depth, intr = _frame()
        h, w = depth.shape
        rgb = (np.random.default_rng(3).uniform(0, 1, (h, w, 3))
               ).astype(np.float32)
        pose = jnp.asarray(np.eye(4, dtype=np.float32))
        dense = dense_mod.create_volume((64, 64, 64), VOX,
                                        origin=(-2.0, -2.0, 0.5),
                                        with_color=True)
        sparse = sp.create_sparse_volume(VOX, origin=(-2.0, -2.0, 0.5),
                                         grid_blocks=GRID, block=BLOCK,
                                         max_blocks=512, with_color=True)
        for _ in range(2):
            dense = dense_mod.integrate(dense, jnp.asarray(depth), intr,
                                        pose, rgb=jnp.asarray(rgb))
            sparse = sp.sparse_integrate(sparse, jnp.asarray(depth),
                                         intr, pose, grid_blocks=GRID,
                                         block=BLOCK,
                                         rgb=jnp.asarray(rgb))
        d2 = sp.sparse_to_dense(sparse, GRID, BLOCK)
        # compare fused colors on voxels the sparse volume observed
        s1 = BLOCK + 1
        sc = np.asarray(sparse.color).reshape(-1, s1, s1, s1, 3)
        sw = np.asarray(sparse.weight).reshape(-1, s1, s1, s1)
        keys = np.asarray(sparse.block_keys)
        dcol = np.asarray(dense.color)
        checked = 0
        for i in range(int(sparse.n_blocks)):
            k = int(keys[i])
            bz = k % GRID[2]
            by = (k // GRID[2]) % GRID[1]
            bx = k // (GRID[1] * GRID[2])
            m = sw[i, :BLOCK, :BLOCK, :BLOCK] > 0
            if not m.any():
                continue
            dsub = dcol[bx*BLOCK:(bx+1)*BLOCK, by*BLOCK:(by+1)*BLOCK,
                        bz*BLOCK:(bz+1)*BLOCK]
            np.testing.assert_allclose(
                sc[i, :BLOCK, :BLOCK, :BLOCK][m], dsub[m], atol=1e-5)
            checked += m.sum()
        assert checked > 500


class TestUpdateCompaction:
    """update_fraction caps the per-frame update to the frame's band
    blocks; when the band fits the cap the result must be identical to
    updating every row."""

    def test_fraction_parity(self):
        import jax.numpy as jnp
        H, W = 48, 64
        intr = jnp.asarray([60.0, 60.0, W / 2 - 0.5, H / 2 - 0.5],
                           jnp.float32)
        eye = jnp.eye(4, dtype=jnp.float32)
        import numpy as np
        yy, xx = np.mgrid[0:H, 0:W]
        d1 = jnp.asarray(2.0 + 0.2 * np.sin(xx / 9.0), jnp.float32)
        d2 = jnp.asarray(2.1 + 0.2 * np.cos(yy / 7.0), jnp.float32)
        gb = (8, 8, 8)

        def fuse(frac):
            v = sp.create_sparse_volume(4.0 / 64, origin=(-2., -2., .5),
                                        grid_blocks=gb, block=8,
                                        max_blocks=512)
            for d in (d1, d2):
                v = sp.sparse_integrate(v, d, intr, eye, grid_blocks=gb,
                                        block=8, update_fraction=frac)
            return v

        a, b = fuse(1.0), fuse(0.5)
        assert np.array_equal(np.asarray(a.block_keys),
                              np.asarray(b.block_keys))
        np.testing.assert_allclose(np.asarray(a.tsdf),
                                   np.asarray(b.tsdf), atol=1e-7)
        np.testing.assert_allclose(np.asarray(a.weight),
                                   np.asarray(b.weight), atol=1e-7)
