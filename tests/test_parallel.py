"""Sharded-kernel tests on the virtual 8-device CPU mesh.

No reference precedent (the reference is single-process); oracle =
our own single-device kernels, per SURVEY §4's guidance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threecrate_tpu import PointCloud, Transform
from threecrate_tpu.ops import neighbors, registration
from threecrate_tpu.parallel import (
    make_mesh, make_sharded_icp, make_sharded_knn, put_sharded)


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def surface_cloud(n=1024, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    z = 0.4 * np.sin(xy[:, 0] * 2.0) + 0.3 * np.cos(xy[:, 1] * 1.7)
    return np.stack([xy[:, 0], xy[:, 1], z], -1).astype(np.float32)


class TestRingKnn:
    def test_matches_local_knn(self):
        mesh = make_mesh(8)
        pts = surface_cloud(1024)
        q = surface_cloud(512, seed=3)
        knn_fn = make_sharded_knn(mesh, k=4)
        db = put_sharded(jnp.asarray(pts), mesh)
        dbm = put_sharded(jnp.ones(1024, bool), mesh)
        qs = put_sharded(jnp.asarray(q), mesh)
        dist, idx = knn_fn(qs, db, dbm)
        ref = neighbors.knn(jnp.asarray(pts), jnp.ones(1024, bool),
                            jnp.asarray(q), None, 4)
        np.testing.assert_allclose(np.asarray(dist),
                                   np.asarray(ref.distances), atol=1e-4)
        # indices agree wherever distances are unambiguous
        gap = np.diff(np.asarray(ref.distances), axis=1) > 1e-5
        ii, ri = np.asarray(idx), np.asarray(ref.indices)
        agree = (ii == ri)
        assert agree[:, 0][gap[:, 0]].mean() > 0.99


class TestShardedIcp:
    def test_matches_single_device(self):
        mesh = make_mesh(8)
        pts = surface_cloud(2048)
        t_true = Transform.from_translation([0.05, -0.02, 0.01])
        tgt = pts @ np.asarray(t_true.matrix)[:3, :3].T \
            + np.asarray(t_true.matrix)[:3, 3]
        icp_fn = make_sharded_icp(mesh, max_iterations=30)
        src_s = put_sharded(jnp.asarray(pts), mesh)
        sm = put_sharded(jnp.ones(2048, bool), mesh)
        tgt_s = put_sharded(jnp.asarray(tgt.astype(np.float32)), mesh)
        tm = put_sharded(jnp.ones(2048, bool), mesh)
        t, mse, it, conv = icp_fn(src_s, sm, tgt_s, tm)
        np.testing.assert_allclose(np.asarray(t),
                                   np.asarray(t_true.matrix), atol=3e-3)
        assert float(mse) < 1e-4

    def test_masked_padding_ignored(self):
        mesh = make_mesh(8)
        pts = surface_cloud(1024)
        mask = np.ones(1024, bool)
        mask[900:] = False  # padded garbage region
        pts_bad = pts.copy()
        pts_bad[900:] = 1e3
        icp_fn = make_sharded_icp(mesh, max_iterations=10)
        t, mse, it, conv = icp_fn(
            put_sharded(jnp.asarray(pts_bad), mesh),
            put_sharded(jnp.asarray(mask), mesh),
            put_sharded(jnp.asarray(pts_bad), mesh),
            put_sharded(jnp.asarray(mask), mesh))
        np.testing.assert_allclose(np.asarray(t), np.eye(4), atol=1e-3)


class TestBatchShardedIcp:
    def test_2d_mesh_batch_points(self):
        """2-D (batch × points) mesh: DP over pairs, SP within a pair."""
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from threecrate_tpu.parallel import make_sharded_batch_icp
        devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, ("batch", "points"))
        pts = surface_cloud(1024)
        offsets = np.array([[0.05, -0.02, 0.01], [0.01, 0.03, -0.02]],
                           np.float32)
        src = np.stack([pts, pts])
        tgt = np.stack([pts + offsets[0], pts + offsets[1]])
        masks = np.ones((2, 1024), bool)
        put = lambda x: jax.device_put(
            x, NamedSharding(mesh, P("batch", "points")))
        fn = make_sharded_batch_icp(mesh, max_iterations=25)
        t, mse, it, conv = fn(put(jnp.asarray(src)), put(jnp.asarray(masks)),
                              put(jnp.asarray(tgt)), put(jnp.asarray(masks)))
        t = np.asarray(t)
        for b in range(2):
            np.testing.assert_allclose(t[b][:3, 3], offsets[b], atol=5e-3)


class TestShardedNormals:
    def test_matches_single_device(self):
        from threecrate_tpu.ops.normals import estimate_normals_detailed, \
            NormalEstimationConfig
        from threecrate_tpu.parallel import make_sharded_normals
        mesh = make_mesh(8)
        pts = surface_cloud(2048)
        fn = make_sharded_normals(mesh, k=10, viewpoint=(0.0, 0.0, 10.0))
        nrm = fn(put_sharded(jnp.asarray(pts), mesh),
                 put_sharded(jnp.ones(2048, bool), mesh))
        nrm = np.asarray(nrm)
        # unit length everywhere
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0,
                                   atol=1e-4)
        # agrees with the single-device exact path
        cloud = PointCloud.from_numpy(pts)
        ref = estimate_normals_detailed(cloud, NormalEstimationConfig(
            k_neighbors=10, method="exact",
            viewpoint=(0.0, 0.0, 10.0)))
        dots = np.abs(np.sum(nrm * np.asarray(ref.normals)[:2048], axis=1))
        ang = np.degrees(np.arccos(np.clip(dots, -1, 1)))
        assert np.mean(ang) < 1.0
        assert np.percentile(ang, 99) < 5.0

    def test_masked_rows_zero(self):
        from threecrate_tpu.parallel import make_sharded_normals
        mesh = make_mesh(8)
        pts = surface_cloud(1024)
        mask = np.ones(1024, bool)
        mask[100:200] = False
        fn = make_sharded_normals(mesh, k=8)
        nrm = np.asarray(fn(put_sharded(jnp.asarray(pts), mesh),
                            put_sharded(jnp.asarray(mask), mesh)))
        assert np.all(nrm[100:200] == 0.0)
        assert np.all(np.abs(np.linalg.norm(nrm[mask], axis=1) - 1) < 1e-4)


class TestShardedVoxel:
    def test_matches_single_device(self):
        from threecrate_tpu.ops.filtering import voxel_grid_filter
        from threecrate_tpu.parallel import make_sharded_voxel_filter
        mesh = make_mesh(8)
        pts = surface_cloud(2048)
        fn = make_sharded_voxel_filter(mesh, voxel_size=0.3)
        cent, vmask = fn(put_sharded(jnp.asarray(pts), mesh),
                         put_sharded(jnp.ones(2048, bool), mesh))
        cent = np.asarray(cent)[np.asarray(vmask)]
        ref = voxel_grid_filter(PointCloud.from_numpy(pts), 0.3)
        ref_pts = np.asarray(ref.points)[np.asarray(ref.mask)]
        assert cent.shape[0] == ref_pts.shape[0]
        # same centroid multiset (sort rows lexicographically); the
        # single-device path now uses the chunked-prefix segmented
        # reduce whose summation order differs from the per-shard
        # segment sums — agreement is to f32 rounding, not bit-exact
        a = cent[np.lexsort(cent.T)]
        b = ref_pts[np.lexsort(ref_pts.T)]
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_cross_shard_voxels_merge(self):
        # identical coordinates scattered over every shard must fold to
        # a single voxel
        from threecrate_tpu.parallel import make_sharded_voxel_filter
        mesh = make_mesh(8)
        pts = np.tile(np.array([[0.1, 0.1, 0.1]], np.float32), (1024, 1))
        fn = make_sharded_voxel_filter(mesh, voxel_size=1.0)
        cent, vmask = fn(put_sharded(jnp.asarray(pts), mesh),
                         put_sharded(jnp.ones(1024, bool), mesh))
        assert int(np.asarray(vmask).sum()) == 1
        np.testing.assert_allclose(
            np.asarray(cent)[np.asarray(vmask)][0], [0.1, 0.1, 0.1],
            atol=1e-6)


class TestShardedWindowNormals:
    def test_matches_local_window_path(self):
        """Fused sharded normals (halo ppermute) vs the local
        single-pass fused path on the same presorted cloud."""
        import jax
        import jax.numpy as jnp
        from threecrate_tpu.ops.normals import _estimate
        from threecrate_tpu.parallel import (make_sharded_normals_window,
                                             morton_presort)
        tile = 128
        rng = np.random.default_rng(3)
        xy = rng.uniform(-3, 3, (6000, 2)).astype(np.float32)
        z = 0.3 * np.sin(xy[:, 0]) + 0.2 * np.cos(xy[:, 1] * 1.3)
        pts = np.stack([xy[:, 0], xy[:, 1], z], -1).astype(np.float32)

        mesh = make_mesh(8)
        spts, smask, perm = morton_presort(pts, np.ones(len(pts), bool),
                                           8, tile=tile)
        vp = (0.0, 0.0, 10.0)
        fn = make_sharded_normals_window(mesh, k=10, viewpoint=vp,
                                         tile=tile)
        nrm_sh, valid_sh = fn(put_sharded(jnp.asarray(spts), mesh),
                              put_sharded(jnp.asarray(smask), mesh))
        nrm_sh = np.asarray(nrm_sh)
        valid_sh = np.asarray(valid_sh)

        # local reference: single-pass fused moments path on the
        # presorted array (identical candidate windows away from
        # shard boundaries; halos repair the boundaries)
        nrm_l, _, valid_l = _estimate(
            jnp.asarray(spts), jnp.asarray(smask), 10, False,
            jnp.float32(0.0), jnp.asarray(vp, jnp.float32), True,
            moments=True, window_passes=1)
        nrm_l = np.asarray(nrm_l); valid_l = np.asarray(valid_l)

        both = valid_sh & valid_l & smask
        assert both.sum() > 0.97 * smask.sum()
        dots = np.abs((nrm_sh[both] * nrm_l[both]).sum(1)).clip(0, 1)
        ang = np.degrees(np.arccos(dots))
        # identical away from boundaries; small boundary-window
        # differences are fine
        assert np.percentile(ang, 95) < 5.0, np.percentile(ang, 95)
        assert ang.mean() < 1.0, ang.mean()

    def test_all_valid_on_plane(self):
        import jax.numpy as jnp
        from threecrate_tpu.parallel import (make_sharded_normals_window,
                                             morton_presort)
        rng = np.random.default_rng(5)
        pts = np.stack([rng.uniform(-2, 2, 4000),
                        rng.uniform(-2, 2, 4000),
                        np.zeros(4000)], -1).astype(np.float32)
        mesh = make_mesh(8)
        spts, smask, _ = morton_presort(pts, np.ones(4000, bool), 8,
                                        tile=128)
        fn = make_sharded_normals_window(mesh, k=8, viewpoint=(0, 0, 5),
                                         tile=128)
        nrm, valid = fn(put_sharded(jnp.asarray(spts), mesh),
                        put_sharded(jnp.asarray(smask), mesh))
        nrm = np.asarray(nrm); valid = np.asarray(valid)
        assert valid[np.asarray(smask)].mean() > 0.99
        assert (np.abs(nrm[valid][:, 2]) > 0.99).all()


class TestDistributedMortonSort:
    def test_matches_host_sort(self):
        """Odd-even block sort over the 8-device mesh == host argsort
        by the same keys (ties broken arbitrarily: compare the key
        SEQUENCE and the point-row consistency, not the permutation)."""
        from threecrate_tpu.ops import morton
        from threecrate_tpu.parallel import (make_distributed_morton_sort,
                                             make_mesh, put_sharded)
        rng = np.random.default_rng(11)
        n = 4096
        pts = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        mask = np.ones(n, bool)
        mask[rng.choice(n, 200, replace=False)] = False
        mesh = make_mesh(8)
        fn = make_distributed_morton_sort(mesh)
        spts, smask, gid = fn(put_sharded(jnp.asarray(pts), mesh),
                              put_sharded(jnp.asarray(mask), mesh))
        spts, smask, gid = map(np.asarray, (spts, smask, gid))

        # every sorted row is the original row its gid claims
        np.testing.assert_array_equal(spts, pts[gid])
        np.testing.assert_array_equal(smask, mask[gid])
        # keys are globally non-decreasing and match the host oracle
        keys_ref = np.asarray(morton.morton_keys(
            jnp.asarray(pts), jnp.asarray(mask), 0))
        got_keys = keys_ref[gid]
        assert (np.diff(got_keys) >= 0).all()
        np.testing.assert_array_equal(got_keys, np.sort(keys_ref))
        # invalid rows sink to the end
        assert not smask[np.argmax(~smask):].any() or smask.all()

    def test_single_device_mesh(self):
        from threecrate_tpu.parallel import (make_distributed_morton_sort,
                                             make_mesh, put_sharded)
        pts = surface_cloud(512, seed=12)
        mesh = make_mesh(1)
        fn = make_distributed_morton_sort(mesh)
        spts, smask, gid = fn(put_sharded(jnp.asarray(pts), mesh),
                              put_sharded(jnp.ones(512, bool), mesh))
        np.testing.assert_array_equal(np.asarray(spts), pts[np.asarray(gid)])


class TestShardedNormalsArbitraryOrder:
    def test_shuffled_input_matches_presorted(self):
        """The lifted contract: shuffled (arbitrarily sharded) input
        must give the same per-point normals as the presorted path,
        returned in INPUT order."""
        from threecrate_tpu.parallel import (make_mesh,
                                             make_sharded_normals_window,
                                             morton_presort, put_sharded)
        tile = 128
        rng = np.random.default_rng(13)
        xy = rng.uniform(-3, 3, (4096, 2)).astype(np.float32)
        z = 0.3 * np.sin(xy[:, 0]) + 0.2 * np.cos(xy[:, 1] * 1.3)
        pts = np.stack([xy[:, 0], xy[:, 1], z], -1).astype(np.float32)
        mask = np.ones(len(pts), bool)
        mesh = make_mesh(8)
        vp = (0.0, 0.0, 10.0)

        # reference: presorted contract (results in sorted order)
        spts, smask, perm = morton_presort(pts, mask, 8, tile=tile)
        fn_pre = make_sharded_normals_window(mesh, k=10, viewpoint=vp,
                                             tile=tile, presorted=True)
        nrm_s, val_s = fn_pre(put_sharded(jnp.asarray(spts), mesh),
                              put_sharded(jnp.asarray(smask), mesh))
        nrm_s, val_s = np.asarray(nrm_s), np.asarray(val_s)
        # scatter back to input order on host
        nrm_ref = np.zeros_like(pts)
        val_ref = np.zeros(len(pts), bool)
        ok = perm >= 0
        nrm_ref[perm[ok]] = nrm_s[ok]
        val_ref[perm[ok]] = val_s[ok]

        # shuffled input through the arbitrary-sharding path
        fn = make_sharded_normals_window(mesh, k=10, viewpoint=vp,
                                         tile=tile)
        nrm_a, val_a = fn(put_sharded(jnp.asarray(pts), mesh),
                          put_sharded(jnp.asarray(mask), mesh))
        nrm_a, val_a = np.asarray(nrm_a), np.asarray(val_a)

        both = val_a & val_ref
        assert both.sum() > 0.97 * mask.sum()
        dots = np.abs((nrm_a[both] * nrm_ref[both]).sum(1)).clip(0, 1)
        ang = np.degrees(np.arccos(dots))
        # same kernel on the same sorted layout: only the pass-0-vs-
        # presort lattice (identical) and boundary windows can differ
        assert np.percentile(ang, 99) < 5.0, np.percentile(ang, 99)
        assert ang.mean() < 0.5, ang.mean()


class TestShardedP2PlaneAndGicp:
    def _pair(self, n=4096, seed=15):
        rng = np.random.default_rng(seed)
        xy = rng.uniform(-3, 3, (n, 2)).astype(np.float32)
        z = 0.3 * np.sin(xy[:, 0] * 1.7) + 0.25 * np.cos(xy[:, 1] * 1.2)
        pts = np.stack([xy[:, 0], xy[:, 1], z], -1).astype(np.float32)
        R = Transform.from_axis_angle([1.0, 0.2, 0], 0.02) @ \
            Transform.from_translation([0.04, -0.02, 0.02])
        tgt = pts @ np.asarray(R.matrix)[:3, :3].T \
            + np.asarray(R.matrix)[:3, 3]
        return pts, tgt.astype(np.float32), R

    def test_sharded_p2plane_recovers(self):
        from threecrate_tpu.ops import normals as normals_ops
        from threecrate_tpu.parallel import (make_mesh,
                                             make_sharded_icp_p2plane,
                                             put_sharded)
        pts, tgt, t_true = self._pair()
        mesh = make_mesh(8)
        tn = normals_ops.estimate_normals(
            PointCloud.from_numpy(tgt), k=10).normals
        fn = make_sharded_icp_p2plane(mesh, max_iterations=25)
        t, mse, it, conv = fn(
            put_sharded(jnp.asarray(pts), mesh),
            put_sharded(jnp.ones(len(pts), bool), mesh),
            put_sharded(jnp.asarray(tgt), mesh),
            put_sharded(jnp.ones(len(tgt), bool), mesh),
            put_sharded(jnp.asarray(tn), mesh))
        np.testing.assert_allclose(np.asarray(t),
                                   np.asarray(t_true.matrix), atol=4e-3)

    def test_sharded_gicp_recovers(self):
        from threecrate_tpu.parallel import (make_mesh, make_sharded_gicp,
                                             put_sharded)
        pts, tgt, t_true = self._pair(seed=16)
        mesh = make_mesh(8)
        fn = make_sharded_gicp(mesh, max_iterations=30)
        t, mse, it, conv = fn(
            put_sharded(jnp.asarray(pts), mesh),
            put_sharded(jnp.ones(len(pts), bool), mesh),
            put_sharded(jnp.asarray(tgt), mesh),
            put_sharded(jnp.ones(len(tgt), bool), mesh))
        np.testing.assert_allclose(np.asarray(t),
                                   np.asarray(t_true.matrix), atol=4e-3)

    def test_payload_ring_matches_local(self):
        """ring_match1_local == local knn top-1, payload rows gathered
        through the same argmax."""
        from threecrate_tpu.ops import neighbors
        from threecrate_tpu.parallel import make_mesh, put_sharded
        from threecrate_tpu.parallel.sharded import ring_match1_local
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        import functools
        rng = np.random.default_rng(17)
        q = rng.normal(0, 1, (1024, 3)).astype(np.float32)
        db = rng.normal(0, 1, (2048, 3)).astype(np.float32)
        pay = rng.normal(0, 1, (2048, 5)).astype(np.float32)
        mesh = make_mesh(8)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P("points"), P("points"), P("points"),
                      P("points")),
            out_specs=(P("points"), P("points"), P("points")),
            check_vma=False)
        def run(qs, dbs, ms, ps):
            return ring_match1_local(qs, dbs, ms, ps, "points")

        neg, pts, got_pay = run(
            put_sharded(jnp.asarray(q), mesh),
            put_sharded(jnp.asarray(db), mesh),
            put_sharded(jnp.ones(2048, bool), mesh),
            put_sharded(jnp.asarray(pay), mesh))
        res = neighbors.knn(jnp.asarray(db), jnp.ones(2048, bool),
                            jnp.asarray(q), None, 1)
        np.testing.assert_allclose(np.asarray(pts),
                                   db[np.asarray(res.indices[:, 0])],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_pay),
                                   pay[np.asarray(res.indices[:, 0])],
                                   atol=1e-5)


class TestShardedTsdf:
    """Spatially-partitioned sparse TSDF: parity vs the single-device
    sparse pipeline (each x-slab of the block grid lives on one
    device; fusion and extraction are collective-free)."""

    H, W = 48, 64
    INTR = jnp.asarray([52.0, 52.0, 31.5, 23.5], jnp.float32)
    GRID = (16, 16, 16)
    VSIZE = 4.0 / 128

    def _depth(self, shift=0.0):
        yy, xx = np.mgrid[0:self.H, 0:self.W]
        d = 2.0 + 0.3 * np.sin((xx + shift) / 10.0) * np.cos(yy / 8.0)
        return jnp.asarray(d.astype(np.float32))

    def _poses(self, n):
        out = []
        for i in range(n):
            m = np.eye(4, dtype=np.float32)
            m[0, 3] = 0.03 * i
            out.append(jnp.asarray(m))
        return out

    def _fuse_both(self, n_frames=3):
        from threecrate_tpu.ops import tsdf_sparse as sp
        from threecrate_tpu.parallel import sharded

        mesh = make_mesh(8)
        fac = sharded.make_sharded_tsdf(
            mesh, self.GRID, self.VSIZE, origin=(-2.0, -2.0, 0.5),
            block=8, max_blocks_per_shard=512, update_fraction=1.0)
        st = fac.init()
        ref = sp.create_sparse_volume(
            self.VSIZE, origin=(-2.0, -2.0, 0.5), grid_blocks=self.GRID,
            block=8, max_blocks=4096)
        for i, pose in enumerate(self._poses(n_frames)):
            d = self._depth(shift=2.0 * i)
            st = fac.integrate(st, d, self.INTR, pose)
            ref = sp.sparse_integrate(ref, d, self.INTR, pose,
                                      grid_blocks=self.GRID, block=8,
                                      update_fraction=1.0)
        return fac, st, ref

    def test_integrate_matches_single_device(self):
        from threecrate_tpu.ops import tsdf_sparse as sp

        fac, st, ref = self._fuse_both()
        # both allocate the same key set with identical voxel data:
        # compare via key->(tsdf,weight) dictionaries
        n_dev, mb = 8, st.block_keys.shape[0] // 8
        got = {}
        keys = np.asarray(st.block_keys)
        td = np.asarray(st.tsdf)
        wd = np.asarray(st.weight)
        for i in range(keys.shape[0]):
            if keys[i] != 2**31 - 1:
                got[int(keys[i])] = (td[i], wd[i])
        rk = np.asarray(ref.block_keys)
        rt = np.asarray(ref.tsdf)
        rw = np.asarray(ref.weight)
        want = {int(rk[i]): (rt[i], rw[i])
                for i in range(int(ref.n_blocks))}
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(got[k][0], want[k][0], atol=1e-5)
            np.testing.assert_allclose(got[k][1], want[k][1], atol=1e-5)
        # per-shard counts sum to the global count
        assert int(np.sum(np.asarray(st.n_blocks))) == int(ref.n_blocks)

    def test_extract_matches_single_device(self):
        from threecrate_tpu.ops import tsdf_sparse as sp

        fac, st, ref = self._fuse_both()
        pts, mask = fac.extract_surface(st)
        got = np.asarray(pts)[np.asarray(mask)]
        rs = sp.sparse_extract_surface(ref, self.GRID, block=8)
        want = np.asarray(rs.cloud.points)[np.asarray(rs.cloud.mask)]
        assert got.shape == want.shape
        # same point multiset (sort rows lexicographically)
        gs = got[np.lexsort(got.T)]
        ws = want[np.lexsort(want.T)]
        np.testing.assert_allclose(gs, ws, atol=1e-5)

    def test_marching_cubes_matches_single_device(self):
        from threecrate_tpu.ops import tsdf_sparse as sp

        fac, st, ref = self._fuse_both()
        verts, vmask = fac.marching_cubes(st)
        got = np.asarray(verts)[np.asarray(vmask)]
        soup = sp.sparse_marching_cubes_soup(ref, self.GRID, block=8)
        want = np.asarray(soup.vertices)[
            np.repeat(np.asarray(soup.mask), 3)]
        assert got.shape == want.shape
        gs = got[np.lexsort(got.T)]
        ws = want[np.lexsort(want.T)]
        np.testing.assert_allclose(gs, ws, atol=1e-5)

    def test_raycast_matches_single_device(self):
        """Per-slab marches + pmin/psum combine = the single-device
        sparse raycast: any crossing the global march finds lives in
        some shard's blocks, so the global first hit is the min over
        per-slab first hits; refinement is apron-self-contained."""
        from threecrate_tpu.ops import tsdf_raycast as rc

        fac, st, ref = self._fuse_both()
        pose = jnp.asarray(np.eye(4, dtype=np.float32))
        depth, verts, nrms, mask, conf = fac.raycast(
            st, self.INTR, pose, self.H, self.W, far=6.0,
            max_steps=48, coarse_factor=4)
        want = rc.sparse_raycast(ref, self.INTR, pose, self.H, self.W,
                                 grid_blocks=self.GRID, block=8,
                                 far=6.0, max_steps=48,
                                 coarse_factor=4, materialize=False)
        got_m = np.asarray(mask)
        want_m = np.asarray(want.mask)
        # hit masks agree except possibly a tiny silhouette fraction
        assert (got_m != want_m).mean() < 0.01, (got_m != want_m).mean()
        both = got_m & want_m
        assert both.sum() > 0.5 * got_m.size
        dg = np.asarray(depth)[both]
        dw = np.asarray(want.depth)[both]
        np.testing.assert_allclose(dg, dw, atol=float(self.VSIZE))
        ng = np.asarray(nrms)[both]
        nw = np.asarray(want.normals)[both]
        dots = np.abs((ng * nw).sum(-1)).clip(0, 1)
        assert np.median(dots) > 0.999

    def test_sharded_odometry_recovers_motion(self):
        """ShardedFrameToModelOdometry: fuse+render+track over the
        8-device mesh recovers a small known camera translation."""
        from threecrate_tpu.parallel import ShardedFrameToModelOdometry
        from threecrate_tpu.ops.frame_to_model import FrameToModelConfig

        mesh = make_mesh(8)
        odo = ShardedFrameToModelOdometry(
            mesh, self.INTR, self.H, self.W, voxel_size=self.VSIZE,
            origin=(-2.0, -2.0, 0.5), grid_blocks=self.GRID, block=8,
            max_blocks_per_shard=512,
            config=FrameToModelConfig(model_render_scale=1,
                                      max_steps=48, far=6.0))
        # synthetic wavy wall seen from a camera translating in +x:
        # shifting the pattern by fx·dx/z ≈ dx·fx/2 pixels emulates it
        yy, xx = np.mgrid[0:self.H, 0:self.W]
        dx_per_frame = 0.02
        poses = []
        for i in range(3):
            shift = dx_per_frame * i * float(self.INTR[0]) / 2.0
            d = (2.0 + 0.25 * np.sin((xx + shift) / 9.0)
                 * np.cos(yy / 7.0)).astype(np.float32)
            poses.append(np.asarray(odo.register_frame(jnp.asarray(d))))
        # frame 2 pose ≈ translation −dx per frame in camera x (the
        # pattern moving +x ⇔ camera moving −x), all else identity
        p2 = poses[2]
        assert odo.last_track is not None
        assert bool(odo.last_track.converged)
        np.testing.assert_allclose(p2[:3, :3], np.eye(3), atol=0.02)
        assert abs(abs(p2[0, 3]) - 2 * dx_per_frame) < 0.015, p2[:3, 3]
        assert np.abs(p2[1:3, 3]).max() < 0.01

    def test_grid_not_divisible_raises(self):
        from threecrate_tpu.parallel import sharded

        mesh = make_mesh(8)
        with pytest.raises(ValueError):
            sharded.make_sharded_tsdf(mesh, (12, 16, 16), self.VSIZE)


class TestShardedFeaturePipeline:
    """Sharded FPFH → descriptor matching → global RANSAC (the r4
    pipeline): oracle = single-device staged kernels."""

    def _cloud_with_normals(self, n=1024, seed=0):
        from threecrate_tpu.ops import normals as normals_mod
        pts = surface_cloud(n, seed=seed)
        pc = normals_mod.estimate_normals(
            PointCloud.from_points(jnp.asarray(pts)), k=10)
        return pts, np.asarray(pc.normals)

    def test_sharded_fpfh_matches_staged(self):
        from threecrate_tpu.ops import features
        from threecrate_tpu.parallel import make_sharded_fpfh
        mesh = make_mesh(8)
        n = 1024
        pts, nrm = self._cloud_with_normals(n)
        radius, k = 0.5, 64
        fn = make_sharded_fpfh(mesh, radius, k=k)
        d_s, v_s = fn(put_sharded(jnp.asarray(pts), mesh),
                      put_sharded(jnp.ones(n, bool), mesh),
                      put_sharded(jnp.asarray(nrm), mesh))
        d_ref, v_ref = features._fpfh(
            jnp.asarray(pts), jnp.ones(n, bool), jnp.asarray(nrm),
            jnp.float32(radius), k, 11, False, False)
        d_s, v_s = np.asarray(d_s), np.asarray(v_s)
        d_ref, v_ref = np.asarray(d_ref), np.asarray(v_ref)
        both = v_s & v_ref
        assert both.sum() > 900
        na = d_s[both] / np.maximum(
            np.linalg.norm(d_s[both], axis=1, keepdims=True), 1e-9)
        nb = d_ref[both] / np.maximum(
            np.linalg.norm(d_ref[both], axis=1, keepdims=True), 1e-9)
        cos = np.sum(na * nb, axis=1)
        # same formulation; residual differences are k-th-neighbor
        # tie-order at the cap
        assert np.median(cos) > 0.999
        assert np.mean(cos) > 0.99

    def test_sharded_match_descriptors(self):
        from threecrate_tpu.ops import features
        from threecrate_tpu.parallel import make_sharded_match_descriptors
        mesh = make_mesh(8)
        rng = np.random.default_rng(5)
        na, nb = 512, 768
        da = rng.normal(size=(na, 33)).astype(np.float32)
        db = rng.normal(size=(nb, 33)).astype(np.float32)
        tgt_pts = rng.normal(size=(nb, 3)).astype(np.float32)
        va = np.ones(na, bool)
        vb = np.ones(nb, bool)
        fn = make_sharded_match_descriptors(mesh)
        j, dist, ok, matched = fn(
            put_sharded(jnp.asarray(da), mesh),
            put_sharded(jnp.asarray(va), mesh),
            put_sharded(jnp.asarray(db), mesh),
            put_sharded(jnp.asarray(vb), mesh),
            put_sharded(jnp.asarray(tgt_pts), mesh))
        j_ref, dist_ref, ok_ref = features.match_descriptors(
            jnp.asarray(da), jnp.asarray(va), jnp.asarray(db),
            jnp.asarray(vb))
        np.testing.assert_array_equal(np.asarray(j), np.asarray(j_ref))
        np.testing.assert_allclose(np.asarray(dist),
                                   np.asarray(dist_ref), atol=1e-3)
        np.testing.assert_allclose(np.asarray(matched),
                                   tgt_pts[np.asarray(j_ref)], atol=1e-6)

    def test_sharded_global_registration_recovers(self):
        from threecrate_tpu.parallel import make_sharded_global_registration
        mesh = make_mesh(8)
        n = 2048
        pts = surface_cloud(n, seed=7)
        ang = 0.35
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0],
                      [0, 0, 1]], np.float32)
        tvec = np.array([0.8, -0.5, 0.2], np.float32)
        tgt = (pts @ R.T + tvec).astype(np.float32)
        fn = make_sharded_global_registration(
            mesh, fpfh_radius=0.5, k_fpfh=48, distance_threshold=0.1,
            hypotheses_per_device=512, query_stride=2,
            refine_iterations=20)
        t, count, ratio = fn(
            put_sharded(jnp.asarray(pts), mesh),
            put_sharded(jnp.ones(n, bool), mesh),
            put_sharded(jnp.asarray(tgt), mesh),
            put_sharded(jnp.ones(n, bool), mesh))
        t = np.asarray(t)
        assert np.abs(t[:3, :3] - R).max() < 5e-3
        assert np.abs(t[:3, 3] - tvec).max() < 5e-3
        assert float(ratio) > 0.3


class TestShardedNdt:
    def test_matches_single_device(self):
        """Distributed NDT vs ops.ndt on the same pair: the two-level
        cell-moment merge must reproduce the single-device Gaussians
        (cell-center-relative sums are exact under reordering), so the
        recovered transform must match to float tolerance."""
        from threecrate_tpu.ops import ndt as ndt_mod
        from threecrate_tpu.parallel import (make_mesh, make_sharded_ndt,
                                             put_sharded)
        from threecrate_tpu.core.transform import Transform

        rng = np.random.default_rng(21)
        n = 4096
        xy = rng.uniform(-4, 4, (n, 2)).astype(np.float32)
        z = 0.5 * np.sin(xy[:, 0]) * np.cos(xy[:, 1])
        pts = (np.column_stack([xy, z]) * 2.0).astype(np.float32)
        shift = np.array([0.08, -0.05, 0.02], np.float32)
        tgt = pts + shift

        mesh = make_mesh(8)
        fn = make_sharded_ndt(mesh, resolution=1.0, max_iterations=40,
                              step_size=0.2)
        init = jnp.eye(4, dtype=jnp.float32)
        t, score, it, conv = fn(
            put_sharded(jnp.asarray(pts), mesh),
            put_sharded(jnp.ones(n, bool), mesh),
            put_sharded(jnp.asarray(tgt), mesh),
            put_sharded(jnp.ones(n, bool), mesh), init)
        np.testing.assert_allclose(np.asarray(t)[:3, 3], shift,
                                   atol=0.04)

        # single-device reference on the identical data
        src_pc = PointCloud.from_numpy(pts)
        tgt_pc = PointCloud.from_numpy(tgt)
        ref = ndt_mod.ndt_registration(
            src_pc, tgt_pc,
            ndt_mod.NdtConfig(resolution=1.0, max_iterations=40,
                              step_size=0.2, subsample=1))
        np.testing.assert_allclose(np.asarray(t),
                                   np.asarray(ref.transformation),
                                   atol=2e-3)

    def test_subsample_parity(self):
        """The shard-local coarse stride must not move the answer."""
        from threecrate_tpu.parallel import (make_mesh, make_sharded_ndt,
                                             put_sharded)

        rng = np.random.default_rng(22)
        n = 4096
        xy = rng.uniform(-4, 4, (n, 2)).astype(np.float32)
        z = 0.5 * np.sin(xy[:, 0]) * np.cos(xy[:, 1])
        pts = (np.column_stack([xy, z]) * 2.0).astype(np.float32)
        tgt = pts + np.array([0.08, -0.05, 0.02], np.float32)

        mesh = make_mesh(8)
        init = jnp.eye(4, dtype=jnp.float32)
        outs = []
        for sub in (1, 4):
            fn = make_sharded_ndt(mesh, resolution=1.0,
                                  max_iterations=40, step_size=0.2,
                                  subsample=sub)
            t, _, _, _ = fn(
                put_sharded(jnp.asarray(pts), mesh),
                put_sharded(jnp.ones(n, bool), mesh),
                put_sharded(jnp.asarray(tgt), mesh),
                put_sharded(jnp.ones(n, bool), mesh), init)
            outs.append(np.asarray(t))
        np.testing.assert_allclose(outs[0], outs[1], atol=5e-3)


class TestShardedGround:
    def _street(self, n_total=16384, seed=0):
        rng = np.random.default_rng(seed)
        n_obj = 800
        n_ground = n_total - n_obj
        ang = rng.uniform(0, 2 * np.pi, n_ground)
        r = rng.uniform(2.8, 60, n_ground)
        h = -1.723
        gpts = np.stack([r * np.cos(ang), r * np.sin(ang),
                         h + rng.normal(0, 0.03, n_ground)], -1)
        centers = rng.uniform(-30, 30, (10, 2))
        objs = []
        for cx, cy in centers:
            if np.hypot(cx, cy) < 4:
                continue
            objs.append(np.stack([
                cx + rng.uniform(-1, 1, 100),
                cy + rng.uniform(-1, 1, 100),
                h + rng.uniform(0.3, 2.0, 100)], -1))
        opts = np.concatenate(objs)[:n_obj]
        pts = np.concatenate([gpts, opts]).astype(np.float32)
        truth = np.concatenate([np.ones(n_ground, bool),
                                np.zeros(len(opts), bool)])
        return pts, truth

    def test_matches_single_device(self):
        from threecrate_tpu.ops import ground
        from threecrate_tpu.parallel import (make_mesh,
                                             make_sharded_ground)

        pts, truth = self._street()
        mesh = make_mesh(8)
        fn = make_sharded_ground(mesh)
        mask = jnp.ones(len(pts), bool)
        g, patch_ok, patch_nrm = fn(
            put_sharded(jnp.asarray(pts), mesh),
            put_sharded(mask, mesh))

        ref = ground.patchwork_plus_plus(
            PointCloud(points=jnp.asarray(pts), mask=mask))
        got = np.asarray(g)
        want = np.asarray(ref.ground_mask)
        agree = (got == want).mean()
        assert agree > 0.99, f"mask agreement {agree}"

        # quality against truth (same bars as the single-device test)
        recall = got[truth].mean()
        precision = truth[got].mean() if got.any() else 0.0
        assert recall > 0.85, f"recall {recall}"
        assert precision > 0.9, f"precision {precision}"

        # plane agreement on patches both paths accepted
        both = np.asarray(patch_ok) & np.asarray(ref.patch_valid)
        assert both.sum() > 50
        cos = np.abs(np.sum(np.asarray(patch_nrm)[both]
                            * np.asarray(ref.patch_normals)[both], -1))
        assert np.median(cos) > 0.999, f"median normal cos {np.median(cos)}"


class TestShardedClusters:
    def _blobs(self, n_total=4080, seed=3):
        rng = np.random.default_rng(seed)
        centers = np.array([[0, 0, 0], [5, 0, 0], [0, 5, 0],
                            [5, 5, 0], [2.5, 2.5, 4]], np.float32)
        per = n_total // len(centers)
        pts = np.concatenate([
            c + rng.normal(0, 0.15, (per, 3)) for c in centers]
        ).astype(np.float32)
        rng.shuffle(pts)          # interleave so blobs span shards
        return pts

    def test_matches_single_device(self):
        from threecrate_tpu.ops.segmentation import (
            EuclideanClusterConfig, extract_euclidean_clusters)
        from threecrate_tpu.parallel import (make_mesh,
                                             make_sharded_clusters)

        pts = self._blobs()
        n = len(pts)
        mask = np.ones(n, bool)
        mask[::97] = False        # some invalid rows
        cfg = EuclideanClusterConfig(tolerance=0.35, max_neighbors=24,
                                     min_cluster_size=10)
        mesh = make_mesh(8)
        fn = make_sharded_clusters(mesh, cfg)
        labels, n_clusters, sizes = fn(
            put_sharded(jnp.asarray(pts), mesh),
            put_sharded(jnp.asarray(mask), mesh))

        ref = extract_euclidean_clusters(
            PointCloud(points=jnp.asarray(pts),
                       mask=jnp.asarray(mask)), cfg)
        assert int(n_clusters) == int(ref.n_clusters) == 5
        np.testing.assert_array_equal(np.asarray(labels),
                                      np.asarray(ref.labels))
        np.testing.assert_array_equal(np.asarray(sizes),
                                      np.asarray(ref.sizes))

    def test_size_filter_and_noise(self):
        from threecrate_tpu.ops.segmentation import (
            EuclideanClusterConfig)
        from threecrate_tpu.parallel import (make_mesh,
                                             make_sharded_clusters)
        rng = np.random.default_rng(5)
        big = rng.normal(0, 0.1, (512, 3))
        tiny = np.array([[9.0, 9, 9], [9.02, 9, 9]])
        lone = np.array([[-9.0, -9, -9]])
        pts = np.concatenate([big, tiny, lone,
                              rng.normal(0, 0.1, (509, 3)) + 20]
                             ).astype(np.float32)
        cfg = EuclideanClusterConfig(tolerance=0.3, max_neighbors=32,
                                     min_cluster_size=5)
        mesh = make_mesh(8)
        fn = make_sharded_clusters(mesh, cfg)
        labels, n_clusters, sizes = fn(
            put_sharded(jnp.asarray(pts), mesh),
            put_sharded(jnp.ones(len(pts), bool), mesh))
        labels = np.asarray(labels)
        assert int(n_clusters) == 2
        # tiny 2-point blob and the loner are noise
        assert (labels[512:515] == -1).all()
        sz = np.asarray(sizes)
        assert sz[0] == 512 and sz[1] == 509 and sz[2] == 0


class TestShardedPlaneRansac:
    def test_recovers_dominant_plane(self):
        from threecrate_tpu.parallel import (make_mesh,
                                             make_sharded_plane_ransac)
        rng = np.random.default_rng(7)
        n_plane, n_noise = 3000, 1096
        uv = rng.uniform(-2, 2, (n_plane, 2)).astype(np.float32)
        # plane z = 0.3x - 0.2y + 0.5 with small jitter
        z = 0.3 * uv[:, 0] - 0.2 * uv[:, 1] + 0.5
        plane = np.stack([uv[:, 0], uv[:, 1],
                          z + rng.normal(0, 0.002, n_plane)], -1)
        noise = rng.uniform(-3, 3, (n_noise, 3))
        pts = np.concatenate([plane, noise]).astype(np.float32)
        order = rng.permutation(len(pts))
        pts = pts[order]
        on_plane = order < n_plane
        mask = np.ones(len(pts), bool)

        mesh = make_mesh(8)
        fn = make_sharded_plane_ransac(mesh, distance_threshold=0.01,
                                       max_iterations=512)
        res = fn(put_sharded(jnp.asarray(pts), mesh),
                 put_sharded(jnp.asarray(mask), mesh), seed=1)

        nrm = np.asarray(res.model.normal)
        expect = np.array([-0.3, 0.2, 1.0])
        expect /= np.linalg.norm(expect)
        cos = abs(float(nrm @ expect))
        assert cos > 0.9999, (nrm, cos)
        inl = np.asarray(res.inlier_mask)
        # nearly all plane points in, nearly all noise out
        assert inl[on_plane].mean() > 0.98
        assert inl[~on_plane].mean() < 0.02
        assert int(res.inlier_count) == inl.sum()

    def test_masked_and_degenerate_shards(self):
        from threecrate_tpu.parallel import (make_mesh,
                                             make_sharded_plane_ransac)
        rng = np.random.default_rng(11)
        # shard-contiguous layout: first shard entirely masked out
        n = 2048
        pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        pts[:, 2] = 0.25 + rng.normal(0, 0.001, n).astype(np.float32)
        mask = np.ones(n, bool)
        mask[: n // 8] = False          # device 0 has no valid points
        mesh = make_mesh(8)
        fn = make_sharded_plane_ransac(mesh, distance_threshold=0.01,
                                       max_iterations=256)
        res = fn(put_sharded(jnp.asarray(pts), mesh),
                 put_sharded(jnp.asarray(mask), mesh))
        nrm = np.asarray(res.model.normal)
        assert abs(nrm[2]) > 0.99999
        inl = np.asarray(res.inlier_mask)
        assert not inl[: n // 8].any()          # masked rows excluded
        assert inl[n // 8:].mean() > 0.99


class TestShardedShot:
    def _surface(self, n=2048, seed=9):
        rng = np.random.default_rng(seed)
        xy = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
        z = 0.5 * np.sin(xy[:, 0] * 2.0) + 0.3 * np.cos(xy[:, 1] * 1.7)
        return np.stack([xy[:, 0], xy[:, 1], z], -1).astype(np.float32)

    def test_matches_staged_single_device(self):
        from threecrate_tpu.ops.features import (ShotConfig,
                                                 extract_shot_features)
        from threecrate_tpu.ops.normals import estimate_normals
        from threecrate_tpu.parallel import make_mesh, make_sharded_shot

        pts = self._surface()
        cloud = PointCloud(points=jnp.asarray(pts),
                           mask=jnp.ones(len(pts), bool))
        cloud = estimate_normals(cloud, k=10, viewpoint=(0.0, 0.0, 10.0))
        cfg = ShotConfig(radius=0.35, max_neighbors=48, method="exact")
        ref = extract_shot_features(cloud, cfg)

        mesh = make_mesh(8)
        fn = make_sharded_shot(mesh, cfg)
        desc, valid = fn(put_sharded(cloud.points, mesh),
                         put_sharded(cloud.mask, mesh),
                         put_sharded(cloud.normals, mesh))
        desc, valid = np.asarray(desc), np.asarray(valid)
        rdesc, rvalid = np.asarray(ref.descriptors), np.asarray(ref.valid)
        np.testing.assert_array_equal(valid, rvalid)
        cos = np.sum(desc[valid] * rdesc[valid], -1)
        # identical up to distance ties in the neighbor sets
        assert np.median(cos) > 0.99999, np.median(cos)
        assert (cos > 0.99).mean() > 0.98, (cos > 0.99).mean()

    def test_usc_variant(self):
        from threecrate_tpu.ops.features import (ShotConfig,
                                                 extract_usc_features)
        from threecrate_tpu.ops.normals import estimate_normals
        from threecrate_tpu.parallel import make_mesh, make_sharded_shot

        pts = self._surface(n=1024, seed=4)
        cloud = PointCloud(points=jnp.asarray(pts),
                           mask=jnp.ones(len(pts), bool))
        cloud = estimate_normals(cloud, k=10, viewpoint=(0.0, 0.0, 10.0))
        cfg = ShotConfig(radius=0.4, max_neighbors=32, method="exact")
        ref = extract_usc_features(cloud, cfg)

        mesh = make_mesh(8)
        fn = make_sharded_shot(mesh, cfg, variant="usc")
        desc, valid = fn(put_sharded(cloud.points, mesh),
                         put_sharded(cloud.mask, mesh),
                         put_sharded(cloud.normals, mesh))
        desc, valid = np.asarray(desc), np.asarray(valid)
        rdesc, rvalid = np.asarray(ref.descriptors), np.asarray(ref.valid)
        np.testing.assert_array_equal(valid, rvalid)
        cos = np.sum(desc[valid] * rdesc[valid], -1)
        assert np.median(cos) > 0.99999, np.median(cos)
        assert desc.shape[1] == 128


class TestShardedMls:
    def test_matches_single_device(self):
        from threecrate_tpu.parallel import make_mesh, make_sharded_mls
        from threecrate_tpu.reconstruction.moving_least_squares import (
            MlsConfig, mls_smooth)

        rng = np.random.default_rng(3)
        pts = surface_cloud(n=2048, seed=3)
        pts += rng.normal(0, 0.01, pts.shape).astype(np.float32)
        cloud = PointCloud(points=jnp.asarray(pts),
                           mask=jnp.ones(len(pts), bool))
        cfg = MlsConfig(search_radius=0.35, max_neighbors=24)
        ref = mls_smooth(cloud, cfg)

        mesh = make_mesh(8)
        fn = make_sharded_mls(mesh, cfg)
        proj, nrm, valid = fn(put_sharded(cloud.points, mesh),
                              put_sharded(cloud.mask, mesh))
        proj, valid = np.asarray(proj), np.asarray(valid)
        rproj = np.asarray(ref.points)
        # identical up to distance ties in the neighbor sets
        close = np.abs(proj - rproj).max(axis=1) < 1e-4
        assert close.mean() > 0.98, close.mean()
        assert valid.sum() > 0.95 * len(pts)
        nn = np.linalg.norm(np.asarray(nrm)[valid], axis=1)
        np.testing.assert_allclose(nn, 1.0, atol=1e-3)

    def test_scale_invariance(self):
        # conditioning regression (CLAUDE.md r3c MLS lesson) must hold
        # through the sharded path too
        from threecrate_tpu.parallel import make_mesh, make_sharded_mls
        from threecrate_tpu.reconstruction.moving_least_squares import (
            MlsConfig)

        pts = surface_cloud(n=1024, seed=7)
        mesh = make_mesh(8)
        msk = jnp.ones(len(pts), bool)
        for scale in (1e-3, 1.0, 1e3):
            cfg = MlsConfig(search_radius=0.35 * scale, max_neighbors=24)
            fn = make_sharded_mls(mesh, cfg)
            proj, _, valid = fn(put_sharded(jnp.asarray(pts * scale), mesh),
                                put_sharded(msk, mesh))
            err = np.abs(np.asarray(proj) / scale - pts).max()
            assert err < 0.2, (scale, err)


class TestShardedColorize:
    def test_matches_single_device(self):
        from threecrate_tpu.ops.colorization import (CameraIntrinsics,
                                                     InterpolationMode,
                                                     RgbImageView,
                                                     colorize_from_images)
        from threecrate_tpu.parallel import (make_mesh,
                                             make_sharded_colorize)

        rng = np.random.default_rng(5)
        n = 1024
        pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        pts[:, 2] += 3.0                       # in front of the cameras
        cloud = PointCloud(points=jnp.asarray(pts),
                           mask=jnp.ones(n, bool))

        h, w = 48, 64
        views, imgs, intrs, w2cs = [], [], [], []
        for i in range(3):
            img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
            intr = CameraIntrinsics(fx=40.0, fy=40.0,
                                    cx=w / 2 + 4 * i, cy=h / 2)
            w2c = np.eye(4, dtype=np.float32)
            w2c[0, 3] = 0.3 * i               # sliding camera
            views.append(RgbImageView(jnp.asarray(img), intr,
                                      jnp.asarray(w2c)))
            imgs.append(img)
            intrs.append([intr.fx, intr.fy, intr.cx, intr.cy])
            w2cs.append(w2c)
        ref = colorize_from_images(cloud, views,
                                   mode=InterpolationMode.BILINEAR)

        mesh = make_mesh(8)
        fn = make_sharded_colorize(mesh, h, w, bilinear=True)
        colors, assigned = fn(
            put_sharded(cloud.points, mesh), put_sharded(cloud.mask, mesh),
            jnp.asarray(np.stack(imgs)),
            jnp.asarray(np.asarray(intrs, np.float32)),
            jnp.asarray(np.stack(w2cs)))
        colors, assigned = np.asarray(colors), np.asarray(assigned)
        rcol = np.asarray(ref.colors)
        assert assigned.sum() > 0.5 * n        # scene actually covered
        np.testing.assert_allclose(colors[assigned], rcol[assigned],
                                   atol=1e-6)
        # unassigned points keep the default (zero) color in both paths
        np.testing.assert_allclose(colors[~assigned], 0.0, atol=0)


class TestShardedPoisson:
    def test_mg_solver_matches_single_device(self):
        """Given the SAME right-hand side, the slab-sharded multigrid
        must match multigrid.mg_solve — stencils and smoothers are
        elementwise (no reduction-order freedom) and the only dot
        products run on gathered replicated arrays."""
        from threecrate_tpu.parallel import make_sharded_mg_solver
        from threecrate_tpu.reconstruction import multigrid

        rng = np.random.default_rng(11)
        res = 64
        # smooth-ish random RHS (what a Poisson divergence looks like)
        b = rng.normal(size=(res, res, res)).astype(np.float32)
        bj = jnp.asarray(b)
        for ax in range(3):
            bj = (jnp.roll(bj, 1, ax) + bj + jnp.roll(bj, -1, ax)) / 3.0

        ref = multigrid.mg_solve(bj, jnp.float32(1e-4), cycles=4)
        mesh = make_mesh(8)
        fn = make_sharded_mg_solver(mesh, res, cycles=4)
        got = fn(bj, jnp.float32(1e-4))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-7)

    def test_fields_match_single_device(self):
        """End-to-end field parity on a sphere: χ/iso/support from the
        distributed pipeline vs reconstruction.poisson._solve (only the
        splat psum order differs → f32 noise)."""
        from threecrate_tpu.parallel import make_sharded_poisson_fields
        from threecrate_tpu.reconstruction import poisson as P_

        rng = np.random.default_rng(5)
        n = 4096
        v = rng.normal(size=(n, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = jnp.asarray(v)
        nrm = jnp.asarray(v)
        msk = jnp.ones(n, bool)

        res = 64
        mn, mx = pts.min(0), pts.max(0)
        span = jnp.max(mx - mn) * 1.1
        origin = (mn + mx) * 0.5 - span / 2
        spacing = span / (res - 1)

        chi_ref, iso_ref, sup_ref = P_._solve(
            pts, nrm, msk, origin, spacing, res, 0,
            jnp.float32(1e-4), solver="multigrid", mg_cycles=4)

        mesh = make_mesh(8)
        fn = make_sharded_poisson_fields(mesh, res, cycles=4)
        chi, iso, sup = fn(put_sharded(pts, mesh),
                           put_sharded(nrm, mesh),
                           put_sharded(msk, mesh), origin, spacing)
        scale = float(jnp.max(jnp.abs(chi_ref))) + 1e-12
        np.testing.assert_allclose(np.asarray(chi) / scale,
                                   np.asarray(chi_ref) / scale,
                                   atol=5e-4)
        assert abs(float(iso) - float(iso_ref)) < 5e-4 * scale + 1e-5
        np.testing.assert_allclose(np.asarray(sup), np.asarray(sup_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_reconstruct_sphere_quality(self):
        """make_sharded_poisson end-to-end: a unit sphere comes back
        with radius ~1 and a watertight-ish face count."""
        from threecrate_tpu.parallel import make_sharded_poisson
        from threecrate_tpu.reconstruction.poisson import PoissonConfig

        rng = np.random.default_rng(9)
        n = 8192
        v = rng.normal(size=(n, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        cloud = PointCloud(points=jnp.asarray(v),
                           mask=jnp.ones(n, bool)).with_normals(
                               jnp.asarray(v))
        mesh = make_mesh(8)
        run = make_sharded_poisson(
            mesh, PoissonConfig(depth=6, solver="multigrid",
                                mg_cycles=6))
        tm = run(cloud)
        verts, faces = tm.to_numpy()
        assert len(faces) > 500
        r = np.linalg.norm(verts, axis=1)
        assert abs(np.median(r) - 1.0) < 0.03, np.median(r)
