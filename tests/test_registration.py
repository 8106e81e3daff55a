"""Registration tests: identity / known translation / known rotation /
noise, convergence flags and transform recovery — mirroring the
reference's fixtures (registration.rs:797-1141, gicp/kiss_icp/ndt test
modules)."""

import numpy as np
import pytest

from threecrate_tpu import PointCloud, Transform
from threecrate_tpu.ops import gicp as gicp_mod
from threecrate_tpu.ops import kiss_icp as kiss_mod
from threecrate_tpu.ops import ndt as ndt_mod
from threecrate_tpu.ops import normals, registration

from conftest import make_sphere_points


def box_cloud(n=400, seed=0, scale=2.0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-scale, scale, (n, 3)).astype(np.float32)
    return pts


def surface_cloud(n=600, seed=0):
    """Wavy surface — well-constrained for p2p and p2plane."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    z = 0.4 * np.sin(xy[:, 0] * 2.0) + 0.3 * np.cos(xy[:, 1] * 1.7)
    return np.stack([xy[:, 0], xy[:, 1], z], -1).astype(np.float32)


def apply_np(mat, pts):
    return pts @ np.asarray(mat)[:3, :3].T + np.asarray(mat)[:3, 3]


class TestIcpP2P:
    def test_identity(self):
        pts = box_cloud()
        pc = PointCloud.from_numpy(pts)
        res = registration.icp(pc, pc, max_iterations=10)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.eye(4), atol=1e-4)
        assert float(res.mse) < 1e-6

    def test_known_translation(self):
        pts = surface_cloud()
        t_true = Transform.from_translation([0.05, -0.02, 0.01])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(apply_np(t_true.matrix, pts))
        res = registration.icp_point_to_point(src, tgt, max_iterations=50)
        assert bool(res.converged)
        got = np.asarray(res.transformation)
        np.testing.assert_allclose(got, np.asarray(t_true.matrix), atol=2e-3)
        assert float(res.mse) < 1e-5

    def test_known_rotation(self):
        pts = surface_cloud()
        t_true = Transform.from_axis_angle([0, 0, 1.0], 0.02)
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(apply_np(t_true.matrix, pts))
        res = registration.icp_point_to_point(src, tgt, max_iterations=50)
        got = np.asarray(res.transformation)
        np.testing.assert_allclose(got, np.asarray(t_true.matrix), atol=2e-3)

    def test_with_noise(self):
        rng = np.random.default_rng(3)
        pts = surface_cloud()
        t_true = Transform.from_translation([0.03, 0.01, -0.02])
        noisy = apply_np(t_true.matrix, pts) + \
            rng.normal(0, 0.002, pts.shape).astype(np.float32)
        res = registration.icp_point_to_point(
            PointCloud.from_numpy(pts), PointCloud.from_numpy(noisy),
            max_iterations=50)
        trans = np.asarray(res.transformation)[:3, 3]
        np.testing.assert_allclose(trans, [0.03, 0.01, -0.02], atol=0.01)

    def test_max_correspondence_distance(self):
        pts = surface_cloud()
        # add a far blob to the target only; gating must ignore it
        blob = np.array([[50, 50, 50]] * 5, np.float32)
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(np.concatenate([pts, blob]))
        res = registration.icp_point_to_point(
            src, tgt, max_iterations=20, max_correspondence_distance=0.5)
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.eye(4), atol=1e-3)

    def test_empty_rejected(self):
        from threecrate_tpu.core.errors import InvalidDataError
        import jax.numpy as jnp
        empty = PointCloud(jnp.zeros((0, 3)), jnp.zeros((0,), bool), {})
        pc = PointCloud.from_numpy(box_cloud(10))
        with pytest.raises(InvalidDataError):
            registration.icp(empty, pc)

    def test_init_transform_used(self):
        pts = surface_cloud()
        t_true = Transform.from_translation([1.0, 0.0, 0.0])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(apply_np(t_true.matrix, pts))
        # big offset: without init it may stall, with exact init converges at once
        res = registration.icp_point_to_point(
            src, tgt, max_iterations=5, init=t_true)
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.asarray(t_true.matrix), atol=1e-3)


class TestIcpP2Plane:
    def test_requires_normals(self):
        from threecrate_tpu.core.errors import InvalidDataError
        pts = surface_cloud(100)
        pc = PointCloud.from_numpy(pts)
        with pytest.raises(InvalidDataError):
            registration.icp_point_to_plane(pc, pc)

    def test_recovers_small_transform(self):
        pts = surface_cloud(800)
        t_true = Transform.from_axis_angle([0, 0, 1.0], 0.01) @ \
            Transform.from_translation([0.02, -0.01, 0.015])
        src = PointCloud.from_numpy(pts)
        tgt = normals.estimate_normals(
            PointCloud.from_numpy(apply_np(t_true.matrix, pts)), k=10)
        res = registration.icp_point_to_plane(src, tgt, max_iterations=30)
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.asarray(t_true.matrix), atol=5e-3)


class TestMultiscale:
    def test_larger_offset(self):
        pts = surface_cloud(1500, seed=7)
        t_true = Transform.from_axis_angle([0, 0, 1.0], 0.05) @ \
            Transform.from_translation([0.15, -0.1, 0.05])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(apply_np(t_true.matrix, pts))
        cfg = registration.MultiscaleConfig(voxel_levels=(0.4, 0.2, 0.1))
        res = registration.multiscale_icp_point_to_point(src, tgt, cfg)
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.asarray(t_true.matrix), atol=0.02)


class TestGicp:
    def test_recovers_transform(self):
        pts = surface_cloud(600)
        t_true = Transform.from_translation([0.04, -0.02, 0.01])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(apply_np(t_true.matrix, pts))
        res = gicp_mod.gicp(src, tgt)
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.asarray(t_true.matrix), atol=5e-3)

    def test_degenerate_rejected(self):
        from threecrate_tpu.core.errors import AlgorithmError
        line = np.stack([np.linspace(0, 1, 50),
                         np.zeros(50), np.zeros(50)], -1).astype(np.float32)
        pc = PointCloud.from_numpy(line)
        with pytest.raises(AlgorithmError):
            gicp_mod.gicp(pc, pc)


class TestKissIcp:
    def test_adaptive_threshold_clamps(self):
        cfg = kiss_mod.KissIcpConfig(voxel_size=1.0)
        assert kiss_mod.adaptive_threshold(cfg, None) == 3.0
        big = Transform.from_translation([10.0, 0, 0])
        assert kiss_mod.adaptive_threshold(cfg, big) == 10.0

    def test_registers_lidar_like_scan(self):
        rng = np.random.default_rng(11)
        # ring-structured scan with ground + walls
        ang = rng.uniform(0, 2 * np.pi, 3000)
        r = rng.uniform(2, 40, 3000)
        z = rng.uniform(-1.5, 2.0, 3000)
        pts = np.stack([r * np.cos(ang), r * np.sin(ang), z], -1
                       ).astype(np.float32)
        t_true = Transform.from_axis_angle([0, 0, 1.0], 0.01) @ \
            Transform.from_translation([0.5, 0.2, 0.0])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(apply_np(t_true.matrix, pts))
        cfg = kiss_mod.KissIcpConfig(voxel_size=0.8, max_range=50.0)
        res = kiss_mod.kiss_icp(src, tgt, cfg)
        np.testing.assert_allclose(np.asarray(res.transformation)[:3, 3],
                                   np.asarray(t_true.matrix)[:3, 3], atol=0.1)

    def test_odometry_pipeline(self):
        rng = np.random.default_rng(5)
        pts = rng.uniform(-20, 20, (2000, 3)).astype(np.float32)
        pts[:, 2] = np.abs(pts[:, 2]) * 0.1
        odo = kiss_mod.KissIcpOdometry(kiss_mod.KissIcpConfig(voxel_size=1.0))
        p0 = odo.register_frame(PointCloud.from_numpy(pts))
        np.testing.assert_allclose(np.asarray(p0.matrix), np.eye(4))
        shift = np.array([0.3, 0.0, 0.0], np.float32)
        # moving sensor: world points appear shifted by -shift in frame 2
        p1 = odo.register_frame(PointCloud.from_numpy(pts - shift))
        est = np.asarray(p1.matrix)[:3, 3]
        np.testing.assert_allclose(est, shift, atol=0.15)


class TestNdt:
    def test_gaussians_built(self):
        pts = box_cloud(2000, scale=4.0)
        pc = PointCloud.from_numpy(pts)
        import jax.numpy as jnp
        g = ndt_mod.build_gaussians(pc.points, pc.mask, jnp.float32(2.0), 5)
        nv = int(np.asarray(g.grid.n_cells))
        assert nv > 4
        valid = np.asarray(g.valid)
        assert valid.sum() > 0
        mus = np.asarray(g.means)[valid]
        assert np.isfinite(mus).all()

    def test_recovers_small_transform(self):
        pts = surface_cloud(2000, seed=2) * 2.0
        t_true = Transform.from_translation([0.08, -0.05, 0.02])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(apply_np(t_true.matrix, pts))
        cfg = ndt_mod.NdtConfig(resolution=1.0, max_iterations=40,
                                step_size=0.2)
        res = ndt_mod.ndt_registration(src, tgt, cfg)
        np.testing.assert_allclose(np.asarray(res.transformation)[:3, 3],
                                   [0.08, -0.05, 0.02], atol=0.04)
        assert float(res.score) > 0


class TestNdtSubsample:
    def test_coarse_stride_recovery_matches_full(self):
        """Coarse-phase source stride (r4): all but the last 2 Newton
        iterations score every S-th source point; recovery must match
        the full-matching run (the Newton direction is invariant to
        the uniform 1/S scaling of H and g)."""
        pts = surface_cloud(4000, seed=5) * 2.0
        t_true = Transform.from_translation([0.08, -0.05, 0.02])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(apply_np(t_true.matrix, pts))
        results = []
        for sub in (1, 4):
            cfg = ndt_mod.NdtConfig(resolution=1.0, max_iterations=40,
                                    step_size=0.2, subsample=sub)
            res = ndt_mod.ndt_registration(src, tgt, cfg)
            np.testing.assert_allclose(
                np.asarray(res.transformation)[:3, 3],
                [0.08, -0.05, 0.02], atol=0.04)
            results.append(np.asarray(res.transformation))
        # strided coarse phase must not move the answer materially
        np.testing.assert_allclose(results[0], results[1], atol=5e-3)


class TestNdtScaleInvariance:
    def test_recovers_at_mm_scale(self):
        """NDT on an mm-scale scene (covariance entries ~1e-8 — the r3
        eigensolver-scale-bug class) must recover the same transform
        as the unit-scale problem."""
        s = 1e-3
        pts = surface_cloud(2000, seed=2) * 2.0 * s
        shift = np.asarray([0.08, -0.05, 0.02], np.float32) * s
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(pts + shift)
        cfg = ndt_mod.NdtConfig(resolution=1.0 * s, max_iterations=40,
                                step_size=0.2 * s)
        res = ndt_mod.ndt_registration(src, tgt, cfg)
        np.testing.assert_allclose(
            np.asarray(res.transformation)[:3, 3], shift,
            atol=0.04 * s)


class TestVoxelHash:
    def test_lookup_roundtrip(self, rng):
        from threecrate_tpu.ops import voxel_hash
        import jax.numpy as jnp
        pts = rng.uniform(0, 4, (200, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        grid = voxel_hash.build_voxel_grid(pc.points, pc.mask,
                                           jnp.float32(1.0))
        keys = grid.key_of(pc.points)
        cell, found = grid.lookup(keys)
        fm = np.asarray(found) & np.asarray(pc.mask)
        assert fm[:200].all()
        # every point's own key must be found at a matching unique row
        uk = np.asarray(grid.unique_keys)
        np.testing.assert_array_equal(uk[np.asarray(cell)[fm]],
                                      np.asarray(keys)[fm])

    def test_gather_neighbors_covers_radius(self, rng):
        from threecrate_tpu.ops import voxel_hash
        import jax.numpy as jnp
        pts = rng.uniform(0, 3, (150, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        cell = 0.5
        grid = voxel_hash.build_voxel_grid(pc.points, pc.mask,
                                           jnp.float32(cell))
        idx, valid = grid.gather_neighbors(pc.points, cap_per_cell=32)
        idx, valid = np.asarray(idx), np.asarray(valid)
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        for q in range(0, 150, 17):
            within = set(np.nonzero(d2[q] <= cell ** 2)[0])
            got = set(idx[q][valid[q]])
            assert within <= got, f"query {q} missing {within - got}"


class TestBatchIcp:
    def test_batch_matches_single(self):
        import jax.numpy as jnp
        pts = surface_cloud(400)
        offsets = np.array([[0.05, -0.02, 0.01], [0.02, 0.03, -0.01]],
                           np.float32)
        srcs = np.stack([pts, pts])
        tgts = np.stack([pts + offsets[0], pts + offsets[1]])
        masks = np.ones((2, 400), bool)
        res = registration.batch_icp(srcs, masks, tgts, masks,
                                     max_iterations=30)
        assert res.transformation.shape == (2, 4, 4)
        for b in range(2):
            np.testing.assert_allclose(
                np.asarray(res.transformation[b])[:3, 3], offsets[b],
                atol=5e-3)
            assert bool(res.converged[b])


class TestWindowCorrespondence:
    def test_window_icp_matches_exact(self):
        pts = surface_cloud(2000, seed=9)
        t_true = Transform.from_translation([0.04, -0.02, 0.015])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(apply_np(t_true.matrix, pts))
        res_e = registration.icp_point_to_point(
            src, tgt, max_iterations=40, correspondence="exact")
        res_w = registration.icp_point_to_point(
            src, tgt, max_iterations=40, correspondence="window")
        np.testing.assert_allclose(np.asarray(res_w.transformation),
                                   np.asarray(t_true.matrix), atol=3e-3)
        np.testing.assert_allclose(np.asarray(res_w.transformation),
                                   np.asarray(t_true.matrix), atol=3e-3)
        np.testing.assert_allclose(np.asarray(res_w.transformation),
                                   np.asarray(res_e.transformation),
                                   atol=3e-3)

    def test_window_stays_converged_when_overiterated(self):
        """Regression: with conv_thresh=0 the loop must grind at the
        converged pose instead of entering the trimming-gate limit
        cycle (at exact convergence d2 is f32 noise; an unfloored
        16x-median gate shrinks the kept set until the Kabsch fit
        degenerates and kicks the pose away — seen on hardware at 1M
        around iteration 15)."""
        pts = surface_cloud(2000, seed=3)
        t_true = Transform.from_translation([0.04, -0.02, 0.015])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(apply_np(t_true.matrix, pts))
        # start AT the solution: every iteration sits in the noise
        # regime where the unfloored gate collapses
        res = registration.icp_point_to_point(
            src, tgt, max_iterations=80, convergence_threshold=0.0,
            correspondence="window", init=t_true)
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.asarray(t_true.matrix), atol=1e-3)

    def test_window_p2plane_recovers(self):
        """Static-sort p2plane: target normals ride the kernel's
        one-hot match (the tgt_extra rows)."""
        pts = surface_cloud(2000, seed=11)
        t_true = Transform.from_axis_angle([0, 0, 1.0], 0.01) @ \
            Transform.from_translation([0.03, -0.02, 0.01])
        src = PointCloud.from_numpy(pts)
        tgt = normals.estimate_normals(
            PointCloud.from_numpy(apply_np(t_true.matrix, pts)), k=10)
        res = registration.icp_point_to_plane(
            src, tgt, max_iterations=30, correspondence="window")
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.asarray(t_true.matrix), atol=5e-3)


class TestSubsampledIcp:
    """Coarse-phase source tile subsampling (KISS-ICP's source
    subsampling, kiss_icp.rs:72-96, on the static-sort search): all but
    the last ``full_iters`` iterations match every S-th Morton source
    tile, then polish at full resolution. Must recover the same pose
    as the full path."""

    def test_p2p_subsample_recovers(self):
        pts = surface_cloud(4000, seed=17)
        t_true = Transform.from_axis_angle([1.0, 0, 0], 0.02) @ \
            Transform.from_translation([0.04, -0.02, 0.015])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(apply_np(t_true.matrix, pts))
        res_full = registration.icp_point_to_point(
            src, tgt, max_iterations=40, correspondence="window",
            subsample=1)
        res_sub = registration.icp_point_to_point(
            src, tgt, max_iterations=40, correspondence="window",
            subsample=4)
        np.testing.assert_allclose(np.asarray(res_sub.transformation),
                                   np.asarray(t_true.matrix), atol=3e-3)
        np.testing.assert_allclose(np.asarray(res_sub.transformation),
                                   np.asarray(res_full.transformation),
                                   atol=3e-3)

    def test_p2p_subsample_overiterated_stays(self):
        """conv_thresh=0 grinds both phases at the converged pose; the
        full-res polish must not undo the coarse phase."""
        pts = surface_cloud(3000, seed=19)
        t_true = Transform.from_translation([0.03, -0.02, 0.01])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(apply_np(t_true.matrix, pts))
        res = registration.icp_point_to_point(
            src, tgt, max_iterations=60, convergence_threshold=0.0,
            correspondence="window", subsample=4, init=t_true)
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.asarray(t_true.matrix), atol=1e-3)

    def test_p2plane_subsample_recovers(self):
        pts = surface_cloud(4000, seed=23)
        t_true = Transform.from_axis_angle([0, 0, 1.0], 0.01) @ \
            Transform.from_translation([0.03, -0.02, 0.01])
        src = PointCloud.from_numpy(pts)
        tgt = normals.estimate_normals(
            PointCloud.from_numpy(apply_np(t_true.matrix, pts)), k=10)
        res = registration.icp_point_to_plane(
            src, tgt, max_iterations=30, correspondence="window",
            subsample=4)
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.asarray(t_true.matrix), atol=5e-3)

    def test_subsample_stride_exceeds_tiles(self):
        """A tiny cloud (fewer tiles than the stride) must clamp, not
        crash."""
        pts = surface_cloud(300, seed=29)
        t_true = Transform.from_translation([0.02, 0.01, -0.01])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(apply_np(t_true.matrix, pts))
        res = registration.icp_point_to_point(
            src, tgt, max_iterations=30, correspondence="window",
            subsample=16)
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.asarray(t_true.matrix), atol=5e-3)


class TestGicpWindow:
    def test_window_method_matches(self):
        pts = surface_cloud(1200, seed=3)
        t_true = Transform.from_translation([0.03, -0.015, 0.01])
        src = PointCloud.from_numpy(pts)
        tgt = PointCloud.from_numpy(apply_np(t_true.matrix, pts))
        res = gicp_mod.gicp(src, tgt, gicp_mod.GicpConfig(method="window"))
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.asarray(t_true.matrix), atol=6e-3)


class TestGicpNormalEquations:
    def test_symbolic_matches_einsum(self):
        """The expanded Gauss-Newton blocks (gicp._normal_equations)
        must equal the (N,3,6) einsum formulation they replaced."""
        from threecrate_tpu.core.transform import skew
        from threecrate_tpu.ops.gicp import _normal_equations
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        n = 500
        moved = jnp.asarray(rng.normal(0, 5, (n, 3)).astype(np.float32))
        r = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32))
        wm = rng.normal(0, 1, (n, 3, 3)).astype(np.float32)
        w_mat = jnp.asarray(wm + wm.transpose(0, 2, 1))
        j = jnp.concatenate([-skew(moved), jnp.broadcast_to(
            jnp.eye(3), (n, 3, 3))], axis=2)
        wj = jnp.einsum("nab,nbk->nak", w_mat, j)
        h_ref = jnp.einsum("nak,nal->kl", j, wj)
        g_ref = jnp.einsum("nak,na->k", wj, r)
        h, g = _normal_equations(moved, r, w_mat)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                                   rtol=3e-5, atol=3e-5 * float(
                                       jnp.abs(h_ref).max()))
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=3e-5, atol=3e-5 * float(
                                       jnp.abs(g_ref).max()))


class TestWindowRobustness:
    """w_tiles robustness suite (VERDICT r2 item 1a): the static-sort
    window must recover transforms under partial overlap, gross
    outliers, anisotropic density and structured geometry before a
    narrower window can be the default. Parametrized over w_tiles so
    the w=3 default and the w=4 fallback are both pinned; w=2 runs are
    evidence for/against further narrowing (not a shipping contract).
    """

    @staticmethod
    def _recover(src_pts, tgt_pts, t_true, w_tiles, mcd=None, iters=40,
                 subsample=1):
        src = PointCloud.from_numpy(src_pts)
        tgt = PointCloud.from_numpy(tgt_pts)
        res = registration.icp_point_to_point(
            src, tgt, max_iterations=iters,
            max_correspondence_distance=mcd,
            correspondence="window", w_tiles=w_tiles,
            subsample=subsample)
        return np.asarray(res.transformation), res

    @pytest.mark.parametrize("w_tiles,subsample",
                             [(3, 1), (4, 1), (3, 4)])
    def test_partial_overlap_source_subset(self, w_tiles, subsample):
        """Source covers only the x<0.5 half of the target scene."""
        pts = surface_cloud(6000, seed=21)
        t_true = Transform.from_axis_angle([1.0, 0, 0], 0.015) @ \
            Transform.from_translation([0.04, -0.03, 0.02])
        tgt_pts = apply_np(t_true.matrix, pts)
        src_pts = pts[pts[:, 0] < 0.5]
        got, res = self._recover(src_pts, tgt_pts, t_true, w_tiles,
                                 subsample=subsample)
        np.testing.assert_allclose(got, np.asarray(t_true.matrix),
                                   atol=4e-3)

    @pytest.mark.parametrize("w_tiles,subsample",
                             [(3, 1), (4, 1), (3, 4)])
    def test_partial_overlap_target_subset(self, w_tiles, subsample):
        """Target misses part of the scene: unmatched source points
        must be rejected by the distance gate, not drag the fit."""
        pts = surface_cloud(6000, seed=22)
        t_true = Transform.from_translation([0.05, 0.02, -0.015])
        tgt_pts = apply_np(t_true.matrix, pts[pts[:, 1] > -1.0])
        got, res = self._recover(pts, tgt_pts, t_true, w_tiles,
                                 mcd=0.25, subsample=subsample)
        np.testing.assert_allclose(got, np.asarray(t_true.matrix),
                                   atol=4e-3)

    @pytest.mark.parametrize("w_tiles,subsample",
                             [(3, 1), (4, 1), (3, 4)])
    def test_gross_outliers(self, w_tiles, subsample):
        """8% uniform gross outliers in the source."""
        rng = np.random.default_rng(23)
        pts = surface_cloud(5000, seed=23)
        t_true = Transform.from_axis_angle([0, 1.0, 0], 0.02) @ \
            Transform.from_translation([0.03, 0.01, 0.02])
        tgt_pts = apply_np(t_true.matrix, pts)
        n_out = len(pts) * 8 // 100
        junk = rng.uniform(-3, 3, (n_out, 3)).astype(np.float32)
        src_pts = np.concatenate([pts, junk])
        got, res = self._recover(src_pts, tgt_pts, t_true, w_tiles,
                                 mcd=0.3, subsample=subsample)
        np.testing.assert_allclose(got, np.asarray(t_true.matrix),
                                   atol=4e-3)

    @pytest.mark.parametrize("w_tiles,subsample",
                             [(3, 1), (4, 1), (3, 4)])
    def test_anisotropic_density(self, w_tiles, subsample):
        """A dense cluster next to a sparse field: Morton tiles in the
        dense region span tiny volumes, stressing window containment."""
        rng = np.random.default_rng(24)
        sparse = rng.uniform(-2, 2, (2000, 3)).astype(np.float32)
        sparse[:, 2] *= 0.1
        dense = (rng.normal(0, 0.08, (4000, 3)) +
                 [1.0, 0.8, 0.3]).astype(np.float32)
        pts = np.concatenate([sparse, dense])
        t_true = Transform.from_axis_angle([1.0, 0, 0], 0.02) @ \
            Transform.from_translation([0.02, -0.03, 0.01])
        tgt_pts = apply_np(t_true.matrix, pts)
        got, res = self._recover(pts, tgt_pts, t_true, w_tiles,
                                 subsample=subsample)
        np.testing.assert_allclose(got, np.asarray(t_true.matrix),
                                   atol=4e-3)

    @pytest.mark.parametrize("w_tiles,subsample",
                             [(3, 1), (4, 1), (3, 4)])
    def test_structured_corner_scene(self, w_tiles, subsample):
        """Two walls + floor (corner room): flat patches whose Morton
        order jumps between planes — the discontinuity stress case."""
        rng = np.random.default_rng(25)
        m = 2000
        floor = np.stack([rng.uniform(0, 2, m), rng.uniform(0, 2, m),
                          np.zeros(m)], -1)
        wall1 = np.stack([rng.uniform(0, 2, m), np.zeros(m),
                          rng.uniform(0, 2, m)], -1)
        wall2 = np.stack([np.zeros(m), rng.uniform(0, 2, m),
                          rng.uniform(0, 2, m)], -1)
        pts = (np.concatenate([floor, wall1, wall2])
               + rng.normal(0, 0.004, (3 * m, 3))).astype(np.float32)
        t_true = Transform.from_axis_angle([0.3, 0.2, 1.0], 0.02) @ \
            Transform.from_translation([0.03, 0.02, -0.02])
        tgt_pts = apply_np(t_true.matrix, pts)
        got, res = self._recover(pts, tgt_pts, t_true, w_tiles,
                                 subsample=subsample)
        np.testing.assert_allclose(got, np.asarray(t_true.matrix),
                                   atol=4e-3)

    def test_density_mismatch_auto_window(self):
        """Source at 1/4 the target's sampling density: a 128-point
        source tile spans ~4 target tiles, so w=3 leaves a 4.4e-3
        residual — the auto default must widen with the capacity
        ratio (auto_w_tiles(2000, 8000) = 6) and recover exactly."""
        pts = surface_cloud(8000, seed=26)
        t_true = Transform.from_translation([0.04, -0.02, 0.03])
        tgt_pts = apply_np(t_true.matrix, pts)
        assert registration.auto_w_tiles(2000, 8000) == 6
        got, res = self._recover(pts[::4], tgt_pts, t_true, None)
        np.testing.assert_allclose(got, np.asarray(t_true.matrix),
                                   atol=4e-3)


class TestGicpAdversarialCovariances:
    """VERDICT r2 item 6: the window path's union-moment covariances
    select ~k by radius bound (can exceed or undershoot k) vs the
    exact path's exact-k. Quality-neutral on scans; these fixtures
    stress the divergence cases — thin slabs (extreme anisotropy),
    mixed density (radius bound selects very different counts per
    region), and near-degenerate clusters — and require the window
    path's registration to match the exact path's recovery."""

    @staticmethod
    def _both(pts_src, pts_tgt, t_true, atol, max_corr=1.0, w_tiles=None):
        src = PointCloud.from_numpy(pts_src)
        tgt = PointCloud.from_numpy(pts_tgt)
        errs = {}
        for method in ("exact", "window"):
            res = gicp_mod.gicp(
                src, tgt, gicp_mod.GicpConfig(
                    method=method, max_correspondence_distance=max_corr,
                    w_tiles=w_tiles))
            errs[method] = np.abs(np.asarray(res.transformation)
                                  - np.asarray(t_true.matrix)).max()
        assert errs["exact"] < atol, errs
        assert errs["window"] < atol, errs
        return errs

    @staticmethod
    def _cov_isolation(pts_src, pts_tgt, t_true, atol):
        """The actual VERDICT question: union-moment ~k-by-radius
        covariances vs exact-k, with the correspondence held EXACT."""
        import jax.numpy as jnp
        src = PointCloud.from_numpy(pts_src)
        tgt = PointCloud.from_numpy(pts_tgt)
        eps = jnp.float32(1e-4)
        init = jnp.eye(4, dtype=jnp.float32)
        for cov_win in (False, True):
            sc, sok = gicp_mod.point_covariances(
                src.points, src.mask, 20, eps, cov_win)
            tc_, tok = gicp_mod.point_covariances(
                tgt.points, tgt.mask, 20, eps, cov_win)
            T, mse, it, conv, nc = gicp_mod._gicp_loop(
                src.points, sok, sc, tgt.points, tok, tc_, init, 50,
                jnp.float32(1e-6), jnp.float32(1.0), False, 3)
            err = np.abs(np.asarray(T) - np.asarray(t_true.matrix)).max()
            assert err < atol, (cov_win, err)

    def test_thin_slab(self):
        """5 mm-thick slab: covariance normals are extreme (1:400
        aspect); GICP's plane-to-plane metric must still converge."""
        rng = np.random.default_rng(31)
        n = 4000
        pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                        rng.normal(0, 0.005, n)], -1).astype(np.float32)
        bump = 0.2 * np.sin(pts[:, 0] * 2.0) * np.cos(pts[:, 1] * 1.5)
        pts[:, 2] += bump.astype(np.float32)
        t_true = Transform.from_axis_angle([1.0, 0.3, 0], 0.02) @ \
            Transform.from_translation([0.03, -0.02, 0.01])
        tgt = pts @ np.asarray(t_true.matrix)[:3, :3].T \
            + np.asarray(t_true.matrix)[:3, 3]
        self._both(pts, tgt.astype(np.float32), t_true, atol=5e-3)

    def test_mixed_density(self):
        """100x density contrast: the union-moment radius bound selects
        ~k in the dense blob but may find fewer in the sparse field."""
        rng = np.random.default_rng(32)
        sparse = rng.uniform(-3, 3, (1500, 3)).astype(np.float32)
        sparse[:, 2] = 0.3 * np.sin(sparse[:, 0]) \
            + 0.2 * np.cos(sparse[:, 1])
        dense = (rng.normal(0, 0.05, (3500, 3))
                 + [1.0, -0.8, 0.5]).astype(np.float32)
        pts = np.concatenate([sparse, dense]).astype(np.float32)
        t_true = Transform.from_axis_angle([0, 1.0, 0.2], 0.02) @ \
            Transform.from_translation([0.02, 0.03, -0.02])
        tgt = pts @ np.asarray(t_true.matrix)[:3, :3].T \
            + np.asarray(t_true.matrix)[:3, 3]
        # correspondence needs w=6 at 100x LOCAL density contrast (a
        # sparse tile's neighbors span many target tiles across the
        # dense blob; w=3/4 diverge — the GicpConfig.w_tiles knob)
        self._both(pts, tgt.astype(np.float32), t_true, atol=5e-3,
                   w_tiles=6)
        # the union-moment covariances themselves are quality-neutral
        # here: exact-correspondence recovery with either path
        self._cov_isolation(pts, tgt.astype(np.float32), t_true,
                            atol=1e-4)

    def test_degenerate_clusters(self):
        """Noisy line segments (near rank-1 neighborhoods): the ε·I
        regulariser must keep the per-point metrics solvable in both
        paths."""
        rng = np.random.default_rng(33)
        segs = []
        for i in range(14):
            t = rng.uniform(0, 1, 300)[:, None]
            a = rng.uniform(-2, 2, 3)
            b = rng.uniform(-2, 2, 3)
            segs.append(a + t * (b - a) + rng.normal(0, 0.004, (300, 3)))
        pts = np.concatenate(segs).astype(np.float32)
        t_true = Transform.from_axis_angle([0.2, 0.3, 1.0], 0.02) @ \
            Transform.from_translation([0.03, -0.01, 0.02])
        tgt = pts @ np.asarray(t_true.matrix)[:3, :3].T \
            + np.asarray(t_true.matrix)[:3, 3]
        self._both(pts, tgt.astype(np.float32), t_true, atol=6e-3)


class TestWindowRobustnessP2Plane:
    def test_p2plane_partial_overlap_w3(self):
        """Point-to-plane at the w=3 default under partial overlap
        (the p2p robustness suite's contract extended to the plane
        metric, whose payload rows ride the same kernel)."""
        pts = surface_cloud(6000, seed=27)
        t_true = Transform.from_axis_angle([1.0, 0, 0], 0.015) @ \
            Transform.from_translation([0.03, -0.02, 0.015])
        tgt_pts = pts @ np.asarray(t_true.matrix)[:3, :3].T \
            + np.asarray(t_true.matrix)[:3, 3]
        src = PointCloud.from_numpy(pts[pts[:, 0] < 0.5])
        tgt = normals.estimate_normals(
            PointCloud.from_numpy(tgt_pts.astype(np.float32)), k=10)
        res = registration.icp_point_to_plane(
            src, tgt, max_iterations=30, correspondence="window")
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.asarray(t_true.matrix), atol=4e-3)
