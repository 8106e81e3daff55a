"""Reconstruction tests: sphere/cube fixtures with analytic ground truth
(reference fixture style: marching_cubes.rs:867,914, integration_tests)."""

import numpy as np
import pytest

from threecrate_tpu import PointCloud
from threecrate_tpu import reconstruction as recon

from conftest import make_sphere_points


def sphere_cloud_with_normals(n=2000, r=1.0):
    pts = make_sphere_points(n, r)
    nrm = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    return PointCloud.from_numpy(pts, normals=nrm)


def signed_volume(mesh):
    v, f = mesh.to_numpy()
    tri = v[f].astype(np.float64)
    return float(np.einsum("ij,ij->i", tri[:, 0],
                           np.cross(tri[:, 1], tri[:, 2])).sum() / 6.0)


class TestMarchingCubes:
    def test_sphere_geometry(self):
        grid = recon.create_sphere_volume(32, radius=1.0)
        mesh = recon.marching_cubes(grid, 0.0)
        v, f = mesh.to_numpy()
        assert len(f) > 1000
        r = np.linalg.norm(v, axis=1)
        np.testing.assert_allclose(r, 1.0, atol=0.01)
        assert abs(abs(signed_volume(mesh)) - 4 / 3 * np.pi) < 0.1

    def test_cube_volume(self):
        grid = recon.create_cube_volume(32, half=0.5)
        mesh = recon.marching_cubes(grid, 0.0)
        assert abs(abs(signed_volume(mesh)) - 1.0) < 0.02

    def test_watertight(self):
        grid = recon.create_sphere_volume(24, radius=1.0)
        mesh = recon.marching_cubes(grid, 0.0)
        v, f = mesh.to_numpy()
        edges = np.sort(np.concatenate(
            [f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).mean() > 0.99

    def test_from_point_cloud_shell(self):
        pc = PointCloud.from_numpy(make_sphere_points(3000))
        mesh = recon.reconstruct_marching_cubes(pc, resolution=48)
        v, f = mesh.to_numpy()
        assert len(f) > 500
        r = np.linalg.norm(v, axis=1)
        assert 0.8 < np.median(r) < 1.2


class TestPoisson:
    def test_sphere(self):
        pc = sphere_cloud_with_normals(3000)
        mesh = recon.poisson_reconstruct(pc)
        v, f = mesh.to_numpy()
        assert len(f) > 1000
        r = np.linalg.norm(v, axis=1)
        np.testing.assert_allclose(np.median(r), 1.0, atol=0.05)
        assert r.std() < 0.05

    def test_requires_normals(self):
        from threecrate_tpu.core.errors import InvalidDataError
        pc = PointCloud.from_numpy(make_sphere_points(100))
        with pytest.raises(InvalidDataError):
            recon.poisson_reconstruct(pc)

    def test_too_few_points(self):
        from threecrate_tpu.core.errors import InvalidDataError
        pts = make_sphere_points(5)
        pc = PointCloud.from_numpy(pts, normals=pts)
        with pytest.raises(InvalidDataError):
            recon.poisson_reconstruct(pc)

    def test_multigrid_matches_cg_depth6(self):
        """solver='multigrid' must reproduce the CG solution's surface
        at depth 6 (same system, mesh-independent solver)."""
        from threecrate_tpu.reconstruction.poisson import PoissonConfig
        pc = sphere_cloud_with_normals(3000)
        m_cg = recon.poisson_reconstruct(pc, PoissonConfig(solver="cg"))
        m_mg = recon.poisson_reconstruct(
            pc, PoissonConfig(solver="multigrid"))
        v1, _ = m_cg.to_numpy()
        v2, _ = m_mg.to_numpy()
        r1 = np.linalg.norm(v1, axis=1)
        r2 = np.linalg.norm(v2, axis=1)
        np.testing.assert_allclose(np.median(r2), np.median(r1),
                                   atol=2e-3)
        assert abs(len(v1) - len(v2)) < 0.02 * len(v1)

    def test_density_trim_removes_far_field_components(self):
        """χ is unconstrained away from the data; its iso level can
        cross anywhere in the far field (r3c verify-drive finding: 20%
        spurious verts on a noisy 34k sphere). density_trim drops
        faces with zero splat support; the real surface keeps its
        support (one-cell box leak) so trim-on must not nibble it."""
        from threecrate_tpu.reconstruction.poisson import PoissonConfig
        from threecrate_tpu.ops import filtering, normals as nops
        rng = np.random.default_rng(3)
        pts = make_sphere_points(20000)
        pts = pts + rng.normal(0, 0.003, pts.shape).astype(np.float32)
        pc = PointCloud.from_numpy(pts.astype(np.float32))
        # the failure mode needs ESTIMATED normals on a voxel-filtered
        # cloud (estimation error tilts the field; analytic normals on
        # the raw cloud reconstruct cleanly)
        pc = filtering.voxel_grid_filter(pc, 0.02)
        nr = nops.estimate_normals_detailed(
            pc, nops.NormalEstimationConfig(k_neighbors=12))
        pc = pc.with_normals(nr.normals)
        raw = recon.poisson_reconstruct(
            pc, PoissonConfig(density_trim=False))
        trimmed = recon.poisson_reconstruct(
            pc, PoissonConfig(density_trim=True))
        rv, _ = raw.to_numpy()
        tv, tf = trimmed.to_numpy()
        stray = lambda v: (np.abs(np.linalg.norm(v, axis=1) - 1.0)
                           > 0.15).mean()
        assert stray(rv) > 0.02       # the failure mode is present raw
        assert stray(tv) < 0.005, stray(tv)
        assert len(tf) > 1000

    def test_depth7_multigrid_sphere(self):
        """Depth 7 (128³) — beyond the reference's depth-6 clamp
        (poisson.rs:96-99); only reachable with the multigrid solver."""
        from threecrate_tpu.reconstruction.poisson import PoissonConfig
        pc = sphere_cloud_with_normals(8000)
        mesh = recon.poisson_reconstruct(pc, PoissonConfig(depth=7))
        v, f = mesh.to_numpy()
        assert len(f) > 10000
        r = np.linalg.norm(v, axis=1)
        np.testing.assert_allclose(np.median(r), 1.0, atol=0.02)
        assert r.std() < 0.02


class TestDeviceWeld:
    def test_device_weld_matches_host(self):
        """Sort-based device weld = np.unique host weld: same counts,
        same triangle multiset, vertices within 1 ulp (rounded-key
        coordinates computed in f32 vs f64)."""
        import importlib
        import jax.numpy as jnp
        MC = importlib.import_module(
            "threecrate_tpu.reconstruction.marching_cubes")
        grid = recon.create_sphere_volume(48, radius=1.0)
        soup = MC.extract_soup_cubes(grid, jnp.float32(0.0))
        mh = MC.soup_to_mesh(soup, method="host")
        md = MC.soup_to_mesh(soup, method="device")
        vh, fh = mh.to_numpy()
        vd, fd = md.to_numpy()
        assert fh.shape == fd.shape and vh.shape == vd.shape
        th = np.sort(vh[fh].round(5).reshape(-1, 9).view(
            [("", np.float32)] * 9), axis=None)
        td = np.sort(vd[fd].round(5).reshape(-1, 9).view(
            [("", np.float32)] * 9), axis=None)
        assert np.array_equal(th, td)

    def test_device_weld_empty(self):
        import importlib
        import jax.numpy as jnp
        MC = importlib.import_module(
            "threecrate_tpu.reconstruction.marching_cubes")
        grid = recon.VolumetricGrid(
            jnp.ones((8, 8, 8), jnp.float32),
            jnp.zeros(3, jnp.float32), jnp.float32(0.1))
        soup = MC.extract_soup_cubes(grid, jnp.float32(0.0))
        m = MC.soup_to_mesh(soup, method="device")
        assert int(m.face_count()) == 0


class TestMultigrid:
    def test_vcycle_converges_mesh_independent(self):
        """Relative residual after 8 cycles must be < 1e-4 at every
        resolution (the defining multigrid property; unpreconditioned
        CG's iteration count grows with res²)."""
        import jax.numpy as jnp
        from threecrate_tpu.reconstruction import multigrid as mg
        rng = np.random.default_rng(0)
        for res in (16, 32, 64):
            b = rng.normal(size=(res,) * 3).astype(np.float32)
            # smooth the rhs a little (splat-like spectra)
            b = np.asarray(jnp.asarray(b))
            x = mg.mg_solve(jnp.asarray(b), 1e-4, cycles=8)
            rel = float(mg.mg_residual_norm(jnp.asarray(b), x, 1e-4))
            assert rel < 1e-4, (res, rel)


class TestMls:
    def test_smooth_reduces_noise(self, rng):
        pts = make_sphere_points(2000)
        noisy = pts + 0.03 * rng.normal(size=pts.shape).astype(np.float32)
        pc = PointCloud.from_numpy(noisy.astype(np.float32))
        out = recon.mls_smooth(pc, recon.MlsConfig(search_radius=0.3))
        r_before = np.linalg.norm(noisy, axis=1).std()
        r_after = np.linalg.norm(out.to_numpy(), axis=1).std()
        assert r_after < r_before * 0.6

    def test_smooth_scale_invariant(self, rng):
        """MLS at mm scale must behave exactly like MLS at unit scale
        (the r3 eigensolver-scale-bug class: covariance entries ~1e-8
        used to trip absolute-eps rank guards in the analytic
        eigensolver MLS planes come from)."""
        pts = make_sphere_points(1500)
        noisy = pts + 0.03 * rng.normal(size=pts.shape).astype(np.float32)
        big = recon.mls_smooth(PointCloud.from_numpy(noisy),
                               recon.MlsConfig(search_radius=0.3))
        s = 1e-3
        small = recon.mls_smooth(
            PointCloud.from_numpy((noisy * s).astype(np.float32)),
            recon.MlsConfig(search_radius=0.3 * s))
        np.testing.assert_allclose(small.to_numpy() / s, big.to_numpy(),
                                   rtol=2e-3, atol=2e-4)

    def test_kernels_all_run(self, rng):
        pts = make_sphere_points(500)
        pc = PointCloud.from_numpy(pts)
        for kern in recon.WeightKernel:
            out = recon.mls_smooth(pc, recon.MlsConfig(
                search_radius=0.4, kernel=kern))
            assert np.isfinite(out.to_numpy()).all()

    def test_reconstruct_produces_mesh(self):
        pc = PointCloud.from_numpy(make_sphere_points(1500))
        mesh = recon.mls_reconstruct(
            pc, recon.MlsConfig(search_radius=0.3), grid_resolution=32)
        v, f = mesh.to_numpy()
        assert len(f) > 200


class TestDelaunay:
    def test_height_field(self, rng):
        xy = rng.uniform(0, 1, (300, 2)).astype(np.float32)
        z = 0.1 * np.sin(xy[:, 0] * 5)
        pts = np.stack([xy[:, 0], xy[:, 1], z], -1).astype(np.float32)
        mesh = recon.delaunay_reconstruction(PointCloud.from_numpy(pts))
        v, f = mesh.to_numpy()
        # Euler: ~2n triangles for a planar triangulation
        assert len(f) > 1.5 * 300
        # delaunay property spot check: all points included
        assert len(v) == 300

    def test_too_few(self):
        from threecrate_tpu.core.errors import InvalidDataError
        pc = PointCloud.from_numpy(np.zeros((2, 3), np.float32))
        with pytest.raises(InvalidDataError):
            recon.delaunay_reconstruction(pc)


class TestAlphaShape:
    def test_sphere_surface(self):
        pc = PointCloud.from_numpy(make_sphere_points(800))
        mesh = recon.alpha_shape_reconstruction(pc)
        v, f = mesh.to_numpy()
        assert len(f) > 400
        # faces lie on the sphere
        r = np.linalg.norm(v, axis=1)
        np.testing.assert_allclose(r, 1.0, atol=0.01)

    def test_estimate_alpha_positive(self):
        pc = PointCloud.from_numpy(make_sphere_points(500))
        a = recon.estimate_optimal_alpha(pc)
        assert 0 < a < 1.0


class TestBallPivoting:
    def test_sphere_coverage(self):
        pc = PointCloud.from_numpy(make_sphere_points(600))
        mesh = recon.ball_pivoting_reconstruction(pc)
        v, f = mesh.to_numpy()
        assert len(f) > 300
        # triangles on the sphere surface
        tri = v[f]
        cent = tri.mean(1)
        r = np.linalg.norm(cent, axis=1)
        assert (np.abs(r - 1.0) < 0.1).mean() > 0.95

    def test_adaptive_radii(self):
        pc = PointCloud.from_numpy(make_sphere_points(500))
        radii = recon.estimate_radii(pc, recon.BallPivotingConfig())
        assert len(radii) == 2 and radii[0] < radii[1]

    @staticmethod
    def _boundary_edge_count(mesh):
        _, f = mesh.to_numpy()
        edges = {}
        for (i, j, k) in f:
            for e in ((i, j), (j, k), (k, i)):
                ek = (min(e), max(e))
                edges[ek] = edges.get(ek, 0) + 1
        return sum(1 for c in edges.values() if c == 1)

    def test_fill_boundary_holes_closes_small_loop(self):
        """An octahedron with one face removed has a 3-edge boundary
        loop; the fill pass restores watertightness with a correctly
        oriented face (fill_holes promise, ball_pivoting.rs:34-35)."""
        from threecrate_tpu.core.mesh import TriangleMesh
        v = np.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                        [0, 0, 1], [0, 0, -1]], np.float32)
        f = np.asarray([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                        [2, 0, 5], [1, 2, 5], [3, 1, 5]], np.int32)
        mesh = TriangleMesh.from_numpy(v, f)       # [0,3,5] missing
        assert self._boundary_edge_count(mesh) == 3
        filled = recon.fill_boundary_holes(mesh)
        assert self._boundary_edge_count(filled) == 0
        vol = signed_volume(filled)                # consistent winding
        np.testing.assert_allclose(vol, 4.0 / 3.0, rtol=1e-5)

    def test_fill_boundary_holes_keeps_large_boundaries_open(self):
        """A fan disk's 8-edge silhouette stays open below the cap."""
        from threecrate_tpu.core.mesh import TriangleMesh
        ang = np.linspace(0, 2 * np.pi, 9)[:-1]
        rim = np.stack([np.cos(ang), np.sin(ang), 0 * ang], -1)
        v = np.concatenate([[[0, 0, 0]], rim]).astype(np.float32)
        f = np.asarray([[0, 1 + i, 1 + (i + 1) % 8] for i in range(8)],
                       np.int32)
        mesh = TriangleMesh.from_numpy(v, f)
        out = recon.fill_boundary_holes(mesh, max_hole_edges=6)
        assert self._boundary_edge_count(out) == 8
        # raising the cap closes it
        closed = recon.fill_boundary_holes(mesh, max_hole_edges=8)
        assert self._boundary_edge_count(closed) == 0

    def test_fill_holes_improves_bpa_watertightness(self):
        """BPA with fill_holes=True (the default) leaves no more open
        boundary edges than with it off on a holey sampling."""
        rng = np.random.default_rng(3)
        pts = make_sphere_points(400)
        # thin out a cap to provoke undersampled open fans
        keep = ~((pts[:, 2] > 0.92) & (rng.uniform(size=len(pts)) < 0.5))
        pc = PointCloud.from_numpy(pts[keep])
        cfg_off = recon.BallPivotingConfig(fill_holes=False)
        cfg_on = recon.BallPivotingConfig(fill_holes=True)
        m_off = recon.ball_pivoting_reconstruction(pc, cfg_off)
        m_on = recon.ball_pivoting_reconstruction(pc, cfg_on)
        b_off = self._boundary_edge_count(m_off)
        b_on = self._boundary_edge_count(m_on)
        assert b_on <= b_off
        # and the pass is not a no-op on this fixture
        _, f_off = m_off.to_numpy()
        _, f_on = m_on.to_numpy()
        assert len(f_on) >= len(f_off)


class TestPipeline:
    def test_analyze_sphere(self):
        pc = sphere_cloud_with_normals(1500)
        ch = recon.analyze_data(pc)
        assert ch.distribution == "spherical"
        assert ch.is_closed
        assert ch.mean_spacing > 0

    def test_analyze_plane(self, rng):
        xy = rng.uniform(0, 1, (500, 2)).astype(np.float32)
        pts = np.concatenate([xy, np.zeros((500, 1), np.float32)], 1)
        ch = recon.analyze_data(PointCloud.from_numpy(pts))
        assert ch.distribution == "planar"

    def test_select_terrain_prefers_delaunay(self, rng):
        xy = rng.uniform(0, 1, (500, 2)).astype(np.float32)
        pts = np.concatenate([xy, np.zeros((500, 1), np.float32)], 1)
        ch = recon.analyze_data(PointCloud.from_numpy(pts))
        algo = recon.select_algorithm(ch, recon.PipelineConfig())
        assert algo == recon.Algorithm.DELAUNAY

    def test_auto_reconstruct_sphere(self):
        pc = sphere_cloud_with_normals(2000)
        result = recon.auto_reconstruct_detailed(pc)
        assert result.quality.n_faces > 500
        v, f = result.mesh.to_numpy()
        r = np.linalg.norm(v, axis=1)
        assert 0.8 < np.median(r) < 1.2

    def test_preferred_algorithm_respected(self):
        pc = sphere_cloud_with_normals(1000)
        cfg = recon.PipelineConfig(preferred=recon.Algorithm.MARCHING_CUBES)
        result = recon.auto_reconstruct_detailed(pc, cfg)
        assert result.algorithm == recon.Algorithm.MARCHING_CUBES


class TestBandedMarchingCubes:
    """extract_soup_cubes_banded: EXACT triangle-multiset parity with
    the dense sweep when the active blocks fit the cap; auto wrapper
    sizes the cap / falls back."""

    @staticmethod
    def _soup_set(soup):
        v = np.asarray(soup.vertices).reshape(-1, 3, 3)
        m = np.asarray(soup.mask)
        tri = v[m]
        # canonical per-triangle row order, then lexicographic sort
        flat = np.sort(tri.round(5).reshape(-1, 9).view(
            [("", np.float32)] * 9), axis=None)
        return flat

    def _check_parity(self, grid, iso=0.0, block=8, cap=4096):
        from threecrate_tpu.reconstruction.marching_cubes import (
            extract_soup_cubes, extract_soup_cubes_banded)
        import jax.numpy as jnp
        dense = extract_soup_cubes(grid, jnp.float32(iso))
        banded = extract_soup_cubes_banded(grid, jnp.float32(iso),
                                           block=block, max_blocks=cap)
        a = self._soup_set(dense)
        b = self._soup_set(banded)
        assert a.shape == b.shape, (a.shape, b.shape)
        assert (a == b).all()

    def test_sphere_parity(self):
        from threecrate_tpu.reconstruction.marching_cubes import (
            create_sphere_volume)
        self._check_parity(create_sphere_volume(33))

    def test_nonmultiple_dims_parity(self):
        # 37 values -> 36 cubes -> padding path exercised (not 8|36)
        from threecrate_tpu.reconstruction.marching_cubes import (
            create_sphere_volume)
        self._check_parity(create_sphere_volume(38))

    def test_anisotropic_dims_parity(self, rng):
        import jax.numpy as jnp
        from threecrate_tpu.reconstruction.marching_cubes import (
            VolumetricGrid)
        # smooth random field, non-cubic, non-multiple dims
        f = rng.normal(0, 1, (6, 5, 7)).astype(np.float32)
        big = np.kron(f, np.ones((5, 6, 4), np.float32))  # (30, 30, 28)
        grid = VolumetricGrid(jnp.asarray(big), jnp.zeros(3),
                              jnp.float32(0.1))
        self._check_parity(grid, iso=0.05)

    def test_auto_fallback_dense_field(self, rng):
        import jax.numpy as jnp
        from threecrate_tpu.reconstruction.marching_cubes import (
            VolumetricGrid, extract_soup_cubes,
            extract_soup_cubes_auto)
        # high-frequency noise: nearly every block crosses -> fallback
        f = rng.normal(0, 1, (17, 17, 17)).astype(np.float32)
        grid = VolumetricGrid(jnp.asarray(f), jnp.zeros(3),
                              jnp.float32(0.1))
        a = self._soup_set(extract_soup_cubes(grid, jnp.float32(0.0)))
        b = self._soup_set(extract_soup_cubes_auto(grid))
        assert (a == b).all()

    def test_auto_matches_on_sdf(self):
        import jax.numpy as jnp
        from threecrate_tpu.reconstruction.marching_cubes import (
            create_cube_volume, extract_soup_cubes,
            extract_soup_cubes_auto)
        grid = create_cube_volume(40)
        a = self._soup_set(extract_soup_cubes(grid, jnp.float32(0.0)))
        b = self._soup_set(extract_soup_cubes_auto(grid))
        assert a.shape == b.shape and (a == b).all()
