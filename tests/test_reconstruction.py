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


class TestMls:
    def test_smooth_reduces_noise(self, rng):
        pts = make_sphere_points(2000)
        noisy = pts + 0.03 * rng.normal(size=pts.shape).astype(np.float32)
        pc = PointCloud.from_numpy(noisy.astype(np.float32))
        out = recon.mls_smooth(pc, recon.MlsConfig(search_radius=0.3))
        r_before = np.linalg.norm(noisy, axis=1).std()
        r_after = np.linalg.norm(out.to_numpy(), axis=1).std()
        assert r_after < r_before * 0.6

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
