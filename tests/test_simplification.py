"""Simplification tests: sphere meshes simplified to budgets, shape
preserved; progressive meshes reconstruct the full mesh exactly."""

import numpy as np
import pytest

from threecrate_tpu import TriangleMesh
from threecrate_tpu import simplification as simp


def sphere_mesh(n_sub=16):
    thetas = np.linspace(0.25, np.pi - 0.25, n_sub)
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
    return TriangleMesh.from_numpy(verts, np.asarray(faces, np.int32))


def radius_error(mesh):
    v, _ = mesh.to_numpy()
    return np.abs(np.linalg.norm(v, axis=1) - 1.0).max()


class TestQuadric:
    def test_reaches_budget_and_keeps_shape(self):
        m = sphere_mesh()
        n0 = int(m.face_count())
        out = simp.QuadricErrorSimplifier().simplify(m, n0 // 4)
        n1 = int(out.face_count())
        assert n1 <= n0 // 4 + 8
        assert n1 > 20
        assert radius_error(out) < 0.15

    def test_deep_target_reached_noisy_mesh(self):
        """Both QEM paths must reach DEEP targets on noisy curvy
        meshes: flip-guard rejections used to exhaust the batched
        matching / greedy heap far above target (r3c verify-drive
        finding: 166k faces -> 57k at target 5k). Banned-edge retry
        (batched) and bounded heap re-seeding (greedy) fix it."""
        rng = np.random.default_rng(1)
        m = sphere_mesh(40)
        v, f = m.to_numpy()
        v = v + rng.normal(0, 0.01, v.shape).astype(np.float32)
        m = TriangleMesh.from_numpy(v, f)
        n0 = int(m.face_count())
        # batched path (>5000 faces), 94% reduction
        out = simp.QuadricErrorSimplifier().simplify(m, 180)
        assert int(out.face_count()) <= 190, int(out.face_count())
        # strict-greedy path (small mesh), 90% reduction
        small = simp.QuadricErrorSimplifier().simplify(m, 3000)
        out2 = simp.QuadricErrorSimplifier().simplify(small, 300)
        assert int(out2.face_count()) <= 310, int(out2.face_count())

    def test_ratio_api(self):
        m = sphere_mesh()
        out = simp.QuadricErrorSimplifier().simplify_ratio(m, 0.5)
        assert int(out.face_count()) <= int(m.face_count()) * 0.55

    def test_empty_rejected(self):
        from threecrate_tpu.core.errors import InvalidDataError
        with pytest.raises(InvalidDataError):
            simp.QuadricErrorSimplifier().simplify(TriangleMesh.empty(), 10)

    def test_no_degenerate_faces(self):
        m = sphere_mesh()
        out = simp.QuadricErrorSimplifier().simplify(
            m, int(m.face_count()) // 3)
        v, f = out.to_numpy()
        assert (f[:, 0] != f[:, 1]).all()
        assert (f[:, 1] != f[:, 2]).all()
        tri = v[f]
        areas = 0.5 * np.linalg.norm(
            np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
        assert (areas > 1e-9).all()


class TestEdgeCollapse:
    def test_simplify_with_link_condition(self):
        m = sphere_mesh()
        out = simp.EdgeCollapseSimplifier().simplify(
            m, int(m.face_count()) // 4)
        assert int(out.face_count()) <= int(m.face_count()) // 4 + 8
        assert radius_error(out) < 0.15

    def test_midpoint_mode(self):
        m = sphere_mesh(10)
        cfg = simp.EdgeCollapseConfig(collapse_to_midpoint=True)
        out = simp.EdgeCollapseSimplifier(cfg).simplify(
            m, int(m.face_count()) // 2)
        assert int(out.face_count()) <= int(m.face_count()) // 2 + 8


class TestClustering:
    def test_uniform_grid(self):
        m = sphere_mesh()
        out = simp.cluster_simplify(
            m, simp.ClusteringConfig(target_ratio=0.2))
        assert int(out.face_count()) < int(m.face_count())
        assert radius_error(out) < 0.2

    def test_strategies(self):
        m = sphere_mesh(10)
        for strat in simp.RepresentativeStrategy:
            out = simp.cluster_simplify(m, simp.ClusteringConfig(
                target_ratio=0.3, representative=strat))
            v, f = out.to_numpy()
            assert np.isfinite(v).all()
            assert len(f) > 0

    def test_adaptive_mode(self):
        m = sphere_mesh(12)
        out = simp.cluster_simplify(m, simp.ClusteringConfig(
            target_ratio=0.3, mode=simp.ClusteringMode.ADAPTIVE))
        assert int(out.face_count()) > 0

    def test_simplifier_targets_budget(self):
        m = sphere_mesh()
        out = simp.ClusteringSimplifier().simplify(
            m, int(m.face_count()) // 5)
        assert int(out.face_count()) <= int(m.face_count()) // 5 * 1.5


class TestProgressive:
    def test_full_mesh_roundtrip(self):
        m = sphere_mesh(10)
        n0 = int(m.face_count())
        pm = simp.ProgressiveMesh.from_mesh(m, n0 // 3)
        full = pm.full_mesh()
        v0, f0 = m.to_numpy()
        v1, f1 = full.to_numpy()
        # refining all splits restores the full mesh exactly
        assert len(f1) == n0
        assert len(v1) == len(v0)
        # geometry identical (up to vertex reindexing): compare sorted
        np.testing.assert_allclose(
            np.sort(v1.round(5), axis=0), np.sort(v0.round(5), axis=0),
            atol=1e-4)

    def test_base_is_coarse(self):
        m = sphere_mesh(10)
        pm = simp.ProgressiveMesh.from_mesh(m, int(m.face_count()) // 3)
        base = pm.base_mesh()
        assert int(base.face_count()) <= int(m.face_count()) // 3 + 8

    def test_lod_levels_monotonic(self):
        m = sphere_mesh(10)
        pm = simp.ProgressiveMesh.from_mesh(m, int(m.face_count()) // 4)
        lods = pm.lod_levels(4)
        counts = [int(l.face_count()) for l in lods]
        assert counts == sorted(counts)
        assert counts[-1] == int(m.face_count())

    def test_serialisation(self, tmp_path):
        m = sphere_mesh(8)
        pm = simp.ProgressiveMesh.from_mesh(m, int(m.face_count()) // 2)
        p = tmp_path / "pm.bin"
        pm.save(p)
        back = simp.ProgressiveMesh.load(p)
        v0, f0 = pm.full_mesh().to_numpy()
        v1, f1 = back.full_mesh().to_numpy()
        np.testing.assert_allclose(v0, v1)


class TestDispatcher:
    def test_methods(self):
        m = sphere_mesh(8)
        for method in ("quadric", "edge_collapse", "clustering"):
            out = simp.simplify_mesh(m, int(m.face_count()) // 2, method)
            assert int(out.face_count()) > 0

    def test_unknown_method(self):
        with pytest.raises(ValueError):
            simp.simplify_mesh(sphere_mesh(6), 10, "nope")
