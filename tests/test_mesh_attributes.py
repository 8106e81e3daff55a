"""ExtendedTriangleMesh round-trip tests (reference:
io/src/tests/mesh_serialization_tests.rs attribute-preservation suite)."""

import numpy as np
import pytest

from threecrate_tpu import TriangleMesh
from threecrate_tpu.io.mesh_attributes import (
    ExtendedTriangleMesh, read_extended_mesh, write_extended_mesh)
from threecrate_tpu.ops import point_cloud_ops  # noqa: F401 (methods)
from threecrate_tpu import PointCloud


def base_mesh():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    return TriangleMesh.from_numpy(v, f)


class TestExtendedMesh:
    def test_full_roundtrip(self, tmp_path, rng):
        m = base_mesh().compute_vertex_normals()
        uvs = rng.uniform(0, 1, (4, 2)).astype(np.float32)
        tangents = rng.normal(size=(4, 3)).astype(np.float32)
        custom = {"quality": rng.uniform(0, 1, 4).astype(np.float32),
                  "vel": rng.normal(size=(4, 3)).astype(np.float32)}
        ext = ExtendedTriangleMesh(m, uvs, tangents, custom,
                                   {"source": "unit-test", "id": "42"})
        p = tmp_path / "ext.ply"
        write_extended_mesh(p, ext)
        back = read_extended_mesh(p)
        np.testing.assert_allclose(back.uvs, uvs, atol=1e-6)
        np.testing.assert_allclose(back.tangents, tangents, atol=1e-6)
        np.testing.assert_allclose(back.custom["quality"],
                                   custom["quality"], atol=1e-6)
        np.testing.assert_allclose(back.custom["vel"], custom["vel"],
                                   atol=1e-6)
        assert back.metadata == {"source": "unit-test", "id": "42"}
        v0, f0 = m.to_numpy()
        v1, f1 = back.mesh.to_numpy()
        np.testing.assert_allclose(v1, v0, atol=1e-6)
        np.testing.assert_array_equal(f1, f0)

    def test_validation_guard(self):
        from threecrate_tpu.core.errors import InvalidDataError
        ext = ExtendedTriangleMesh(base_mesh(),
                                   uvs=np.zeros((2, 2), np.float32))
        with pytest.raises(InvalidDataError):
            ext.validate()

    def test_recompute_tangents_from_uvs(self):
        m = base_mesh()
        uvs = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
        ext = ExtendedTriangleMesh(m, uvs=uvs).recompute_tangents()
        # u increases along +x → tangents ≈ +x
        np.testing.assert_allclose(np.abs(ext.tangents[:, 0]), 1.0,
                                   atol=1e-4)

    def test_recompute_tangents_without_uvs(self):
        ext = ExtendedTriangleMesh(
            base_mesh().compute_vertex_normals()).recompute_tangents()
        n = np.linalg.norm(ext.tangents, axis=1)
        np.testing.assert_allclose(n, 1.0, atol=1e-5)


class TestPointCloudOps:
    def test_methods_attached(self, rng):
        pts = rng.uniform(0, 1, (50, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        res = pc.k_nearest_neighbors(3)
        assert res.indices.shape[1] == 3
        idx, dist = pc.nearest_neighbor(pts[7])
        assert idx == 7 and dist < 1e-5
        nb = pc.neighbors_within(pts[0], 0.3)
        d = np.linalg.norm(pts - pts[0], axis=1)
        assert set(nb) == set(np.nonzero(d <= 0.3)[0])
