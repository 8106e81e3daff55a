"""Flagship pipeline models (threecrate_tpu.models)."""

import numpy as np
import pytest

import threecrate_tpu as tc
from threecrate_tpu.models import (OdometryModel, PerceptionStep,
                                   ReconstructionModel, RegistrationModel)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _surface(n, rng, shift=(0.0, 0.0, 0.0)):
    xy = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    z = 0.4 * np.sin(xy[:, 0] * 2.0) + 0.3 * np.cos(xy[:, 1] * 1.7)
    return (np.stack([xy[:, 0], xy[:, 1], z], -1)
            + np.asarray(shift, np.float32)).astype(np.float32)


class TestPerceptionStep:
    def test_recovers_translation_and_normals(self, rng):
        n = 2048
        src = _surface(n, np.random.default_rng(0))
        tgt = _surface(n, np.random.default_rng(0),
                       shift=(0.03, -0.01, 0.02))
        mask = np.ones(n, bool)
        step = PerceptionStep(k=10, max_iterations=20)
        res = step(src, mask, tgt, mask)
        t = np.asarray(res.transform)
        np.testing.assert_allclose(t[:3, 3], [0.03, -0.01, 0.02],
                                   atol=5e-3)
        nrm = np.asarray(res.normals)
        assert np.allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-3)
        assert float(res.mse) < 1e-4

    def test_compiles_once(self, rng):
        n = 512
        step = PerceptionStep(k=8, max_iterations=5)
        mask = np.ones(n, bool)
        a = step(_surface(n, rng), mask, _surface(n, rng), mask)
        b = step(_surface(n, rng), mask, _surface(n, rng), mask)
        assert np.asarray(a.transform).shape == (4, 4)
        assert np.asarray(b.transform).shape == (4, 4)


class TestOdometryModel:
    def test_pose_sequence(self, rng):
        odom = OdometryModel(voxel_size=0.15, max_range=10.0,
                             min_range=0.0)
        base = _surface(3000, np.random.default_rng(1))
        for i in range(3):
            scan = base - np.array([0.05 * i, 0.0, 0.0], np.float32)
            odom.step(tc.PointCloud.from_numpy(scan))
        assert len(odom.poses) == 3
        t = np.asarray(odom.poses[-1].matrix)[:3, 3]
        # scans drift backwards in x -> world pose advances forward
        assert abs(t[0]) > 0.04
        assert odom.local_map is not None


class TestRegistrationModel:
    def test_coarse_to_fine(self, rng):
        n = 3000
        src = _surface(n, np.random.default_rng(2))
        shift = np.array([0.4, -0.3, 0.2], np.float32)
        model = RegistrationModel(max_iterations=20)
        res = model(tc.PointCloud.from_numpy(src),
                    tc.PointCloud.from_numpy(src + shift))
        t = np.asarray(res.as_transform().matrix)[:3, 3]
        np.testing.assert_allclose(t, shift, atol=0.05)


class TestReconstructionModel:
    def test_points_to_mesh(self, rng):
        n = 4000
        ang = rng.uniform(0, 2 * np.pi, n)
        r = rng.uniform(0.2, 1.0, n)
        pts = np.stack([r * np.cos(ang), r * np.sin(ang),
                        0.1 * r * r], -1).astype(np.float32)
        mesh = ReconstructionModel(k=8)(tc.PointCloud.from_numpy(pts))
        f = np.asarray(mesh.faces)
        assert f.shape[0] > 50
