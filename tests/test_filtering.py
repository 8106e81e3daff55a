"""Filter tests: voxel grid centroids, outlier removal with planted
outliers — same fixture style as the reference (filtering.rs tests)."""

import numpy as np
import pytest

from threecrate_tpu import PointCloud
from threecrate_tpu.ops import filtering


def voxel_oracle(pts: np.ndarray, voxel: float) -> np.ndarray:
    """NumPy oracle: f64 centroid per occupied voxel (PCL semantics)."""
    mn = pts.min(0)
    keys = np.floor((pts - mn) / voxel).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    out = np.zeros((len(uniq), 3))
    cnt = np.zeros(len(uniq))
    np.add.at(out, inv, pts.astype(np.float64))
    np.add.at(cnt, inv, 1)
    return out / cnt[:, None]


class TestVoxelGrid:
    def test_two_clusters(self):
        pts = np.array([
            [0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [0.03, 0.01, 0.02],
            [1.01, 1.01, 1.01], [1.02, 1.03, 1.02],
        ], np.float32)
        pc = PointCloud.from_numpy(pts)
        out = filtering.voxel_grid_filter(pc, 0.1)
        got = out.to_numpy()
        assert got.shape[0] == 2
        exp = voxel_oracle(pts, 0.1)
        got_sorted = got[np.lexsort(got.T)]
        exp_sorted = exp[np.lexsort(exp.T)]
        np.testing.assert_allclose(got_sorted, exp_sorted, atol=1e-5)

    def test_matches_oracle_random(self, rng):
        pts = rng.uniform(-5, 5, (300, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        out = filtering.voxel_grid_filter(pc, 0.8).to_numpy()
        exp = voxel_oracle(pts, 0.8)
        assert out.shape[0] == exp.shape[0]
        got_sorted = out[np.lexsort(np.round(out.T, 4))]
        exp_sorted = exp[np.lexsort(np.round(exp.T, 4))]
        np.testing.assert_allclose(got_sorted, exp_sorted, atol=1e-4)

    def test_large_voxel_collapses_to_one(self, rng):
        pts = rng.uniform(0, 1, (50, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        out = filtering.voxel_grid_filter(pc, 100.0)
        got = out.to_numpy()
        assert got.shape[0] == 1
        np.testing.assert_allclose(got[0], pts.mean(0), atol=1e-4)

    def test_averages_attrs(self):
        pts = np.array([[0.01, 0, 0], [0.02, 0, 0]], np.float32)
        cols = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
        pc = PointCloud.from_numpy(pts, colors=cols)
        out = filtering.voxel_grid_filter(pc, 1.0)
        np.testing.assert_allclose(out.attr_to_numpy("colors"),
                                   [[0.5, 0.5, 0]], atol=1e-6)

    def test_invalid_voxel_size(self, random_cloud):
        pc, _ = random_cloud
        with pytest.raises(ValueError):
            filtering.voxel_grid_filter(pc, 0.0)

    def test_detailed_voxel_index(self):
        pts = np.array([[0.01, 0, 0], [0.02, 0, 0], [5.0, 0, 0]], np.float32)
        pc = PointCloud.from_numpy(pts)
        res = filtering.voxel_grid_filter_detailed(pc, 1.0)
        assert int(res.num_voxels) == 2
        vi = np.asarray(res.voxel_index)[:3]
        assert vi[0] == vi[1] != vi[2]


class TestOutliers:
    def _grid_with_outlier(self):
        xs, ys = np.meshgrid(np.arange(10), np.arange(10))
        pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(100)], -1) * 0.1
        pts = np.concatenate([pts, [[50.0, 50.0, 50.0]]]).astype(np.float32)
        return pts

    def test_statistical_removes_planted(self):
        pts = self._grid_with_outlier()
        pc = PointCloud.from_numpy(pts)
        res = filtering.statistical_outlier_removal(pc, k=8, std_multiplier=1.0)
        keep = np.asarray(res.inlier_mask)[:101]
        assert not keep[100]          # outlier dropped
        assert keep[:100].sum() >= 95  # grid mostly kept

    def test_statistical_with_threshold(self):
        pts = self._grid_with_outlier()
        pc = PointCloud.from_numpy(pts)
        res, dists, thr = filtering.statistical_outlier_removal_with_threshold(
            pc, k=8, std_multiplier=1.0)
        assert float(dists[100]) > float(thr)

    def test_radius_removes_planted(self):
        pts = self._grid_with_outlier()
        pc = PointCloud.from_numpy(pts)
        res = filtering.radius_outlier_removal(pc, radius=0.25, min_neighbors=2)
        keep = np.asarray(res.inlier_mask)[:101]
        assert not keep[100]
        assert keep[:100].sum() == 100

    def test_range_filter(self):
        pts = np.array([[0.1, 0, 0], [5, 0, 0], [200, 0, 0]], np.float32)
        pc = PointCloud.from_numpy(pts)
        res = filtering.range_filter(pc, 0.5, 100.0)
        keep = np.asarray(res.inlier_mask)[:3]
        np.testing.assert_array_equal(keep, [False, True, False])

    def test_passthrough(self):
        pts = np.array([[0, 0, -1], [0, 0, 0.5], [0, 0, 3]], np.float32)
        pc = PointCloud.from_numpy(pts)
        res = filtering.passthrough_filter(pc, axis=2, lo=0.0, hi=1.0)
        np.testing.assert_array_equal(np.asarray(res.inlier_mask)[:3],
                                      [False, True, False])


class TestWindowOutliers:
    def test_window_matches_exact(self, rng):
        pts = rng.uniform(-5, 5, (4000, 3)).astype(np.float32)
        pts = np.concatenate([pts, [[100, 100, 100]]]).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        exact = filtering.statistical_outlier_removal(
            pc, k=8, std_multiplier=2.0, method="exact")
        win = filtering.statistical_outlier_removal(
            pc, k=8, std_multiplier=2.0, method="window")
        e = np.asarray(exact.inlier_mask)[:4001]
        w = np.asarray(win.inlier_mask)[:4001]
        assert not w[4000]            # planted outlier removed
        assert (e == w).mean() > 0.995  # near-identical decisions
