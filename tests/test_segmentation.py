"""Segmentation tests: RANSAC plane with planted plane+noise, euclidean
clusters on separated blobs, Patchwork++ on a synthetic street scene
(reference fixture style: segmentation.rs / ground_segmentation.rs
test modules)."""

import numpy as np
import pytest

from threecrate_tpu import PointCloud
from threecrate_tpu.ops import ground, segmentation


def plane_with_outliers(n_plane=500, n_out=50, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-2, 2, (n_plane, 2))
    plane = np.stack([xy[:, 0], xy[:, 1],
                      0.002 * rng.normal(size=n_plane)], -1)
    outliers = rng.uniform(-2, 2, (n_out, 3)) + np.array([0, 0, 3.0])
    return np.concatenate([plane, outliers]).astype(np.float32)


class TestPlaneRansac:
    def test_finds_dominant_plane(self):
        pts = plane_with_outliers()
        pc = PointCloud.from_numpy(pts)
        res = segmentation.segment_plane(pc, distance_threshold=0.02,
                                         max_iterations=256)
        assert int(res.inlier_count) >= 490
        nrm = np.asarray(res.model.normal)
        assert abs(nrm[2]) > 0.999
        # the planted outliers are not inliers
        keep = np.asarray(res.inlier_mask)[:550]
        assert keep[500:].sum() == 0

    def test_extract_negative(self):
        pts = plane_with_outliers()
        pc = PointCloud.from_numpy(pts)
        res = segmentation.segment_plane(pc, 0.02, 256)
        rest = segmentation.extract_plane(pc, res, negative=True)
        assert 40 <= len(rest) <= 60

    def test_tilted_plane(self, rng):
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        basis = np.linalg.svd(n[None])[2][1:]
        uv = rng.uniform(-1, 1, (300, 2))
        pts = (uv @ basis + 0.5 * n).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        res = segmentation.segment_plane(pc, 0.01, 256)
        got = np.asarray(res.model.normal)
        assert abs(abs(got @ n) - 1.0) < 1e-3

    def test_too_few_points(self):
        from threecrate_tpu.core.errors import InvalidDataError
        import jax.numpy as jnp
        pc = PointCloud(jnp.zeros((2, 3)), jnp.ones((2,), bool), {})
        with pytest.raises(InvalidDataError):
            segmentation.segment_plane(pc)


class TestEuclideanClustering:
    def _blobs(self, seed=0):
        rng = np.random.default_rng(seed)
        a = rng.normal(0, 0.05, (100, 3)) + [0, 0, 0]
        b = rng.normal(0, 0.05, (60, 3)) + [2, 0, 0]
        c = rng.normal(0, 0.05, (30, 3)) + [0, 2, 0]
        return np.concatenate([a, b, c]).astype(np.float32)

    def test_three_clusters_sorted_by_size(self):
        pts = self._blobs()
        pc = PointCloud.from_numpy(pts)
        cfg = segmentation.EuclideanClusterConfig(tolerance=0.3,
                                                  min_cluster_size=5)
        res = segmentation.extract_euclidean_clusters(pc, cfg)
        assert int(res.n_clusters) == 3
        labels = np.asarray(res.labels)[:190]
        # same blob → same label
        assert len(set(labels[:100])) == 1
        assert len(set(labels[100:160])) == 1
        assert len(set(labels[160:190])) == 1
        # largest-first ordering
        assert labels[0] == 0 and labels[100] == 1 and labels[160] == 2
        sizes = np.asarray(res.sizes)
        np.testing.assert_array_equal(sizes[:3], [100, 60, 30])

    def test_min_size_filters_noise(self):
        pts = self._blobs()
        lone = np.array([[10, 10, 10]], np.float32)
        pc = PointCloud.from_numpy(np.concatenate([pts, lone]))
        cfg = segmentation.EuclideanClusterConfig(tolerance=0.3,
                                                  min_cluster_size=5)
        res = segmentation.extract_euclidean_clusters(pc, cfg)
        assert int(res.n_clusters) == 3
        assert int(res.labels[190]) == -1

    def test_chain_connectivity(self):
        # a long chain: BFS equivalence needs label propagation to chain
        xs = np.arange(100, dtype=np.float32) * 0.1
        pts = np.stack([xs, np.zeros(100), np.zeros(100)], -1)
        pc = PointCloud.from_numpy(pts.astype(np.float32))
        cfg = segmentation.EuclideanClusterConfig(tolerance=0.15)
        res = segmentation.extract_euclidean_clusters(pc, cfg)
        assert int(res.n_clusters) == 1
        assert int(res.sizes[0]) == 100


class TestPatchwork:
    def _street(self, seed=0, n_ground=20000, n_obj=800):
        rng = np.random.default_rng(seed)
        ang = rng.uniform(0, 2 * np.pi, n_ground)
        r = rng.uniform(2.8, 60, n_ground)
        h = -1.723  # sensor height below origin
        gpts = np.stack([r * np.cos(ang), r * np.sin(ang),
                         h + rng.normal(0, 0.03, n_ground)], -1)
        # boxes (cars/walls) above ground
        centers = rng.uniform(-30, 30, (8, 2))
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
        labels = np.concatenate([np.ones(n_ground, bool),
                                 np.zeros(len(opts), bool)])
        return pts, labels

    def test_separates_ground(self):
        pts, truth = self._street()
        pc = PointCloud.from_numpy(pts)
        res = ground.patchwork_plus_plus(pc)
        got = np.asarray(res.ground_mask)[:len(truth)]
        recall = got[truth].mean()          # ground points found
        precision = truth[got].mean() if got.any() else 0.0
        assert recall > 0.85, f"recall {recall}"
        assert precision > 0.9, f"precision {precision}"

    def test_segment_ground_split(self):
        pts, truth = self._street(seed=3)
        pc = PointCloud.from_numpy(pts)
        g, ng = ground.segment_ground(pc)
        assert len(g) + len(ng) == len(pts)
        assert len(g) > 0.6 * truth.sum()

    def test_patch_count(self):
        cfg = ground.PatchworkConfig()
        assert cfg.n_patches == 2 * 16 + 4 * 32 + 4 * 54 + 4 * 32
