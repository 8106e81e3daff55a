"""kNN / radius search vs NumPy brute-force oracle.

Same oracle strategy as the reference's KD-tree tests
(nearest_neighbor.rs:429-641): fixed cube + random clouds, distances
matched to tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from threecrate_tpu import PointCloud
from threecrate_tpu.ops import neighbors

from conftest import brute_force_knn


CUBE = np.array([
    [0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
    [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1],
], np.float32)


class TestKnn:
    def test_cube_k1_self(self):
        pc = PointCloud.from_numpy(CUBE)
        res = neighbors.knn(pc.points, pc.mask, pc.points[:8], None, 1)
        np.testing.assert_array_equal(np.asarray(res.indices[:, 0]), np.arange(8))
        np.testing.assert_allclose(np.asarray(res.distances), 0.0, atol=1e-6)

    def test_cube_k3_matches_oracle(self):
        pc = PointCloud.from_numpy(CUBE)
        res = neighbors.knn(pc.points, pc.mask, jnp.asarray(CUBE), None, 3)
        oidx, odist = brute_force_knn(CUBE, CUBE, 3)
        np.testing.assert_allclose(np.asarray(res.distances)[:8], odist, atol=1e-5)

    def test_random_matches_oracle(self, rng):
        pts = rng.uniform(0, 1, (100, 3)).astype(np.float32)
        queries = rng.uniform(0, 1, (10, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        res = neighbors.knn(pc.points, pc.mask, jnp.asarray(queries), None, 5)
        oidx, odist = brute_force_knn(pts, queries, 5)
        np.testing.assert_allclose(np.asarray(res.distances), odist, atol=1e-5)
        # indices agree where distances are distinct
        d = np.asarray(res.distances)
        gaps = np.diff(odist, axis=1) > 1e-5
        ii = np.asarray(res.indices)
        for q in range(10):
            for j in range(5):
                if (j == 0 or gaps[q, j - 1]) and (j == 4 or gaps[q, j]):
                    assert ii[q, j] == oidx[q, j]

    def test_padding_excluded(self, rng):
        """Padded rows (mask False, at origin) must never be neighbors."""
        pts = rng.uniform(5, 6, (30, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts)  # capacity 128, pad rows at 0
        queries = jnp.asarray(pts[:4])
        res = neighbors.knn(pc.points, pc.mask, queries, None, 30)
        assert bool(jnp.all(res.mask))
        assert np.asarray(res.distances).max() < np.sqrt(3) + 1e-3

    def test_exclude_self(self, rng):
        pts = rng.uniform(0, 1, (50, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        res = neighbors.knn(pc.points, pc.mask, pc.points, pc.mask, 1,
                            exclude_self=True)
        ii = np.asarray(res.indices[:50, 0])
        assert not np.any(ii == np.arange(50))
        assert np.asarray(res.distances[:50]).min() > 0

    def test_k_larger_than_n(self):
        pts = CUBE[:4]
        pc = PointCloud.from_numpy(pts)
        res = neighbors.knn(pc.points, pc.mask, jnp.asarray(pts), None, 100)
        # only 4 valid neighbors per query
        assert int(res.mask.sum()) == 4 * 4

    def test_tiling_boundaries(self, rng):
        """Results identical across tile-size choices (blockwise merge)."""
        pts = rng.uniform(0, 1, (500, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        q = jnp.asarray(pts[:50])
        a = neighbors.knn(pc.points, pc.mask, q, None, 8,
                          query_chunk=16, db_tile=64)
        b = neighbors.knn(pc.points, pc.mask, q, None, 8,
                          query_chunk=512, db_tile=4096)
        np.testing.assert_allclose(np.asarray(a.distances),
                                   np.asarray(b.distances), atol=1e-5)


class TestRadius:
    def test_radius_cube(self):
        pc = PointCloud.from_numpy(CUBE)
        res = neighbors.radius_neighbors(
            pc.points, pc.mask, jnp.asarray(CUBE[:1]), None, 1.05, 8)
        # origin: itself + 3 at distance 1
        assert int(res.mask.sum()) == 4

    def test_radius_oracle(self, rng):
        pts = rng.uniform(0, 1, (100, 3)).astype(np.float32)
        queries = rng.uniform(0, 1, (10, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        r = 0.25
        res = neighbors.radius_neighbors(
            pc.points, pc.mask, jnp.asarray(queries), None, r, 64)
        d2 = ((queries[:, None] - pts[None]) ** 2).sum(-1)
        expected_counts = (np.sqrt(d2) <= r).sum(1)
        got_counts = np.asarray(res.mask.sum(1))
        np.testing.assert_array_equal(got_counts, expected_counts)

    def test_nearest_one_max_distance(self, rng):
        pts = rng.uniform(0, 1, (50, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        far = jnp.asarray(np.array([[10, 10, 10]], np.float32))
        res = neighbors.nearest_one(pc.points, pc.mask, far, max_distance=1.0)
        assert not bool(res.mask[0, 0])


class TestWrappers:
    def test_kdtree_alias(self, random_cloud):
        pc, pts = random_cloud
        tree = neighbors.KdTree(pc)
        res = tree.find_k_nearest(pts[:5], 3)
        oidx, odist = brute_force_knn(pts, pts[:5], 3)
        np.testing.assert_allclose(np.asarray(res.distances), odist, atol=1e-5)

    def test_radius_wrapper(self, random_cloud):
        pc, pts = random_cloud
        tree = neighbors.BruteForceSearch(pc)
        res = tree.find_radius_neighbors(pts[:3], 0.3)
        assert res.indices.shape == (3, 64)


class TestReturnPoints:
    def test_coords_match_indices(self, rng):
        pts = rng.uniform(0, 10, (2000, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        res, coords = neighbors.knn_window(
            pc.points, pc.mask, 6, n_passes=2, return_points=True,
            backend="pallas")
        idx = np.asarray(res.indices[:2000])
        crd = np.asarray(coords[:2000])
        m = np.asarray(res.mask[:2000])
        expect = np.asarray(pc.points)[idx]
        np.testing.assert_allclose(crd[m], expect[m], atol=1e-6)


class TestMergeFuzz:
    def test_rank_merge_matches_reference(self, rng):
        """Fuzz _merge_topk against a sort-based reference merge."""
        from threecrate_tpu.ops.neighbors import _merge_topk
        import jax.numpy as jnp
        for trial in range(60):
            k = int(rng.integers(2, 8))
            n = 4
            a = np.sort(rng.uniform(-10, 0, (n, k)), 1)[:, ::-1]
            b = np.sort(rng.uniform(-10, 0, (n, k)), 1)[:, ::-1]
            a[rng.uniform(size=(n, k)) < 0.2] = -np.inf
            b[rng.uniform(size=(n, k)) < 0.2] = -np.inf
            a = -np.sort(-a, 1)
            b = -np.sort(-b, 1)
            ia = rng.integers(0, 20, (n, k))
            ib = rng.integers(0, 20, (n, k))
            on, oi = _merge_topk(
                jnp.asarray(a, jnp.float32), jnp.asarray(ia, jnp.int32),
                jnp.asarray(b, jnp.float32), jnp.asarray(ib, jnp.int32), k)
            on = np.asarray(on)
            for r in range(n):
                bb = b[r].copy()
                avalid = set(ia[r][a[r] > -np.inf])
                for j in range(k):
                    if ib[r][j] in avalid:
                        bb[j] = -np.inf
                cand = np.concatenate([a[r], bb])
                exp = cand[np.argsort(-cand, kind="stable")[:k]]
                np.testing.assert_allclose(on[r], exp, atol=1e-6)


def test_knn_window_cross_top1_matches_exact():
    """Generic cross-cloud window kNN (the static-sort ICP kernel
    superseded its use inside ICP, but it remains the public
    cross-cloud fast path)."""
    rng = np.random.default_rng(5)
    db = rng.normal(0, 1, (600, 3)).astype(np.float32)
    q = rng.normal(0, 1, (400, 3)).astype(np.float32)
    res = neighbors.knn_window_cross(
        jnp.asarray(db), jnp.ones(600, bool), jnp.asarray(q),
        jnp.ones(400, bool), 1, tile=128)
    d2 = ((q[:, None] - db[None]) ** 2).sum(-1)
    ref = d2.min(1)
    got = np.asarray(res.distances[:, 0]) ** 2
    agree = np.isclose(got, ref, rtol=1e-4).mean()
    assert agree > 0.97, agree
