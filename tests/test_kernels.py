"""Direct pallas-kernel edge cases (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from threecrate_tpu.kernels.knn_pallas import (knn_window_tiles,
                                               window_normals_tiles)


def _layout(pts, valid):
    n = len(pts)
    t = jnp.asarray(pts, jnp.float32).T            # (3, n)
    v = jnp.asarray(valid, jnp.float32)[None, :]
    ids = jnp.arange(n, dtype=jnp.int32)[None, :]
    return t, v, ids


class TestKnnWindowTiles:
    def test_exact_within_single_tile(self, rng):
        pts = rng.normal(0, 1, (128, 3)).astype(np.float32)
        t, v, ids = _layout(pts, np.ones(128))
        neg, idx = knn_window_tiles(t, v, ids, 4, tile=128, interpret=True)
        # brute force reference
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        ref = np.argsort(d2, axis=1)[:, :4]
        got = np.sort(np.asarray(idx).T, axis=1)
        np.testing.assert_array_equal(got, np.sort(ref, axis=1))

    def test_all_invalid_tile(self):
        pts = np.zeros((256, 3), np.float32)
        valid = np.zeros(256)
        valid[:128] = 1                               # second tile all-pad
        t, v, ids = _layout(pts, valid)
        neg, idx = knn_window_tiles(t, v, ids, 3, tile=128, interpret=True)
        # invalid candidates are never selected: every emitted id is a
        # valid (< 128) point; query validity is the caller's mask
        sel = np.asarray(idx)[np.isfinite(np.asarray(neg))]
        assert (sel < 128).all()
        assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 256).all()

    def test_fewer_valid_than_k(self):
        pts = np.zeros((128, 3), np.float32)
        pts[:2] = [[0, 0, 0], [1, 0, 0]]
        valid = np.zeros(128)
        valid[:2] = 1
        t, v, ids = _layout(pts, valid)
        neg, idx = knn_window_tiles(t, v, ids, 5, tile=128, interpret=True)
        # only 2 finite slots per valid query, rest -inf
        finite = np.isfinite(np.asarray(neg)[:, 0])
        assert finite.sum() == 2

    def test_exclude_self(self, rng):
        pts = rng.normal(0, 1, (128, 3)).astype(np.float32)
        t, v, ids = _layout(pts, np.ones(128))
        _, idx = knn_window_tiles(t, v, ids, 1, tile=128, interpret=True,
                                  exclude_self=True)
        assert (np.asarray(idx)[0] != np.arange(128)).all()


class TestWindowNormalsTiles:
    def test_planar_tile(self, rng):
        pts = rng.normal(0, 1, (128, 3)).astype(np.float32)
        pts[:, 2] *= 1e-4                             # z ~ 0 plane
        t, v, _ = _layout(pts, np.ones(128))
        out = window_normals_tiles(t, v, 8, tile=128, interpret=True)
        nrm = np.asarray(out[:3]).T
        assert np.abs(nrm[:, 2]).min() > 0.99         # all normals ~ z
        assert (np.asarray(out[4]) == 8).all()        # count = k

    def test_duplicate_points_no_nan(self):
        pts = np.zeros((128, 3), np.float32)          # all identical
        t, v, _ = _layout(pts, np.ones(128))
        out = window_normals_tiles(t, v, 8, tile=128, interpret=True)
        assert np.isfinite(np.asarray(out)).all()

    def test_invalid_rows_zero_count(self):
        pts = np.random.default_rng(0).normal(0, 1, (256, 3)
                                              ).astype(np.float32)
        valid = np.ones(256)
        valid[200:] = 0
        t, v, _ = _layout(pts, valid)
        out = window_normals_tiles(t, v, 6, tile=128, interpret=True)
        cnt = np.asarray(out[4])
        # contract: invalid CANDIDATES are excluded; invalid QUERIES
        # still compute (the caller masks them — ops.normals does) and
        # may only count valid candidates
        assert (cnt[:200] == 6).all()
        assert (cnt <= 6).all()
        assert np.isfinite(np.asarray(out[:4])).all()


@pytest.fixture
def rng():
    return np.random.default_rng(3)
