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


class TestIcpMatchTiles:
    """Static-sort ICP correspondence kernel (icp_pallas.icp_match_tiles):
    packed [x,y,z,valid,extra...] target rows, sentinel invalid coords,
    one-hot payload gather with tie averaging."""

    @staticmethod
    def _pack_src(pts, valid):
        return jnp.concatenate(
            [jnp.asarray(pts, jnp.float32).T,
             jnp.asarray(valid, jnp.float32)[None, :]], axis=0)

    @staticmethod
    def _pack_tgt(pts, valid, extra=None):
        pts = np.asarray(pts, np.float32).copy()
        pts[~np.asarray(valid, bool)] = 2e19      # sentinel (see caller)
        rows = [jnp.asarray(pts).T,
                jnp.asarray(valid, jnp.float32)[None, :]]
        if extra is not None:
            rows.append(jnp.asarray(extra, jnp.float32).T)
        return jnp.concatenate(rows, axis=0)

    def test_exact_nearest_within_window(self, rng):
        from threecrate_tpu.kernels.icp_pallas import icp_match_tiles
        ns = 128
        src = rng.normal(0, 1, (ns, 3)).astype(np.float32)
        tgt = rng.normal(0, 1, (512, 3)).astype(np.float32)
        out = icp_match_tiles(self._pack_src(src, np.ones(ns)),
                              self._pack_tgt(tgt, np.ones(512)),
                              jnp.zeros(1, jnp.int32), tile=128,
                              w_tiles=4, interpret=True)
        out = np.asarray(out)
        d2 = ((src[:, None] - tgt[None]) ** 2).sum(-1)
        ref = tgt[np.argmin(d2, axis=1)]
        np.testing.assert_allclose(out[0:3].T, ref, atol=1e-6)
        assert (out[3] > 0.5).all()

    def test_extras_gathered_through_match(self, rng):
        from threecrate_tpu.kernels.icp_pallas import icp_match_tiles
        ns = 128
        src = rng.normal(0, 1, (ns, 3)).astype(np.float32)
        tgt = rng.normal(0, 1, (512, 3)).astype(np.float32)
        extra = rng.normal(0, 1, (512, 2)).astype(np.float32)
        out = np.asarray(icp_match_tiles(
            self._pack_src(src, np.ones(ns)),
            self._pack_tgt(tgt, np.ones(512), extra),
            jnp.zeros(1, jnp.int32), tile=128, w_tiles=4, interpret=True))
        idx = np.argmin(((src[:, None] - tgt[None]) ** 2).sum(-1), axis=1)
        np.testing.assert_allclose(out[4:6].T, extra[idx], atol=1e-6)

    def test_invalid_targets_never_matched(self, rng):
        from threecrate_tpu.kernels.icp_pallas import icp_match_tiles
        ns = 128
        src = rng.normal(0, 1, (ns, 3)).astype(np.float32)
        tgt = rng.normal(0, 1, (512, 3)).astype(np.float32)
        valid = np.zeros(512); valid[:100] = 1
        out = np.asarray(icp_match_tiles(
            self._pack_src(src, np.ones(ns)),
            self._pack_tgt(tgt, valid),
            jnp.zeros(1, jnp.int32), tile=128, w_tiles=4, interpret=True))
        d2 = ((src[:, None] - tgt[None, :100]) ** 2).sum(-1)
        ref = tgt[:100][np.argmin(d2, axis=1)]
        np.testing.assert_allclose(out[0:3].T, ref, atol=1e-6)

    def test_all_invalid_window_flags_no_match(self, rng):
        from threecrate_tpu.kernels.icp_pallas import icp_match_tiles
        ns = 128
        src = rng.normal(0, 1, (ns, 3)).astype(np.float32)
        tgt = rng.normal(0, 1, (512, 3)).astype(np.float32)
        out = np.asarray(icp_match_tiles(
            self._pack_src(src, np.ones(ns)),
            self._pack_tgt(tgt, np.zeros(512)),
            jnp.zeros(1, jnp.int32), tile=128, w_tiles=4, interpret=True))
        assert (out[3] < 0.5).all()

    def test_exact_ties_average(self):
        from threecrate_tpu.kernels.icp_pallas import icp_match_tiles
        ns = 128
        src = np.zeros((ns, 3), np.float32)
        tgt = np.zeros((512, 3), np.float32)
        tgt[:] = [5, 0, 0]
        tgt[0] = [1, 0, 0]
        tgt[1] = [-1, 0, 0]            # two exact-tie nearest points
        out = np.asarray(icp_match_tiles(
            self._pack_src(src, np.ones(ns)),
            self._pack_tgt(tgt, np.ones(512)),
            jnp.zeros(1, jnp.int32), tile=128, w_tiles=4, interpret=True))
        np.testing.assert_allclose(out[0:3].T,
                                   np.zeros((ns, 3)), atol=1e-6)

    def test_window_offsets_respected(self, rng):
        """Each source tile must search ONLY its window: put the true
        match in tile 3 of the target and point the window there."""
        from threecrate_tpu.kernels.icp_pallas import icp_match_tiles
        ns = 128
        # well-separated sources (spacing 1 >> the 0.01 shift), so each
        # point's nearest target is unambiguously its own copy
        src = np.stack([np.arange(ns), np.zeros(ns), np.zeros(ns)],
                       -1).astype(np.float32)
        tgt = np.full((1024, 3), 1e6, np.float32)
        tgt[3 * 128:4 * 128] = src + 0.01       # matches live in tile 3
        out = np.asarray(icp_match_tiles(
            self._pack_src(src, np.ones(ns)),
            self._pack_tgt(tgt, np.ones(1024)),
            jnp.full((1,), 2, jnp.int32), tile=128, w_tiles=4,
            interpret=True))
        np.testing.assert_allclose(out[0:3].T, src + 0.01, atol=1e-5)


class TestBandBoundFewerThanK:
    """Advisor r2 (low): a query with fewer than k valid band candidates
    used to keep hi=inf, and `d2v <= hi` then selected INVALID padding
    candidates (inf <= inf) — garbage covariance with an inflated count
    that passed the cnt>=3 gate. The clamp in _band_bound must keep the
    count at the true valid-candidate count."""

    def test_band_kernel_count_not_inflated(self):
        n, k = 256, 5
        pts = np.zeros((n, 3), np.float32)
        pts[0] = [0, 0, 0]
        pts[1] = [0.1, 0, 0]
        pts[2:] = 1e6                      # padding garbage coordinates
        valid = np.zeros(n)
        valid[:2] = 1
        t = jnp.asarray(pts.T)
        v = jnp.asarray(valid, jnp.float32)[None, :]
        mom = window_normals_tiles(t, v, k, tile=128, interpret=True,
                                   band=8)
        cnt = np.asarray(mom[4, :2])
        # both valid queries see exactly the 2 valid candidates
        np.testing.assert_array_equal(cnt, [2.0, 2.0])
