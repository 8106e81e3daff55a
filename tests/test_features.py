"""Feature descriptor + global registration tests.

Reference patterns: synthetic plane clouds for FPFH (benches/fpfh.rs
fixtures), descriptor-similarity assertions, full-pipeline transform
recovery."""

import numpy as np
import pytest

from threecrate_tpu import PointCloud, Transform
from threecrate_tpu.ops import features, global_registration, normals


def bumpy_surface(n=800, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    z = 0.5 * np.sin(xy[:, 0] * 2.5) * np.cos(xy[:, 1] * 1.5)
    return np.stack([xy[:, 0], xy[:, 1], z], -1).astype(np.float32)


def with_normals(pts, k=10):
    pc = PointCloud.from_numpy(pts)
    return normals.estimate_normals(pc, k=k)


class TestFpfh:
    def test_shape_and_normalisation(self):
        pc = with_normals(bumpy_surface())
        res = features.extract_fpfh_features_with_normals(
            pc, features.FpfhConfig(radius=0.5))
        d = np.asarray(res.descriptors)
        v = np.asarray(res.valid)
        assert d.shape[1] == features.FPFH_DIM
        assert v.sum() > 700
        # each 11-bin block sums to ~100
        for b in range(3):
            block = d[v][:, b * 11:(b + 1) * 11].sum(1)
            np.testing.assert_allclose(block, 100.0, atol=1e-2)

    def test_requires_normals(self):
        from threecrate_tpu.core.errors import InvalidDataError
        pc = PointCloud.from_numpy(bumpy_surface(100))
        with pytest.raises(InvalidDataError):
            features.extract_fpfh_features_with_normals(pc)

    def test_rotation_invariance(self):
        """FPFH is built on a Darboux frame → invariant to rigid motion."""
        pts = bumpy_surface(600, seed=1)
        t = Transform.from_axis_angle([0.2, 0.5, 1.0], 0.8) @ \
            Transform.from_translation([3.0, -2.0, 1.0])
        pts2 = pts @ np.asarray(t.matrix)[:3, :3].T + np.asarray(t.matrix)[:3, 3]
        r1 = features.extract_fpfh_features(
            PointCloud.from_numpy(pts), features.FpfhConfig(radius=0.5))
        r2 = features.extract_fpfh_features(
            PointCloud.from_numpy(pts2.astype(np.float32)),
            features.FpfhConfig(radius=0.5))
        d1, d2 = np.asarray(r1.descriptors), np.asarray(r2.descriptors)
        v = np.asarray(r1.valid) & np.asarray(r2.valid)
        err = np.abs(d1[v] - d2[v]).mean()
        assert err < 5.0  # small numerical drift only

    def test_flat_plane_concentrated_bins(self):
        """On a perfect plane all pair angles are identical → histograms
        concentrate (high max bin)."""
        xs, ys = np.meshgrid(np.linspace(0, 1, 20), np.linspace(0, 1, 20))
        pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(400)], -1
                       ).astype(np.float32)
        pc = with_normals(pts)
        res = features.extract_fpfh_features_with_normals(
            pc, features.FpfhConfig(radius=0.2))
        d = np.asarray(res.descriptors)[np.asarray(res.valid)]
        # α and φ blocks should be highly peaked on a plane
        assert d[:, 11:22].max(1).mean() > 60
        assert d[:, 22:33].max(1).mean() > 60


class TestShot:
    def test_shape_and_unit_norm(self):
        pc = with_normals(bumpy_surface())
        res = features.extract_shot_features(
            pc, features.ShotConfig(radius=0.6))
        d = np.asarray(res.descriptors)
        v = np.asarray(res.valid)
        assert d.shape[1] == features.SHOT_DIM
        np.testing.assert_allclose(np.linalg.norm(d[v], axis=1), 1.0,
                                   atol=1e-4)

    def test_usc_shape(self):
        pc = PointCloud.from_numpy(bumpy_surface())
        res = features.extract_usc_features(
            pc, features.ShotConfig(radius=0.6))
        d = np.asarray(res.descriptors)
        assert d.shape[1] == features.USC_DIM
        assert np.asarray(res.valid).sum() > 700

    def test_shot_discriminates(self):
        """Points from flat vs curved regions get different descriptors."""
        pc = with_normals(bumpy_surface(1000, seed=2))
        res = features.extract_shot_features(
            pc, features.ShotConfig(radius=0.6))
        d = np.asarray(res.descriptors)[np.asarray(res.valid)]
        assert d.std(0).sum() > 0.1


class TestMatching:
    def test_identity_match(self):
        pc = with_normals(bumpy_surface(400))
        res = features.extract_fpfh_features_with_normals(
            pc, features.FpfhConfig(radius=0.5))
        j, dist, ok = features.match_descriptors(
            res.descriptors, res.valid, res.descriptors, res.valid)
        jj = np.asarray(j)[np.asarray(ok)]
        expect = np.arange(pc.capacity)[np.asarray(ok)]
        assert (jj == expect).mean() > 0.95


class TestGlobalRegistration:
    def test_recovers_large_transform(self):
        pts = bumpy_surface(700, seed=4)
        t_true = Transform.from_axis_angle([0, 0, 1.0], 0.6) @ \
            Transform.from_translation([1.5, -0.8, 0.4])
        tgt = pts @ np.asarray(t_true.matrix)[:3, :3].T \
            + np.asarray(t_true.matrix)[:3, 3]
        cfg = global_registration.GlobalRegistrationConfig(
            ransac_iterations=8192, fpfh_radius=0.5,
            distance_threshold=0.05, refine_with_icp=True)
        res = global_registration.global_registration(
            PointCloud.from_numpy(pts),
            PointCloud.from_numpy(tgt.astype(np.float32)), cfg)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.asarray(t_true.matrix), atol=0.05)

    def test_too_few_correspondences_rejected(self):
        from threecrate_tpu.core.errors import InvalidDataError
        pts = bumpy_surface(20)
        pc1 = with_normals(pts, k=5)
        import jax.numpy as jnp
        # invalidate all target descriptors
        res = features.extract_fpfh_features_with_normals(
            pc1, features.FpfhConfig(radius=0.5))
        cfg = global_registration.GlobalRegistrationConfig(
            ransac_iterations=64)
        with pytest.raises(InvalidDataError):
            global_registration.global_registration_with_features(
                pc1, pc1, res.descriptors, res.valid,
                res.descriptors, jnp.zeros_like(res.valid), cfg)


class TestFusedFpfh:
    def test_fused_matches_staged_window(self):
        """The fully-fused pallas FPFH must reproduce the id-staged
        window formulation (same windows, same Darboux binning)."""
        import jax.numpy as jnp
        from threecrate_tpu.ops import features
        rng = np.random.default_rng(0)
        n = 2000
        xy = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
        z = 0.3 * np.sin(xy[:, 0] * 2) + 0.2 * np.cos(xy[:, 1] * 1.5)
        pts = np.stack([xy[:, 0], xy[:, 1], z], -1).astype(np.float32)
        nrm = np.zeros((n, 3), np.float32)
        nrm[:, 2] = 1.0
        nrm[:, 0] = 0.2 * np.sin(xy[:, 0])
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        pj, mj, nj = jnp.asarray(pts), jnp.ones(n, bool), jnp.asarray(nrm)
        d_f, v_f = features._fpfh_fused(pj, mj, nj, 0.3, tile=128)
        d_s, v_s = features._fpfh(pj, mj, nj, jnp.float32(0.3), 64, 11,
                                  True)
        vb = np.asarray(v_f) & np.asarray(v_s)
        assert vb.mean() > 0.99
        l1 = np.abs(np.asarray(d_f)[vb] - np.asarray(d_s)[vb]).sum(1)
        # descriptors sum to 300; the atan2 polynomial and all-in-radius
        # vs capped-k differences stay at noise level on this density
        assert np.percentile(l1, 95) < 1.0, np.percentile(l1, 95)

    def test_banded_matches_exact_fused(self):
        """The ±band SPFH fast tier must match the exact full-window
        fused path when neighborhoods fit the band (FpfhConfig.band)."""
        import jax.numpy as jnp
        from threecrate_tpu.ops import features
        rng = np.random.default_rng(3)
        n = 4096
        xy = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
        z = 0.4 * np.sin(xy[:, 0] * 2) + 0.3 * np.cos(xy[:, 1] * 1.7)
        pts = np.stack([xy[:, 0], xy[:, 1], z], -1).astype(np.float32)
        pj, mj = jnp.asarray(pts), jnp.ones(n, bool)
        from threecrate_tpu.ops.normals import (NormalEstimationConfig,
                                                estimate_normals_detailed)
        from threecrate_tpu.core.point_cloud import PointCloud
        nr = estimate_normals_detailed(
            PointCloud(points=pj, mask=mj),
            NormalEstimationConfig(k_neighbors=10))
        d_ex, v_ex = features._fpfh_fused(pj, mj, nr.normals, 0.12)
        d_b, v_b = features._fpfh_fused(pj, mj, nr.normals, 0.12,
                                        band=48)
        v = np.asarray(v_ex) & np.asarray(v_b)
        assert v.mean() > 0.9
        de, db = np.asarray(d_ex)[v], np.asarray(d_b)[v]
        cos = np.sum(de * db, 1) / np.maximum(
            np.linalg.norm(de, axis=1) * np.linalg.norm(db, axis=1),
            1e-12)
        # ~10 in-radius neighbors vs a 2*(2*48+1) candidate union:
        # the band covers every neighborhood -> identical descriptors
        assert np.median(cos) > 0.9999, np.median(cos)
        assert (cos > 0.99).mean() > 0.99, (cos > 0.99).mean()

    def test_auto_band_resolution(self):
        """band="auto" (the default) picks the smallest ladder rung
        whose candidate capacity covers the measured in-radius count
        with a 2x margin, and stays exact (None) past the ladder or
        under jit."""
        import jax
        import jax.numpy as jnp
        from threecrate_tpu.ops import features
        rng = np.random.default_rng(7)
        n = 4096
        pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                        rng.normal(0, 0.01, n)], -1).astype(np.float32)
        pj, mj = jnp.asarray(pts), jnp.ones(n, bool)
        # density 4096/16 = 256 pts/unit² -> pi*r²*256 in-radius
        est = features.expected_in_radius_count(pj, mj, 0.12)
        expect = np.pi * 0.12 ** 2 * 256
        assert 0.5 * expect < est < 2.0 * expect, (est, expect)
        b = features._resolve_fpfh_band("auto", pj, mj, 0.12)
        assert b == 16, b          # est ~11.6 -> rung 16 (capacity 66)
        # a radius whose neighborhood outgrows every rung -> exact
        assert features._resolve_fpfh_band("auto", pj, mj, 1.0) is None
        # explicit values pass through untouched
        assert features._resolve_fpfh_band(None, pj, mj, 0.12) is None
        assert features._resolve_fpfh_band(48, pj, mj, 0.12) == 48
        # under jit nothing is measurable -> exact

        def probe(p):
            return features._resolve_fpfh_band("auto", p, mj, 0.12)
        got = []
        jax.make_jaxpr(lambda p: (got.append(probe(p)), p * 0)[1])(pj)
        assert got == [None]

    def test_auto_band_cross_view_matching(self):
        """Density-matched auto band must keep descriptors matchable
        ACROSS a rotated view (the r4 caveat: banding is Morton-order-
        dependent once neighborhoods outgrow the band — the auto
        margin is what rules that regime out)."""
        import jax.numpy as jnp
        from threecrate_tpu.ops import features
        rng = np.random.default_rng(11)
        n = 4096
        xy = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
        z = 0.4 * np.sin(xy[:, 0] * 2) + 0.3 * np.cos(xy[:, 1] * 1.7)
        pts = np.stack([xy[:, 0], xy[:, 1], z], -1).astype(np.float32)
        pc_a = with_normals(pts)
        # rigidly rotated view: same points + normals in a frame that
        # scrambles the Morton order (the banding failure mode)
        c, s = np.cos(0.7), np.sin(0.7)
        rot = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]],
                         np.float32) @ \
            np.asarray([[1, 0, 0],
                        [0, np.cos(0.4), -np.sin(0.4)],
                        [0, np.sin(0.4), np.cos(0.4)]], np.float32)
        pc_b = PointCloud.from_numpy(pts @ rot.T).with_normals(
            jnp.asarray(np.asarray(pc_a.normals) @ rot.T))
        cfg = features.FpfhConfig(radius=0.2, method="window")
        # the default auto band must actually engage at this density
        assert features._resolve_fpfh_band(
            cfg.band, pc_a.points, pc_a.mask, cfg.radius) is not None
        res_a = features.extract_fpfh_features_with_normals(pc_a, cfg)
        res_b = features.extract_fpfh_features_with_normals(pc_b, cfg)
        cfg_ex = features.FpfhConfig(radius=0.2, method="window",
                                     band=None)
        ex_a = features.extract_fpfh_features_with_normals(pc_a, cfg_ex)
        ex_b = features.extract_fpfh_features_with_normals(pc_b, cfg_ex)

        def med_cos(ra, rb):
            v = np.asarray(ra.valid) & np.asarray(rb.valid)
            da, db = np.asarray(ra.descriptors)[v], \
                np.asarray(rb.descriptors)[v]
            cos = np.sum(da * db, 1) / np.maximum(
                np.linalg.norm(da, axis=1) * np.linalg.norm(db, axis=1),
                1e-12)
            return np.median(cos)

        m_band, m_exact = med_cos(res_a, res_b), med_cos(ex_a, ex_b)
        # corresponding points keep near-identical descriptors across
        # the rotation, and banding at the auto margin costs nothing
        # measurable vs the exact full window
        assert m_band > 0.97, (m_band, m_exact)
        assert m_band > m_exact - 0.02, (m_band, m_exact)

    def test_banded_config_routes(self):
        from threecrate_tpu.ops import features
        rng = np.random.default_rng(4)
        pts = rng.uniform(-1, 1, (600, 3)).astype(np.float32)
        import jax.numpy as jnp
        from threecrate_tpu.core.point_cloud import PointCloud
        cloud = PointCloud(points=jnp.asarray(pts),
                           mask=jnp.ones(600, bool))
        res = features.extract_fpfh_features(
            cloud, features.FpfhConfig(radius=0.3, method="window",
                                       band=32))
        assert res.descriptors.shape == (600, 33)
        assert bool(jnp.any(res.valid))

    def test_atan2_approx_accuracy(self):
        from threecrate_tpu.kernels.fpfh_pallas import _atan2_approx
        import jax.numpy as jnp
        rng = np.random.default_rng(1)
        y = rng.normal(0, 2, 5000).astype(np.float32)
        x = rng.normal(0, 2, 5000).astype(np.float32)
        got = np.asarray(_atan2_approx(jnp.asarray(y), jnp.asarray(x)))
        ref = np.arctan2(y, x)
        assert np.abs(got - ref).max() < 6e-3

    def test_fused_empty_radius_invalidates(self):
        """Radius smaller than any spacing: no neighbors, invalid."""
        import jax.numpy as jnp
        from threecrate_tpu.ops import features
        pts = np.stack([np.arange(300, dtype=np.float32),
                        np.zeros(300, np.float32),
                        np.zeros(300, np.float32)], -1)
        nrm = np.zeros((300, 3), np.float32); nrm[:, 2] = 1
        d, v = features._fpfh_fused(jnp.asarray(pts), jnp.ones(300, bool),
                                    jnp.asarray(nrm), 0.01, tile=128)
        assert not np.asarray(v).any()
        assert np.abs(np.asarray(d)).max() == 0

    def test_fused_masked_rows_excluded(self):
        import jax.numpy as jnp
        from threecrate_tpu.ops import features
        rng = np.random.default_rng(2)
        pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        nrm = np.zeros((500, 3), np.float32); nrm[:, 2] = 1
        mask = np.ones(500, bool); mask[400:] = False
        pts[400:] = 0.0                       # garbage coincident points
        d, v = features._fpfh_fused(jnp.asarray(pts), jnp.asarray(mask),
                                    jnp.asarray(nrm), 0.5, tile=128)
        v = np.asarray(v)
        assert not v[400:].any()
        assert v[:400].mean() > 0.95


class TestShotFused:
    """Fused band-window SHOT (kernels/shot_pallas.py) vs the staged
    path. The fused candidate set is the union of two ±band Morton
    windows; on fixtures whose in-radius neighborhoods sit inside the
    windows the two paths see the same neighbors and must agree up to
    f32 order and the kernel's polynomial atan2. A MINORITY of points
    (8-19% depending on geometry) differ by exactly an LRF sign flip:
    the x/z sign disambiguation is sign(Σd·axis), and on displacement-
    symmetric neighborhoods that sum is ~0 — f32 noise picks the sign,
    and any candidate-set difference flips it (PCL's majority-vote
    disambiguation has the same instability). The contract is
    therefore: median cosine similarity ~1 (sign-stable points match
    EXACTLY), with a bounded ambiguous minority."""

    @staticmethod
    def _fused(pts, radius, variant="shot", nrm=None, band=32):
        import jax.numpy as jnp
        pc = PointCloud.from_numpy(pts)
        if variant == "shot":
            pc = normals.estimate_normals(pc, k=10)
            nrm_arr = pc.normals
        else:
            nrm_arr = jnp.zeros_like(pc.points)
        desc, valid = features._shot_fused(
            pc.points, pc.mask, nrm_arr, radius, variant,
            band=band, tile=128)
        return pc, np.asarray(desc), np.asarray(valid)

    def test_shape_unit_norm_valid(self):
        pts = bumpy_surface(700, seed=5)
        pc, d, v = self._fused(pts, 0.6)
        assert d.shape == (pc.capacity, features.SHOT_DIM)
        assert v.sum() > 600
        np.testing.assert_allclose(np.linalg.norm(d[v], axis=1), 1.0,
                                   atol=1e-4)

    def test_parity_vs_staged_line_fixture(self):
        """Noisy helix: Morton order ~ curve order, so the ±band
        windows contain every in-radius neighbor — near-exact parity
        expected."""
        rng = np.random.default_rng(7)
        t = np.sort(rng.uniform(0, 20, 600)).astype(np.float32)
        pts = np.stack([np.cos(t), np.sin(t), 0.15 * t], -1)
        pts = (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
        pc = normals.estimate_normals(PointCloud.from_numpy(pts), k=10)
        d_f, v_f = features._shot_fused(
            pc.points, pc.mask, pc.normals, 0.35, "shot",
            band=32, tile=128)
        d_s, v_s = features._shot(
            pc.points, pc.mask, pc.normals, np.float32(0.35), 128, 11,
            "shot", False)
        d_f, v_f = np.asarray(d_f), np.asarray(v_f)
        d_s, v_s = np.asarray(d_s), np.asarray(v_s)
        both = v_f & v_s
        assert both.sum() > 500
        cos = np.sum(d_f[both] * d_s[both], axis=1)
        assert np.median(cos) > 0.999
        assert np.mean(cos) > 0.9
        assert np.mean(cos > 0.97) > 0.85

    def test_parity_vs_staged_surface(self):
        """2D surface: window misses allowed, but the bulk must agree.
        At this density (~40 in-radius neighbors at r=0.5) the ±band
        union covers most but not all of each neighborhood, so beyond
        the sign-flip minority there is a small capped-neighborhood
        divergence (the staged path's max_neighbors cap has the same
        character) — thresholds are set accordingly."""
        pts = bumpy_surface(900, seed=8)
        pc = normals.estimate_normals(PointCloud.from_numpy(pts), k=10)
        d_f, v_f = features._shot_fused(
            pc.points, pc.mask, pc.normals, 0.5, "shot",
            band=32, tile=128)
        d_s, v_s = features._shot(
            pc.points, pc.mask, pc.normals, np.float32(0.5), 128, 11,
            "shot", False)
        d_f, v_f = np.asarray(d_f), np.asarray(v_f)
        d_s, v_s = np.asarray(d_s), np.asarray(v_s)
        both = v_f & v_s
        assert both.sum() > 700
        cos = np.sum(d_f[both] * d_s[both], axis=1)
        # measured at this density: median ~0.94, mean ~0.80,
        # frac(>0.85) ~0.66 — the tail is the LRF sign-flip minority
        # plus capped-neighborhood divergence (band union covers ~most
        # of the ~44 in-radius neighbors)
        assert np.median(cos) > 0.9
        assert np.mean(cos) > 0.72

    def test_usc_fused(self):
        pts = bumpy_surface(700, seed=9)
        pc, d, v = self._fused(pts, 0.6, variant="usc")
        assert d.shape[1] == features.USC_DIM
        assert v.sum() > 600
        d_v = d[v]
        assert d_v.std(0).sum() > 0.05

    def test_fused_is_window_default(self):
        """method='window' routes through the fused path at 11 bins."""
        pts = bumpy_surface(600, seed=10)
        pc = normals.estimate_normals(PointCloud.from_numpy(pts), k=10)
        res = features.extract_shot_features(
            pc, features.ShotConfig(radius=0.6, method="window"))
        assert np.asarray(res.valid).sum() > 500


class TestFpfhSoftBinning:
    def test_soft_binning_close_to_hard(self):
        """PCL-style quadrilinear binning (opt-in; the reference
        hard-bins, features.rs:109-113): same shape/normalisation,
        high similarity to the hard default, measurably smoothed."""
        pc = with_normals(bumpy_surface(500, seed=12))
        hard = features.extract_fpfh_features_with_normals(
            pc, features.FpfhConfig(radius=0.5))
        soft = features.extract_fpfh_features_with_normals(
            pc, features.FpfhConfig(radius=0.5, soft_binning=True))
        dh = np.asarray(hard.descriptors)
        ds = np.asarray(soft.descriptors)
        v = np.asarray(hard.valid) & np.asarray(soft.valid)
        for b in range(3):
            np.testing.assert_allclose(
                ds[v][:, b * 11:(b + 1) * 11].sum(1), 100.0, atol=1e-2)
        ch = dh[v] / np.maximum(np.linalg.norm(dh[v], axis=1,
                                               keepdims=True), 1e-9)
        cs = ds[v] / np.maximum(np.linalg.norm(ds[v], axis=1,
                                               keepdims=True), 1e-9)
        cos = np.sum(ch * cs, axis=1)
        assert np.mean(cos) > 0.95
        assert not np.allclose(dh[v], ds[v])


class TestLrfWeightedVote:
    """The LRF sign vote is (R−d)-weighted: radius-boundary candidates
    — exactly the ones that churn between candidate sets — carry ~0
    influence, so dropping them must (almost) never flip the frame."""

    def test_boundary_dropout_sign_stability(self):
        rng = np.random.default_rng(3)
        pts = bumpy_surface(600, seed=3)
        pc = PointCloud.from_numpy(pts)
        radius = np.float32(0.5)
        from threecrate_tpu.ops import neighbors
        res = neighbors.radius_neighbors(pc.points, pc.mask, pc.points,
                                         pc.mask, radius, 64,
                                         exclude_self=True)
        idx, ok, dist = res.indices, res.mask, res.distances
        x0, y0, z0 = features._shot_lrf(pc.points[idx], ok, dist, radius,
                                        pc.points)
        # drop candidates in the outer 10% shell
        ok2 = ok & (np.asarray(dist) < 0.9 * radius)
        x1, y1, z1 = features._shot_lrf(pc.points[idx], ok2, dist, radius,
                                        pc.points)
        n = pc.size()
        zdot = np.sum(np.asarray(z0)[:n] * np.asarray(z1)[:n], axis=1)
        cnt = np.asarray(ok.sum(axis=1))[:n]
        well = cnt >= 10
        # sign flips (zdot < 0) must be rare among well-supported
        # queries. The r4 ambiguous-vote tie-break (Σw·d·|d|² when no
        # normals are supplied) is deliberately far-weighted, so the
        # dropped shell CAN flip tie-broken points — the bound covers
        # the primary (R−d)-weighted vote plus that small minority.
        assert (zdot[well] < 0).mean() < 0.04

    def test_boundary_dropout_with_normals_near_zero_flips(self):
        """With query normals supplied (the recommended / SHOT-pipeline
        path), the ambiguous-z tie-break aligns with the normal — which
        is identical across candidate sets — so boundary dropout flips
        must be (almost) nonexistent."""
        pts = bumpy_surface(600, seed=3)
        pc = with_normals(pts)
        radius = np.float32(0.5)
        from threecrate_tpu.ops import neighbors
        res = neighbors.radius_neighbors(pc.points, pc.mask, pc.points,
                                         pc.mask, radius, 64,
                                         exclude_self=True)
        idx, ok, dist = res.indices, res.mask, res.distances
        nrm = pc.normals
        x0, y0, z0 = features._shot_lrf(pc.points[idx], ok, dist,
                                        radius, pc.points,
                                        own_normals=nrm)
        ok2 = ok & (np.asarray(dist) < 0.9 * radius)
        x1, y1, z1 = features._shot_lrf(pc.points[idx], ok2, dist,
                                        radius, pc.points,
                                        own_normals=nrm)
        n = pc.size()
        zdot = np.sum(np.asarray(z0)[:n] * np.asarray(z1)[:n], axis=1)
        cnt = np.asarray(ok.sum(axis=1))[:n]
        well = cnt >= 10
        assert (zdot[well] < 0).mean() < 0.005


class TestShotRepeatability:
    """VERDICT r3 item 3: descriptor repeatability across two
    independently sampled + noised + rigidly rotated views of the same
    surface — the thing SHOT exists for. Measures (a) the z-axis sign
    flip rate of the LRF (the r3 flip minority lived here: planar
    neighborhoods make the displacement vote pure noise; the normal
    tie-break fixes them), and (b) the fraction of descriptor pairs
    explained by a sign flip (an x/z flip permutes bins by a FIXED
    permutation, so it is detectable in descriptor space)."""

    @staticmethod
    def _two_views(n=1800, seed=0):
        rng = np.random.default_rng(seed)
        xy_a = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
        xy_b = xy_a + rng.normal(0, 0.01, (n, 2)).astype(np.float32)

        def surf(xy):
            z = 0.5 * np.sin(xy[:, 0] * 2.5) * np.cos(xy[:, 1] * 1.5)
            return np.stack([xy[:, 0], xy[:, 1], z], -1).astype(
                np.float32)

        pa = surf(xy_a) + rng.normal(0, 0.003, (n, 3)).astype(np.float32)
        pb = surf(xy_b) + rng.normal(0, 0.003, (n, 3)).astype(np.float32)
        ang = 0.7
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0],
                      [0, 0, 1]], np.float32)
        R2 = np.array([[1, 0, 0],
                       [0, np.cos(0.4), -np.sin(0.4)],
                       [0, np.sin(0.4), np.cos(0.4)]], np.float32)
        R = (R2 @ R).astype(np.float32)
        t_vec = np.array([1.0, -2.0, 0.5], np.float32)
        pb_r = (pb @ R.T + t_vec)
        interior = (np.abs(pa[:, 0]) < 1.5) & (np.abs(pa[:, 1]) < 1.5)
        # per-view sensor viewpoints, rigidly consistent: the normal
        # orientation convention (and through it SHOT's z tie-break)
        # is only repeatable across views when the viewpoints
        # correspond — in real pipelines that is the sensor origin,
        # which IS known per scan. (default_viewpoint is scene-derived
        # and NOT rotation-equivariant; measured +9% z flips if used
        # here.)
        vp_a = np.array([0.0, 0.0, 3.0], np.float32)
        vp_b = (R @ vp_a + t_vec).astype(np.float32)
        return pa, pb_r.astype(np.float32), R, interior, vp_a, vp_b

    def test_z_axis_sign_repeatability(self):
        import jax.numpy as jnp
        from threecrate_tpu.ops import neighbors
        pa, pb, R, interior, vp_a, vp_b = self._two_views()
        n = len(pa)
        rad = 0.35
        ca = normals.estimate_normals(PointCloud.from_numpy(pa), k=10,
                                      viewpoint=tuple(vp_a))
        cb = normals.estimate_normals(PointCloud.from_numpy(pb), k=10,
                                      viewpoint=tuple(vp_b))

        def lrf(pc):
            res = neighbors.radius_neighbors(
                pc.points, pc.mask, pc.points, pc.mask, rad, 128,
                exclude_self=True)
            x, y, z = features._shot_lrf(
                pc.points[res.indices], res.mask, res.distances,
                jnp.float32(rad), pc.points, own_normals=pc.normals)
            return np.asarray(x)[:n], np.asarray(z)[:n]

        xa, za = lrf(ca)
        xb, zb = lrf(cb)
        dz = np.sum(za * (zb @ R), axis=1)[interior]
        # axes themselves must agree (not just up to sign)...
        assert np.median(np.abs(dz)) > 0.99
        # ...and the z SIGN must be stable (r3: ~10% flips; the normal
        # tie-break takes it under 2%)
        assert np.mean(dz < 0) < 0.02

    def test_descriptor_flip_minority(self):
        pa, pb, R, interior, vp_a, vp_b = self._two_views()
        n = len(pa)
        rad = 0.35
        ca = normals.estimate_normals(PointCloud.from_numpy(pa), k=10,
                                      viewpoint=tuple(vp_a))
        cb = normals.estimate_normals(PointCloud.from_numpy(pb), k=10,
                                      viewpoint=tuple(vp_b))
        da, va = features._shot(ca.points, ca.mask, ca.normals,
                                np.float32(rad), 128, 11, "shot", False)
        db, vb = features._shot(cb.points, cb.mask, cb.normals,
                                np.float32(rad), 128, 11, "shot", False)
        da, va = np.asarray(da)[:n], np.asarray(va)[:n]
        db, vb = np.asarray(db)[:n], np.asarray(vb)[:n]
        sel = va & vb & interior
        A, B = da[sel], db[sel]
        base = np.sum(A * B, axis=1)
        # x-flip permutation: azimuth sector k -> (k+4) % 8
        az = (np.arange(features.SHOT_DIM) // 11) // 4
        perm = np.arange(features.SHOT_DIM) + \
            np.where(az < 4, 4, -4) * 44
        flip_cos = np.sum(A * B[:, perm], axis=1)
        # a flip signature = the flipped alignment rescues a bad match.
        # Measured r4 on this fixture: 3.9% — all residual x flips on
        # near-symmetric neighborhoods, where EVERY available odd
        # statistic sits at its sampling-noise floor (sweep: weighted
        # vote 3.9%, |d|²-amplified vote ~same, descriptor
        # canonicalization 5.2-10.2% — worse). The r3 z-flip class
        # (~9% of points, planar neighborhoods) is gone: the z
        # tie-break moved overall frac(cos>0.7) from 0.818 to 0.907.
        flipped = (base < 0.7) & (flip_cos > 0.7)
        assert np.mean(flipped) < 0.05
        # overall repeatability: the bulk must match outright (the
        # non-flip tail is 352-bin quantization noise at ~60 samples)
        assert np.median(base) > 0.85
        assert np.mean(base > 0.7) > 0.85
