"""Generalized-ICP (Segal et al. 2009), plane-to-plane.

TPU-native rework of threecrate-algorithms/src/gicp.rs: per-point
covariances from k-NN neighborhoods (gicp.rs:60-97), degenerate-cloud
rejection (gicp.rs:148-167), and Gauss-Newton over the combined
covariance metric ``M = C_t + R C_s Rᵀ`` with Jacobian ``[−skew(Ts)|I]``
(gicp.rs:180-240). All per-point 3×3 algebra (covariance, inverse via
adjugate) is batched closed-form VPU math; the 6×6 normal equations
accumulate as einsums; the Gauss-Newton loop is one ``lax.while_loop``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.errors import AlgorithmError, InvalidDataError
from ..core.point_cloud import PointCloud
from ..core.transform import Transform, se3_exp, skew
from . import linalg, neighbors
from .registration import ICPResult


@dataclasses.dataclass(frozen=True)
class GicpConfig:
    """Mirrors GicpConfig defaults (gicp.rs:25-45).

    ``method``: "exact" | "window" | "auto" — neighbor search for both
    the per-point covariances and the in-loop correspondences (window =
    the Morton fast path above ~180k-point clouds).
    """

    max_iterations: int = 50
    max_correspondence_distance: float = 1.0
    convergence_threshold: float = 1e-6
    k_correspondences: int = 20
    covariance_epsilon: float = 1e-4
    method: str = "auto"
    # Window width of the static-sort correspondence, in 128-pt target
    # tiles; None = registration.auto_w_tiles (3 at equal capacity).
    # Raise manually (6+) for clouds with large LOCAL density contrast
    # (e.g. a dense cluster inside a sparse field): a sparse tile's
    # true neighbors can span many target tiles there, and GICP's
    # plane-to-plane weighting is less forgiving of the resulting
    # misses than point-to-point ICP (measured: 100x contrast diverges
    # at w=3/4, exact at w=6 — tests/test_registration.py
    # TestGicpAdversarialCovariances). A non-converged result
    # (converged=False) is the fallback signal: retry with larger
    # w_tiles or method="exact".
    w_tiles: Optional[int] = None
    # Coarse-phase source tile stride (registration.auto_subsample
    # semantics; None = auto — 8 at >=800k, 4 at >=200k, 2 at >=50k).
    # All but the last ``full_iters`` Gauss-Newton iterations match a
    # strided source; the final iterations refit at full resolution.
    subsample: Optional[int] = None
    full_iters: int = 2


def inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        jnp.stack([co_a, -(b * i - c * h), b * f - c * e], -1),
        jnp.stack([co_b, a * i - c * g, -(a * f - c * d)], -1),
        jnp.stack([co_c, -(a * h - b * g), a * e - b * d], -1),
    ], -2)
    return adj * inv_det[..., None, None]


@functools.partial(jax.jit, static_argnames=("k", "window"))
def point_covariances(points, mask, k, epsilon, window=False):
    """Per-point k-NN covariances, +ε·I regularised (gicp.rs:60-97).

    The window path rides the fused 2-window UNION moments pipeline
    (normals._union_window_sums): the pallas kernels emit each point's
    neighborhood covariance sums directly, so no (N, k) neighbor ids or
    gathers exist — ~2x the generic id-producing knn_window path this
    replaces (which cost ~264 ms per 1M cloud)."""
    if window:
        from .normals import _cov_from_sums, _union_window_sums
        n = points.shape[0]
        s, _, am, perm_a = _union_window_sums(points, mask, k)
        cov_s, cnt = _cov_from_sums(s)
        # restore original row order with an inverse-permutation row
        # gather of the 6 unique covariance columns + count
        cols = jnp.stack([cov_s[:, 0, 0], cov_s[:, 1, 1], cov_s[:, 2, 2],
                          cov_s[:, 0, 1], cov_s[:, 0, 2], cov_s[:, 1, 2],
                          cnt], axis=1)
        iota = jnp.arange(perm_a.shape[0], dtype=jnp.int32)
        _, inv_a = jax.lax.sort((perm_a, iota), num_keys=1)
        cols = cols[inv_a][:n]
        cov = _cols_to_cov(cols[:, :6])
        cov = cov + epsilon * jnp.eye(3, dtype=cov.dtype)
        enough = cols[:, 6] >= 4  # k≥4 for a stable covariance
        return cov, mask & enough
    res = neighbors.knn(points, mask, points, mask, k)
    nbr = points[res.indices]
    w = res.mask.astype(jnp.float32)
    _, cov = linalg.weighted_covariance(nbr, w)
    cov = cov + epsilon * jnp.eye(3, dtype=cov.dtype)
    enough = jnp.sum(res.mask, axis=1) >= 4  # k≥4 for a stable covariance
    return cov, mask & enough


_COV6 = ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))


def _cov_to_cols(cov):
    """(N, 3, 3) symmetric → (N, 6) unique columns [xx yy zz xy xz yz]."""
    return jnp.stack([cov[:, i, j] for i, j in _COV6], axis=1)


def _cols_to_cov(cols):
    """(6, N) or (N, 6) unique columns → (N, 3, 3) symmetric."""
    if cols.shape[0] == 6:
        cols = cols.T
    xx, yy, zz, xy, xz, yz = (cols[:, i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], -1),
        jnp.stack([xy, yy, yz], -1),
        jnp.stack([xz, yz, zz], -1)], -2)


def _normal_equations(moved, r, w_mat):
    """Gauss-Newton 6x6 system Σ JᵀWJ, Σ JᵀWr for J = [−skew(m) | I],
    expanded symbolically.

    The einsum formulation materialises two (N, 3, 6) intermediates
    (72 MB each at 1M) — the xplane trace showed ~22 ms/iter of slices
    and async-copies moving them. With H's block structure
    [[−SWS, SW], [(SW)ᵀ, W]] (S = skew(m)) everything reduces to
    elementwise products of the 6 unique W columns with m and r, summed
    globally — one fused streaming pass.
    """
    a, b, c = moved[:, 0], moved[:, 1], moved[:, 2]
    w0, w1, w2 = w_mat[:, 0, 0], w_mat[:, 1, 1], w_mat[:, 2, 2]
    w3, w4, w5 = w_mat[:, 0, 1], w_mat[:, 0, 2], w_mat[:, 1, 2]
    r0, r1, r2 = r[:, 0], r[:, 1], r[:, 2]

    # B = S W  (rows of skew(m) times W)
    b00 = -c * w3 + b * w4
    b01 = -c * w1 + b * w5
    b02 = -c * w5 + b * w2
    b10 = c * w0 - a * w4
    b11 = c * w3 - a * w5
    b12 = c * w4 - a * w2
    b20 = -b * w0 + a * w3
    b21 = -b * w3 + a * w1
    b22 = -b * w4 + a * w5

    # A = −B S with S columns (0,c,−b), (−c,0,a), (b,−a,0); symmetric
    a00 = -(b01 * c - b02 * b)
    a01 = -(-b00 * c + b02 * a)
    a02 = -(b00 * b - b01 * a)
    a11 = -(-b10 * c + b12 * a)
    a12 = -(b10 * b - b11 * a)
    a22 = -(b20 * b - b21 * a)

    # g = [B r, W r]
    wr0 = w0 * r0 + w3 * r1 + w4 * r2
    wr1 = w3 * r0 + w1 * r1 + w5 * r2
    wr2 = w4 * r0 + w5 * r1 + w2 * r2
    gt0 = b00 * r0 + b01 * r1 + b02 * r2
    gt1 = b10 * r0 + b11 * r1 + b12 * r2
    gt2 = b20 * r0 + b21 * r1 + b22 * r2

    def s(x):
        return jnp.sum(x)

    h = jnp.array([
        [s(a00), s(a01), s(a02), s(b00), s(b01), s(b02)],
        [s(a01), s(a11), s(a12), s(b10), s(b11), s(b12)],
        [s(a02), s(a12), s(a22), s(b20), s(b21), s(b22)],
        [s(b00), s(b10), s(b20), s(w0), s(w3), s(w4)],
        [s(b01), s(b11), s(b21), s(w3), s(w1), s(w5)],
        [s(b02), s(b12), s(b22), s(w4), s(w5), s(w2)],
    ])
    g = jnp.array([s(gt0), s(gt1), s(gt2), s(wr0), s(wr1), s(wr2)])
    return h, g


@functools.partial(jax.jit, static_argnames=("max_iterations", "window",
                                             "w_tiles", "subsample",
                                             "full_iters"))
def _gicp_loop(src, src_mask, src_cov, tgt, tgt_mask, tgt_cov, init,
               max_iterations, conv_thresh, max_corr, window=False,
               w_tiles=3, subsample=1, full_iters=2):
    if window:
        # static-sort correspondence (see registration._static_corr_setup):
        # sorts run once; per iteration the match kernel gathers the
        # matched target's 6 covariance columns through its one-hot
        # argmin, and the source covariances ride the one-time source
        # sort — the previous formulation re-sorted the src∪tgt union
        # every iteration (333 ms/iter at 1M).
        from .registration import _static_corr_setup
        static_match, src_cov6_s = _static_corr_setup(
            src, src_mask, tgt, tgt_mask, init, max_corr, w_tiles,
            tgt_extra=_cov_to_cols(tgt_cov),
            src_extra=_cov_to_cols(src_cov))
        src_cov_s = _cols_to_cov(src_cov6_s)
        static_match_sub = src_cov_sub = None
        if subsample > 1:
            # coarse phase: strided source TILES (registration r4);
            # the strided source covariance columns ride the same
            # setup (its tile_stride applies to src_extra too)
            static_match_sub, cov6_sub = _static_corr_setup(
                src, src_mask, tgt, tgt_mask, init, max_corr, w_tiles,
                tgt_extra=_cov_to_cols(tgt_cov),
                src_extra=_cov_to_cols(src_cov), tile_stride=subsample)
            src_cov_sub = _cols_to_cov(cov6_sub)

    def body_for(match_fn, cov_s):
        def body(state):
            t_mat, it, _, _ = state
            r_mat = t_mat[:3, :3]
            if window:
                moved, matched, okb, d2, ex = match_fn(t_mat)
                ok = okb
                w = ok.astype(jnp.float32)
                tgt_cov_m = _cols_to_cov(ex)
                c_s_rot = jnp.einsum("ij,njk,lk->nil", r_mat, cov_s,
                                     r_mat,
                                     precision=jax.lax.Precision.HIGHEST)
                m = tgt_cov_m + c_s_rot
                w_mat = inv3x3(m) * w[:, None, None]
                r = moved - matched
                return _gn_update(t_mat, it, moved, r, w_mat, w, ok)
            moved = linalg.transform_points(t_mat, src)
            res = neighbors.knn(tgt, tgt_mask, moved, src_mask, 1)
            idx = res.indices[:, 0]
            dist = res.distances[:, 0]
            ok = res.mask[:, 0] & src_mask & (dist <= max_corr)
            w = ok.astype(jnp.float32)

            # combined covariance M = C_t + R C_s Rᵀ, metric W = M⁻¹
            c_s_rot = jnp.einsum("ij,njk,lk->nil", r_mat, src_cov, r_mat,
                                 precision=jax.lax.Precision.HIGHEST)
            m = tgt_cov[idx] + c_s_rot
            w_mat = inv3x3(m) * w[:, None, None]

            r = moved - tgt[idx]                      # (N, 3) residuals
            return _gn_update(t_mat, it, moved, r, w_mat, w, ok)
        return body

    def _gn_update(t_mat, it, moved, r, w_mat, w, ok):
        h, g = _normal_equations(moved, r, w_mat)
        xi = -linalg.solve_psd(h, g, damping=1e-6)
        new_t = jnp.matmul(se3_exp(xi), t_mat,
                           precision=jax.lax.Precision.HIGHEST)
        n_ok = jnp.maximum(jnp.sum(w), 1.0)
        mse = jnp.sum(jnp.where(ok, jnp.sum(r * r, 1), 0.0)) / n_ok
        return (new_t, it + 1, jnp.linalg.norm(xi),
                (mse, jnp.sum(ok).astype(jnp.int32)))

    def run_loop(state0, match_fn, cov_s, it_budget):
        def cond(state):
            _, it, delta_norm, _ = state
            return (it < it_budget) & (delta_norm >= conv_thresh)
        return jax.lax.while_loop(cond, body_for(match_fn, cov_s),
                                  state0)

    state0 = (init, jnp.int32(0), jnp.float32(jnp.inf),
              (jnp.float32(jnp.inf), jnp.int32(0)))
    if window and subsample > 1 and max_iterations > full_iters:
        coarse = run_loop(state0, static_match_sub, src_cov_sub,
                          max_iterations - full_iters)
        t_a, it_a, _, _ = coarse
        state_b = (t_a, it_a, jnp.float32(jnp.inf),
                   (jnp.float32(jnp.inf), jnp.int32(0)))
        t_mat, it, delta_norm, (mse, n_corr) = run_loop(
            state_b, static_match, src_cov_s, max_iterations)
    else:
        t_mat, it, delta_norm, (mse, n_corr) = run_loop(
            state0, static_match if window else None,
            src_cov_s if window else None, max_iterations)
    return t_mat, mse, it, delta_norm < conv_thresh, n_corr


def gicp(source: PointCloud, target: PointCloud,
         config: GicpConfig = GicpConfig(),
         init: Optional[Transform] = None) -> ICPResult:
    """Full GICP pipeline (gicp.rs:180-240 entry)."""
    if source.capacity == 0 or target.capacity == 0:
        raise InvalidDataError("GICP requires non-empty clouds")
    eps = jnp.float32(config.covariance_epsilon)
    window = (config.method == "window"
              or (config.method == "auto"
                  and source.capacity * target.capacity > 2 ** 35))
    src_cov, src_ok = point_covariances(source.points, source.mask,
                                        config.k_correspondences, eps,
                                        window)
    tgt_cov, tgt_ok = point_covariances(target.points, target.mask,
                                        config.k_correspondences, eps,
                                        window)

    # degenerate-cloud rejection (gicp.rs:148-167): a cloud whose total
    # covariance is rank-deficient in 2 directions (a line/point) cannot
    # constrain 6 DOF
    for cloud, name in ((source, "source"), (target, "target")):
        _, cov = linalg.weighted_covariance(
            cloud.points[None], cloud.mask[None].astype(jnp.float32))
        vals = linalg.eigvals_sym3x3(cov)[0]
        if float(vals[1]) < 1e-5 * max(float(vals[2]), 1e-12):
            raise AlgorithmError(f"GICP: {name} cloud is degenerate "
                                 "(collinear/coincident points)")

    init_m = init.matrix if init is not None else jnp.eye(4, dtype=jnp.float32)
    from .registration import auto_subsample, auto_w_tiles
    w = (config.w_tiles if config.w_tiles is not None
         else auto_w_tiles(source.capacity, target.capacity))
    sub = (config.subsample if config.subsample is not None
           else (auto_subsample(source.capacity) if window else 1))
    t, mse, it, conv, n_corr = _gicp_loop(
        source.points, src_ok, src_cov, target.points, tgt_ok, tgt_cov,
        init_m, config.max_iterations,
        jnp.float32(config.convergence_threshold),
        jnp.float32(config.max_correspondence_distance), window, w,
        subsample=sub, full_iters=config.full_iters)
    return ICPResult(t, mse, it, conv, n_corr)
