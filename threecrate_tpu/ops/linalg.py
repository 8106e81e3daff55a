"""Batched small linear algebra for point-cloud ops.

The reference leans on nalgebra per point: ``symmetric_eigen`` for 3x3
covariances (threecrate-algorithms/src/normals.rs:158-205), Kabsch/SVD
rigid fits (registration.rs:144-203), 6x6 Cholesky/LU solves
(registration.rs:395-450). On TPU we want these *batched and
closed-form*: a million independent 3x3 eigensolves is VPU elementwise
work if expressed analytically, and one 3x3 SVD per ICP iteration is
cheap host-free lax code. Everything here is pure jnp, vmappable, and
NaN-guarded for degenerate inputs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12

# TPU MXU matmuls default to bf16 passes (~4e-3 relative error) —
# catastrophic for metric geometry (coordinates of ~1e1-1e6 m magnitude
# feed rigid fits that must resolve 1e-6 m). Every matmul/einsum in this
# module forces full f32.
_HI = jax.lax.Precision.HIGHEST


def eigvals_sym3x3(a: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric ``(..., 3, 3)`` matrices, ascending.

    Closed-form trigonometric method (Smith 1961): exact for symmetric
    3x3, fully elementwise -> maps to VPU lanes with no iteration.
    """
    a = a.astype(jnp.float32)
    # SCALE INVARIANCE: every guard below is an absolute epsilon, so
    # normalise to max|a| ~ 1 first (tiny covariances — mm-scale
    # neighborhoods give entries ~1e-4..1e-8 — otherwise trip the
    # degeneracy guards and collapse to garbage; r3 verify-drive bug).
    scale = jnp.maximum(jnp.max(jnp.abs(a), axis=(-2, -1)), 1e-30)
    a = a / scale[..., None, None]
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    a_sub = a - q[..., None, None] * jnp.eye(3, dtype=a.dtype)
    p2 = jnp.sum(a_sub * a_sub, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    b = a_sub / p[..., None, None]
    det_b = jnp.linalg.det(b)
    r = jnp.clip(det_b / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    # degenerate (a == q*I): all eigenvalues equal q
    isotropic = p2 < _EPS
    e1 = jnp.where(isotropic, q, e1)
    e2 = jnp.where(isotropic, q, e2)
    e3 = jnp.where(isotropic, q, e3)
    return jnp.stack([e3, e2, e1], axis=-1) * scale[..., None]  # ascending


def _eigenvector_for(a: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of symmetric 3x3 ``a`` for eigenvalue ``lam``.

    Rows of (a - lam I) span the orthogonal complement; the eigenvector is
    the largest cross product of row pairs (robust rank-2 case), with a
    fallback chain for rank-1 / rank-0 degeneracy.
    """
    # normalise to max|a| ~ 1: the rank guards below are absolute
    # epsilons and misfire on tiny-scale matrices otherwise (the
    # rank-1 fallback then returns an arbitrary in-plane vector —
    # ~33 deg median normal error on mm-scale covariances)
    scale = jnp.maximum(jnp.max(jnp.abs(a), axis=(-2, -1)), 1e-30)
    a = a / scale[..., None, None]
    lam = lam / scale
    m = a - lam[..., None, None] * jnp.eye(3, dtype=a.dtype)
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.where((n01 >= n02)[..., None] & (n01 >= n12)[..., None], c01,
                     jnp.where((n02 >= n12)[..., None], c02, c12))
    best_n = jnp.maximum(jnp.maximum(n01, n02), n12)
    # rank-1 fallback: any vector orthogonal to the largest row
    row_n = jnp.sum(m * m, axis=-1)
    big_row = jnp.take_along_axis(
        m, jnp.argmax(row_n, axis=-1)[..., None, None].repeat(3, -1), axis=-2
    )[..., 0, :]
    alt = jnp.cross(big_row, jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0], a.dtype), big_row.shape))
    alt2 = jnp.cross(big_row, jnp.broadcast_to(
        jnp.array([0.0, 1.0, 0.0], a.dtype), big_row.shape))
    alt = jnp.where((jnp.sum(alt * alt, -1) >= jnp.sum(alt2 * alt2, -1))[..., None],
                    alt, alt2)
    v = jnp.where((best_n > _EPS)[..., None], best, alt)
    # rank-0 fallback (isotropic): z axis
    vn = jnp.sum(v * v, axis=-1)
    v = jnp.where((vn > _EPS)[..., None], v,
                  jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], a.dtype), v.shape))
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)


def eigh3x3(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full symmetric 3x3 eigendecomposition.

    Returns ``(eigvals ascending (..., 3), eigvecs (..., 3, 3))`` with
    ``eigvecs[..., :, i]`` the i-th eigenvector. Replaces the per-point
    ``symmetric_eigen`` call in the reference's normal estimation — fully
    batched, no LAPACK, no host sync.
    """
    vals = eigvals_sym3x3(a)
    v0 = _eigenvector_for(a, vals[..., 0])
    v2 = _eigenvector_for(a, vals[..., 2])
    # middle eigenvector by orthogonality — exact for symmetric matrices
    v1 = jnp.cross(v2, v0)
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-30)
    vecs = jnp.stack([v0, v1, v2], axis=-1)
    return vals, vecs


def smallest_eigenvector_sym3x3(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(eigenvector, eigenvalue) of the smallest eigenpair — the normal
    direction of a local covariance. Cheaper than full eigh3x3."""
    vals = eigvals_sym3x3(a)
    lam = vals[..., 0]
    return _eigenvector_for(a, lam), lam


def weighted_covariance(points: jnp.ndarray, weights: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted mean & covariance over axis -2.

    points: ``(..., K, 3)``; weights: ``(..., K)`` (>=0; zero = ignored).
    Returns ``(mean (..., 3), cov (..., 3, 3))``.
    """
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2), _EPS)
    mean = jnp.sum(points * w, axis=-2) / wsum
    d = (points - mean[..., None, :]) * jnp.sqrt(w)
    cov = jnp.einsum("...ki,...kj->...ij", d, d,
                     precision=_HI) / wsum[..., None]
    return mean, cov


def kabsch(source: jnp.ndarray, target: jnp.ndarray, weights: jnp.ndarray
           ) -> jnp.ndarray:
    """Weighted rigid alignment (Kabsch/Umeyama, no scale): returns the
    (4, 4) transform minimising Σ wᵢ ‖R sᵢ + t − tᵢ‖².

    Matches compute_transformation (registration.rs:144-203) including the
    det<0 reflection fix, but over masked fixed-shape arrays. The 3x3 SVD
    runs once per call — negligible — while the cross-covariance is one
    fused einsum over the full correspondence set.
    """
    w = weights.astype(source.dtype)
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    mu_s = jnp.sum(source * w[:, None], axis=0) / wsum
    mu_t = jnp.sum(target * w[:, None], axis=0) / wsum
    ds = source - mu_s
    dt = target - mu_t
    h = jnp.einsum("ni,nj,n->ij", ds, dt, w, precision=_HI)
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(
        jnp.matmul(vt.T, u.T, precision=_HI)))
    diag = jnp.diag(jnp.array([1.0, 1.0, 1.0], source.dtype)).at[2, 2].set(d)
    r = jnp.matmul(jnp.matmul(vt.T, diag, precision=_HI), u.T,
                   precision=_HI)
    t = mu_t - jnp.matmul(r, mu_s, precision=_HI)
    m = jnp.eye(4, dtype=source.dtype)
    m = m.at[:3, :3].set(r)
    m = m.at[:3, 3].set(t)
    return m


def kabsch_from_sums(wsum: jnp.ndarray, sum_s: jnp.ndarray,
                     sum_t: jnp.ndarray, sum_st: jnp.ndarray
                     ) -> jnp.ndarray:
    """``kabsch`` from precomputed weighted sums: Σw, Σw·s (3,),
    Σw·t (3,), Σw·s⊗t (3, 3) — the form a fused correspondence kernel
    emits as per-tile partials, so the (N, 3) correspondence arrays
    never exist in HBM. Identical math: H = Σw(s−μs)(t−μt)ᵀ
    = Σw·s⊗t − wsum·μs⊗μt."""
    wsum = jnp.maximum(wsum, _EPS)
    mu_s = sum_s / wsum
    mu_t = sum_t / wsum
    h = sum_st - wsum * jnp.outer(mu_s, mu_t)
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(
        jnp.matmul(vt.T, u.T, precision=_HI)))
    diag = jnp.diag(jnp.array([1.0, 1.0, 1.0], h.dtype)).at[2, 2].set(d)
    r = jnp.matmul(jnp.matmul(vt.T, diag, precision=_HI), u.T,
                   precision=_HI)
    t = mu_t - jnp.matmul(r, mu_s, precision=_HI)
    m = jnp.eye(4, dtype=h.dtype)
    m = m.at[:3, :3].set(r)
    m = m.at[:3, 3].set(t)
    return m


def solve_psd(a: jnp.ndarray, b: jnp.ndarray, damping: float = 1e-9) -> jnp.ndarray:
    """Solve symmetric PD ``a x = b`` with Tikhonov guard.

    Used for the 6x6 point-to-plane / GICP / NDT Newton systems
    (registration.rs:430-450's Cholesky→LU fallback chain collapses to
    one damped Cholesky here).
    """
    n = a.shape[-1]
    a = a + damping * jnp.trace(a) / n * jnp.eye(n, dtype=a.dtype)
    cho = jax.scipy.linalg.cho_factor(a)
    return jax.scipy.linalg.cho_solve(cho, b)


def transform_points(matrix: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply a (4,4) homogeneous matrix to (..., 3) points.

    Forces f32 matmul: at default (bf16) MXU precision every moved
    point is quantised to ~4e-3 relative error — measured to cap ICP
    convergence at Rerr ~1e-2 on TPU (round-2 probe)."""
    return jnp.matmul(points, matrix[:3, :3].T,
                      precision=_HI) + matrix[:3, 3]
