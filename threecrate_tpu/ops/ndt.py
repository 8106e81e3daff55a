"""Normal Distributions Transform registration (Biber & Straßer 2003).

TPU-native rework of threecrate-algorithms/src/ndt_registration.rs:
target voxel grid → per-cell Gaussian with regularised inverse
covariance, cells below ``min_points_per_voxel`` dropped
(ndt_registration.rs:54-111); Newton optimisation of the NDT score
``Σ exp(−½ dᵀΣ⁻¹d)`` with the analytic point Jacobian, step clamped to
``step_size``, converging on ‖δ‖ < ε (ndt_registration.rs:113-256).

The HashMap of cells becomes a sorted voxel grid (ops.voxel_hash); cell
statistics are two segment-sums (Σx, Σxxᵀ); the per-point 3×3 algebra
is batched closed-form; point→cell association each iteration is a
``searchsorted`` lookup. The whole Newton loop is one lax.while_loop.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.errors import InvalidDataError
from ..core.point_cloud import PointCloud
from ..core.transform import Transform, se3_exp, skew
from . import linalg, voxel_hash
from .gicp import inv3x3


@dataclasses.dataclass(frozen=True)
class NdtConfig:
    """Mirrors NdtConfig defaults (ndt_registration.rs:15-38)."""

    resolution: float = 1.0
    step_size: float = 0.1
    max_iterations: int = 35
    epsilon: float = 1e-4
    min_points_per_voxel: int = 5
    # Coarse-phase source stride (None = registration.auto_subsample
    # ladder). All but the last ``full_iters`` Newton iterations score
    # every ``subsample``-th source point; cell association is
    # per-point (searchsorted), so a plain stride needs no tile
    # structure — the Newton direction from a uniform 1/S sample
    # matches the full gradient far above the fit's noise floor.
    subsample: Optional[int] = None
    full_iters: int = 2


class NdtResult(NamedTuple):
    """Mirrors NdtResult (ndt_registration.rs:42-51)."""

    transformation: jnp.ndarray
    score: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray

    def as_transform(self) -> Transform:
        return Transform(self.transformation)


class NdtGaussians(NamedTuple):
    grid: voxel_hash.VoxelGrid
    means: jnp.ndarray      # (N, 3) per unique-cell row
    inv_covs: jnp.ndarray   # (N, 3, 3)
    valid: jnp.ndarray      # (N,) cell has ≥ min_points


@functools.partial(jax.jit, static_argnames=("min_points",))
def build_gaussians(points, mask, resolution, min_points) -> NdtGaussians:
    """Per-cell mean + regularised inverse covariance
    (ndt_registration.rs:54-111)."""
    grid = voxel_hash.build_voxel_grid(points, mask, resolution)
    n = points.shape[0]
    sorted_pts = points[grid.perm]
    sorted_valid = grid.sorted_keys != jnp.int32(2**31 - 1)

    new_run = jnp.concatenate([
        jnp.ones((1,), bool),
        grid.sorted_keys[1:] != grid.sorted_keys[:-1]]) & sorted_valid

    # ONE segmented reverse scan (ops.segmented — scatter-free): raw
    # first+second moments of HEAD-CENTERED coordinates (c = p − run
    # head point; |c| ≤ cell diagonal, so the E[ccᵀ]−μ'μ'ᵀ expansion
    # cancels at eps·cell² ≪ the regularisation floor — the same trick
    # as ground._rgpf). The previous two-scan formulation (means, then
    # mean-centered second moments) cost a second scan INSTANCE — each
    # is ~3 min of remote XLA compile — plus a per-element means[run_id]
    # row gather per call.
    from . import segmented
    iota = jnp.arange(n, dtype=jnp.int32)
    start_el = jnp.maximum(jax.lax.cummax(jnp.where(new_run, iota, -1)), 0)
    head_pt = sorted_pts[start_el]
    c = sorted_pts - head_pt
    mom9 = jnp.concatenate([
        c,
        jnp.stack([c[:, 0] * c[:, 0], c[:, 1] * c[:, 1],
                   c[:, 2] * c[:, 2], c[:, 0] * c[:, 1],
                   c[:, 0] * c[:, 2], c[:, 1] * c[:, 2]], axis=1)], axis=1)
    s = segmented.sorted_run_sums(mom9, new_run, sorted_valid)
    comp_key = jnp.where(new_run, jnp.int32(0), jnp.int32(1))
    _, order = jax.lax.sort((comp_key, iota), num_keys=1)
    sc = s[order]                                # (n, 10) cell-indexed
    head_c = head_pt[order]
    cnt = sc[:, 9]
    inv_n = 1.0 / jnp.maximum(cnt, 1.0)
    mu = sc[:, :3] * inv_n[:, None]              # head-centered mean
    means = head_c + mu
    denom = jnp.maximum(cnt - 1.0, 1.0)
    cc6 = (sc[:, 3:9] - cnt[:, None] * jnp.stack(
        [mu[:, 0] * mu[:, 0], mu[:, 1] * mu[:, 1], mu[:, 2] * mu[:, 2],
         mu[:, 0] * mu[:, 1], mu[:, 0] * mu[:, 2], mu[:, 1] * mu[:, 2]],
        axis=1)) / denom[:, None]
    xx, yy, zz, xy, xz, yz = (cc6[:, i] for i in range(6))
    covs = jnp.stack([
        jnp.stack([xx, xy, xz], -1),
        jnp.stack([xy, yy, yz], -1),
        jnp.stack([xz, yz, zz], -1)], -2)

    # eigenvalue-floor regularisation: λᵢ ← max(λᵢ, 0.01·λmax)
    vals, vecs = linalg.eigh3x3(covs)
    floor = 0.01 * jnp.maximum(vals[..., 2:3], 1e-9)
    vals_r = jnp.maximum(vals, floor)
    covs_r = jnp.einsum("nij,nj,nkj->nik", vecs, vals_r, vecs)
    inv_covs = inv3x3(covs_r)

    valid = (cnt >= min_points) & (jnp.arange(n) < grid.n_cells)
    return NdtGaussians(grid, means, inv_covs, valid)


@functools.partial(jax.jit, static_argnames=("max_iterations", "subsample",
                                              "full_iters"))
def _ndt_loop(src, src_mask, gaussians: NdtGaussians, init,
              max_iterations, step_size, epsilon, subsample=1,
              full_iters=2):
    grid = gaussians.grid

    def score_terms(t_mat, pts, pmask):
        moved = linalg.transform_points(t_mat, pts)
        keys = grid.key_of(moved)
        cell, found = grid.lookup(keys)
        ok = found & pmask & gaussians.valid[cell]
        w = ok.astype(jnp.float32)
        mu = gaussians.means[cell]
        b = gaussians.inv_covs[cell]
        d = moved - mu
        bd = jnp.einsum("nij,nj->ni", b, d)
        q = jnp.sum(d * bd, axis=1)
        s = jnp.exp(-0.5 * jnp.clip(q, 0.0, 50.0)) * w
        # J = ∂d/∂ξ = [−skew(moved) | I] (3, 6) per point. grad =
        # Σ s·JᵀBd, Gauss-Newton Hessian = Σ s·JᵀBJ (the full Newton
        # form has a −Σ s·(JᵀBd)(JᵀBd)ᵀ correction that makes H
        # indefinite far from the optimum and breaks the Cholesky
        # solve; dropping it is the standard GN-NDT simplification
        # and keeps every step a descent direction). Both reduce to
        # GICP's symbolically-expanded normal equations with
        # W = s·B and r = d — no (N, 3, 6) einsum intermediates
        # (the expansion bought GICP 33→18 ms/iter at 1M; r4 gives
        # NDT the same treatment).
        from .gicp import _normal_equations
        w_mat = b * s[:, None, None]
        hess, grad = _normal_equations(moved, d, w_mat)
        score = jnp.sum(s)
        return score, grad, hess

    def run_loop(state0, pts, pmask, it_budget):
        def cond(state):
            _, it, dn, _ = state
            return (it < it_budget) & (dn >= epsilon)

        def body(state):
            t_mat, it, _, _ = state
            score, grad, hess = score_terms(t_mat, pts, pmask)
            delta = -linalg.solve_psd(hess, grad, damping=1e-2)
            norm = jnp.linalg.norm(delta)
            scale = jnp.where(norm > step_size,
                              step_size / jnp.maximum(norm, 1e-12), 1.0)
            delta = delta * scale
            new_t = jnp.matmul(se3_exp(delta), t_mat,
                               precision=jax.lax.Precision.HIGHEST)
            return (new_t, it + 1, jnp.linalg.norm(delta), score)

        return jax.lax.while_loop(cond, body, state0)

    state0 = (init, jnp.int32(0), jnp.float32(jnp.inf), jnp.float32(0.0))
    if subsample > 1 and max_iterations > full_iters:
        # coarse phase on every S-th source point (registration r4's
        # two-phase schedule; the Newton direction -H⁻¹g is invariant
        # to the uniform 1/S scaling of both H and g), then full-set
        # polish for the last ``full_iters`` iterations.
        t_a, it_a, _, _ = run_loop(state0, src[::subsample],
                                   src_mask[::subsample],
                                   max_iterations - full_iters)
        state_b = (t_a, it_a, jnp.float32(jnp.inf), jnp.float32(0.0))
        t_mat, it, dn, _ = run_loop(state_b, src, src_mask,
                                    max_iterations)
    else:
        t_mat, it, dn, _ = run_loop(state0, src, src_mask,
                                    max_iterations)
    final_score, _, _ = score_terms(t_mat, src, src_mask)
    return t_mat, final_score, it, dn < epsilon


def ndt_registration(source: PointCloud, target: PointCloud,
                     config: NdtConfig = NdtConfig(),
                     init: Optional[Transform] = None) -> NdtResult:
    """NDT alignment of source onto target (ndt_registration.rs:188-256)."""
    if source.capacity == 0 or target.capacity == 0:
        raise InvalidDataError("NDT requires non-empty clouds")
    gaussians = build_gaussians(target.points, target.mask,
                                jnp.float32(config.resolution),
                                config.min_points_per_voxel)
    init_m = init.matrix if init is not None else jnp.eye(4, dtype=jnp.float32)
    from .registration import auto_subsample
    sub = (config.subsample if config.subsample is not None
           else auto_subsample(source.capacity))
    t, score, it, conv = _ndt_loop(
        source.points, source.mask, gaussians, init_m,
        config.max_iterations, jnp.float32(config.step_size),
        jnp.float32(config.epsilon), subsample=sub,
        full_iters=config.full_iters)
    return NdtResult(t, score, it, conv)
