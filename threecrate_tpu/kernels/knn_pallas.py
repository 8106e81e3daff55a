"""Pallas TPU kernel: fused sliding-window kNN tile search.

The hot inner stage of ``ops.neighbors.knn_window``. The pure-XLA
version materialises the (tiles × tile × window) distance tensor in HBM
and pays a full HBM round trip for each of {distance compute, validity
mask, top-k} (~3 GB of traffic per pass at 1M points). This kernel
fuses the whole tile pipeline in VMEM:

  load q-tile + window candidate tiles (a few tens of KB)
  → exact f32 squared distances (elementwise expansion — no matmul
    cancellation, no MXU precision passes needed at K=3)
  → k rounds of max-extraction in registers (no sort)
  → write only the (k, tile) results.

HBM traffic per pass drops to reading the points ~3× plus writing
(k, N) outputs. Layout is transposed — coordinates (3, N), outputs
(k, N) — so every block's trailing dim is the lane-aligned tile size.
The window is expressed as prev/self/next BlockSpec views of the same
sorted array, edge tiles masked via program_id.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(prev_ref, self_ref, next_ref, pv_ref, sv_ref, nv_ref,
            pid_ref, sid_ref, nid_ref, neg_out, idx_out, crd_out,
            *, k: int, with_coords: bool, exclude_self: bool):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)

    q = self_ref[:]                                     # (3, tile)
    cand = jnp.concatenate([prev_ref[:], self_ref[:], next_ref[:]],
                           axis=1)                      # (3, 3·tile)
    ok_prev = jnp.where(t > 0, pv_ref[:], 0.0)
    ok_next = jnp.where(t < n_t - 1, nv_ref[:], 0.0)
    valid = jnp.concatenate([ok_prev, sv_ref[:], ok_next],
                            axis=1) > 0.5               # (1, 3·tile)
    # original point ids of the candidate columns (the sort payload):
    # selecting them in-kernel replaces a (N·k) random element gather
    # that measured ~120 ms/pass at 1M points
    cand_ids = jnp.concatenate([pid_ref[:], sid_ref[:], nid_ref[:]],
                               axis=1)                  # (1, 3·tile) int32

    dx = q[0, :][:, None] - cand[0, :][None, :]          # (tile, 3·tile)
    dy = q[1, :][:, None] - cand[1, :][None, :]
    dz = q[2, :][:, None] - cand[2, :][None, :]
    d2 = dx * dx + dy * dy + dz * dz
    neg = jnp.where(valid, -d2, -jnp.inf)
    if exclude_self:
        own = sid_ref[0, :][:, None]                 # (tile, 1)
        neg = jnp.where(cand_ids == own, -jnp.inf, neg)

    col = jax.lax.broadcasted_iota(jnp.int32, neg.shape, 1)
    for j in range(k):
        m = jnp.max(neg, axis=1)                         # (tile,)
        sel = neg == m[:, None]
        arg = jnp.min(jnp.where(sel, col, neg.shape[1]), axis=1)
        chosen = col == arg[:, None]                     # exactly-one mask
        neg_out[j, :] = m
        idx_out[j, :] = jnp.sum(
            jnp.where(chosen, cand_ids, 0), axis=1).astype(jnp.int32)
        if with_coords:
            # selected neighbor coordinates, accumulated from VMEM —
            # downstream covariance then needs NO random HBM gather
            ch = chosen.astype(jnp.float32)
            crd_out[3 * j + 0, :] = jnp.sum(ch * cand[0, :][None, :], axis=1)
            crd_out[3 * j + 1, :] = jnp.sum(ch * cand[1, :][None, :], axis=1)
            crd_out[3 * j + 2, :] = jnp.sum(ch * cand[2, :][None, :], axis=1)
        neg = jnp.where(chosen, -jnp.inf, neg)


def _normal_from_cov_lanes(cxx, cyy, czz, cxy, cxz, cyz):
    """Smallest-eigenpair of per-lane symmetric 3x3 covariances via
    cyclic Jacobi rotations — runs inside the kernel without
    materialising (N, 3, 3) matrices in HBM, and uses only
    add/mul/div/sqrt (Pallas TPU does not lower acos, ruling out the
    trigonometric closed form; Jacobi is also better-conditioned at
    the planar case, where the trig form sits on a double root).
    4 sweeps × 3 rotations give f32-exact eigenpairs for 3x3.
    Returns (nx, ny, nz, curvature = λ0/Σλ)."""
    trace = jnp.maximum(cxx + cyy + czz, 1e-12)
    # work on a scaled copy for conditioning
    a00, a11, a22 = cxx / trace, cyy / trace, czz / trace
    a01, a02, a12 = cxy / trace, cxz / trace, cyz / trace
    one = jnp.ones_like(a00)
    zero = jnp.zeros_like(a00)
    v00, v01, v02 = one, zero, zero
    v10, v11, v12 = zero, one, zero
    v20, v21, v22 = zero, zero, one

    def rot(app, aqq, apq, theta_den):
        # tangent of the annihilating rotation, stable form
        theta = theta_den / (2.0 * jnp.where(apq == 0.0, 1.0, apq))
        sgn = jnp.where(theta >= 0.0, 1.0, -1.0)
        t = sgn / (jnp.abs(theta) + jnp.sqrt(theta * theta + 1.0))
        t = jnp.where(jnp.abs(apq) > 1e-30, t, 0.0)
        c = 1.0 / jnp.sqrt(t * t + 1.0)
        s = t * c
        return t, c, s

    for _ in range(4):
        # pivot (0,1)
        t, c, s = rot(a00, a11, a01, a11 - a00)
        a00, a11 = a00 - t * a01, a11 + t * a01
        a01 = zero
        a02, a12 = c * a02 - s * a12, s * a02 + c * a12
        v00, v01 = c * v00 - s * v01, s * v00 + c * v01
        v10, v11 = c * v10 - s * v11, s * v10 + c * v11
        v20, v21 = c * v20 - s * v21, s * v20 + c * v21
        # pivot (0,2)
        t, c, s = rot(a00, a22, a02, a22 - a00)
        a00, a22 = a00 - t * a02, a22 + t * a02
        a02 = zero
        a01, a12 = c * a01 - s * a12, s * a01 + c * a12
        v00, v02 = c * v00 - s * v02, s * v00 + c * v02
        v10, v12 = c * v10 - s * v12, s * v10 + c * v12
        v20, v22 = c * v20 - s * v22, s * v20 + c * v22
        # pivot (1,2)
        t, c, s = rot(a11, a22, a12, a22 - a11)
        a11, a22 = a11 - t * a12, a22 + t * a12
        a12 = zero
        a01, a02 = c * a01 - s * a02, s * a01 + c * a02
        v01, v02 = c * v01 - s * v02, s * v01 + c * v02
        v11, v12 = c * v11 - s * v12, s * v11 + c * v12
        v21, v22 = c * v21 - s * v22, s * v21 + c * v22

    # smallest eigenvalue column of V
    m01 = (a00 <= a11) & (a00 <= a22)
    m1 = (~m01) & (a11 <= a22)
    lam = jnp.where(m01, a00, jnp.where(m1, a11, a22))
    vx = jnp.where(m01, v00, jnp.where(m1, v01, v02))
    vy = jnp.where(m01, v10, jnp.where(m1, v11, v12))
    vz = jnp.where(m01, v20, jnp.where(m1, v21, v22))
    curv = jnp.maximum(lam, 0.0)      # trace-scaled: λ0/Σλ already
    inv = 1.0 / jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-30))
    return vx * inv, vy * inv, vz * inv, curv


def _moments_kernel(prev_ref, self_ref, next_ref, pv_ref, sv_ref, nv_ref,
                    mom_out, *, k: int):
    """Fully-fused k-NN-select → covariance → normal kernel.

    Per query point: select the k nearest window candidates (k rounds
    of max-extraction), accumulate their covariance moments *centered
    at the query* in VMEM, and solve the smallest eigenpair in-lane.
    Emits 6 rows: [nx, ny, nz, curvature, neighbor count, k-th best
    negated squared distance]. Neither neighbor ids/coords nor the
    (11, N) moments ever reach HBM — profiling showed the separate
    covariance+eigensolve stage cost ~58 ms at 1M points purely in
    HBM round trips of its (N,) temporaries. Centering at the query
    keeps the E[dd]−E[d]E[d] subtraction far from f32 cancellation
    (|d| ≈ neighbor spacing). The count / k-th-distance lanes let a
    multi-pass caller pick, per point, the pass whose window found the
    tighter neighborhood (outputs from different passes cannot be
    union-merged — overlapping selections would double count).
    """
    t = pl.program_id(0)
    n_t = pl.num_programs(0)

    q = self_ref[:]                                     # (3, tile)
    cand = jnp.concatenate([prev_ref[:], self_ref[:], next_ref[:]],
                           axis=1)                      # (3, 3·tile)
    ok_prev = jnp.where(t > 0, pv_ref[:], 0.0)
    ok_next = jnp.where(t < n_t - 1, nv_ref[:], 0.0)
    valid = jnp.concatenate([ok_prev, sv_ref[:], ok_next],
                            axis=1) > 0.5               # (1, 3·tile)

    dx = cand[0, :][None, :] - q[0, :][:, None]          # (tile, 3·tile)
    dy = cand[1, :][None, :] - q[1, :][:, None]
    dz = cand[2, :][None, :] - q[2, :][:, None]
    d2 = dx * dx + dy * dy + dz * dz
    neg = jnp.where(valid, -d2, -jnp.inf)

    col = jax.lax.broadcasted_iota(jnp.int32, neg.shape, 1)
    sel = jnp.zeros(neg.shape, jnp.float32)
    kth = jnp.full((q.shape[1],), -jnp.inf, jnp.float32)
    for _ in range(k):
        m = jnp.max(neg, axis=1)                         # (tile,)
        good = m > -jnp.inf
        cand_sel = neg == m[:, None]
        arg = jnp.min(jnp.where(cand_sel, col, neg.shape[1]), axis=1)
        chosen = (col == arg[:, None]) & good[:, None]
        sel = sel + chosen.astype(jnp.float32)
        neg = jnp.where(chosen, -jnp.inf, neg)
        kth = m

    cnt_raw = jnp.sum(sel, axis=1)
    cnt = jnp.maximum(cnt_raw, 1e-12)
    m1x = jnp.sum(sel * dx, axis=1) / cnt
    m1y = jnp.sum(sel * dy, axis=1) / cnt
    m1z = jnp.sum(sel * dz, axis=1) / cnt
    cxx = jnp.sum(sel * dx * dx, axis=1) / cnt - m1x * m1x
    cyy = jnp.sum(sel * dy * dy, axis=1) / cnt - m1y * m1y
    czz = jnp.sum(sel * dz * dz, axis=1) / cnt - m1z * m1z
    cxy = jnp.sum(sel * dx * dy, axis=1) / cnt - m1x * m1y
    cxz = jnp.sum(sel * dx * dz, axis=1) / cnt - m1x * m1z
    cyz = jnp.sum(sel * dy * dz, axis=1) / cnt - m1y * m1z
    nx, ny, nz, curv = _normal_from_cov_lanes(cxx, cyy, czz,
                                              cxy, cxz, cyz)
    mom_out[0, :] = nx
    mom_out[1, :] = ny
    mom_out[2, :] = nz
    mom_out[3, :] = curv
    mom_out[4, :] = cnt_raw
    mom_out[5, :] = kth


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def window_normals_tiles(sorted_pts_t: jnp.ndarray,
                         sorted_valid: jnp.ndarray,
                         k: int, tile: int = 256,
                         interpret: bool = False) -> jnp.ndarray:
    """Per-point PCA normals of the k nearest window candidates, fully
    fused (select + covariance + eigensolve in VMEM).

    sorted_pts_t: (3, N) float32 Morton-sorted transposed coordinates,
    N % tile == 0. sorted_valid: (1, N) float32. Returns (6, N) in
    sorted order: [nx, ny, nz (unit, unoriented), curvature λ0/Σλ,
    neighbor count, kth-neg-d²]. The query itself is included in its
    own neighborhood (d = 0), matching the exact-kNN normals path.
    """
    n = sorted_pts_t.shape[1]
    assert n % tile == 0, "pad to a tile multiple first"
    n_tiles = n // tile

    def win_specs(rows):
        return [
            pl.BlockSpec((rows, tile), lambda t: (0, jnp.maximum(t - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, tile),
                         lambda t: (0, jnp.minimum(t + 1, n_tiles - 1)),
                         memory_space=pltpu.VMEM),
        ]

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=win_specs(3) + win_specs(1),
        out_specs=[
            pl.BlockSpec((6, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
    )
    (mom,) = pl.pallas_call(
        functools.partial(_moments_kernel, k=k),
        out_shape=[jax.ShapeDtypeStruct((6, n), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(sorted_pts_t, sorted_pts_t, sorted_pts_t,
      sorted_valid, sorted_valid, sorted_valid)
    return mom


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret",
                                             "with_coords", "exclude_self"))
def knn_window_tiles(sorted_pts_t: jnp.ndarray, sorted_valid: jnp.ndarray,
                     sorted_ids: jnp.ndarray,
                     k: int, tile: int = 256, interpret: bool = False,
                     with_coords: bool = False, exclude_self: bool = False):
    """Fused per-tile window search over Morton-sorted points.

    sorted_pts_t: (3, N) float32 transposed coordinates, N % tile == 0.
    sorted_valid: (1, N) float32 (1.0 valid / 0.0 padding).
    sorted_ids: (1, N) int32 original point id per sorted column (the
      sort permutation payload).
    Returns (neg sq dists (k, N), original ids (k, N) int32).
    """
    n = sorted_pts_t.shape[1]
    assert n % tile == 0, "pad to a tile multiple first"
    n_tiles = n // tile

    def win_specs(rows):
        return [
            pl.BlockSpec((rows, tile), lambda t: (0, jnp.maximum(t - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, tile),
                         lambda t: (0, jnp.minimum(t + 1, n_tiles - 1)),
                         memory_space=pltpu.VMEM),
        ]

    crd_rows = 3 * k if with_coords else 1
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=win_specs(3) + win_specs(1) + win_specs(1),
        out_specs=[
            pl.BlockSpec((k, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((crd_rows, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
    )
    neg, idx, crd = pl.pallas_call(
        functools.partial(_kernel, k=k, with_coords=with_coords,
                          exclude_self=exclude_self),
        out_shape=[jax.ShapeDtypeStruct((k, n), jnp.float32),
                   jax.ShapeDtypeStruct((k, n), jnp.int32),
                   jax.ShapeDtypeStruct((crd_rows, n), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(sorted_pts_t, sorted_pts_t, sorted_pts_t,
      sorted_valid, sorted_valid, sorted_valid,
      sorted_ids, sorted_ids, sorted_ids)
    if with_coords:
        return neg, idx, crd
    return neg, idx
