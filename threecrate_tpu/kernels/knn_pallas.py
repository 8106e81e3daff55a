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


def _union_a_kernel(prev_ref, self_ref, next_ref, pv_ref, sv_ref,
                    nv_ref, out_ref, feat_ref, *, k: int, band: int):
    """Union-mode pass A: band-bounded radius selection, but emit the
    QUERY-CENTERED central sums (frame-free, addable across passes)
    plus the radius — no eigensolve yet. 11 rows:
    [cnt, S1(3), S2(6), hiA]."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    tile = self_ref.shape[1]
    q = self_ref[:]
    cand = jnp.concatenate([prev_ref[:], self_ref[:], next_ref[:]], axis=1)
    ok_prev = jnp.where(t > 0, pv_ref[:], 0.0)
    ok_next = jnp.where(t < n_t - 1, nv_ref[:], 0.0)
    validf = jnp.concatenate([ok_prev, sv_ref[:], ok_next], axis=1)

    d2v, hi = _band_bound(q, cand, validf, k, band, tile)
    sel = (d2v <= hi[:, None]).astype(jnp.float32)
    tcx, tcy, tcz = _store_features(feat_ref, cand, sv_ref[:], q)
    g = _mxu_moments(feat_ref, sel)
    sums = _query_centered_sums(g, q[0, :] - tcx, q[1, :] - tcy,
                                q[2, :] - tcz)
    for j, row in enumerate(sums):
        out_ref[j, :] = row
    out_ref[10, :] = hi


def _union_b_kernel(prev_ref, self_ref, next_ref, pv_ref, sv_ref, nv_ref,
                    pp_ref, sp_ref, np_ref, hia_ref, out_ref, feat_ref,
                    *, k: int, band: int):
    """Union-mode pass B over the shifted-grid sorted order.

    Inputs additionally carry each candidate's PASS-A POSITION (the
    sort payload) and each query's pass-A radius hiA. The tighter-vs-
    union decision is made IN-KERNEL per query, so only ONE blended
    selection goes through the moments matmul. Emits 11 rows:

    * S_out (10): when hiB < hiA (pass A's window was poor — its far
      selected points must be dropped, exactly the failure pick-
      tighter repairs): the FULL pass-B window sums at hiB, used
      alone. Otherwise: sums over candidates within hiA that lie
      OUTSIDE the query's pass-A window (|posA tile delta| > 1) —
      directly addable to pass A's sums for an exact two-window UNION
      at radius hiA (window membership partitions the candidates, so
      nothing double-counts);
    * use_b (1): 1.0 where hiB < hiA.

    The caller computes: final = S_out + (1 − use_b)·S_A.
    """
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    tile = self_ref.shape[1]
    q = self_ref[:]
    cand = jnp.concatenate([prev_ref[:], self_ref[:], next_ref[:]], axis=1)
    ok_prev = jnp.where(t > 0, pv_ref[:], 0.0)
    ok_next = jnp.where(t < n_t - 1, nv_ref[:], 0.0)
    validf = jnp.concatenate([ok_prev, sv_ref[:], ok_next], axis=1)

    d2v, hib = _band_bound(q, cand, validf, k, band, tile)

    # pass-A window membership: tile index = posA >> log2(tile)
    shift = int(tile).bit_length() - 1
    pos_c = jnp.concatenate([pp_ref[:], sp_ref[:], np_ref[:]], axis=1)
    tile_c = jax.lax.shift_right_logical(pos_c, shift)     # (1, 3·tile)
    tile_q = jax.lax.shift_right_logical(sp_ref[0, :], shift)  # (tile,)
    dtile = tile_c - tile_q[:, None]
    in_win_a = (dtile >= -1) & (dtile <= 1)

    hia = hia_ref[0, :]                                    # (tile,)
    use_b = hib < hia                                      # (tile,)
    # select between FLOAT masks (mosaic cannot select i1 vectors)
    sel_full = (d2v <= hib[:, None]).astype(jnp.float32)
    sel_excl = ((d2v <= hia[:, None]) & ~in_win_a).astype(jnp.float32)
    sel = jnp.where(use_b[:, None], sel_full, sel_excl)

    tcx, tcy, tcz = _store_features(feat_ref, cand, sv_ref[:], q)
    qx = q[0, :] - tcx
    qy = q[1, :] - tcy
    qz = q[2, :] - tcz
    sums = _query_centered_sums(_mxu_moments(feat_ref, sel), qx, qy, qz)
    for j, row in enumerate(sums):
        out_ref[j, :] = row
    out_ref[10, :] = use_b.astype(jnp.float32)


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


def _emit_moments(sel, dx, dy, dz, kth_neg, mom_out):
    """Shared tail of the fused normal kernels: selection-weighted
    query-centered covariance → in-lane Jacobi eigensolve → 6 output
    rows [nx, ny, nz, curvature, count, neg-k-th-d²]."""
    cnt_raw = jnp.sum(sel, axis=1)
    cnt = jnp.maximum(cnt_raw, 1e-12)
    sx = sel * dx
    sy = sel * dy
    sz = sel * dz
    m1x = jnp.sum(sx, axis=1) / cnt
    m1y = jnp.sum(sy, axis=1) / cnt
    m1z = jnp.sum(sz, axis=1) / cnt
    cxx = jnp.sum(sx * dx, axis=1) / cnt - m1x * m1x
    cyy = jnp.sum(sy * dy, axis=1) / cnt - m1y * m1y
    czz = jnp.sum(sz * dz, axis=1) / cnt - m1z * m1z
    cxy = jnp.sum(sx * dy, axis=1) / cnt - m1x * m1y
    cxz = jnp.sum(sx * dz, axis=1) / cnt - m1x * m1z
    cyz = jnp.sum(sy * dz, axis=1) / cnt - m1y * m1z
    nx, ny, nz, curv = _normal_from_cov_lanes(cxx, cyy, czz,
                                              cxy, cxz, cyz)
    mom_out[0, :] = nx
    mom_out[1, :] = ny
    mom_out[2, :] = nz
    mom_out[3, :] = curv
    mom_out[4, :] = cnt_raw
    mom_out[5, :] = kth_neg


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

    _emit_moments(sel, dx, dy, dz, kth, mom_out)


def _band_bound(q, cand, validf, k: int, band: int, tile: int):
    """Shared selection-radius machinery of the band kernels.

    Returns (d2v, hi): the validity-masked (tile, 3·tile) squared
    distances and, per query, a radius hi with count(d2v <= hi) >= k
    that is within r_band/2^6 of the k-th-smallest window distance.
    Bound source: the k-th smallest distance within a ±band POSITIONAL
    window of the sorted order (Morton-adjacent ⇒ spatially adjacent),
    tightened by 6 bisection rounds against the full window count.
    """
    valid = validf > 0.5
    dx = cand[0, :][None, :] - q[0, :][:, None]          # (tile, 3·tile)
    dy = cand[1, :][None, :] - q[1, :][:, None]
    dz = cand[2, :][None, :] - q[2, :][:, None]
    d2 = dx * dx + dy * dy + dz * dz

    # band distances: the candidate at sorted offset i+off for query i
    # is column tile+i+off of cand. Slicing at ±off directly produces
    # vectors with per-offset sublane layouts that Mosaic cannot
    # concatenate ("offset mismatch on non-concat dimension"); rotating
    # the whole window by -off first makes every slice [tile:2·tile] —
    # lane-aligned and layout-identical.
    inf = jnp.float32(jnp.inf)
    pack = jnp.concatenate([cand, validf], axis=0)       # (4, 3·tile)
    rows = []
    for off in range(-band, band + 1):
        # rotate left by `off` (pltpu.roll requires non-negative shifts;
        # rolling by L-off is the same rotation)
        pr = pltpu.roll(pack, (-off) % pack.shape[1], axis=1) if off else pack
        cs = pr[:3, tile:2 * tile]                       # (3, tile)
        vs = pr[3, tile:2 * tile] > 0.5                  # (tile,)
        bdx = q[0, :] - cs[0, :]
        bdy = q[1, :] - cs[1, :]
        bdz = q[2, :] - cs[2, :]
        rows.append(jnp.where(vs, bdx * bdx + bdy * bdy + bdz * bdz, inf))
    bd = jnp.stack(rows, axis=0)                         # (2·band+1, tile)
    rowi = jax.lax.broadcasted_iota(jnp.int32, bd.shape, 0)
    r2 = jnp.full((q.shape[1],), inf, jnp.float32)
    for _ in range(k):                                   # k-th smallest
        m = jnp.min(bd, axis=0)
        arg = jnp.min(jnp.where(bd == m[None, :], rowi, bd.shape[0]),
                      axis=0)
        bd = jnp.where(rowi == arg[None, :], inf, bd)    # pop exactly one
        r2 = m

    # The band bound alone over-selects (~2k mean, fat tail — far
    # candidates slip under a loose bound where Morton-adjacent is not
    # spatially adjacent). Shrink it toward the true k-th distance by
    # bisecting the radius against the FULL window count: after B
    # rounds, hi is within (r2/2^B) of the smallest radius containing
    # k candidates, and never below the true k-th (count(hi) >= k is
    # invariant). Each round is one compare + one reduction — ~6x
    # cheaper than one max-extraction round.
    d2v = jnp.where(valid, d2, inf)
    lo = jnp.zeros_like(r2)
    hi = r2
    for _ in range(6):
        mid = 0.5 * (lo + hi)
        c = jnp.sum((d2v <= mid[:, None]).astype(jnp.float32), axis=1)
        ge = c >= float(k)
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid)
    # A query with fewer than k valid band candidates keeps r2 = hi =
    # inf, and `d2v <= hi` at the call sites would then select INVALID
    # candidates (inf <= inf), feeding padding coordinates into the
    # covariance while the inflated count passes the cnt>=3 gate.
    # Clamp to the largest finite f32: every valid candidate is still
    # selected (their d2 is finite), invalid ones never are.
    hi = jnp.minimum(hi, jnp.float32(3.4e38))
    return d2v, hi


def _store_features(feat_ref, cand, sv, q):
    """Fill the (10, 3·tile) candidate-feature scratch [1, c, c⊗c] in
    per-tile-centered coordinates; returns the center (tcx, tcy, tcz).

    Covariance moments on the MXU: all ten selection-weighted raw
    moments Σ_c w·[1, c, c⊗c] are ONE matmul G = F·wᵀ against this
    feature matrix — ~18x fewer VPU flops than ten masked
    (tile, 3·tile) reductions. Per-tile centering keeps the f32
    raw-moment cancellation ~(window_extent/neighbor_spacing)²·2⁻²³ ≪ 1
    (global coordinates would be catastrophic — see CLAUDE.md MXU
    precision note); the matmul itself must run at HIGHEST precision
    for the same reason. Feature rows are STORED row-by-row into VMEM
    scratch: vector concatenation of differently-offset slices is what
    Mosaic cannot lower, stores at row offsets are plain.
    """
    nq = jnp.maximum(jnp.sum(sv), 1.0)
    tcx = jnp.sum(q[0, :] * sv[0, :]) / nq
    tcy = jnp.sum(q[1, :] * sv[0, :]) / nq
    tcz = jnp.sum(q[2, :] * sv[0, :]) / nq
    ccx = cand[0, :] - tcx
    ccy = cand[1, :] - tcy
    ccz = cand[2, :] - tcz
    feat_ref[0, :] = jnp.ones_like(ccx)
    feat_ref[1, :] = ccx
    feat_ref[2, :] = ccy
    feat_ref[3, :] = ccz
    feat_ref[4, :] = ccx * ccx
    feat_ref[5, :] = ccy * ccy
    feat_ref[6, :] = ccz * ccz
    feat_ref[7, :] = ccx * ccy
    feat_ref[8, :] = ccx * ccz
    feat_ref[9, :] = ccy * ccz
    return tcx, tcy, tcz


def _mxu_moments(feat_ref, sel):
    """G[j, q] = Σ_c sel[q, c]·feature_j[c] — one MXU matmul."""
    return jax.lax.dot_general(
        feat_ref[:], sel, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)               # (10, tile)


def _query_centered_sums(g, qx, qy, qz):
    """Shift tile-centered raw moment sums to query-centered CENTRAL
    sums S1 = Σw(c−q), S2 = Σw(c−q)(c−q)ᵀ — the frame-free form that
    makes sums from different passes (different tile centers) directly
    addable. qx/qy/qz are the query coords in the SAME tile-centered
    frame as g."""
    cnt = g[0, :]
    s1x = g[1, :] - cnt * qx
    s1y = g[2, :] - cnt * qy
    s1z = g[3, :] - cnt * qz
    s2xx = g[4, :] - 2.0 * qx * g[1, :] + cnt * qx * qx
    s2yy = g[5, :] - 2.0 * qy * g[2, :] + cnt * qy * qy
    s2zz = g[6, :] - 2.0 * qz * g[3, :] + cnt * qz * qz
    s2xy = g[7, :] - qx * g[2, :] - qy * g[1, :] + cnt * qx * qy
    s2xz = g[8, :] - qx * g[3, :] - qz * g[1, :] + cnt * qx * qz
    s2yz = g[9, :] - qy * g[3, :] - qz * g[2, :] + cnt * qy * qz
    return (cnt, s1x, s1y, s1z, s2xx, s2yy, s2zz, s2xy, s2xz, s2yz)


def _moments_band_kernel(prev_ref, self_ref, next_ref, pv_ref, sv_ref,
                         nv_ref, mom_out, feat_ref, *, k: int, band: int):
    """Band-bounded fused normal kernel — the fast selection variant.

    The exact kernel's k max-extraction rounds sweep the full
    (tile, 3·tile) distance matrix k times (~65% of its flops). This
    variant instead extracts the k-th smallest distance within a
    narrow ±band POSITIONAL window of the sorted order (2·band+1
    candidates — Morton-adjacent points are spatially adjacent, so
    this is a tight upper bound on the true window k-th distance),
    then selects every window candidate within that radius in ONE
    masked pass. The selection is a superset of the true window k-NN
    (the bound is from a subset, so all k true neighbors pass the
    radius test); the covariance simply averages over the few extra
    boundary candidates, which measured quality-neutral. The count
    lane reports the within-radius count (can exceed k); the k-th
    lane reports the negated bound, so a multi-pass caller prefers
    the pass with the TIGHTER bound. Requires band >= k so every
    valid query (invalid keys sort to the end) finds k valid band
    candidates on at least one side.
    """
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    tile = self_ref.shape[1]

    q = self_ref[:]                                     # (3, tile)
    cand = jnp.concatenate([prev_ref[:], self_ref[:], next_ref[:]],
                           axis=1)                      # (3, 3·tile)
    ok_prev = jnp.where(t > 0, pv_ref[:], 0.0)
    ok_next = jnp.where(t < n_t - 1, nv_ref[:], 0.0)
    validf = jnp.concatenate([ok_prev, sv_ref[:], ok_next],
                             axis=1)                    # (1, 3·tile)

    d2v, hi = _band_bound(q, cand, validf, k, band, tile)
    sel = (d2v <= hi[:, None]).astype(jnp.float32)
    tcx, tcy, tcz = _store_features(feat_ref, cand, sv_ref[:], q)
    g = _mxu_moments(feat_ref, sel)

    cnt_raw = g[0, :]
    n = jnp.maximum(cnt_raw, 1e-12)
    e1x = g[1, :] / n
    e1y = g[2, :] / n
    e1z = g[3, :] / n
    cxx = g[4, :] / n - e1x * e1x
    cyy = g[5, :] / n - e1y * e1y
    czz = g[6, :] / n - e1z * e1z
    cxy = g[7, :] / n - e1x * e1y
    cxz = g[8, :] / n - e1x * e1z
    cyz = g[9, :] / n - e1y * e1z
    nx, ny, nz, curv = _normal_from_cov_lanes(cxx, cyy, czz,
                                              cxy, cxz, cyz)
    mom_out[0, :] = nx
    mom_out[1, :] = ny
    mom_out[2, :] = nz
    mom_out[3, :] = curv
    mom_out[4, :] = cnt_raw
    mom_out[5, :] = -hi


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret",
                                             "band"))
def window_normals_tiles(sorted_pts_t: jnp.ndarray,
                         sorted_valid: jnp.ndarray,
                         k: int, tile: int = 256,
                         interpret: bool = False,
                         band: int = 0) -> jnp.ndarray:
    """Per-point PCA normals of the k nearest window candidates, fully
    fused (select + covariance + eigensolve in VMEM).

    sorted_pts_t: (3, N) float32 Morton-sorted transposed coordinates,
    N % tile == 0. sorted_valid: (1, N) float32. Returns (6, N) in
    sorted order: [nx, ny, nz (unit, unoriented), curvature λ0/Σλ,
    neighbor count, kth-neg-d²]. The query itself is included in its
    own neighborhood (d = 0), matching the exact-kNN normals path.

    band=0 selects the exact window k-NN (k max-extraction rounds over
    the full window); band>0 uses the ~2.5x-cheaper band-bounded radius
    selection (see _moments_band_kernel) with bound half-width
    max(band, k) positions.
    """
    n = sorted_pts_t.shape[1]
    assert n % tile == 0, "pad to a tile multiple first"
    n_tiles = n // tile
    if band:
        body = functools.partial(_moments_band_kernel, k=k,
                                 band=max(band, k))
        scratch = [pltpu.VMEM((10, 3 * tile), jnp.float32)]
    else:
        body = functools.partial(_moments_kernel, k=k)
        scratch = []

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

    (mom,) = pl.pallas_call(
        body,
        out_shape=[jax.ShapeDtypeStruct((6, n), jnp.float32)],
        grid=(n_tiles,),
        in_specs=win_specs(3) + win_specs(1),
        out_specs=[
            pl.BlockSpec((6, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(sorted_pts_t, sorted_pts_t, sorted_pts_t,
      sorted_valid, sorted_valid, sorted_valid)
    return mom


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret",
                                             "band"))
def window_union_a_tiles(sorted_pts_t, sorted_valid, k: int,
                         tile: int = 256, interpret: bool = False,
                         band: int = 16) -> jnp.ndarray:
    """Union-mode pass A (see _union_a_kernel): (11, N) query-centered
    central sums + selection radius, in sorted order."""
    n = sorted_pts_t.shape[1]
    assert n % tile == 0 and tile & (tile - 1) == 0
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

    (out,) = pl.pallas_call(
        functools.partial(_union_a_kernel, k=k, band=max(band, k)),
        out_shape=[jax.ShapeDtypeStruct((11, n), jnp.float32)],
        grid=(n_tiles,),
        in_specs=win_specs(3) + win_specs(1),
        out_specs=[pl.BlockSpec((11, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((10, 3 * tile), jnp.float32)],
        interpret=interpret,
    )(sorted_pts_t, sorted_pts_t, sorted_pts_t,
      sorted_valid, sorted_valid, sorted_valid)
    return out


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret",
                                             "band"))
def window_union_b_tiles(sorted_pts_t, sorted_valid, sorted_pos_a,
                         hi_a, k: int, tile: int = 256,
                         interpret: bool = False,
                         band: int = 16) -> jnp.ndarray:
    """Union-mode pass B (see _union_b_kernel): (11, N) blended sums +
    use_b flag, in pass-B sorted order.

    sorted_pos_a: (1, N) int32 pass-A position of each column.
    hi_a: (1, N) float32 pass-A selection radius of each column.
    """
    n = sorted_pts_t.shape[1]
    assert n % tile == 0 and tile & (tile - 1) == 0
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

    self_spec = [pl.BlockSpec((1, tile), lambda t: (0, t),
                              memory_space=pltpu.VMEM)]
    (out,) = pl.pallas_call(
        functools.partial(_union_b_kernel, k=k, band=max(band, k)),
        out_shape=[jax.ShapeDtypeStruct((11, n), jnp.float32)],
        grid=(n_tiles,),
        in_specs=win_specs(3) + win_specs(1) + win_specs(1) + self_spec,
        out_specs=[pl.BlockSpec((11, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((10, 3 * tile), jnp.float32)],
        interpret=interpret,
    )(sorted_pts_t, sorted_pts_t, sorted_pts_t,
      sorted_valid, sorted_valid, sorted_valid,
      sorted_pos_a, sorted_pos_a, sorted_pos_a,
      hi_a)
    return out


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
