"""ICP registration family: point-to-point, point-to-plane, multiscale.

TPU-native rework of threecrate-algorithms/src/registration.rs. The
reference's skeleton (registration.rs:258-370) — transform source →
KD-tree correspondences → Kabsch SVD → compose → MSE convergence — maps
onto one jitted ``lax.while_loop``:

* correspondences are a blockwise distance-matmul top-1
  (ops.neighbors.nearest_one) instead of a tree walk;
* the rigid fit is a masked, weighted Kabsch over the full fixed-shape
  correspondence set (ops.linalg.kabsch);
* the loop carries (T, mse, prev_mse, converged) and exits early on
  |ΔMSE| < threshold, mirroring the reference's convergence test
  (registration.rs:324-339) — but the whole loop lives on device, so
  there is no per-iteration host sync (the reference's GPU ICP pays two
  readbacks per iteration; we pay zero).

Point-to-plane is the Chen & Medioni linearisation
(registration.rs:395-450): per-point residual n·(Ts − t), 6×6 normal
equations accumulated as one einsum, solved by damped Cholesky, update
through the exact se(3) exponential.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.errors import InvalidDataError
from ..core.point_cloud import PointCloud
from ..core.transform import Transform, se3_exp, skew
from ..utils import padding
from . import filtering, linalg, neighbors


class ICPResult(NamedTuple):
    """Mirrors ICPResult (registration.rs:13-24)."""

    transformation: jnp.ndarray   # (4, 4)
    mse: jnp.ndarray              # scalar f32 (mean squared correspondence dist)
    iterations: jnp.ndarray       # scalar int32
    converged: jnp.ndarray        # scalar bool
    correspondences: jnp.ndarray  # scalar int32 (valid pairs at final iter)

    def as_transform(self) -> Transform:
        return Transform(self.transformation)


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    max_iterations: int = 50
    convergence_threshold: float = 1e-6
    max_correspondence_distance: Optional[float] = None


def _prep(source: PointCloud, target: PointCloud):
    if source.capacity == 0 or target.capacity == 0:
        raise InvalidDataError("ICP requires non-empty clouds")
    return (source.points, source.mask, target.points, target.mask)


CORRESPONDENCE_WINDOW_THRESHOLD = 2 ** 32  # n_src · n_tgt above which the
# exact blockwise search is replaced by the Morton-window search inside
# the ICP loop (top-1 agreement ~100% on scan data; see tests). r3:
# lowered from 2^35 — at Open3D's own 121k x 121k the window path runs
# 2.7 ms/iter vs the exact HIGHEST-precision distance matmul's ~10+,
# and the w=3 robustness suite holds from a few thousand points up;
# below ~65k x 65k products the exact matmul is effectively free


def auto_w_tiles(n_src: int, n_tgt: int, w_min: int = 3) -> int:
    """Static-sort window width (in 128-point target tiles).

    A source tile of 128 points spans ~``n_tgt/n_src`` target tiles
    when the clouds' sampling densities differ, so window containment
    requires the width to scale with the capacity ratio: the r3
    robustness suite measured w=3 exact for equal densities (partial
    overlap, 8% gross outliers, anisotropic density, corner scenes all
    recover to <4e-3) but leaving a 4.4e-3 residual at 4:1
    target:source density where w=4 is exact — and w=2 diverging
    outright (0.12). ``ceil(ratio) + 2`` keeps the equal-density
    default at 3 with the same +2 spread margin at every ratio.
    """
    import math
    ratio = n_tgt / max(n_src, 1)
    return max(w_min, min(int(math.ceil(ratio)) + 2, 16))


def _correspondence(tgt, tgt_mask, moved, src_mask, window: bool):
    if window:
        # tile=128: top-1 match rate ~99.5% at half the kernel cost of
        # tile=256; residual mismatches are near-ties the weighted
        # Kabsch fit absorbs
        return neighbors.knn_window_cross(tgt, tgt_mask, moved, src_mask,
                                          1, tile=128)
    return neighbors.knn(tgt, tgt_mask, moved, src_mask, 1)


def _static_corr_setup(src, src_mask, tgt, tgt_mask, init, max_corr_dist,
                       w_tiles, tgt_extra=None, src_extra=None, tile=128,
                       tile_stride=1):
    """Static-sort correspondence: sorts run once per CALL, not per
    iteration. Both clouds are Morton-sorted here, outside the
    while_loop: the target never moves, and the SOURCE sort stays
    spatially coherent under the rigid motion ICP applies ("nearby
    in array ⇒ nearby in space" is motion-invariant), so neither
    sort ever goes stale. The round-1 formulation re-sorted the 2M
    src∪tgt union twice per iteration — 46 ms/iter at 1M; this one
    runs the matching kernel from fixed sorted arrays with a
    data-dependent target window (searchsorted tile-mean keys →
    scalar-prefetch BlockSpecs) — no per-iteration sorts at all.

    tgt_extra: optional (Nt, E) per-target payload (e.g. normals or
    covariance columns), matched through the kernel's one-hot gather.
    src_extra: optional (Ns, F) per-source payload reordered ONCE into
    the source-sorted order (a row gather off the sort permutation).

    Returns ``(match, src_extra_sorted)`` where
    ``match(t_mat) -> (moved, matched, ok, d2, extra)`` over
    source-sorted rows: ``ok`` combines window validity, a 16x-median
    trimmed-ICP gate (per-tile windows are approximate near Morton
    discontinuities; the gate drops exactly those gross mismatches
    while keeping every genuine correspondence) and the user's
    max_correspondence_distance; downstream reductions must be
    order-independent (weighted sums), never order-restoring.

    tile_stride > 1 keeps every ``tile_stride``-th source TILE after
    the sort (the KISS-ICP source-subsampling trick, kiss_icp.rs:72-96,
    recast for the static-sort search): subsampling whole Morton tiles
    — not strided points — preserves each tile's full local density,
    so the window width needed for containment is unchanged while the
    kernel grid (and every per-point cost in the loop) shrinks by the
    stride. Kept tiles are spatially spread across the whole cloud
    (consecutive Morton tiles are spatial neighbors). Two setups that
    differ only in tile_stride share their sorts via XLA CSE.
    """
    from ..kernels.icp_pallas import icp_match_tiles
    from . import morton

    interp = jax.default_backend() != "tpu"
    ns_pad = padding.round_up(src.shape[0], tile)
    nt_pad = max(padding.round_up(tgt.shape[0], tile), w_tiles * tile)
    src_p = jnp.pad(src.astype(jnp.float32),
                    ((0, ns_pad - src.shape[0]), (0, 0)))
    sm_p = jnp.pad(src_mask, (0, ns_pad - src.shape[0]))
    tgt_p = jnp.pad(tgt.astype(jnp.float32),
                    ((0, nt_pad - tgt.shape[0]), (0, 0)))
    tm_p = jnp.pad(tgt_mask, (0, nt_pad - tgt.shape[0]))

    mn_t, scale_t = morton.frame(tgt_p, tm_p)
    keys_t = morton.keys_in_frame(tgt_p, tm_p, mn_t, scale_t)
    ops = [keys_t, tgt_p[:, 0], tgt_p[:, 1], tgt_p[:, 2],
           tm_p.astype(jnp.float32)]
    n_extra = 0 if tgt_extra is None else tgt_extra.shape[1]
    if n_extra:
        ex_p = jnp.pad(tgt_extra.astype(jnp.float32),
                       ((0, nt_pad - tgt_extra.shape[0]), (0, 0)))
        ops += [ex_p[:, j] for j in range(n_extra)]
    sorted_ops = jax.lax.sort(tuple(ops), num_keys=1)
    keys_t_sorted, tx, ty, tz, tvf = sorted_ops[:5]
    # packed target rows [x, y, z, valid, extra...] — one DMA per
    # window tile inside the kernel. Invalid targets get SENTINEL
    # coordinates whose d² overflows to +inf, so the kernel never
    # touches the valid row (saves two sweeps of its distance matrix).
    bad = tvf < 0.5
    sent = jnp.float32(2e19)
    tgt_packed = jnp.stack(
        [jnp.where(bad, sent, tx), jnp.where(bad, sent, ty),
         jnp.where(bad, sent, tz), tvf] + list(sorted_ops[5:]), axis=0)
    # source sorted ONCE at its init pose, in the TARGET's lattice
    # (aligned lattices keep src tiles contiguous in target order);
    # the iota payload is only carried when a src_extra needs the
    # permutation (extra sort operands cost real time at 1M)
    src_init = linalg.transform_points(init, src_p)
    keys_s = morton.keys_in_frame(src_init, sm_p, mn_t, scale_t)
    src_ops = [keys_s, src_p[:, 0], src_p[:, 1], src_p[:, 2],
               sm_p.astype(jnp.float32)]
    if src_extra is not None:
        src_ops.append(jnp.arange(ns_pad, dtype=jnp.int32))
    sorted_s = jax.lax.sort(tuple(src_ops), num_keys=1)
    _, sx, sy, sz, svf = sorted_s[:5]
    src_sorted = jnp.stack([sx, sy, sz], axis=1)      # (Ns, 3)
    src_extra_sorted = None
    if src_extra is not None:
        sx_p = jnp.pad(src_extra.astype(jnp.float32),
                       ((0, ns_pad - src_extra.shape[0]), (0, 0)))
        src_extra_sorted = sx_p[sorted_s[5]]          # one-time row gather
    n_src_tiles = ns_pad // tile
    if tile_stride > 1:
        tile_stride = min(tile_stride, n_src_tiles)
        src_sorted = src_sorted.reshape(n_src_tiles, tile, 3)[
            ::tile_stride].reshape(-1, 3)
        svf = svf.reshape(n_src_tiles, tile)[::tile_stride].reshape(-1)
        if src_extra_sorted is not None:
            src_extra_sorted = src_extra_sorted.reshape(
                n_src_tiles, tile, -1)[::tile_stride].reshape(
                    -1, src_extra_sorted.shape[1])
        n_src_tiles = src_sorted.shape[0] // tile
    n_tgt_tiles = nt_pad // tile
    max_d2 = max_corr_dist * max_corr_dist
    # 1/scale_t = lattice cell size; GRID cells span the cloud extent
    extent = morton.GRID / scale_t
    noise_floor = (3e-6 * extent) ** 2

    svf_tiles = svf.reshape(n_src_tiles, tile)
    tile_w = jnp.maximum(jnp.sum(svf_tiles, axis=1), 1e-6)

    def match(t_mat):
        moved = linalg.transform_points(t_mat, src_sorted)
        # window placement: searchsorted of the tile-MEAN moved key.
        # (A min/max-key midpoint variant measured BETTER containment
        # at the identity pose — 95% vs 88% at w=4 — but diverged over
        # iterations on hardware: tile min/max keys are outlier-
        # sensitive once the pose wanders, and the per-point key
        # encode cost ~1 ms/iter. The mean is cheap and trajectory-
        # stable; misses are handled by the trimming gate.)
        reps = jnp.sum(moved.reshape(n_src_tiles, tile, 3)
                       * svf_tiles[:, :, None], axis=1) / tile_w[:, None]
        rep_keys = morton.keys_in_frame(
            reps, jnp.ones(n_src_tiles, bool), mn_t, scale_t)
        pos = jnp.searchsorted(keys_t_sorted, rep_keys)
        blk = jnp.clip(pos // tile - (w_tiles - 1) // 2, 0,
                       max(n_tgt_tiles - w_tiles, 0)).astype(jnp.int32)
        src_packed = jnp.concatenate([moved.T, svf[None, :]], axis=0)
        out = icp_match_tiles(src_packed, tgt_packed, blk, tile=tile,
                              interpret=interp, w_tiles=w_tiles)
        matched = out[0:3].T                           # (Ns, 3)
        w_raw = out[3] > 0.5
        extra = out[4:4 + n_extra] if n_extra else None
        # exact d² from the matched coordinates (the kernel's
        # expanded-form distances select correctly but cannot
        # resolve the tiny residuals near convergence)
        diff = moved - matched
        d2 = jnp.where(w_raw, jnp.sum(diff * diff, axis=1), jnp.inf)
        # median over a strided 64k sample — statistically identical
        # for an order-of-magnitude gate, ~16x cheaper than sorting
        # the full array every iteration
        stride = max(d2.shape[0] // 65536, 1)
        med = jnp.percentile(jnp.where(w_raw, d2, jnp.inf)[::stride],
                             50.0)
        # The gate needs an absolute floor: at exact convergence d² is
        # pure f32 rounding noise (~(eps·coord)², position-dependent),
        # and 16x its median is a gate that keeps an ever-shrinking,
        # spatially biased subset — measured on hardware to degenerate
        # the Kabsch fit around iteration ~15 and kick the pose into a
        # limit cycle. The floor (~(3e-6·extent)²) is far above the
        # noise, far below any real mismatch (≥ neighbor spacing²).
        gate = jnp.maximum(16.0 * med, noise_floor)    # inf-safe
        ok = w_raw & (d2 <= gate) & (d2 <= max_d2)
        return moved, matched, ok, d2, extra

    return match, src_extra_sorted


@functools.partial(jax.jit, static_argnames=("max_iterations", "window",
                                             "w_tiles", "tile",
                                             "subsample", "full_iters"))
def _icp_p2p(src, src_mask, tgt, tgt_mask, init, max_iterations,
             conv_thresh, max_corr_dist, window=False, w_tiles=3,
             tile=128, subsample=1, full_iters=2):
    n = src.shape[0]

    if window:
        static_match, _ = _static_corr_setup(src, src_mask, tgt, tgt_mask,
                                             init, max_corr_dist, w_tiles,
                                             tile=tile)
        static_match_sub = None
        if subsample > 1:
            # coarse phase: every subsample-th source TILE (full local
            # density, so w_tiles containment is untouched); the two
            # setups share their sorts via XLA CSE
            static_match_sub, _ = _static_corr_setup(
                src, src_mask, tgt, tgt_mask, init, max_corr_dist,
                w_tiles, tile=tile, tile_stride=subsample)

    def corr_and_fit(t_mat, match_fn):
        if window:
            moved, matched, ok, d2, _ = match_fn(t_mat)
            w = ok.astype(jnp.float32)
            delta = linalg.kabsch(moved, matched, w)
            n_ok = jnp.maximum(jnp.sum(w), 1.0)
            mse = jnp.sum(jnp.where(ok, d2, 0.0)) / n_ok
            return delta, mse, jnp.sum(ok).astype(jnp.int32)
        moved = linalg.transform_points(t_mat, src)
        res = _correspondence(tgt, tgt_mask, moved, src_mask, False)
        idx = res.indices[:, 0]
        dist = res.distances[:, 0]
        ok = res.mask[:, 0] & src_mask
        ok = ok & (dist <= max_corr_dist)
        w = ok.astype(jnp.float32)
        delta = linalg.kabsch(moved, tgt[idx], w)
        d2 = jnp.where(ok, dist * dist, 0.0)
        n_ok = jnp.maximum(jnp.sum(w), 1.0)
        mse = jnp.sum(d2) / n_ok
        return delta, mse, jnp.sum(ok).astype(jnp.int32)

    def run_loop(state0, match_fn, it_budget):
        def cond(state):
            t_mat, prev_mse, mse, it, conv, n_corr = state
            return (it < it_budget) & (~conv)

        def body(state):
            t_mat, prev_mse, mse, it, conv, _ = state
            delta, new_mse, n_corr = corr_and_fit(t_mat, match_fn)
            new_t = jnp.matmul(delta, t_mat,
                               precision=jax.lax.Precision.HIGHEST)
            converged = jnp.abs(new_mse - mse) < conv_thresh
            return (new_t, mse, new_mse, it + 1, converged, n_corr)

        return jax.lax.while_loop(cond, body, state0)

    init_state = (init, jnp.float32(jnp.inf), jnp.float32(jnp.inf),
                  jnp.int32(0), jnp.bool_(False), jnp.int32(0))
    if window and subsample > 1 and max_iterations > full_iters:
        # phase A: subsampled correspondences until convergence (on the
        # subset's MSE) or the coarse budget; phase B: full-resolution
        # polish for the remaining iterations. Phase B restarts the
        # convergence test (inf sentinels) because the subset MSE and
        # the full MSE are not comparable level sets.
        coarse = run_loop(init_state, static_match_sub,
                          max_iterations - full_iters)
        t_a, _, _, it_a, _, _ = coarse
        state_b = (t_a, jnp.float32(jnp.inf), jnp.float32(jnp.inf),
                   it_a, jnp.bool_(False), jnp.int32(0))
        t_mat, _, mse, it, conv, n_corr = run_loop(
            state_b, static_match, max_iterations)
    else:
        t_mat, _, mse, it, conv, n_corr = run_loop(
            init_state, static_match if window else None, max_iterations)
    return t_mat, mse, it, conv, n_corr


def _use_window(source: PointCloud, target: PointCloud,
                correspondence: str) -> bool:
    if correspondence == "window":
        return True
    if correspondence == "exact":
        return False
    return (source.capacity * target.capacity
            > CORRESPONDENCE_WINDOW_THRESHOLD)


def auto_subsample(n_src: int) -> int:
    """Coarse-phase source tile stride ladder (measured r4 on v5e at
    1M x 1M, 20 it: stride 1/4/8 = 11.41/5.47/3.83 ms/iter with
    Rx-tilt recovery IDENTICAL at ~3e-6; at 121k stride 2 = 1.90 vs
    2.53). The coarse phase keeps >= ~50k matched points at every
    rung, far above the Kabsch fit's needs, and the last two
    iterations always polish at full resolution."""
    if n_src >= 800_000:
        return 8
    if n_src >= 200_000:
        return 4
    if n_src >= 50_000:
        return 2
    return 1


def icp_point_to_point(source: PointCloud, target: PointCloud,
                       max_iterations: int = 50,
                       convergence_threshold: float = 1e-6,
                       max_correspondence_distance: Optional[float] = None,
                       init: Optional[Transform] = None,
                       correspondence: str = "auto",
                       w_tiles: Optional[int] = None,
                       subsample: Optional[int] = None,
                       full_iters: int = 2) -> ICPResult:
    """icp_detailed (registration.rs:258-370), fully on-device.

    ``correspondence``: "exact" (blockwise brute force), "window"
    (Morton union-sort search — the large-N fast path), or "auto"
    (window above ~180k x 180k pair products).

    ``w_tiles``: candidate window width of the static-sort search, in
    128-point target tiles; None (default) = ``auto_w_tiles`` — 3 at
    equal densities (runs ~8% faster per iteration than the old
    fixed 4 with identical recovery across the robustness suite:
    partial overlap, gross outliers, anisotropic density, corner
    scenes — tests/test_registration.py::TestWindowRobustness),
    scaled up with the target:source capacity ratio where window
    containment demands it. Containment drops 84→79% going 4→3; the
    trimmed-Kabsch gate absorbs exactly those misses.

    ``subsample``: coarse-phase source TILE stride (KISS-ICP's
    source-subsampling idea, kiss_icp.rs:72-96): all but the last
    ``full_iters`` iterations match every ``subsample``-th Morton
    source tile (full local density — window containment unchanged),
    then the pose is polished at full resolution. None (default) =
    ``auto_subsample`` — 4 above 400k points, off below. 1 disables.
    """
    src, sm, tgt, tm = _prep(source, target)
    if w_tiles is None:
        w_tiles = auto_w_tiles(source.capacity, target.capacity)
    window = _use_window(source, target, correspondence)
    if subsample is None:
        subsample = auto_subsample(source.capacity) if window else 1
    init_m = init.matrix if init is not None else jnp.eye(4, dtype=jnp.float32)
    mcd = jnp.float32(max_correspondence_distance
                      if max_correspondence_distance is not None else jnp.inf)
    t, mse, it, conv, n_corr = _icp_p2p(
        src, sm, tgt, tm, init_m, max_iterations,
        jnp.float32(convergence_threshold), mcd,
        window, w_tiles=w_tiles, subsample=subsample,
        full_iters=full_iters)
    return ICPResult(t, mse, it, conv, n_corr)


def icp(source: PointCloud, target: PointCloud,
        max_iterations: int = 50, **kw) -> ICPResult:
    """Convenience entry matching icp() (registration.rs:232-242)."""
    return icp_point_to_point(source, target, max_iterations, **kw)


# ---------------------------------------------------------------------------
# point-to-plane
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_iterations", "window",
                                             "w_tiles", "subsample",
                                             "full_iters"))
def _icp_p2plane(src, src_mask, tgt, tgt_mask, tgt_normals, init,
                 max_iterations, conv_thresh, max_corr_dist, window=False,
                 w_tiles=3, subsample=1, full_iters=2):
    if window:
        # static-sort path: target normals ride the target sort and the
        # kernel's one-hot match (3 extra payload rows)
        static_match, _ = _static_corr_setup(src, src_mask, tgt, tgt_mask,
                                             init, max_corr_dist, w_tiles,
                                             tgt_extra=tgt_normals)
        static_match_sub = None
        if subsample > 1:
            static_match_sub, _ = _static_corr_setup(
                src, src_mask, tgt, tgt_mask, init, max_corr_dist,
                w_tiles, tgt_extra=tgt_normals, tile_stride=subsample)

    def step(t_mat, match_fn):
        if window:
            moved, q, ok, d2, extra = match_fn(t_mat)
            nrm = extra.T                                 # (Ns, 3)
            w = ok.astype(jnp.float32)
            r = jnp.sum((moved - q) * nrm, axis=1)
            return _p2plane_fit(moved, nrm, r, w, ok)
        moved = linalg.transform_points(t_mat, src)
        res = _correspondence(tgt, tgt_mask, moved, src_mask, window)
        idx = res.indices[:, 0]
        dist = res.distances[:, 0]
        ok = res.mask[:, 0] & src_mask & (dist <= max_corr_dist)
        w = ok.astype(jnp.float32)
        q = tgt[idx]
        nrm = tgt_normals[idx]
        r = jnp.sum((moved - q) * nrm, axis=1)           # signed plane dist
        return _p2plane_fit(moved, nrm, r, w, ok)

    def _p2plane_fit(moved, nrm, r, w, ok):
        a = jnp.concatenate([jnp.cross(moved, nrm), nrm], axis=1)  # (N, 6)
        aw = a * w[:, None]
        hi = jax.lax.Precision.HIGHEST
        h = jnp.matmul(aw.T, a, precision=hi)             # 6x6 (one matmul)
        g = -jnp.matmul(aw.T, r, precision=hi)
        xi = linalg.solve_psd(h, g, damping=1e-6)
        delta = se3_exp(xi)
        n_ok = jnp.maximum(jnp.sum(w), 1.0)
        mse = jnp.sum(jnp.where(ok, r * r, 0.0)) / n_ok
        return delta, mse, jnp.sum(ok).astype(jnp.int32)

    def run_loop(state0, match_fn, it_budget):
        def cond(state):
            _, _, _, it, conv, _ = state
            return (it < it_budget) & (~conv)

        def body(state):
            t_mat, prev, mse, it, conv, _ = state
            delta, new_mse, n_corr = step(t_mat, match_fn)
            converged = jnp.abs(new_mse - mse) < conv_thresh
            new_t = jnp.matmul(delta, t_mat,
                               precision=jax.lax.Precision.HIGHEST)
            return (new_t, mse, new_mse, it + 1, converged, n_corr)

        return jax.lax.while_loop(cond, body, state0)

    state0 = (init, jnp.float32(jnp.inf), jnp.float32(jnp.inf),
              jnp.int32(0), jnp.bool_(False), jnp.int32(0))
    if window and subsample > 1 and max_iterations > full_iters:
        coarse = run_loop(state0, static_match_sub,
                          max_iterations - full_iters)
        t_a, _, _, it_a, _, _ = coarse
        state_b = (t_a, jnp.float32(jnp.inf), jnp.float32(jnp.inf),
                   it_a, jnp.bool_(False), jnp.int32(0))
        t_mat, _, mse, it, conv, n_corr = run_loop(
            state_b, static_match, max_iterations)
    else:
        t_mat, _, mse, it, conv, n_corr = run_loop(
            state0, static_match if window else None, max_iterations)
    return t_mat, mse, it, conv, n_corr


def icp_point_to_plane(source: PointCloud, target: PointCloud,
                       max_iterations: int = 50,
                       convergence_threshold: float = 1e-6,
                       max_correspondence_distance: Optional[float] = None,
                       init: Optional[Transform] = None,
                       correspondence: str = "auto",
                       w_tiles: Optional[int] = None,
                       subsample: Optional[int] = None,
                       full_iters: int = 2) -> ICPResult:
    """Chen & Medioni point-to-plane ICP (registration.rs:395-450,
    loop :508-602). Target must carry normals (estimate_normals first).
    ``w_tiles``/``subsample`` as in icp_point_to_point (None = auto)."""
    if target.normals is None:
        raise InvalidDataError(
            "point-to-plane ICP requires target normals; run "
            "ops.normals.estimate_normals(target) first")
    src, sm, tgt, tm = _prep(source, target)
    if w_tiles is None:
        w_tiles = auto_w_tiles(source.capacity, target.capacity)
    window = _use_window(source, target, correspondence)
    if subsample is None:
        subsample = auto_subsample(source.capacity) if window else 1
    init_m = init.matrix if init is not None else jnp.eye(4, dtype=jnp.float32)
    mcd = jnp.float32(max_correspondence_distance
                      if max_correspondence_distance is not None else jnp.inf)
    t, mse, it, conv, n_corr = _icp_p2plane(
        src, sm, tgt, tm, target.normals, init_m, max_iterations,
        jnp.float32(convergence_threshold), mcd,
        window, w_tiles=w_tiles, subsample=subsample,
        full_iters=full_iters)
    return ICPResult(t, mse, it, conv, n_corr)


# ---------------------------------------------------------------------------
# multiscale (coarse-to-fine voxel pyramid)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# batched ICP (many pairs at once)
# ---------------------------------------------------------------------------

def batch_icp(sources, source_masks, targets, target_masks,
              max_iterations: int = 30,
              convergence_threshold: float = 1e-6,
              max_correspondence_distance: Optional[float] = None):
    """Register B cloud pairs in one vmapped program.

    Replaces the reference's BatchICPJob/BatchICPResult queue
    (threecrate-gpu/src/icp.rs:134-166): instead of sequentially
    dispatched GPU jobs, the whole batch is a leading vmap dim — one
    compile, B solves in parallel on the MXU.

    Args: sources (B, N, 3), source_masks (B, N), targets (B, M, 3),
    target_masks (B, M). Returns ICPResult with leading batch dims.
    """
    mcd = jnp.float32(max_correspondence_distance
                      if max_correspondence_distance is not None else jnp.inf)
    eye = jnp.eye(4, dtype=jnp.float32)

    def one(src, sm, tgt, tm):
        return _icp_p2p(src, sm, tgt, tm, eye, max_iterations,
                        jnp.float32(convergence_threshold), mcd)

    t, mse, it, conv, n_corr = jax.vmap(one)(
        jnp.asarray(sources, jnp.float32), jnp.asarray(source_masks),
        jnp.asarray(targets, jnp.float32), jnp.asarray(target_masks))
    return ICPResult(t, mse, it, conv, n_corr)


@dataclasses.dataclass(frozen=True)
class MultiscaleConfig:
    """Mirrors the coarse-to-fine defaults (registration.rs:28-71)."""

    voxel_levels: Sequence[float] = (0.20, 0.10, 0.05)
    iterations_per_level: int = 20
    final_full_res_iterations: int = 15
    convergence_threshold: float = 1e-6


def multiscale_icp_point_to_point(source: PointCloud, target: PointCloud,
                                  config: MultiscaleConfig = MultiscaleConfig(),
                                  init: Optional[Transform] = None
                                  ) -> ICPResult:
    """multiscale_icp_point_to_point (registration.rs:704-789): run ICP
    on a voxel pyramid coarse→fine, then refine at full resolution.
    The per-level ICPs are jitted; the pyramid loop is host-side (it is
    O(levels) jit dispatches, nothing per-point)."""
    current = init if init is not None else Transform.identity()
    result = None
    for voxel in config.voxel_levels:
        src_d = filtering.voxel_grid_filter(source, voxel)
        tgt_d = filtering.voxel_grid_filter(target, voxel)
        result = icp_point_to_point(
            src_d, tgt_d, config.iterations_per_level,
            config.convergence_threshold,
            max_correspondence_distance=voxel * 5.0, init=current)
        current = Transform(result.transformation)
    final = icp_point_to_point(
        source, target, config.final_full_res_iterations,
        config.convergence_threshold, init=current)
    return final
