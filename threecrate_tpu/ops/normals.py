"""Normal estimation by local PCA — the reference benchmark's weak spot.

TPU-native rework of threecrate-algorithms/src/normals.rs:238-357. The
reference builds a KD-tree, then rayon-fans per-point: tree traversal →
3x3 covariance → nalgebra ``symmetric_eigen`` → viewpoint flip. That
per-point pipeline is why it trails Open3D 0.57× (docs/benchmarks.md).

Here the whole cloud is processed as four fused array ops:
1. one blockwise-matmul kNN (ops.neighbors) — MXU;
2. one gather of neighbor coordinates (N, k, 3) — HBM bandwidth;
3. batched covariance via einsum — MXU;
4. closed-form smallest-eigenvector (ops.linalg.eigh3x3) — VPU
   elementwise, a few hundred flops per point, no LAPACK anywhere.

Orientation matches the reference: flip toward a viewpoint, default =
bbox center raised by the z-extent (normals.rs:275-303, :208-222).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.point_cloud import PointCloud
from ..utils import padding
from . import linalg, neighbors


@dataclasses.dataclass(frozen=True)
class NormalEstimationConfig:
    """Mirrors NormalEstimationConfig (normals.rs:17-37).

    ``method``: "exact" = blockwise brute-force kNN; "window" = Morton
    sliding-window kNN with union-merged passes (near-exact: ~0.1 deg
    mean / sub-degree p99 vs exact); "window_fast" = the fully-fused
    window kernel (select + covariance + eigensolve in VMEM, 2 passes,
    per-point pick-tighter-window; ~1.5x faster than "window"). On
    outdoor-scan-like data "window_fast" matches exact-kNN quality
    (0.12 deg mean, noise-dominated), but it inherits the quality of
    the BEST single pass rather than the union: where per-pass window
    recall drops (thin noisy slabs whose thickness ~ point spacing),
    the union merge repairs it — hence "window_fast" is opt-in.
    (Round-2's "~1% tail to ~15 deg on noise-free surfaces" claim for
    pick-tighter was an artifact of the eigensolver scale bug; the
    honest re-measure is p99 0.91 deg tighter vs 0.76 deg union.)
    "auto" picks "window" above ``AUTO_WINDOW_THRESHOLD`` points.
    """

    k_neighbors: int = 10
    radius: Optional[float] = None     # when set: radius search, k-NN capacity
    consistent_orientation: bool = True
    viewpoint: Optional[Tuple[float, float, float]] = None
    method: str = "auto"
    # "window_fast" only: number of Morton passes. 2 (default) matches
    # exact-kNN quality on noisy scans; 1 is faster (61 vs 95 ms at 1M
    # on v5e) at looser quality on scan data.
    window_passes: int = 2
    # "window_fast" only: how the two passes combine. "tighter" keeps
    # the pass with the tighter selection radius per point; "union"
    # (in-kernel 2-window union, _estimate_window_union) additionally
    # repairs points whose window is partial in one pass — closest to
    # the near-exact "window" method at fused-kernel speed.
    window_merge: str = "tighter"


AUTO_WINDOW_THRESHOLD = 65536


class NormalResult(NamedTuple):
    normals: jnp.ndarray     # (N, 3) unit normals (0 where invalid)
    curvature: jnp.ndarray   # (N,) surface variation λ0/(λ0+λ1+λ2)
    valid: jnp.ndarray       # (N,) bool: enough neighbors for a plane fit


def _pca_normals(nbr_pts, nbr_ok, query_pts, viewpoint, orient):
    """Covariance → smallest eigenvector → orientation, via explicit
    component sums (six fused (N, k) reductions)."""
    w = nbr_ok.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1e-12)
    x = nbr_pts[..., 0]
    y = nbr_pts[..., 1]
    z = nbr_pts[..., 2]
    mx_ = jnp.sum(x * w, 1) / wsum
    my_ = jnp.sum(y * w, 1) / wsum
    mz_ = jnp.sum(z * w, 1) / wsum
    dx = x - mx_[:, None]
    dy = y - my_[:, None]
    dz = z - mz_[:, None]
    cxx = jnp.sum(dx * dx * w, 1) / wsum
    cyy = jnp.sum(dy * dy * w, 1) / wsum
    czz = jnp.sum(dz * dz * w, 1) / wsum
    cxy = jnp.sum(dx * dy * w, 1) / wsum
    cxz = jnp.sum(dx * dz * w, 1) / wsum
    cyz = jnp.sum(dy * dz * w, 1) / wsum
    cov = jnp.stack([
        jnp.stack([cxx, cxy, cxz], -1),
        jnp.stack([cxy, cyy, cyz], -1),
        jnp.stack([cxz, cyz, czz], -1)], -2)
    normal, _ = linalg.smallest_eigenvector_sym3x3(cov)
    vals = linalg.eigvals_sym3x3(cov)
    tot = jnp.maximum(jnp.sum(vals, axis=-1), 1e-12)
    curvature = jnp.maximum(vals[..., 0], 0.0) / tot
    if orient:
        to_vp = viewpoint[None, :] - query_pts
        flip = jnp.sum(normal * to_vp, axis=-1) < 0
        normal = jnp.where(flip[:, None], -normal, normal)
    return normal, curvature


@functools.partial(jax.jit, static_argnames=("k", "orient"))
def _estimate_window_fused(points, mask, k, viewpoint, orient):
    """Scatter-free window-normals pipeline: all heavy work happens in
    pass-A sorted order (profiling showed the order-restoring (N, k)
    scatters dominated the whole pipeline); only the three small
    per-point outputs scatter back at the end."""
    neg, ids, pts_a, mask_a, perm_a = neighbors.knn_window_sorted(
        points, mask, k, tile=128, n_passes=2)
    nbr_ok = neg > -jnp.inf
    nbr_pts = points[jnp.clip(ids, 0, points.shape[0] - 1)]
    normal_s, curv_s = _pca_normals(nbr_pts, nbr_ok, pts_a, viewpoint,
                                    orient)
    valid_s = mask_a & (jnp.sum(nbr_ok, axis=1) >= 3)
    normal_s = jnp.where(valid_s[:, None], normal_s, 0.0)
    curv_s = jnp.where(valid_s, curv_s, 0.0)

    # restore input order via one payload sort keyed by the original
    # row id — measured ~8 ms device vs ~54 ms for the equivalent
    # (N, 3)+(N)+(N) scatters at 1M
    n = points.shape[0]
    _, nx, ny, nz, curv, vf = jax.lax.sort(
        (perm_a, normal_s[:, 0], normal_s[:, 1], normal_s[:, 2], curv_s,
         valid_s.astype(jnp.float32)), num_keys=1)
    normal = jnp.stack([nx, ny, nz], axis=1)[:n]
    return normal, curv[:n], (vf[:n] > 0.5) & mask


@functools.partial(jax.jit, static_argnames=("k", "orient", "tile",
                                             "n_passes", "band"))
def _estimate_window_moments(points, mask, k, viewpoint, orient,
                             tile=256, n_passes=2, band=16):
    """Fully-fused, fully sort-resident window normals.

    The pallas kernel selects each point's k window neighbors,
    accumulates their query-centered covariance and solves the smallest
    eigenpair entirely in VMEM, emitting just (6, N): normal, curvature,
    count, k-th distance. The pipeline never gathers or scatters —
    profiling showed the (N, 3) order-restoring scatters cost ~54 ms
    and the XLA-side covariance+eigensolve ~58 ms at 1M, vs ~8 ms for
    a payload-carrying device sort:

    * pass A: one sort carries coordinates + mask + original row id;
    * pass B: re-sorts pass-A columns by the shifted Morton key with
      the pass-A row index as payload; its kernel output rides a third
      sort (key = pass-A row) back into pass-A order;
    * per point, keep whichever pass found the TIGHTER neighborhood
      (more neighbors, then smaller k-th distance) — outputs of
      different passes cannot be union-merged;
    * one final sort (key = original row id) restores input order.
    """
    from ..kernels.knn_pallas import window_normals_tiles
    from . import morton

    n = points.shape[0]
    n_pad = padding.round_up(n, tile)
    pts = points.astype(jnp.float32)
    if n_pad != n:
        pts = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
        mask_p = jnp.pad(mask, (0, n_pad - n))
    else:
        mask_p = mask
    interp = jax.default_backend() != "tpu"
    keys = morton.morton_keys(pts, mask_p, pass_index=0)
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    _, ax, ay, az, am, perm_a = jax.lax.sort(
        (keys, pts[:, 0], pts[:, 1], pts[:, 2],
         mask_p.astype(jnp.float32), iota), num_keys=1)
    out = window_normals_tiles(
        jnp.stack([ax, ay, az], axis=0), am[None, :], k, tile,
        interpret=interp, band=band)

    pts_a_rows = jnp.stack([ax, ay, az], axis=1)
    for p in range(1, n_passes):
        keys_b = morton.morton_keys(pts_a_rows, am > 0.5, pass_index=p)
        _, bx, by, bz, bm, row_a = jax.lax.sort(
            (keys_b, ax, ay, az, am, iota), num_keys=1)
        out_b = window_normals_tiles(
            jnp.stack([bx, by, bz], axis=0), bm[None, :], k, tile,
            interpret=interp, band=band)
        # ride pass-B outputs back to pass-A order as sort payloads
        _, b0, b1, b2, b3, b4, b5 = jax.lax.sort(
            (row_a, out_b[0], out_b[1], out_b[2], out_b[3], out_b[4],
             out_b[5]), num_keys=1)
        out_b_a = jnp.stack([b0, b1, b2, b3, b4, b5], axis=0)
        # pick-tighter: prefer the pass that found k neighbors (band
        # selection can report counts > k — more is NOT tighter there),
        # then the smaller k-th distance / radius bound
        ca = jnp.minimum(out[4], float(k))
        cb = jnp.minimum(out_b_a[4], float(k))
        better = (cb > ca) | ((cb == ca) & (out_b_a[5] > out[5]))
        out = jnp.where(better[None, :], out_b_a, out)

    normal_s = jnp.stack([out[0], out[1], out[2]], axis=1)
    curv_s = out[3]
    valid_s = (am > 0.5) & (out[4] >= 3)
    if orient:
        to_vp = viewpoint[None, :] - pts_a_rows
        flip = jnp.sum(normal_s * to_vp, axis=-1) < 0
        normal_s = jnp.where(flip[:, None], -normal_s, normal_s)
    normal_s = jnp.where(valid_s[:, None], normal_s, 0.0)
    curv_s = jnp.where(valid_s, curv_s, 0.0)

    # restore input order: one more payload sort keyed by original row
    _, nx, ny, nz, curv, vf = jax.lax.sort(
        (perm_a, normal_s[:, 0], normal_s[:, 1], normal_s[:, 2], curv_s,
         valid_s.astype(jnp.float32)), num_keys=1)
    normal = jnp.stack([nx, ny, nz], axis=1)[:n]
    return normal, curv[:n], (vf[:n] > 0.5) & mask


@functools.partial(jax.jit, static_argnames=("k", "tile", "band"))
def _union_window_sums(points, mask, k, tile=256, band=16):
    """The fused 2-window UNION pipeline up to the merged central sums.

    Returns ``(s, pts_a_rows, am, perm_a)`` in pass-A sorted order over
    the padded capacity: s (N, 10) = [count, Σc (3), Σc⊗c (6)] of each
    point's ~k-NN window neighborhood (query-centered — see the union
    kernels), pts_a_rows the sorted coordinates, am the sorted validity
    (float), perm_a the original row of each sorted row. Shared by
    normal estimation and GICP's per-point covariances (gicp.py), which
    only differ in what they do with the moments.
    """
    from ..kernels.knn_pallas import (window_union_a_tiles,
                                      window_union_b_tiles)
    from . import morton

    n = points.shape[0]
    n_pad = padding.round_up(n, tile)
    pts = points.astype(jnp.float32)
    if n_pad != n:
        pts = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
        mask_p = jnp.pad(mask, (0, n_pad - n))
    else:
        mask_p = mask
    interp = jax.default_backend() != "tpu"
    iota = jnp.arange(n_pad, dtype=jnp.int32)

    keys_a = morton.morton_keys(pts, mask_p, pass_index=0)
    _, ax, ay, az, am, perm_a = jax.lax.sort(
        (keys_a, pts[:, 0], pts[:, 1], pts[:, 2],
         mask_p.astype(jnp.float32), iota), num_keys=1)
    out_a = window_union_a_tiles(
        jnp.stack([ax, ay, az], axis=0), am[None, :], k, tile,
        interpret=interp, band=band)                     # (11, N) A-order

    pts_a_rows = jnp.stack([ax, ay, az], axis=1)
    keys_b = morton.morton_keys(pts_a_rows, am > 0.5, pass_index=1)
    _, bx, by, bz, bm, row_a, hia_b = jax.lax.sort(
        (keys_b, ax, ay, az, am, iota, out_a[10]), num_keys=1)
    out_b = window_union_b_tiles(
        jnp.stack([bx, by, bz], axis=0), bm[None, :], row_a[None, :],
        hia_b[None, :], k, tile, interpret=interp, band=band)  # (11, N)

    # realign pass-B output to A-order by inverse-permutation row
    # gather ((N, 11) rows — cheaper than a payload sort, whose
    # operand count explodes XLA compile time)
    _, inv_b = jax.lax.sort((row_a, iota), num_keys=1)
    sb = out_b.T[inv_b]                                  # (N, 11) A-order

    # kernel B already blended: final = S_out + (1 − use_b)·S_A
    use_b = sb[:, 10] > 0.5
    s = sb[:, 0:10] + jnp.where(use_b[:, None], 0.0, out_a[0:10].T)
    return s, pts_a_rows, am, perm_a


def _cov_from_sums(s):
    """(N, 3, 3) covariance + count from the 10 central sums."""
    cnt = s[:, 0]
    inv_n = 1.0 / jnp.maximum(cnt, 1e-12)
    e1 = s[:, 1:4] * inv_n[:, None]
    cxx = s[:, 4] * inv_n - e1[:, 0] * e1[:, 0]
    cyy = s[:, 5] * inv_n - e1[:, 1] * e1[:, 1]
    czz = s[:, 6] * inv_n - e1[:, 2] * e1[:, 2]
    cxy = s[:, 7] * inv_n - e1[:, 0] * e1[:, 1]
    cxz = s[:, 8] * inv_n - e1[:, 0] * e1[:, 2]
    cyz = s[:, 9] * inv_n - e1[:, 1] * e1[:, 2]
    cov = jnp.stack([
        jnp.stack([cxx, cxy, cxz], -1),
        jnp.stack([cxy, cyy, cyz], -1),
        jnp.stack([cxz, cyz, czz], -1)], -2)
    return cov, cnt


@functools.partial(jax.jit, static_argnames=("k", "orient", "tile", "band"))
def _estimate_window_union(points, mask, k, viewpoint, orient,
                           tile=256, band=16):
    """Fully-fused 2-window UNION normals — round 1's 'open problem'.

    Pick-tighter (``_estimate_window_moments``) keeps the better pass
    per point but cannot repair points whose window is partial in BOTH
    passes. A true union became possible once selection turned
    radius-based (band kernels): central sums over disjoint candidate
    sets simply ADD. Pass A emits query-centered sums + its radius
    hiA; pass B (shifted Morton grid) sees each candidate's pass-A
    POSITION (the sort payload) and accumulates, at radius hiA, only
    candidates OUTSIDE the query's pass-A window — A + B-exclusive is
    an exact union over windowA ∪ windowB at radius hiA. Where pass
    B's own radius is tighter (hiB < hiA ⟺ pass A's window was poor),
    B's full-window sums at hiB are used alone, dropping A's far
    points — exactly the case pick-tighter handles. The eigensolve
    happens once, XLA-side, on the merged sums.
    """
    n = points.shape[0]
    s, pts_a_rows, am, perm_a = _union_window_sums(points, mask, k,
                                                   tile=tile, band=band)
    cov, cnt = _cov_from_sums(s)
    normal_s, _ = linalg.smallest_eigenvector_sym3x3(cov)
    vals = linalg.eigvals_sym3x3(cov)
    tot = jnp.maximum(jnp.sum(vals, axis=-1), 1e-12)
    curv_s = jnp.maximum(vals[..., 0], 0.0) / tot

    valid_s = (am > 0.5) & (cnt >= 3)
    if orient:
        to_vp = viewpoint[None, :] - pts_a_rows
        flip = jnp.sum(normal_s * to_vp, axis=-1) < 0
        normal_s = jnp.where(flip[:, None], -normal_s, normal_s)
    normal_s = jnp.where(valid_s[:, None], normal_s, 0.0)
    curv_s = jnp.where(valid_s, curv_s, 0.0)

    _, nx, ny, nz, curv, vf = jax.lax.sort(
        (perm_a, normal_s[:, 0], normal_s[:, 1], normal_s[:, 2], curv_s,
         valid_s.astype(jnp.float32)), num_keys=1)
    normal = jnp.stack([nx, ny, nz], axis=1)[:n]
    return normal, curv[:n], (vf[:n] > 0.5) & mask


@functools.partial(jax.jit, static_argnames=("k", "use_radius", "orient",
                                             "window", "moments",
                                             "window_passes", "window_band",
                                             "window_merge"))
def _estimate(points, mask, k, use_radius, radius, viewpoint, orient,
              window=False, moments=False, window_passes=2, window_band=16,
              window_merge="tighter"):
    if moments and not use_radius:
        if window_merge == "union" and window_passes >= 2:
            return _estimate_window_union(points, mask, k, viewpoint,
                                          orient, band=window_band)
        return _estimate_window_moments(points, mask, k, viewpoint, orient,
                                        n_passes=window_passes,
                                        band=window_band)
    if window and not use_radius:
        return _estimate_window_fused(points, mask, k, viewpoint, orient)
    # One kNN pass serves both modes: radius mode masks slots beyond the
    # radius, and falls back to plain k-NN per point when fewer than 3
    # neighbors fall inside (normals.rs:314-336's fallback chain).
    nbr_coords = None
    if window:
        # tile=128 halves the per-point window work vs 256; on scan-like
        # data 2-pass recall stays >99.5% and normal quality matches the
        # exact path (see tests/test_normals.py window-parity test).
        # (return_points=True was measured SLOWER end-to-end at 1M — the
        # in-kernel coordinate accumulation costs more than the (N,k,3)
        # gather it avoids — so the id+gather path is the default.)
        knn_res = neighbors.knn_window(points, mask, k, n_passes=2,
                                       tile=128, recall_target=0.95)
    else:
        knn_res = neighbors.knn(points, mask, points, mask, k)
    nbr_idx = knn_res.indices
    if use_radius:
        in_r = knn_res.mask & (knn_res.distances <= radius)
        enough = jnp.sum(in_r, axis=1) >= 3
        nbr_ok = jnp.where(enough[:, None], in_r, knn_res.mask)
    else:
        nbr_ok = knn_res.mask

    nbr_pts = nbr_coords if nbr_coords is not None \
        else points[nbr_idx]                         # (N, k, 3)
    w = nbr_ok.astype(jnp.float32)
    # covariance via explicit component sums: six (N, k) reductions fuse
    # into a couple of HBM passes, vs a tiny-batched einsum matmul that
    # XLA schedules poorly at this shape
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1e-12)
    x = nbr_pts[..., 0]
    y = nbr_pts[..., 1]
    z = nbr_pts[..., 2]
    mx_ = jnp.sum(x * w, 1) / wsum
    my_ = jnp.sum(y * w, 1) / wsum
    mz_ = jnp.sum(z * w, 1) / wsum
    dx = x - mx_[:, None]
    dy = y - my_[:, None]
    dz = z - mz_[:, None]
    cxx = jnp.sum(dx * dx * w, 1) / wsum
    cyy = jnp.sum(dy * dy * w, 1) / wsum
    czz = jnp.sum(dz * dz * w, 1) / wsum
    cxy = jnp.sum(dx * dy * w, 1) / wsum
    cxz = jnp.sum(dx * dz * w, 1) / wsum
    cyz = jnp.sum(dy * dz * w, 1) / wsum
    cov = jnp.stack([
        jnp.stack([cxx, cxy, cxz], -1),
        jnp.stack([cxy, cyy, cyz], -1),
        jnp.stack([cxz, cyz, czz], -1)], -2)
    normal, lam0 = linalg.smallest_eigenvector_sym3x3(cov)

    vals = linalg.eigvals_sym3x3(cov)
    tot = jnp.maximum(jnp.sum(vals, axis=-1), 1e-12)
    curvature = jnp.maximum(vals[..., 0], 0.0) / tot

    valid = mask & (jnp.sum(nbr_ok, axis=1) >= 3)

    if orient:
        to_vp = viewpoint[None, :] - points
        flip = jnp.sum(normal * to_vp, axis=-1) < 0
        normal = jnp.where(flip[:, None], -normal, normal)

    normal = jnp.where(valid[:, None], normal, 0.0)
    return normal, jnp.where(valid, curvature, 0.0), valid


def default_viewpoint(cloud: PointCloud) -> jnp.ndarray:
    """bbox center lifted by the z extent (normals.rs:275-303)."""
    mn, mx = cloud.bounding_box()
    center = (mn + mx) * 0.5
    extent_z = mx[2] - mn[2]
    return center + jnp.array([0.0, 0.0, 1.0]) * jnp.maximum(extent_z, 1.0)


def estimate_normals_detailed(cloud: PointCloud,
                              config: NormalEstimationConfig = NormalEstimationConfig()
                              ) -> NormalResult:
    if config.method not in ("auto", "exact", "window", "window_fast"):
        raise ValueError(
            f"unknown normal-estimation method {config.method!r}; "
            "expected auto | exact | window | window_fast")
    if config.window_passes < 1:
        raise ValueError("window_passes must be >= 1, got "
                         f"{config.window_passes}")
    if config.window_merge not in ("tighter", "union"):
        raise ValueError("window_merge must be 'tighter' or 'union', got "
                         f"{config.window_merge!r}")
    if config.radius is not None and config.method in ("window",
                                                       "window_fast"):
        raise ValueError(
            f"method={config.method!r} is a k-NN window search and cannot "
            "honor radius=; use method='exact' (radius search) or drop the "
            "radius")
    vp = (jnp.asarray(config.viewpoint, jnp.float32)
          if config.viewpoint is not None else default_viewpoint(cloud))
    window = config.method == "window"
    moments = config.method == "window_fast" and config.radius is None
    merge = config.window_merge
    if (config.method == "auto" and cloud.capacity >= AUTO_WINDOW_THRESHOLD
            and config.radius is None):
        # default large-N path: the fused 2-window UNION — measured
        # quality-equivalent to the near-exact union-merge "window"
        # method on both noisy scans (22.3° vs 22.6° mean to analytic
        # truth at 1M; exact-kNN itself scores 27.3° there) and
        # noise-free surfaces, at 2.2x its speed (105 vs 234 ms/1M on
        # v5e). method="window"/"exact" remain available explicitly.
        moments = True
        merge = "union"
    normal, curv, valid = _estimate(
        cloud.points, cloud.mask, config.k_neighbors,
        config.radius is not None,
        jnp.float32(config.radius if config.radius is not None else 0.0),
        vp, config.consistent_orientation, window, moments,
        int(config.window_passes), window_merge=merge)
    return NormalResult(normal, curv, valid)


def estimate_normals(cloud: PointCloud, k: int = 10, **kw) -> PointCloud:
    """Convenience entry matching estimate_normals (normals.rs:238-247):
    returns the cloud with a ``normals`` attribute attached."""
    cfg = NormalEstimationConfig(k_neighbors=k, **kw)
    res = estimate_normals_detailed(cloud, cfg)
    return cloud.with_normals(res.normals)


def estimate_normals_with_config(cloud: PointCloud,
                                 config: NormalEstimationConfig) -> PointCloud:
    return cloud.with_normals(estimate_normals_detailed(cloud, config).normals)
