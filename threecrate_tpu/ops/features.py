"""Local feature descriptors: FPFH (33-d), SHOT (352-d), USC (128-d).

TPU-native rework of threecrate-algorithms/src/features.rs. The
reference runs three rayon stages over a KD-tree (features.rs:173-258);
here each stage is one batched array op:

* pair features (Darboux-frame angles α, φ, θ — features.rs:38-70) are
  computed for all (point, neighbor) pairs at once as (N, k) arrays;
* histograms are one-hot scatters summed over the neighbor axis —
  an (N, k, bins) tensor contraction instead of per-point bin loops;
* the FPFH weighted neighbor sum ``SPFH(p) + 1/k Σ 1/dᵢ·SPFH(qᵢ)``
  (features.rs:209-256) is a gather + weighted reduction.

SHOT (features.rs:294-420): 8 azimuth × 2 elevation × 2 radial volumes
× 11 cos-normal bins = 352, with a sign-disambiguated LRF from the
distance-weighted neighborhood covariance. FPFH binning is
hard-assignment BY DEFAULT, which matches the reference exactly
(features.rs:109-113 does ``histogram[bin] += 1``, no interpolation);
PCL's quadrilinear soft-binning is the opt-in
``FpfhConfig(soft_binning=True)`` staged path.
USC (features.rs:306-313): 8 az × 2 el × 8 radial spatial *density*
histogram in the same LRF = 128 dims, no normals needed.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.errors import InvalidDataError
from ..core.point_cloud import PointCloud
from . import linalg, neighbors
from .normals import estimate_normals_detailed, NormalEstimationConfig

FPFH_DIM = 33   # features.rs:15
SHOT_DIM = 352  # features.rs:304
USC_DIM = 128


@dataclasses.dataclass(frozen=True)
class FpfhConfig:
    """Mirrors FpfhConfig (features.rs:19-33). ``method``:
    exact | window | auto neighbor search (window = Morton fast path
    above ~256k points)."""

    radius: float = 0.25
    max_neighbors: int = 64
    n_bins: int = 11
    method: str = "auto"
    # PCL-style linear (soft) binning: each pair feature votes into
    # the two adjacent bins weighted by its fractional position. The
    # reference hard-bins (features.rs:109-113), so this is OFF by
    # default; turning it on routes through the staged path.
    soft_binning: bool = False
    # Fast tier for the fused window path: restrict the SPFH stage to
    # ±band sorted-order positions per Morton pass (the SHOT kernels'
    # candidate-count lever). None sweeps the full 3-tile window —
    # every in-radius candidate, exact. Same coverage caveat as
    # ShotConfig.band: when the in-radius neighborhood outgrows
    # ~2·(2·band+1) candidates, WHICH neighbors are covered is
    # Morton-order- hence rotation-dependent; keep the radius
    # density-matched to the band for cross-view matching.
    #
    # "auto" (default) measures the cloud's in-radius neighbor count
    # on a host-side subsample and picks the smallest band whose
    # candidate capacity covers it with a 2x margin (the auto_w_tiles
    # capacity-ratio discipline); when no ladder rung has that margin
    # — or under jit, where nothing can be measured — it resolves to
    # None, i.e. the exact full window remains the quality default.
    band: Optional[object] = "auto"


@dataclasses.dataclass(frozen=True)
class ShotConfig:
    """Mirrors ShotConfig (features.rs:327-344). ``method`` as in
    FpfhConfig."""

    radius: float = 0.25
    max_neighbors: int = 128
    n_cos_bins: int = 11
    method: str = "auto"
    # Fused-path candidate half-width in sorted-order positions per
    # pass (the union of two ±band windows is the neighborhood cap;
    # ~2x max_neighbors of coverage at the default). 32 -> 266 ms at
    # 1M; 48 -> 292 ms with a wider net on uneven densities.
    # ROTATION-REPEATABILITY caveat (measured r4): when the band union
    # covers only PART of the in-radius neighborhood (avg in-radius
    # count ≳ 2·(2·band+1)), WHICH part is Morton-order-dependent and
    # therefore rotation-dependent — same-points-rotated descriptor
    # cos dropped to median 0.55 at band=32 on a fixture with ~60
    # in-radius neighbors vs 0.74 at band=64 (the staged path, which
    # caps by true distance, stays ~0.9 there). For cross-viewpoint
    # matching either keep radius small enough that neighborhoods fit
    # the band with ~2x margin, raise ``band``, or use
    # method="exact"/the staged path.
    band: int = 32


def pair_features(p1, n1, p2, n2):
    """Darboux-frame angles for point pairs (features.rs:38-70).

    Vectorised version of PCL's computePairFeatures, including the
    source/target swap that anchors the frame at the point whose normal
    is better aligned with the connecting line.
    Returns (f1=θ∈[-π,π], f2=cos φ∈[-1,1], f3=cos α∈[-1,1], f4=distance).
    """
    d = p2 - p1
    f4 = jnp.linalg.norm(d, axis=-1)
    dn = d / jnp.maximum(f4, 1e-12)[..., None]
    a1 = jnp.sum(n1 * dn, axis=-1)
    a2 = jnp.sum(n2 * dn, axis=-1)
    swap = jnp.abs(a1) < jnp.abs(a2)            # anchor = better aligned
    ns = jnp.where(swap[..., None], n2, n1)
    nt = jnp.where(swap[..., None], n1, n2)
    dn = jnp.where(swap[..., None], -dn, dn)
    f3 = jnp.sum(ns * dn, axis=-1)
    v = jnp.cross(dn, ns)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    w = jnp.cross(ns, v)
    f2 = jnp.sum(v * nt, axis=-1)
    f1 = jnp.arctan2(jnp.sum(w * nt, axis=-1), jnp.sum(ns * nt, axis=-1))
    return f1, f2, f3, f4


def _hist(values, lo, hi, n_bins, weights, soft=False):
    """(..., K) values → (..., n_bins) weighted histogram via one-hot.
    ``soft=True`` = PCL-style linear interpolation into the two
    adjacent bins (the reference hard-bins; see module docstring)."""
    t = (values - lo) / (hi - lo)
    if not soft:
        idx = jnp.clip((t * n_bins).astype(jnp.int32), 0, n_bins - 1)
        onehot = jax.nn.one_hot(idx, n_bins, dtype=jnp.float32)
        return jnp.einsum("...k,...kb->...b", weights, onehot)
    pos = jnp.clip(t * n_bins - 0.5, 0.0, float(n_bins - 1))
    lo_i = pos.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, n_bins - 1)
    frac = pos - lo_i
    oh_lo = jax.nn.one_hot(lo_i, n_bins, dtype=jnp.float32)
    oh_hi = jax.nn.one_hot(hi_i, n_bins, dtype=jnp.float32)
    return jnp.einsum("...k,...kb->...b", weights * (1 - frac), oh_lo) \
        + jnp.einsum("...k,...kb->...b", weights * frac, oh_hi)


class FpfhResult(NamedTuple):
    descriptors: jnp.ndarray  # (N, 33)
    valid: jnp.ndarray        # (N,)


@functools.partial(jax.jit, static_argnames=("radius", "tile", "band"))
def _fpfh_fused(points, mask, normals_arr, radius: float, tile=256,
                band=None):
    """Fully-fused window FPFH: no neighbor ids, no gathers of point
    data — the pallas kernels (kernels/fpfh_pallas.py) bin the Darboux
    features and weight neighbor SPFHs directly from the Morton-window
    candidates, with the same 2-pass shifted-lattice UNION as the
    normals path (fixed radius ⇒ disjoint-window histograms add).
    Traced ~4x faster than the id-staged formulation it replaces.

    Uses every in-radius window candidate (the staged path capped at
    max_neighbors — PCL semantics use all in-radius neighbors, so this
    is closer, and histograms are count-normalised either way).

    ``band`` (opt-in fast tier): restrict the SPFH stage to a ±band
    POSITIONAL window of each Morton pass (2·(2·band+1) candidates over
    the union) — the same candidate-count lever as the SHOT kernels,
    with the same coverage caveat (see FpfhConfig.band). The stage-2
    neighbor-SPFH weighting keeps the full 3-tile window either way
    (its heavy lifting is one MXU matmul, which banding would break
    back into per-offset VPU sweeps).
    """
    from ..kernels.fpfh_pallas import (fpfh_weight_a_tiles,
                                       fpfh_weight_b_tiles,
                                       spfh_a_tiles, spfh_b_tiles,
                                       spfh_band_a_tiles,
                                       spfh_band_b_tiles)
    from . import morton
    from ..utils import padding as _pad

    n = points.shape[0]
    n_pad = _pad.round_up(n, tile)
    pts = points.astype(jnp.float32)
    nrm = normals_arr.astype(jnp.float32)
    if n_pad != n:
        pts = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
        nrm = jnp.pad(nrm, ((0, n_pad - n), (0, 0)))
        mask_p = jnp.pad(mask, (0, n_pad - n))
    else:
        mask_p = mask
    interp = jax.default_backend() != "tpu"
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    r2 = float(radius) * float(radius)

    keys_a = morton.morton_keys(pts, mask_p, pass_index=0)
    _, ax, ay, az, am, anx, any_, anz, perm_a = jax.lax.sort(
        (keys_a, pts[:, 0], pts[:, 1], pts[:, 2],
         mask_p.astype(jnp.float32), nrm[:, 0], nrm[:, 1], nrm[:, 2],
         iota), num_keys=1)
    packed_a = jnp.stack([ax, ay, az, am, anx, any_, anz], axis=0)
    if band is None:
        spfh_a = spfh_a_tiles(packed_a, r2, tile,
                              interpret=interp)                # (34,N)
    else:
        spfh_a = spfh_band_a_tiles(packed_a, r2, int(band), tile,
                                   interpret=interp)

    pts_a_rows = jnp.stack([ax, ay, az], axis=1)
    keys_b = morton.morton_keys(pts_a_rows, am > 0.5, pass_index=1)
    _, bx, by, bz, bm, bnx, bny, bnz, row_a = jax.lax.sort(
        (keys_b, ax, ay, az, am, anx, any_, anz, iota), num_keys=1)
    packed_b = jnp.stack([bx, by, bz, bm, bnx, bny, bnz], axis=0)
    if band is None:
        spfh_b = spfh_b_tiles(packed_b, row_a[None, :], r2, tile,
                              interpret=interp)
    else:
        packed_b8 = jnp.concatenate(
            [packed_b, row_a[None, :].astype(jnp.float32)], axis=0)
        spfh_b = spfh_band_b_tiles(packed_b8, r2, int(band), tile,
                                   interpret=interp)

    _, inv_b = jax.lax.sort((row_a, iota), num_keys=1)
    spfh_raw = spfh_a.T + spfh_b.T[inv_b]                # (N, 34) A-order
    cnt = spfh_raw[:, 33]
    spfh = spfh_raw[:, :33] / jnp.maximum(cnt, 1.0)[:, None]

    # ---- stage 2: FPFH(p) = SPFH(p) + (1/k)·Σ (1/d)·SPFH(q) ----
    packed2_a = jnp.concatenate(
        [packed_a[0:4], spfh.T], axis=0)                 # (37, N)
    w_a = fpfh_weight_a_tiles(packed2_a, r2, tile, interpret=interp)
    spfh_b_order = spfh[row_a]                            # (N, 33) B-order
    packed2_b = jnp.concatenate(
        [packed_b[0:4], spfh_b_order.T], axis=0)
    w_b = fpfh_weight_b_tiles(packed2_b, row_a[None, :], r2, tile,
                              interpret=interp)
    w_raw = w_a.T + w_b.T[inv_b]                          # (N, 34)
    k_eff = jnp.maximum(w_raw[:, 33], 1.0)
    fpfh = spfh + w_raw[:, :33] / k_eff[:, None]

    # per-sub-histogram renormalisation to 100 (PCL convention)
    out = []
    for b in range(3):
        blk = fpfh[:, b * N_BINS_FPFH:(b + 1) * N_BINS_FPFH]
        s = jnp.maximum(jnp.sum(blk, axis=1, keepdims=True), 1e-12)
        out.append(blk / s * 100.0)
    desc_s = jnp.concatenate(out, axis=-1)
    valid_s = (am > 0.5) & (cnt >= 3)
    desc_s = jnp.where(valid_s[:, None], desc_s, 0.0)

    # restore original order with one inverse-permutation row gather
    _, inv_a = jax.lax.sort((perm_a, iota), num_keys=1)
    desc = desc_s[inv_a][:n]
    valid = valid_s[inv_a][:n]
    return desc, valid & mask


N_BINS_FPFH = 11


@functools.partial(jax.jit, static_argnames=("max_neighbors", "n_bins",
                                             "window", "soft"))
def _fpfh(points, mask, normals_arr, radius, max_neighbors, n_bins,
          window=False, soft=False):
    if window:
        res = neighbors.radius_neighbors_window(
            points, mask, radius, max_neighbors, exclude_self=True)
    else:
        res = neighbors.radius_neighbors(points, mask, points, mask,
                                         radius, max_neighbors,
                                         exclude_self=True)
    nbr_idx, nbr_ok, nbr_dist = res.indices, res.mask, res.distances

    # Both heavy stages run as lax.map over fixed row blocks: the
    # one-hot histograms and the neighbor-SPFH weighting materialise
    # (block, k, bins) instead of (N, k, bins) — at 1M x k=32 the
    # unblocked form is ~4 GB of intermediates per stage and crashes
    # the XLA compiler; blocked, the working set is a few tens of MB
    # regardless of N.
    n = points.shape[0]
    block = 16384
    n_blk = -(-n // block)
    pad = n_blk * block - n

    def blocked(a, fill=0):
        a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                    constant_values=fill)
        return a.reshape((n_blk, block) + a.shape[1:])

    idx_b = blocked(nbr_idx)
    ok_b = blocked(nbr_ok)
    dist_b = blocked(nbr_dist, fill=1.0)
    pts_b = blocked(points)
    nrm_b = blocked(normals_arr)

    def spfh_block(args):
        idx, ok, q_pts, q_nrm = args
        f1, f2, f3, _ = pair_features(q_pts[:, None, :], q_nrm[:, None, :],
                                      points[idx], normals_arr[idx])
        w = ok.astype(jnp.float32)
        h1 = _hist(f1, -jnp.pi, jnp.pi, n_bins, w, soft)
        h2 = _hist(f2, -1.0, 1.0, n_bins, w, soft)
        h3 = _hist(f3, -1.0, 1.0, n_bins, w, soft)
        cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
        return jnp.concatenate([h1, h2, h3], axis=-1) / cnt

    # SPFH per point (features.rs:81-125): 3 concatenated histograms
    spfh = jax.lax.map(spfh_block, (idx_b, ok_b, pts_b, nrm_b)
                       ).reshape(n_blk * block, 3 * n_bins)[:n]

    def fpfh_block(args):
        idx, ok, dist, own = args
        inv_d = jnp.where(ok & (dist > 1e-12), 1.0 / dist, 0.0)
        k_eff = jnp.maximum(jnp.sum(ok, axis=1), 1)[:, None]
        return own + jnp.einsum("nk,nkd->nd", inv_d, spfh[idx]) / k_eff

    # FPFH = SPFH(p) + 1/k Σ (1/dᵢ)·SPFH(qᵢ) (features.rs:209-256)
    fpfh = jax.lax.map(fpfh_block, (idx_b, ok_b, dist_b, blocked(spfh))
                       ).reshape(n_blk * block, 3 * n_bins)[:n]

    # per-sub-histogram renormalisation to 100 (PCL convention)
    out = []
    for b in range(3):
        block = fpfh[:, b * n_bins:(b + 1) * n_bins]
        s = jnp.maximum(jnp.sum(block, axis=1, keepdims=True), 1e-12)
        out.append(block / s * 100.0)
    desc = jnp.concatenate(out, axis=-1)
    valid = mask & (jnp.sum(nbr_ok, axis=1) >= 3)
    return jnp.where(valid[:, None], desc, 0.0), valid


# Band rungs for FpfhConfig(band="auto"): candidate capacity of rung b
# is ~2·(2·b+1) over the two-pass union; a rung qualifies when that
# capacity covers the measured mean in-radius neighbor count with a 2x
# margin (the same capacity-ratio discipline as registration's
# auto_w_tiles). r4 measured band=32 at 326 ms vs 484 ms full-window
# at 1M (quality: tests/test_features.py banded parity + the
# cross-view matching test below the ladder's margin).
_FPFH_BAND_LADDER = (16, 32, 48, 64)


def expected_in_radius_count(points, mask, radius: float,
                             n_query: int = 1024,
                             n_ref: int = 16384) -> float:
    """Host-side estimate of the mean in-radius neighbor count.

    Deterministic strided subsample of up to ``n_query`` queries
    against up to ``n_ref`` reference points, counts rescaled by the
    subsampling ratio. NumPy on host (chunked) — never call under jit.
    """
    import numpy as np
    pts = np.asarray(points, dtype=np.float32)
    m = np.asarray(mask, dtype=bool)
    pts = pts[m]
    n = pts.shape[0]
    if n < 16:
        return 0.0
    q = pts[::max(1, n // n_query)][:n_query]
    ref = pts[::max(1, n // n_ref)][:n_ref]
    scale = n / ref.shape[0]
    r2 = float(radius) * float(radius)
    total = 0.0
    for s in range(0, q.shape[0], 128):
        blk = q[s:s + 128]
        d2 = ((blk[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
        total += float((d2 <= r2).sum())
    # rescaled count minus self (each query finds itself in ref when
    # the strides align; subtracting 1 post-scale is the right order
    # of magnitude either way and keeps the estimate conservative)
    return max(total / q.shape[0] * scale - 1.0, 0.0)


def _resolve_fpfh_band(band, points, mask, radius: float):
    """Resolve FpfhConfig.band="auto" to a ladder rung or None."""
    if band != "auto":
        return band
    if isinstance(points, jax.core.Tracer):
        return None           # nothing measurable under jit: stay exact
    est = expected_in_radius_count(points, mask, radius)
    for b in _FPFH_BAND_LADDER:
        if 2 * (2 * b + 1) >= 2.0 * est:
            return b
    return None


def extract_fpfh_features_with_normals(cloud: PointCloud,
                                       config: FpfhConfig = FpfhConfig()
                                       ) -> FpfhResult:
    """FPFH over a cloud that already carries normals
    (extract_fpfh_features_with_normals, features.rs:173-258)."""
    if cloud.normals is None:
        raise InvalidDataError("FPFH requires normals on the cloud")
    window = (config.method == "window"
              or (config.method == "auto" and cloud.capacity > 262144))
    if window and config.n_bins == 11 and not config.soft_binning:
        band = _resolve_fpfh_band(config.band, cloud.points, cloud.mask,
                                  float(config.radius))
        desc, valid = _fpfh_fused(cloud.points, cloud.mask, cloud.normals,
                                  float(config.radius),
                                  band=band)
    else:
        desc, valid = _fpfh(cloud.points, cloud.mask, cloud.normals,
                            jnp.float32(config.radius),
                            config.max_neighbors, config.n_bins, window,
                            config.soft_binning)
    return FpfhResult(desc, valid)


def extract_fpfh_features(cloud: PointCloud,
                          config: FpfhConfig = FpfhConfig(),
                          k_normals: int = 10) -> FpfhResult:
    """Normals + FPFH convenience entry (features.rs:173)."""
    if cloud.normals is None:
        nres = estimate_normals_detailed(
            cloud, NormalEstimationConfig(k_neighbors=k_normals))
        cloud = cloud.with_normals(nres.normals)
    return extract_fpfh_features_with_normals(cloud, config)


# ---------------------------------------------------------------------------
# SHOT / USC
# ---------------------------------------------------------------------------

LRF_TIE_TAU = 0.25   # |mean projection| below this (dimensionless,
# normalized by wsum·R) counts as an ambiguous sign vote. Measured on
# the two-sampling repeatability fixture (tests/test_features.py):
# the vote's sampling noise at k~60 is ~0.04, so a threshold must sit
# WELL above it — z-axis flips across resamplings: 9.6% at tau 0.02,
# 1.4% at 0.10, 0.95% at 0.25 (the normal tie-break is itself never
# ambiguous, |n·z| ≈ 1). On smooth regions this routes most z signs
# through the normal — exactly where the displacement vote carries no
# signal (planar neighborhoods have Σw·(d·z) ≈ 0 by construction).
# x-axis sign flips remain ~9% on near-symmetric neighborhoods, but
# measured descriptor impact there is negligible (a flip permutes
# azimuth sectors by 4; on those neighborhoods desc ≈ P·desc — the
# flip-explained fraction of the repeatability tail is ~0.2%).


def _lrf_signs(sd, td, wsum, radius, z, x, nq):
    """Stabilised LRF sign disambiguation (features.rs:294-420 + the
    r4 repeatability fix).

    Primary vote: the (R−d)-weighted mean displacement ``sd`` = Σ w·d
    projected on each axis — identical to r3, so sign-STABLE points
    (|normalized vote| > LRF_TIE_TAU) keep their exact r3 frames.
    Ambiguous votes (planar neighborhoods make sd·z ≈ 0 by
    construction; symmetric ones make sd·x ≈ 0) fall back to
    resampling-stable tie-breaks instead of sampling noise:

    * z → align with the point's estimated normal ``nq`` (consistently
      viewpoint-oriented, rotation-equivariant, |n·z| ≈ 1 — never
      itself ambiguous);
    * x → the far-amplified vote ``td`` = Σ w·d·|d|², which keys on
      radius-boundary geometry rather than near-center sampling.
    """
    zs = jnp.sum(sd * z, axis=1)
    xs = jnp.sum(sd * x, axis=1)
    scale1 = jnp.maximum(wsum * radius, 1e-30)
    scale3 = jnp.maximum(wsum * radius ** 3, 1e-30)
    if nq is None:
        z_tie = jnp.sum(td * z, axis=1) / scale3
    else:
        z_tie = jnp.sum(nq * z, axis=1)
    z_vote = jnp.where(jnp.abs(zs / scale1) > LRF_TIE_TAU,
                       zs, z_tie)
    x_tie = jnp.sum(td * x, axis=1) / scale3
    x_vote = jnp.where(jnp.abs(xs / scale1) > LRF_TIE_TAU,
                       xs, x_tie)
    z = jnp.where((z_vote < 0)[:, None], -z, z)
    x = jnp.where((x_vote < 0)[:, None], -x, x)
    return z, x


def _shot_lrf(nbr, nbr_ok, nbr_dist, radius, own, own_normals=None):
    """Sign-disambiguated local reference frame (features.rs:294-420):
    eigenvectors of the (R − d)-weighted neighborhood covariance, x/z
    signs flipped toward the majority of neighbors (ambiguous votes
    tie-broken; see _lrf_signs). ``nbr`` — gathered neighbor
    coordinates (N, k, 3) (the caller gathers, so sharded callers can
    pass ring-carried rows without a global table); ``own`` — the
    query rows themselves; ``own_normals`` — the queries' estimated
    normals for the z tie-break (None → far-amplified-moment tie-break
    for z too).
    """
    w = jnp.where(nbr_ok, jnp.maximum(radius - nbr_dist, 0.0), 0.0)
    mean, cov = linalg.weighted_covariance(nbr, w)
    _, vecs = linalg.eigh3x3(cov)
    z = vecs[..., :, 0]   # smallest eigval → normal-ish axis
    x = vecs[..., :, 2]   # largest → dominant tangent
    d = nbr - own[:, None, :]
    # disambiguate: (R−d)-WEIGHTED vote of neighbor displacement
    # projections. The reference (and PCL) count unweighted signs;
    # weighting by the same support weights as the covariance sends
    # radius-boundary candidates — exactly the ones that differ
    # between candidate sets / after resampling — to ~0 influence,
    # measurably stabilising the sign on ambiguous neighborhoods.
    sd = jnp.einsum("nk,nkj->nj", w, d)
    d2 = jnp.sum(d * d, axis=-1)
    td = jnp.einsum("nk,nkj->nj", w * d2, d)
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1e-12)
    z, x = _lrf_signs(sd, td, wsum, jnp.float32(radius), z, x,
                      own_normals)
    # re-orthogonalise x against z, y = z × x
    x = x - jnp.sum(x * z, -1, keepdims=True) * z
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    y = jnp.cross(z, x)
    return x, y, z


class ShotResult(NamedTuple):
    descriptors: jnp.ndarray
    valid: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("radius", "variant", "band",
                                             "tile"))
def _shot_fused(points, mask, normals_arr, radius: float,
                variant: str = "shot", band: int = 32, tile: int = 256):
    """Fully-fused band-window SHOT/USC (kernels/shot_pallas.py).

    No neighbor ids or gathers: two moment passes give each query's
    (R−d)-weighted neighborhood covariance + disambiguation sums, the
    LRF eigensolve runs batched in XLA, and two histogram passes bin
    the in-LRF displacements straight from the Morton-band candidates.
    The candidate set is the UNION of two ±``band`` positional windows
    over shifted Morton lattices (≤ 2·(2·band+1) candidates, typically
    ~all in-radius neighbors at sane radii) — the staged path caps at
    ``max_neighbors`` similarly. Fixed radius ⇒ disjoint-window
    moment/histogram sums add exactly (see fpfh_pallas).
    """
    from ..kernels.shot_pallas import (shot_hist_a_tiles,
                                       shot_hist_b_tiles,
                                       shot_moments_a_tiles,
                                       shot_moments_b_tiles)
    from ..utils import padding as _pad
    from . import morton

    n = points.shape[0]
    n_pad = _pad.round_up(n, tile)
    pts = points.astype(jnp.float32)
    nrm = normals_arr.astype(jnp.float32)
    if n_pad != n:
        pts = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
        nrm = jnp.pad(nrm, ((0, n_pad - n), (0, 0)))
        mask_p = jnp.pad(mask, (0, n_pad - n))
    else:
        mask_p = mask
    interp = jax.default_backend() != "tpu"
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    r2 = float(radius) * float(radius)

    # ---- pass-A sort (key + xyz + valid + normals + perm = 9 ops) ----
    keys_a = morton.morton_keys(pts, mask_p, pass_index=0)
    _, ax, ay, az, am, anx, any_, anz, perm_a = jax.lax.sort(
        (keys_a, pts[:, 0], pts[:, 1], pts[:, 2],
         mask_p.astype(jnp.float32), nrm[:, 0], nrm[:, 1], nrm[:, 2],
         iota), num_keys=1)
    packed4_a = jnp.stack([ax, ay, az, am], axis=0)
    mom_a = shot_moments_a_tiles(packed4_a, r2, band, tile,
                                 interpret=interp)           # (14, N)

    # ---- pass-B sort (shifted lattice; posA rides as payload) ----
    pts_a_rows = jnp.stack([ax, ay, az], axis=1)
    keys_b = morton.morton_keys(pts_a_rows, am > 0.5, pass_index=1)
    pos_a = iota.astype(jnp.float32)   # exact in f32 below 2^24 rows
    _, bx, by, bz, bm, bnx, bny, bnz, row_a = jax.lax.sort(
        (keys_b, ax, ay, az, am, anx, any_, anz, iota), num_keys=1)
    row_a_f = row_a.astype(jnp.float32)
    packed5_b = jnp.stack([bx, by, bz, bm, row_a_f], axis=0)
    mom_b = shot_moments_b_tiles(packed5_b, r2, band, tile,
                                 interpret=interp)

    _, inv_b = jax.lax.sort((row_a, iota), num_keys=1)
    m = mom_a.T + mom_b.T[inv_b]                             # (N, 14)

    # ---- LRF in XLA (mirrors _shot_lrf on the merged moments) ----
    wsum = jnp.maximum(m[:, 0], 1e-12)
    mu = m[:, 1:4] / wsum[:, None]
    cc = m[:, 4:10] / wsum[:, None]
    cxx = cc[:, 0] - mu[:, 0] * mu[:, 0]
    cyy = cc[:, 1] - mu[:, 1] * mu[:, 1]
    czz = cc[:, 2] - mu[:, 2] * mu[:, 2]
    cxy = cc[:, 3] - mu[:, 0] * mu[:, 1]
    cxz = cc[:, 4] - mu[:, 0] * mu[:, 2]
    cyz = cc[:, 5] - mu[:, 1] * mu[:, 2]
    cov = jnp.stack([
        jnp.stack([cxx, cxy, cxz], -1),
        jnp.stack([cxy, cyy, cyz], -1),
        jnp.stack([cxz, cyz, czz], -1)], -2)
    _, vecs = linalg.eigh3x3(cov)
    z = vecs[..., :, 0]
    x = vecs[..., :, 2]
    # (R−d)-weighted sign vote (see _shot_lrf) with stability
    # tie-breaks (r4, VERDICT item 3): rows 1:4 are Σ w·d, rows
    # 11:14 the far-amplified Σ w·d·|d|².
    sd = m[:, 1:4]
    td = m[:, 11:14]
    # normals in pass-A order for the z tie-break (USC passes zeros —
    # use the far-moment tie-break there instead)
    nq = jnp.stack([anx, any_, anz], axis=1) if variant == "shot" \
        else None
    r1 = jnp.float32(radius)
    z, x = _lrf_signs(sd, td, wsum, r1, z, x, nq)
    x = x - jnp.sum(x * z, -1, keepdims=True) * z
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    y = jnp.cross(z, x)
    lrf = jnp.concatenate([x, y, z], axis=1)                 # (N, 9)

    # ---- histogram passes ----
    packed7_a = jnp.stack([ax, ay, az, am, anx, any_, anz], axis=0)
    h_a = shot_hist_a_tiles(packed7_a, lrf.T, r2, band, tile,
                            interpret=interp, variant=variant)
    packed8_b = jnp.stack([bx, by, bz, bm, bnx, bny, bnz, row_a_f],
                          axis=0)
    lrf_b = lrf[row_a]
    h_b = shot_hist_b_tiles(packed8_b, lrf_b.T, r2, band, tile,
                            interpret=interp, variant=variant)

    h = h_a.T + h_b.T[inv_b]                                 # (N, dim+1)
    cnt = h[:, -1]
    desc = h[:, :-1]
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True),
                       1e-12)
    desc = desc / norm
    valid_s = (am > 0.5) & (cnt >= 5)
    desc = jnp.where(valid_s[:, None], desc, 0.0)

    _, inv_a = jax.lax.sort((perm_a, iota), num_keys=1)
    return desc[inv_a][:n], (valid_s[inv_a][:n]) & mask


def _shot_descriptor_block(nbr, nbr_nrm, ok, dist, own, own_nrm,
                           radius, n_cos_bins, variant):
    """SHOT/USC descriptors for one row block from pre-gathered
    neighborhoods (features.rs:294-420): LRF, then the soft-binned
    352-d (or 128-d USC) spatial histogram. All inputs are gathered
    (B, k, ...) arrays so the same math serves the staged path (table
    gathers) and the sharded path (ring-carried rows)."""
    x, y, z = _shot_lrf(nbr, ok, dist, radius, own,
                        own_nrm if variant == "shot" else None)

    d = nbr - own[:, None, :]                     # (B, k, 3)
    lx = jnp.einsum("nkj,nj->nk", d, x)
    ly = jnp.einsum("nkj,nj->nk", d, y)
    lz = jnp.einsum("nkj,nj->nk", d, z)
    r = jnp.sqrt(lx * lx + ly * ly + lz * lz)
    az = jnp.arctan2(ly, lx)                      # [-π, π]
    el = lz / jnp.maximum(r, 1e-12)               # cos-elevation
    az_bin = jnp.clip(((az + jnp.pi) / (2 * jnp.pi) * 8
                       ).astype(jnp.int32), 0, 7)
    el_bin = (el >= 0).astype(jnp.int32)          # 2 elevation shells
    w = ok.astype(jnp.float32) * (r > 1e-9)

    if variant == "shot":
        rad_bin = (r >= 0.5 * radius).astype(jnp.int32)  # 2 shells
        vol = (az_bin * 2 + el_bin) * 2 + rad_bin        # ∈ [0, 32)
        cosn = jnp.einsum("nkj,nj->nk", nbr_nrm, z)
        # soft (linear) binning along the cosine dimension,
        # PCL-style: each neighbor votes into the two adjacent bins
        # weighted by its fractional position
        pos = jnp.clip((cosn + 1.0) / 2.0 * n_cos_bins - 0.5,
                       0.0, n_cos_bins - 1.0)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_cos_bins - 1)
        frac = pos - lo
        dim = 32 * n_cos_bins
        oh_lo = jax.nn.one_hot(vol * n_cos_bins + lo, dim,
                               dtype=jnp.float32)
        oh_hi = jax.nn.one_hot(vol * n_cos_bins + hi, dim,
                               dtype=jnp.float32)
        desc = jnp.einsum("nk,nkb->nb", w * (1 - frac), oh_lo) \
            + jnp.einsum("nk,nkb->nb", w * frac, oh_hi)
    else:  # usc: 8 radial shells, pure density
        rad_bin = jnp.clip((r / radius * 8).astype(jnp.int32), 0, 7)
        flat = (az_bin * 2 + el_bin) * 8 + rad_bin       # ∈ [0, 128)
        desc = jnp.einsum("nk,nkb->nb", w,
                          jax.nn.one_hot(flat, USC_DIM,
                                         dtype=jnp.float32))
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True),
                       1e-12)
    return desc / norm


@functools.partial(jax.jit, static_argnames=("max_neighbors", "n_cos_bins",
                                             "variant", "window"))
def _shot(points, mask, normals_arr, radius, max_neighbors, n_cos_bins,
          variant, window=False):
    if window:
        res = neighbors.radius_neighbors_window(
            points, mask, radius, max_neighbors, exclude_self=True)
    else:
        res = neighbors.radius_neighbors(points, mask, points, mask,
                                         radius, max_neighbors,
                                         exclude_self=True)
    nbr_idx, nbr_ok, nbr_dist = res.indices, res.mask, res.distances

    # As in _fpfh: the (rows, k, desc_dim) one-hot intermediates are
    # the memory hog (352-d SHOT at 1M x k=32 would be ~45 GB), so the
    # whole per-point descriptor computation maps over fixed row blocks.
    n = points.shape[0]
    block = 16384
    n_blk = -(-n // block)
    pad = n_blk * block - n

    def blocked(a, fill=0):
        a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                    constant_values=fill)
        return a.reshape((n_blk, block) + a.shape[1:])

    def shot_block(args):
        idx, ok, dist, own, own_nrm = args
        return _shot_descriptor_block(
            points[idx], normals_arr[idx], ok, dist, own, own_nrm,
            radius, n_cos_bins, variant)

    dim = 32 * n_cos_bins if variant == "shot" else USC_DIM
    desc = jax.lax.map(
        shot_block,
        (blocked(nbr_idx), blocked(nbr_ok), blocked(nbr_dist, fill=1.0),
         blocked(points), blocked(normals_arr))
    ).reshape(n_blk * block, dim)[:n]
    valid = mask & (jnp.sum(nbr_ok, axis=1) >= 5)
    return jnp.where(valid[:, None], desc, 0.0), valid


def extract_shot_features(cloud: PointCloud,
                          config: ShotConfig = ShotConfig(),
                          k_normals: int = 10) -> ShotResult:
    """SHOT descriptors (features.rs:294-420)."""
    if cloud.normals is None:
        nres = estimate_normals_detailed(
            cloud, NormalEstimationConfig(k_neighbors=k_normals))
        cloud = cloud.with_normals(nres.normals)
    window = (config.method == "window"
              or (config.method == "auto" and cloud.capacity > 262144))
    if window and config.n_cos_bins == 11:
        desc, valid = _shot_fused(cloud.points, cloud.mask, cloud.normals,
                                  float(config.radius), "shot",
                                  band=config.band)
    else:
        desc, valid = _shot(cloud.points, cloud.mask, cloud.normals,
                            jnp.float32(config.radius),
                            config.max_neighbors,
                            config.n_cos_bins, "shot", window)
    return ShotResult(desc, valid)


def extract_usc_features(cloud: PointCloud,
                         config: ShotConfig = ShotConfig()) -> ShotResult:
    """USC variant (ShotVariant, features.rs:306-323): 128-d spatial
    density histogram, no normals required."""
    window = (config.method == "window"
              or (config.method == "auto" and cloud.capacity > 262144))
    if window:
        desc, valid = _shot_fused(cloud.points, cloud.mask,
                                  jnp.zeros_like(cloud.points),
                                  float(config.radius), "usc",
                                  band=config.band)
    else:
        desc, valid = _shot(cloud.points, cloud.mask,
                            jnp.zeros_like(cloud.points),
                            jnp.float32(config.radius),
                            config.max_neighbors,
                            config.n_cos_bins, "usc", window)
    return ShotResult(desc, valid)


# ---------------------------------------------------------------------------
# descriptor matching (for global registration)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("mutual",))
def match_descriptors(desc_a, valid_a, desc_b, valid_b, mutual=False):
    """Nearest neighbor in descriptor space
    (find_feature_correspondences, global_registration.rs:93-111).

    Returns (index_into_b (N,), distance, valid). ``mutual=True`` keeps
    only cross-checked pairs. Small problems run as one matmul; above
    ~2^26 pair products the search goes through the blockwise
    ``neighbors.knn`` machinery (dimension-agnostic) — the one-shot
    (N, M) distance matrix at 1M x 1M would be 4 TB of HBM.
    """
    na, nb = desc_a.shape[0], desc_b.shape[0]
    if na * nb > 2 ** 26:
        res = neighbors.knn(desc_b, valid_b, desc_a, valid_a, 1)
        j = res.indices[:, 0]
        dist = res.distances[:, 0]
        ok = valid_a & res.mask[:, 0] & jnp.isfinite(dist)
        if mutual:
            back = neighbors.knn(desc_a, valid_a, desc_b, valid_b, 1)
            ok = ok & (back.indices[:, 0][j] == jnp.arange(na))
        return j, jnp.where(ok, dist, jnp.inf), ok
    an = jnp.sum(desc_a * desc_a, axis=1)
    bn = jnp.sum(desc_b * desc_b, axis=1)
    cross = jax.lax.dot_general(
        desc_a, desc_b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    d2 = an[:, None] + bn[None, :] - 2.0 * cross
    d2 = jnp.where(valid_b[None, :], d2, jnp.inf)
    j = jnp.argmin(d2, axis=1)
    dist = jnp.sqrt(jnp.maximum(jnp.take_along_axis(d2, j[:, None], 1)[:, 0],
                                0.0))
    ok = valid_a & jnp.isfinite(dist)
    if mutual:
        d2_t = jnp.where(valid_a[:, None], d2, jnp.inf)
        back = jnp.argmin(d2_t, axis=0)
        ok = ok & (back[j] == jnp.arange(desc_a.shape[0]))
    return j, jnp.where(ok, dist, jnp.inf), ok
