"""Fused FPFH pallas kernels: in-window SPFH histograms + weighted sum.

The staged FPFH path (ops/features._fpfh) materialises (N, k) neighbor
ids from the generic window search, then runs two `lax.map` histogram
stages full of (block, k, ·) gathers — traced at ~600 of 690 ms for
500k points on v5e (gathers + one-hot staging dominate; the search
kernels are 67 ms). These kernels compute the same Darboux-angle
histograms DIRECTLY from the Morton-window candidates in VMEM:

* stage 1 (``spfh_*_tiles``): for every query, bin the PCL pair
  features (f1=θ, f2=cosφ, f3=cosα — features.rs:38-70) against every
  window candidate within the radius and accumulate 3×11 bins + count,
  all in-kernel. No neighbor ids ever exist.
* stage 2 (``fpfh_weight_*_tiles``): FPFH(p) = SPFH(p) +
  (1/k)·Σ (1/dᵢ)·SPFH(qᵢ) (features.rs:209-256) — the candidates'
  33-bin SPFH ride as payload rows and the weighted sum is ONE MXU
  matmul of the (tile, window) weight matrix against them.

Both stages come in A/B pass pairs with the same shifted-lattice UNION
merge as the normals kernels (fixed user radius ⇒ histograms over
windowA and windowB∖windowA simply add; pass B sees pass-A positions
as a sort payload to exclude the overlap).

Pallas TPU does not lower ``atan2``; f1 uses a quadrant-corrected
odd-polynomial atan (max error ~5e-3 rad — bin width is 0.57 rad).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BINS = 11


def _atan2_approx(y, x):
    """Quadrant-corrected atan2 from an odd minimax atan polynomial.

    max |err| ≈ 5e-3 rad — far below the 2π/11 ≈ 0.57 rad bin width
    this feeds. Uses only mul/add/select/abs (all lower on pallas TPU).
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.maximum(hi, 1e-30)
    z2 = z * z
    # atan(z) for z in [0, 1]
    t = z * (0.9998660 + z2 * (-0.3302995 + z2 * (0.1801410 + z2 * (
        -0.0851330 + z2 * 0.0208351))))
    t = jnp.where(ay > ax, jnp.float32(jnp.pi / 2) - t, t)
    t = jnp.where(x < 0, jnp.float32(jnp.pi) - t, t)
    return jnp.where(y < 0, -t, t)


def _pair_hist(q, qn, cand, cn, w, r2, out_ref, base_rows: int):
    """Shared SPFH body: bin pair features of (query rows × candidate
    cols) under selection ``w`` and write 33 hist rows + count into
    ``out_ref`` starting at ``base_rows``."""
    dx = cand[0, :][None, :] - q[0, :][:, None]          # (tile, W)
    dy = cand[1, :][None, :] - q[1, :][:, None]
    dz = cand[2, :][None, :] - q[2, :][:, None]
    d2 = dx * dx + dy * dy + dz * dz
    sel = w & (d2 <= r2) & (d2 > 1e-12)
    wf = sel.astype(jnp.float32)

    inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-24))
    ux = dx * inv_d
    uy = dy * inv_d
    uz = dz * inv_d

    # query normal broadcast over cols; candidate normal over rows
    q0, q1, q2 = (qn[j, :][:, None] for j in range(3))
    c0, c1, c2 = (cn[j, :][None, :] for j in range(3))
    a1 = q0 * ux + q1 * uy + q2 * uz
    a2 = c0 * ux + c1 * uy + c2 * uz
    swap = jnp.abs(a1) < jnp.abs(a2)

    nsx = jnp.where(swap, c0, q0)
    nsy = jnp.where(swap, c1, q1)
    nsz = jnp.where(swap, c2, q2)
    ntx = jnp.where(swap, q0, c0)
    nty = jnp.where(swap, q1, c1)
    ntz = jnp.where(swap, q2, c2)
    sgn = jnp.where(swap, -1.0, 1.0)
    ux = ux * sgn
    uy = uy * sgn
    uz = uz * sgn

    f3 = nsx * ux + nsy * uy + nsz * uz
    # v = cross(u, ns), normalised
    vx = uy * nsz - uz * nsy
    vy = uz * nsx - ux * nsz
    vz = ux * nsy - uy * nsx
    inv_v = jax.lax.rsqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-24))
    vx = vx * inv_v
    vy = vy * inv_v
    vz = vz * inv_v
    # w = cross(ns, v)
    wx = nsy * vz - nsz * vy
    wy = nsz * vx - nsx * vz
    wz = nsx * vy - nsy * vx
    f2 = vx * ntx + vy * nty + vz * ntz
    f1 = _atan2_approx(wx * ntx + wy * nty + wz * ntz,
                       nsx * ntx + nsy * nty + nsz * ntz)

    nb = jnp.float32(N_BINS)
    b1 = jnp.clip(((f1 + jnp.float32(jnp.pi))
                   * (nb / jnp.float32(2 * jnp.pi))).astype(jnp.int32),
                  0, N_BINS - 1)
    b2 = jnp.clip(((f2 + 1.0) * (nb / 2.0)).astype(jnp.int32),
                  0, N_BINS - 1)
    b3 = jnp.clip(((f3 + 1.0) * (nb / 2.0)).astype(jnp.int32),
                  0, N_BINS - 1)

    row = base_rows
    for bins in (b1, b2, b3):
        for b in range(N_BINS):
            out_ref[row, :] = jnp.sum(
                jnp.where(bins == b, wf, 0.0), axis=1)
            row += 1
    out_ref[row, :] = jnp.sum(wf, axis=1)


def _spfh_a_kernel(prev_ref, self_ref, next_ref, out_ref, *, r2: float):
    """Pass A: full ±1-tile window. Packed rows [x,y,z,valid,nx,ny,nz].
    Emits (34, tile): 33 hist rows + in-radius count."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    q = self_ref[0:3, :]
    qn = self_ref[4:7, :]
    cand = jnp.concatenate(
        [prev_ref[0:3, :], self_ref[0:3, :], next_ref[0:3, :]], axis=1)
    cn = jnp.concatenate(
        [prev_ref[4:7, :], self_ref[4:7, :], next_ref[4:7, :]], axis=1)
    tile = self_ref.shape[1]
    okp = jnp.where(t > 0, prev_ref[3:4, :], 0.0)
    okn = jnp.where(t < n_t - 1, next_ref[3:4, :], 0.0)
    validf = jnp.concatenate([okp, self_ref[3:4, :], okn], axis=1)
    _pair_hist(q, qn, cand, cn, validf > 0.5, jnp.float32(r2), out_ref, 0)


def _spfh_b_kernel(prev_ref, self_ref, next_ref, pp_ref, sp_ref, np_ref,
                   out_ref, *, r2: float):
    """Pass B over the shifted lattice: only candidates OUTSIDE the
    query's pass-A window (|posA tile delta| > 1) — hist sums add to
    pass A's for an exact two-window union at the fixed radius."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    tile = self_ref.shape[1]
    q = self_ref[0:3, :]
    qn = self_ref[4:7, :]
    cand = jnp.concatenate(
        [prev_ref[0:3, :], self_ref[0:3, :], next_ref[0:3, :]], axis=1)
    cn = jnp.concatenate(
        [prev_ref[4:7, :], self_ref[4:7, :], next_ref[4:7, :]], axis=1)
    okp = jnp.where(t > 0, prev_ref[3:4, :], 0.0)
    okn = jnp.where(t < n_t - 1, next_ref[3:4, :], 0.0)
    validf = jnp.concatenate([okp, self_ref[3:4, :], okn], axis=1)

    shift = int(tile).bit_length() - 1
    pos_c = jnp.concatenate([pp_ref[0:1, :], sp_ref[0:1, :],
                             np_ref[0:1, :]], axis=1)
    tile_c = jax.lax.shift_right_logical(pos_c, shift)
    tile_q = jax.lax.shift_right_logical(sp_ref[0, :], shift)
    dtile = tile_c[0, :][None, :] - tile_q[:, None]
    outside = (dtile < -1) | (dtile > 1)
    _pair_hist(q, qn, cand, cn, (validf > 0.5) & outside,
               jnp.float32(r2), out_ref, 0)


def _win_specs(rows, tile, n_tiles):
    return [
        pl.BlockSpec((rows, tile), lambda t: (0, jnp.maximum(t - 1, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, tile), lambda t: (0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, tile),
                     lambda t: (0, jnp.minimum(t + 1, n_tiles - 1)),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit, static_argnames=("tile", "interpret", "r2"))
def spfh_a_tiles(packed, r2: float, tile: int = 256,
                 interpret: bool = False):
    """packed: (7, N) [x,y,z,valid,nx,ny,nz] in pass-A sorted order.
    Returns (34, N) raw SPFH sums + counts."""
    n = packed.shape[1]
    assert n % tile == 0
    n_tiles = n // tile
    (out,) = pl.pallas_call(
        functools.partial(_spfh_a_kernel, r2=float(r2)),
        out_shape=[jax.ShapeDtypeStruct((34, n), jnp.float32)],
        grid=(n_tiles,),
        in_specs=_win_specs(7, tile, n_tiles),
        out_specs=[pl.BlockSpec((34, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(packed, packed, packed)
    return out


@functools.partial(jax.jit, static_argnames=("tile", "interpret", "r2"))
def spfh_b_tiles(packed, pos_a, r2: float, tile: int = 256,
                 interpret: bool = False):
    """Pass B (shifted lattice order): pos_a (1, N) int32 pass-A
    positions. Returns (34, N) B-exclusive sums in B order."""
    n = packed.shape[1]
    assert n % tile == 0 and tile & (tile - 1) == 0
    n_tiles = n // tile
    (out,) = pl.pallas_call(
        functools.partial(_spfh_b_kernel, r2=float(r2)),
        out_shape=[jax.ShapeDtypeStruct((34, n), jnp.float32)],
        grid=(n_tiles,),
        in_specs=_win_specs(7, tile, n_tiles) + _win_specs(1, tile,
                                                           n_tiles),
        out_specs=[pl.BlockSpec((34, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(packed, packed, packed, pos_a, pos_a, pos_a)
    return out


def _weight_body(q, cand, validf, extra, w_extra, r2, out_ref):
    """Σ_c (1/d)·spfh_c and Σ_c 1 over in-radius candidates — the
    weighted sum is one MXU matmul against the 33 payload rows."""
    dx = cand[0, :][None, :] - q[0, :][:, None]
    dy = cand[1, :][None, :] - q[1, :][:, None]
    dz = cand[2, :][None, :] - q[2, :][:, None]
    d2 = dx * dx + dy * dy + dz * dz
    sel = validf & w_extra & (d2 <= r2) & (d2 > 1e-12)
    inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-24))
    wgt = jnp.where(sel, inv_d, 0.0)                    # (tile, W)
    acc = jax.lax.dot_general(
        wgt, extra, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)             # (tile, 33)
    for j in range(33):
        out_ref[j, :] = acc[:, j]
    out_ref[33, :] = jnp.sum(sel.astype(jnp.float32), axis=1)


def _fpfh_w_a_kernel(prev_ref, self_ref, next_ref, out_ref, *, r2: float):
    """Stage-2 pass A. Packed rows [x,y,z,valid,spfh(33)] = (37, tile)."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    q = self_ref[0:3, :]
    cand = jnp.concatenate(
        [prev_ref[0:3, :], self_ref[0:3, :], next_ref[0:3, :]], axis=1)
    extra = jnp.concatenate(
        [prev_ref[4:37, :], self_ref[4:37, :], next_ref[4:37, :]], axis=1)
    okp = jnp.where(t > 0, prev_ref[3:4, :], 0.0)
    okn = jnp.where(t < n_t - 1, next_ref[3:4, :], 0.0)
    validf = jnp.concatenate([okp, self_ref[3:4, :], okn], axis=1) > 0.5
    _weight_body(q, cand, validf, extra,
                 jnp.ones_like(validf), jnp.float32(r2), out_ref)


def _fpfh_w_b_kernel(prev_ref, self_ref, next_ref, pp_ref, sp_ref,
                     np_ref, out_ref, *, r2: float):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    tile = self_ref.shape[1]
    q = self_ref[0:3, :]
    cand = jnp.concatenate(
        [prev_ref[0:3, :], self_ref[0:3, :], next_ref[0:3, :]], axis=1)
    extra = jnp.concatenate(
        [prev_ref[4:37, :], self_ref[4:37, :], next_ref[4:37, :]], axis=1)
    okp = jnp.where(t > 0, prev_ref[3:4, :], 0.0)
    okn = jnp.where(t < n_t - 1, next_ref[3:4, :], 0.0)
    validf = jnp.concatenate([okp, self_ref[3:4, :], okn], axis=1) > 0.5
    shift = int(tile).bit_length() - 1
    pos_c = jnp.concatenate([pp_ref[0:1, :], sp_ref[0:1, :],
                             np_ref[0:1, :]], axis=1)
    tile_c = jax.lax.shift_right_logical(pos_c, shift)
    tile_q = jax.lax.shift_right_logical(sp_ref[0, :], shift)
    dtile = tile_c[0, :][None, :] - tile_q[:, None]
    outside = (dtile < -1) | (dtile > 1)
    _weight_body(q, cand, validf, extra, outside, jnp.float32(r2), out_ref)


@functools.partial(jax.jit, static_argnames=("tile", "interpret", "r2"))
def fpfh_weight_a_tiles(packed, r2: float, tile: int = 256,
                        interpret: bool = False):
    """packed: (37, N) [x,y,z,valid,spfh(33)] pass-A order →
    (34, N) weighted neighbor-SPFH sums + neighbor counts."""
    n = packed.shape[1]
    assert n % tile == 0
    n_tiles = n // tile
    (out,) = pl.pallas_call(
        functools.partial(_fpfh_w_a_kernel, r2=float(r2)),
        out_shape=[jax.ShapeDtypeStruct((34, n), jnp.float32)],
        grid=(n_tiles,),
        in_specs=_win_specs(37, tile, n_tiles),
        out_specs=[pl.BlockSpec((34, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(packed, packed, packed)
    return out


@functools.partial(jax.jit, static_argnames=("tile", "interpret", "r2"))
def fpfh_weight_b_tiles(packed, pos_a, r2: float, tile: int = 256,
                        interpret: bool = False):
    n = packed.shape[1]
    assert n % tile == 0 and tile & (tile - 1) == 0
    n_tiles = n // tile
    (out,) = pl.pallas_call(
        functools.partial(_fpfh_w_b_kernel, r2=float(r2)),
        out_shape=[jax.ShapeDtypeStruct((34, n), jnp.float32)],
        grid=(n_tiles,),
        in_specs=_win_specs(37, tile, n_tiles) + _win_specs(1, tile,
                                                            n_tiles),
        out_specs=[pl.BlockSpec((34, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(packed, packed, packed, pos_a, pos_a, pos_a)
    return out


# ---------------------------------------------------------------------------
# band-limited SPFH (stage-1 fast tier)
# ---------------------------------------------------------------------------

def _spfh_band_body(pack, self_ref, out_ref, *, r2: float, band: int,
                    excl: bool):
    """Banded SPFH: Darboux features + 3×11 bins against a ±``band``
    POSITIONAL window of the Morton order (2·band+1 candidates) instead
    of the 3-tile window (3·tile candidates) — the same candidate-count
    lever as kernels/shot_pallas.py (the histogram stage is O(Q·C·33)
    compare/select sweeps with no matmul structure, so cutting C ~6x is
    the only thing that moves it). Candidate matrices are (2·band+1,
    tile); the reduction axis is the offset (sublane) axis."""
    from .shot_pallas import _band_mats

    tile = self_ref.shape[1]
    rows = [0, 1, 2, 3, 4, 5, 6] + ([7] if excl else [])
    mats = _band_mats(pack, band, tile, rows)
    cx, cy, cz, vm = mats[0], mats[1], mats[2], mats[3]
    c0, c1, c2 = mats[4], mats[5], mats[6]

    qx = self_ref[0:1, :]
    qy = self_ref[1:2, :]
    qz = self_ref[2:3, :]
    q0 = self_ref[4:5, :]
    q1 = self_ref[5:6, :]
    q2 = self_ref[6:7, :]

    dx = cx - qx
    dy = cy - qy
    dz = cz - qz
    d2 = dx * dx + dy * dy + dz * dz
    sel = (vm > 0.5) & (d2 <= r2) & (d2 > 1e-12)
    if excl:
        pa = mats[7]
        qpa = self_ref[7:8, :]
        sel = sel & (jnp.abs(pa - qpa) > float(band))
    wf = sel.astype(jnp.float32)

    inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-24))
    ux = dx * inv_d
    uy = dy * inv_d
    uz = dz * inv_d

    a1 = q0 * ux + q1 * uy + q2 * uz
    a2 = c0 * ux + c1 * uy + c2 * uz
    swap = jnp.abs(a1) < jnp.abs(a2)

    nsx = jnp.where(swap, c0, q0)
    nsy = jnp.where(swap, c1, q1)
    nsz = jnp.where(swap, c2, q2)
    ntx = jnp.where(swap, q0, c0)
    nty = jnp.where(swap, q1, c1)
    ntz = jnp.where(swap, q2, c2)
    sgn = jnp.where(swap, -1.0, 1.0)
    ux = ux * sgn
    uy = uy * sgn
    uz = uz * sgn

    f3 = nsx * ux + nsy * uy + nsz * uz
    vx = uy * nsz - uz * nsy
    vy = uz * nsx - ux * nsz
    vz = ux * nsy - uy * nsx
    inv_v = jax.lax.rsqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-24))
    vx = vx * inv_v
    vy = vy * inv_v
    vz = vz * inv_v
    wx = nsy * vz - nsz * vy
    wy = nsz * vx - nsx * vz
    wz = nsx * vy - nsy * vx
    f2 = vx * ntx + vy * nty + vz * ntz
    f1 = _atan2_approx(wx * ntx + wy * nty + wz * ntz,
                       nsx * ntx + nsy * nty + nsz * ntz)

    nb = jnp.float32(N_BINS)
    b1 = jnp.clip(((f1 + jnp.float32(jnp.pi))
                   * (nb / jnp.float32(2 * jnp.pi))).astype(jnp.int32),
                  0, N_BINS - 1)
    b2 = jnp.clip(((f2 + 1.0) * (nb / 2.0)).astype(jnp.int32),
                  0, N_BINS - 1)
    b3 = jnp.clip(((f3 + 1.0) * (nb / 2.0)).astype(jnp.int32),
                  0, N_BINS - 1)

    row = 0
    for bins in (b1, b2, b3):
        for b in range(N_BINS):
            out_ref[row, :] = jnp.sum(
                jnp.where(bins == b, wf, 0.0), axis=0)
            row += 1
    out_ref[row, :] = jnp.sum(wf, axis=0)


def _spfh_band_a_kernel(prev_ref, self_ref, next_ref, out_ref, *,
                        r2: float, band: int):
    from .shot_pallas import _window_pack
    pack = _window_pack(prev_ref, self_ref, next_ref, 7)
    _spfh_band_body(pack, self_ref, out_ref, r2=r2, band=band,
                    excl=False)


def _spfh_band_b_kernel(prev_ref, self_ref, next_ref, out_ref, *,
                        r2: float, band: int):
    from .shot_pallas import _window_pack
    pack = _window_pack(prev_ref, self_ref, next_ref, 8)
    _spfh_band_body(pack, self_ref, out_ref, r2=r2, band=band,
                    excl=True)


@functools.partial(jax.jit, static_argnames=("r2", "band", "tile",
                                             "interpret"))
def spfh_band_a_tiles(packed, r2: float, band: int, tile: int = 256,
                      interpret: bool = False):
    """packed: (7, N) [x,y,z,valid,nx,ny,nz] pass-A order →
    (34, N) banded SPFH sums + counts."""
    n = packed.shape[1]
    assert n % tile == 0 and band <= tile
    n_tiles = n // tile
    (out,) = pl.pallas_call(
        functools.partial(_spfh_band_a_kernel, r2=float(r2),
                          band=int(band)),
        out_shape=[jax.ShapeDtypeStruct((34, n), jnp.float32)],
        grid=(n_tiles,),
        in_specs=_win_specs(7, tile, n_tiles),
        out_specs=[pl.BlockSpec((34, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(packed, packed, packed)
    return out


@functools.partial(jax.jit, static_argnames=("r2", "band", "tile",
                                             "interpret"))
def spfh_band_b_tiles(packed, r2: float, band: int, tile: int = 256,
                      interpret: bool = False):
    """packed: (8, N) [x,y,z,valid,nx,ny,nz,posA] pass-B order; the
    pass-A position rides as an f32 row (exact below 2^24 points, the
    same contract as the SHOT kernels) → (34, N) B-exclusive sums."""
    n = packed.shape[1]
    assert n % tile == 0 and tile & (tile - 1) == 0 and band <= tile
    n_tiles = n // tile
    (out,) = pl.pallas_call(
        functools.partial(_spfh_band_b_kernel, r2=float(r2),
                          band=int(band)),
        out_shape=[jax.ShapeDtypeStruct((34, n), jnp.float32)],
        grid=(n_tiles,),
        in_specs=_win_specs(8, tile, n_tiles),
        out_specs=[pl.BlockSpec((34, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(packed, packed, packed)
    return out
