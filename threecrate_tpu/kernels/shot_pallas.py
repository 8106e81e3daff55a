"""Fused SHOT/USC pallas kernels: band-window LRF moments + histogram.

The staged SHOT path (ops/features._shot) materialises (N, k) neighbor
ids, gathers candidate rows, and contracts 352-d one-hots per `lax.map`
block — 908 ms at 1M on v5e, dominated by the (block, k, 352) one-hot
staging. These kernels compute the descriptor WITHOUT ids or gathers,
and — the actual work reduction — against a ±``band`` POSITIONAL window
of the Morton order (2·band+1 candidates per pass) instead of the
3-tile window (3·tile candidates): the histogram stage is O(Q·C·B)
compare/select sweeps with no matmul structure (both the volume bin and
the cos bin depend on the per-QUERY LRF, so neither one-hot factor of
H[q,v,b] = Σ_c wv[q,c,v]·u[q,c,b] is query-independent and the MXU
cannot contract it), so cutting C 3-6x is the only lever that moves it.

Two phases, each a 2-pass shifted-lattice UNION (fixed radius ⇒ sums
over the disjoint A/B candidate sets simply add — the same argument as
kernels/fpfh_pallas.py):

* moments (``shot_moments_*_tiles``): per query the (R−d)-weighted
  first/second raw moments of query-centered neighbor displacements,
  plus binary count and Σd for the LRF sign disambiguation — 14 rows.
  The caller merges A+B, builds the weighted covariance and runs the
  batched eigh3x3 in XLA (36 MB of 3x3s at 1M — nothing like the
  (N, k, 3) gathers the staged path needed).
* histogram (``shot_hist_*_tiles``): per (query, candidate) the in-LRF
  displacement → 8 azimuth × 2 elevation × 2 radial volume bins and the
  soft two-bin cos(normal·z) vote (SHOT, 352-d) or the 8-radial density
  bin (USC, 128-d), accumulated by an unrolled per-bin masked sweep
  with compare REUSE: the hi-vote of bin j is the lo-compare of bin
  j−1, and the lo==10 clamp is folded into the lo-vote weight, so each
  bin costs one compare + two selects + one sublane reduction.

Pass B excludes candidates whose pass-A position lies within the
query's pass-A band (|posA_c − posA_q| <= band), exactly partitioning
the union. Azimuth uses the quadrant-corrected polynomial atan2 from
fpfh_pallas (pallas TPU lowers no atan2; bin width is π/4).

Reference: features.rs:294-420 (SHOT/USC + disambiguated LRF).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fpfh_pallas import _atan2_approx

SHOT_DIM = 352
USC_DIM = 128
N_COS = 11


def _band_mats(pack, band: int, tile: int, rows):
    """Per-offset candidate rows of a (R, 3·tile) window pack.

    Returns, for each requested packed row index in ``rows``, a
    (2·band+1, tile) matrix whose [o, i] element is
    pack[row, tile + i + (o − band)] — candidate at signed offset
    o − band from query i. One pltpu.roll per offset; all later math
    runs matrix-wise at full vector width.
    """
    w3 = pack.shape[1]
    per_row = [[] for _ in rows]
    for off in range(-band, band + 1):
        pr = pltpu.roll(pack, (-off) % w3, axis=1) if off else pack
        sl = pr[:, tile:2 * tile]
        for j, r in enumerate(rows):
            # keep slices 2-D: Mosaic rejects 1-D row extraction at
            # sublane offset > 0 (layout check `offset < tiling`)
            per_row[j].append(sl[r:r + 1, :])
    return [jnp.concatenate(v, axis=0) for v in per_row]


def _window_pack(prev_ref, self_ref, next_ref, n_rows: int):
    """(n_rows, 3·tile) window pack with boundary tiles invalidated
    (the BlockSpec index map clamps t−1/t+1 at the edges, so the edge
    windows would otherwise see duplicated self tiles)."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    pack = jnp.concatenate(
        [prev_ref[0:n_rows, :], self_ref[0:n_rows, :],
         next_ref[0:n_rows, :]], axis=1)
    tile = self_ref.shape[1]
    vrow = pack[3:4, :]                       # 2-D slice (see _band_mats)
    ok_prev = jnp.where(t > 0, vrow[:, :tile], 0.0)
    ok_next = jnp.where(t < n_t - 1, vrow[:, 2 * tile:], 0.0)
    valid = jnp.concatenate(
        [ok_prev, vrow[:, tile:2 * tile], ok_next], axis=1)
    rows = [pack[0:3], valid]
    if n_rows > 4:  # a pack[4:] slice of a 4-row pack is 0-sized —
        rows.append(pack[4:])  # Mosaic rejects 0-extent vector types
    return jnp.concatenate(rows, axis=0)


def _moments_body(pack, self_ref, out_ref, *, r2: float, band: int,
                  excl: bool):
    tile = self_ref.shape[1]
    rows = [0, 1, 2, 3] + ([4] if excl else [])
    mats = _band_mats(pack, band, tile, rows)
    cx, cy, cz, vm = mats[0], mats[1], mats[2], mats[3]
    qx = self_ref[0:1, :]
    qy = self_ref[1:2, :]
    qz = self_ref[2:3, :]
    dx = cx - qx
    dy = cy - qy
    dz = cz - qz
    d2 = dx * dx + dy * dy + dz * dz
    sel = (vm > 0.5) & (d2 <= r2) & (d2 > 1e-18)
    if excl:
        pa = mats[4]
        qpa = self_ref[4:5, :]
        sel = sel & (jnp.abs(pa - qpa) > float(band))
    selF = sel.astype(jnp.float32)
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    w = jnp.maximum(jnp.float32(jnp.sqrt(r2)) - d, 0.0) * selF

    out_ref[0, :] = jnp.sum(w, axis=0)
    out_ref[1, :] = jnp.sum(w * dx, axis=0)
    out_ref[2, :] = jnp.sum(w * dy, axis=0)
    out_ref[3, :] = jnp.sum(w * dz, axis=0)
    out_ref[4, :] = jnp.sum(w * dx * dx, axis=0)
    out_ref[5, :] = jnp.sum(w * dy * dy, axis=0)
    out_ref[6, :] = jnp.sum(w * dz * dz, axis=0)
    out_ref[7, :] = jnp.sum(w * dx * dy, axis=0)
    out_ref[8, :] = jnp.sum(w * dx * dz, axis=0)
    out_ref[9, :] = jnp.sum(w * dy * dz, axis=0)
    out_ref[10, :] = jnp.sum(selF, axis=0)
    # far-amplified first moment Σ w·d·|d|² (rows 11-13): an
    # independent odd statistic for the x-axis sign tie-break — on
    # near-symmetric neighborhoods the plain Σ w·d vote sits at the
    # sampling-noise floor and flips between resamplings, while the
    # |d|² weighting keys on the radius-boundary asymmetry, which is
    # geometric and resampling-stable (the SHOT paper's far-subset
    # disambiguation in smooth form).
    wd2 = w * d2
    out_ref[11, :] = jnp.sum(wd2 * dx, axis=0)
    out_ref[12, :] = jnp.sum(wd2 * dy, axis=0)
    out_ref[13, :] = jnp.sum(wd2 * dz, axis=0)


def _moments_a_kernel(prev_ref, self_ref, next_ref, out_ref, *,
                      r2: float, band: int):
    pack = _window_pack(prev_ref, self_ref, next_ref, 4)
    _moments_body(pack, self_ref, out_ref, r2=r2, band=band, excl=False)


def _moments_b_kernel(prev_ref, self_ref, next_ref, out_ref, *,
                      r2: float, band: int):
    pack = _window_pack(prev_ref, self_ref, next_ref, 5)
    _moments_body(pack, self_ref, out_ref, r2=r2, band=band, excl=True)


def _hist_body(pack, self_ref, lrf_ref, out_ref, *, r2: float, band: int,
               excl: bool, variant: str):
    tile = self_ref.shape[1]
    rows = [0, 1, 2, 3, 4, 5, 6] + ([7] if excl else [])
    mats = _band_mats(pack, band, tile, rows)
    cx, cy, cz, vm = mats[0], mats[1], mats[2], mats[3]
    nx, ny, nz = mats[4], mats[5], mats[6]
    qx = self_ref[0:1, :]
    qy = self_ref[1:2, :]
    qz = self_ref[2:3, :]
    dx = cx - qx
    dy = cy - qy
    dz = cz - qz
    d2 = dx * dx + dy * dy + dz * dz
    sel = (vm > 0.5) & (d2 <= r2) & (d2 > 1e-18)
    if excl:
        pa = mats[7]
        qpa = self_ref[7:8, :]
        sel = sel & (jnp.abs(pa - qpa) > float(band))
    selF = sel.astype(jnp.float32)

    # in-LRF displacement: query axes broadcast over the offset axis
    # (2-D row slices — see _band_mats note)
    x0 = lrf_ref[0:1, :]
    x1 = lrf_ref[1:2, :]
    x2 = lrf_ref[2:3, :]
    y0 = lrf_ref[3:4, :]
    y1 = lrf_ref[4:5, :]
    y2 = lrf_ref[5:6, :]
    z0 = lrf_ref[6:7, :]
    z1 = lrf_ref[7:8, :]
    z2 = lrf_ref[8:9, :]
    lx = dx * x0 + dy * x1 + dz * x2
    ly = dx * y0 + dy * y1 + dz * y2
    lz = dx * z0 + dy * z1 + dz * z2

    az = _atan2_approx(ly, lx)
    az_bin = jnp.clip(((az + jnp.float32(jnp.pi))
                       * jnp.float32(8.0 / (2.0 * jnp.pi))
                       ).astype(jnp.int32), 0, 7)
    el_bin = (lz >= 0).astype(jnp.int32)

    if variant == "shot":
        rad_bin = (d2 >= 0.25 * r2).astype(jnp.int32)
        vol = (az_bin * 2 + el_bin) * 2 + rad_bin            # [0, 32)
        cosn = nx * z0 + ny * z1 + nz * z2
        pos = jnp.clip((cosn + 1.0) * jnp.float32(0.5 * N_COS) - 0.5,
                       0.0, jnp.float32(N_COS - 1))
        lo = pos.astype(jnp.int32)                            # floor >= 0
        frac = pos - lo.astype(jnp.float32)
        at_top = lo == (N_COS - 1)
        # fold the hi==lo clamp into the lo vote; hi-vote bin is
        # then always jlo + 1
        wl = jnp.where(at_top, selF, selF * (1.0 - frac))
        wh = jnp.where(at_top, 0.0, selF * frac)
        jid = vol * N_COS + lo
        dim = SHOT_DIM
    else:  # usc: 8 az x 2 el x 8 radial density, hard binning
        r = jnp.sqrt(jnp.maximum(d2, 0.0))
        inv_r = jax.lax.rsqrt(jnp.float32(r2))
        rad_bin = jnp.clip((r * inv_r * 8.0).astype(jnp.int32), 0, 7)
        jid = (az_bin * 2 + el_bin) * 8 + rad_bin             # [0, 128)
        wl = selF
        wh = None
        dim = USC_DIM

    c_prev = None
    for j in range(dim):
        c_cur = jid == j
        contrib = jnp.where(c_cur, wl, 0.0)
        if wh is not None and c_prev is not None:
            contrib = contrib + jnp.where(c_prev, wh, 0.0)
        out_ref[j, :] = jnp.sum(contrib, axis=0)
        c_prev = c_cur
    out_ref[dim, :] = jnp.sum(selF, axis=0)


def _hist_a_kernel(prev_ref, self_ref, next_ref, lp_ref, ls_ref, ln_ref,
                   out_ref, *, r2: float, band: int, variant: str):
    pack = _window_pack(prev_ref, self_ref, next_ref, 7)
    _hist_body(pack, self_ref, ls_ref, out_ref, r2=r2, band=band,
               excl=False, variant=variant)


def _hist_b_kernel(prev_ref, self_ref, next_ref, lp_ref, ls_ref, ln_ref,
                   out_ref, *, r2: float, band: int, variant: str):
    pack = _window_pack(prev_ref, self_ref, next_ref, 8)
    _hist_body(pack, self_ref, ls_ref, out_ref, r2=r2, band=band,
               excl=True, variant=variant)


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


@functools.partial(jax.jit, static_argnames=("r2", "band", "tile",
                                             "interpret"))
def shot_moments_a_tiles(packed, r2: float, band: int, tile: int = 256,
                         interpret: bool = False):
    """packed: (4, N) [x, y, z, valid] in pass-A sorted order →
    (14, N) LRF moment rows (see _moments_body)."""
    n = packed.shape[1]
    assert n % tile == 0 and band <= tile
    n_tiles = n // tile
    (out,) = pl.pallas_call(
        functools.partial(_moments_a_kernel, r2=float(r2), band=band),
        out_shape=[jax.ShapeDtypeStruct((14, n), jnp.float32)],
        grid=(n_tiles,),
        in_specs=_win_specs(4, tile, n_tiles),
        out_specs=[pl.BlockSpec((14, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(packed, packed, packed)
    return out


@functools.partial(jax.jit, static_argnames=("r2", "band", "tile",
                                             "interpret"))
def shot_moments_b_tiles(packed, r2: float, band: int, tile: int = 256,
                         interpret: bool = False):
    """packed: (5, N) [x, y, z, valid, posA] in pass-B order →
    (14, N) moment rows over candidates OUTSIDE the pass-A band."""
    n = packed.shape[1]
    assert n % tile == 0 and band <= tile
    n_tiles = n // tile
    (out,) = pl.pallas_call(
        functools.partial(_moments_b_kernel, r2=float(r2), band=band),
        out_shape=[jax.ShapeDtypeStruct((14, n), jnp.float32)],
        grid=(n_tiles,),
        in_specs=_win_specs(5, tile, n_tiles),
        out_specs=[pl.BlockSpec((14, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(packed, packed, packed)
    return out


@functools.partial(jax.jit, static_argnames=("r2", "band", "tile",
                                             "interpret", "variant"))
def shot_hist_a_tiles(packed, lrf, r2: float, band: int,
                      tile: int = 256, interpret: bool = False,
                      variant: str = "shot"):
    """packed: (7, N) [x,y,z,valid,nx,ny,nz] pass-A order; lrf: (9, N)
    query LRF rows [x(3), y(3), z(3)] → (dim+1, N) histogram + count."""
    n = packed.shape[1]
    assert n % tile == 0 and band <= tile
    n_tiles = n // tile
    dim = SHOT_DIM if variant == "shot" else USC_DIM
    (out,) = pl.pallas_call(
        functools.partial(_hist_a_kernel, r2=float(r2), band=band,
                          variant=variant),
        out_shape=[jax.ShapeDtypeStruct((dim + 1, n), jnp.float32)],
        grid=(n_tiles,),
        in_specs=_win_specs(7, tile, n_tiles) + _win_specs(9, tile,
                                                           n_tiles),
        out_specs=[pl.BlockSpec((dim + 1, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(packed, packed, packed, lrf, lrf, lrf)
    return out


@functools.partial(jax.jit, static_argnames=("r2", "band", "tile",
                                             "interpret", "variant"))
def shot_hist_b_tiles(packed, lrf, r2: float, band: int,
                      tile: int = 256, interpret: bool = False,
                      variant: str = "shot"):
    """packed: (8, N) [x,y,z,valid,nx,ny,nz,posA] pass-B order; lrf in
    pass-B order → (dim+1, N) histogram over B-exclusive candidates."""
    n = packed.shape[1]
    assert n % tile == 0 and band <= tile
    n_tiles = n // tile
    dim = SHOT_DIM if variant == "shot" else USC_DIM
    (out,) = pl.pallas_call(
        functools.partial(_hist_b_kernel, r2=float(r2), band=band,
                          variant=variant),
        out_shape=[jax.ShapeDtypeStruct((dim + 1, n), jnp.float32)],
        grid=(n_tiles,),
        in_specs=_win_specs(8, tile, n_tiles) + _win_specs(9, tile,
                                                           n_tiles),
        out_specs=[pl.BlockSpec((dim + 1, tile), lambda t: (0, t),
                                memory_space=pltpu.VMEM)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(packed, packed, packed, lrf, lrf, lrf)
    return out
