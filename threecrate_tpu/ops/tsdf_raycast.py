"""TSDF raycasting: per-pixel ray marching over dense and block-sparse
volumes.

Closes the KinectFusion-style frame-to-model loop that the reference
leaves open: threecrate-gpu renders point clouds and meshes
(renderer.rs:139-550, mesh.rs) but has no volume renderer — its TSDF
(tsdf.rs:83-310) can only be viewed by extracting points or a mesh
first. Raycasting the volume directly gives (a) synthetic depth /
vertex / normal maps for projective frame-to-model tracking
(``ops/frame_to_model.py``) and (b) a direct volume view for the viz
layer with no extraction pass.

TPU shape: all H·W rays march together inside ONE ``lax.while_loop``
(exit when every ray has hit or left the far plane — no per-ray Python
control flow). During the march each step costs a single
nearest-neighbor volume fetch per ray (the HBM-latency gather is the
budget; trilinear would be 8×), with the step length scaled by the
fetched TSDF value (sphere-tracing-style skipping: a voxel that reads
"far" cannot hide a surface within ~0.75·truncation of projective
band). The zero crossing is then REFINED once per ray with trilinear
samples at the bracketing points (secant step) and the normal comes
from the analytic gradient of the same 8-corner trilinear patch — no
extra fetches beyond the refinement's.

Unobserved voxels (weight = 0) read as free space during the march but
invalidate a crossing: a hit requires both bracketing samples observed,
so rays never report surfaces conjured from the initial tsdf=1 fill.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .tsdf import TsdfVolume
from .tsdf_sparse import SparseTsdfVolume


class RaycastResult(NamedTuple):
    """Synthetic camera maps from one raycast pass."""

    depth: jnp.ndarray     # (H, W) f32 ray depth (z in camera), 0 = miss
    vertices: jnp.ndarray  # (H, W, 3) f32 world-space hit points
    normals: jnp.ndarray   # (H, W, 3) f32 world-space unit normals
    mask: jnp.ndarray      # (H, W) bool
    # mask minus grazing/border hits whose trilinear bracket had no
    # sign change (their depth comes from nearest-sample interpolation
    # — good enough to render, half-voxel biased for tracking)
    confident: jnp.ndarray = None  # (H, W) bool
    # nearest-voxel color at the hit point when the volume carries a
    # color channel (integrated with with_color=True); None otherwise
    color: jnp.ndarray = None      # (H, W, 3) f32 in [0, 1]


# ---------------------------------------------------------------------------
# samplers: value at a world point + (for trilinear) analytic gradient
# ---------------------------------------------------------------------------

_UNOBS = jnp.float32(2.0)   # sentinel: > 1 ⇒ unobserved / out of volume


def _encode_observed(tsdf: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Fold the weight>0 flag into the value array ONCE before the
    march: unobserved voxels read the sentinel 2.0. The march then
    costs a single gather per ray step instead of two (tsdf + weight)
    — the gathers are HBM-latency bound, so this halves the step."""
    return jnp.where(weight.reshape(-1) > 0, tsdf.reshape(-1), _UNOBS)


def _dense_nearest(enc: jnp.ndarray, vol: TsdfVolume, p: jnp.ndarray):
    """Nearest-voxel encoded TSDF at world points p (R, 3).
    Out-of-volume and unobserved voxels read (1.0, observed=False)."""
    nx, ny, nz = vol.resolution
    g = (p - vol.origin) / vol.voxel_size - 0.5
    i = jnp.round(g).astype(jnp.int32)
    inb = jnp.all((i >= 0) & (i < jnp.array([nx, ny, nz])), axis=1)
    i = jnp.clip(i, 0, jnp.array([nx - 1, ny - 1, nz - 1]))
    lin = (i[:, 0] * ny + i[:, 1]) * nz + i[:, 2]
    v = jnp.where(inb, enc[lin], _UNOBS)
    obs = v < 1.5
    return jnp.minimum(v, 1.0), obs


def _corner_weights(f: jnp.ndarray):
    """Trilinear corner weights (R, 8) and the per-axis derivative
    factors, corner order (dx, dy, dz) lexicographic."""
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    wx = jnp.stack([1 - fx, fx], 1)            # (R, 2)
    wy = jnp.stack([1 - fy, fy], 1)
    wz = jnp.stack([1 - fz, fz], 1)
    w = (wx[:, :, None, None] * wy[:, None, :, None]
         * wz[:, None, None, :]).reshape(-1, 8)
    return w, (wx, wy, wz)


def _trilinear_from_corners(vals, obs, f, voxel):
    """Value, gradient (world units), and all-corners-observed flag from
    8 corner samples (R, 8) in (dx, dy, dz) lexicographic order."""
    w, (wx, wy, wz) = _corner_weights(f)
    val = jnp.sum(vals * w, axis=1)
    v = vals.reshape(-1, 2, 2, 2)
    o = obs.reshape(-1, 2, 2, 2)

    # d/dx of trilinear = Σ (v1yz − v0yz)·wy·wz etc.; /voxel → world.
    # Unobserved corners carry a clamped 1.0 fill whose finite
    # difference is fake signal (it tilts plane normals by >70° on
    # grazing border rays) — weight each corner-pair difference by
    # both-corners-observed and renormalise; an axis with NO observed
    # pair carries no information and contributes 0 (the raw sum there
    # is pure clamp artifact). Fully-observed cells (the bulk) are
    # bit-identical to the unmasked formula.
    def axis_grad(dv, pair_obs, wgt):
        m = pair_obs.astype(dv.dtype)
        den = jnp.sum(wgt * m, axis=(1, 2))
        num = jnp.sum(dv * wgt * m, axis=(1, 2))
        return jnp.where(den > 1e-6, num / jnp.maximum(den, 1e-6), 0.0)

    wyz = wy[:, :, None] * wz[:, None, :]
    wxz = wx[:, :, None] * wz[:, None, :]
    wxy = wx[:, :, None] * wy[:, None, :]
    gx = axis_grad(v[:, 1] - v[:, 0], o[:, 1] & o[:, 0], wyz)
    gy = axis_grad(v[:, :, 1] - v[:, :, 0], o[:, :, 1] & o[:, :, 0], wxz)
    gz = axis_grad(v[:, :, :, 1] - v[:, :, :, 0],
                   o[:, :, :, 1] & o[:, :, :, 0], wxy)
    grad = jnp.stack([gx, gy, gz], axis=1) / voxel
    return val, grad, jnp.all(obs, axis=1)


_CORNER_OFFS = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1)
                for dz in (0, 1)]


def _dense_trilinear(enc: jnp.ndarray, vol: TsdfVolume, p: jnp.ndarray):
    """Trilinear TSDF value + world-space gradient at p (R, 3).
    Unobserved corners read their stored 1.0 fill (enc min-clamps the
    sentinel back), matching the un-encoded behavior."""
    nx, ny, nz = vol.resolution
    g = (p - vol.origin) / vol.voxel_size - 0.5
    i0 = jnp.floor(g).astype(jnp.int32)
    f = g - i0.astype(jnp.float32)
    inb = jnp.all((i0 >= 0) & (i0 + 1 < jnp.array([nx, ny, nz])), axis=1)
    i0 = jnp.clip(i0, 0, jnp.array([nx - 2, ny - 2, nz - 2]))
    vals, obs = [], []
    for dx, dy, dz in _CORNER_OFFS:
        lin = ((i0[:, 0] + dx) * ny + i0[:, 1] + dy) * nz + i0[:, 2] + dz
        v = enc[lin]
        vals.append(jnp.minimum(v, 1.0))
        obs.append(v < 1.5)
    vals = jnp.stack(vals, axis=1)              # (R, 8)
    obs = jnp.stack(obs, axis=1) & inb[:, None]
    return _trilinear_from_corners(vals, obs, f, vol.voxel_size)


def _block_row_map(vol: SparseTsdfVolume,
                   grid_blocks: Tuple[int, int, int]) -> jnp.ndarray:
    """Dense block-key → table-row map (gx·gy·gz,), −1 if unallocated.

    Built ONCE per raycast (one vectorised searchsorted over the whole
    virtual block grid, ≤64³ = 262k entries) so every march step's
    lookup is a single cheap gather instead of a log(max_blocks)
    binary-search round per sample."""
    gx, gy, gz = grid_blocks
    keys = jnp.arange(gx * gy * gz, dtype=jnp.int32)
    row = jnp.searchsorted(vol.block_keys, keys).astype(jnp.int32)
    row = jnp.clip(row, 0, vol.max_blocks - 1)
    hit = vol.block_keys[row] == keys
    return jnp.where(hit, row, jnp.int32(-1))


def _sparse_nearest(enc: jnp.ndarray, vol: SparseTsdfVolume,
                    row_map: jnp.ndarray, p: jnp.ndarray,
                    dirs: jnp.ndarray,
                    grid_blocks: Tuple[int, int, int], block: int):
    """Encoded nearest sample + empty-block skip distance.

    An unallocated block contains NO part of the surface band (sparse
    allocation covers the band plus a one-voxel apron), so when the
    sampled voxel's block is unallocated the ray can jump straight to
    its exit from that block (per-axis DDA boundary, in ray-parameter
    units) instead of crawling through it at coarse steps. ``skip`` is
    0 where no such jump applies."""
    gx, gy, gz = grid_blocks
    s1 = block + 1
    g = (p - vol.origin) / vol.voxel_size - 0.5
    vox = jnp.round(g).astype(jnp.int32)
    b = vox // block
    l = vox - b * block                          # [0, block-1]
    inb = jnp.all(vox >= 0, axis=1) \
        & (b[:, 0] < gx) & (b[:, 1] < gy) & (b[:, 2] < gz)
    key = (b[:, 0] * gy + b[:, 1]) * gz + b[:, 2]
    row = row_map[jnp.clip(key, 0, row_map.shape[0] - 1)]
    alloc = (row >= 0) & inb
    flat = (l[:, 0] * s1 + l[:, 1]) * s1 + l[:, 2]
    lin = jnp.maximum(row, 0) * (s1 ** 3) + flat
    v = jnp.where(alloc, enc[lin], _UNOBS)
    obs = v < 1.5

    # DDA exit of the sampled block, in t units (p = o + t·d, so
    # (boundary − p)/d IS a t increment). Boundaries from the rounded
    # voxel's block; landing ≤¼ voxel into the next block is no deeper
    # than an ordinary coarse step would reach.
    bw = jnp.float32(block) * vol.voxel_size
    lo = jnp.asarray(vol.origin) + b.astype(jnp.float32) * bw
    bound = jnp.where(dirs > 0, lo + bw, lo)
    ax = jnp.where(jnp.abs(dirs) > 1e-12, (bound - p) / dirs, jnp.inf)
    exit_t = jnp.min(jnp.where(jnp.isfinite(ax), ax, jnp.inf), axis=1)
    skip = jnp.where(inb & (row < 0),
                     jnp.maximum(exit_t, 0.0) + 0.25 * vol.voxel_size,
                     0.0)
    return jnp.minimum(v, 1.0), obs, skip


def _dense_color(vol: TsdfVolume, p: jnp.ndarray) -> jnp.ndarray:
    """Nearest-voxel color rows at hit points (one row gather)."""
    nx, ny, nz = vol.resolution
    g = (p - vol.origin) / vol.voxel_size - 0.5
    i = jnp.clip(jnp.round(g).astype(jnp.int32), 0,
                 jnp.array([nx - 1, ny - 1, nz - 1]))
    lin = (i[:, 0] * ny + i[:, 1]) * nz + i[:, 2]
    return vol.color.reshape(-1, 3)[lin]


def _sparse_color(vol: SparseTsdfVolume, row_map: jnp.ndarray,
                  p: jnp.ndarray, grid_blocks: Tuple[int, int, int],
                  block: int) -> jnp.ndarray:
    """Nearest-voxel color rows from the block table (0 where the
    block is unallocated — misses are masked by the caller anyway)."""
    gx, gy, gz = grid_blocks
    s1 = block + 1
    g = (p - vol.origin) / vol.voxel_size - 0.5
    vox = jnp.round(g).astype(jnp.int32)
    b = vox // block
    l = vox - b * block
    inb = jnp.all(vox >= 0, axis=1) \
        & (b[:, 0] < gx) & (b[:, 1] < gy) & (b[:, 2] < gz)
    key = (b[:, 0] * gy + b[:, 1]) * gz + b[:, 2]
    row = row_map[jnp.clip(key, 0, row_map.shape[0] - 1)]
    alloc = (row >= 0) & inb
    flat = (l[:, 0] * s1 + l[:, 1]) * s1 + l[:, 2]
    lin = jnp.maximum(row, 0) * (s1 ** 3) + flat
    c = vol.color.reshape(-1, 3)[lin]
    return jnp.where(alloc[:, None], c, 0.0)


def _sparse_trilinear(enc: jnp.ndarray, vol: SparseTsdfVolume,
                      row_map: jnp.ndarray, p: jnp.ndarray,
                      grid_blocks: Tuple[int, int, int], block: int):
    """Trilinear sample in the block table, each corner fetched from
    its OWN voxel's block. A single low-corner-block lookup (the
    apron trick) reads all 8 corners as clamped 1.0 whenever the low
    corner falls one voxel into an unallocated neighbor — exactly the
    block-boundary cells the refinement secant lands on — flattening
    gradients to zero there. Per-corner lookups cost 8 row-map
    gathers, paid only in the ~6 refinement evals, not the march."""
    s1 = block + 1
    gx, gy, gz = grid_blocks
    g = (p - vol.origin) / vol.voxel_size - 0.5
    v0 = jnp.floor(g).astype(jnp.int32)
    f = g - v0.astype(jnp.float32)
    vals, obs = [], []
    for dx, dy, dz in _CORNER_OFFS:
        vc = v0 + jnp.array([dx, dy, dz], jnp.int32)
        b = vc // block
        l = vc - b * block
        inb = jnp.all(vc >= 0, axis=1) \
            & (b[:, 0] < gx) & (b[:, 1] < gy) & (b[:, 2] < gz)
        key = (b[:, 0] * gy + b[:, 1]) * gz + b[:, 2]
        row = row_map[jnp.clip(key, 0, row_map.shape[0] - 1)]
        alloc = (row >= 0) & inb
        flat = (l[:, 0] * s1 + l[:, 1]) * s1 + l[:, 2]
        lin = jnp.maximum(row, 0) * (s1 ** 3) + flat
        v = jnp.where(alloc, enc[lin], _UNOBS)
        vals.append(jnp.minimum(v, 1.0))
        obs.append(v < 1.5)
    vals = jnp.stack(vals, axis=1)
    obs = jnp.stack(obs, axis=1)
    return _trilinear_from_corners(vals, obs, f, vol.voxel_size)


_EMPTY_BLOCK = jnp.float32(3.0)   # sentinel: unallocated block (skippable)

# default budget for materialising a block-major dense copy of the
# sparse table before marching (512^3 f32 = 512 MB fits; 1024^3 doesn't)
_MATERIALIZE_BUDGET_BYTES = 768 * 1024 * 1024


def _block_major_dense(vol: SparseTsdfVolume,
                       grid_blocks: Tuple[int, int, int],
                       block: int) -> jnp.ndarray:
    """Materialise the sparse table as a (gx·gy·gz · B³,) block-major
    encoded array: voxel v lives at key(v//B)·B³ + flat(v mod B), so
    every march/refinement sample is ONE direct gather — no row-map
    lookup chain (two dependent gathers measured ~15 ms per march
    round at 480×640; this halves it). Built with a single row
    scatter of the allocated interiors (~2 KB rows, amortised) into a
    sentinel fill: 3.0 = unallocated block (the DDA skip reads it
    straight from the value), 2.0 = unobserved voxel."""
    gx, gy, gz = grid_blocks
    s1 = block + 1
    mb = vol.max_blocks
    enc = jnp.where(vol.weight > 0, vol.tsdf, _UNOBS)     # (mb, s1³)
    interior = enc.reshape(mb, s1, s1, s1)[:, :block, :block, :block] \
        .reshape(mb, block ** 3)
    # unallocated rows carry _INVALID (int32 max) keys → dropped
    dense = jnp.full((gx * gy * gz, block ** 3), _EMPTY_BLOCK,
                     jnp.float32)
    dense = dense.at[vol.block_keys].set(interior, mode="drop")
    return dense.reshape(-1)


def _bm_index(vol, p, grid_blocks: Tuple[int, int, int], block: int):
    """voxel → (clipped linear block-major index, in-bounds, block id,
    local-free) for nearest-voxel addressing."""
    gx, gy, gz = grid_blocks
    g = (p - vol.origin) / vol.voxel_size - 0.5
    vox = jnp.round(g).astype(jnp.int32)
    b = vox // block
    l = vox - b * block
    inb = jnp.all(vox >= 0, axis=1) \
        & (b[:, 0] < gx) & (b[:, 1] < gy) & (b[:, 2] < gz)
    key = (b[:, 0] * gy + b[:, 1]) * gz + b[:, 2]
    lin = key * (block ** 3) + (l[:, 0] * block + l[:, 1]) * block \
        + l[:, 2]
    return jnp.clip(lin, 0, gx * gy * gz * block ** 3 - 1), inb, b


def _bm_nearest(dense: jnp.ndarray, vol: SparseTsdfVolume,
                p: jnp.ndarray, dirs: jnp.ndarray,
                grid_blocks: Tuple[int, int, int], block: int):
    """Nearest sample from the block-major dense copy: one gather;
    the empty-block sentinel value doubles as the skip trigger."""
    lin, inb, b = _bm_index(vol, p, grid_blocks, block)
    v = jnp.where(inb, dense[lin], _UNOBS)
    obs = v < 1.5
    empty = v > 2.5
    bw = jnp.float32(block) * vol.voxel_size
    lo = jnp.asarray(vol.origin) + b.astype(jnp.float32) * bw
    bound = jnp.where(dirs > 0, lo + bw, lo)
    ax = jnp.where(jnp.abs(dirs) > 1e-12, (bound - p) / dirs, jnp.inf)
    exit_t = jnp.min(jnp.where(jnp.isfinite(ax), ax, jnp.inf), axis=1)
    skip = jnp.where(inb & empty,
                     jnp.maximum(exit_t, 0.0) + 0.25 * vol.voxel_size,
                     0.0)
    return jnp.minimum(v, 1.0), obs, skip


def _bm_trilinear(dense: jnp.ndarray, vol: SparseTsdfVolume,
                  p: jnp.ndarray, grid_blocks: Tuple[int, int, int],
                  block: int):
    """Trilinear sample from the block-major dense copy: 8 direct
    gathers (vs 8 row-map + 8 table gathers on the un-materialised
    path)."""
    gx, gy, gz = grid_blocks
    g = (p - vol.origin) / vol.voxel_size - 0.5
    v0 = jnp.floor(g).astype(jnp.int32)
    f = g - v0.astype(jnp.float32)
    size = gx * gy * gz * block ** 3
    vals, obs = [], []
    for dx, dy, dz in _CORNER_OFFS:
        vc = v0 + jnp.array([dx, dy, dz], jnp.int32)
        b = vc // block
        l = vc - b * block
        inb = jnp.all(vc >= 0, axis=1) \
            & (b[:, 0] < gx) & (b[:, 1] < gy) & (b[:, 2] < gz)
        key = (b[:, 0] * gy + b[:, 1]) * gz + b[:, 2]
        lin = key * (block ** 3) \
            + (l[:, 0] * block + l[:, 1]) * block + l[:, 2]
        v = jnp.where(inb, dense[jnp.clip(lin, 0, size - 1)], _UNOBS)
        vals.append(jnp.minimum(v, 1.0))
        obs.append(v < 1.5)
    vals = jnp.stack(vals, axis=1)
    obs = jnp.stack(obs, axis=1)
    return _trilinear_from_corners(vals, obs, f, vol.voxel_size)


# ---------------------------------------------------------------------------
# the march
# ---------------------------------------------------------------------------

def _march(nearest, trilinear, origin_w, dirs_w, near, far, trunc, voxel,
           max_steps: int, refine: bool = True):
    """Shared ray-march core. ``nearest(p) -> (val, obs, skip)`` (skip =
    extra empty-space jump in t units, 0 if none), ``trilinear(p) ->
    (val, grad, obs)``; both close over the volume. ``near`` may be a
    scalar or a per-ray (R,) start vector (hierarchical seeding).
    ``refine=False`` skips the trilinear refinement entirely (depth =
    nearest-bracket interpolation, no normals) — the seed pass of the
    hierarchy needs only ±margin depths, and the refinement's trilinear
    evals (8 corners × 2 gathers each) are the single largest cost of a
    full raycast."""
    r = dirs_w.shape[0]
    t0 = jnp.broadcast_to(jnp.asarray(near, jnp.float32), (r,))
    state = (t0,                                  # t
             t0,                                  # prev t
             jnp.ones((r,), jnp.float32),         # prev val
             jnp.zeros((r,), bool),               # prev observed
             jnp.zeros((r,), bool),               # hit
             jnp.zeros((r,), jnp.float32),        # t at bracket low
             jnp.zeros((r,), jnp.float32),        # t at bracket high
             jnp.ones((r,), jnp.float32),         # nearest val at lo
             -jnp.ones((r,), jnp.float32),        # nearest val at hi
             jnp.int32(0))

    coarse = jnp.float32(0.75) * trunc
    fine = jnp.maximum(jnp.float32(voxel), jnp.float32(0.1) * trunc)

    def cond(s):
        t, _, _, _, hit, _, _, _, _, step = s
        active = ~hit & (t <= far)
        return (step < max_steps) & jnp.any(active)

    def body(s):
        t, pt, pv, pobs, hit, tlo, thi, vlo, vhi, step = s
        p = origin_w[None] + t[:, None] * dirs_w
        val, obs, skip = nearest(p)
        active = ~hit & (t <= far)
        # a crossing needs both bracketing samples observed — the
        # initial tsdf=1 fill must never read as a surface
        cross = active & pobs & obs & (pv > 0) & (val < 0)
        hit2 = hit | cross
        tlo2 = jnp.where(cross, pt, tlo)
        thi2 = jnp.where(cross, t, thi)
        vlo2 = jnp.where(cross, pv, vlo)
        vhi2 = jnp.where(cross, val, vhi)
        # clamped free-space reading (val≈1 ⇒ surface ≥ 0.97·trunc
        # away, so a 0.75·trunc step can never cross it) → coarse;
        # inside the band → voxel steps, so every crossing is
        # bracketed at FINE width; unallocated block → jump to its
        # DDA exit
        dt = jnp.where(skip > 0, jnp.maximum(skip, fine),
                       jnp.where(val > 0.97, coarse, fine))
        adv = active & ~cross
        t2 = jnp.where(adv, t + dt, t)
        pt2 = jnp.where(adv, t, pt)
        pv2 = jnp.where(active, val, pv)
        pobs2 = jnp.where(active, obs, pobs)
        return (t2, pt2, pv2, pobs2, hit2, tlo2, thi2, vlo2, vhi2,
                step + 1)

    (t, _, pv, pobs, hit, tlo, thi, vlo, vhi,
     _) = jax.lax.while_loop(cond, body, state)

    # phase-independent nearest-bracket zero (vlo>0>vhi by construction)
    t_nn = tlo + vlo / (vlo - vhi) * (thi - tlo)

    if not refine:
        ps = origin_w[None] + t_nn[:, None] * dirs_w
        return t_nn, ps, jnp.zeros_like(ps), hit, hit

    # ---- refinement: bracketed secant on trilinear samples -----------
    # Trilinear evals are the cost driver (8 corners × 2 gathers each
    # on the sparse path) — this refinement spends exactly 2: a
    # bracket CENTERED on the nearest-field zero t_nn (the trilinear
    # zero sits within ~half a fine step of it — the two fields are
    # offset by at most half a voxel — so ±0.75·fine contains it and
    # no side-extension probes are needed). One secant step on the
    # bracket gives the depth; the normal comes from the two evals'
    # gradients interpolated at the secant point (measured identical
    # tracking accuracy to an explicit third mid eval).
    half = jnp.float32(0.75) * fine
    tlo = t_nn - half
    thi = t_nn + half
    flo, glo, _ = trilinear(origin_w[None] + tlo[:, None] * dirs_w)
    fhi, ghi, _ = trilinear(origin_w[None] + thi[:, None] * dirs_w)
    # truly degenerate rays (grazing/border: unobserved-clamped corners
    # pull the interpolant positive throughout) have NO trilinear sign
    # change: the secant would pin to whichever endpoint the march
    # phase produced. Use the nearest-bracket interpolation.
    tri_ok = (flo > 0) & (fhi < 0)
    denom = flo - fhi
    frac = jnp.where(jnp.abs(denom) > 1e-12, flo / denom, 0.5)
    ts1 = tlo + jnp.clip(frac, 0.0, 1.0) * (thi - tlo)
    ps1 = origin_w[None] + ts1[:, None] * dirs_w
    fs, grad, _ = trilinear(ps1)         # grad reused for the normal
    # algebraic second secant round against the bracket end that still
    # brackets (no further eval; |ts2 − ts1| < bracket width · |fs|)
    move_hi = fs > 0
    t_a = jnp.where(move_hi, thi, tlo)
    f_a = jnp.where(move_hi, fhi, flo)
    den2 = fs - f_a
    frac2 = jnp.where(jnp.abs(den2) > 1e-12, fs / den2, 0.0)
    ts2 = ts1 + jnp.clip(frac2, -1.0, 1.0) * (t_a - ts1)
    ts = jnp.where(tri_ok, ts2, t_nn)
    ps = origin_w[None] + ts[:, None] * dirs_w

    # validity comes from the nearest-sample bracket (both ends
    # observed); trilinear corner observability can be stricter at
    # surface borders and would punch pinholes in the maps
    ok = hit
    n = grad / jnp.maximum(jnp.linalg.norm(grad, axis=1, keepdims=True),
                           1e-12)
    return ts, ps, n, ok, hit & tri_ok


def _pixel_dirs(h: int, w: int, intr: jnp.ndarray,
                cam_to_world: jnp.ndarray):
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    d_cam = jnp.stack([(u - cx) / fx, (v - cy) / fy,
                       jnp.ones_like(u)], axis=1)
    r = cam_to_world[:3, :3]
    d_w = jnp.matmul(d_cam, r.T, precision=jax.lax.Precision.HIGHEST)
    return d_w, cam_to_world[:3, 3]


def _as_result(h, w, ts, ps, n, ok, conf, color=None):
    # d_cam has camera-z component exactly 1, so the ray parameter IS
    # camera-z depth — directly comparable to integrate()'s depth input
    depth = jnp.where(ok, ts, 0.0).reshape(h, w)
    return RaycastResult(depth=depth,
                         vertices=ps.reshape(h, w, 3),
                         normals=jnp.where(ok[:, None], n, 0.0
                                           ).reshape(h, w, 3),
                         mask=ok.reshape(h, w),
                         confident=conf.reshape(h, w),
                         color=(None if color is None else
                                jnp.where(ok[:, None], color, 0.0
                                          ).reshape(h, w, 3)))


def _coarse_intr(intr: jnp.ndarray, f: int) -> jnp.ndarray:
    """Intrinsics of the f×-downsampled image: coarse pixel (i, j)
    centers on full-res pixel (f·i + (f−1)/2, ...)."""
    ff = jnp.float32(f)
    half = (ff - 1.0) / 2.0
    return jnp.stack([intr[0] / ff, intr[1] / ff,
                      (intr[2] - half) / ff, (intr[3] - half) / ff])


def _seed_from_coarse(t_c, hit_c, h4: int, w4: int, h: int, w: int,
                      f: int, near: float, far: float,
                      margin) -> jnp.ndarray:
    """Per-full-ray start depths from a coarse-pass depth map.

    KinectFusion-style min-depth pyramid seeding over the 3×3 coarse
    neighborhood:
    - all 9 hit → start at min(depth) − margin (the full-res surface
      cannot be much nearer than every surrounding coarse ray's);
    - mixed hit/miss (silhouette edges) → start at the near plane, a
      miss neighbor carries no bound on where a nearer surface is;
    - ALL 9 miss → the ray is declared a miss (seeded past far): this
      is what makes the pyramid pay — the loop runs until the LAST ray
      finishes and every gather round costs all rays, so miss regions
      marching near→far would otherwise pin the iteration count.
    Thin structures (≲ 2 coarse pixels) that no coarse ray hits are
    lost; disable with coarse_factor=1 for exactness. Image borders
    use the real (≤9) neighbors only."""
    hit2 = hit_c.reshape(h4, w4)
    t2 = t_c.reshape(h4, w4)
    vhit = jnp.where(hit2, t2, jnp.inf)
    # pad: +inf / False-is-irrelevant — pad cells never veto (all-hit
    # pool pads True, any-hit pool pads False, min pool pads +inf)
    vhit = jnp.pad(vhit, 1, constant_values=jnp.inf)
    anyh = jnp.pad(hit2, 1, constant_values=False)
    allh = jnp.pad(hit2, 1, constant_values=True)
    pmin, pany, pall = (vhit[0:h4, 0:w4], anyh[0:h4, 0:w4],
                        allh[0:h4, 0:w4])
    for di in range(3):
        for dj in range(3):
            if di == 0 and dj == 0:
                continue
            pmin = jnp.minimum(pmin, vhit[di:di + h4, dj:dj + w4])
            pany = pany | anyh[di:di + h4, dj:dj + w4]
            pall = pall & allh[di:di + h4, dj:dj + w4]
    seeded = jnp.maximum(pmin - margin, jnp.float32(near))
    dead = jnp.float32(far) + jnp.float32(1.0)
    start = jnp.where(pany,
                      jnp.where(pall, seeded, jnp.float32(near)),
                      dead)
    full = jnp.repeat(jnp.repeat(start, f, axis=0), f, axis=1)[:h, :w]
    return full.reshape(-1)


def _two_level(run_level, intr, h: int, w: int, near, far,
               trunc, coarse_factor: int):
    """Coarse seed pass (1/f² rays) + seeded full pass. ``run_level``
    (intr, h, w, near) -> (ts, ps, n, ok, conf) closes over the volume.

    The march's cost is total fetched samples (gathers through the
    chip are throughput-bound, ~measured: batching K samples per round
    ran 3× SLOWER than one), so the lever is fewer samples: the coarse
    pass pays the empty-space march once per f² rays and full-res rays
    start within ~margin of the surface."""
    if coarse_factor <= 1 or h < 4 * coarse_factor or w < 4 * coarse_factor:
        return run_level(intr, h, w, near, True)
    f = coarse_factor
    h4, w4 = -(-h // f), -(-w // f)
    # seed pass: no refinement — ±margin depth accuracy is enough
    tc, _, _, okc, _ = run_level(_coarse_intr(intr, f), h4, w4, near,
                                 False)
    seed = _seed_from_coarse(tc, okc, h4, w4, h, w, f, near, far,
                             3.0 * trunc)
    return run_level(intr, h, w, seed, True)


@functools.partial(jax.jit, static_argnames=("height", "width",
                                             "max_steps",
                                             "coarse_factor"))
def raycast(vol: TsdfVolume, intr: jnp.ndarray, cam_to_world: jnp.ndarray,
            height: int, width: int, near: float = 0.1,
            far: float = 10.0, max_steps: int = 96,
            coarse_factor: int = 4) -> RaycastResult:
    """Raycast a dense TSDF volume into depth/vertex/normal maps.

    ``intr`` = [fx, fy, cx, cy]; ``cam_to_world`` (4, 4). Rays are cast
    per pixel; ``depth`` is camera-z depth (comparable to the depth
    images ``integrate`` consumes). Normals point along the TSDF
    gradient — out of the surface, toward the observed free space.
    ``coarse_factor`` > 1 runs a 1/f² seed pass first (see _two_level);
    set 1 to march every ray from the near plane.
    """
    enc = _encode_observed(vol.tsdf, vol.weight)

    def run_level(lintr, lh, lw, lnear, lrefine):
        d_w, o_w = _pixel_dirs(lh, lw, lintr, cam_to_world)
        nearest = lambda p: _dense_nearest(enc, vol, p) + (
            jnp.zeros((p.shape[0],), jnp.float32),)
        trilinear = lambda p: _dense_trilinear(enc, vol, p)
        return _march(nearest, trilinear, o_w, d_w, lnear, far,
                      vol.truncation, vol.voxel_size, max_steps,
                      refine=lrefine)

    ts, ps, n, ok, conf = _two_level(run_level, intr, height, width,
                                     near, far, vol.truncation,
                                     coarse_factor)
    col = None if vol.color is None else _dense_color(vol, ps)
    return _as_result(height, width, ts, ps, n, ok, conf, col)


@functools.partial(jax.jit, static_argnames=("grid_blocks", "block",
                                             "height", "width",
                                             "max_steps",
                                             "coarse_factor",
                                             "materialize"))
def sparse_raycast(vol: SparseTsdfVolume, intr: jnp.ndarray,
                   cam_to_world: jnp.ndarray, height: int, width: int,
                   grid_blocks: Tuple[int, int, int], block: int = 8,
                   near: float = 0.1, far: float = 10.0,
                   max_steps: int = 96,
                   coarse_factor: int = 4,
                   materialize: Optional[bool] = None) -> RaycastResult:
    """Raycast the block-sparse TSDF (same maps as ``raycast``).

    By default (``materialize=None`` → auto by a 768 MB budget, i.e.
    up to a 512³ virtual grid) the sparse table is first materialised
    as a block-major dense copy (one row scatter) so every march step
    and refinement corner costs ONE direct gather instead of a
    dependent row-map + table pair — march rounds measured ~2×
    cheaper. An unallocated block reads the 3.0 sentinel and is
    crossed in a single DDA jump to its exit, exactly as on the
    un-materialised path (``materialize=False``, used automatically
    for virtual grids beyond the budget). ``coarse_factor`` as in
    ``raycast``.
    """
    gx, gy, gz = grid_blocks
    if materialize is None:
        materialize = (gx * gy * gz * block ** 3 * 4
                       <= _MATERIALIZE_BUDGET_BYTES)

    if materialize:
        dense = _block_major_dense(vol, grid_blocks, block)

        def run_level(lintr, lh, lw, lnear, lrefine):
            d_w, o_w = _pixel_dirs(lh, lw, lintr, cam_to_world)
            nearest = lambda p: _bm_nearest(dense, vol, p, d_w,
                                            grid_blocks, block)
            trilinear = lambda p: _bm_trilinear(dense, vol, p,
                                                grid_blocks, block)
            return _march(nearest, trilinear, o_w, d_w, lnear, far,
                          vol.truncation, vol.voxel_size, max_steps,
                          refine=lrefine)
    else:
        row_map = _block_row_map(vol, grid_blocks)
        enc = _encode_observed(vol.tsdf, vol.weight)

        def run_level(lintr, lh, lw, lnear, lrefine):
            d_w, o_w = _pixel_dirs(lh, lw, lintr, cam_to_world)
            nearest = lambda p: _sparse_nearest(enc, vol, row_map, p,
                                                d_w, grid_blocks, block)
            trilinear = lambda p: _sparse_trilinear(enc, vol, row_map,
                                                    p, grid_blocks,
                                                    block)
            return _march(nearest, trilinear, o_w, d_w, lnear, far,
                          vol.truncation, vol.voxel_size, max_steps,
                          refine=lrefine)

    ts, ps, n, ok, conf = _two_level(run_level, intr, height, width,
                                     near, far, vol.truncation,
                                     coarse_factor)
    col = None
    if vol.color is not None:
        row_map_c = _block_row_map(vol, grid_blocks)
        col = _sparse_color(vol, row_map_c, ps, grid_blocks, block)
    return _as_result(height, width, ts, ps, n, ok, conf, col)


def shade(res: RaycastResult, light_dir=(0.4, -0.3, 0.85),
          ambient: float = 0.15,
          background: float = 0.0) -> jnp.ndarray:
    """Lambertian shading of a raycast result → (H, W) grayscale in
    [0, 1] (light direction in world space, pointing FROM the light).

    The default is a headlight slightly off the camera axis: the
    canonical camera looks along +z, so visible surface normals face
    −z and a light propagating toward +z illuminates them (the old
    −z default lit the scene from BEHIND — everything came out at the
    ambient floor)."""
    l = jnp.asarray(light_dir, jnp.float32)
    l = -l / jnp.maximum(jnp.linalg.norm(l), 1e-12)
    lam = jnp.clip(jnp.einsum("hwc,c->hw", res.normals, l), 0.0, 1.0)
    img = ambient + (1.0 - ambient) * lam
    return jnp.where(res.mask, img, background)


def shade_rgb(res: RaycastResult, light_dir=(0.4, -0.3, 0.85),
              ambient: float = 0.15,
              background=(0.0, 0.0, 0.0)) -> jnp.ndarray:
    """Lambertian-lit color render → (H, W, 3) in [0, 1]. Uses the
    result's sampled color channel when present (volume integrated
    with ``with_color=True``), else shades white."""
    lit = shade(res, light_dir, ambient, background=0.0)
    base = jnp.ones(res.mask.shape + (3,), jnp.float32) \
        if res.color is None else res.color
    img = lit[..., None] * base
    bg = jnp.broadcast_to(jnp.asarray(background, jnp.float32),
                          img.shape)
    return jnp.where(res.mask[..., None], img, bg)
