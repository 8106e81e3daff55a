"""Isosurface extraction from dense scalar grids (marching tetrahedra).

Covers threecrate-reconstruction/src/marching_cubes.rs: the dense
``VolumetricGrid`` scalar field with ``from_point_cloud`` distance
fields (marching_cubes.rs:12-80), isosurface extraction, and the
``create_sphere_volume``/``create_cube_volume`` test fixtures
(marching_cubes.rs:867,914).

Design: the reference uses classic marching cubes with the 256-entry
edge/triangle lookup tables (marching_cubes.rs:174,199). This rebuild
offers three extractors, all fixed-shape batched computations:

- ``extract_soup`` — **marching tetrahedra** (each cube → 6 tets,
  16-case table derived from first principles below; no ambiguous
  cases, ~2× MC's triangle count).
- ``extract_soup_cubes`` — true 256-case marching cubes over tables
  DERIVED by edge-loop tracing (mc_tables.py), every intermediate 1-D
  or (small, C) shaped for TPU-friendly layouts.
- ``extract_soup_cubes_banded`` / ``_auto`` — band-compacted MC: one
  reduce_window min/max pass flags iso-crossing blocks, one sort
  compacts them, and the per-window extractor runs vmapped over only
  those (~5% of blocks for a typical surface). Bit-identical output
  to the dense sweep (global integer index offsets, no origin
  re-rounding); the auto wrapper sizes the block cap from a cheap
  counting pass and falls back to dense on dense-crossing fields.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.errors import InvalidDataError
from ..core.mesh import TriangleMesh
from ..core.point_cloud import PointCloud

# ---------------------------------------------------------------------------
# marching tetrahedra tables (derived, not copied)
#
# Tet corners are indexed 0..3; the 6 tet edges are the corner pairs:
_TET_EDGES = np.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
                      np.int32)
# Case index = bitmask of corners with value >= iso ("inside").
# For each of the 16 cases we list up to 2 triangles as triples of edge
# ids (-1 padding). Orientation: triangle normals point toward the
# "outside" (< iso) side, fixed per case by construction:
#  - 1 inside corner c: the cut triangle uses the 3 edges at c.
#  - 2 inside corners: quad on the 4 edges separating {a,b} from rest.
#  - 3 inside corners: complement of the 1-corner case, flipped.
_MT_TRIS = -np.ones((16, 2, 3), np.int32)


def _edge_id(a, b):
    for i, (x, y) in enumerate(_TET_EDGES):
        if (a, b) == (x, y) or (b, a) == (x, y):
            return i
    raise AssertionError


def _build_mt_table():
    for case in range(1, 15):
        inside = [c for c in range(4) if case & (1 << c)]
        outside = [c for c in range(4) if c not in inside]
        if len(inside) == 1:
            c = inside[0]
            e = [_edge_id(c, o) for o in outside]
            # orientation: corners of a tet (0,1,2,3); choose winding so
            # the normal points away from the inside corner (validated
            # by the sphere-volume test below)
            _MT_TRIS[case, 0] = (e[0], e[1], e[2])
        elif len(inside) == 3:
            c = outside[0]
            e = [_edge_id(c, i) for i in inside]
            _MT_TRIS[case, 0] = (e[0], e[2], e[1])   # flipped vs 1-corner
        else:  # two inside: quad split into two triangles
            a, b = inside
            o0, o1 = outside
            e_ao0 = _edge_id(a, o0)
            e_ao1 = _edge_id(a, o1)
            e_bo0 = _edge_id(b, o0)
            e_bo1 = _edge_id(b, o1)
            _MT_TRIS[case, 0] = (e_ao0, e_ao1, e_bo1)
            _MT_TRIS[case, 1] = (e_ao0, e_bo1, e_bo0)


_build_mt_table()

# 6-tetrahedra decomposition of the unit cube. Cube corners indexed by
# (dx, dy, dz) bits: corner = dx + 2·dy + 4·dz. All 6 tets share the
# main diagonal (0, 7).
_CUBE_TETS = np.array([
    (0, 1, 3, 7), (0, 3, 2, 7), (0, 2, 6, 7),
    (0, 6, 4, 7), (0, 4, 5, 7), (0, 5, 1, 7),
], np.int32)
_CORNER_OFFSET = np.array([[d & 1, (d >> 1) & 1, (d >> 2) & 1]
                           for d in range(8)], np.int32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class VolumetricGrid:
    """Dense scalar field (marching_cubes.rs:12-80)."""

    values: jnp.ndarray    # (nx, ny, nz)
    origin: jnp.ndarray    # (3,)
    spacing: jnp.ndarray   # scalar

    def tree_flatten(self):
        return (self.values, self.origin, self.spacing), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def resolution(self):
        return self.values.shape

    @classmethod
    def from_function(cls, fn, resolution, origin, spacing):
        nx, ny, nz = resolution
        ix = jax.lax.broadcasted_iota(jnp.float32, (nx, ny, nz), 0)
        iy = jax.lax.broadcasted_iota(jnp.float32, (nx, ny, nz), 1)
        iz = jax.lax.broadcasted_iota(jnp.float32, (nx, ny, nz), 2)
        pts = jnp.asarray(origin, jnp.float32) + \
            jnp.stack([ix, iy, iz], -1) * jnp.float32(spacing)
        return cls(fn(pts), jnp.asarray(origin, jnp.float32),
                   jnp.float32(spacing))

    @classmethod
    def from_point_cloud(cls, cloud: PointCloud, resolution=(64, 64, 64),
                         padding_frac: float = 0.05) -> "VolumetricGrid":
        """Unsigned nearest-point distance field over the cloud's bbox
        (marching_cubes.rs from_point_cloud). Extract at iso ≈ spacing
        to mesh a shell around the points."""
        from ..ops import neighbors
        mn, mx = cloud.bounding_box()
        ext = mx - mn
        pad = jnp.max(ext) * padding_frac
        origin = mn - pad
        span = jnp.max(ext) + 2 * pad
        nx, ny, nz = resolution
        spacing = span / (max(resolution) - 1)
        ix = jax.lax.broadcasted_iota(jnp.float32, (nx, ny, nz), 0)
        iy = jax.lax.broadcasted_iota(jnp.float32, (nx, ny, nz), 1)
        iz = jax.lax.broadcasted_iota(jnp.float32, (nx, ny, nz), 2)
        pts = origin + jnp.stack([ix, iy, iz], -1) * spacing
        res = neighbors.knn(cloud.points, cloud.mask, pts.reshape(-1, 3),
                            None, 1, query_chunk=16384)
        d = res.distances[:, 0].reshape(nx, ny, nz)
        return cls(d, origin, spacing)


def create_sphere_volume(resolution: int = 32, radius: float = 1.0,
                         center=(0.0, 0.0, 0.0)) -> VolumetricGrid:
    """Signed sphere SDF fixture (marching_cubes.rs:867)."""
    span = 2.0 * radius * 1.4
    origin = np.asarray(center, np.float32) - span / 2
    spacing = span / (resolution - 1)
    c = jnp.asarray(center, jnp.float32)

    def fn(p):
        return jnp.linalg.norm(p - c, axis=-1) - radius
    return VolumetricGrid.from_function(
        fn, (resolution,) * 3, origin, spacing)


def create_cube_volume(resolution: int = 32, half: float = 1.0,
                       center=(0.0, 0.0, 0.0)) -> VolumetricGrid:
    """Signed axis-aligned cube SDF fixture (marching_cubes.rs:914)."""
    span = 2.0 * half * 1.5
    origin = np.asarray(center, np.float32) - span / 2
    spacing = span / (resolution - 1)
    c = jnp.asarray(center, jnp.float32)

    def fn(p):
        q = jnp.abs(p - c) - half
        return jnp.max(q, axis=-1)
    return VolumetricGrid.from_function(
        fn, (resolution,) * 3, origin, spacing)


class TriangleSoup(NamedTuple):
    vertices: jnp.ndarray  # (T*3, 3) corner rows [t0v0, t0v1, t0v2, ...]
    mask: jnp.ndarray      # (T,)
    # The flat (T*3, 3) vertex layout is deliberate: a (T, 3, 3) device
    # output lets XLA pick a descending layout whose (3, 3) minor dims
    # tile-pad to (4, 128) — 57x physical inflation, 21 GB at a 128^3
    # grid. (N, 3) arrays get the transposed layout and stay compact.


@functools.partial(jax.jit, static_argnames=())
def extract_soup(grid: VolumetricGrid, iso_level=0.0) -> TriangleSoup:
    """All-tet batched isosurface extraction → masked triangle soup."""
    v = grid.values
    nx, ny, nz = v.shape
    cube_vals = jnp.stack([
        v[o[0]:o[0] + nx - 1, o[1]:o[1] + ny - 1, o[2]:o[2] + nz - 1]
        for o in _CORNER_OFFSET], axis=-1)            # (cx, cy, cz, 8)
    cx, cy, cz = nx - 1, ny - 1, nz - 1
    cube_vals = cube_vals.reshape(-1, 8)

    ix = jax.lax.broadcasted_iota(jnp.float32, (cx, cy, cz), 0)
    iy = jax.lax.broadcasted_iota(jnp.float32, (cx, cy, cz), 1)
    iz = jax.lax.broadcasted_iota(jnp.float32, (cx, cy, cz), 2)
    base = jnp.stack([ix, iy, iz], -1).reshape(-1, 3)  # cube corner 0 coords

    offs = jnp.asarray(_CORNER_OFFSET, jnp.float32)    # (8, 3)
    tets = jnp.asarray(_CUBE_TETS)                     # (6, 4)
    edges = jnp.asarray(_TET_EDGES)                    # (6, 2)
    table = jnp.asarray(_MT_TRIS)                      # (16, 2, 3)

    tet_vals = cube_vals[:, tets]                      # (C, 6, 4)
    tet_pos = base[:, None, None, :] + offs[tets]      # (C, 6, 4, 3)

    inside = tet_vals >= iso_level
    case = (inside[..., 0] * 1 + inside[..., 1] * 2
            + inside[..., 2] * 4 + inside[..., 3] * 8)  # (C, 6)

    # interpolated crossing point on each of the 6 tet edges
    va = jnp.take_along_axis(tet_vals, edges[None, None, :, 0], axis=-1)
    vb = jnp.take_along_axis(tet_vals, edges[None, None, :, 1], axis=-1)
    pa = tet_pos[:, :, edges[:, 0], :]
    pb = tet_pos[:, :, edges[:, 1], :]
    denom = jnp.where(jnp.abs(vb - va) > 1e-12, vb - va, 1.0)
    t = jnp.clip((iso_level - va) / denom, 0.0, 1.0)
    epts = pa + t[..., None] * (pb - pa)               # (C, 6tet, 6edge, 3)

    tris_e = table[case]                               # (C, 6, 2, 3) edge ids
    valid = tris_e[..., 0] >= 0                        # (C, 6, 2)
    safe = jnp.maximum(tris_e, 0)
    c_dim = epts.shape[0]
    # gather triangle corner positions from the 6 per-tet edge points:
    # tri_pts[c,t,k,j] = epts[c,t, safe[c,t,k,j]]. FLATTENED 2-D
    # indices: a >2-D gather here materialises index arrays with
    # degenerate trailing dims whose TPU tiled layout pads every size-1
    # or size-3 minor axis to the full (sublane, lane) tile — measured
    # 20.9 GB for the cubes path at a 128^3 grid (HBM is 16)
    ef = epts.reshape(c_dim, 6 * 6 * 3)                # (C, 108)
    flat = (jnp.arange(6, dtype=jnp.int32)[None, :, None, None] * 18
            + safe * 3)                                # (C, 6, 2, 3)
    idxf = (flat[..., None] + jnp.arange(3, dtype=jnp.int32)
            ).reshape(c_dim, 6 * 2 * 3 * 3)            # (C, 108)
    tri_pts = jnp.take_along_axis(ef, idxf, axis=1
                                  ).reshape(c_dim, 6, 2, 3, 3)

    # consistent winding, parity-free: orient every triangle so its
    # normal points from the inside (≥ iso) corners toward the outside
    # corners — i.e. along the local field gradient direction
    w_in = inside.astype(jnp.float32)                  # (C, 6, 4)
    n_in = jnp.maximum(jnp.sum(w_in, -1), 1.0)[..., None]
    n_out = jnp.maximum(jnp.sum(1 - w_in, -1), 1.0)[..., None]
    cent_in = jnp.sum(tet_pos * w_in[..., None], 2) / n_in
    cent_out = jnp.sum(tet_pos * (1 - w_in)[..., None], 2) / n_out
    # normals face the increasing-field side (SDF-outward): for a signed
    # distance field, v ≥ iso is the exterior, so triangles wind with
    # their normal toward the "inside-bitmask" centroid
    grad_dir = cent_in - cent_out                      # (C, 6, 3)
    nrm = jnp.cross(tri_pts[..., 1, :] - tri_pts[..., 0, :],
                    tri_pts[..., 2, :] - tri_pts[..., 0, :])  # (C, 6, 2, 3)
    flip = jnp.sum(nrm * grad_dir[:, :, None, :], -1) < 0     # (C, 6, 2)
    swapped = tri_pts[..., jnp.array([0, 2, 1]), :]
    tri_pts = jnp.where(flip[..., None, None], swapped, tri_pts)

    soup = tri_pts.reshape(-1, 3)
    mask = valid.reshape(-1)
    world = grid.origin + soup * grid.spacing
    return TriangleSoup(world, mask)


@functools.partial(jax.jit, static_argnames=())
def extract_soup_cubes(grid: VolumetricGrid, iso_level=0.0,
                       index_offset=None) -> TriangleSoup:
    """True 256-case marching cubes using the algorithmically derived
    tables (mc_tables.py): ≤5 triangles per cube, ~2x fewer triangles
    than the tetrahedra path; same gradient-based winding rule.

    TPU-shaped: every intermediate is 1-D (C,) or (small, C) — wide
    minor dims keep the tiled HBM layout compact (the previous
    (C, 5, 3, 3)-shaped formulation let XLA pick a descending layout
    whose (3, 3)/(3, 1) minor dims tile-padded to 21 GB at 128^3), and
    the per-triangle edge-point gather is a 12-way one-hot select over
    the (12, C) edge-point rows instead of a 250M-element random
    gather (~6 ms of VPU selects at 256^3).
    """
    from . import mc_tables

    v = grid.values
    nx, ny, nz = v.shape
    cx, cy, cz = nx - 1, ny - 1, nz - 1
    c_dim = cx * cy * cz
    cv = [v[o[0]:o[0] + cx, o[1]:o[1] + cy, o[2]:o[2] + cz].reshape(-1)
          for o in _CORNER_OFFSET]                          # 8 x (C,)
    inside = [c >= iso_level for c in cv]
    case = sum(ins.astype(jnp.int32) << i
               for i, ins in enumerate(inside))             # (C,)

    bx = jax.lax.broadcasted_iota(jnp.float32, (cx, cy, cz), 0).reshape(-1)
    by = jax.lax.broadcasted_iota(jnp.float32, (cx, cy, cz), 1).reshape(-1)
    bz = jax.lax.broadcasted_iota(jnp.float32, (cx, cy, cz), 2).reshape(-1)
    if index_offset is not None:
        # banded extraction passes the window's global cube base so
        # every index coordinate (and thus every emitted vertex) is
        # BIT-IDENTICAL to the dense sweep's (int-valued f32 adds are
        # exact below 2^24)
        off = jnp.asarray(index_offset, jnp.float32)
        bx = bx + off[0]
        by = by + off[1]
        bz = bz + off[2]

    # interpolated point on each of the 12 cube edges → (12, C) rows
    offs = _CORNER_OFFSET
    ex_rows, ey_rows, ez_rows = [], [], []
    for (a, b) in mc_tables.EDGE_CORNERS:
        va, vb = cv[a], cv[b]
        denom = jnp.where(jnp.abs(vb - va) > 1e-12, vb - va, 1.0)
        t = jnp.clip((iso_level - va) / denom, 0.0, 1.0)
        ex_rows.append(bx + offs[a][0] + t * (offs[b][0] - offs[a][0]))
        ey_rows.append(by + offs[a][1] + t * (offs[b][1] - offs[a][1]))
        ez_rows.append(bz + offs[a][2] + t * (offs[b][2] - offs[a][2]))
    exm = jnp.stack(ex_rows, 0)                             # (12, C)
    eym = jnp.stack(ey_rows, 0)
    ezm = jnp.stack(ez_rows, 0)

    # per-slot-vertex edge ids from the triangle table: TWO (C,)
    # gathers of the 4-bit-packed words (each element gather costs
    # ~200 ms at 256^3; the original 15 separate id gathers were the
    # whole MC runtime) + cheap VPU shift/mask unpacks
    packed = jnp.asarray(mc_tables.TRI_PACKED)               # (256, 2)
    w0 = packed[:, 0][case]                                  # (C,)
    w1 = packed[:, 1][case]
    ids = []
    for j in range(15):
        word = w0 if j < 8 else w1
        ids.append(jax.lax.shift_right_logical(
            word, jnp.int32((j % 8) * 4)) & 15)
    idm = jnp.stack(ids, 0)                                  # (15, C)
    slot_valid = idm != 15                                   # (15, C)
    safe = jnp.where(slot_valid, idm, 0)

    # 12-way one-hot select of the vertex coordinates: (15, C) each
    tx = jnp.zeros((15, c_dim), jnp.float32)
    ty = jnp.zeros((15, c_dim), jnp.float32)
    tz = jnp.zeros((15, c_dim), jnp.float32)
    for e in range(12):
        m = safe == e
        tx = jnp.where(m, exm[e][None, :], tx)
        ty = jnp.where(m, eym[e][None, :], ty)
        tz = jnp.where(m, ezm[e][None, :], tz)

    # winding: normals toward the inside-corner centroid (SDF-outward)
    w_in = [i.astype(jnp.float32) for i in inside]
    s_in = sum(w_in)
    n_in = jnp.maximum(s_in, 1.0)
    n_out = jnp.maximum(8.0 - s_in, 1.0)
    gx = jnp.zeros_like(bx)
    gy = jnp.zeros_like(by)
    gz = jnp.zeros_like(bz)
    for ci, (ox, oy, oz) in enumerate(offs):
        # centroid difference accumulates with weight (w/n_in −
        # (1−w)/n_out) per corner
        wdiff = w_in[ci] / n_in - (1.0 - w_in[ci]) / n_out
        gx = gx + (bx + ox) * wdiff
        gy = gy + (by + oy) * wdiff
        gz = gz + (bz + oz) * wdiff

    # per-slot flip: cross((v1−v0), (v2−v0)) · grad < 0 ⇒ swap v1/v2
    out_x, out_y, out_z = [], [], []
    for sl in range(5):
        x0, x1, x2 = tx[3 * sl], tx[3 * sl + 1], tx[3 * sl + 2]
        y0, y1, y2 = ty[3 * sl], ty[3 * sl + 1], ty[3 * sl + 2]
        z0, z1, z2 = tz[3 * sl], tz[3 * sl + 1], tz[3 * sl + 2]
        ax, ay, az = x1 - x0, y1 - y0, z1 - z0
        bx2, by2, bz2 = x2 - x0, y2 - y0, z2 - z0
        nxx = ay * bz2 - az * by2
        nyy = az * bx2 - ax * bz2
        nzz = ax * by2 - ay * bx2
        flip = nxx * gx + nyy * gy + nzz * gz < 0
        v1x = jnp.where(flip, x2, x1)
        v2x = jnp.where(flip, x1, x2)
        v1y = jnp.where(flip, y2, y1)
        v2y = jnp.where(flip, y1, y2)
        v1z = jnp.where(flip, z2, z1)
        v2z = jnp.where(flip, z1, z2)
        out_x += [x0, v1x, v2x]
        out_y += [y0, v1y, v2y]
        out_z += [z0, v1z, v2z]

    # assemble (T*3, 3): rows [t0v0, t0v1, t0v2, t1v0, ...] per cube —
    # transpose (15, C) → (C, 15) → flatten; all final shapes are the
    # layout-friendly (N, 3) / (N,) forms
    xs = jnp.stack(out_x, 0).T.reshape(-1)                  # (C*15,)
    ys = jnp.stack(out_y, 0).T.reshape(-1)
    zs = jnp.stack(out_z, 0).T.reshape(-1)
    world = grid.origin + jnp.stack([xs, ys, zs], 1) * grid.spacing
    # a slot is live iff its table ids are present (sentinel-free)
    valid = slot_valid[0::3].T.reshape(-1)                  # (C*5,)
    return TriangleSoup(world, valid)


@functools.partial(jax.jit, static_argnames=("block",))
def _block_active_count(values: jnp.ndarray, iso_level,
                        block: int = 8) -> jnp.ndarray:
    """Number of ``block``³-cube blocks whose (B+1)³ value window
    crosses ``iso_level`` (the cheap sizing pass for the banded
    extractor — one reduce_window min/max over the grid)."""
    vp, _ = _pad_to_blocks(values, block)
    mn, mx = _window_minmax(vp, block)
    return jnp.sum((mn < iso_level) & (mx >= iso_level)
                   ).astype(jnp.int32)


def _pad_to_blocks(values: jnp.ndarray, block: int):
    """Edge-pad so the cube grid (dims−1) is a multiple of ``block``.
    Edge replication makes padded cubes zero-extent in the padded
    axis (equal corner values ⇒ case 0/255 ⇒ no triangles), so
    padding never emits and never changes real cubes."""
    nx, ny, nz = values.shape
    nbx = -(-(nx - 1) // block)
    nby = -(-(ny - 1) // block)
    nbz = -(-(nz - 1) // block)
    px = nbx * block + 1 - nx
    py = nby * block + 1 - ny
    pz = nbz * block + 1 - nz
    vp = jnp.pad(values, ((0, px), (0, py), (0, pz)), mode="edge")
    return vp, (nbx, nby, nbz)


def _window_minmax(vp: jnp.ndarray, block: int):
    win = (block + 1,) * 3
    strides = (block,) * 3
    mn = jax.lax.reduce_window(vp, jnp.float32(jnp.inf), jax.lax.min,
                               win, strides, "VALID")
    mx = jax.lax.reduce_window(vp, jnp.float32(-jnp.inf), jax.lax.max,
                               win, strides, "VALID")
    return mn, mx


@functools.partial(jax.jit, static_argnames=("block", "max_blocks"))
def extract_soup_cubes_banded(grid: VolumetricGrid, iso_level=0.0,
                              block: int = 8,
                              max_blocks: int = 4096) -> TriangleSoup:
    """Band-compacted marching cubes: only blocks whose value window
    crosses the iso level are extracted (the sparse-TSDF compaction
    idea applied to a DENSE grid — at 256³ a surface touches ~5% of
    blocks, and the dense sweep's 16.7M-cube edge interpolation +
    table selects are ~95% wasted work).

    Three fixed-shape stages: (1) per-block window min/max via one
    ``reduce_window`` pair flags crossing blocks; (2) one (flag, key)
    sort compacts active block ids to the front, capped at the static
    ``max_blocks``; (3) the windows gather via vmapped dynamic_slice
    and the standard per-window extractor (extract_soup_cubes) runs
    vmapped over them. EXACT parity with the dense extractor when the
    active count fits the cap — use :func:`extract_soup_cubes_auto`
    to size the cap (or fall back) from the cheap counting pass.
    """
    v = grid.values
    s1 = block + 1
    vp, (nbx, nby, nbz) = _pad_to_blocks(v, block)
    mn, mx = _window_minmax(vp, block)
    active = ((mn < iso_level) & (mx >= iso_level)).reshape(-1)
    nb = nbx * nby * nbz

    key = jnp.arange(nb, dtype=jnp.int32)
    _, order = jax.lax.sort(
        (jnp.where(active, jnp.int32(0), jnp.int32(1)), key),
        num_keys=1)
    cap = min(max_blocks, nb)
    sel = order[:cap]                                  # block ids
    live = active[sel]
    bz = sel % nbz
    by = (sel // nbz) % nby
    bx = sel // (nby * nbz)
    corners = jnp.stack([bx, by, bz], 1) * block       # (cap, 3) i32

    windows = jax.vmap(
        lambda c: jax.lax.dynamic_slice(vp, (c[0], c[1], c[2]),
                                        (s1, s1, s1)))(corners)

    # real cube range: padded windows contain fake cubes past dims−1
    # whose y/z variation can still emit — mask them exactly
    nx, ny, nz = v.shape
    lx = jax.lax.broadcasted_iota(jnp.int32, (block,) * 3, 0).reshape(-1)
    ly = jax.lax.broadcasted_iota(jnp.int32, (block,) * 3, 1).reshape(-1)
    lz = jax.lax.broadcasted_iota(jnp.int32, (block,) * 3, 2).reshape(-1)

    def one(win, corner):
        # global origin + integer index offset => emitted vertices are
        # bit-identical to the dense sweep (no origin re-rounding)
        g = VolumetricGrid(win, grid.origin, grid.spacing)
        soup = extract_soup_cubes(g, iso_level, index_offset=corner)
        okc = ((corner[0] + lx < nx - 1) & (corner[1] + ly < ny - 1)
               & (corner[2] + lz < nz - 1))              # (B³,)
        m = soup.mask.reshape(-1, 5) & okc[:, None]
        return soup.vertices, m.reshape(-1)

    verts, masks = jax.vmap(one)(windows, corners)
    return TriangleSoup(verts.reshape(-1, 3),
                        (masks & live[:, None]).reshape(-1))


def extract_soup_cubes_auto(grid: VolumetricGrid, iso_level=0.0,
                            block: int = 8,
                            dense_fraction: float = 0.5) -> TriangleSoup:
    """Banded extraction with host-side capacity sizing: one cheap
    counting dispatch picks the power-of-two block cap (bounded
    recompiles), and fields denser than ``dense_fraction`` of all
    blocks fall back to the plain dense sweep (exact same output
    either way)."""
    n_act = int(_block_active_count(grid.values, jnp.float32(iso_level),
                                    block=block))
    nx, ny, nz = grid.values.shape
    nb = (-(-(nx - 1) // block)) * (-(-(ny - 1) // block)) \
        * (-(-(nz - 1) // block))
    if n_act > dense_fraction * nb:
        return extract_soup_cubes(grid, jnp.float32(iso_level))
    cap = 256
    while cap < n_act:
        cap *= 2
    return extract_soup_cubes_banded(grid, jnp.float32(iso_level),
                                     block=block,
                                     max_blocks=min(cap, nb))


@functools.partial(jax.jit, static_argnames=("weld_decimals",))
def _weld_device(vertices: jnp.ndarray, mask: jnp.ndarray,
                 weld_decimals: int = 5):
    """Device weld: quantized-key grouping entirely via sorts.

    Same semantics as the NumPy host weld (vertex positions = the
    ROUNDED coordinates, np.unique ordering differences aside): keys
    are round(v·10^d) as i32 (valid for |coord| < ~2·10⁴ at d=5 — the
    auto dispatcher falls back to host beyond that), grouped by one
    4-key sort; the inverse map returns through a second payload sort
    keyed on the original slot (payload sorts beat (N,)-scale scatters
    ~10x on TPU, see CLAUDE.md). Unique vertices and valid faces are
    compacted to the FRONT so the caller transfers only the used
    prefix — at a 500k-face Poisson mesh this replaces a ~95 MB padded
    soup pull through the tunnel with ~9 MB of compact arrays.

    Returns (uniq_xyz (3F,3) f32, n_unique, faces (F,3) i32, n_faces).
    """
    t3 = vertices.shape[0]
    scalef = jnp.float32(10.0 ** weld_decimals)
    k = jnp.round(vertices * scalef).astype(jnp.int32)        # (3F, 3)
    valid = jnp.repeat(mask, 3)
    maj = jnp.where(valid, jnp.int32(0), jnp.int32(1))
    slot = jnp.arange(t3, dtype=jnp.int32)
    maj_s, kx, ky, kz, slot_s = jax.lax.sort(
        (maj, k[:, 0], k[:, 1], k[:, 2], slot), num_keys=4)
    first = jnp.concatenate([
        jnp.ones((1,), bool),
        (kx[1:] != kx[:-1]) | (ky[1:] != ky[:-1]) | (kz[1:] != kz[:-1])
        | (maj_s[1:] != maj_s[:-1])])
    gid = (jnp.cumsum(first.astype(jnp.int32)) - 1).astype(jnp.int32)
    # inverse map back to original row order (payload sort, no scatter)
    _, inv = jax.lax.sort((slot_s, gid), num_keys=1)
    faces = inv.reshape(-1, 3)
    fok = mask & (faces[:, 0] != faces[:, 1]) \
        & (faces[:, 1] != faces[:, 2]) & (faces[:, 0] != faces[:, 2])
    n_unique = jnp.sum(first & (maj_s == 0)).astype(jnp.int32)
    # unique vertex table: group heads to the front, in gid order
    # (stable sort on the head flag preserves gid order exactly, so
    # row g of the compacted table IS group g's rounded coordinates)
    headkey = jnp.where(first & (maj_s == 0), jnp.int32(0), jnp.int32(1))
    _, ux, uy, uz = jax.lax.sort(
        (headkey, kx.astype(jnp.float32) / scalef,
         ky.astype(jnp.float32) / scalef,
         kz.astype(jnp.float32) / scalef), num_keys=1)
    uniq = jnp.stack([ux, uy, uz], axis=1)
    # valid faces to the front (stable: keeps face order)
    fkey = jnp.where(fok, jnp.int32(0), jnp.int32(1))
    _, f0, f1, f2 = jax.lax.sort(
        (fkey, faces[:, 0], faces[:, 1], faces[:, 2]), num_keys=1)
    n_faces = jnp.sum(fok).astype(jnp.int32)
    return uniq, n_unique, jnp.stack([f0, f1, f2], axis=1), n_faces


def soup_to_mesh(soup: TriangleSoup, weld_decimals: int = 5,
                 method: str = "auto") -> TriangleMesh:
    """Weld a triangle soup into an indexed mesh.

    ``method``: "host" = NumPy np.unique weld (transfers the full
    padded soup); "device" = sort-based weld on device, transferring
    only the compact result (the big win through a tunneled TPU);
    "auto" = backend-aware: on an accelerator, device weld from 750k
    rows (Poisson depth ≥ 6 / banded MC at ≥ 128³ land there — the
    padded-soup pull through the tunnel is the dominant e2e cost); on
    the CPU backend only from 6M rows (transfer is free there, and the
    lower bar would put every depth-6 test mesh on the weld program's
    compile cost). Both bars also require the coordinates to fit the
    i32 key range.
    """
    if method not in ("auto", "host", "device"):
        raise ValueError(f"unknown weld method {method!r}")
    use_device = method == "device"
    _bar = (750_000 if jax.default_backend() != "cpu" else 6_000_000)
    if method == "auto" and soup.vertices.shape[0] >= _bar:
        # key range check: |coord|·10^d must fit i32
        lim = 2.0e9 / (10.0 ** weld_decimals)
        mx = float(jnp.max(jnp.where(
            jnp.repeat(soup.mask, 3)[:, None], jnp.abs(soup.vertices),
            0.0)))
        use_device = mx < lim
    if use_device:
        uniq, nu, faces, nf = _weld_device(soup.vertices, soup.mask,
                                           weld_decimals)
        nu = int(nu)
        nf = int(nf)
        if nf == 0:
            return TriangleMesh.empty()
        return TriangleMesh.from_numpy(np.asarray(uniq[:nu]),
                                       np.asarray(faces[:nf]))
    tri = np.asarray(soup.vertices).reshape(-1, 3, 3)[
        np.asarray(soup.mask)]
    if len(tri) == 0:
        return TriangleMesh.empty()
    flat = tri.reshape(-1, 3)
    keys = np.round(flat, weld_decimals)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    faces = inv.reshape(-1, 3).astype(np.int32)
    ok = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) \
        & (faces[:, 0] != faces[:, 2])
    return TriangleMesh.from_numpy(uniq.astype(np.float32), faces[ok])


def marching_cubes(grid: VolumetricGrid, iso_level: float = 0.0,
                   method: str = "cubes",
                   weld: str = "auto") -> TriangleMesh:
    """Isosurface mesh (marching_cubes.rs:857 entry).

    ``method``: "cubes" = true 256-case marching cubes over derived
    tables (≤5 tris/cube); "tetrahedra" = 6-tet decomposition (simpler
    cases, ~2x more triangles). Both fully batched, same winding rule.
    ``weld``: "auto" | "host" | "device" — see :func:`soup_to_mesh`;
    "device" keeps the weld on-chip and transfers only the compact
    mesh (the big win for large grids through a tunneled TPU).
    """
    if method == "tetrahedra":
        soup = extract_soup(grid, jnp.float32(iso_level))
    else:
        soup = extract_soup_cubes_auto(grid, iso_level)
    return soup_to_mesh(soup, method=weld)


def reconstruct_marching_cubes(cloud: PointCloud,
                               resolution: int = 64,
                               iso_offset: float = 1.0) -> TriangleMesh:
    """Cloud → distance field → shell mesh (the reference's
    from_point_cloud + marching_cubes pipeline)."""
    grid = VolumetricGrid.from_point_cloud(cloud, (resolution,) * 3)
    iso = float(grid.spacing) * iso_offset
    return marching_cubes(grid, iso)
