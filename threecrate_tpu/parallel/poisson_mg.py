"""Distributed screened-Poisson reconstruction over a device mesh.

The reference's Poisson path is a single-host octree-FEM call
(threecrate-reconstruction/src/poisson.rs:53-154); the single-device
TPU rebuild (reconstruction/poisson.py + multigrid.py) already replaces
it with a dense-grid geometric multigrid. This module distributes that
solve over a 1-D device mesh:

- the χ grid is sharded into **x-slabs** (axis 0);
- every 7-point stencil application exchanges ONE boundary plane per
  direction with each x-neighbor (two ``ppermute`` sends of (1, R, R)
  planes — the slab interior never moves);
- restriction (2×2×2 mean) is slab-local (slab thickness stays even
  until the gather level);
- trilinear prolongation resizes the halo-EXTENDED coarse slab and
  crops: the extended resize at output offset 2 reproduces the
  unsharded half-pixel weights exactly, including the global-edge
  clamp (halo planes at mesh ends replicate the slab's own boundary,
  matching ``jax.image.resize``'s coordinate clamp);
- below ``gather_res`` the level is ``all_gather``ed and the remaining
  V-cycle recursion runs **replicated** on every device (redundant
  compute on ≤32³ arrays is cheaper than ppermute latency on 1-plane
  slabs) — identical replicated inputs keep every device consistent.

Given the same right-hand side, the sharded solver matches
``multigrid.mg_solve`` to float-exactness: Jacobi sweeps and stencils
are elementwise (no reduction-order freedom), restriction/prolongation
are deterministic, and the only dot products (coarsest-level CG) run on
gathered replicated arrays — the same program as the unsharded path.
The end-to-end pipeline differs from the single-device one only in the
splat reduction order (per-device scatter partials combined by
``psum`` vs one sequential scatter), i.e. f32 rounding noise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..reconstruction import multigrid as _mg
from .mesh import POINTS_AXIS


# ---------------------------------------------------------------------------
# halo-exchanged stencil building blocks (inside shard_map)
# ---------------------------------------------------------------------------

def _exchange_x(x, axis_name: str, n_dev: int):
    """Extend the local x-slab with one neighbor plane each side.
    Mesh-edge devices replicate their own boundary plane — the Neumann
    convention of ``poisson._laplacian``'s index clip."""
    if n_dev == 1:
        return jnp.concatenate([x[:1], x, x[-1:]], axis=0)
    idx = jax.lax.axis_index(axis_name)
    lo = jax.lax.ppermute(x[-1:], axis_name,
                          [(d, d + 1) for d in range(n_dev - 1)])
    hi = jax.lax.ppermute(x[:1], axis_name,
                          [(d, d - 1) for d in range(1, n_dev)])
    lo = jnp.where(idx == 0, x[:1], lo)
    hi = jnp.where(idx == n_dev - 1, x[-1:], hi)
    return jnp.concatenate([lo, x, hi], axis=0)


def _shift_clip(a, d: int, axis: int):
    idx = jnp.clip(jnp.arange(a.shape[axis]) + d, 0, a.shape[axis] - 1)
    return jnp.take(a, idx, axis=axis)


def _stencil_ext(xe):
    """Unscaled 7-point stencil on a halo-extended slab: true
    x-neighbors come from the halo planes; y/z keep the local
    replicate clip (those axes are full-extent on every device)."""
    x = xe[1:-1]
    out = -6.0 * x + xe[:-2] + xe[2:]
    for axis in (1, 2):
        out = out + _shift_clip(x, 1, axis) + _shift_clip(x, -1, axis)
    return out


def _apply_a_local(x, screening, axis_name: str, n_dev: int):
    return screening * x - _stencil_ext(_exchange_x(x, axis_name, n_dev))


def _jacobi_local(x, b, screening, n: int, axis_name: str, n_dev: int,
                  omega: float = 2.0 / 3.0):
    diag = screening + 6.0

    def body(_, xx):
        r = b - _apply_a_local(xx, screening, axis_name, n_dev)
        return xx + (omega / diag) * r

    return jax.lax.fori_loop(0, n, body, x)


def _prolong_local(xc, fine_shape, axis_name: str, n_dev: int):
    """Trilinear prolongation across slab boundaries: resize the
    halo-extended coarse slab at the same exact ×2 scale and crop the
    two halo-derived fine planes per side."""
    xe = _exchange_x(xc, axis_name, n_dev)
    fe = jax.image.resize(
        xe, (2 * xe.shape[0], fine_shape[1], fine_shape[2]),
        method="trilinear")
    return fe[2:2 + fine_shape[0]]


def _v_cycle_local(b, screening, *, res: int, n_dev: int, axis_name: str,
                   nu1: int, nu2: int, gather_res: int, coarsest: int,
                   coarsest_iters: int):
    """One V(nu1, nu2) cycle on the local slab, zero initial guess.
    Recursion unrolls at trace time; below ``gather_res`` (or when the
    slab can no longer halve) the remaining levels run replicated via
    ``multigrid._v_cycle`` on the gathered array."""
    m = b.shape[0]
    if res <= gather_res or m < 2 or m % 2:
        bf = jax.lax.all_gather(b, axis_name, axis=0, tiled=True)
        ef = _mg._v_cycle(bf, screening, nu1=nu1, nu2=nu2,
                          coarsest=coarsest,
                          coarsest_iters=coarsest_iters)
        idx = jax.lax.axis_index(axis_name)
        return jax.lax.dynamic_slice_in_dim(ef, idx * m, m, 0)
    x = _jacobi_local(jnp.zeros_like(b), b, screening, nu1,
                      axis_name, n_dev)
    r = b - _apply_a_local(x, screening, axis_name, n_dev)
    bc = 4.0 * _mg._restrict(r)
    ec = _v_cycle_local(bc, 4.0 * screening, res=res // 2, n_dev=n_dev,
                        axis_name=axis_name, nu1=nu1, nu2=nu2,
                        gather_res=gather_res, coarsest=coarsest,
                        coarsest_iters=coarsest_iters)
    x = x + _prolong_local(ec, b.shape, axis_name, n_dev)
    return _jacobi_local(x, b, screening, nu2, axis_name, n_dev)


def mg_solve_local(b, screening, *, res: int, n_dev: int, axis_name: str,
                   cycles: int = 12, nu1: int = 3, nu2: int = 3,
                   gather_res: int = 32, coarsest: int = 8,
                   coarsest_iters: int = 128):
    """Sharded analog of ``multigrid.mg_solve`` (call inside
    shard_map with ``b`` the local x-slab of the RHS)."""
    screening = jnp.float32(screening)

    def body(_, x):
        r = b - _apply_a_local(x, screening, axis_name, n_dev)
        return x + _v_cycle_local(
            r, screening, res=res, n_dev=n_dev, axis_name=axis_name,
            nu1=nu1, nu2=nu2, gather_res=gather_res, coarsest=coarsest,
            coarsest_iters=coarsest_iters)

    return jax.lax.fori_loop(0, cycles, body, jnp.zeros_like(b))


# ---------------------------------------------------------------------------
# public factories
# ---------------------------------------------------------------------------

def make_sharded_mg_solver(mesh: Mesh, res: int, *, cycles: int = 12,
                           gather_res: int = 32,
                           axis_name: str = POINTS_AXIS):
    """Jitted distributed solver for (screening·I − S) x = b on a
    res³ grid sharded into x-slabs. ``b`` arrives with PartitionSpec
    (axis, None, None); the solution returns with the same sharding.
    Matches ``multigrid.mg_solve(b, screening, cycles)`` exactly."""
    n_dev = mesh.shape[axis_name]
    if res % n_dev:
        raise ValueError(f"res={res} not divisible by {n_dev} devices")
    spec = P(axis_name)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, P()),
                       out_specs=spec, check_vma=False)
    def _run(b_local, screening):
        return mg_solve_local(b_local, screening, res=res, n_dev=n_dev,
                              axis_name=axis_name, cycles=cycles,
                              gather_res=gather_res)

    return jax.jit(_run)


def make_sharded_poisson_fields(mesh: Mesh, res: int, *,
                                screening: float = 1e-4,
                                cycles: int = 8, gather_res: int = 32,
                                axis_name: str = POINTS_AXIS):
    """Distributed Poisson field solve: points/normals/mask sharded on
    the points axis → (χ replicated, iso scalar, splat-support field
    replicated). The normal splat scatters each device's LOCAL points
    into a full-res partial field combined by ``psum``; divergence and
    the support box-sum are replicated elementwise passes; the V-cycle
    solve — where the FLOPs are at depth ≥ 7 — runs slab-sharded."""
    n_dev = mesh.shape[axis_name]
    if res % n_dev:
        raise ValueError(f"res={res} not divisible by {n_dev} devices")
    slab = res // n_dev
    spec = P(axis_name)
    from ..reconstruction.poisson import _box3, _divergence

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, P(), P()),
        out_specs=(P(), P(), P()), check_vma=False)
    def _run(pts, nrm, msk, origin, spacing):
        m = msk.astype(jnp.float32)
        nrm_z = jnp.where(msk[:, None], jnp.nan_to_num(nrm), 0.0)
        g = (pts - origin) / spacing
        g0 = jnp.floor(g).astype(jnp.int32)
        frac = g - g0
        vfield = jnp.zeros((res, res, res, 3), jnp.float32)
        wfield = jnp.zeros((res, res, res), jnp.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = (jnp.where(dx, frac[:, 0], 1 - frac[:, 0])
                         * jnp.where(dy, frac[:, 1], 1 - frac[:, 1])
                         * jnp.where(dz, frac[:, 2], 1 - frac[:, 2])) * m
                    ix = jnp.clip(g0[:, 0] + dx, 0, res - 1)
                    iy = jnp.clip(g0[:, 1] + dy, 0, res - 1)
                    iz = jnp.clip(g0[:, 2] + dz, 0, res - 1)
                    vfield = vfield.at[ix, iy, iz].add(
                        nrm_z * w[:, None])
                    wfield = wfield.at[ix, iy, iz].add(w)
        vfield = jax.lax.psum(vfield, axis_name)
        wfield = jax.lax.psum(wfield, axis_name)
        vfield = vfield / jnp.maximum(wfield, 1e-6)[..., None]
        rhs = -_divergence(vfield)

        didx = jax.lax.axis_index(axis_name)
        b_loc = jax.lax.dynamic_slice_in_dim(rhs, didx * slab, slab, 0)
        x_loc = mg_solve_local(
            b_loc, jnp.float32(screening), res=res, n_dev=n_dev,
            axis_name=axis_name, cycles=cycles, gather_res=gather_res)
        chi = jax.lax.all_gather(x_loc, axis_name, axis=0, tiled=True)

        # iso level: mean of χ trilinearly sampled at the input points
        acc = jnp.zeros(pts.shape[0], jnp.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = (jnp.where(dx, frac[:, 0], 1 - frac[:, 0])
                         * jnp.where(dy, frac[:, 1], 1 - frac[:, 1])
                         * jnp.where(dz, frac[:, 2], 1 - frac[:, 2]))
                    ix = jnp.clip(g0[:, 0] + dx, 0, res - 1)
                    iy = jnp.clip(g0[:, 1] + dy, 0, res - 1)
                    iz = jnp.clip(g0[:, 2] + dz, 0, res - 1)
                    acc = acc + w * chi[ix, iy, iz]
        num = jax.lax.psum(jnp.sum(jnp.where(msk, acc, 0.0)), axis_name)
        den = jax.lax.psum(jnp.sum(m), axis_name)
        iso = num / jnp.maximum(den, 1.0)
        return chi, iso, _box3(wfield)

    return jax.jit(_run)


def make_sharded_poisson(mesh: Mesh, config=None,
                         axis_name: str = POINTS_AXIS):
    """Distributed ``poisson_reconstruct`` (poisson.rs:53-154 at
    multi-chip scale): returns ``run(cloud) -> TriangleMesh``. The
    cloud's capacity must divide by the mesh size; the solver is
    always multigrid (the distributed path has no CG tier — at the
    depths where distribution pays, multigrid is the right solver
    anyway, and below ``gather_res`` the whole solve replicates and
    matches the single-device program exactly)."""
    from ..core.errors import InvalidDataError
    from ..reconstruction.poisson import (PoissonConfig,
                                          _mesh_from_fields)

    if config is None:
        config = PoissonConfig()
    res = config.resolution
    fields = make_sharded_poisson_fields(
        mesh, res, screening=float(config.screening),
        cycles=config.mg_cycles, axis_name=axis_name)

    def run(cloud):
        if cloud.normals is None:
            raise InvalidDataError(
                "Poisson reconstruction requires normals")
        if int(cloud.size()) < 10:
            raise InvalidDataError(
                f"Poisson needs >= 10 points, got {int(cloud.size())}")
        mn, mx = cloud.bounding_box()
        span = jnp.max(mx - mn) * config.scale
        origin = (mn + mx) * 0.5 - span / 2
        spacing = span / (res - 1)
        chi, iso, support = fields(cloud.points, cloud.normals,
                                   cloud.mask, origin, spacing)
        return _mesh_from_fields(chi, iso, support, origin, spacing,
                                 config)

    return run
