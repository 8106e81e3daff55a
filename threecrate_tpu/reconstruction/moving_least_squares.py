"""Moving Least Squares surface smoothing / reconstruction.

Covers threecrate-reconstruction/src/moving_least_squares.rs: local
weighted polynomial fits with selectable weight kernels and basis
orders (moving_least_squares.rs:13-74), point projection, and
grid-sampled implicit surface → isosurface extraction.

TPU shape: one kNN pass, then every point's weighted normal-equation
solve runs as a vmapped fixed-size (≤6×6) Cholesky — a million
independent tiny solves is exactly what the VPU wants. The implicit
-surface path evaluates the local fit at grid nodes and feeds
``reconstruction.marching_cubes``.
"""

from __future__ import annotations

import dataclasses
import enum
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.errors import InvalidDataError
from ..core.mesh import TriangleMesh
from ..core.point_cloud import PointCloud
from ..ops import linalg, neighbors
from .marching_cubes import VolumetricGrid, marching_cubes as _extract_mesh


class WeightKernel(enum.Enum):
    """moving_least_squares.rs weight kernels (4)."""

    GAUSSIAN = "gaussian"
    WENDLAND = "wendland"
    CUBIC = "cubic"
    CONSTANT = "constant"


class PolynomialBasis(enum.Enum):
    """Basis order for the local height fit (const → cubic ≈ quadric)."""

    CONSTANT = 0
    LINEAR = 1
    QUADRATIC = 2


@dataclasses.dataclass(frozen=True)
class MlsConfig:
    """Mirrors MLSConfig (moving_least_squares.rs:39)."""

    search_radius: float = 0.1
    max_neighbors: int = 32
    kernel: WeightKernel = WeightKernel.GAUSSIAN
    basis: PolynomialBasis = PolynomialBasis.QUADRATIC
    regularization: float = 1e-6
    compute_normals: bool = True


def _weights(dist, radius, kernel: WeightKernel):
    t = jnp.clip(dist / jnp.maximum(radius, 1e-12), 0.0, 1.0)
    if kernel == WeightKernel.GAUSSIAN:
        return jnp.exp(-(dist / jnp.maximum(radius / 2, 1e-12)) ** 2)
    if kernel == WeightKernel.WENDLAND:
        return (1 - t) ** 4 * (4 * t + 1)
    if kernel == WeightKernel.CUBIC:
        return 1 - 3 * t * t + 2 * t * t * t
    return jnp.ones_like(dist)


def _basis_terms(u, v, order: int):
    terms = [jnp.ones_like(u)]
    if order >= 1:
        terms += [u, v]
    if order >= 2:
        terms += [u * u, u * v, v * v]
    return jnp.stack(terms, axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("max_neighbors", "kernel", "order"))
def _mls_project(points, mask, radius, max_neighbors, kernel, order, reg):
    """Project every point onto its local MLS surface; returns
    (projected points, fitted normals, valid)."""
    res = neighbors.radius_neighbors(points, mask, points, mask,
                                     radius, max_neighbors)
    nbr = points[res.indices]                      # (N, k, 3)
    return _mls_project_rows(nbr, res.mask, res.distances, points, mask,
                             radius, kernel, order, reg)


def _mls_project_rows(nbr, nbr_ok, nbr_dist, points, mask, radius,
                      kernel, order, reg):
    """MLS projection core over pre-gathered neighborhoods: all inputs
    are (N, k, ·) arrays so the same math serves the single-device path
    (table gather above) and the sharded path (ring-carried rows in
    ``parallel.sharded.make_sharded_mls``)."""
    w = jnp.where(nbr_ok, _weights(nbr_dist, radius, kernel), 0.0)

    # local frame from the weighted covariance (plane fit)
    mean, cov = linalg.weighted_covariance(nbr, w)
    normal, _ = linalg.smallest_eigenvector_sym3x3(cov)
    # tangent basis
    helper = jnp.where((jnp.abs(normal[:, 2:3]) < 0.9),
                       jnp.array([0.0, 0.0, 1.0]),
                       jnp.array([1.0, 0.0, 0.0]))
    t1 = jnp.cross(normal, helper)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(normal, t1)

    d = nbr - mean[:, None, :]
    # DIMENSIONLESS local coordinates: the raw basis [1,u,v,u²,uv,v²]
    # spans (radius²)² dynamic range — at mm scale that is ~15 decades
    # and the f32 Cholesky collapses (r3c scale-invariance test).
    # Dividing by the radius makes the normal matrix scale-free; the
    # fitted height rescales back and the first derivatives (∂h/∂u =
    # ∂h'/∂u') are unchanged.
    inv_r = 1.0 / jnp.maximum(radius, 1e-30)
    u = jnp.einsum("nkj,nj->nk", d, t1) * inv_r
    v = jnp.einsum("nkj,nj->nk", d, t2) * inv_r
    h = jnp.einsum("nkj,nj->nk", d, normal) * inv_r

    b = _basis_terms(u, v, order)                  # (N, k, m)
    bw = b * w[..., None]
    ata = jnp.einsum("nkm,nkl->nml", bw, b,
                     precision=jax.lax.Precision.HIGHEST)
    m_dim = b.shape[-1]
    # SCALE-RELATIVE Tikhonov: ata entries scale like radius², so an
    # absolute reg dominates (and flattens the fit) on mm-scale
    # neighborhoods — the r3 eigensolver-bug class. Scaling by the
    # mean diagonal keeps the conditioning effect identical at every
    # scene scale (at unit scale this matches the old absolute 1e-6
    # within an O(1) factor).
    tr = jnp.trace(ata, axis1=-2, axis2=-1) / m_dim
    reg_eff = reg * jnp.maximum(tr, 1e-30)
    ata = ata + reg_eff[:, None, None] * jnp.eye(m_dim, dtype=ata.dtype)
    atb = jnp.einsum("nkm,nk->nm", bw, h,
                     precision=jax.lax.Precision.HIGHEST)
    coef = jax.vmap(lambda a_, b_: jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(a_), b_))(ata, atb)

    # the query point in dimensionless local coords; evaluate the fit
    # there and move along the normal (heights rescale by radius)
    dp = points - mean
    u0 = jnp.sum(dp * t1, axis=-1) * inv_r
    v0 = jnp.sum(dp * t2, axis=-1) * inv_r
    b0 = _basis_terms(u0, v0, order)
    h_fit = jnp.sum(b0 * coef, axis=-1) * radius
    projected = mean + (u0 * radius)[:, None] * t1 \
        + (v0 * radius)[:, None] * t2 + h_fit[:, None] * normal

    # analytic fitted normal: n ∝ (-∂h/∂u, -∂h/∂v, 1) in local frame
    if order >= 1:
        dhu = coef[:, 1]
        dhv = coef[:, 2]
        if order >= 2:
            dhu = dhu + 2 * coef[:, 3] * u0 + coef[:, 4] * v0
            dhv = dhv + coef[:, 4] * u0 + 2 * coef[:, 5] * v0
        n_fit = normal - dhu[:, None] * t1 - dhv[:, None] * t2
    else:
        n_fit = normal
    n_fit = n_fit / jnp.maximum(
        jnp.linalg.norm(n_fit, axis=-1, keepdims=True), 1e-12)

    valid = mask & (jnp.sum(nbr_ok, axis=1) >= 3)
    projected = jnp.where(valid[:, None], projected, points)
    return projected, jnp.where(valid[:, None], n_fit, 0.0), valid


def mls_smooth(cloud: PointCloud, config: MlsConfig = MlsConfig()
               ) -> PointCloud:
    """Project points onto their local MLS surface (denoising) —
    the point-projection half of the reference MLS."""
    proj, nrm, valid = _mls_project(
        cloud.points, cloud.mask, jnp.float32(config.search_radius),
        config.max_neighbors, config.kernel, config.basis.value,
        jnp.float32(config.regularization))
    out = cloud.with_points(proj)
    if config.compute_normals:
        out = out.with_normals(nrm)
    return out


def mls_reconstruct(cloud: PointCloud, config: MlsConfig = MlsConfig(),
                    grid_resolution: int = 48) -> TriangleMesh:
    """Implicit MLS surface sampled on a dense grid → isosurface
    (the reference's grid-sampled MLS → MC pipeline)."""
    smoothed = mls_smooth(cloud, config)
    if smoothed.normals is None:
        raise InvalidDataError("MLS reconstruction requires normals")
    grid = _signed_field(smoothed, grid_resolution)
    return _extract_mesh(grid, 0.0)


def _signed_field(cloud: PointCloud, resolution: int) -> VolumetricGrid:
    """Signed distance to the locally fitted surface: for each grid node,
    distance along the nearest point's MLS normal."""
    from ..ops import neighbors as nb
    mn, mx = cloud.bounding_box()
    ext = mx - mn
    pad = jnp.max(ext) * 0.1
    origin = mn - pad
    span = jnp.max(ext) + 2 * pad
    spacing = span / (resolution - 1)
    r = resolution
    ix = jax.lax.broadcasted_iota(jnp.float32, (r, r, r), 0)
    iy = jax.lax.broadcasted_iota(jnp.float32, (r, r, r), 1)
    iz = jax.lax.broadcasted_iota(jnp.float32, (r, r, r), 2)
    nodes = origin + jnp.stack([ix, iy, iz], -1) * spacing
    flat = nodes.reshape(-1, 3)
    res = nb.knn(cloud.points, cloud.mask, flat, None, 1,
                 query_chunk=16384)
    nearest = cloud.points[res.indices[:, 0]]
    nrm = cloud.normals[res.indices[:, 0]]
    sd = jnp.sum((flat - nearest) * nrm, axis=-1)
    return VolumetricGrid(sd.reshape(r, r, r), origin, spacing)
