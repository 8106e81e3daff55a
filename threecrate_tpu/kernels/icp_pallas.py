"""Pallas TPU kernel: static-sort ICP correspondence.

The ICP inner loop (registration.rs:258-370 via ops/registration.py)
needs, per iteration, the nearest target point of every moved source
point. The round-1 formulation sorted the 2M-point src∪tgt union
TWICE per iteration (~46 ms/iter at 1M). This kernel removes every
per-iteration sort:

* the TARGET is Morton-sorted once (it never moves) — the TPU analog
  of the static KD-tree Open3D queries with moved points;
* the SOURCE is Morton-sorted once at its initial pose — spatial
  coherence of a sorted array ("nearby in array ⇒ nearby in space")
  is invariant under the rigid motion ICP applies, so the sort never
  goes stale;
* per iteration, each source TILE finds its search window in the
  target array with one tiny searchsorted of its moved tile-mean key,
  which drives the kernel's target BlockSpecs through scalar prefetch
  (pltpu.PrefetchScalarGridSpec) — data-dependent sliding windows,
  no gathers.

Per-tile windows are approximate (a tile near a Morton discontinuity
can spread past any fixed window), so a small fraction of points match
a non-nearest target; the caller repairs this with median-based
correspondence trimming (see registration._icp_p2p), the classic
trimmed-ICP robustification.

Emits (4 + E, Ns): [matched x, y, z, match-valid, extra...] — the exact
d² (from the matched coordinates), Kabsch sums and trimming run
XLA-side where the quantile is available. Optional per-target payload
rows (e.g. the target normals point-to-plane needs) ride the same
one-hot match.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W_TILES = 6  # default target window, in target tiles, per source tile


def _icp_match_kernel(blk_ref, src_ref, sv_ref, *refs, w_tiles: int,
                      n_extra: int):
    """refs = w_tiles target-coord blocks, w_tiles target-valid blocks,
    [w_tiles target-extra blocks if n_extra], out_ref. blk_ref is the
    scalar-prefetch window-start array (unused in the body — it only
    drives the BlockSpec index maps)."""
    tgt_refs = refs[:w_tiles]
    tv_refs = refs[w_tiles:2 * w_tiles]
    ex_refs = refs[2 * w_tiles:3 * w_tiles] if n_extra else ()
    out_ref = refs[-1]

    q = src_ref[:]                                       # (3, tile)
    cand = jnp.concatenate([r[:] for r in tgt_refs], axis=1)  # (3, W·tile)
    validf = jnp.concatenate([r[:] for r in tv_refs], axis=1)

    # subtract-square distances on the VPU. (An MXU cross-term
    # formulation |c|²−2qᵀc was tried and measured SLOWER — a K=3
    # contraction uses 3/128 of the systolic array and HIGHEST costs
    # 6 passes — besides being too imprecise for selection at scan
    # densities.)
    dx = cand[0, :][None, :] - q[0, :][:, None]          # (tile, W·tile)
    dy = cand[1, :][None, :] - q[1, :][:, None]
    dz = cand[2, :][None, :] - q[2, :][:, None]
    s = dx * dx + dy * dy + dz * dz
    inf = jnp.float32(jnp.inf)
    s = jnp.where(validf > 0.5, s, inf)

    m = jnp.min(s, axis=1)                               # (tile,)
    # one-hot of the minima; exact f32 ties (distinct equidistant
    # candidates — vanishing measure, or true duplicate points) are
    # resolved by averaging the tied coordinates
    chosen = ((s == m[:, None]) & (m[:, None] < inf)
              ).astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(chosen, axis=1), 1.0)      # (tile,)

    # matched coordinates via MXU (one-hot × candidate coords; HIGHEST
    # keeps the 1.0·coord products f32-exact)
    mt = jax.lax.dot_general(
        chosen, cand, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)              # (tile, 3)
    mt = mt / cnt[:, None]

    w = (sv_ref[0, :] > 0.5) & (m < inf)
    out_ref[0, :] = mt[:, 0]
    out_ref[1, :] = mt[:, 1]
    out_ref[2, :] = mt[:, 2]
    out_ref[3, :] = w.astype(jnp.float32)
    if n_extra:
        extra = jnp.concatenate([r[:] for r in ex_refs], axis=1)
        me = jax.lax.dot_general(
            chosen, extra, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32) / cnt[:, None]
        for j in range(n_extra):
            out_ref[4 + j, :] = me[:, j]


@functools.partial(jax.jit, static_argnames=("tile", "interpret",
                                              "w_tiles"))
def icp_match_tiles(src_t: jnp.ndarray, src_valid: jnp.ndarray,
                    tgt_t: jnp.ndarray, tgt_valid: jnp.ndarray,
                    window_start: jnp.ndarray,
                    tile: int = 128, interpret: bool = False,
                    w_tiles: int = W_TILES,
                    tgt_extra: jnp.ndarray | None = None):
    """Nearest-in-window correspondence of moved source vs sorted target.

    src_t: (3, Ns) moved source coords, Morton-coherent order.
    tgt_t: (3, Nt) target coords, Morton-sorted. Ns, Nt % tile == 0,
      Nt >= w_tiles·tile.
    window_start: (n_src_tiles,) int32 — first target TILE index of
      each source tile's w_tiles-wide search window (from a
      searchsorted of the moved tile-mean keys; clipped to range).
    tgt_extra: optional (E, Nt) per-target payload rows (e.g. normals)
      gathered through the same one-hot match.
    Returns (4 + E, Ns): [matched x, y, z, match-valid, extra...].
    """
    ns = src_t.shape[1]
    nt = tgt_t.shape[1]
    assert ns % tile == 0 and nt % tile == 0 and nt >= w_tiles * tile
    n_tiles = ns // tile
    n_extra = 0 if tgt_extra is None else tgt_extra.shape[0]

    def tgt_spec(rows, i):
        return pl.BlockSpec((rows, tile),
                            lambda t, blk, i=i: (0, blk[t] + i),
                            memory_space=pltpu.VMEM)

    extra_specs = ([tgt_spec(n_extra, i) for i in range(w_tiles)]
                   if n_extra else [])
    extra_args = ([tgt_extra] * w_tiles) if n_extra else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=(
            [pl.BlockSpec((3, tile), lambda t, blk: (0, t),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, tile), lambda t, blk: (0, t),
                          memory_space=pltpu.VMEM)]
            + [tgt_spec(3, i) for i in range(w_tiles)]
            + [tgt_spec(1, i) for i in range(w_tiles)]
            + extra_specs
        ),
        out_specs=[pl.BlockSpec((4 + n_extra, tile), lambda t, blk: (0, t),
                                memory_space=pltpu.VMEM)],
    )
    (out,) = pl.pallas_call(
        functools.partial(_icp_match_kernel, w_tiles=w_tiles,
                          n_extra=n_extra),
        out_shape=[jax.ShapeDtypeStruct((4 + n_extra, ns), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(window_start,
      src_t, src_valid,
      *([tgt_t] * w_tiles), *([tgt_valid] * w_tiles),
      *extra_args)
    return out
