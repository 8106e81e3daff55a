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

Emits (5, Ns): [matched x, y, z, d², match-valid] — the Kabsch sums
and trimming run XLA-side where the quantile is available.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W_TILES = 6  # target window = 6 target tiles around the searchsorted hit


def _icp_match_kernel(blk_ref, src_ref, sv_ref, *refs):
    """refs = W_TILES target-coord blocks, W_TILES target-valid blocks,
    out_ref. blk_ref is the scalar-prefetch window-start array (unused
    in the body — it only drives the BlockSpec index maps)."""
    tgt_refs = refs[:W_TILES]
    tv_refs = refs[W_TILES:2 * W_TILES]
    out_ref = refs[2 * W_TILES]

    q = src_ref[:]                                       # (3, tile)
    cand = jnp.concatenate([r[:] for r in tgt_refs], axis=1)  # (3, W·tile)
    validf = jnp.concatenate([r[:] for r in tv_refs], axis=1)
    valid = validf > 0.5                                 # (1, W·tile)

    dx = cand[0, :][None, :] - q[0, :][:, None]          # (tile, W·tile)
    dy = cand[1, :][None, :] - q[1, :][:, None]
    dz = cand[2, :][None, :] - q[2, :][:, None]
    d2 = dx * dx + dy * dy + dz * dz
    inf = jnp.float32(jnp.inf)
    d2v = jnp.where(valid, d2, inf)

    m = jnp.min(d2v, axis=1)                             # (tile,)
    col = jax.lax.broadcasted_iota(jnp.int32, d2v.shape, 1)
    arg = jnp.min(jnp.where(d2v == m[:, None], col, d2v.shape[1]), axis=1)
    chosen = ((col == arg[:, None]) & (m[:, None] < inf)
              ).astype(jnp.float32)                      # exactly-one

    # matched coordinates via MXU (one-hot × candidate coords; HIGHEST
    # keeps the 1.0·coord products f32-exact)
    mt = jax.lax.dot_general(
        chosen, cand, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)              # (tile, 3)

    w = (sv_ref[0, :] > 0.5) & (m < inf)
    out_ref[0, :] = mt[:, 0]
    out_ref[1, :] = mt[:, 1]
    out_ref[2, :] = mt[:, 2]
    out_ref[3, :] = jnp.where(w, m, inf)
    out_ref[4, :] = w.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def icp_match_tiles(src_t: jnp.ndarray, src_valid: jnp.ndarray,
                    tgt_t: jnp.ndarray, tgt_valid: jnp.ndarray,
                    window_start: jnp.ndarray,
                    tile: int = 128, interpret: bool = False):
    """Nearest-in-window correspondence of moved source vs sorted target.

    src_t: (3, Ns) moved source coords, Morton-coherent order.
    tgt_t: (3, Nt) target coords, Morton-sorted. Ns, Nt % tile == 0,
      Nt >= W_TILES·tile.
    window_start: (n_src_tiles,) int32 — first target TILE index of
      each source tile's W_TILES-wide search window (from a
      searchsorted of the moved tile-mean keys; clipped to range).
    Returns (5, Ns): [matched x, y, z, d² (inf where no match),
    match-valid].
    """
    ns = src_t.shape[1]
    nt = tgt_t.shape[1]
    assert ns % tile == 0 and nt % tile == 0 and nt >= W_TILES * tile
    n_tiles = ns // tile

    def tgt_spec(rows, i):
        return pl.BlockSpec((rows, tile),
                            lambda t, blk, i=i: (0, blk[t] + i),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=(
            [pl.BlockSpec((3, tile), lambda t, blk: (0, t),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, tile), lambda t, blk: (0, t),
                          memory_space=pltpu.VMEM)]
            + [tgt_spec(3, i) for i in range(W_TILES)]
            + [tgt_spec(1, i) for i in range(W_TILES)]
        ),
        out_specs=[pl.BlockSpec((5, tile), lambda t, blk: (0, t),
                                memory_space=pltpu.VMEM)],
    )
    (out,) = pl.pallas_call(
        _icp_match_kernel,
        out_shape=[jax.ShapeDtypeStruct((5, ns), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(window_start,
      src_t, src_valid,
      *([tgt_t] * W_TILES), *([tgt_valid] * W_TILES))
    return out
