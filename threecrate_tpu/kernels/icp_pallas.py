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
  target array from two tiny searchsorteds of its moved min/max keys
  (midpoint placement — contains the true NN for ~95% of queries at
  w=4 on 1M scans), which drive the kernel's target BlockSpecs via
  scalar prefetch
  (pltpu.PrefetchScalarGridSpec) — data-dependent sliding windows,
  no gathers.

Per-tile windows are approximate (a tile near a Morton discontinuity
can spread past any fixed window), so a small fraction of points match
a non-nearest target; the caller repairs this with median-based
correspondence trimming (see registration._icp_p2p), the classic
trimmed-ICP robustification.

Target rows are PACKED into one (4+E, Nt) array [x, y, z, valid,
extra...] so each window tile is a single DMA (the kernel is
latency-bound: per grid step the compute is only tile x W·tile
distances, so block count per step dominates). Optional per-target
payload rows (e.g. the target normals point-to-plane needs, or GICP's
covariance columns) ride the same one-hot match. Emits (4+E, Ns):
[matched x, y, z, match-valid, matched-extra...] — the exact d² (from
the matched coordinates), Kabsch sums and trimming run XLA-side where
the quantile is available.

(An MXU cross-term distance formulation |c|²−2qᵀc was tried and
measured SLOWER — a K=3 contraction uses 3/128 of the systolic array
and HIGHEST precision costs 6 passes — besides being too imprecise for
selection at scan densities. Distances stay on the VPU; the MXU does
the one-hot payload gather.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W_TILES = 4  # default target window, in target tiles, per source tile
# (w=4 with min/max-key window placement contains the true NN for ~95%
# of 1M-scan queries — better than w=6 with mean placement at 2/3 cost)


def _icp_match_kernel(blk_ref, src_ref, *refs, w_tiles: int,
                      n_extra: int):
    """refs = w_tiles packed target blocks ((4+E, tile) each), out_ref.
    src_ref is the packed (4, tile) [x, y, z, valid] source block.
    blk_ref is the scalar-prefetch window-start array (unused in the
    body — it only drives the BlockSpec index maps)."""
    win_refs = refs[:w_tiles]
    out_ref = refs[-1]

    srcp = src_ref[:]                                    # (4, tile)
    q = srcp[0:3, :]
    win = jnp.concatenate([r[:] for r in win_refs], axis=1)  # (4+E, W·t)
    cand = win[0:3, :]
    # invalid targets carry SENTINEL coords (2e19; see the caller), so
    # their d² overflows to +inf with no validity compare/select sweeps
    # over the (tile, W·tile) matrix.
    dx = cand[0, :][None, :] - q[0, :][:, None]          # (tile, W·tile)
    dy = cand[1, :][None, :] - q[1, :][:, None]
    dz = cand[2, :][None, :] - q[2, :][:, None]
    s = dx * dx + dy * dy + dz * dz
    inf = jnp.float32(jnp.inf)

    m = jnp.min(s, axis=1)                               # (tile,)
    # one-hot of the minima; exact f32 ties (distinct equidistant
    # candidates — vanishing measure, or true duplicate points) are
    # resolved by averaging the tied payloads
    chosen = ((s == m[:, None]) & (m[:, None] < inf)
              ).astype(jnp.float32)

    # matched coords + extras + the tie COUNT (a ones row) in ONE
    # one-hot MXU gather (HIGHEST keeps the 1.0·payload products
    # f32-exact)
    ones = jnp.ones((1, cand.shape[1]), jnp.float32)
    pay = jnp.concatenate([cand, win[4:, :], ones], axis=0) \
        if n_extra else jnp.concatenate([cand, ones], axis=0)
    mt = jax.lax.dot_general(
        chosen, pay, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)              # (tile, 4+E)
    cnt = jnp.maximum(mt[:, 3 + n_extra], 1.0)           # (tile,)
    mt = mt / cnt[:, None]

    w = (srcp[3, :] > 0.5) & (m < inf)
    out_ref[0, :] = mt[:, 0]
    out_ref[1, :] = mt[:, 1]
    out_ref[2, :] = mt[:, 2]
    out_ref[3, :] = w.astype(jnp.float32)
    for j in range(n_extra):
        out_ref[4 + j, :] = mt[:, 3 + j]


@functools.partial(jax.jit, static_argnames=("tile", "interpret",
                                              "w_tiles"))
def icp_match_tiles(src_packed: jnp.ndarray, tgt_packed: jnp.ndarray,
                    window_start: jnp.ndarray,
                    tile: int = 128, interpret: bool = False,
                    w_tiles: int = W_TILES):
    """Nearest-in-window correspondence of moved source vs sorted target.

    src_packed: (4, Ns) [moved x, y, z, valid], Morton-coherent order.
    tgt_packed: (4+E, Nt) [x, y, z, valid, extra...], Morton-sorted.
      Ns, Nt % tile == 0, Nt >= w_tiles·tile.
    window_start: (n_src_tiles,) int32 — first target TILE index of
      each source tile's w_tiles-wide search window (from the
      min/max-key midpoint; clipped to range).
    Returns (4 + E, Ns): [matched x, y, z, match-valid, extra...].
    """
    ns = src_packed.shape[1]
    nt = tgt_packed.shape[1]
    rows = tgt_packed.shape[0]
    n_extra = rows - 4
    assert ns % tile == 0 and nt % tile == 0 and nt >= w_tiles * tile
    n_tiles = ns // tile

    def tgt_spec(i):
        return pl.BlockSpec((rows, tile),
                            lambda t, blk, i=i: (0, blk[t] + i),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=(
            [pl.BlockSpec((4, tile), lambda t, blk: (0, t),
                          memory_space=pltpu.VMEM)]
            + [tgt_spec(i) for i in range(w_tiles)]
        ),
        out_specs=[pl.BlockSpec((4 + n_extra, tile), lambda t, blk: (0, t),
                                memory_space=pltpu.VMEM)],
    )
    (out,) = pl.pallas_call(
        functools.partial(_icp_match_kernel, w_tiles=w_tiles,
                          n_extra=n_extra),
        out_shape=[jax.ShapeDtypeStruct((4 + n_extra, ns), jnp.float32)],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(window_start, src_packed,
      *([tgt_packed] * w_tiles))
    return out
