"""Scatter-free segmented sums/means over SORTED runs.

``jax.ops.segment_sum`` lowers to a scatter-add: ~46 ms device time for
1M rows on v5e (a dominant cost of the round-1 voxel filter, measured
from the xplane trace — isolated probes hid it behind XLA folding).
When the segment ids are CONTIGUOUS RUNS of a sorted array (the only
way this codebase ever produces them: voxel cells, NDT cells, ground
patches), the same reduction is expressible with chunked prefix sums,
two small gathers and two TINY (#chunks-row) scatters — no 1M-row
scatter anywhere.

Scheme (chunk = 256 rows):
* values are centered per chunk on the chunk's first valid row, so the
  in-chunk inclusive prefix ``P`` stays at chunk-local magnitude (the
  classic f32 trap here is differencing GLOBAL prefixes: for
  georeferenced coords the prefix reaches ~1e8 and its eps swamps a
  run sum; fragments never difference anything larger than one chunk);
* for every run START ``i``, the run's in-chunk fragment is
  ``P[e] − P[i] + v[i]`` where ``e`` is the element before the next
  start (or the chunk end) — ``e`` comes from a reverse cumulative
  minimum of flagged positions, all axis-1 (lane) ops;
* a run crossing chunk boundaries picks up the LEAD fragments (elements
  before the first start) of the following chunks — each re-centered on
  the OWNING chunk's base via a base-difference product — combined with
  one segment-sum over the ~N/256 chunk rows and added back to the last
  start of each chunk with an equally tiny scatter.

Everything stays CENTERED until the caller re-bases:
``sorted_run_means`` re-adds the base exactly (error ~eps·|coord|);
``sorted_run_sums`` pays one base·count product (~eps·|coord|·count —
fine for counts/histograms, documented for coordinates).

A "count" column of ``valid`` ones rides the same pipeline. Validated
against ``jax.ops.segment_sum`` in tests/test_segmented.py.

Reference context: filtering.rs:103-118 (voxel centroids),
ndt_registration.rs (per-cell gaussians) both do this reduction with
HashMap accumulation on CPU threads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

CHUNK = 256


def _run_fragments(values, new_run, valid, chunk):
    """Core: per-run CENTERED sums.

    Returns (centered (N, C), cnt (N,), base (N, C)): at each run-start
    row, the run's Σ(values − base_of_start_chunk) over valid members
    and the member count; zeros elsewhere. base is the start chunk's
    centering row, broadcast to all rows.
    """
    n, c = values.shape
    assert n % chunk == 0, "caller pads N to the chunk size"
    k = n // chunk

    v = jnp.where(valid[:, None], values.astype(jnp.float32), 0.0)
    ones = valid.astype(jnp.float32)
    flags = new_run & valid
    vk = v.reshape(k, chunk, c)
    ok = ones.reshape(k, chunk)
    fk = flags.reshape(k, chunk)

    # center on the chunk's first VALID row (zeros if none — harmless)
    first_valid = jnp.argmax(ok, axis=1)                     # (k,)
    base = jnp.take_along_axis(
        vk, first_valid[:, None, None].repeat(c, 2), axis=1)  # (k, 1, c)
    vc = jnp.where(ok[..., None] > 0.5, vk - base, 0.0)

    ext = jnp.concatenate([vc, ok[..., None]], axis=2)        # (k, chunk, c+1)
    p = jnp.cumsum(ext, axis=1)                               # inclusive

    pos = jnp.arange(chunk, dtype=jnp.int32)[None, :]         # (1, chunk)
    start_pos = jnp.where(fk, pos, chunk)
    # next start strictly AFTER i: reverse cumulative min of start_pos
    # shifted left by one
    sp_next = jnp.concatenate(
        [start_pos[:, 1:], jnp.full((k, 1), chunk, jnp.int32)], axis=1)
    ns = jnp.flip(jax.lax.cummin(jnp.flip(sp_next, 1), axis=1), 1)
    e = jnp.clip(ns - 1, 0, chunk - 1)                        # (k, chunk)

    pe = jnp.take_along_axis(p, e[:, :, None].repeat(c + 1, 2), axis=1)
    frag = pe - p + ext                                       # sums i..e
    frag = jnp.where(fk[..., None], frag, 0.0)                # starts only

    # ---- cross-chunk continuation (kept centered) ----
    has_start = jnp.any(fk, axis=1)                           # (k,)
    # lead fragment: rows before the first start (continuation of the
    # previous chunk's open run), centered on THIS chunk's base
    fs = jnp.where(has_start, jnp.argmax(fk, axis=1), chunk)  # (k,)
    lead_mask = (pos < fs[:, None]) & (ok > 0.5)
    lead_c = jnp.sum(jnp.where(lead_mask[..., None], vc, 0.0), axis=1)
    lead_n = jnp.sum(jnp.where(lead_mask, ok, 0.0), axis=1)   # (k,)

    # each open run is owned by the chunk of its LAST start; owner =
    # index of the most recent start-having chunk (cummax of flagged
    # chunk indices)
    iota_k = jnp.arange(k, dtype=jnp.int32)
    owner = jnp.maximum(
        jax.lax.cummax(jnp.where(has_start, iota_k, -1)), 0)  # (k,)
    own_prev = jnp.concatenate([jnp.zeros(1, jnp.int32), owner[:-1]])
    # re-center each lead on its OWNER's base: the base-difference
    # product is the only coordinate-magnitude multiply, and it is
    # scaled by the cross-chunk member count only
    base_owner = base[:, 0, :][own_prev]                      # (k, c)
    lead_rel = lead_c + (base[:, 0, :] - base_owner) * lead_n[:, None]
    lead_ext = jnp.concatenate([lead_rel, lead_n[:, None]], axis=1)
    cont = jax.ops.segment_sum(lead_ext, own_prev,
                               num_segments=k)                # (k, c+1)
    # chunk 0's own lead is zero because row 0 is a run start (caller
    # contract).

    # add continuation to the LAST start of each owning chunk
    last_start = jnp.where(
        has_start,
        chunk - 1 - jnp.argmax(jnp.flip(fk, 1), axis=1), 0)   # (k,)
    frag_flat = frag.reshape(n, c + 1)
    tgt_rows = jnp.where(has_start, iota_k * chunk + last_start, n)
    frag_flat = frag_flat.at[tgt_rows].add(
        jnp.where(has_start[:, None], cont, 0.0),
        mode="drop")                                           # k-row scatter
    base_flat = jnp.broadcast_to(base, (k, chunk, c)).reshape(n, c)
    return frag_flat[:, :c], frag_flat[:, c], base_flat


@functools.partial(jax.jit, static_argnames=("chunk",))
def sorted_run_sums(values: jnp.ndarray, new_run: jnp.ndarray,
                    valid: jnp.ndarray, chunk: int = CHUNK) -> jnp.ndarray:
    """Per-run sums of ``values`` over contiguous sorted runs.

    values: (N, C) f32; new_run: (N,) bool — True at the first row of
    each run (row 0 must be True if any row is valid); valid: (N,) bool
    — invalid rows contribute nothing.

    Returns (N, C + 1): at each run-start row, the run's
    [Σ values, Σ valid] — zeros elsewhere. Absolute-sum rounding is
    ~eps·|value|·count (the re-basing product); use sorted_run_means
    when a mean of large-magnitude values is the goal.
    """
    centered, cnt, base = _run_fragments(values, new_run, valid, chunk)
    flags = new_run & valid
    sums = jnp.where(flags[:, None], centered + base * cnt[:, None], 0.0)
    return jnp.concatenate([sums, cnt[:, None]], axis=1)


@functools.partial(jax.jit, static_argnames=("chunk",))
def sorted_run_means(values: jnp.ndarray, new_run: jnp.ndarray,
                     valid: jnp.ndarray, chunk: int = CHUNK):
    """(means (N, C) at start rows, counts (N,)) — see sorted_run_sums.

    The mean is ``base + centered_sum/count`` — the base joins through
    one exact addition, so centroid error is ~eps·|coord| (2e-5 at
    150 m) instead of the ~eps·|coord|·count a sums/count round trip
    pays.
    """
    centered, cnt, base = _run_fragments(values, new_run, valid, chunk)
    flags = new_run & valid
    means = base + centered / jnp.maximum(cnt, 1.0)[:, None]
    return jnp.where(flags[:, None], means, 0.0), cnt
