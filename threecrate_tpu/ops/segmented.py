"""Scatter-free segmented sums/means over SORTED runs.

``jax.ops.segment_sum`` lowers to a scatter-add: ~46 ms device time for
1M rows on v5e (a dominant cost of the round-1 voxel filter, measured
from the xplane trace — isolated probes hid it behind XLA folding).
When the segment ids are CONTIGUOUS RUNS of a sorted array (the only
way this codebase ever produces them: voxel cells, NDT cells, ground
patches), the same reduction is one SEGMENTED REVERSE SCAN: an
associative scan over the flipped array whose operator resets at run
boundaries, leaving at every run-START row the sum of its whole run.
log2(N) fused passes, no scatters, no gathers.

(A chunked-prefix formulation was built first; its per-element
``take_along_axis`` of the prefix at each run end traced at ~49 ms —
element gathers are the same poison as scatters. The scan needs
neither. Precision is also better: the reset keeps every partial sum
at RUN magnitude, so there are no global prefixes to cancel — error is
~eps·|run sum|, the same class as segment_sum itself.)

A "count" column of ``valid`` ones rides the same scan, so means need
no second pass. Validated against ``jax.ops.segment_sum`` in
tests/test_segmented.py.

Reference context: filtering.rs:103-118 (voxel centroids),
ndt_registration.rs (per-cell gaussians) both do this reduction with
HashMap accumulation on CPU threads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


CHUNK = 256


def _seg_op(a, b):
    """Segmented-sum scan operator: reset where the later element's
    segment flag is set."""
    sa, fa = a
    sb, fb = b
    return (sb + jnp.where(fb[..., None], 0.0, sa), fa | fb)


@jax.jit
def sorted_run_sums(values: jnp.ndarray, new_run: jnp.ndarray,
                    valid: jnp.ndarray) -> jnp.ndarray:
    """Per-run sums of ``values`` over contiguous sorted runs.

    values: (N, C) f32; new_run: (N,) bool — True at the first row of
    each run (row 0 must be True if any row is valid); valid: (N,) bool
    — invalid rows contribute nothing.

    Returns (N, C + 1): at each run-start row, the run's
    [Σ values, Σ valid] — zeros elsewhere.

    Resets and emits at ``new_run`` ALONE, independent of ``valid``: a
    run whose FIRST row is invalid must still start its own run (the
    ground R-GPF refit gate deselects exactly the lowest-z head row on
    below-ground outliers; merging that patch into its predecessor
    contaminated the previous plane fit — advisor finding r2).
    Invalid rows only zero their value/count contribution.

    TWO-LEVEL reverse segmented scan: a flat associative_scan over 1M
    rows needs log2(N) ≈ 20 combine levels over full-size arrays and
    took ~8-10 min of XLA compile per instance through the remote
    compiler; chunking to (K, 256) needs 8 in-chunk levels plus a tiny
    chunk-level scan — same math, ~same runtime, far less HLO.
    """
    n, c = values.shape
    v = jnp.where(valid[:, None], values.astype(jnp.float32), 0.0)
    ext = jnp.concatenate([v, valid.astype(jnp.float32)[:, None]], axis=1)
    flags = new_run

    n_pad = ((n + CHUNK - 1) // CHUNK) * CHUNK
    if n_pad != n:
        ext = jnp.pad(ext, ((0, n_pad - n), (0, 0)))
        flags_p = jnp.pad(flags, (0, n_pad - n))
    else:
        flags_p = flags
    k = n_pad // CHUNK

    # in-chunk reverse segmented scan: flip within the chunk axis; a
    # run start becomes the LAST element of its (flipped) segment, so
    # the reset flag sits on the element AFTER it
    ek = ext.reshape(k, CHUNK, c + 1)
    fk = flags_p.reshape(k, CHUNK)
    u = ek[:, ::-1]
    g = fk[:, ::-1]
    h = jnp.concatenate([jnp.zeros((k, 1), bool), g[:, :-1]], axis=1)
    s, _ = jax.lax.associative_scan(_seg_op, (u, h), axis=1)
    rs = s[:, ::-1]              # rs[i] = Σ ext[i .. min(run end, chunk end)]

    # cross-chunk continuation: each chunk's LEAD fragment (rows before
    # its first start) = rs[:, 0] when row 0 is not a start; the run
    # open at a chunk's end picks up following chunks' leads until one
    # of them contains a start — the same reverse segmented recurrence
    # at chunk level
    has_start = jnp.any(fk, axis=1)
    lead = jnp.where(fk[:, 0:1], 0.0, rs[:, 0])          # (k, c+1)
    lv = jnp.concatenate([lead[1:], jnp.zeros((1, c + 1))], axis=0)
    fl = jnp.concatenate([has_start[1:], jnp.ones((1,), bool)])
    # cont[m] = lv[m] + (fl[m] ? 0 : cont[m+1]): a reverse recurrence
    # whose reset sits on the element ITSELF (note: unlike the element
    # scan above, where a run start cuts accumulation of the element
    # AFTER it in flipped order)
    u2 = lv[::-1]
    g2 = fl[::-1]
    s2, _ = jax.lax.associative_scan(_seg_op, (u2, g2), axis=0)
    cont = s2[::-1]

    # add the continuation to the LAST start of each chunk
    iota_k = jnp.arange(k, dtype=jnp.int32)
    last_start = jnp.where(
        has_start, CHUNK - 1 - jnp.argmax(fk[:, ::-1], axis=1), 0)
    rs_flat = rs.reshape(n_pad, c + 1)
    tgt_rows = jnp.where(has_start, iota_k * CHUNK + last_start, n_pad)
    rs_flat = rs_flat.at[tgt_rows].add(
        jnp.where(has_start[:, None], cont, 0.0), mode="drop")
    rs_flat = rs_flat[:n]
    return jnp.where(flags[:, None], rs_flat, 0.0)


@jax.jit
def sorted_run_means(values: jnp.ndarray, new_run: jnp.ndarray,
                     valid: jnp.ndarray):
    """(means (N, C) at start rows, counts (N,)) — see sorted_run_sums."""
    s = sorted_run_sums(values, new_run, valid)
    cnt = s[:, -1]
    return s[:, :-1] / jnp.maximum(cnt, 1.0)[:, None], cnt
