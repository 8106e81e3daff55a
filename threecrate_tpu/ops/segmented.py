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


@jax.jit
def sorted_run_sums(values: jnp.ndarray, new_run: jnp.ndarray,
                    valid: jnp.ndarray) -> jnp.ndarray:
    """Per-run sums of ``values`` over contiguous sorted runs.

    values: (N, C) f32; new_run: (N,) bool — True at the first row of
    each run (row 0 must be True if any row is valid); valid: (N,) bool
    — invalid rows contribute nothing.

    Returns (N, C + 1): at each run-start row, the run's
    [Σ values, Σ valid] — zeros elsewhere.
    """
    v = jnp.where(valid[:, None], values.astype(jnp.float32), 0.0)
    ext = jnp.concatenate([v, valid.astype(jnp.float32)[:, None]], axis=1)
    flags = new_run & valid

    # reverse segmented inclusive scan: in flipped order, a run start
    # becomes the LAST element of its segment, so the reset flag must
    # sit on the element AFTER it (h = shifted flipped flags)
    u = ext[::-1]
    g = flags[::-1]
    h = jnp.concatenate([jnp.zeros((1,), bool), g[:-1]])

    def op(a, b):
        sa, fa = a
        sb, fb = b
        return (sb + jnp.where(fb[..., None], 0.0, sa), fa | fb)

    s, _ = jax.lax.associative_scan(op, (u, h), axis=0)
    rs = s[::-1]                         # rs[i] = Σ ext[i .. run end]
    return jnp.where(flags[:, None], rs, 0.0)


@jax.jit
def sorted_run_means(values: jnp.ndarray, new_run: jnp.ndarray,
                     valid: jnp.ndarray):
    """(means (N, C) at start rows, counts (N,)) — see sorted_run_sums."""
    s = sorted_run_sums(values, new_run, valid)
    cnt = s[:, -1]
    return s[:, :-1] / jnp.maximum(cnt, 1.0)[:, None], cnt
