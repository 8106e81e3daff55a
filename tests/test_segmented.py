"""sorted_run_sums vs jax.ops.segment_sum oracle (same reduction the
reference does with HashMap accumulation, filtering.rs:103-118)."""

import numpy as np
import jax.numpy as jnp
import pytest

from threecrate_tpu.ops.segmented import sorted_run_sums, sorted_run_means


def _oracle(values, new_run, valid):
    import jax
    seg = np.cumsum(new_run & valid) - 1
    seg = np.where(valid, np.maximum(seg, 0), len(values) - 1)
    sums = jax.ops.segment_sum(
        jnp.where(jnp.asarray(valid)[:, None], jnp.asarray(values), 0.0),
        jnp.asarray(seg), num_segments=len(values))
    cnts = jax.ops.segment_sum(jnp.asarray(valid, jnp.float32),
                               jnp.asarray(seg), num_segments=len(values))
    return np.asarray(sums), np.asarray(cnts)


def _runs(n, n_runs, rng, trailing_invalid=0):
    """Random run layout: n rows, n_runs starts, optional invalid tail."""
    starts = np.zeros(n, bool)
    starts[0] = True
    pick = rng.choice(np.arange(1, n - trailing_invalid), n_runs - 1,
                      replace=False)
    starts[pick] = True
    valid = np.ones(n, bool)
    if trailing_invalid:
        valid[-trailing_invalid:] = False
        starts[-trailing_invalid:] = False
    return starts, valid


def _check(values, new_run, valid):
    got = np.asarray(sorted_run_sums(jnp.asarray(values),
                                     jnp.asarray(new_run),
                                     jnp.asarray(valid)))
    ref_sums, ref_cnts = _oracle(values, new_run, valid)
    flags = new_run & valid
    seg_of_start = np.cumsum(flags) - 1
    # error bound: sums stay at run magnitude (scan resets) ~ eps * run sum
    scale = np.abs(values).max() + 1
    for i in np.where(flags)[0]:
        j = seg_of_start[i]
        np.testing.assert_allclose(got[i, :-1], ref_sums[j],
                                   atol=2e-4 * scale, rtol=1e-4)
        assert got[i, -1] == ref_cnts[j]
    if (~flags).any():
        assert np.abs(got[~flags]).max() == 0


def test_many_short_runs():
    rng = np.random.default_rng(0)
    n = 4096
    values = rng.normal(0, 10, (n, 3)).astype(np.float32)
    starts, valid = _runs(n, 700, rng)
    _check(values, starts, valid)


def test_runs_spanning_many_chunks():
    rng = np.random.default_rng(1)
    n = 4096
    values = rng.normal(0, 5, (n, 2)).astype(np.float32)
    starts = np.zeros(n, bool)
    starts[[0, 900, 910, 3000]] = True      # runs of ~900/10/2090/1096
    _check(values, starts, np.ones(n, bool))


def test_single_run():
    rng = np.random.default_rng(2)
    n = 2048
    values = rng.normal(0, 1, (n, 1)).astype(np.float32)
    starts = np.zeros(n, bool); starts[0] = True
    _check(values, starts, np.ones(n, bool))


def test_every_row_its_own_run():
    rng = np.random.default_rng(3)
    n = 1024
    values = rng.normal(0, 1, (n, 3)).astype(np.float32)
    _check(values, np.ones(n, bool), np.ones(n, bool))


def test_invalid_tail():
    rng = np.random.default_rng(4)
    n = 2048
    values = rng.normal(0, 3, (n, 3)).astype(np.float32)
    starts, valid = _runs(n, 300, rng, trailing_invalid=500)
    _check(values, starts, valid)


def test_large_offset_precision():
    """Georeferenced-scale coordinates: the scan's per-run resets keep
    sums at run magnitude — no global prefixes to cancel."""
    rng = np.random.default_rng(5)
    n = 4096
    values = (rng.normal(0, 0.1, (n, 3)) + 5e5).astype(np.float32)
    starts, valid = _runs(n, 500, rng)
    means, cnt = sorted_run_means(jnp.asarray(values), jnp.asarray(starts),
                                  jnp.asarray(valid))
    means = np.asarray(means)
    ref_sums, ref_cnts = _oracle(values.astype(np.float64), starts, valid)
    flags = starts & valid
    seg_of_start = np.cumsum(flags) - 1
    for i in np.where(flags)[0]:
        j = seg_of_start[i]
        mean_ref = ref_sums[j] / max(ref_cnts[j], 1)
        # means re-base through an exact addition: error ~ eps·|coord|
        np.testing.assert_allclose(means[i], mean_ref, atol=0.2)


def test_means():
    rng = np.random.default_rng(6)
    n = 1024
    values = rng.normal(0, 2, (n, 3)).astype(np.float32)
    starts, valid = _runs(n, 100, rng)
    means, cnt = sorted_run_means(jnp.asarray(values), jnp.asarray(starts),
                                  jnp.asarray(valid))
    ref_sums, ref_cnts = _oracle(values, starts, valid)
    flags = starts & valid
    seg_of_start = np.cumsum(flags) - 1
    for i in np.where(flags)[0]:
        j = seg_of_start[i]
        np.testing.assert_allclose(np.asarray(means)[i],
                                   ref_sums[j] / max(ref_cnts[j], 1),
                                   atol=1e-4)


def test_invalid_run_head_still_splits_runs():
    """Advisor r2 (high): a run whose FIRST row is invalid must still
    start its own run — reset/emit at new_run ALONE. Repro: two runs of
    6 with run-2's head invalid must count [6, 5], not [11, 0]."""
    n = 12
    values = np.ones((n, 1), np.float32)
    starts = np.zeros(n, bool)
    starts[0] = starts[6] = True
    valid = np.ones(n, bool)
    valid[6] = False                       # run-2 head deselected
    got = np.asarray(sorted_run_sums(jnp.asarray(values),
                                     jnp.asarray(starts),
                                     jnp.asarray(valid)))
    assert got[0, -1] == 6.0 and got[0, 0] == 6.0
    assert got[6, -1] == 5.0 and got[6, 0] == 5.0
    assert np.abs(got[[1, 2, 3, 4, 5, 7, 8, 9, 10, 11]]).max() == 0


def test_invalid_heads_random():
    """Randomized run layouts with valid mask independent of run
    heads (the ground R-GPF shape: refit gates deselect arbitrary
    rows, including run heads)."""
    rng = np.random.default_rng(7)
    n = 4096
    values = rng.normal(0, 3, (n, 3)).astype(np.float32)
    starts, _ = _runs(n, 300, rng)
    valid = rng.random(n) > 0.3
    got = np.asarray(sorted_run_sums(jnp.asarray(values),
                                     jnp.asarray(starts),
                                     jnp.asarray(valid)))
    # oracle with reset-at-new_run-alone semantics
    seg = np.cumsum(starts) - 1
    vals_m = np.where(valid[:, None], values.astype(np.float64), 0.0)
    scale = np.abs(values).max() + 1
    for i in np.where(starts)[0]:
        sel = seg == seg[i]
        np.testing.assert_allclose(got[i, :-1], vals_m[sel].sum(0),
                                   atol=2e-4 * scale, rtol=1e-4)
        assert got[i, -1] == valid[sel].sum()
    assert np.abs(got[~starts]).max() == 0
