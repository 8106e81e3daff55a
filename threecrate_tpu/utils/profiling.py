"""Profiling & timing harness.

The reference's profiling story is criterion benches + a warmup/median
timing loop in its dataset-bench CLI (SURVEY §5). The TPU equivalents:

* ``median_time`` — warmup → timed iterations → median, with a
  **device-sync that actually works through remote backends**:
  ``block_until_ready`` can be a no-op over tunneled PJRT transports,
  so completion is forced by materialising a scalar reduction.
* ``trace`` — context manager around ``jax.profiler`` for XLA traces.
* ``Timer`` — lightweight section timing for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import numpy as np


def sync(out) -> float:
    """Force device completion of a pytree; returns a checksum scalar."""
    import jax
    import jax.numpy as jnp
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    leaf = leaves[0]
    if leaf.dtype == bool:
        return float(jnp.sum(leaf))
    return float(jnp.where(jnp.isfinite(
        leaf.astype(jnp.float32)), leaf.astype(jnp.float32), 0).sum())


def median_time(fn: Callable, warmup: int = 2, iters: int = 5,
                sync_fn: Callable = sync) -> float:
    """Median wall seconds over ``iters`` runs after ``warmup``."""
    for _ in range(warmup):
        sync_fn(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync_fn(fn())
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/threecrate_trace"):
    """XLA profiler trace (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating section timer for host-side pipeline phases."""

    def __init__(self) -> None:
        self.sections: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections[name] = self.sections.get(name, 0.0) \
                + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.sections.values())
        lines = [f"{k}: {v * 1e3:.2f} ms ({v / max(total, 1e-12):.0%})"
                 for k, v in sorted(self.sections.items(),
                                    key=lambda kv: -kv[1])]
        return "\n".join(lines)


def device_memory_stats(device=None) -> Dict[str, int]:
    """Device memory counters (the TPU analog of the reference's
    instrumented-allocator benches, threecrate-bench/src/mem/*).

    Returns e.g. bytes_in_use / peak_bytes_in_use when the backend
    exposes them (TPU does; CPU returns {}).
    """
    import jax
    dev = device or jax.devices()[0]
    stats = dev.memory_stats() if hasattr(dev, "memory_stats") else None
    return dict(stats) if stats else {}


def measure_peak_memory(fn, device=None):
    """(result, peak_bytes_delta) of running ``fn`` — allocation-count
    bench analog (allocations.rs:19-55)."""
    before = device_memory_stats(device).get("peak_bytes_in_use", 0)
    out = fn()
    sync(out)
    after = device_memory_stats(device).get("peak_bytes_in_use", 0)
    return out, max(after - before, 0)


def program_memory(fn, *args, **kwargs) -> Dict[str, int]:
    """Compile-time memory accounting for a jitted program — the
    deterministic TPU analog of the reference's instrumented-allocator
    benches (threecrate-bench/src/mem/allocations.rs:19-55): XLA's
    buffer assignment reports exactly what the program will allocate,
    no runtime sampling needed.

    Returns {argument, output, temp, generated_code} bytes from
    ``Compiled.memory_analysis()``; {} when the backend doesn't expose
    it. ``fn`` must be a ``jax.jit``-wrapped callable.
    """
    try:
        compiled = fn.lower(*args, **kwargs).compile()
        ma = compiled.memory_analysis()
        if ma is None:
            return {}
        return {
            "argument_bytes": int(getattr(ma, "argument_size_in_bytes", 0)),
            "output_bytes": int(getattr(ma, "output_size_in_bytes", 0)),
            "temp_bytes": int(getattr(ma, "temp_size_in_bytes", 0)),
            "generated_code_bytes": int(
                getattr(ma, "generated_code_size_in_bytes", 0)),
        }
    except Exception:
        return {}
