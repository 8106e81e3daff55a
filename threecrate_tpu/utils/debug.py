"""Debug hooks: the JAX answers to sanitizers/race detection.

SURVEY §5: the reference's safety story is Rust ownership + rayon
Send/Sync; the functional-array equivalent is that data races are
structurally impossible, and numeric corruption is caught by NaN/Inf
checking. These helpers wrap the standard jax debug switches.
"""

from __future__ import annotations

import contextlib


def enable_nan_checks(enable: bool = True) -> None:
    """Raise on any NaN produced inside jitted code (jax_debug_nans)."""
    import jax
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def nan_checks():
    """Scoped NaN checking for a suspicious pipeline stage."""
    import jax
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def disable_jit():
    """Run pipelines op-by-op for debugging (jax.disable_jit)."""
    import jax
    with jax.disable_jit():
        yield
