"""Static-shape padding utilities.

XLA traces fixed shapes, so every variable-length collection in
threecrate-tpu is a padded array plus a validity mask. These helpers
centralise the pad/round-up policy so compiled-program cache hits are
maximised (many cloud sizes map to the same padded capacity).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

# Lane width of the TPU VPU/MXU; padding the point axis to a multiple of
# this keeps tiles aligned (pallas_guide.md "Tiling Constraints").
LANE = 128


def round_up(n: int, multiple: int = LANE) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def pad_capacity(n: int, multiple: int = LANE, geometric: bool = True) -> int:
    """Capacity for ``n`` items: next power-of-two-ish bucket, lane aligned.

    Geometric bucketing (1.5x steps) bounds recompilation count to
    O(log N) distinct shapes across a workload of arbitrary sizes.
    """
    if n <= 0:
        return multiple
    if not geometric:
        return round_up(n, multiple)
    cap = multiple
    while cap < n:
        cap = round_up(int(math.ceil(cap * 1.5)), multiple)
    return cap


def pad_array(x: np.ndarray, capacity: int, fill: float = 0.0) -> np.ndarray:
    """Pad axis 0 of ``x`` to ``capacity`` with ``fill``."""
    n = x.shape[0]
    if n > capacity:
        raise ValueError(f"array length {n} exceeds capacity {capacity}")
    if n == capacity:
        return x
    pad_width = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad_width, constant_values=fill)


def make_mask(n: int, capacity: int) -> np.ndarray:
    m = np.zeros((capacity,), dtype=bool)
    m[:n] = True
    return m


def masked_min(x: jnp.ndarray, mask: jnp.ndarray, axis=0) -> jnp.ndarray:
    big = jnp.asarray(jnp.inf, x.dtype)
    return jnp.min(jnp.where(mask[..., None] if x.ndim > mask.ndim else mask, x, big), axis=axis)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis=0) -> jnp.ndarray:
    small = jnp.asarray(-jnp.inf, x.dtype)
    return jnp.max(jnp.where(mask[..., None] if x.ndim > mask.ndim else mask, x, small), axis=axis)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=0) -> jnp.ndarray:
    m = mask[..., None] if x.ndim > mask.ndim else mask
    s = jnp.sum(jnp.where(m, x, 0.0), axis=axis)
    cnt = jnp.maximum(jnp.sum(mask, axis=axis), 1)
    return s / cnt.astype(x.dtype)


def bounding_box(points: jnp.ndarray, mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(min_xyz, max_xyz) over valid points; matches Drawable::bounding_box
    (reference threecrate-core/src/traits.rs:564-632)."""
    return masked_min(points, mask), masked_max(points, mask)
