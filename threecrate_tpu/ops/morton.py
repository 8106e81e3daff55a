"""Morton (Z-order) encoding for spatial locality sorts.

Space-filling-curve ordering is the TPU's spatial index: one device
sort puts spatially-near points at near array offsets, after which
neighbor candidates are *contiguous tiles* — dense shifted views
instead of the random gathers a hash grid needs. 10 bits per axis →
30-bit int32 keys (1024³ cells over the cloud's bounding box).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BITS = 10
GRID = 1 << BITS  # 1024


def _spread_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of int32 x so consecutive bits land 3 apart."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_encode(coords: jnp.ndarray) -> jnp.ndarray:
    """(…, 3) int32 cell coords in [0, 1024) → (…,) int32 Morton key."""
    c = coords.astype(jnp.int32)
    return (_spread_bits(c[..., 0])
            | (_spread_bits(c[..., 1]) << 1)
            | (_spread_bits(c[..., 2]) << 2))


# Per-pass lattice shifts as fractions of the full extent (Chan-style
# random shifts, derandomised with low-discrepancy constants): a shift
# that is a sizable non-dyadic fraction of the extent moves cell
# boundaries at *every* Morton level, so points split by a curve
# discontinuity in one pass are contiguous in another.
PASS_SHIFTS = (
    (0.0, 0.0, 0.0),
    (0.381966, 0.618034, 0.236068),
    (0.754877, 0.324717, 0.569840),
    (0.177124, 0.827090, 0.429203),
)


def frame(points: jnp.ndarray, mask: jnp.ndarray):
    """(mn, scale) of the masked cloud's isotropic Morton lattice — so
    OTHER points (e.g. a moving source cloud) can be encoded into the
    SAME lattice as a fixed target (keys_in_frame)."""
    big = jnp.float32(3e38)
    mn = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    mx = jnp.max(jnp.where(mask[:, None], points, -big), axis=0)
    ext = jnp.maximum(mx - mn, 1e-6)
    scale = (GRID - 1) / (2.0 * jnp.max(ext))
    return mn, scale


def keys_in_frame(points: jnp.ndarray, mask: jnp.ndarray,
                  mn: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Morton keys of ``points`` in a fixed lattice frame (see
    ``frame``); out-of-frame coordinates clamp to the boundary cells.
    Invalid points get INT32_MAX (sort to the end)."""
    rel = (points - mn) * scale
    cells = jnp.clip(rel.astype(jnp.int32), 0, GRID - 1)
    return jnp.where(mask, morton_encode(cells), jnp.int32(2**31 - 1))


def morton_keys(points: jnp.ndarray, mask: jnp.ndarray,
                pass_index: int = 0) -> jnp.ndarray:
    """Morton keys over the masked bounding box for one search pass.

    Each pass uses a different extent-scale lattice shift and axis
    interleave order (see PASS_SHIFTS). Invalid points get key
    INT32_MAX (sort to the end).
    """
    big = jnp.float32(3e38)
    mn = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    mx = jnp.max(jnp.where(mask[:, None], points, -big), axis=0)
    ext = jnp.maximum(mx - mn, 1e-6)
    return keys_in_frame_pass(points, mask, mn, ext, pass_index)


def keys_in_frame_pass(points: jnp.ndarray, mask: jnp.ndarray,
                       mn: jnp.ndarray, ext: jnp.ndarray,
                       pass_index: int = 0) -> jnp.ndarray:
    """Pass-shifted Morton keys with an EXPLICIT frame (mn, ext).

    Needed wherever the frame must come from somewhere other than the
    local array — e.g. inside ``shard_map`` bodies, where each shard
    sees only its slice and the frame is a pmin/pmax over the mesh
    axis (parallel.sharded.make_distributed_morton_sort).
    """
    shift = jnp.asarray(PASS_SHIFTS[pass_index % len(PASS_SHIFTS)],
                        jnp.float32) * ext
    # ISOTROPIC cells (uniform scale): per-axis normalisation would make
    # cells anisotropic and break euclidean locality on flat scans.
    # Grid covers double the extent so the shifted lattice still fits.
    scale = (GRID - 1) / (2.0 * jnp.max(ext))
    rel = (points - mn + shift) * scale
    cells = jnp.clip(rel.astype(jnp.int32), 0, GRID - 1)
    if pass_index:
        cells = jnp.roll(cells, pass_index % 3, axis=-1)
    keys = morton_encode(cells)
    return jnp.where(mask, keys, jnp.int32(2**31 - 1))
