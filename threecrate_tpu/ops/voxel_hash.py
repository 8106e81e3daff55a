"""Sorted voxel-hash grid: the TPU replacement for spatial hash maps.

Several reference components key points by integer voxel coordinate into
a HashMap (NDT cells, ndt_registration.rs:54-111; euclidean clustering
adjacency, segmentation.rs:396-460; streaming voxel filters). A hash
map is host-side pointer chasing; the TPU-native equivalent is:

  linear voxel key → one device sort → run-boundary detection →
  ``searchsorted`` point/range lookup.

Everything is fixed-shape and jittable. The grid is a pytree, so it can
be built once and closed over by jitted consumers (ICP loops, cluster
propagation).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_INVALID_KEY = jnp.int32(2**31 - 1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class VoxelGrid:
    """Sorted voxel index over a padded point set.

    Attributes:
      origin: (3,) grid origin (min corner of valid points).
      dims: (3,) int32 cell counts per axis (traced values).
      cell: scalar cell size.
      sorted_keys: (N,) int32 linear keys ascending; invalid rows hold
        INT32_MAX and sort to the end.
      perm: (N,) int32 original point index per sorted row.
      unique_keys: (N,) int32 — first-occurrence keys, compacted to the
        front; rows past ``n_cells`` are INT32_MAX.
      cell_starts / cell_counts: (N,) int32 run start/length per unique
        key (aligned with unique_keys).
      n_cells: scalar int32.
    """

    origin: jnp.ndarray
    dims: jnp.ndarray
    cell: jnp.ndarray
    sorted_keys: jnp.ndarray
    perm: jnp.ndarray
    unique_keys: jnp.ndarray
    cell_starts: jnp.ndarray
    cell_counts: jnp.ndarray
    n_cells: jnp.ndarray

    def tree_flatten(self):
        return ((self.origin, self.dims, self.cell, self.sorted_keys,
                 self.perm, self.unique_keys, self.cell_starts,
                 self.cell_counts, self.n_cells), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- queries (all jittable) -------------------------------------------
    def coords_of(self, points: jnp.ndarray) -> jnp.ndarray:
        return jnp.floor((points - self.origin) / self.cell).astype(jnp.int32)

    def key_of_coords(self, coords: jnp.ndarray) -> jnp.ndarray:
        """Linear key; out-of-grid coords map to INVALID_KEY."""
        inb = jnp.all((coords >= 0) & (coords < self.dims), axis=-1)
        key = (coords[..., 2] * self.dims[1] + coords[..., 1]) \
            * self.dims[0] + coords[..., 0]
        return jnp.where(inb, key, _INVALID_KEY)

    def key_of(self, points: jnp.ndarray) -> jnp.ndarray:
        return self.key_of_coords(self.coords_of(points))

    def lookup(self, keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Key → (cell_index, found). cell_index indexes unique_keys rows."""
        pos = jnp.searchsorted(self.unique_keys, keys)
        pos = jnp.clip(pos, 0, self.unique_keys.shape[0] - 1)
        found = (self.unique_keys[pos] == keys) & (keys != _INVALID_KEY)
        return pos, found

    def range_of(self, keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Key → (start, count) into the sorted point order (0 count if
        absent)."""
        pos, found = self.lookup(keys)
        start = jnp.where(found, self.cell_starts[pos], 0)
        count = jnp.where(found, self.cell_counts[pos], 0)
        return start, count

    def gather_neighbors(self, points: jnp.ndarray, cap_per_cell: int,
                         ring: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Candidate point indices from the (2·ring+1)³ neighborhood.

        Returns (indices (Q, n_cells·cap) int32 into the ORIGINAL point
        array, valid mask). Fixed capacity ``cap_per_cell`` per cell;
        cells with more points are truncated (callers choose cap from
        expected density).
        """
        coords = self.coords_of(points)  # (Q, 3)
        offsets = []
        r = range(-ring, ring + 1)
        for dz in r:
            for dy in r:
                for dx in r:
                    offsets.append((dx, dy, dz))
        off = jnp.asarray(offsets, jnp.int32)           # (C, 3)
        nb_coords = coords[:, None, :] + off[None, :, :]  # (Q, C, 3)
        keys = self.key_of_coords(nb_coords)             # (Q, C)
        start, count = self.range_of(keys)               # (Q, C)
        slot = jnp.arange(cap_per_cell, dtype=jnp.int32)  # (S,)
        idx_sorted = start[..., None] + slot             # (Q, C, S)
        valid = slot[None, None, :] < count[..., None]
        idx_sorted = jnp.clip(idx_sorted, 0, self.perm.shape[0] - 1)
        orig = self.perm[idx_sorted]
        q = points.shape[0]
        return (orig.reshape(q, -1), valid.reshape(q, -1))


@functools.partial(jax.jit, static_argnames=())
def build_voxel_grid(points: jnp.ndarray, mask: jnp.ndarray,
                     cell_size) -> VoxelGrid:
    """Build the sorted grid index in one fused device pass.

    Note: requires nx·ny·nz < 2³¹ over the cloud's bounding box — true
    for any realistic (scene extent / cell) ratio; degenerate combos get
    their keys clamped into INVALID (treated as empty cells).
    """
    n = points.shape[0]
    cell = jnp.asarray(cell_size, jnp.float32)
    big = jnp.float32(3e38)
    origin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    maxc = jnp.max(jnp.where(mask[:, None], points, -big), axis=0)
    dims = jnp.maximum(
        jnp.floor((maxc - origin) / cell).astype(jnp.int32) + 1, 1)

    coords = jnp.floor((points - origin) / cell).astype(jnp.int32)
    coords = jnp.clip(coords, 0, dims - 1)
    key = (coords[:, 2] * dims[1] + coords[:, 1]) * dims[0] + coords[:, 0]
    key = jnp.where(mask, key, _INVALID_KEY)

    sorted_keys, perm = jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1)

    new_run = jnp.concatenate([
        jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]])
    new_run = new_run & (sorted_keys != _INVALID_KEY)
    n_cells = jnp.sum(new_run).astype(jnp.int32)

    pos = jnp.arange(n, dtype=jnp.int32)
    valid_sorted = sorted_keys != _INVALID_KEY

    # per-cell counts via the scatter-free segmented scan, then ONE
    # stable compaction sort brings run-head rows (key, start, count)
    # to the front in cell order — replaces three 1M-row scatters
    # (~46 ms each on v5e)
    from . import segmented
    cnt_s = segmented.sorted_run_sums(
        jnp.zeros((n, 0), jnp.float32), new_run, valid_sorted)[:, 0]
    comp_key = jnp.where(new_run, jnp.int32(0), jnp.int32(1))
    _, uk, cs, cnt_c = jax.lax.sort(
        (comp_key, sorted_keys, pos, cnt_s.astype(jnp.int32)), num_keys=1)
    # rows ≥ n_cells must be INVALID for searchsorted correctness
    row = jnp.arange(n)
    unique_keys = jnp.where(row < n_cells, uk, _INVALID_KEY)
    cell_starts = jnp.where(row < n_cells, cs, 0)
    counts = jnp.where(row < n_cells, cnt_c, 0)

    return VoxelGrid(origin, dims, cell, sorted_keys, perm,
                     unique_keys, cell_starts, counts.astype(jnp.int32),
                     n_cells)
