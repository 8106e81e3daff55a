"""Nearest-neighbor search, TPU-style.

Replaces the reference's flat array-backed KD-tree
(threecrate-algorithms/src/nearest_neighbor.rs:8-298) and its SIMD
brute-force fallback (src/simd_distance.rs). A KD-tree is pointer
chasing with data-dependent control flow — the worst possible shape for
a systolic-array machine. The TPU-native formulation:

* the N×M squared-distance matrix is a rank-3 matmul
  ``‖q‖² + ‖p‖² − 2 q·pᵀ`` that lands on the MXU;
* it is computed **blockwise** (never materialised) with a running
  top-k merged per tile — the same blockwise trick as flash attention,
  applied to distances instead of logits;
* queries are processed in chunks via ``lax.map`` so VMEM/HBM footprint
  stays bounded at ``query_chunk × db_tile`` floats.

All results are fixed-shape: ``(Q, k)`` indices + squared distances,
with invalid slots carrying ``inf`` distance. Like the reference's
traversal (nearest_neighbor.rs:177-251) we keep *squared* distances
throughout and sqrt only at the API boundary.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.point_cloud import PointCloud
from ..utils import padding


@jax.jit
def batch_distances_squared(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs squared distances ``(A, B)`` in one MXU matmul.

    API analog of the reference's SIMD SoA distance kernels
    (simd_distance.rs:110-210 batch_distances_squared): the AVX2/SSE2
    runtime dispatch becomes a single precision-guarded matmul. For
    large sets prefer the blockwise ``knn``/``knn_window`` entry points
    (this materialises the full matrix).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    an = jnp.sum(a * a, axis=-1)
    bn = jnp.sum(b * b, axis=-1)
    cross = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(an[:, None] + bn[None, :] - 2.0 * cross, 0.0)


class KnnResult(NamedTuple):
    """Fixed-shape kNN result.

    indices: ``(Q, k)`` int32 into the database array (padding-safe: always
      in range, but only meaningful where ``mask``).
    distances: ``(Q, k)`` float32 *euclidean* distances, ``inf`` where invalid.
    mask: ``(Q, k)`` bool — neighbor slot validity.
    """

    indices: jnp.ndarray
    distances: jnp.ndarray
    mask: jnp.ndarray


def _chunked(x: jnp.ndarray, chunk: int, fill=0.0) -> jnp.ndarray:
    """Pad axis 0 to a multiple of ``chunk`` and reshape to (n_chunks, chunk, ...)."""
    n = x.shape[0]
    n_pad = padding.round_up(max(n, 1), chunk)
    if n_pad != n:
        pad = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad, constant_values=fill)
    return x.reshape((n_pad // chunk, chunk) + x.shape[1:])


def _topk_neg(neg: jnp.ndarray, k: int, recall_target: float):
    """Row-wise top-k of negated squared distances.

    ``recall_target < 1`` uses ``lax.approx_max_k`` — the TPU's partial
    -reduction top-k, ~4-10x faster than the full sort-based ``top_k``
    at large row lengths (and exact on CPU).
    """
    if recall_target < 1.0:
        return jax.lax.approx_max_k(neg, k, recall_target=recall_target)
    return jax.lax.top_k(neg, k)


def _knn_chunk_vs_db(q: jnp.ndarray, db: jnp.ndarray, db_valid: jnp.ndarray,
                     k: int, db_tile: int, q_self_idx: Optional[jnp.ndarray],
                     recall_target: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One query chunk against the whole database, scanning db tiles.

    Returns (neg_sq_dists (qc, k), indices (qc, k)) sorted best-first.
    ``db_tile`` trades the (qc × tile) distance-buffer footprint against
    the number of top-k merge passes; big tiles win on TPU because
    top-k cost dominates the matmul.
    """
    qc = q.shape[0]
    qn = jnp.sum(q * q, axis=-1)  # (qc,)

    def tile_topk(tile_i, pts, valid):
        # (qc, tile) squared distances via MXU. HIGHEST precision: the
        # ‖q‖²+‖p‖²−2q·p expansion cancels catastrophically under the
        # MXU's default bf16 passes (meter-scale errors on LiDAR ranges).
        pn = jnp.sum(pts * pts, axis=-1)
        cross = jax.lax.dot_general(
            q, pts, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(qn[:, None] + pn[None, :] - 2.0 * cross, 0.0)
        neg = jnp.where(valid[None, :], -d2, -jnp.inf)
        local_idx = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        if q_self_idx is not None:
            neg = jnp.where(tile_i * db_tile + local_idx == q_self_idx[:, None],
                            -jnp.inf, neg)
        top_neg, top_pos = _topk_neg(neg, k, recall_target)
        return top_neg, tile_i * db_tile + jnp.take_along_axis(
            local_idx, top_pos, axis=1)

    if db.shape[0] <= db_tile:
        return tile_topk(jnp.int32(0), db, db_valid)

    db_t = _chunked(db, db_tile)                       # (T, tile, 3)
    valid_t = _chunked(db_valid, db_tile, fill=False)  # (T, tile)
    n_tiles = db_t.shape[0]

    init = (jnp.full((qc, k), -jnp.inf, jnp.float32),
            jnp.zeros((qc, k), jnp.int32))

    def body(carry, inputs):
        best_neg, best_idx = carry
        tile_i, pts, valid = inputs
        neg, idx = tile_topk(tile_i, pts, valid)
        cand_neg = jnp.concatenate([best_neg, neg], axis=1)
        cand_idx = jnp.concatenate([best_idx, idx], axis=1)
        top_neg, top_pos = jax.lax.top_k(cand_neg, k)  # tiny: 2k wide
        top_idx = jnp.take_along_axis(cand_idx, top_pos, axis=1)
        return (top_neg, top_idx), None

    tiles = (jnp.arange(n_tiles, dtype=jnp.int32), db_t, valid_t)
    (best_neg, best_idx), _ = jax.lax.scan(body, init, tiles)
    return best_neg, best_idx


@functools.partial(
    jax.jit, static_argnames=("k", "exclude_self", "query_chunk", "db_tile",
                              "recall_target"))
def knn(db_points: jnp.ndarray, db_mask: jnp.ndarray,
        queries: jnp.ndarray, query_mask: Optional[jnp.ndarray] = None,
        k: int = 1, *, exclude_self: bool = False,
        query_chunk: int = 1024, db_tile: int = 262144,
        recall_target: float = 1.0) -> KnnResult:
    """Exact k-nearest-neighbors by blockwise brute force.

    Replaces KdTree::find_k_nearest (nearest_neighbor.rs:177-251). The
    self point *is* a valid neighbor (distance 0) when the query set is
    the database, matching the reference; pass ``exclude_self=True`` to
    drop the i==j pair (only meaningful when queries is db_points).
    ``recall_target < 1`` switches the row reduction to the TPU's
    hardware approximate top-k (per-neighbor recall; distances of the
    returned neighbors remain exact).
    """
    db_points = db_points.astype(jnp.float32)
    queries = queries.astype(jnp.float32)
    nq = queries.shape[0]
    k = min(k, db_points.shape[0])

    self_idx = None
    if exclude_self:
        self_idx = jnp.arange(nq, dtype=jnp.int32)
        self_idx = _chunked(self_idx, query_chunk, fill=-1)

    q_chunks = _chunked(queries, query_chunk)  # (C, qc, 3)

    def run_chunk(args):
        i, qch = args
        sidx = None if self_idx is None else self_idx[i]
        return _knn_chunk_vs_db(qch, db_points, db_mask, k, db_tile, sidx,
                                recall_target)

    if q_chunks.shape[0] == 1:
        neg, idx = run_chunk((jnp.int32(0), q_chunks[0]))
    else:
        neg, idx = jax.lax.map(
            run_chunk,
            (jnp.arange(q_chunks.shape[0], dtype=jnp.int32), q_chunks))
    neg = neg.reshape(-1, k)[:nq]
    idx = idx.reshape(-1, k)[:nq]
    d2 = -neg
    valid = jnp.isfinite(d2)
    if query_mask is not None:
        valid = valid & query_mask[:, None]
    idx = jnp.clip(idx, 0, db_points.shape[0] - 1)
    dist = jnp.sqrt(jnp.where(valid, d2, jnp.inf))
    return KnnResult(idx, jnp.where(valid, dist, jnp.inf), valid)


@functools.partial(
    jax.jit,
    static_argnames=("max_neighbors", "exclude_self", "query_chunk", "db_tile"))
def radius_neighbors(db_points: jnp.ndarray, db_mask: jnp.ndarray,
                     queries: jnp.ndarray, query_mask: Optional[jnp.ndarray],
                     radius: float, max_neighbors: int = 32, *,
                     exclude_self: bool = False,
                     query_chunk: int = 2048, db_tile: int = 2048) -> KnnResult:
    """Fixed-capacity radius search (nearest_neighbor.rs:254-298).

    Returns up to ``max_neighbors`` nearest points within ``radius``;
    fixed capacity replaces the reference's Vec-growing semantics (XLA
    needs static shapes). Slots beyond the radius are masked out.
    """
    res = knn(db_points, db_mask, queries, query_mask, max_neighbors,
              exclude_self=exclude_self, query_chunk=query_chunk,
              db_tile=db_tile)
    inside = res.mask & (res.distances <= radius)
    return KnnResult(res.indices,
                     jnp.where(inside, res.distances, jnp.inf), inside)


@functools.partial(
    jax.jit, static_argnames=("max_neighbors", "exclude_self", "tile",
                              "n_passes"))
def radius_neighbors_window(points: jnp.ndarray, mask: jnp.ndarray,
                            radius, max_neighbors: int = 32, *,
                            exclude_self: bool = False, tile: int = 128,
                            n_passes: int = 2) -> KnnResult:
    """Self radius search via the Morton window path — the large-N
    replacement for ``radius_neighbors`` when queries == database
    (normals/FPFH/GICP neighborhoods at million-point scale)."""
    res = knn_window(points, mask, max_neighbors, tile=tile,
                     n_passes=n_passes, exclude_self=exclude_self)
    inside = res.mask & (res.distances <= radius)
    return KnnResult(res.indices,
                     jnp.where(inside, res.distances, jnp.inf), inside)


def nearest_one(db_points: jnp.ndarray, db_mask: jnp.ndarray,
                queries: jnp.ndarray,
                max_distance: Optional[float] = None,
                **kw) -> KnnResult:
    """Top-1 correspondence search (ICP inner loop, registration.rs:87-107)."""
    res = knn(db_points, db_mask, queries, None, 1, **kw)
    if max_distance is not None:
        inside = res.mask & (res.distances <= max_distance)
        res = KnnResult(res.indices, jnp.where(inside, res.distances, jnp.inf),
                        inside)
    return res


# ---------------------------------------------------------------------------
# grid-pruned kNN: the large-N fast path
# ---------------------------------------------------------------------------

def estimate_cell_size(points: jnp.ndarray, mask: jnp.ndarray, k: int) -> float:
    """Heuristic cell size targeting ~k points per occupied cell.

    Host-side (blocks): samples 1k points, takes the median distance to
    the ~∛k-th axis of local spacing via bbox density. Good enough to
    land occupancy within the cap; tune per dataset for peak perf.
    """
    import numpy as np
    pts = np.asarray(points)
    m = np.asarray(mask)
    pts = pts[m]
    n = max(len(pts), 1)
    mn, mx = pts.min(0), pts.max(0)
    ext = np.maximum(mx - mn, 1e-6)
    # assume points concentrate on a 2-D manifold inside the bbox:
    # area-based spacing is the robust middle ground for scans
    area = np.median([ext[0] * ext[1], ext[0] * ext[2], ext[1] * ext[2]])
    spacing = float(np.sqrt(area / n))
    return max(spacing * max(k, 4) ** 0.5, 1e-6)


@functools.partial(
    jax.jit,
    static_argnames=("k", "cap_per_cell", "ring", "exclude_self",
                     "query_chunk"))
def knn_grid(db_points: jnp.ndarray, db_mask: jnp.ndarray,
             queries: jnp.ndarray, query_mask: Optional[jnp.ndarray],
             k: int, cell_size, *, cap_per_cell: int = 16, ring: int = 1,
             exclude_self: bool = False,
             query_chunk: int = 32768) -> KnnResult:
    """Voxel-grid-pruned kNN: candidates from the (2·ring+1)³ cell
    neighborhood only (SURVEY §7.2's KD-tree replacement at scale).

    Exact for all neighbors within ``ring · cell_size`` of the query;
    neighbors farther than that can be missed (slot masked instead).
    ``cap_per_cell`` bounds candidates per cell (overflow truncated), so
    choose cell_size targeting ≲ cap_per_cell points per cell.
    Complexity O(N · 27 · cap) instead of O(N · M).
    """
    from . import voxel_hash  # local import to keep module DAG acyclic

    grid = voxel_hash.build_voxel_grid(db_points, db_mask, cell_size)
    nq = queries.shape[0]
    q_chunks = _chunked(queries.astype(jnp.float32), query_chunk)
    self_idx = None
    if exclude_self:
        self_idx = _chunked(jnp.arange(nq, dtype=jnp.int32), query_chunk,
                            fill=-1)

    def run_chunk(args):
        i, qch = args
        cand_idx, cand_ok = grid.gather_neighbors(qch, cap_per_cell, ring)
        cand_pts = db_points[cand_idx]                     # (qc, C, 3)
        diff = qch[:, None, :] - cand_pts
        d2 = jnp.sum(diff * diff, axis=-1)
        neg = jnp.where(cand_ok, -d2, -jnp.inf)
        if self_idx is not None:
            neg = jnp.where(cand_idx == self_idx[i][:, None], -jnp.inf, neg)
        kk = min(k, neg.shape[1])
        top_neg, pos = jax.lax.top_k(neg, kk)
        top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
        if kk < k:
            top_neg = jnp.pad(top_neg, ((0, 0), (0, k - kk)),
                              constant_values=-jnp.inf)
            top_idx = jnp.pad(top_idx, ((0, 0), (0, k - kk)))
        return top_neg, top_idx

    if q_chunks.shape[0] == 1:
        neg, idx = run_chunk((jnp.int32(0), q_chunks[0]))
    else:
        neg, idx = jax.lax.map(
            run_chunk,
            (jnp.arange(q_chunks.shape[0], dtype=jnp.int32), q_chunks))
    neg = neg.reshape(-1, k)[:nq]
    idx = idx.reshape(-1, k)[:nq]
    d2 = -neg
    valid = jnp.isfinite(d2)
    if query_mask is not None:
        valid = valid & query_mask[:, None]
    idx = jnp.clip(idx, 0, db_points.shape[0] - 1)
    dist = jnp.sqrt(jnp.where(valid, d2, jnp.inf))
    return KnnResult(idx, jnp.where(valid, dist, jnp.inf), valid)


# ---------------------------------------------------------------------------
# Morton sliding-window kNN: the speed-of-light self-kNN path
# ---------------------------------------------------------------------------

def _merge_topk(neg_a, idx_a, neg_b, idx_b, k: int,
                pts_a=None, pts_b=None):
    """Merge two per-row best-k lists into the best k, sort-free.

    Dedup (b-entries whose index appears in a) and placement are both
    rank arithmetic over (k × k) comparison masks — pure VPU
    elementwise work. Per-row sorts here are poison on TPU: an argsort
    formulation measured ~0.9 s and a top_k(2k) formulation ~0.4 s at
    1M×k=10; this is a few ms. Both inputs must be sorted best-first
    (lax.top_k / approx_max_k output order), as is the result.
    """
    a_valid = neg_a > -jnp.inf
    dup = jnp.any((idx_b[:, :, None] == idx_a[:, None, :])
                  & a_valid[:, None, :], axis=-1)
    neg_b = jnp.where(dup, -jnp.inf, neg_b)

    ka = neg_a.shape[1]
    kb = neg_b.shape[1]
    # output rank of a[i] = i + |{j : b[j] > a[i]}|   (ties → a first)
    b_gt_a = jnp.sum((neg_b[:, None, :] > neg_a[:, :, None]), axis=2)
    pos_a = jax.lax.broadcasted_iota(jnp.int32, neg_a.shape, 1) + b_gt_a
    # b may have lost sortedness to dedup: recompute its internal rank
    # with an index tiebreak, then add |{i : a[i] >= b[j]}|
    jj = jax.lax.broadcasted_iota(jnp.int32, (kb, kb), 0)
    jj2 = jax.lax.broadcasted_iota(jnp.int32, (kb, kb), 1)
    b_rank = jnp.sum((neg_b[:, :, None] < neg_b[:, None, :])
                     | ((neg_b[:, :, None] == neg_b[:, None, :])
                        & (jj2 < jj)[None]), axis=2)
    a_ge_b = jnp.sum((neg_a[:, None, :] >= neg_b[:, :, None]), axis=2)
    pos_b = b_rank + a_ge_b

    # place into the k output slots, one slot at a time: peak memory
    # stays O(N·k) (an (N, k, k) one-hot formulation allocated 18 GB at
    # 8M points and OOM'd the chip)
    b_valid = neg_b > -jnp.inf
    a_fin = jnp.where(a_valid, neg_a, 0.0)
    b_fin = jnp.where(b_valid, neg_b, 0.0)
    neg_cols = []
    idx_cols = []
    pts_cols = []
    for s in range(k):
        in_a = (pos_a == s) & a_valid
        in_b = (pos_b == s) & b_valid
        val = jnp.sum(jnp.where(in_a, a_fin, 0.0), axis=1) \
            + jnp.sum(jnp.where(in_b, b_fin, 0.0), axis=1)
        filled = jnp.any(in_a, axis=1) | jnp.any(in_b, axis=1)
        neg_cols.append(jnp.where(filled, val, -jnp.inf))
        idx_cols.append(jnp.sum(jnp.where(in_a, idx_a, 0), axis=1)
                        + jnp.sum(jnp.where(in_b, idx_b, 0), axis=1))
        if pts_a is not None:
            pts_cols.append(
                jnp.sum(jnp.where(in_a[..., None], pts_a, 0.0), axis=1)
                + jnp.sum(jnp.where(in_b[..., None], pts_b, 0.0), axis=1))
    out_neg = jnp.stack(neg_cols, axis=1)
    out_idx = jnp.stack(idx_cols, axis=1)
    if pts_a is not None:
        return out_neg, out_idx, jnp.stack(pts_cols, axis=1)
    return out_neg, out_idx


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "n_passes", "recall_target",
                              "exclude_self", "window", "backend",
                              "return_points"))
def knn_window(points: jnp.ndarray, mask: jnp.ndarray, k: int, *,
               tile: int = 256, n_passes: int = 2, window: int = 1,
               recall_target: float = 0.95,
               exclude_self: bool = False,
               backend: str = "auto",
               return_points: bool = False):
    """Approximate self-kNN via Morton-order sliding windows.

    The TPU-native large-N design (no tree, no hash, no random gather):
    1. sort points along a Z-order curve (one device sort);
    2. tile the sorted array; each tile's candidate set is itself plus
       its left/right neighbor tiles — **dense shifted views**, so the
       distance computation is one batched (tile × 3·tile) matmul on
       the MXU per tile, all tiles in parallel;
    3. repeat with a shifted/axis-rolled curve per pass and merge with
       row dedup — points split across a curve discontinuity in one
       pass are contiguous in another.

    Recall is typically >95% at k≈10 with 2 passes on scan-like data
    (exactness tests use ``knn``; this is the bench/normals fast path,
    mirroring how the reference pairs its KD-tree with SIMD brute force).
    """
    from . import morton

    n = points.shape[0]
    points = points.astype(jnp.float32)
    best_neg = jnp.full((n, k), -jnp.inf, jnp.float32)
    best_idx = jnp.zeros((n, k), jnp.int32)

    # the fused Pallas tile kernel covers the default configuration
    # (window=1, self included); other configs use the XLA path
    use_pallas = (backend == "pallas"
                  or (backend == "auto"
                      and jax.default_backend() == "tpu")) \
        and window == 1
    if return_points:
        if window != 1:
            raise ValueError("return_points requires window=1 "
                             "(pallas kernel path)")
        use_pallas = True  # coordinate output rides the pallas kernel
    best_pts = (jnp.zeros((n, k, 3), jnp.float32) if return_points
                else None)

    for p in range(n_passes):
        keys = morton.morton_keys(points, mask, pass_index=p)
        _, perm = jax.lax.sort(
            (keys, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        sp = points[perm]
        sv = mask[perm]

        n_pad = padding.round_up(n, tile)
        if n_pad != n:
            sp = jnp.pad(sp, ((0, n_pad - n), (0, 0)))
            sv = jnp.pad(sv, (0, n_pad - n))
            perm_p = jnp.pad(perm, (0, n_pad - n))
        else:
            perm_p = perm
        t = n_pad // tile

        if use_pallas:
            from ..kernels.knn_pallas import knn_window_tiles
            kk = min(k, 3 * tile)
            out = knn_window_tiles(
                sp.T, sv.astype(jnp.float32)[None, :],
                perm_p[None, :], kk, tile,
                interpret=jax.default_backend() != "tpu",
                with_coords=return_points, exclude_self=exclude_self)
            negT, idxT = out[0], out[1]
            pass_neg = negT.T[:n]                   # (n, kk) sorted order
            pass_idx = idxT.T[:n]
            # original order via inverse-permutation ROW gathers — (N, k)
            # scatters measured ~90 ms each at 1M, row gathers ~free
            _, posof = jax.lax.sort(
                (perm, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
            orig_neg = pass_neg[posof]
            orig_idx = pass_idx[posof]
            orig_pts = None
            if return_points:
                crd = out[2].T[:n].reshape(n, kk, 3)
                orig_pts = crd[posof]
            if p == 0 and kk == k:
                best_neg, best_idx = orig_neg, orig_idx
                best_pts = orig_pts if return_points else best_pts
            elif return_points:
                best_neg, best_idx, best_pts = _merge_topk(
                    best_neg, best_idx, orig_neg, orig_idx, k,
                    best_pts, orig_pts)
            else:
                best_neg, best_idx = _merge_topk(best_neg, best_idx,
                                                 orig_neg, orig_idx, k)
            continue

        sp_t = sp.reshape(t, tile, 3)
        sv_t = sv.reshape(t, tile)
        perm_t = perm_p.reshape(t, tile)

        shifts = list(range(window, 0, -1)) + [0] + \
            [-s for s in range(1, window + 1)]
        cand = jnp.concatenate([jnp.roll(sp_t, s, 0) for s in shifts], axis=1)
        cand_v = jnp.concatenate([jnp.roll(sv_t, s, 0) for s in shifts],
                                 axis=1)

        # exact f32 distances via elementwise expansion — same math as
        # the pallas kernel, no matmul-cancellation error, and XLA fuses
        # the three squares into the top-k producer
        diff_x = sp_t[:, :, None, 0] - cand[:, None, :, 0]
        diff_y = sp_t[:, :, None, 1] - cand[:, None, :, 1]
        diff_z = sp_t[:, :, None, 2] - cand[:, None, :, 2]
        d2 = diff_x * diff_x + diff_y * diff_y + diff_z * diff_z
        neg = jnp.where(cand_v[:, None, :], -d2, -jnp.inf)
        if exclude_self:
            # self sits at window-offset `window·tile + row` in its own tile
            row = jax.lax.broadcasted_iota(jnp.int32, (t, tile), 1)
            self_pos = window * tile + row
            col = jax.lax.broadcasted_iota(jnp.int32, neg.shape, 2)
            neg = jnp.where(col == self_pos[..., None], -jnp.inf, neg)

        kk = min(k, neg.shape[-1])
        if recall_target < 1.0:
            top_neg, pos = jax.lax.approx_max_k(neg, kk,
                                                recall_target=recall_target)
        else:
            top_neg, pos = jax.lax.top_k(neg, kk)
        # map window position → sorted-array position → original index,
        # via modular arithmetic + one (N, k) gather (NOT a (t, tile,
        # W·tile) index tensor, which would dwarf the distance matrix)
        tile_id = jax.lax.broadcasted_iota(jnp.int32, pos.shape, 0)
        sorted_pos = (tile_id * tile - window * tile + pos) % n_pad
        top_idx = perm_p[sorted_pos]
        pass_neg = top_neg.reshape(n_pad, kk)[:n]
        pass_idx = top_idx.reshape(n_pad, kk)[:n]
        # back to original point order (inverse-perm row gather, not a
        # scatter — see the pallas branch above)
        _, posof = jax.lax.sort(
            (perm, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        orig_neg = pass_neg[posof]
        orig_idx = pass_idx[posof]

        if p == 0 and kk == k:
            best_neg, best_idx = orig_neg, orig_idx
        else:
            best_neg, best_idx = _merge_topk(best_neg, best_idx,
                                             orig_neg, orig_idx, k)

    d2 = -best_neg
    valid = jnp.isfinite(d2) & mask[:, None]
    dist = jnp.sqrt(jnp.where(valid, d2, jnp.inf))
    result = KnnResult(jnp.clip(best_idx, 0, n - 1),
                       jnp.where(valid, dist, jnp.inf), valid)
    if return_points:
        return result, best_pts
    return result


@functools.partial(jax.jit, static_argnames=("k", "tile", "n_passes"))
def knn_window_sorted(points: jnp.ndarray, mask: jnp.ndarray, k: int, *,
                      tile: int = 128, n_passes: int = 2):
    """Self-kNN with results left in first-pass sorted order.

    The profiler showed the order-restoring ``.at[perm].set`` scatters
    of `knn_window` cost ~90 ms EACH at 1M×k=10 (4 of them = 2/3 of the
    whole normals pipeline), while device sorts are ~1.5 ms. This
    variant never scatters:

    * pass A: one 5-operand sort carries (x, y, z, original-id) along
      with the key — no permutation gather either;
    * pass B: sorts the PASS-A arrays by the pass-B key with the pass-A
      row index as payload, so the kernel's id output is already a
      pass-A row reference; realignment back to pass-A order is one
      cheap sort-based inverse + row gather;
    * the caller receives (neg (N,k), ids_orig (N,k), sorted points
      (N,3), sorted mask, perm_a) all in pass-A order and scatters only
      its final small per-point outputs.
    """
    from . import morton
    from ..kernels.knn_pallas import knn_window_tiles

    n = points.shape[0]
    n_pad = padding.round_up(n, tile)
    pts = points.astype(jnp.float32)
    if n_pad != n:
        pts = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
        mask = jnp.pad(mask, (0, n_pad - n))
    interp = jax.default_backend() != "tpu"

    # ---- pass A: sort with coordinate payloads --------------------------
    keys_a = morton.morton_keys(pts, mask, pass_index=0)
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    _, ax, ay, az, am, perm_a = jax.lax.sort(
        (keys_a, pts[:, 0], pts[:, 1], pts[:, 2],
         mask.astype(jnp.float32), iota), num_keys=1)
    pts_a = jnp.stack([ax, ay, az], axis=0)          # (3, n_pad)
    neg, ids = knn_window_tiles(pts_a, am[None, :], perm_a[None, :],
                                k, tile, interpret=interp)
    best_neg = neg.T                                  # (n_pad, k) pass-A order
    best_idx = ids.T                                  # original-space ids

    # ---- further passes: realign by row gather (no scatters).
    # NOTE: carrying the 2k best_neg/best_idx columns through the
    # pass-B sort as payloads (the trick the k=1 ICP path uses) is
    # runtime-equivalent here but blew XLA compile time past 25 min at
    # 26 sort operands — (N, k) row gathers of ~40-byte rows are the
    # pragmatic reorder at k≈10.
    pts_a_rows = jnp.stack([ax, ay, az], axis=1)      # (n_pad, 3)
    for p in range(1, n_passes):
        keys_b = morton.morton_keys(pts_a_rows, am > 0.5, pass_index=p)
        _, bx, by, bz, bm, bid, row_a = jax.lax.sort(
            (keys_b, ax, ay, az, am, perm_a, iota), num_keys=1)
        pts_b = jnp.stack([bx, by, bz], axis=0)
        neg_b, ids_b = knn_window_tiles(pts_b, bm[None, :], bid[None, :],
                                        k, tile, interpret=interp)
        # inverse of row_a (pass-A row → pass-B row) via one more sort
        _, inv_b = jax.lax.sort((row_a, iota), num_keys=1)
        neg_b_a = neg_b.T[inv_b]                      # row gathers
        ids_b_a = ids_b.T[inv_b]
        best_neg, best_idx = _merge_topk(best_neg, best_idx,
                                         neg_b_a, ids_b_a, k)

    return best_neg, best_idx, pts_a_rows, am > 0.5, perm_a


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "n_passes"))
def knn_window_cross(db_points: jnp.ndarray, db_mask: jnp.ndarray,
                     queries: jnp.ndarray, query_mask: Optional[jnp.ndarray],
                     k: int = 1, *, tile: int = 256,
                     n_passes: int = 2) -> KnnResult:
    """Approximate cross-set kNN via a Morton sort of the UNION.

    Sort database and query points together along the curve; each query
    row's window then contains its spatially-near database points, with
    database membership as the candidate validity mask. This is the
    large-N correspondence search for ICP (top-1 per iteration): the
    union re-sort is ~1 ms at 1M points, so it can run *inside* the ICP
    while_loop every iteration.
    """
    from . import morton
    from ..kernels.knn_pallas import knn_window_tiles

    n_db = db_points.shape[0]
    n_q = queries.shape[0]
    pts = jnp.concatenate([db_points.astype(jnp.float32),
                           queries.astype(jnp.float32)], axis=0)
    is_db = jnp.concatenate([db_mask,
                             jnp.zeros((n_q,), bool)], axis=0)
    any_valid = jnp.concatenate([
        db_mask, query_mask if query_mask is not None
        else jnp.ones((n_q,), bool)], axis=0)
    n = n_db + n_q

    best_neg = jnp.full((n_q, k), -jnp.inf, jnp.float32)
    best_idx = jnp.zeros((n_q, k), jnp.int32)

    for p in range(n_passes):
        keys = morton.morton_keys(pts, any_valid, pass_index=p)
        _, perm = jax.lax.sort(
            (keys, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        sp = pts[perm]
        s_isdb = is_db[perm]

        n_pad = padding.round_up(n, tile)
        if n_pad != n:
            sp = jnp.pad(sp, ((0, n_pad - n), (0, 0)))
            s_isdb = jnp.pad(s_isdb, (0, n_pad - n))
            perm_p = jnp.pad(perm, (0, n_pad - n))
        else:
            perm_p = perm

        negT, idxT = knn_window_tiles(
            sp.T, s_isdb.astype(jnp.float32)[None, :],
            perm_p[None, :], min(k, 3 * tile), tile,
            interpret=jax.default_backend() != "tpu")
        pass_neg = negT.T[:n]
        pass_idx = idxT.T[:n]
        # keep only query rows, addressed by original query index —
        # inverse-perm row gather (scatters measured ~90 ms at 1M)
        _, posof = jax.lax.sort(
            (perm, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        q_neg = pass_neg[posof[n_db:]]
        q_idx = pass_idx[posof[n_db:]]
        if p == 0:
            best_neg, best_idx = q_neg, q_idx
        else:
            best_neg, best_idx = _merge_topk(best_neg, best_idx,
                                             q_neg, q_idx, k)

    d2 = -best_neg
    valid = jnp.isfinite(d2)
    if query_mask is not None:
        valid = valid & query_mask[:, None]
    dist = jnp.sqrt(jnp.where(valid, d2, jnp.inf))
    return KnnResult(jnp.clip(best_idx, 0, n_db - 1),
                     jnp.where(valid, dist, jnp.inf), valid)


# ---------------------------------------------------------------------------
# Object-style wrappers mirroring the reference trait surface
# ---------------------------------------------------------------------------

class BruteForceSearch:
    """NearestNeighborSearch impl (traits.rs:541-547) over a PointCloud.

    The name keeps the reference taxonomy (nearest_neighbor.rs:327-387);
    on TPU the "brute force" path *is* the fast path because it is a
    matmul.
    """

    def __init__(self, cloud: PointCloud):
        self.cloud = cloud

    def find_k_nearest(self, queries, k: int, **kw) -> KnnResult:
        queries = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        return knn(self.cloud.points, self.cloud.mask, queries, None, k, **kw)

    def find_radius_neighbors(self, queries, radius: float,
                              max_neighbors: int = 64, **kw) -> KnnResult:
        queries = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        return radius_neighbors(self.cloud.points, self.cloud.mask, queries,
                                None, radius, max_neighbors, **kw)


# The reference exposes `KdTree` as the primary index type; we keep the
# name as an alias so ported user code works, but the implementation is
# the blockwise matmul search (there is no tree on a TPU).
KdTree = BruteForceSearch
