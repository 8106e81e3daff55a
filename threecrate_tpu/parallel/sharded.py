"""Mesh-sharded kernels: ring kNN correspondence and distributed ICP.

The scaling layer the reference never had (SURVEY §2.10/§5): giant
clouds shard over the N-points axis of a 1-D device mesh. Neighbor
search against a sharded database is a **ring pass**: each device keeps
its query shard resident and rotates database shards around the ring
with ``ppermute``, merging a running top-k — structurally identical to
ring attention, with distance tiles in place of logits. Global
reductions (Kabsch cross-covariance, MSE, outlier statistics) are
``psum`` over the same axis, riding ICI.

Everything here is written *inside* ``shard_map`` bodies, jitted over a
``Mesh`` from ``parallel.mesh``. On one device it degrades to the local
kernels (the ring has a single link).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.transform import se3_exp
from ..ops import linalg
from .mesh import POINTS_AXIS


# ---------------------------------------------------------------------------
# in-shard_map building blocks
# ---------------------------------------------------------------------------

def _local_topk_merge(best_neg, best_pts, best_idx, q, db, db_mask,
                      idx_offset, k):
    """Merge (query-shard × db-shard) distances into the running top-k.

    Carries the best candidate *coordinates* alongside indices so the
    ring never needs a second gather pass to fetch matched points.
    """
    qn = jnp.sum(q * q, axis=-1)
    pn = jnp.sum(db * db, axis=-1)
    cross = jax.lax.dot_general(
        q, db, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(qn[:, None] + pn[None, :] - 2.0 * cross, 0.0)
    neg = jnp.where(db_mask[None, :], -d2, -jnp.inf)
    idx = idx_offset + jax.lax.broadcasted_iota(jnp.int32, neg.shape, 1)

    cand_neg = jnp.concatenate([best_neg, neg], axis=1)
    top_neg, pos = jax.lax.top_k(cand_neg, k)
    # gather merged candidate points/indices
    m = best_neg.shape[1]
    from_old = pos < m
    old_pos = jnp.minimum(pos, m - 1)
    new_pos = jnp.clip(pos - m, 0, neg.shape[1] - 1)
    pts_new = db[new_pos]                       # (Q, k, 3)
    pts_old = jnp.take_along_axis(best_pts, old_pos[..., None], axis=1)
    idx_new = jnp.take_along_axis(idx, new_pos, axis=1)
    idx_old = jnp.take_along_axis(best_idx, old_pos, axis=1)
    out_pts = jnp.where(from_old[..., None], pts_old, pts_new)
    out_idx = jnp.where(from_old, idx_old, idx_new)
    return top_neg, out_pts, out_idx


def ring_knn_local(q, db_shard, db_mask_shard, k, axis_name=POINTS_AXIS):
    """Ring all-shards kNN; call inside shard_map.

    q: (Qs, 3) local query shard. db_shard: (Ns, 3) local database
    shard. Returns (neg_sq_dist (Qs,k), matched points (Qs,k,3), global
    indices (Qs,k)).
    """
    nd = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    shard_size = db_shard.shape[0]
    nq = q.shape[0]

    init = (jnp.full((nq, k), -jnp.inf, jnp.float32),
            jnp.zeros((nq, k, 3), jnp.float32),
            jnp.zeros((nq, k), jnp.int32),
            db_shard, db_mask_shard)
    perm = [(i, (i + 1) % nd) for i in range(nd)]

    def body(step, carry):
        best_neg, best_pts, best_idx, cur_db, cur_mask = carry
        src_dev = (me - step) % nd           # owner of the shard we hold
        best_neg, best_pts, best_idx = _local_topk_merge(
            best_neg, best_pts, best_idx, q, cur_db, cur_mask,
            src_dev * shard_size, k)
        cur_db = jax.lax.ppermute(cur_db, axis_name, perm)
        cur_mask = jax.lax.ppermute(cur_mask, axis_name, perm)
        return (best_neg, best_pts, best_idx, cur_db, cur_mask)

    best_neg, best_pts, best_idx, _, _ = jax.lax.fori_loop(
        0, nd, body, init)
    return best_neg, best_pts, best_idx


def _distributed_kabsch(moved, matched, w, axis_name):
    """Weighted Kabsch with psum-reduced moments (two-pass, stable)."""
    wsum = jax.lax.psum(jnp.sum(w), axis_name)
    wsum = jnp.maximum(wsum, 1e-12)
    mu_s = jax.lax.psum(jnp.sum(moved * w[:, None], 0), axis_name) / wsum
    mu_t = jax.lax.psum(jnp.sum(matched * w[:, None], 0), axis_name) / wsum
    ds = moved - mu_s
    dt = matched - mu_t
    h_local = jnp.einsum("ni,nj,n->ij", ds, dt, w,
                         precision=jax.lax.Precision.HIGHEST)
    h = jax.lax.psum(h_local, axis_name)
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(
        jnp.matmul(vt.T, u.T, precision=jax.lax.Precision.HIGHEST)))
    diag = jnp.diag(jnp.array([1.0, 1.0, 1.0], moved.dtype)).at[2, 2].set(d)
    r = jnp.matmul(jnp.matmul(vt.T, diag, precision=jax.lax.Precision.HIGHEST),
                   u.T, precision=jax.lax.Precision.HIGHEST)
    t = mu_t - jnp.matmul(r, mu_s, precision=jax.lax.Precision.HIGHEST)
    m = jnp.eye(4, dtype=moved.dtype)
    m = m.at[:3, :3].set(r)
    m = m.at[:3, 3].set(t)
    return m, wsum


def icp_sharded_step(src, src_mask, tgt, tgt_mask, t_mat, max_corr_dist,
                     axis_name=POINTS_AXIS):
    """One distributed ICP iteration (call inside shard_map):
    ring top-1 correspondence + psum Kabsch. Returns (delta, mse, n_corr)."""
    moved = linalg.transform_points(t_mat, src)
    neg, pts, _ = ring_knn_local(moved, tgt, tgt_mask, 1, axis_name)
    dist = jnp.sqrt(jnp.maximum(-neg[:, 0], 0.0))
    ok = jnp.isfinite(dist) & src_mask & (dist <= max_corr_dist)
    w = ok.astype(jnp.float32)
    matched = pts[:, 0]
    delta, wsum = _distributed_kabsch(moved, matched, w, axis_name)
    sq = jnp.where(ok, dist * dist, 0.0)
    mse = jax.lax.psum(jnp.sum(sq), axis_name) / wsum
    n_corr = jax.lax.psum(jnp.sum(ok.astype(jnp.int32)), axis_name)
    return delta, mse, n_corr


def icp_sharded_loop(src, src_mask, tgt, tgt_mask, init, max_iterations,
                     conv_thresh, max_corr_dist, axis_name=POINTS_AXIS):
    """Full distributed ICP fixed-point loop (inside shard_map)."""
    def cond(state):
        _, _, _, it, conv = state
        return (it < max_iterations) & (~conv)

    def body(state):
        t_mat, _, mse, it, conv = state
        delta, new_mse, _ = icp_sharded_step(
            src, src_mask, tgt, tgt_mask, t_mat, max_corr_dist, axis_name)
        converged = jnp.abs(new_mse - mse) < conv_thresh
        new_t = jnp.matmul(delta, t_mat,
                           precision=jax.lax.Precision.HIGHEST)
        return (new_t, mse, new_mse, it + 1, converged)

    state0 = (init, jnp.float32(jnp.inf), jnp.float32(jnp.inf),
              jnp.int32(0), jnp.bool_(False))
    t_mat, _, mse, it, conv = jax.lax.while_loop(cond, body, state0)
    return t_mat, mse, it, conv


def global_stats_local(values, mask, axis_name=POINTS_AXIS):
    """Distributed mean/σ of a masked per-point quantity — the sharded
    form of statistical_outlier_removal's global statistics
    (filtering.rs:299-309 → one psum)."""
    cnt = jax.lax.psum(jnp.sum(mask.astype(jnp.float32)), axis_name)
    cnt = jnp.maximum(cnt, 1.0)
    mu = jax.lax.psum(jnp.sum(jnp.where(mask, values, 0.0)), axis_name) / cnt
    var = jax.lax.psum(
        jnp.sum(jnp.where(mask, (values - mu) ** 2, 0.0)), axis_name) / cnt
    return mu, jnp.sqrt(var)


# ---------------------------------------------------------------------------
# public jitted entry points over a Mesh
# ---------------------------------------------------------------------------

def ring_match1_local(q, db_shard, db_mask_shard, payload_shard,
                      axis_name: str = POINTS_AXIS):
    """Top-1 ring match carrying a per-target payload; call inside
    shard_map.

    Like ``ring_knn_local(k=1)`` but each database row also carries an
    (Ns, E) payload (target normals for point-to-plane, 6 covariance
    columns for GICP) gathered through the same argmax — the sharded
    analog of the static-sort kernel's payload rows. Returns
    (neg_sq_dist (Qs,), matched points (Qs, 3), payload (Qs, E)).
    """
    nd = jax.lax.axis_size(axis_name)
    nq = q.shape[0]
    e = payload_shard.shape[1]
    qn = jnp.sum(q * q, axis=-1)

    init = (jnp.full((nq,), -jnp.inf, jnp.float32),
            jnp.zeros((nq, 3), jnp.float32),
            jnp.zeros((nq, e), jnp.float32),
            db_shard, db_mask_shard, payload_shard)
    perm = [(i, (i + 1) % nd) for i in range(nd)]

    def body(step, carry):
        best_neg, best_pts, best_pay, cur_db, cur_mask, cur_pay = carry
        pn = jnp.sum(cur_db * cur_db, axis=-1)
        cross = jax.lax.dot_general(
            q, cur_db, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        neg = jnp.where(cur_mask[None, :],
                        -(qn[:, None] + pn[None, :] - 2.0 * cross),
                        -jnp.inf)
        tile_best = jnp.max(neg, axis=1)
        arg = jnp.argmax(neg, axis=1)
        better = tile_best > best_neg
        best_neg = jnp.where(better, tile_best, best_neg)
        best_pts = jnp.where(better[:, None], cur_db[arg], best_pts)
        best_pay = jnp.where(better[:, None], cur_pay[arg], best_pay)
        cur_db = jax.lax.ppermute(cur_db, axis_name, perm)
        cur_mask = jax.lax.ppermute(cur_mask, axis_name, perm)
        cur_pay = jax.lax.ppermute(cur_pay, axis_name, perm)
        return (best_neg, best_pts, best_pay, cur_db, cur_mask, cur_pay)

    best_neg, best_pts, best_pay, _, _, _ = jax.lax.fori_loop(
        0, nd, body, init)
    return best_neg, best_pts, best_pay


def make_sharded_icp_p2plane(mesh: Mesh, max_iterations: int = 20,
                             convergence_threshold: float = 1e-6,
                             max_correspondence_distance: float = jnp.inf,
                             axis_name: str = POINTS_AXIS):
    """Distributed point-to-plane ICP: ring correspondence with target
    normals as payload, psum-reduced Chen & Medioni 6x6 normal
    equations. Inputs: src/mask/tgt/mask/tgt_normals, all sharded on
    axis 0. Returns (transform, mse, iterations, converged) replicated.
    """
    spec_pts = P(axis_name)
    spec_rep = P()
    hi = jax.lax.Precision.HIGHEST

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_pts, spec_pts, spec_pts, spec_pts, spec_pts),
        out_specs=(spec_rep, spec_rep, spec_rep, spec_rep),
        check_vma=False)
    def _run(src, src_mask, tgt, tgt_mask, tgt_normals):
        def cond(state):
            _, _, _, it, conv = state
            return (it < max_iterations) & (~conv)

        def body(state):
            t_mat, _, mse, it, conv = state
            moved = linalg.transform_points(t_mat, src)
            neg, pts, nrm = ring_match1_local(
                moved, tgt, tgt_mask, tgt_normals, axis_name)
            dist = jnp.sqrt(jnp.maximum(-neg, 0.0))
            ok = jnp.isfinite(dist) & src_mask \
                & (dist <= max_correspondence_distance)
            w = ok.astype(jnp.float32)
            r = jnp.sum((moved - pts) * nrm, axis=1)
            a = jnp.concatenate([jnp.cross(moved, nrm), nrm], axis=1)
            aw = a * w[:, None]
            h = jax.lax.psum(jnp.matmul(aw.T, a, precision=hi),
                             axis_name)
            g = jax.lax.psum(-jnp.matmul(aw.T, r, precision=hi),
                             axis_name)
            xi = linalg.solve_psd(h, g, damping=1e-6)
            new_t = jnp.matmul(se3_exp(xi), t_mat, precision=hi)
            n_ok = jnp.maximum(jax.lax.psum(jnp.sum(w), axis_name), 1.0)
            new_mse = jax.lax.psum(
                jnp.sum(jnp.where(ok, r * r, 0.0)), axis_name) / n_ok
            converged = jnp.abs(new_mse - mse) < convergence_threshold
            return (new_t, mse, new_mse, it + 1, converged)

        state0 = (jnp.eye(4, dtype=jnp.float32), jnp.float32(jnp.inf),
                  jnp.float32(jnp.inf), jnp.int32(0), jnp.bool_(False))
        t, _, mse, it, conv = jax.lax.while_loop(cond, body, state0)
        return t, mse, it, conv

    return jax.jit(_run)


def make_sharded_gicp(mesh: Mesh, max_iterations: int = 30,
                      convergence_threshold: float = 1e-6,
                      max_correspondence_distance: float = jnp.inf,
                      k_covariances: int = 20,
                      axis_name: str = POINTS_AXIS):
    """Distributed GICP: per-point covariances computed per shard with
    the ring kNN, then a Gauss-Newton loop whose correspondence carries
    the matched target's 6 covariance columns through the ring and
    whose 6x6 system psum-reduces (the distributed analog of
    ops.gicp._gicp_loop). Inputs: src/mask/tgt/mask sharded; returns
    (transform, mse, iterations, converged) replicated."""
    from ..ops.gicp import _cov_to_cols, _cols_to_cov, _normal_equations
    from ..ops.gicp import inv3x3
    from ..ops import linalg as _lin

    spec_pts = P(axis_name)
    spec_rep = P()
    hi = jax.lax.Precision.HIGHEST
    eps = jnp.float32(1e-4)

    def _shard_covariances(pts, mask):
        # ring kNN against the whole sharded cloud, covariance of the
        # gathered neighbor coordinates (k small, rows local)
        neg, nbr_pts, _ = ring_knn_local(pts, pts, mask, k_covariances,
                                         axis_name)
        okn = jnp.isfinite(neg)
        w = okn.astype(jnp.float32)
        _, cov = _lin.weighted_covariance(nbr_pts, w)
        cov = cov + eps * jnp.eye(3, dtype=cov.dtype)
        enough = jnp.sum(okn, axis=1) >= 4
        return cov, mask & enough

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_pts, spec_pts, spec_pts, spec_pts),
        out_specs=(spec_rep, spec_rep, spec_rep, spec_rep),
        check_vma=False)
    def _run(src, src_mask, tgt, tgt_mask):
        src_cov, src_ok = _shard_covariances(src, src_mask)
        tgt_cov, tgt_ok = _shard_covariances(tgt, tgt_mask)
        tgt_cols = _cov_to_cols(tgt_cov)

        def cond(state):
            _, it, dn, _ = state
            return (it < max_iterations) & (dn >= convergence_threshold)

        def body(state):
            t_mat, it, _, _ = state
            r_mat = t_mat[:3, :3]
            moved = linalg.transform_points(t_mat, src)
            neg, pts, cols = ring_match1_local(
                moved, tgt, tgt_ok, tgt_cols, axis_name)
            dist = jnp.sqrt(jnp.maximum(-neg, 0.0))
            ok = jnp.isfinite(dist) & src_ok \
                & (dist <= max_correspondence_distance)
            w = ok.astype(jnp.float32)
            c_s_rot = jnp.einsum("ij,njk,lk->nil", r_mat, src_cov,
                                 r_mat, precision=hi)
            m = _cols_to_cov(cols) + c_s_rot
            w_mat = inv3x3(m) * w[:, None, None]
            r = moved - pts
            h_l, g_l = _normal_equations(moved, r, w_mat)
            h = jax.lax.psum(h_l, axis_name)
            g = jax.lax.psum(g_l, axis_name)
            xi = -linalg.solve_psd(h, g, damping=1e-6)
            new_t = jnp.matmul(se3_exp(xi), t_mat, precision=hi)
            n_ok = jnp.maximum(jax.lax.psum(jnp.sum(w), axis_name), 1.0)
            mse = jax.lax.psum(
                jnp.sum(jnp.where(ok, jnp.sum(r * r, 1), 0.0)),
                axis_name) / n_ok
            return (new_t, it + 1, jnp.linalg.norm(xi), mse)

        state0 = (jnp.eye(4, dtype=jnp.float32), jnp.int32(0),
                  jnp.float32(jnp.inf), jnp.float32(jnp.inf))
        t, it, dn, mse = jax.lax.while_loop(cond, body, state0)
        return t, mse, it, dn < convergence_threshold

    return jax.jit(_run)


def make_sharded_icp(mesh: Mesh, max_iterations: int = 20,
                     convergence_threshold: float = 1e-6,
                     max_correspondence_distance: float = jnp.inf,
                     axis_name: str = POINTS_AXIS):
    """Build a jitted distributed-ICP callable over ``mesh``.

    Inputs: src/tgt point arrays sharded on axis 0 (+masks); returns
    (transform (4,4) replicated, mse, iterations, converged).
    """
    spec_pts = P(axis_name)
    spec_rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_pts, spec_pts, spec_pts, spec_pts),
        out_specs=(spec_rep, spec_rep, spec_rep, spec_rep),
        check_vma=False)
    def _run(src, src_mask, tgt, tgt_mask):
        t, mse, it, conv = icp_sharded_loop(
            src, src_mask, tgt, tgt_mask,
            jnp.eye(4, dtype=jnp.float32), max_iterations,
            jnp.float32(convergence_threshold),
            jnp.float32(max_correspondence_distance), axis_name)
        return t, mse, it, conv

    return jax.jit(_run)


def make_sharded_batch_icp(mesh: Mesh, max_iterations: int = 20,
                           convergence_threshold: float = 1e-6,
                           max_correspondence_distance: float = jnp.inf,
                           batch_axis: str = "batch",
                           points_axis: str = POINTS_AXIS):
    """Composed parallelism: a 2-D mesh (batch × points).

    Independent cloud pairs shard over the ``batch`` axis (pure data
    parallelism — the reference's BatchICPJob queue, gpu/src/icp.rs:
    134-166, across devices) while each pair's points shard over the
    ``points`` axis with ring correspondence + psum inside. Inputs:
    src/tgt (B, N, 3) and masks (B, N), sharded (batch, points);
    returns per-pair (B, 4, 4) transforms etc., replicated along points.
    """
    spec_in = P(batch_axis, points_axis)
    spec_out = P(batch_axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_in, spec_in, spec_in, spec_in),
        out_specs=(spec_out, spec_out, spec_out, spec_out),
        check_vma=False)
    def _run(src, src_mask, tgt, tgt_mask):
        def one(s, sm, t, tm):
            return icp_sharded_loop(
                s, sm, t, tm, jnp.eye(4, dtype=jnp.float32),
                max_iterations, jnp.float32(convergence_threshold),
                jnp.float32(max_correspondence_distance), points_axis)
        t, mse, it, conv = jax.vmap(one)(src, src_mask, tgt, tgt_mask)
        return t, mse, it, conv

    return jax.jit(_run)


def make_sharded_knn(mesh: Mesh, k: int, axis_name: str = POINTS_AXIS):
    """Jitted ring kNN: queries & database both sharded over the mesh.
    Returns (distances (Q,k), global indices (Q,k)) sharded like the
    queries."""
    spec_pts = P(axis_name)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_pts, spec_pts, spec_pts),
        out_specs=(spec_pts, spec_pts),
        check_vma=False)
    def _run(q, db, db_mask):
        neg, _, idx = ring_knn_local(q, db, db_mask, k, axis_name)
        return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx

    return jax.jit(_run)


def make_sharded_normals(mesh: Mesh, k: int = 10,
                         viewpoint=(0.0, 0.0, 0.0),
                         orient: bool = True,
                         axis_name: str = POINTS_AXIS):
    """Jitted distributed normal estimation over a points-sharded cloud.

    The flagship workload (normals.rs:238-357) at multi-chip scale:
    each device keeps its query shard resident, ring-permutes database
    shards (``ring_knn_local`` carries the matched *coordinates*, so no
    cross-shard gather is ever needed), then fits the tangent plane
    locally — covariance + smallest eigenvector per point, all
    shard-local compute after the ring. Returns unit normals (N, 3)
    sharded like the input (0 rows where masked/degenerate).
    """
    from ..ops.normals import _pca_normals

    spec_pts = P(axis_name)
    vp = jnp.asarray(viewpoint, jnp.float32)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_pts, spec_pts),
        out_specs=spec_pts,
        check_vma=False)
    def _run(pts, mask):
        # k+1 ring-kNN over the same cloud: the self match occupies one
        # column; PCA over the remaining k mirrors the local exact path.
        neg, nbr_pts, _ = ring_knn_local(pts, pts, mask, k + 1, axis_name)
        nbr_ok = neg > -jnp.inf
        normal, _ = _pca_normals(nbr_pts, nbr_ok, pts, vp, orient)
        valid = mask & (jnp.sum(nbr_ok, axis=1) >= 3)
        return jnp.where(valid[:, None], normal, 0.0)

    return jax.jit(_run)


def morton_presort(points, mask, n_devices: int, tile: int = 256):
    """Host-side prep for the fused sharded-normals path: globally
    Morton-sort the cloud and pad so every shard is a contiguous slice
    of the sorted order with size % tile == 0.

    Returns (points (N', 3), mask (N',), perm (N',)) where perm maps
    sorted rows back to input rows (-1 for padding).
    """
    import numpy as np

    from ..ops import morton

    pts = jnp.asarray(points, jnp.float32)
    m = jnp.asarray(mask, bool)
    keys = morton.morton_keys(pts, m, pass_index=0)
    order = np.asarray(jnp.argsort(keys))
    pts_np = np.asarray(pts)[order]
    m_np = np.asarray(m)[order]
    n = pts_np.shape[0]
    unit = n_devices * tile
    n_pad = ((n + unit - 1) // unit) * unit
    pad = n_pad - n
    pts_np = np.pad(pts_np, ((0, pad), (0, 0)))
    m_np = np.pad(m_np, (0, pad))
    perm = np.pad(order.astype(np.int32), (0, pad), constant_values=-1)
    return pts_np, m_np, perm


def _oddeven_block_sort(operands, axis_name: str, n_dev: int,
                        num_keys: int = 1):
    """Globally sort equal-size sorted shard blocks over the mesh axis.

    Block odd-even transposition: ``n_dev`` rounds of pairwise
    neighbor exchange (full-shard ``ppermute`` — fixed shapes, no
    variable-size all-to-all) followed by a local merge-split: the
    lower-ranked partner keeps the lower half of the merged 2s rows.
    The 0-1 principle extends to block merge-split networks, so
    ``n_dev`` rounds guarantee global sortedness. O(n_dev) rounds is
    the right trade below ~16 devices (a bitonic schedule's
    O(log² n_dev) wins beyond; note in docs). Call inside shard_map
    with LOCALLY SORTED operands (first operand = key).
    """
    s = operands[0].shape[0]
    me = jax.lax.axis_index(axis_name)

    for r in range(n_dev):
        start = r % 2
        pairs = [(i, i + 1) for i in range(start, n_dev - 1, 2)]
        if not pairs:
            continue
        perm = [(i, j) for i, j in pairs] + [(j, i) for i, j in pairs]
        received = tuple(jax.lax.ppermute(op, axis_name, perm)
                         for op in operands)
        lowers = jnp.asarray([i for i, _ in pairs])
        uppers = jnp.asarray([j for _, j in pairs])
        is_lower = jnp.any(me == lowers)
        is_upper = jnp.any(me == uppers)
        paired = is_lower | is_upper
        merged = jax.lax.sort(
            tuple(jnp.concatenate([a, b]) for a, b in
                  zip(operands, received)), num_keys=num_keys)
        operands = tuple(
            jnp.where(paired,
                      jnp.where(is_lower, m[:s], m[s:]), op)
            for m, op in zip(merged, operands))
    return operands


def make_distributed_morton_sort(mesh: Mesh, pass_index: int = 0,
                                 axis_name: str = POINTS_AXIS):
    """Jitted distributed Morton sort of an arbitrarily-sharded cloud.

    Returns ``fn(points (N, 3), mask (N,)) -> (points, mask, gid)``
    where the outputs are the globally Morton-sorted cloud as
    contiguous equal shard slices (the ``morton_presort`` layout,
    produced on-device with no host gather) and ``gid`` is each sorted
    row's original global row index (int32) — feed it back through the
    same machinery keyed on gid to restore input order. The lattice
    frame is a pmin/pmax over the mesh axis; invalid rows carry
    INT32_MAX keys and sink to the trailing shards.
    """
    from ..ops import morton

    spec = P(axis_name)
    n_dev = mesh.shape[axis_name]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec, spec),
        check_vma=False)
    def _run(pts, mask):
        s = pts.shape[0]
        me = jax.lax.axis_index(axis_name)
        local_mn = jnp.min(jnp.where(mask[:, None], pts, jnp.inf), 0)
        local_mx = jnp.max(jnp.where(mask[:, None], pts, -jnp.inf), 0)
        mn = jax.lax.pmin(local_mn, axis_name)
        mx = jax.lax.pmax(local_mx, axis_name)
        mn = jnp.where(jnp.isfinite(mn), mn, 0.0)
        mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
        ext = jnp.maximum(mx - mn, 1e-6)
        keys = morton.keys_in_frame_pass(pts, mask, mn, ext, pass_index)
        gid = me.astype(jnp.int32) * s + jnp.arange(s, dtype=jnp.int32)
        ops0 = jax.lax.sort(
            (keys, pts[:, 0], pts[:, 1], pts[:, 2],
             mask.astype(jnp.float32), gid), num_keys=1)
        _, x, y, z, mf, g = _oddeven_block_sort(ops0, axis_name, n_dev)
        return jnp.stack([x, y, z], axis=1), mf > 0.5, g

    return jax.jit(_run)


def make_sharded_normals_window(mesh: Mesh, k: int = 10,
                                viewpoint=(0.0, 0.0, 0.0),
                                orient: bool = True, tile: int = 256,
                                band: int = 16, presorted: bool = False,
                                axis_name: str = POINTS_AXIS):
    """Fused-kernel distributed normals over a points-sharded cloud.

    With ``presorted=False`` (default) the input sharding is
    ARBITRARY: an on-device distributed Morton sort (odd-even block
    rounds over ``ppermute`` — see ``make_distributed_morton_sort``)
    produces the contiguous spatially-sorted layout first, and the
    results are routed back to the input order by a second distributed
    sort keyed on the carried global row id. ``presorted=True`` skips
    both (the round-2 ``morton_presort`` caller contract) and returns
    results in the sorted order.

    Each shard runs the fused window-normals pallas kernel (select +
    covariance + Jacobi eigensolve in VMEM) on its slice, with a
    ONE-TILE HALO exchanged via ``ppermute`` so windows straddling a
    shard boundary see their missing candidates — the halo is exactly
    the neighbouring shard's edge tile because shard slices continue
    the global sorted order. Single-pass quality tier (the 2-pass
    merges need a second global sort order); ~0.5° mean error vs exact
    on scan data — see docs/benchmarks.md.

    Shard size must be a multiple of ``tile`` (pad the global cloud to
    n_devices·tile). Compute per device is O(shard · window) versus
    the ring version's O(shard · cloud).
    """
    from ..kernels.knn_pallas import window_normals_tiles
    from ..ops import morton

    spec_pts = P(axis_name)
    vp = jnp.asarray(viewpoint, jnp.float32)
    n_dev = mesh.shape[axis_name]
    fwd = [(i, i + 1) for i in range(n_dev - 1)]   # send right
    bwd = [(i + 1, i) for i in range(n_dev - 1)]   # send left

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_pts, spec_pts),
        out_specs=(spec_pts, spec_pts),
        check_vma=False)
    def _run(pts, mask):
        s = pts.shape[0]
        me = jax.lax.axis_index(axis_name)
        gid = me.astype(jnp.int32) * s + jnp.arange(s, dtype=jnp.int32)
        if not presorted:
            local_mn = jnp.min(jnp.where(mask[:, None], pts, jnp.inf), 0)
            local_mx = jnp.max(jnp.where(mask[:, None], pts, -jnp.inf), 0)
            mn = jnp.where(jnp.isfinite(jax.lax.pmin(local_mn, axis_name)),
                           jax.lax.pmin(local_mn, axis_name), 0.0)
            mx = jnp.where(jnp.isfinite(jax.lax.pmax(local_mx, axis_name)),
                           jax.lax.pmax(local_mx, axis_name), 0.0)
            ext_f = jnp.maximum(mx - mn, 1e-6)
            keys = morton.keys_in_frame_pass(pts, mask, mn, ext_f, 0)
            ops0 = jax.lax.sort(
                (keys, pts[:, 0], pts[:, 1], pts[:, 2],
                 mask.astype(jnp.float32), gid), num_keys=1)
            _, x, y, z, mf, gid = _oddeven_block_sort(
                ops0, axis_name, n_dev)
            pts = jnp.stack([x, y, z], axis=1)
            mask = mf > 0.5
        mf = mask.astype(jnp.float32)
        # halo: my LAST tile goes right (their left halo), my FIRST
        # tile goes left; absent senders at the ring ends yield zeros
        # (invalid halo — exactly right for the edge shards)
        left_pts = jax.lax.ppermute(pts[-tile:], axis_name, fwd)
        left_mf = jax.lax.ppermute(mf[-tile:], axis_name, fwd)
        right_pts = jax.lax.ppermute(pts[:tile], axis_name, bwd)
        right_mf = jax.lax.ppermute(mf[:tile], axis_name, bwd)
        ext = jnp.concatenate([left_pts, pts, right_pts], axis=0)
        ext_mf = jnp.concatenate([left_mf, mf, right_mf], axis=0)

        interp = jax.default_backend() != "tpu"
        out = window_normals_tiles(ext.T, ext_mf[None, :], k, tile,
                                   interpret=interp, band=band)
        out = out[:, tile:tile + s]                  # drop halo rows
        normal = out[0:3].T
        cnt = out[4]
        valid = mask & (cnt >= 3)
        if orient:
            to_vp = vp[None, :] - pts
            flip = jnp.sum(normal * to_vp, axis=-1) < 0
            normal = jnp.where(flip[:, None], -normal, normal)
        normal = jnp.where(valid[:, None], normal, 0.0)
        if not presorted:
            # route results back to the input order: the same block
            # rounds keyed on gid land rows [d·s, (d+1)·s) on device d
            # in their original positions
            ops1 = jax.lax.sort(
                (gid, normal[:, 0], normal[:, 1], normal[:, 2],
                 valid.astype(jnp.float32)), num_keys=1)
            _, nx, ny, nz, vf = _oddeven_block_sort(
                ops1, axis_name, n_dev)
            normal = jnp.stack([nx, ny, nz], axis=1)
            valid = vf > 0.5
        return normal, valid

    return jax.jit(_run)


def make_sharded_voxel_filter(mesh: Mesh, voxel_size: float,
                              axis_name: str = POINTS_AXIS):
    """Jitted distributed voxel-grid downsample over a points-sharded
    cloud (filtering.rs:103-118 at multi-chip scale).

    Two-level segment reduction: each shard sorts its points by voxel
    key and reduces *relative* coordinates into a local voxel table
    via the scatter-free segmented reverse scan (ops.segmented — the
    per-shard ``segment_sum`` scatters this replaces were the exact
    thing that primitive was built to eliminate on one chip), the
    compacted tables ``all_gather`` along the ring axis, and a
    replicated second merge combines duplicate keys across shards with
    the same scan. Output: (N, 3) centroid array + bool mask, sharded
    like the input (valid centroids packed to the front of shard 0
    onward).
    """
    from ..ops import segmented

    spec_pts = P(axis_name)
    vsize = jnp.float32(voxel_size)
    SENT = jnp.int32(2**31 - 1)

    def _key_sorted_segments(coords3, payload3):
        """Sort rows by (z,y,x) voxel key, scan-reduce the payload over
        key runs, and compact run rows to the front with one stable
        sort. Returns (run keys (n, 3) sentinel-padded, run validity,
        payload sums (n, 3), counts (n,)) in compacted run order —
        invalid rows sink to the end."""
        n = coords3.shape[0]
        ops = (coords3[:, 2], coords3[:, 1], coords3[:, 0],
               payload3[:, 0], payload3[:, 1], payload3[:, 2])
        sz, sy, sx, p0, p1, p2 = jax.lax.sort(ops, num_keys=3)
        skey = jnp.stack([sx, sy, sz], 1)
        svalid = sz != SENT
        head = jnp.any(skey != jnp.roll(skey, 1, axis=0), axis=1)
        head = head.at[0].set(True)
        sums = segmented.sorted_run_sums(
            jnp.stack([p0, p1, p2], axis=1), head, svalid)  # (n, 4)
        comp = jnp.where(head & svalid, jnp.int32(0), jnp.int32(1))
        pos = jnp.arange(n, dtype=jnp.int32)
        _, _, cx, cy, cz, s0, s1, s2, cnt = jax.lax.sort(
            (comp, pos, sx, sy, sz, sums[:, 0], sums[:, 1], sums[:, 2],
             sums[:, 3]), num_keys=2)
        nrun = jnp.sum(head & svalid).astype(jnp.int32)
        run_valid = pos < nrun
        run_keys = jnp.where(run_valid[:, None],
                             jnp.stack([cx, cy, cz], 1), SENT)
        return run_keys, run_valid, jnp.stack([s0, s1, s2], 1), cnt

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_pts, spec_pts),
        out_specs=(spec_pts, spec_pts),
        check_vma=False)
    def _run(pts, mask):
        ns = pts.shape[0]
        nd = jax.lax.axis_size(axis_name)
        me = jax.lax.axis_index(axis_name)
        # global min corner (pmin over the ring) → f32-safe relative sums
        local_mn = jnp.min(jnp.where(mask[:, None], pts, jnp.inf), 0)
        mn = jax.lax.pmin(local_mn, axis_name)
        mn = jnp.where(jnp.isfinite(mn), mn, 0.0)
        rel = pts - mn
        coords = jnp.floor(rel / vsize).astype(jnp.int32)
        coords = jnp.where(mask[:, None], coords, SENT)

        # level 1: local reduce (compression before communication)
        keys1, valid1, sum1, cnt1 = _key_sorted_segments(coords, rel)
        # level 2: all_gather the (ns,·) tables → (nd*ns,·) replicated
        keys_g = jax.lax.all_gather(keys1, axis_name).reshape(nd * ns, 3)
        sums_g = jax.lax.all_gather(sum1, axis_name).reshape(nd * ns, 3)
        cnt_g = jax.lax.all_gather(cnt1, axis_name).reshape(nd * ns)
        # merge duplicate keys across shards: sort + the same segmented
        # scan; payloads are (sum, cnt) so duplicate voxels combine
        # exactly
        n2 = nd * ns
        sz, sy, sx, ssx, ssy, ssz, scnt = jax.lax.sort(
            (keys_g[:, 2], keys_g[:, 1], keys_g[:, 0],
             sums_g[:, 0], sums_g[:, 1], sums_g[:, 2], cnt_g), num_keys=3)
        skey = jnp.stack([sx, sy, sz], 1)
        svalid = sz != SENT
        head = jnp.any(skey != jnp.roll(skey, 1, 0), 1)
        head = head.at[0].set(True)
        from ..ops import segmented
        merged = segmented.sorted_run_sums(
            jnp.stack([ssx, ssy, ssz, scnt], axis=1), head, svalid)
        comp = jnp.where(head & svalid, jnp.int32(0), jnp.int32(1))
        pos2 = jnp.arange(n2, dtype=jnp.int32)
        _, _, m0, m1, m2, mc = jax.lax.sort(
            (comp, pos2, merged[:, 0], merged[:, 1], merged[:, 2],
             merged[:, 3]), num_keys=2)
        msum = jnp.stack([m0, m1, m2], 1)
        nvox = jnp.sum(head & svalid).astype(jnp.int32)
        cent = msum / jnp.maximum(mc, 1.0)[:, None] + mn
        out_mask = jnp.arange(n2) < nvox
        cent = jnp.where(out_mask[:, None], cent, 0.0)
        # emit this device's slice of the merged (replicated) table so
        # the global output is (N, 3) sharded like the input
        start = me * ns
        return (jax.lax.dynamic_slice(cent, (start, 0), (ns, 3)),
                jax.lax.dynamic_slice(out_mask, (start,), (ns,)))

    return jax.jit(_run)


def make_sharded_outlier_stats(mesh: Mesh, k: int,
                               axis_name: str = POINTS_AXIS):
    """Jitted distributed statistical-outlier pass: per-point mean kNN
    distance against the sharded cloud itself, global mean/σ via psum,
    returns the inlier mask (sharded)."""
    spec_pts = P(axis_name)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_pts, spec_pts, spec_rep_f32 := P()),
        out_specs=spec_pts,
        check_vma=False)
    def _run(pts, mask, std_multiplier):
        neg, _, idx = ring_knn_local(pts, pts, mask, k + 1, axis_name)
        d = jnp.sqrt(jnp.maximum(-neg, 0.0))
        # drop the self-match (distance 0 column)
        nd = jnp.where(jnp.isfinite(d), d, 0.0)
        cnt = jnp.sum(jnp.isfinite(d), axis=1) - 1
        mean_d = (jnp.sum(nd, axis=1)) / jnp.maximum(cnt, 1)
        mu, sigma = global_stats_local(mean_d, mask, axis_name)
        return mask & (mean_d <= mu + std_multiplier * sigma)

    return jax.jit(_run)


# ---------------------------------------------------------------------------
# spatially-partitioned TSDF fusion
# ---------------------------------------------------------------------------

class ShardedTsdfState(NamedTuple):
    """Block-sparse TSDF partitioned over a device mesh: device *d*
    owns the x-slab ``bx ∈ [d·gx/D, (d+1)·gx/D)`` of the virtual block
    grid — a contiguous block-key range. All arrays are sharded on
    their leading axis (``max_blocks_per_shard`` rows per device)."""

    block_keys: jnp.ndarray   # (D·mb,) i32 sorted within each shard
    n_blocks: jnp.ndarray     # (D,) i32 allocated count per shard
    tsdf: jnp.ndarray         # (D·mb, (B+1)^3) f32
    weight: jnp.ndarray       # (D·mb, (B+1)^3) f32


class ShardedTsdf(NamedTuple):
    """Factory product of :func:`make_sharded_tsdf`."""

    init: "function"            # () -> ShardedTsdfState
    integrate: "function"       # (state, depth, intr, pose) -> state
    extract_surface: "function" # (state) -> (points (D·rows, 3), mask)
    marching_cubes: "function"  # (state) -> (vertices (D·rows, 3), mask)
    # (state, intr, pose, height, width, ...) -> replicated
    # (depth, vertices, normals, mask, confident) maps
    raycast: "function" = None


def make_sharded_tsdf(mesh: Mesh, grid_blocks: Tuple[int, int, int],
                      voxel_size: float, origin=(0.0, 0.0, 0.0),
                      block: int = 8, max_blocks_per_shard: int = 2048,
                      truncation: Optional[float] = None,
                      update_fraction: float = 0.5,
                      ray_samples: int = 3, max_weight: float = 64.0,
                      min_weight: float = 1.0,
                      axis_name: str = POINTS_AXIS) -> ShardedTsdf:
    """Multi-chip block-sparse TSDF fusion (map scale beyond one chip's
    HBM; the sharded analog of ``ops.tsdf_sparse``, reference
    threecrate-gpu/src/tsdf.rs:83-310 which is single-GPU only).

    The virtual block grid is split into x-slabs — contiguous
    block-key ranges, one per device. Every device receives the full
    (replicated) depth frame, runs the standard ``sparse_integrate``
    restricted to its own key range, and stores only its slab's
    blocks: fusion needs **zero collectives** because the depth image
    is the only shared input. Extraction is per-block and the (B+1)³
    apron layout makes each block self-contained (apron voxels are
    updated with the same projective math as the neighbor's interior —
    bitwise identical), so marching cubes / zero-crossing extraction
    are also collective-free and seamless across slab boundaries.

    Requires ``grid_blocks[0]`` divisible by the mesh axis size.
    """
    from ..ops import tsdf_sparse as _sp

    gx, gy, gz = grid_blocks
    n_dev = mesh.shape[axis_name]
    if gx % n_dev != 0:
        raise ValueError(
            f"grid_blocks[0]={gx} must be divisible by the "
            f"'{axis_name}' mesh axis size {n_dev}")
    slab = gx // n_dev
    mb = max_blocks_per_shard
    s = (block + 1) ** 3
    origin_a = jnp.asarray(origin, jnp.float32)
    vsize = jnp.float32(voxel_size)
    trunc = jnp.float32(truncation if truncation is not None
                        else 4.0 * voxel_size)
    spec = P(axis_name)

    def _local_vol(keys, nb, tsdf, weight):
        return _sp.SparseTsdfVolume(keys, nb[0], tsdf, weight,
                                    origin_a, vsize, trunc, None)

    def _init() -> ShardedTsdfState:
        return ShardedTsdfState(
            block_keys=jnp.full((n_dev * mb,), jnp.int32(2**31 - 1)),
            n_blocks=jnp.zeros((n_dev,), jnp.int32),
            tsdf=jnp.ones((n_dev * mb, s), jnp.float32),
            weight=jnp.zeros((n_dev * mb, s), jnp.float32))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, spec, P(), P(), P()),
        out_specs=(spec, spec, spec, spec),
        check_vma=False)
    def _integrate(keys, nb, tsdf, weight, depth, intr, pose):
        d_idx = jax.lax.axis_index(axis_name)
        lo = d_idx * jnp.int32(slab * gy * gz)
        hi = lo + jnp.int32(slab * gy * gz)
        out = _sp.sparse_integrate(
            _local_vol(keys, nb, tsdf, weight), depth, intr, pose,
            grid_blocks=grid_blocks, block=block,
            ray_samples=ray_samples, max_weight=max_weight,
            update_fraction=update_fraction, key_range=(lo, hi))
        return (out.block_keys, out.n_blocks[None], out.tsdf,
                out.weight)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec,) * 4, out_specs=(spec, spec),
                       check_vma=False)
    def _extract(keys, nb, tsdf, weight):
        sp = _sp.sparse_extract_surface(
            _local_vol(keys, nb, tsdf, weight), grid_blocks,
            block=block, min_weight=min_weight)
        return sp.cloud.points, sp.cloud.mask

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec,) * 4, out_specs=(spec, spec),
                       check_vma=False)
    def _mc(keys, nb, tsdf, weight):
        soup = _sp.sparse_marching_cubes_soup(
            _local_vol(keys, nb, tsdf, weight), grid_blocks,
            block=block, min_weight=min_weight)
        return soup.vertices, jnp.repeat(soup.mask, 3)

    def integrate(st: ShardedTsdfState, depth, intr, pose):
        ks, nb, td, wt = jax.jit(_integrate)(
            st.block_keys, st.n_blocks, st.tsdf, st.weight,
            depth, intr, pose)
        return ShardedTsdfState(ks, nb, td, wt)

    def extract_surface(st: ShardedTsdfState):
        return jax.jit(_extract)(st.block_keys, st.n_blocks, st.tsdf,
                                 st.weight)

    def marching_cubes(st: ShardedTsdfState):
        return jax.jit(_mc)(st.block_keys, st.n_blocks, st.tsdf,
                            st.weight)

    gyz = gy * gz
    int_max = jnp.int32(2 ** 31 - 1)

    def _halo_extend(keys, nb, tsdf, weight):
        """Append the x-neighbors' boundary block layers (one
        ppermute each way) so marches can cross slab boundaries: a
        surface crossing between slab d's last x-layer and slab
        d+1's first lives in blocks owned by DIFFERENT shards, and
        without the halo both of them see a hole there mid-ray
        (measured: vertical stripes of missed hits at every slab
        boundary). Halo keys lie outside the owner's key range, so
        the extended table has no duplicates and one key sort
        restores the sorted-keys invariant."""
        didx = jax.lax.axis_index(axis_name)
        lo = (didx * jnp.int32(slab * gyz)).astype(jnp.int32)
        hi = lo + jnp.int32(slab * gyz)
        n = nb[0]
        idx = jnp.arange(mb, dtype=jnp.int32)
        alloc = idx < n

        def layer(sel):
            okey = jnp.where(sel & alloc, jnp.int32(0), jnp.int32(1))
            _, order = jax.lax.sort((okey, idx), num_keys=1)
            take = order[:gyz]
            cnt = jnp.sum(sel & alloc).astype(jnp.int32)
            k = jnp.where(jnp.arange(gyz) < cnt, keys[take], int_max)
            return k, tsdf[take], weight[take]

        kl, tl, wl = layer(keys < lo + gyz)      # own first x-layer
        kr, tr, wr = layer((keys >= hi - gyz) & (keys < hi))
        perm_up = [(i, i + 1) for i in range(n_dev - 1)]
        perm_dn = [(i, i - 1) for i in range(1, n_dev)]
        # right layer of d-1 arrives as our left halo; left layer of
        # d+1 as our right halo. Unmatched edge receivers are
        # zero-filled by ppermute — zero KEYS would alias block 0, so
        # mask them to the sentinel (weights arrive 0 = unobserved).
        rkl = jax.lax.ppermute(kr, axis_name, perm_up)
        rtl = jax.lax.ppermute(tr, axis_name, perm_up)
        rwl = jax.lax.ppermute(wr, axis_name, perm_up)
        rkr = jax.lax.ppermute(kl, axis_name, perm_dn)
        rtr = jax.lax.ppermute(tl, axis_name, perm_dn)
        rwr = jax.lax.ppermute(wl, axis_name, perm_dn)
        rkl = jnp.where(didx == 0, int_max, rkl)
        rkr = jnp.where(didx == n_dev - 1, int_max, rkr)

        keys_e = jnp.concatenate([keys, rkl, rkr])
        tsdf_e = jnp.concatenate([tsdf, rtl, rtr], axis=0)
        wt_e = jnp.concatenate([weight, rwl, rwr], axis=0)
        slot = jnp.arange(keys_e.shape[0], dtype=jnp.int32)
        keys_s, order = jax.lax.sort((keys_e, slot), num_keys=1)
        n_ext = n + jnp.sum(rkl < int_max) + jnp.sum(rkr < int_max)
        return _sp.SparseTsdfVolume(
            keys_s, n_ext.astype(jnp.int32), tsdf_e[order],
            wt_e[order], origin_a, vsize, trunc, None)

    @functools.lru_cache(maxsize=8)
    def _make_raycast(height, width, near, far, max_steps,
                      coarse_factor):
        from ..ops import tsdf_raycast as _ray

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(spec, spec, spec, spec, P(), P()),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False)
        def _rc(keys, nb, tsdf, weight, intr, pose):
            # each device marches the FULL image against its own slab
            # plus one halo block layer each side (other slabs read as
            # unallocated and are DDA-skipped); any crossing the
            # global march would find lives in some shard's own- or
            # halo-blocks, so the global first hit is exactly the min
            # over per-slab first hits. Refinement and normals are
            # slab-local: the (B+1)³ apron makes boundary blocks
            # self-contained (same argument as sharded extraction).
            res = _ray.sparse_raycast(
                _halo_extend(keys, nb, tsdf, weight), intr, pose,
                height, width, grid_blocks=grid_blocks, block=block,
                near=near, far=far, max_steps=max_steps,
                coarse_factor=coarse_factor, materialize=False)
            t = jnp.where(res.mask, res.depth, jnp.inf)
            tmin = jax.lax.pmin(t, axis_name)
            win = res.mask & (t == tmin)
            didx = jax.lax.axis_index(axis_name)
            wid = jax.lax.pmin(
                jnp.where(win, didx, jnp.int32(2 ** 30)), axis_name)
            winner = win & (didx == wid)      # unique winner per pixel
            depth = jax.lax.psum(jnp.where(winner, res.depth, 0.0),
                                 axis_name)
            pts = jax.lax.psum(
                jnp.where(winner[..., None], res.vertices, 0.0),
                axis_name)
            nrm = jax.lax.psum(
                jnp.where(winner[..., None], res.normals, 0.0),
                axis_name)
            okf = jax.lax.psum(winner.astype(jnp.float32), axis_name)
            conf = jax.lax.psum(
                jnp.where(winner, res.confident.astype(jnp.float32),
                          0.0), axis_name)
            return depth, pts, nrm, okf > 0.0, conf > 0.0

        return jax.jit(_rc)

    def raycast(st: ShardedTsdfState, intr, pose, height: int,
                width: int, near: float = 0.1, far: float = 10.0,
                max_steps: int = 96, coarse_factor: int = 4):
        """Collective-light sharded raycast: per-slab marches + one
        pmin/psum combine; returns replicated
        (depth, vertices, normals, mask, confident) maps."""
        fn = _make_raycast(height, width, float(near), float(far),
                           int(max_steps), int(coarse_factor))
        return fn(st.block_keys, st.n_blocks, st.tsdf, st.weight,
                  intr, pose)

    return ShardedTsdf(_init, integrate, extract_surface,
                       marching_cubes, raycast)


class ShardedFrameToModelOdometry:
    """KinectFusion odometry over a device-mesh-sharded map: the
    x-slab block-sparse TSDF (``make_sharded_tsdf``) is the model,
    frames are tracked against its sharded raycast and fused in
    collective-free. Mirrors ``ops.frame_to_model.FrameToModelOdometry``'s
    ``register_frame`` surface — the map scale is the only difference
    (per-device ``max_blocks_per_shard`` × device count blocks).

    Tracking runs replicated: the combined raycast maps are identical
    on every device, so the single-device projective point-to-plane
    tracker consumes them directly. Depth frames are expected in
    meters (the sharded integrate path does not rescale).
    """

    def __init__(self, mesh: Mesh, intrinsics, height: int, width: int,
                 voxel_size: float = 0.02, origin=(-2.0, -2.0, 0.0),
                 grid_blocks: Tuple[int, int, int] = (32, 32, 32),
                 block: int = 8, max_blocks_per_shard: int = 4096,
                 config=None, axis_name: str = POINTS_AXIS):
        from ..ops.frame_to_model import FrameToModelConfig
        self.config = config or FrameToModelConfig()
        self.height, self.width = height, width
        self.intr = jnp.asarray(
            [intrinsics.fx, intrinsics.fy, intrinsics.cx, intrinsics.cy]
            if hasattr(intrinsics, "fx") else intrinsics, jnp.float32)
        self.fac = make_sharded_tsdf(
            mesh, grid_blocks, voxel_size, origin=origin, block=block,
            max_blocks_per_shard=max_blocks_per_shard,
            update_fraction=self.config.update_fraction,
            axis_name=axis_name)
        self.state = self.fac.init()
        self.pose = jnp.eye(4, dtype=jnp.float32)
        self._prev_delta = jnp.eye(4, dtype=jnp.float32)
        self.n_frames = 0
        self.last_track = None

    def register_frame(self, depth):
        """Track + fuse one depth frame; returns the 4×4 world pose."""
        from ..core.transform import Transform
        from ..ops import frame_to_model as f2m
        from ..ops.tsdf_raycast import RaycastResult
        cfg = self.config
        depth = jnp.asarray(depth)
        if self.n_frames > 0:
            seed = jnp.matmul(self.pose, self._prev_delta,
                              precision=jax.lax.Precision.HIGHEST)
            s = cfg.model_render_scale
            mh, mw = self.height // s, self.width // s
            half = (jnp.float32(s) - 1.0) / 2.0
            mintr = self.intr if s == 1 else jnp.stack(
                [self.intr[0] / s, self.intr[1] / s,
                 (self.intr[2] - half) / s, (self.intr[3] - half) / s])
            maps = self.fac.raycast(self.state, mintr, seed, mh, mw,
                                    near=cfg.near, far=cfg.far,
                                    max_steps=cfg.max_steps)
            model = RaycastResult(*maps)
            ts = cfg.track_stride
            if ts > 1:
                tdepth = depth[::ts, ::ts]
                tintr = jnp.stack(
                    [self.intr[0] / ts, self.intr[1] / ts,
                     self.intr[2] / ts, self.intr[3] / ts])
                min_px = max(1, cfg.min_valid_pixels // (ts * ts))
            else:
                tdepth, tintr = depth, self.intr
                min_px = cfg.min_valid_pixels
            tr = f2m.track(model, seed, tdepth, tintr, seed,
                           max_iterations=cfg.max_iterations,
                           dist_gate=cfg.dist_gate,
                           normal_gate=cfg.normal_gate,
                           min_valid_pixels=min_px,
                           model_intr=mintr)
            self.last_track = tr
            inv_prev = Transform.from_matrix(self.pose).inverse().matrix
            self._prev_delta = jnp.matmul(
                inv_prev, tr.cam_to_world,
                precision=jax.lax.Precision.HIGHEST)
            self.pose = tr.cam_to_world
        self.state = self.fac.integrate(self.state, depth, self.intr,
                                        self.pose)
        self.n_frames += 1
        return self.pose

    def render(self, cam_to_world=None):
        """Sharded raycast of the current map (default: current pose);
        returns replicated (depth, vertices, normals, mask, confident)."""
        pose = self.pose if cam_to_world is None else \
            jnp.asarray(cam_to_world, jnp.float32)
        return self.fac.raycast(self.state, self.intr, pose,
                                self.height, self.width,
                                near=self.config.near,
                                far=self.config.far,
                                max_steps=self.config.max_steps)


# ---------------------------------------------------------------------------
# sharded feature pipeline: FPFH → descriptor matching → global RANSAC
# (VERDICT r3 item 2: global_registration.rs:93-168 at multi-chip scale
# — the O(N·M·33) descriptor matching is exactly a ring matmul)
# ---------------------------------------------------------------------------

def ring_knn_payload_local(q, db_shard, db_mask_shard, payload_shard, k,
                           axis_name: str = POINTS_AXIS):
    """Ring kNN additionally carrying an (S, E) per-row payload through
    the top-k merge (neighbor normals for FPFH's pair features; target
    coordinates for descriptor matching) — no cross-shard gather ever.
    Dimension-agnostic in the db row width: works for 3-d points and
    33-d descriptors alike. Returns (neg_sq_dist (Q,k), db rows
    (Q,k,D), payload (Q,k,E), global row ids (Q,k))."""
    nd = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    s = db_shard.shape[0]
    nq, dd = q.shape[0], db_shard.shape[1]
    e = payload_shard.shape[1]
    qn = jnp.sum(q * q, axis=-1)
    perm = [(i, (i + 1) % nd) for i in range(nd)]

    init = (jnp.full((nq, k), -jnp.inf, jnp.float32),
            jnp.zeros((nq, k, dd), jnp.float32),
            jnp.zeros((nq, k, e), jnp.float32),
            jnp.zeros((nq, k), jnp.int32),
            db_shard, db_mask_shard, payload_shard)

    def body(step, carry):
        (best_neg, best_rows, best_pay, best_idx,
         cur_db, cur_mask, cur_pay) = carry
        src_dev = (me - step) % nd
        pn = jnp.sum(cur_db * cur_db, axis=-1)
        cross = jax.lax.dot_general(
            q, cur_db, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(qn[:, None] + pn[None, :] - 2.0 * cross, 0.0)
        neg = jnp.where(cur_mask[None, :], -d2, -jnp.inf)
        idx = src_dev * s + jax.lax.broadcasted_iota(
            jnp.int32, neg.shape, 1)
        cand_neg = jnp.concatenate([best_neg, neg], axis=1)
        top_neg, pos = jax.lax.top_k(cand_neg, k)
        m = best_neg.shape[1]
        from_old = pos < m
        old_pos = jnp.minimum(pos, m - 1)
        new_pos = jnp.clip(pos - m, 0, neg.shape[1] - 1)
        rows_old = jnp.take_along_axis(best_rows, old_pos[..., None], 1)
        pay_old = jnp.take_along_axis(best_pay, old_pos[..., None], 1)
        idx_old = jnp.take_along_axis(best_idx, old_pos, axis=1)
        best_rows = jnp.where(from_old[..., None], rows_old,
                              cur_db[new_pos])
        best_pay = jnp.where(from_old[..., None], pay_old,
                             cur_pay[new_pos])
        best_idx = jnp.where(from_old, idx_old,
                             jnp.take_along_axis(idx, new_pos, axis=1))
        cur_db = jax.lax.ppermute(cur_db, axis_name, perm)
        cur_mask = jax.lax.ppermute(cur_mask, axis_name, perm)
        cur_pay = jax.lax.ppermute(cur_pay, axis_name, perm)
        return (top_neg, best_rows, best_pay, best_idx,
                cur_db, cur_mask, cur_pay)

    out = jax.lax.fori_loop(0, nd, body, init)
    return out[0], out[1], out[2], out[3]


def ring_gather_rows_local(ids, table_shard, axis_name: str = POINTS_AXIS):
    """Gather GLOBAL rows of a points-sharded table: (Q, k) global ids
    → (Q, k, E) rows. One ring rotation of the table; each step
    resolves the ids that live on the currently-held shard. The
    cross-shard gather FPFH's stage 2 (neighbor SPFH sum) needs."""
    nd = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    s = table_shard.shape[0]
    e = table_shard.shape[-1]
    perm = [(i, (i + 1) % nd) for i in range(nd)]
    out0 = jnp.zeros(ids.shape + (e,), table_shard.dtype)

    def body(step, carry):
        out, cur = carry
        src_dev = (me - step) % nd
        loc = ids - src_dev * s
        inb = (loc >= 0) & (loc < s)
        rows = cur[jnp.clip(loc, 0, s - 1)]
        out = jnp.where(inb[..., None], rows, out)
        cur = jax.lax.ppermute(cur, axis_name, perm)
        return out, cur

    out, _ = jax.lax.fori_loop(0, nd, body, (out0, table_shard))
    return out


def sharded_fpfh_local(pts, mask, nrm, radius, k,
                       axis_name: str = POINTS_AXIS, n_bins: int = 11):
    """FPFH of a points-sharded cloud; call inside shard_map.

    The staged formulation (features.rs:81-256) over two ring passes:

    1. ring kNN over the cloud itself with the NORMALS as payload →
       each query holds its k nearest coordinates + normals locally;
       SPFH (3 concatenated Darboux-angle histograms) is then pure
       shard-local math;
    2. FPFH(p) = SPFH(p) + (1/k)·Σ (1/dᵢ)·SPFH(qᵢ) needs the
       neighbors' SPFH rows — one ring_gather_rows_local of the
       sharded SPFH table by the stage-1 global ids.

    Hard binning (the reference's semantics, features.rs:109-113).
    Returns (descriptors (Qs, 3·n_bins), valid (Qs,)) shard-local.
    """
    from ..ops.features import _hist, pair_features

    r2 = float(radius) * float(radius)
    neg, nbr_pts, nbr_nrm, nbr_idx = ring_knn_payload_local(
        pts, pts, mask, nrm, k + 1, axis_name)
    d2 = jnp.maximum(-neg, 0.0)
    ok = (neg > -jnp.inf) & (d2 <= r2) & (d2 > 1e-18) & mask[:, None]
    w = ok.astype(jnp.float32)
    f1, f2, f3, _ = pair_features(pts[:, None, :], nrm[:, None, :],
                                  nbr_pts, nbr_nrm)
    h1 = _hist(f1, -jnp.pi, jnp.pi, n_bins, w)
    h2 = _hist(f2, -1.0, 1.0, n_bins, w)
    h3 = _hist(f3, -1.0, 1.0, n_bins, w)
    cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    spfh = jnp.concatenate([h1, h2, h3], axis=-1) / cnt     # (Qs, 33)

    nbr_spfh = ring_gather_rows_local(nbr_idx, spfh, axis_name)
    dist = jnp.sqrt(d2)
    inv_d = jnp.where(ok & (dist > 1e-12), 1.0 / jnp.maximum(dist, 1e-12),
                      0.0)
    k_eff = jnp.maximum(jnp.sum(ok, axis=1), 1)[:, None]
    fpfh = spfh + jnp.einsum("nk,nkd->nd", inv_d, nbr_spfh) / k_eff

    out = []
    for b in range(3):
        blk = fpfh[:, b * n_bins:(b + 1) * n_bins]
        ssum = jnp.maximum(jnp.sum(blk, axis=1, keepdims=True), 1e-12)
        out.append(blk / ssum * 100.0)
    desc = jnp.concatenate(out, axis=-1)
    valid = mask & (jnp.sum(ok, axis=1) >= 3)
    return jnp.where(valid[:, None], desc, 0.0), valid


def make_sharded_fpfh(mesh: Mesh, radius: float, k: int = 64,
                      axis_name: str = POINTS_AXIS):
    """Jitted sharded FPFH: points/mask/normals sharded on axis 0 →
    (descriptors (N, 33), valid (N,)) sharded the same way."""
    spec = P(axis_name)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=(spec, spec),
        check_vma=False)
    def _run(pts, mask, nrm):
        return sharded_fpfh_local(pts, mask, nrm, radius, k, axis_name)

    return jax.jit(_run)


def make_sharded_match_descriptors(mesh: Mesh,
                                   axis_name: str = POINTS_AXIS):
    """Jitted sharded descriptor matching (the ring-matmul form of
    global_registration.rs:93-111): source descriptors sharded as
    queries, target descriptors sharded as the ring database, target
    POINTS riding as payload so the caller gets matched coordinates
    without any cross-shard gather. Returns (global index into target,
    distance, ok, matched target xyz), all sharded like the source."""
    spec = P(axis_name)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec),
        check_vma=False)
    def _run(desc_a, valid_a, desc_b, valid_b, tgt_pts):
        neg, _, pay, idx = ring_knn_payload_local(
            desc_a, desc_b, valid_b, tgt_pts, 1, axis_name)
        dist = jnp.sqrt(jnp.maximum(-neg[:, 0], 0.0))
        ok = valid_a & (neg[:, 0] > -jnp.inf)
        return idx[:, 0], jnp.where(ok, dist, jnp.inf), ok, pay[:, 0]

    return jax.jit(_run)


def make_sharded_global_registration(
        mesh: Mesh, fpfh_radius: float = 0.25, k_normals: int = 10,
        k_fpfh: int = 64, distance_threshold: float = 0.05,
        hypotheses_per_device: int = 1024, query_stride: int = 4,
        refine_iterations: int = 15, seed: int = 0,
        axis_name: str = POINTS_AXIS):
    """Jitted sharded FPFH+RANSAC global registration
    (global_registration.rs:27-213 across a device mesh).

    Every heavy stage is sharded: normals (ring kNN), FPFH (two ring
    passes), descriptor matching (ring matmul with target-point
    payload). The correspondence set — every ``query_stride``-th local
    source row, matched — is small, so it is all_gather'd and each
    device then fits + scores an INDEPENDENT batch of RANSAC
    hypotheses (device-folded PRNG); the best count wins via a second
    tiny all_gather. Optional distributed point-to-plane-free p2p ICP
    refinement. Inputs: src/src_mask/tgt/tgt_mask sharded on axis 0.
    Returns (transform (4,4) replicated, inlier count, inlier ratio).
    """
    from ..ops.global_registration import _ransac_batch
    from ..ops.normals import _pca_normals

    spec = P(axis_name)
    spec_rep = P()
    vp = jnp.zeros((3,), jnp.float32)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec_rep, spec_rep, spec_rep),
        check_vma=False)
    def _run(src, src_mask, tgt, tgt_mask):
        me = jax.lax.axis_index(axis_name)

        def normals_of(p, m):
            neg, nbr_pts, _ = ring_knn_local(p, p, m, k_normals + 1,
                                             axis_name)
            nbr_ok = neg > -jnp.inf
            nrm, _ = _pca_normals(nbr_pts, nbr_ok, p, vp, True)
            return nrm

        src_nrm = normals_of(src, src_mask)
        tgt_nrm = normals_of(tgt, tgt_mask)
        src_desc, src_dv = sharded_fpfh_local(
            src, src_mask, src_nrm, fpfh_radius, k_fpfh, axis_name)
        tgt_desc, tgt_dv = sharded_fpfh_local(
            tgt, tgt_mask, tgt_nrm, fpfh_radius, k_fpfh, axis_name)

        # every query_stride-th local source row → the match set
        q_desc = src_desc[::query_stride]
        q_valid = src_dv[::query_stride]
        q_pts = src[::query_stride]
        neg, _, pay, _ = ring_knn_payload_local(
            q_desc, tgt_desc, tgt_dv, tgt, 1, axis_name)
        ok_local = q_valid & (neg[:, 0] > -jnp.inf)
        tgt_match = pay[:, 0]

        # the correspondence set is tiny — gather it everywhere
        sp_all = jax.lax.all_gather(q_pts, axis_name).reshape(-1, 3)
        tp_all = jax.lax.all_gather(tgt_match, axis_name).reshape(-1, 3)
        ok_all = jax.lax.all_gather(ok_local, axis_name).reshape(-1)

        key = jax.random.fold_in(jax.random.PRNGKey(seed), me)
        t_dev, count_dev = _ransac_batch(
            key, sp_all, tp_all, ok_all, hypotheses_per_device,
            jnp.float32(distance_threshold))

        counts = jax.lax.all_gather(count_dev, axis_name)     # (nd,)
        ts = jax.lax.all_gather(t_dev, axis_name)             # (nd,4,4)
        best = jnp.argmax(counts)
        t_best = ts[best]
        n_corr = jnp.maximum(jnp.sum(ok_all), 1)

        if refine_iterations > 0:
            t_best, _, _, _ = icp_sharded_loop(
                src, src_mask, tgt, tgt_mask, t_best,
                refine_iterations, jnp.float32(1e-7),
                jnp.float32(distance_threshold * 2.0), axis_name)

        ratio = counts[best].astype(jnp.float32) / n_corr
        return t_best, counts[best], ratio

    return jax.jit(_run)


def make_sharded_ndt(mesh: Mesh, resolution: float,
                     max_iterations: int = 35, step_size: float = 0.1,
                     epsilon: float = 1e-4, min_points: int = 5,
                     subsample: int = 1, full_iters: int = 2,
                     axis_name: str = POINTS_AXIS):
    """Distributed NDT registration (ndt_registration.rs at multi-chip
    scale; the sharded analog of ``ops.ndt``).

    Build: the per-cell Gaussian moments use the same two-level merge
    as ``make_sharded_voxel_filter`` — each shard sort-reduces
    CELL-CENTER-relative first+second moments of its local target
    points (center-relative sums are shard-independent and f32-safe:
    |c| ≤ cell diagonal), the compact per-shard tables ``all_gather``,
    and one replicated sort+segmented-scan merges duplicate cells
    exactly. The 3×3 eigensolve + regularised inverse runs on each
    device's slice of the merged table only (D-way parallel) and the
    results ``all_gather`` into a replicated cell table — the Newton
    loop then needs ZERO per-iteration communication beyond one
    psum(6×6): every shard scores its own source slice against the
    replicated table by local ``searchsorted``.

    Supports the r4 coarse-phase source stride (``subsample``) —
    applied shard-locally, polish iterations on the full shard.

    Inputs: src/src_mask/tgt/tgt_mask sharded on axis 0, init (4,4)
    replicated. Returns (transform, score, iterations, converged)
    replicated.
    """
    from ..ops import segmented
    from ..ops.gicp import _normal_equations, inv3x3

    spec = P(axis_name)
    rep = P()
    res = jnp.float32(resolution)
    SENT = jnp.int32(2**31 - 1)
    hi = jax.lax.Precision.HIGHEST

    def _cell_moment_table(tgt, tgt_mask, mn, dims, ns, nd):
        """Local sorted-run reduce → all_gather → replicated merge.
        Returns (ukeys (nd·ns,) ascending sentinel-padded,
        sums (nd·ns, 10) = [Σc(3), Σcc(6), cnt])."""
        coords = jnp.floor((tgt - mn) / res).astype(jnp.int32)
        inb = jnp.all((coords >= 0) & (coords < dims), axis=-1)
        key = (coords[..., 2] * dims[1] + coords[..., 1]) * dims[0] \
            + coords[..., 0]
        key = jnp.where(inb & tgt_mask, key, SENT)
        centers = (coords.astype(jnp.float32) + 0.5) * res + mn
        c = jnp.where(tgt_mask[:, None], tgt - centers, 0.0)
        mom = jnp.concatenate([
            c, jnp.stack([c[:, 0] * c[:, 0], c[:, 1] * c[:, 1],
                          c[:, 2] * c[:, 2], c[:, 0] * c[:, 1],
                          c[:, 0] * c[:, 2], c[:, 1] * c[:, 2]],
                         axis=1)], axis=1)            # (ns, 9)
        iota = jnp.arange(ns, dtype=jnp.int32)
        sk, perm = jax.lax.sort((key, iota), num_keys=1)
        smom = mom[perm]                               # 36-B row gather
        svalid = sk != SENT
        head = jnp.concatenate([jnp.ones((1,), bool),
                                sk[1:] != sk[:-1]]) & svalid
        sums = segmented.sorted_run_sums(smom, head, svalid)  # (ns, 10)
        comp = jnp.where(head, jnp.int32(0), jnp.int32(1))
        _, cperm = jax.lax.sort((comp, iota), num_keys=2)
        keys1 = jnp.where(head[cperm], sk[cperm], SENT)
        sums1 = sums[cperm]

        keys_g = jax.lax.all_gather(keys1, axis_name).reshape(nd * ns)
        sums_g = jax.lax.all_gather(sums1, axis_name).reshape(nd * ns,
                                                              10)
        n2 = nd * ns
        iota2 = jnp.arange(n2, dtype=jnp.int32)
        sk2, perm2 = jax.lax.sort((keys_g, iota2), num_keys=1)
        sm2 = sums_g[perm2]
        sval2 = sk2 != SENT
        head2 = jnp.concatenate([jnp.ones((1,), bool),
                                 sk2[1:] != sk2[:-1]]) & sval2
        # one scan over all 10 columns (each scan INSTANCE is minutes
        # of remote compile): cols 0-8 = moments, col 9 = summed point
        # counts; the scan's appended 11th column (rows per run) is
        # dropped
        merged = segmented.sorted_run_sums(sm2, head2, sval2)
        comp2 = jnp.where(head2, jnp.int32(0), jnp.int32(1))
        _, cperm2 = jax.lax.sort((comp2, iota2), num_keys=2)
        ukeys = jnp.where(head2[cperm2], sk2[cperm2], SENT)
        usums = merged[cperm2][:, :10]
        return ukeys, usums

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, spec, rep),
        out_specs=(rep, rep, rep, rep),
        check_vma=False)
    def _run(src, src_mask, tgt, tgt_mask, init):
        nd = jax.lax.axis_size(axis_name)
        me = jax.lax.axis_index(axis_name)
        ns = tgt.shape[0]

        # global grid frame from the target bounding box
        mn = jax.lax.pmin(jnp.min(
            jnp.where(tgt_mask[:, None], tgt, jnp.inf), 0), axis_name)
        mx = jax.lax.pmax(jnp.max(
            jnp.where(tgt_mask[:, None], tgt, -jnp.inf), 0), axis_name)
        mn = jnp.where(jnp.isfinite(mn), mn, 0.0)
        mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
        dims = jnp.maximum(
            jnp.floor((mx - mn) / res).astype(jnp.int32) + 1, 1)

        ukeys, usums = _cell_moment_table(tgt, tgt_mask, mn, dims, ns,
                                          nd)
        n2 = nd * ns

        # per-device slice: means + regularised inverse covariances
        # (the 3×3 eigensolve is the expensive row-wise stage; each
        # device does 1/D of it and the results all_gather back)
        k_lo = me * ns
        keys_s = jax.lax.dynamic_slice(ukeys, (k_lo,), (ns,))
        sums_s = jax.lax.dynamic_slice(usums, (k_lo, 0), (ns, 10))
        cnt = sums_s[:, 9]
        inv_n = 1.0 / jnp.maximum(cnt, 1.0)
        mu = sums_s[:, :3] * inv_n[:, None]     # center-relative mean
        # reconstruct cell centers from the linear key
        kk = jnp.maximum(keys_s, 0)
        cx = kk % dims[0]
        cy = (kk // dims[0]) % dims[1]
        cz = kk // (dims[0] * dims[1])
        centers = (jnp.stack([cx, cy, cz], 1).astype(jnp.float32)
                   + 0.5) * res + mn
        means_s = centers + mu
        denom = jnp.maximum(cnt - 1.0, 1.0)
        cc6 = (sums_s[:, 3:9] - cnt[:, None] * jnp.stack(
            [mu[:, 0] * mu[:, 0], mu[:, 1] * mu[:, 1],
             mu[:, 2] * mu[:, 2], mu[:, 0] * mu[:, 1],
             mu[:, 0] * mu[:, 2], mu[:, 1] * mu[:, 2]],
            axis=1)) / denom[:, None]
        xx, yy, zz, xy, xz, yz = (cc6[:, i] for i in range(6))
        covs = jnp.stack([
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1)], -2)
        vals, vecs = linalg.eigh3x3(covs)
        floor = 0.01 * jnp.maximum(vals[..., 2:3], 1e-9)
        vals_r = jnp.maximum(vals, floor)
        covs_r = jnp.einsum("nij,nj,nkj->nik", vecs, vals_r, vecs)
        inv_s = inv3x3(covs_r)
        valid_s = (cnt >= min_points) & (keys_s != SENT)

        means = jax.lax.all_gather(means_s, axis_name).reshape(n2, 3)
        inv_covs = jax.lax.all_gather(inv_s, axis_name).reshape(n2, 3,
                                                                3)
        cvalid = jax.lax.all_gather(valid_s, axis_name).reshape(n2)

        def score_terms(t_mat, pts, pmask):
            moved = linalg.transform_points(t_mat, pts)
            coords = jnp.floor((moved - mn) / res).astype(jnp.int32)
            inb = jnp.all((coords >= 0) & (coords < dims), axis=-1)
            key = (coords[..., 2] * dims[1] + coords[..., 1]) \
                * dims[0] + coords[..., 0]
            key = jnp.where(inb, key, SENT)
            pos = jnp.searchsorted(ukeys, key).astype(jnp.int32)
            pos = jnp.minimum(pos, n2 - 1)
            found = (ukeys[pos] == key) & (key != SENT)
            ok = found & pmask & cvalid[pos]
            w = ok.astype(jnp.float32)
            d = moved - means[pos]
            b = inv_covs[pos]
            bd = jnp.einsum("nij,nj->ni", b, d)
            q = jnp.sum(d * bd, axis=1)
            s = jnp.exp(-0.5 * jnp.clip(q, 0.0, 50.0)) * w
            w_mat = b * s[:, None, None]
            hess, grad = _normal_equations(moved, d, w_mat)
            return (jax.lax.psum(jnp.sum(s), axis_name),
                    jax.lax.psum(grad, axis_name),
                    jax.lax.psum(hess, axis_name))

        def run_loop(state0, pts, pmask, it_budget):
            def cond(state):
                _, it, dn, _ = state
                return (it < it_budget) & (dn >= epsilon)

            def body(state):
                t_mat, it, _, _ = state
                score, grad, hess = score_terms(t_mat, pts, pmask)
                delta = -linalg.solve_psd(hess, grad, damping=1e-2)
                norm = jnp.linalg.norm(delta)
                scale = jnp.where(
                    norm > step_size,
                    step_size / jnp.maximum(norm, 1e-12), 1.0)
                delta = delta * scale
                new_t = jnp.matmul(se3_exp(delta), t_mat, precision=hi)
                return (new_t, it + 1, jnp.linalg.norm(delta), score)

            return jax.lax.while_loop(cond, body, state0)

        state0 = (init, jnp.int32(0), jnp.float32(jnp.inf),
                  jnp.float32(0.0))
        if subsample > 1 and max_iterations > full_iters:
            t_a, it_a, _, _ = run_loop(state0, src[::subsample],
                                       src_mask[::subsample],
                                       max_iterations - full_iters)
            state_b = (t_a, it_a, jnp.float32(jnp.inf),
                       jnp.float32(0.0))
            t_mat, it, dn, _ = run_loop(state_b, src, src_mask,
                                        max_iterations)
        else:
            t_mat, it, dn, _ = run_loop(state0, src, src_mask,
                                        max_iterations)
        final_score, _, _ = score_terms(t_mat, src, src_mask)
        return t_mat, final_score, it, dn < epsilon

    return jax.jit(_run)


def make_sharded_ground(mesh: Mesh, config=None,
                        axis_name: str = POINTS_AXIS):
    """Distributed Patchwork++ ground segmentation over a
    points-sharded cloud (ground_segmentation.rs:336-407 at multi-chip
    scale; the sharded analog of ``ops.ground.patchwork_plus_plus``).

    Three phases, all collective-light:

    1. **Global (patch, z) sort** — the odd-even block rounds over
       ``ppermute`` (``_oddeven_block_sort`` with ``num_keys=2``)
       place every CZM patch into one globally contiguous, z-ascending
       run. Exact global seed ranks then cost one tiny
       ``all_gather``: global rank = local rank + the same patch's
       element count on lower-indexed devices.
    2. **R-GPF refit loop** — per-patch moments use the two-level
       merge of ``make_sharded_ndt``: each shard sort-reduces
       PATCH-CENTER-relative first+second moments (the static CZM
       patch centroid is shard-independent, unlike the run-head
       centering of the single-device path, and |c| ≤ the patch
       extent keeps the f32 expansion safe), compacts them to a tiny
       ``(P+1, 10)`` table and ``psum``s it. The ~550-row plane fits
       run replicated on every device; the inlier re-selection is
       element-local. One segmented-scan instance total (it lives in
       the ``fori_loop`` body).
    3. **gid sort-back** — a second block sort keyed on the carried
       global row id restores the input sharding and order.

    Inputs: points (N, 3) and mask (N,) sharded on axis 0 (N divisible
    by the mesh size). Returns (ground_mask (N,) sharded like the
    input, patch_valid (P,) replicated, patch_normals (P, 3)
    replicated).

    Seed ties (equal z within a patch) may resolve differently than
    single-device; fits differ only in f32 rounding — tests assert
    >99% mask agreement on the street fixture.
    """
    import numpy as np

    from ..ops import ground as ground_ops, segmented

    if config is None:
        config = ground_ops.PatchworkConfig()
    radii, rings, sectors, base = ground_ops._patch_tables(config)
    n_patches = config.n_patches
    n_zones = len(config.rings_per_zone)
    p1 = n_patches + 1                      # + overflow bucket

    # static CZM patch centroids: ring mid-radius, sector mid-angle,
    # z = -sensor_height — the shard-independent moment origin
    centers_np = np.zeros((p1, 3), np.float32)
    row = 0
    for zi in range(n_zones):
        nr, nsec = int(rings[zi]), int(sectors[zi])
        for ri in range(nr):
            rmid = radii[zi] + (ri + 0.5) * (radii[zi + 1] - radii[zi]) / nr
            for si in range(nsec):
                amid = (si + 0.5) * 2.0 * np.pi / nsec - np.pi
                centers_np[row] = (rmid * np.cos(amid),
                                   rmid * np.sin(amid),
                                   -config.sensor_height)
                row += 1
    centers_const = jnp.asarray(centers_np)

    spec = P(axis_name)
    rep = P()
    n_dev = mesh.shape[axis_name]
    frac = jnp.float32(config.seed_fraction)
    min_seeds = jnp.int32(config.min_seed_points)
    dist_thresh = jnp.float32(config.distance_threshold)
    n_iters = config.num_iterations

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, rep, rep),
        check_vma=False)
    def _run(pts, mask):
        s = pts.shape[0]
        me = jax.lax.axis_index(axis_name)
        pid = ground_ops._patch_ids(
            pts, mask, jnp.asarray(radii), jnp.asarray(rings),
            jnp.asarray(sectors), jnp.asarray(base), n_zones)
        seg = jnp.where(pid >= 0, pid, n_patches)
        gid = me.astype(jnp.int32) * s + jnp.arange(s, dtype=jnp.int32)

        # ---- phase 1: global (patch, z) sort --------------------------
        ops0 = jax.lax.sort(
            (seg, pts[:, 2], pts[:, 0], pts[:, 1], gid), num_keys=2)
        seg_s, z_s, x_s, y_s, gid_s = _oddeven_block_sort(
            ops0, axis_name, n_dev, num_keys=2)
        pts_s = jnp.stack([x_s, y_s, z_s], axis=1)
        valid_s = seg_s < n_patches

        pos = jnp.arange(s, dtype=jnp.int32)
        head = jnp.concatenate([jnp.ones((1,), bool),
                                seg_s[1:] != seg_s[:-1]])
        start_el = jnp.maximum(jax.lax.cummax(jnp.where(head, pos, -1)),
                               0)
        local_rank = pos - start_el

        # local run lengths at head rows (next head position - mine)
        big = jnp.int32(s)
        sp = jnp.where(head, pos, big)
        sp_next = jnp.concatenate([sp[1:], jnp.full((1,), big,
                                                    jnp.int32)])
        next_start = jnp.flip(jax.lax.cummin(jnp.flip(sp_next)))
        len_head = jnp.where(head, next_start - pos, 0)

        # compact head rows to the front ONCE (head layout is fixed for
        # the whole call); kc covers every possible distinct local run
        kc = min(s, p1)
        comp = jnp.where(head, jnp.int32(0), jnp.int32(1))
        _, cperm = jax.lax.sort((comp, pos), num_keys=2)
        cperm_h = cperm[:kc]
        idx_h = jnp.where(head[cperm_h], seg_s[cperm_h], p1)

        cnt_local = jnp.zeros((p1,), jnp.int32).at[idx_h].set(
            len_head[cperm_h], mode="drop")
        cnt_all = jax.lax.all_gather(cnt_local, axis_name)  # (D, P+1)
        dmask = jnp.arange(n_dev) < me
        prior_t = jnp.sum(jnp.where(dmask[:, None], cnt_all, 0), axis=0)
        cnt_tot = jnp.sum(cnt_all, axis=0).astype(jnp.float32)

        rank_g = local_rank + prior_t[seg_s]
        seed_n_t = jnp.maximum((cnt_tot * frac).astype(jnp.int32),
                               min_seeds)
        w_seed = (rank_g < seed_n_t[seg_s]) & valid_s

        # ---- phase 2: R-GPF with psum'd patch moments ------------------
        c = pts_s - centers_const[seg_s]
        mom9 = jnp.concatenate([
            c,
            jnp.stack([c[:, 0] * c[:, 0], c[:, 1] * c[:, 1],
                       c[:, 2] * c[:, 2], c[:, 0] * c[:, 1],
                       c[:, 0] * c[:, 2], c[:, 1] * c[:, 2]],
                      axis=1)], axis=1)

        def fit_planes(w_bool):
            sums = segmented.sorted_run_sums(mom9, head, w_bool)
            tbl = jnp.zeros((p1, 10), jnp.float32).at[idx_h].set(
                sums[cperm_h], mode="drop")
            tbl = jax.lax.psum(tbl, axis_name)
            wsum = tbl[:, 9]
            inv_n = 1.0 / jnp.maximum(wsum, 1.0)
            mu = tbl[:, :3] * inv_n[:, None]
            denom = jnp.maximum(wsum - 1.0, 1.0)
            cc = (tbl[:, 3:9] - wsum[:, None] * jnp.stack(
                [mu[:, 0] * mu[:, 0], mu[:, 1] * mu[:, 1],
                 mu[:, 2] * mu[:, 2], mu[:, 0] * mu[:, 1],
                 mu[:, 0] * mu[:, 2], mu[:, 1] * mu[:, 2]],
                axis=1)) / denom[:, None]
            cov = jnp.stack([
                jnp.stack([cc[:, 0], cc[:, 3], cc[:, 4]], -1),
                jnp.stack([cc[:, 3], cc[:, 1], cc[:, 5]], -1),
                jnp.stack([cc[:, 4], cc[:, 5], cc[:, 2]], -1)], -2)
            mean = centers_const + mu
            nrm, _ = linalg.smallest_eigenvector_sym3x3(cov)
            nrm = jnp.where((nrm[:, 2] < 0)[:, None], -nrm, nrm)
            dplane = -jnp.sum(nrm * mean, axis=1)
            vals = linalg.eigvals_sym3x3(cov)
            return nrm, dplane, mean, vals, wsum

        def body(i, state):
            w_bool, _ = state
            fit = fit_planes(w_bool)
            nrm_t, dp_t = fit[0], fit[1]
            dist = jnp.abs(jnp.sum(pts_s * nrm_t[seg_s], axis=1)
                           + dp_t[seg_s])
            w_new = valid_s & (dist <= dist_thresh)
            w_out = jnp.where(i < n_iters, w_new, w_bool)
            return (w_out, fit)

        zero_fit = (jnp.zeros((p1, 3), jnp.float32),
                    jnp.zeros((p1,), jnp.float32),
                    jnp.zeros((p1, 3), jnp.float32),
                    jnp.zeros((p1, 3), jnp.float32),
                    jnp.zeros((p1,), jnp.float32))
        _, (nrm_t, dp_t, mean_t, vals_t, wsum_t) = jax.lax.fori_loop(
            0, n_iters + 1, body, (w_seed, zero_fit))

        flat = jnp.maximum(vals_t[:, 0], 0.0) / jnp.maximum(
            jnp.sum(vals_t, axis=1), 1e-12)
        ok_t = (cnt_tot >= config.min_patch_points) \
            & (jnp.abs(nrm_t[:, 2]) >= config.uprightness_threshold) \
            & (mean_t[:, 2] <= -config.sensor_height
               + config.elevation_threshold) \
            & (flat <= config.flatness_threshold) \
            & (wsum_t >= 3) \
            & (jnp.arange(p1) < n_patches)

        dist = jnp.abs(jnp.sum(pts_s * nrm_t[seg_s], axis=1)
                       + dp_t[seg_s])
        ground_s = ok_t[seg_s] & (dist <= dist_thresh) & valid_s

        # ---- phase 3: route back to the input order --------------------
        ops1 = jax.lax.sort(
            (gid_s, ground_s.astype(jnp.float32)), num_keys=1)
        _, gf = _oddeven_block_sort(ops1, axis_name, n_dev)
        return gf > 0.5, ok_t[:n_patches], nrm_t[:n_patches]

    return jax.jit(_run)


def make_sharded_clusters(mesh: Mesh, config=None,
                          axis_name: str = POINTS_AXIS):
    """Distributed Euclidean clustering over a points-sharded cloud
    (segmentation.rs:396-460 at multi-chip scale; the sharded analog
    of ``ops.segmentation.extract_euclidean_clusters``).

    Connectivity is the same capped-radius graph as the single-device
    path: one ring kNN pass materialises each point's ``max_neighbors``
    nearest GLOBAL neighbor ids (radius-filtered). Label propagation
    then iterates min-over-neighbors + two pointer-jump rounds until a
    psum'd change flag clears — every step is a ring rotation of the
    tiny (S,) label column (``ring_gather_rows_local``), never a
    cross-shard point gather. Ranking mirrors
    ``segmentation._rank_clusters`` with dense (N,) root-size tables
    built by local scatter-add + ``psum`` (replicated; budget ~3
    int32·N replicated arrays — fine to ~10M points).

    Returns (labels (N,) sharded like the input — cluster id by size
    rank, -1 = noise/filtered; n_clusters scalar; sizes (N,) replicated,
    sizes[i] = size of cluster i). Labels match the single-device path
    exactly when neighbor sets agree (both take the nearest
    ``max_neighbors`` within tolerance; distance ties can differ).
    """
    from ..ops.segmentation import EuclideanClusterConfig

    if config is None:
        config = EuclideanClusterConfig()
    spec = P(axis_name)
    rep = P()
    n_dev = mesh.shape[axis_name]
    tol2 = jnp.float32(config.tolerance) ** 2
    k = config.max_neighbors
    min_sz = jnp.int32(config.min_cluster_size)
    max_sz = jnp.int32(min(config.max_cluster_size, 2 ** 31 - 1))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec), out_specs=(spec, rep, rep),
        check_vma=False)
    def _run(pts, mask):
        s = pts.shape[0]
        n = s * n_dev
        me = jax.lax.axis_index(axis_name)
        gid = me.astype(jnp.int32) * s + jnp.arange(s, dtype=jnp.int32)

        # one ring pass: global ids of the k nearest within tolerance
        neg, _, _, nbr_idx = ring_knn_payload_local(
            pts, pts, mask, jnp.zeros((s, 1), jnp.float32), k,
            axis_name)
        ok = (neg > -jnp.inf) & (-neg <= tol2) & mask[:, None]
        nbr_gids = jnp.where(ok, nbr_idx, gid[:, None])

        def jump(lab, ids):
            got = ring_gather_rows_local(ids[:, None],
                                         lab[:, None], axis_name)
            return got[:, 0, 0]

        def cond(state):
            _, changed, it = state
            return changed & (it < n)

        def body(state):
            labels, _, it = state
            nbr_lab = ring_gather_rows_local(
                nbr_gids, labels[:, None], axis_name)[..., 0]
            new = jnp.minimum(labels, jnp.min(nbr_lab, axis=1))
            new = jnp.where(mask, new, labels)
            new = jump(new, new)
            new = jump(new, new)
            changed = jax.lax.psum(
                jnp.any(new != labels).astype(jnp.int32), axis_name)
            return new, changed > 0, it + 1

        labels0 = jnp.where(mask, gid, jnp.int32(n - 1))
        roots, _, _ = jax.lax.while_loop(
            cond, body, (labels0, jnp.bool_(True), jnp.int32(0)))

        # ranking: dense (N,) tables, scatter-add locally + psum
        sizes_by_root = jax.lax.psum(
            jnp.zeros((n,), jnp.int32).at[
                jnp.where(mask, roots, n - 1)].add(
                    mask.astype(jnp.int32)), axis_name)
        size_of = sizes_by_root[roots]
        keep = mask & (size_of >= min_sz) & (size_of <= max_sz)
        is_root = (gid == roots) & keep
        # root_size[r] = sizes_by_root[r] where r is a kept root else
        # -1: mark kept roots with a psum'd indicator, then read the
        # replicated size table locally
        kept_root = jax.lax.psum(
            jnp.zeros((n,), jnp.int32).at[
                jnp.where(is_root, roots, n - 1)].add(
                    is_root.astype(jnp.int32)), axis_name)
        root_size = jnp.where(kept_root > 0, sizes_by_root, -1)
        order = jnp.argsort(-root_size)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        labels_out = jnp.where(keep, rank[roots], -1)
        n_clusters = jnp.sum(root_size > 0).astype(jnp.int32)
        sizes_ranked = jnp.where(root_size[order] > 0,
                                 root_size[order], 0)
        return labels_out, n_clusters, sizes_ranked

    return jax.jit(_run)


def make_sharded_shot(mesh: Mesh, config=None, variant: str = "shot",
                      axis_name: str = POINTS_AXIS):
    """Distributed SHOT/USC descriptors over a points-sharded cloud
    (features.rs:294-420 at multi-chip scale; the sharded analog of
    ``ops.features.extract_shot_features`` / ``extract_usc_features``
    staged path).

    One ring kNN pass (``ring_knn_payload_local`` with the normals as
    payload) carries each query's ``max_neighbors`` nearest GLOBAL
    neighbor coordinates + normals around the ring — the descriptor
    math then runs fully locally on the gathered (S, k, ·) blocks via
    the shared ``_shot_descriptor_block`` core (same LRF, same
    soft-binned histogram as the staged single-device path). Memory is
    bounded exactly like the staged path: the (B, k, 352) one-hot
    intermediates are mapped over fixed row blocks.

    Inputs: points (N, 3), mask (N,), normals (N, 3), all sharded on
    axis 0. Returns (descriptors (N, 352|128) sharded, valid (N,)
    sharded). Matches the staged path descriptor-for-descriptor when
    neighbor sets agree (both take the nearest ``max_neighbors`` within
    the radius, self excluded; distance ties can differ).
    """
    from ..ops.features import (ShotConfig, USC_DIM,
                                _shot_descriptor_block)

    if config is None:
        config = ShotConfig()
    if variant not in ("shot", "usc"):
        raise ValueError(f"variant must be 'shot' or 'usc', got {variant}")
    spec = P(axis_name)
    radius = jnp.float32(config.radius)
    k = config.max_neighbors
    n_cos = config.n_cos_bins
    dim = 32 * n_cos if variant == "shot" else USC_DIM

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=(spec, spec),
        check_vma=False)
    def _run(pts, mask, normals):
        s = pts.shape[0]
        if mask.shape[0] != s or normals.shape[0] != s:
            raise ValueError(
                "points/mask/normals leading dims differ "
                f"({s}/{mask.shape[0]}/{normals.shape[0]}); note "
                "PointCloud buckets capacity — shard cloud.points/"
                "cloud.mask/cloud.normals, not the raw input array")
        me = jax.lax.axis_index(axis_name)
        gid = me.astype(jnp.int32) * s + jnp.arange(s, dtype=jnp.int32)

        # self rides along as the guaranteed nearest row; ask for one
        # extra and mask it out by global id
        neg, rows, pay, ids = ring_knn_payload_local(
            pts, pts, mask, normals, k + 1, axis_name)
        ok = ((neg > -jnp.inf) & (-neg <= radius * radius)
              & (ids != gid[:, None]) & mask[:, None])
        dist = jnp.sqrt(jnp.maximum(-neg, 0.0))
        dist = jnp.where(ok, dist, radius)      # keep inf out of the core

        block = min(16384, s)
        n_blk = -(-s // block)
        pad = n_blk * block - s

        def blocked(a, fill=0):
            a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                        constant_values=fill)
            return a.reshape((n_blk, block) + a.shape[1:])

        def body(args):
            rows_b, pay_b, ok_b, dist_b, own_b, nrm_b = args
            return _shot_descriptor_block(rows_b, pay_b, ok_b, dist_b,
                                          own_b, nrm_b, radius, n_cos,
                                          variant)

        desc = jax.lax.map(
            body, (blocked(rows), blocked(pay), blocked(ok),
                   blocked(dist, fill=1.0), blocked(pts),
                   blocked(normals))
        ).reshape(n_blk * block, dim)[:s]
        valid = mask & (jnp.sum(ok, axis=1) >= 5)
        return jnp.where(valid[:, None], desc, 0.0), valid

    return jax.jit(_run)


def make_sharded_plane_ransac(mesh: Mesh,
                              distance_threshold: float = 0.01,
                              max_iterations: int = 1000,
                              refine: bool = True,
                              axis_name: str = POINTS_AXIS):
    """Distributed RANSAC plane segmentation over a points-sharded
    cloud (segmentation.rs:117-180 at multi-chip scale; the sharded
    analog of ``ops.segmentation.segment_plane``).

    Each device fits ``ceil(max_iterations / n_dev)`` hypotheses from
    random triples of its LOCAL shard, then one tiny ``all_gather``
    replicates the (H, 4) plane-coefficient table. Scoring is fully
    local — every device counts its own shard's inliers for ALL
    hypotheses in one (S, H) broadcasted distance sweep — and a single
    ``psum`` produces global counts. The winning plane's refinement is
    two moment ``psum``s (mean, then centered covariance) + a
    replicated 3x3 eigensolve; the f32 expansion stays safe because
    the second moment is taken about the psum'd global centroid.

    Hypothesis sampling differs from the single-device path (local
    triples, per-device fold_in streams), so the winning plane can be
    a different — equally valid — RANSAC draw; tests assert plane
    recovery, not draw-for-draw parity. Devices whose shard holds < 3
    valid points contribute no hypotheses.

    Returns a callable ``fn(points, mask, seed=0) ->
    PlaneSegmentationResult`` with the inlier mask sharded like the
    input and the model/count replicated.
    """
    from ..ops.segmentation import PlaneModel, PlaneSegmentationResult

    spec = P(axis_name)
    rep = P()
    n_dev = mesh.shape[axis_name]
    h_local = -(-max_iterations // n_dev)
    thr = jnp.float32(distance_threshold)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, rep), out_specs=(rep, rep, spec, rep),
        check_vma=False)
    def _run(pts, mask, key):
        s = pts.shape[0]
        me = jax.lax.axis_index(axis_name)
        k_local = jax.random.fold_in(key, me)

        # local hypothesis batch from local triples
        w = mask.astype(jnp.float32)
        n_valid = jnp.sum(w)
        enough = n_valid >= 3
        p = jnp.where(enough, w / jnp.maximum(n_valid, 1.0),
                      jnp.full((s,), 1.0 / s, jnp.float32))
        idx = jax.random.choice(k_local, s, shape=(h_local, 3), p=p)
        tri = pts[idx]                                  # (h, 3, 3)
        nrm = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        nn = jnp.linalg.norm(nrm, axis=1, keepdims=True)
        ok_h = (nn[:, 0] > 1e-12) & enough
        nrm = nrm / jnp.maximum(nn, 1e-30)
        d = -jnp.sum(nrm * tri[:, 0], axis=1)
        coef = jnp.concatenate(
            [nrm, d[:, None], ok_h[:, None].astype(jnp.float32)], 1)

        # replicate all hypotheses, score locally, psum the counts
        all_coef = jax.lax.all_gather(coef, axis_name, tiled=True)
        nrm_h, d_h = all_coef[:, :3], all_coef[:, 3]
        ok_all = all_coef[:, 4] > 0.5
        dist = jnp.abs(pts @ nrm_h.T + d_h[None, :])    # (S, H)
        counts = jax.lax.psum(
            jnp.sum((dist <= thr) & mask[:, None], axis=0), axis_name)
        counts = jnp.where(ok_all, counts, -1)
        best = jnp.argmax(counts)
        nb, db = nrm_h[best], d_h[best]
        inl = mask & (jnp.abs(pts @ nb + db) <= thr)

        if refine:
            wi = inl.astype(jnp.float32)
            sw = jnp.maximum(jax.lax.psum(jnp.sum(wi), axis_name), 1.0)
            mean = jax.lax.psum(wi @ pts, axis_name) / sw
            c = pts - mean
            cov = jax.lax.psum(
                jax.lax.dot_general(
                    c * wi[:, None], c, (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST),
                axis_name) / sw
            nb, _ = linalg.smallest_eigenvector_sym3x3(cov)
            db = -jnp.dot(nb, mean)
            inl = mask & (jnp.abs(pts @ nb + db) <= thr)

        count = jax.lax.psum(jnp.sum(inl), axis_name).astype(jnp.int32)
        return nb, db, inl, count

    run = jax.jit(_run)

    def call(points, mask, seed: int = 0) -> PlaneSegmentationResult:
        nb, db, inl, count = run(points, mask,
                                 jax.random.PRNGKey(seed))
        return PlaneSegmentationResult(PlaneModel(nb, db), inl, count)

    return call


def make_sharded_mls(mesh: Mesh, config=None,
                     axis_name: str = POINTS_AXIS):
    """Distributed MLS projection over a points-sharded cloud
    (moving_least_squares.rs:13-74 at multi-chip scale; the sharded
    analog of ``reconstruction.mls_smooth``).

    One ring kNN pass collects each point's ``max_neighbors`` nearest
    GLOBAL neighbors (coords ride the merge — no cross-shard gather),
    then the weighted polynomial fit runs fully locally via the shared
    ``_mls_project_rows`` core (same local frame, same dimensionless
    basis and scale-relative Tikhonov as the single-device path).

    Inputs: points (N, 3) and mask (N,), sharded on axis 0. Returns
    (projected (N, 3), fitted normals (N, 3), valid (N,)) with the
    input sharding. Matches the single-device path point-for-point when
    neighbor sets agree (both take the k nearest within the radius;
    distance ties can differ).
    """
    from ..reconstruction.moving_least_squares import (MlsConfig,
                                                       _mls_project_rows)

    if config is None:
        config = MlsConfig()
    spec = P(axis_name)
    radius = jnp.float32(config.search_radius)
    reg = jnp.float32(config.regularization)
    k = config.max_neighbors
    kernel, order = config.kernel, config.basis.value

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec), out_specs=(spec, spec, spec),
        check_vma=False)
    def _run(pts, mask):
        neg, rows, _ = ring_knn_local(pts, pts, mask, k, axis_name)
        ok = (neg > -jnp.inf) & (-neg <= radius * radius) & mask[:, None]
        dist = jnp.sqrt(jnp.maximum(-neg, 0.0))
        dist = jnp.where(ok, dist, radius)     # keep inf out of the fit
        return _mls_project_rows(rows, ok, dist, pts, mask, radius,
                                 kernel, order, reg)

    return jax.jit(_run)


def make_sharded_colorize(mesh: Mesh, height: int, width: int,
                          bilinear: bool = False,
                          axis_name: str = POINTS_AXIS):
    """Distributed multi-image colorization over a points-sharded
    cloud (colorization.rs:261 at multi-chip scale; the sharded analog
    of ``ops.colorization.colorize_from_images``).

    Projection + sampling are pointwise, so the factory is pure data
    parallelism: the view stack (images, intrinsics, extrinsics) is
    replicated, each device colors its own point shard, and first-hit
    priority across views is a ``lax.scan`` — zero collectives.

    Returns ``fn(points, mask, images (V,H,W,3) f32, intrs (V,4),
    w2cs (V,4,4)) -> (colors (N,3), assigned (N,))`` with the input
    sharding; unassigned points keep color 0 (apply a default on the
    caller side, as ``colorize_from_images`` does).
    """
    from ..ops.colorization import _project_sample

    spec = P(axis_name)
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, rep, rep, rep),
        out_specs=(spec, spec), check_vma=False)
    def _run(pts, mask, images, intrs, w2cs):
        def body(carry, view):
            colors, assigned = carry
            img, intr, w2c = view
            c, inside = _project_sample(pts, mask, img, intr, w2c,
                                        height, width, bilinear)
            take = inside & ~assigned
            return (jnp.where(take[:, None], c, colors),
                    assigned | take), 0.0
        init = (jnp.zeros((pts.shape[0], 3), jnp.float32),
                jnp.zeros((pts.shape[0],), bool))
        (colors, assigned), _ = jax.lax.scan(
            body, init, (images, intrs, w2cs))
        return colors, assigned

    return jax.jit(_run)
