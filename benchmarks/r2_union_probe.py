"""Round-2 probe #2: fused 2-window UNION normals on real TPU at 1M.

Measures: single-dispatch + steady-state timing of the union path,
and 20k-query oracle quality for union vs tighter on the bench cloud.
"""

from __future__ import annotations

import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _kitti_like(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, n)
    r = np.abs(rng.normal(0, 25, n)) + 2.0
    ground = np.stack([r * np.cos(ang), r * np.sin(ang),
                       rng.normal(0, 0.05, n)], -1)
    lift = rng.uniform(0, 1, n) < 0.3
    ground[lift, 2] = rng.uniform(0, 4, lift.sum())
    return ground.astype(np.float32)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from threecrate_tpu.ops import neighbors
    from threecrate_tpu.ops.normals import _estimate
    from threecrate_tpu.utils.profiling import median_time

    log("backend:", jax.default_backend(), jax.devices())
    n = 1_000_000
    pts_np = _kitti_like(n)
    pts = jnp.asarray(pts_np)
    mask = jnp.ones(n, bool)
    big = jnp.float32(3e38)

    def scalar_fn(merge):
        @jax.jit
        def run(points, m):
            mn = jnp.min(jnp.where(m[:, None], points, big), 0)
            mx = jnp.max(jnp.where(m[:, None], points, -big), 0)
            vp = (mn + mx) * 0.5 + jnp.array([0.0, 0.0, 1.0]) * \
                jnp.maximum(mx[2] - mn[2], 1.0)
            nrm, curv, valid = _estimate(points, m, 10, False,
                                         jnp.float32(0.0), vp, True,
                                         moments=True, window_merge=merge)
            return jnp.sum(jnp.abs(nrm)) + jnp.sum(valid)
        return run

    run_u = scalar_fn("union")
    t0 = time.perf_counter()
    float(run_u(pts, mask))
    log(f"[compile+run] union_2p: {time.perf_counter()-t0:.1f} s")
    t = median_time(lambda: run_u(pts, mask), warmup=1, iters=5,
                    sync_fn=float)
    log(f"[TIME] union_2p single: {t*1e3:.1f} ms ({n/t/1e6:.2f} Mpts/s, "
        f"vs_baseline {n/t/1e6/1.1574:.2f})")

    clouds = jnp.stack([jnp.asarray(_kitti_like(n, s)) for s in range(4)])

    @jax.jit
    def run_batch(cs, m):
        def body(acc, c):
            return acc + run_u(c, m), 0.0
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
        return acc

    t0 = time.perf_counter()
    float(run_batch(clouds, mask))
    log(f"[compile+run] union scan4: {time.perf_counter()-t0:.1f} s")
    t4 = median_time(lambda: run_batch(clouds, mask), warmup=1, iters=5,
                     sync_fn=float)
    per = t4 / 4
    log(f"[TIME] union_2p steady: {per*1e3:.1f} ms/cloud "
        f"({n/per/1e6:.2f} Mpts/s, vs_baseline {n/per/1e6/1.1574:.2f})")

    # oracle quality (20k subset)
    rng = np.random.default_rng(7)
    qidx = rng.choice(n, 20_000, replace=False)
    qidx_j = jnp.asarray(qidx, jnp.int32)

    @jax.jit
    def oracle_nbrs(points, m, qi):
        q = points[qi]
        qm = jnp.ones(qi.shape[0], bool)
        res = neighbors.knn(points, m, q, qm, 10)
        return res.indices, res.mask

    oi, om = oracle_nbrs(pts, mask, qidx_j)
    oi = np.asarray(oi); om = np.asarray(om)
    nbr = pts_np[oi]
    w = om[..., None].astype(np.float64)
    mu = (nbr * w).sum(1) / np.maximum(w.sum(1), 1e-12)
    d = (nbr - mu[:, None, :]) * w
    cov = np.einsum("qki,qkj->qij", d, d)
    evals, evecs = np.linalg.eigh(cov)
    oracle_nrm = evecs[:, :, 0]

    for merge in ("union", "tighter"):
        @jax.jit
        def run_sub(points, m, qi, merge=merge):
            mn = jnp.min(jnp.where(m[:, None], points, big), 0)
            mx = jnp.max(jnp.where(m[:, None], points, -big), 0)
            vp = (mn + mx) * 0.5 + jnp.array([0.0, 0.0, 1.0]) * \
                jnp.maximum(mx[2] - mn[2], 1.0)
            nrm, curv, valid = _estimate(points, m, 10, False,
                                         jnp.float32(0.0), vp, True,
                                         moments=True, window_merge=merge)
            return nrm[qi]
        sub = np.asarray(run_sub(pts, mask, qidx_j))
        cos = np.abs(np.sum(sub * oracle_nrm, -1))
        a = np.degrees(np.arccos(np.clip(cos, 0, 1)))
        log(f"[QUALITY] {merge}: mean {a.mean():.3f}  p95 "
            f"{np.percentile(a,95):.3f}  p99 {np.percentile(a,99):.3f}  "
            f"max {a.max():.2f}")


if __name__ == "__main__":
    main()
