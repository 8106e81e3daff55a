"""Round-2 probe #3: analytic ground truth on the bench cloud at 1M.

Ground points (not lifted) of the synthetic scan have true normal +z.
Compares angle-to-truth for: numpy exact-kNN oracle, window_fast
tighter, window_fast union, and the near-exact union-merge "window"
method — the data that decides default-method policy.
"""

from __future__ import annotations

import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _kitti_like(n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, n)
    r = np.abs(rng.normal(0, 25, n)) + 2.0
    ground = np.stack([r * np.cos(ang), r * np.sin(ang),
                       rng.normal(0, 0.05, n)], -1)
    lift = rng.uniform(0, 1, n) < 0.3
    ground[lift, 2] = rng.uniform(0, 4, lift.sum())
    return ground.astype(np.float32), lift


def main() -> None:
    import jax
    import jax.numpy as jnp

    from threecrate_tpu.ops import neighbors
    from threecrate_tpu.ops.normals import _estimate

    log("backend:", jax.default_backend())
    n = 1_000_000
    pts_np, lift = _kitti_like(n)
    pts = jnp.asarray(pts_np)
    mask = jnp.ones(n, bool)
    big = jnp.float32(3e38)

    rng = np.random.default_rng(7)
    qidx = rng.choice(np.where(~lift)[0], 20_000, replace=False)  # ground
    qidx_j = jnp.asarray(qidx, jnp.int32)

    def run_sub(points, m, qi, **kw):
        mn = jnp.min(jnp.where(m[:, None], points, big), 0)
        mx = jnp.max(jnp.where(m[:, None], points, -big), 0)
        vp = (mn + mx) * 0.5 + jnp.array([0.0, 0.0, 1.0]) * \
            jnp.maximum(mx[2] - mn[2], 1.0)
        nrm, curv, valid = _estimate(points, m, 10, False, jnp.float32(0.0),
                                     vp, True, **kw)
        return nrm[qi]

    def ang_z(sub):
        cos = np.abs(np.asarray(sub)[:, 2])
        return np.degrees(np.arccos(np.clip(cos, 0, 1)))

    # numpy exact oracle on the same subset
    @jax.jit
    def oracle_nbrs(points, m, qi):
        q = points[qi]
        qm = jnp.ones(qi.shape[0], bool)
        res = neighbors.knn(points, m, q, qm, 10)
        return res.indices, res.mask

    oi, om = map(np.asarray, oracle_nbrs(pts, mask, qidx_j))
    nbr = pts_np[oi]
    w = om[..., None].astype(np.float64)
    mu = (nbr * w).sum(1) / np.maximum(w.sum(1), 1e-12)
    d = (nbr - mu[:, None, :]) * w
    cov = np.einsum("qki,qkj->qij", d, d)
    _, evecs = np.linalg.eigh(cov)
    a = np.degrees(np.arccos(np.clip(np.abs(evecs[:, 2, 0]), 0, 1)))
    log(f"[TRUTH] exact-kNN oracle: mean {a.mean():.3f}  p95 "
        f"{np.percentile(a,95):.3f}  p99 {np.percentile(a,99):.3f}")

    variants = [
        ("tighter", dict(moments=True)),
        ("union", dict(moments=True, window_merge="union")),
        ("window(near-exact)", dict(window=True)),
    ]
    for name, kw in variants:
        t0 = time.perf_counter()
        f = jax.jit(lambda p_, m_, q_, kw=kw: run_sub(p_, m_, q_, **kw))
        a = ang_z(f(pts, mask, qidx_j))
        log(f"[TRUTH] {name}: mean {a.mean():.3f}  p95 "
            f"{np.percentile(a,95):.3f}  p99 {np.percentile(a,99):.3f}  "
            f"({time.perf_counter()-t0:.0f} s)")


if __name__ == "__main__":
    main()
