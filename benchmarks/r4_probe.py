"""Round-4 TPU batch 1: ICP source-tile subsampling (VERDICT item 1).

Measures, in one process (remote compiles are minutes each and queue
globally):

1. ICP p2p 1M x 1M, subsample in {1, 4, 8}, 20 iters — ms/iter
2. recovery accuracy at 1M under the Rx-tilt fixture (the rotationally
   well-conditioned one; z-rotation is degenerate on this synthetic):
   subsample 1 vs 4 vs 8, Rerr/terr vs truth
3. ICP p2plane 1M (precomputed union normals), subsample {1, 4}
4. equal-N 121k sanity (auto keeps subsample off below 400k)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r4_probe.py
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

    from threecrate_tpu.ops.registration import _icp_p2p, _icp_p2plane
    from threecrate_tpu.utils.profiling import median_time

    assert jax.default_backend() != "cpu"
    log("backend:", jax.default_backend())

    init = jnp.eye(4, dtype=jnp.float32)
    n = 1_000_000
    src = jnp.asarray(_kitti_like(n, 0))
    tgt = src + jnp.asarray(np.array([0.05, -0.03, 0.02], np.float32))
    m = jnp.ones(n, bool)

    # ---------------- 1. p2p subsample timing sweep ----------------
    for sub in (1, 4, 8):
        @jax.jit
        def icp_scalar(s, sm, t_, tm, _sub=sub):
            T, mse, it, conv, nc = _icp_p2p(
                s, sm, t_, tm, init, 20, jnp.float32(0.0),
                jnp.float32(1e9), window=True, w_tiles=3,
                subsample=_sub, full_iters=2)
            return jnp.sum(T) + mse
        t0 = time.perf_counter()
        _ = float(icp_scalar(src, m, tgt, m))
        log(f"p2p sub={sub} compile+run {time.perf_counter()-t0:.1f} s")
        t = median_time(lambda: icp_scalar(src, m, tgt, m),
                        warmup=1, iters=3, sync_fn=float)
        log(f"ICP p2p 1M sub={sub}: {t/20*1e3:.2f} ms/iter "
            f"({n/(t/20)/1e6:.1f} Mpt-iter/s, "
            f"vs12.1={n/(t/20)/1e6/12.1:.2f}x)")

    # ---------------- 2. Rx-tilt recovery accuracy ----------------
    ang = 0.02
    ca, sa = np.cos(ang), np.sin(ang)
    R = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]], np.float32)
    tvec = np.array([0.05, -0.03, 0.02], np.float32)
    pts = _kitti_like(n, 0)
    tgt_r = jnp.asarray((pts @ R.T + tvec).astype(np.float32))
    for sub in (1, 4, 8):
        @jax.jit
        def icp_full(s, sm, t_, tm, _sub=sub):
            return _icp_p2p(s, sm, t_, tm, init, 30, jnp.float32(1e-14),
                            jnp.float32(1e9), window=True, w_tiles=3,
                            subsample=_sub, full_iters=2)
        T, mse, it, conv, nc = icp_full(src, m, tgt_r, m)
        T = np.asarray(T)
        rerr = np.abs(T[:3, :3] - R).max()
        terr = np.abs(T[:3, 3] - tvec).max()
        log(f"recovery sub={sub}: Rerr={rerr:.2e} terr={terr:.2e} "
            f"it={int(it)} mse={float(mse):.3e} ncorr={int(nc)}")

    # ---------------- 3. p2plane subsample timing ----------------
    from threecrate_tpu.ops.normals import _estimate

    big = jnp.float32(3e38)

    @jax.jit
    def normals_arr(p, mm):
        mn = jnp.min(jnp.where(mm[:, None], p, big), 0)
        mx = jnp.max(jnp.where(mm[:, None], p, -big), 0)
        vp = (mn + mx) * 0.5 + jnp.array([0.0, 0.0, 1.0])
        nrm, curv, valid = _estimate(p, mm, 10, False, jnp.float32(0.0),
                                     vp, True, moments=True,
                                     window_merge="union")
        return nrm

    tn = normals_arr(tgt, m)
    _ = float(jnp.sum(tn))
    for sub in (1, 4):
        @jax.jit
        def p2pl_scalar(s, sm, t_, tm, na, _sub=sub):
            T, mse, it, conv, nc = _icp_p2plane(
                s, sm, t_, tm, na, init, 20, jnp.float32(0.0),
                jnp.float32(1e9), window=True, w_tiles=3,
                subsample=_sub, full_iters=2)
            return jnp.sum(T) + mse
        t = median_time(lambda: p2pl_scalar(src, m, tgt, m, tn),
                        warmup=1, iters=3, sync_fn=float)
        log(f"ICP p2plane 1M sub={sub}: {t/20*1e3:.2f} ms/iter")

    # ---------------- 4. equal-N sanity ----------------
    n_eq = 121_000
    src_eq = jnp.asarray(_kitti_like(n_eq, 5))
    tgt_eq = src_eq + jnp.asarray(np.array([0.05, -0.03, 0.02],
                                           np.float32))
    m_eq = jnp.ones(n_eq, bool)
    for sub in (1, 2):
        @jax.jit
        def icp_eq(s, sm, t_, tm, _sub=sub):
            T, mse, it, conv, nc = _icp_p2p(
                s, sm, t_, tm, init, 20, jnp.float32(0.0),
                jnp.float32(1e9), window=True, w_tiles=3,
                subsample=_sub, full_iters=2)
            return jnp.sum(T) + mse
        t = median_time(lambda: icp_eq(src_eq, m_eq, tgt_eq, m_eq),
                        warmup=1, iters=3, sync_fn=float)
        log(f"ICP p2p 121k sub={sub}: {t/20*1e3:.2f} ms/iter")

    log("DONE")


if __name__ == "__main__":
    main()
