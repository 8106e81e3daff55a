"""Round-4 TPU batch 2.

1. SHOT 250k/1M after the moment-kernel row change (budget: within
   10% of r3's 84.7/266 ms)
2. GICP 1M e2e with coarse-phase subsampling (stride 1 vs auto 8)
3. NDT 250k after the symbolic normal-equations refactor
4. shape-bucket compile-skip: estimate_normals via the PUBLIC API at
   950k then 990k points (same 1,035,648-capacity bucket) — the
   second size must dispatch without a fresh compile

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r4b_probe.py
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

    from threecrate_tpu.core.point_cloud import PointCloud
    from threecrate_tpu.ops.features import ShotConfig, extract_shot_features
    from threecrate_tpu.ops.normals import _estimate
    from threecrate_tpu.utils.profiling import median_time

    assert jax.default_backend() != "cpu"
    log("backend:", jax.default_backend())
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

    # ---------------- 1. SHOT perf ----------------
    for n in (250_000, 1_000_000):
        src = jnp.asarray(_kitti_like(n, 7 if n == 250_000 else 0))
        m = jnp.ones(n, bool)
        pc = PointCloud(points=src, mask=m).with_normals(
            normals_arr(src, m))

        def shot_run(pc=pc):
            r = extract_shot_features(pc, ShotConfig(method="window"))
            return float(jnp.sum(r.descriptors))

        t0 = time.perf_counter()
        _ = shot_run()
        log(f"SHOT n={n} compile+run {time.perf_counter()-t0:.1f} s")
        t = median_time(shot_run, warmup=1, iters=3, sync_fn=lambda x: x)
        log(f"SHOT n={n}: {t*1e3:.1f} ms (r3: 84.7 / 266)")

    # ---------------- 2. GICP subsample ----------------
    from threecrate_tpu.ops.gicp import _gicp_loop, point_covariances

    n = 1_000_000
    src = jnp.asarray(_kitti_like(n, 0))
    tgt = src + jnp.asarray(np.array([0.05, -0.03, 0.02], np.float32))
    m = jnp.ones(n, bool)
    init = jnp.eye(4, dtype=jnp.float32)
    for sub in (1, 8):
        @jax.jit
        def gicp_scalar(s, sm, t_, tm, _sub=sub):
            eps = jnp.float32(1e-4)
            sc, sok = point_covariances(s, sm, 20, eps, True)
            tc_, tok = point_covariances(t_, tm, 20, eps, True)
            T, mse, it, conv, nc = _gicp_loop(
                s, sok, sc, t_, tok, tc_, init, 10, jnp.float32(0.0),
                jnp.float32(1e9), True, subsample=_sub, full_iters=2)
            return jnp.sum(T) + mse
        t = median_time(lambda: gicp_scalar(src, m, tgt, m),
                        warmup=1, iters=3, sync_fn=float)
        log(f"GICP 1M e2e 10it sub={sub}: {t*1e3:.1f} ms (r3: 287-295)")

    # GICP accuracy at sub=8 (Rx tilt)
    ang = 0.02
    ca, sa = np.cos(ang), np.sin(ang)
    R = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]], np.float32)
    tvec = np.array([0.05, -0.03, 0.02], np.float32)
    pts = _kitti_like(n, 0)
    tgt_r = jnp.asarray((pts @ R.T + tvec).astype(np.float32))

    @jax.jit
    def gicp_full(s, sm, t_, tm):
        eps = jnp.float32(1e-4)
        sc, sok = point_covariances(s, sm, 20, eps, True)
        tc_, tok = point_covariances(t_, tm, 20, eps, True)
        return _gicp_loop(s, sok, sc, t_, tok, tc_, init, 20,
                          jnp.float32(1e-14), jnp.float32(1e9), True,
                          subsample=8, full_iters=2)
    T, mse, it, conv, nc = gicp_full(src, m, tgt_r, m)
    T = np.asarray(T)
    log(f"GICP recovery sub=8: Rerr={np.abs(T[:3,:3]-R).max():.2e} "
        f"terr={np.abs(T[:3,3]-tvec).max():.2e} it={int(it)}")

    # ---------------- 3. NDT after symbolic refactor ----------------
    from threecrate_tpu.ops import ndt as ndt_mod

    n_ndt = 250_000
    src_n = jnp.asarray(_kitti_like(n_ndt, 7))
    tgt_n = src_n + jnp.asarray(np.array([0.05, -0.03, 0.02], np.float32))
    m_n = jnp.ones(n_ndt, bool)

    @jax.jit
    def ndt_scalar(s, sm, t_, tm):
        g = ndt_mod.build_gaussians(t_, tm, jnp.float32(2.0), 5)
        T, score, it, conv = ndt_mod._ndt_loop(
            s, sm, g, init, 20, jnp.float32(0.1), jnp.float32(0.0))
        return jnp.sum(T) + score

    t = median_time(lambda: ndt_scalar(src_n, m_n, tgt_n, m_n),
                    warmup=1, iters=3, sync_fn=float)
    log(f"NDT 250k build+20it: {t*1e3:.1f} ms (r3: 946)")

    # ---------------- 4. bucket compile-skip ----------------
    from threecrate_tpu.ops.normals import estimate_normals

    for nn in (950_000, 990_000):
        cloud = PointCloud.from_numpy(_kitti_like(nn, 3))
        log(f"bucket probe n={nn} capacity={cloud.capacity}")
        t0 = time.perf_counter()
        out = estimate_normals(cloud, k=10)
        _ = float(jnp.sum(out.normals))
        log(f"  first call (compile if new shape): "
            f"{time.perf_counter()-t0:.2f} s")
        t0 = time.perf_counter()
        out = estimate_normals(cloud, k=10)
        _ = float(jnp.sum(out.normals))
        log(f"  warm call: {time.perf_counter()-t0:.2f} s")

    log("DONE")


if __name__ == "__main__":
    main()
