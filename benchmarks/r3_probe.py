"""Round-3 TPU measurement batch (run in background, pipe to a log).

One process, everything queued back-to-back (remote compiles are
1-10 min each and queue globally — never iterate interactively):

1. fused SHOT timing: 250k + 1M at band 32/48 (r2 staged: 292 ms /
   908 ms) — the VERDICT item-2 "<=300 ms at 1M" check
2. ICP w_tiles=3 vs 4 at 1M, and the equal-N 121k line (bench.py's
   new icp_p2p_121k metric)
3. BASELINE config #3: 1M global registration end-to-end (normals +
   fused FPFH + mutual matching + vmapped RANSAC) + NDT refine
4. BASELINE config #4: TSDF fusion at 256^3 / 640x480 (20 frames,
   lax.scan sequence) + surface extraction + marching cubes
5. BASELINE config #5: 35k Poisson (depth 6) + QEM simplify pipeline

Timing = median of 3 after 1 warmup, scalar-materialisation sync
(block_until_ready is a no-op through the tunnel).
"""

from __future__ import annotations

import json
import sys
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

    from threecrate_tpu.utils.profiling import median_time

    assert jax.default_backend() != "cpu", "probe must run on the TPU"

    big = jnp.float32(3e38)

    def viewpoint(points, m):
        mn = jnp.min(jnp.where(m[:, None], points, big), 0)
        mx = jnp.max(jnp.where(m[:, None], points, -big), 0)
        return (mn + mx) * 0.5 + jnp.array([0.0, 0.0, 1.0]) * \
            jnp.maximum(mx[2] - mn[2], 1.0)

    # ---------------- 1. fused SHOT ----------------
    from threecrate_tpu.ops.features import _shot_fused
    from threecrate_tpu.ops.normals import _estimate

    @jax.jit
    def normals_arr(p, m):
        nrm, _, _ = _estimate(p, m, 10, False, jnp.float32(0.0),
                              viewpoint(p, m), True, moments=True,
                              window_merge="union")
        return nrm

    for n, seeds in ((250_000, 7), (1_000_000, 0)):
        p = jnp.asarray(_kitti_like(n, seeds))
        m = jnp.ones(n, bool)
        na = normals_arr(p, m)
        _ = float(jnp.sum(na))
        for band in (32, 48):
            @jax.jit
            def shot_scalar(p_, m_, na_, _band=band):
                d, v = _shot_fused(p_, m_, na_, 0.25, "shot", band=_band)
                return jnp.sum(d) + jnp.sum(v)
            try:
                t = median_time(lambda: shot_scalar(p, m, na),
                                warmup=1, iters=3, sync_fn=float)
                log(f"SHOT fused n={n} band={band}: {t*1e3:.1f} ms")
            except Exception as e:
                log(f"SHOT fused n={n} band={band} FAILED: {e!r}")
        # r=0.5 (matches FPFH bench radius) for density sensitivity
        @jax.jit
        def shot_scalar_r05(p_, m_, na_):
            d, v = _shot_fused(p_, m_, na_, 0.5, "shot", band=32)
            return jnp.sum(d) + jnp.sum(v)
        try:
            t = median_time(lambda: shot_scalar_r05(p, m, na),
                            warmup=1, iters=3, sync_fn=float)
            log(f"SHOT fused n={n} band=32 r=0.5: {t*1e3:.1f} ms")
        except Exception as e:
            log(f"SHOT fused n={n} r=0.5 FAILED: {e!r}")

    # ---------------- 2. ICP w3 vs w4 ----------------
    from threecrate_tpu.ops.registration import _icp_p2p

    init = jnp.eye(4, dtype=jnp.float32)
    for n in (1_000_000, 121_000):
        src = jnp.asarray(_kitti_like(n, 0))
        tgt = src + jnp.asarray(np.array([0.05, -0.03, 0.02], np.float32))
        m = jnp.ones(n, bool)
        for w in (3, 4):
            @jax.jit
            def icp_scalar(s, sm, t_, tm, _w=w):
                T, mse, it, conv, nc = _icp_p2p(
                    s, sm, t_, tm, init, 20, jnp.float32(0.0),
                    jnp.float32(1e9), window=True, w_tiles=_w)
                return jnp.sum(T) + mse
            t = median_time(lambda: icp_scalar(src, m, tgt, m),
                            warmup=1, iters=3, sync_fn=float)
            log(f"ICP p2p n={n} w={w}: {t/20*1e3:.2f} ms/iter")

    # ---------------- 3. global registration e2e at 1M ----------------
    from threecrate_tpu.core.point_cloud import PointCloud
    from threecrate_tpu.ops import global_registration as greg
    from threecrate_tpu.ops import ndt as ndt_mod

    n = 1_000_000
    pts = _kitti_like(n, 3)
    ang = 0.35
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    tvec = np.array([2.0, -1.5, 0.3], np.float32)
    src_np = (pts @ R.T + tvec).astype(np.float32)
    src_pc = PointCloud(points=jnp.asarray(src_np), mask=jnp.ones(n, bool))
    tgt_pc = PointCloud(points=jnp.asarray(pts), mask=jnp.ones(n, bool))
    cfg = greg.GlobalRegistrationConfig(
        ransac_iterations=16384, fpfh_radius=0.5, distance_threshold=0.3,
        refine_with_icp=False, hypothesis_batch=4096)

    def greg_run():
        res = greg.global_registration(src_pc, tgt_pc, cfg)
        return float(jnp.sum(res.transformation))

    try:
        t0 = time.perf_counter()
        _ = greg_run()
        log(f"global_registration 1M e2e (compile+run): "
            f"{time.perf_counter()-t0:.1f} s")
        t = median_time(greg_run, warmup=0, iters=3, sync_fn=lambda x: x)
        res = greg.global_registration(src_pc, tgt_pc, cfg)
        T = np.asarray(res.transformation)
        rerr = np.abs(T[:3, :3] @ R - np.eye(3)).max()
        log(f"global_registration 1M e2e: {t*1e3:.0f} ms  "
            f"inlier_ratio={float(res.inlier_ratio):.3f} Rerr={rerr:.2e}")
    except Exception as e:
        log(f"global_registration FAILED: {e!r}")

    # NDT refine on top (coarse pose from RANSAC)
    try:
        @jax.jit
        def ndt_refine(s, sm, t_, tm, T0):
            g = ndt_mod.build_gaussians(t_, tm, jnp.float32(2.0), 5)
            T, score, it, conv = ndt_mod._ndt_loop(
                s, sm, g, T0, 20, jnp.float32(0.1), jnp.float32(0.0))
            return jnp.sum(T) + score
        T0 = jnp.asarray(np.linalg.inv(
            np.vstack([np.hstack([R, tvec[:, None]]),
                       [0, 0, 0, 1]])).astype(np.float32))
        t = median_time(
            lambda: ndt_refine(src_pc.points, src_pc.mask,
                               tgt_pc.points, tgt_pc.mask, T0),
            warmup=1, iters=3, sync_fn=float)
        log(f"NDT refine 1M (build+20it): {t*1e3:.0f} ms")
    except Exception as e:
        log(f"NDT refine FAILED: {e!r}")

    # ---------------- 4. TSDF at scale ----------------
    from threecrate_tpu.ops import tsdf as tsdf_mod
    from threecrate_tpu.reconstruction.marching_cubes import (
        VolumetricGrid, extract_soup_cubes)

    h, w = 480, 640
    intr = jnp.asarray([525.0, 525.0, w / 2, h / 2], jnp.float32)
    rng = np.random.default_rng(9)
    n_frames = 20
    yy, xx = np.mgrid[0:h, 0:w]
    base = 2.0 + 0.3 * np.sin(xx / 60.0) * np.cos(yy / 45.0)
    depths = np.stack([
        base + 0.01 * rng.normal(0, 1, (h, w)) for _ in range(n_frames)
    ]).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    poses[:, 0, 3] = np.linspace(-0.1, 0.1, n_frames)

    for res3 in (128, 256):
        vol = tsdf_mod.create_volume((res3, res3, res3),
                                     voxel_size=4.0 / res3,
                                     origin=(-2.0, -2.0, 0.5))
        d_j = jnp.asarray(depths)
        p_j = jnp.asarray(poses)

        @jax.jit
        def fuse(v, dd, pp):
            out = tsdf_mod.integrate_sequence(v, dd, intr, pp)
            return out, jnp.sum(out.tsdf) + jnp.sum(out.weight)

        try:
            def run():
                out, s = fuse(vol, d_j, p_j)
                return float(s)
            t = median_time(run, warmup=1, iters=3, sync_fn=lambda x: x)
            log(f"TSDF integrate {res3}^3 x {n_frames} frames: "
                f"{t*1e3:.0f} ms total, {t/n_frames*1e3:.1f} ms/frame")
            fused_vol, _ = fuse(vol, d_j, p_j)

            @jax.jit
            def surf(v):
                sp = tsdf_mod.extract_surface(v)
                return jnp.sum(sp.cloud.points) + sp.count
            t = median_time(lambda: float(surf(fused_vol)),
                            warmup=1, iters=3, sync_fn=lambda x: x)
            log(f"TSDF extract_surface {res3}^3: {t*1e3:.0f} ms")

            grid = VolumetricGrid(
                values=fused_vol.tsdf,
                origin=fused_vol.origin,
                spacing=fused_vol.voxel_size)

            @jax.jit
            def mc(g):
                soup = extract_soup_cubes(g, jnp.float32(0.0))
                keep = jnp.repeat(soup.mask, 3)
                return jnp.sum(jnp.where(keep[:, None],
                                         soup.vertices, 0.0))
            t = median_time(lambda: float(mc(grid)), warmup=1, iters=3,
                            sync_fn=lambda x: x)
            log(f"MC (device soup) {res3}^3: {t*1e3:.0f} ms")
        except Exception as e:
            log(f"TSDF {res3}^3 FAILED: {e!r}")

    # ---------------- 5. Poisson + QEM (35k) ----------------
    from threecrate_tpu.ops.normals import estimate_normals
    from threecrate_tpu.reconstruction.poisson import (PoissonConfig,
                                                       poisson_reconstruct)
    from threecrate_tpu.simplification import simplify_mesh

    n5 = 35_000
    rng = np.random.default_rng(11)
    u, v = rng.uniform(0, 2 * np.pi, n5), np.arccos(
        rng.uniform(-1, 1, n5))
    sphere = np.stack([np.sin(v) * np.cos(u), np.sin(v) * np.sin(u),
                       np.cos(v)], -1)
    pts5 = (sphere * (1 + 0.05 * np.sin(3 * u)[:, None])
            + rng.normal(0, 0.003, (n5, 3))).astype(np.float32)
    pc5 = estimate_normals(PointCloud.from_numpy(pts5), 10)

    try:
        def pipeline():
            mesh = poisson_reconstruct(pc5, PoissonConfig(depth=6))
            simp = simplify_mesh(mesh, target_faces=max(
                int(mesh.face_count()) // 2, 100))
            return int(simp.face_count())
        t0 = time.perf_counter()
        nf = pipeline()
        log(f"poisson+QEM 35k cold: {time.perf_counter()-t0:.1f} s "
            f"({nf} faces)")
        t = median_time(pipeline, warmup=0, iters=3, sync_fn=lambda x: x)
        log(f"poisson+QEM 35k warm e2e: {t*1e3:.0f} ms")
    except Exception as e:
        log(f"poisson+QEM FAILED: {e!r}")

    log("R3 PROBE DONE")


if __name__ == "__main__":
    main()
