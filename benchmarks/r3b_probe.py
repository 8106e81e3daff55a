"""Round-3 follow-up TPU batch: post-fix measurements.

1. marching cubes device soup at 128^3 / 256^3 (after the flattened
   2-D gather fix — the previous layout padded to 20.9 GB)
2. global registration 1M end-to-end (after blockwise descriptor
   matching + source subsampling)
3. Poisson + QEM 35k warm (after the batched multiple-choice QEM —
   CPU-side 6.4 s -> 0.84 s)
4. USC fused at 1M
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
    g = np.stack([r * np.cos(ang), r * np.sin(ang),
                  rng.normal(0, 0.05, n)], -1)
    lift = rng.uniform(0, 1, n) < 0.3
    g[lift, 2] = rng.uniform(0, 4, lift.sum())
    return g.astype(np.float32)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from threecrate_tpu.utils.profiling import median_time

    assert jax.default_backend() != "cpu"

    # ---------------- 1. MC device soup ----------------
    from threecrate_tpu.ops import tsdf as tsdf_mod
    from threecrate_tpu.reconstruction.marching_cubes import (
        VolumetricGrid, extract_soup_cubes)

    h, w = 480, 640
    intr = jnp.asarray([525.0, 525.0, w / 2, h / 2], jnp.float32)
    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 2.0 + 0.3 * np.sin(xx / 60.0) * np.cos(yy / 45.0)
    depths = np.stack([base + 0.01 * rng.normal(0, 1, (h, w))
                       for _ in range(20)]).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (20, 1, 1))
    poses[:, 0, 3] = np.linspace(-0.1, 0.1, 20)

    for res3 in (128, 256):
        vol = tsdf_mod.create_volume((res3, res3, res3),
                                     voxel_size=4.0 / res3,
                                     origin=(-2.0, -2.0, 0.5))

        @jax.jit
        def fuse(v, dd, pp):
            return tsdf_mod.integrate_sequence(v, dd, intr, pp)

        fused_vol = fuse(vol, jnp.asarray(depths), jnp.asarray(poses))
        _ = float(jnp.sum(fused_vol.tsdf))
        grid = VolumetricGrid(values=fused_vol.tsdf,
                              origin=fused_vol.origin,
                              spacing=fused_vol.voxel_size)

        @jax.jit
        def mc(g):
            soup = extract_soup_cubes(g, jnp.float32(0.0))
            keep = jnp.repeat(soup.mask, 3)
            return jnp.sum(jnp.where(keep[:, None],
                                     soup.vertices, 0.0)), \
                jnp.sum(soup.mask)

        try:
            def run():
                s, cnt = mc(grid)
                return float(s) + float(cnt)
            t = median_time(run, warmup=1, iters=3, sync_fn=lambda x: x)
            _, n_tris = mc(grid)
            log(f"MC (device soup) {res3}^3: {t*1e3:.0f} ms "
                f"({int(n_tris)} tris)")
        except Exception as e:
            log(f"MC {res3}^3 FAILED: {e!r}")

    # ---------------- 2. global registration 1M ----------------
    from threecrate_tpu.core.point_cloud import PointCloud
    from threecrate_tpu.ops import global_registration as greg

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
        return res

    try:
        t0 = time.perf_counter()
        res = greg_run()
        _ = float(jnp.sum(res.transformation))
        log(f"global_registration 1M (compile+run): "
            f"{time.perf_counter()-t0:.1f} s")
        t = median_time(
            lambda: float(jnp.sum(greg_run().transformation)),
            warmup=0, iters=3, sync_fn=lambda x: x)
        res = greg_run()
        T = np.asarray(res.transformation)
        rerr = np.abs(T[:3, :3] @ R - np.eye(3)).max()
        terr = np.abs(T[:3, :3] @ tvec + T[:3, 3]).max()
        log(f"global_registration 1M e2e: {t*1e3:.0f} ms  "
            f"inliers={float(res.inlier_ratio):.3f} "
            f"Rerr={rerr:.2e} terr(inv)={terr:.2e}")
    except Exception as e:
        log(f"global_registration FAILED: {e!r}")

    # ---------------- 3. poisson + QEM warm ----------------
    from threecrate_tpu.ops.normals import estimate_normals
    from threecrate_tpu.reconstruction.poisson import (PoissonConfig,
                                                       poisson_reconstruct)
    from threecrate_tpu.simplification import simplify_mesh

    n5 = 35_000
    rng = np.random.default_rng(11)
    u, v = rng.uniform(0, 2 * np.pi, n5), np.arccos(rng.uniform(-1, 1, n5))
    sphere = np.stack([np.sin(v) * np.cos(u), np.sin(v) * np.sin(u),
                       np.cos(v)], -1)
    pts5 = (sphere * (1 + 0.05 * np.sin(3 * u)[:, None])
            + rng.normal(0, 0.003, (n5, 3))).astype(np.float32)
    pc5 = estimate_normals(PointCloud.from_numpy(pts5), 10)

    def pipeline():
        mesh = poisson_reconstruct(pc5, PoissonConfig(depth=6))
        simp = simplify_mesh(mesh, target_faces=max(
            int(mesh.face_count()) // 2, 100))
        return int(simp.face_count())

    try:
        nf = pipeline()
        t = median_time(pipeline, warmup=0, iters=3, sync_fn=lambda x: x)
        log(f"poisson+QEM 35k warm e2e: {t*1e3:.0f} ms ({nf} faces)")
    except Exception as e:
        log(f"poisson+QEM FAILED: {e!r}")

    # ---------------- 4. USC at 1M ----------------
    from threecrate_tpu.ops.features import _shot_fused

    p1 = jnp.asarray(_kitti_like(1_000_000, 0))
    m1 = jnp.ones(1_000_000, bool)

    @jax.jit
    def usc_scalar(p_, m_):
        d, vv = _shot_fused(p_, m_, jnp.zeros_like(p_), 0.25, "usc",
                            band=32)
        return jnp.sum(d) + jnp.sum(vv)

    try:
        t = median_time(lambda: usc_scalar(p1, m1), warmup=1, iters=3,
                        sync_fn=float)
        log(f"USC fused 1M band=32: {t*1e3:.1f} ms")
    except Exception as e:
        log(f"USC 1M FAILED: {e!r}")

    log("R3B PROBE DONE")


if __name__ == "__main__":
    main()
