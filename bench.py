"""Benchmark harness: north-star workloads on the real TPU chip.

Prints one JSON line per metric; the LAST line is the headline the
driver records: 1M-point normal estimation (k=10) steady-state
throughput — the workload the reference README concedes (normals
0.57x Open3D at full res; BASELINE.md targets >10x Open3D).

Baseline: Open3D's published full-res KITTI normals number,
121k pts / 104.543 ms = 1.157 Mpts/s (BASELINE.md:79). Open3D's own
throughput *drops* with N (n·log n tree search), so the ratio
understates the gap at 1M.

Timed program: ``method="window_fast"`` (2-pass Morton window, fused
Pallas kernel: band-bounded radius selection + MXU covariance moments
+ in-VMEM Jacobi eigensolve; see kernels/knn_pallas.py). Quality is
gated by tests/test_normals.py (matches exact-kNN on noisy scan data;
see the NormalEstimationConfig docstring for the noise-free-surface
caveat of the pick-tighter merge).

Two timing disciplines, both reported:

* steady-state (headline): one dispatch runs FOUR different 1M clouds
  back-to-back via lax.scan; per-cloud time = total/4. This measures
  what a pipeline processing a stream of scans sees, and is the
  apples-to-apples number against Open3D's in-process measurement —
  this benchmark's TPU sits behind a network tunnel whose ~30 ms
  dispatch round-trip is infrastructure, not compute (a host-attached
  TPU pays ~0.1 ms).
* single-dispatch latency (secondary line): one cloud, one dispatch,
  tunnel round-trip included.

ICP (the other conceded workload) is reported as ms/iteration at 1M
vs Open3D's published ~10 ms/iter at 121k (= 12.1 Mpt·iter/s).

Additional lines (regression visibility for later rounds): voxel grid
filter at 1M vs Open3D's published 4.8 Mpts/s, and the library-default
normals path (the fused 2-window UNION merge "auto" picks above 65k
points — near-exact quality; the headline "window_fast" line is the
documented opt-in fast tier).
"""

from __future__ import annotations

import json
import time

import numpy as np

OPEN3D_NORMALS_MPTS_S = 0.121_000 * 1e6 / 104.543e-3 / 1e6   # = 1.1574
OPEN3D_ICP_MPT_ITERS_S = 0.121_000 * 1e6 / 10.0e-3 / 1e6     # = 12.1
OPEN3D_VOXEL_MPTS_S = 4.8   # published 121k-point voxel downsample rate


def _kitti_like(n: int, seed: int = 0) -> np.ndarray:
    """Synthetic outdoor LiDAR-ish scan: ground plane + structures."""
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

    from threecrate_tpu.ops.normals import _estimate
    from threecrate_tpu.ops.registration import _icp_p2p
    from threecrate_tpu.utils.profiling import median_time

    n = 1_000_000
    big = jnp.float32(3e38)
    mask = jnp.ones(n, bool)

    def normals_scalar(points, m):
        mn = jnp.min(jnp.where(m[:, None], points, big), 0)
        mx = jnp.max(jnp.where(m[:, None], points, -big), 0)
        vp = (mn + mx) * 0.5 + jnp.array([0.0, 0.0, 1.0]) * \
            jnp.maximum(mx[2] - mn[2], 1.0)
        nrm, curv, valid = _estimate(points, m, 10, False, jnp.float32(0.0),
                                     vp, True, moments=True)
        return jnp.sum(jnp.abs(nrm)) + jnp.sum(valid)

    # ---- ICP: 20 iterations of point-to-point at 1M x 1M ----
    icp_iters = 20
    src = jnp.asarray(_kitti_like(n, 0))
    tgt = src + jnp.asarray(np.array([0.05, -0.03, 0.02], np.float32))

    init = jnp.eye(4, dtype=jnp.float32)

    @jax.jit
    def icp_scalar(s, sm, t, tm):
        T, mse, it, conv, n_corr = _icp_p2p(
            s, sm, t, tm, init, icp_iters, jnp.float32(0.0),
            jnp.float32(1e9), window=True)
        return jnp.sum(T) + mse

    ticp = median_time(lambda: icp_scalar(src, mask, tgt, mask),
                       warmup=1, iters=3, sync_fn=float)
    per_iter = ticp / icp_iters
    icp_tput = n / per_iter / 1e6
    print(json.dumps({
        "metric": "icp_p2p_1M_ms_per_iter",
        "value": round(per_iter * 1e3, 2),
        "unit": "ms/iter",
        "vs_baseline": round(icp_tput / OPEN3D_ICP_MPT_ITERS_S, 2),
    }))

    # ---- voxel grid filter at 1M (0.2 m) ----
    from threecrate_tpu.ops.filtering import _voxel_grid

    @jax.jit
    def voxel_scalar(points, m):
        pts_out, mask_out, _, n_out, _ = _voxel_grid(points, m, [],
                                                     jnp.float32(0.2),
                                                     want_inverse=False)
        return jnp.sum(jnp.where(mask_out[:, None], pts_out, 0.0)) \
            + n_out
    tv = median_time(lambda: voxel_scalar(src, mask), warmup=2, iters=5,
                     sync_fn=float)
    print(json.dumps({
        "metric": "voxel_filter_1M_throughput",
        "value": round(n / tv / 1e6, 2),
        "unit": "Mpts/s",
        "vs_baseline": round(n / tv / 1e6 / OPEN3D_VOXEL_MPTS_S, 2),
    }))

    # ---- normals: library-default path (union merge) at 1M ----
    def normals_union_scalar(points, m):
        mn = jnp.min(jnp.where(m[:, None], points, big), 0)
        mx = jnp.max(jnp.where(m[:, None], points, -big), 0)
        vp = (mn + mx) * 0.5 + jnp.array([0.0, 0.0, 1.0]) * \
            jnp.maximum(mx[2] - mn[2], 1.0)
        nrm, curv, valid = _estimate(points, m, 10, False, jnp.float32(0.0),
                                     vp, True, moments=True,
                                     window_merge="union")
        return jnp.sum(jnp.abs(nrm)) + jnp.sum(valid)

    tu = median_time(lambda: jax.jit(normals_union_scalar)(src, mask),
                     warmup=2, iters=5, sync_fn=float)
    print(json.dumps({
        "metric": "normals_default_1M_k10_single_dispatch",
        "value": round(n / tu / 1e6, 3),
        "unit": "Mpts/s",
        "vs_baseline": round(n / tu / 1e6 / OPEN3D_NORMALS_MPTS_S, 2),
    }))

    # ---- normals: single-dispatch latency (tunnel RPC included) ----
    single = jax.jit(normals_scalar)
    t1 = median_time(lambda: single(src, mask), warmup=2, iters=5,
                     sync_fn=float)
    print(json.dumps({
        "metric": "normals_1M_k10_single_dispatch",
        "value": round(n / t1 / 1e6, 3),
        "unit": "Mpts/s",
        "vs_baseline": round(n / t1 / 1e6 / OPEN3D_NORMALS_MPTS_S, 2),
    }))

    # ---- normals: steady-state over 4 distinct clouds (HEADLINE) ----
    clouds = jnp.stack([jnp.asarray(_kitti_like(n, s)) for s in range(4)])

    @jax.jit
    def batch_scalar(cs, m):
        def body(acc, c):
            return acc + normals_scalar(c, m), 0.0
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
        return acc

    t4 = median_time(lambda: batch_scalar(clouds, mask), warmup=1, iters=5,
                     sync_fn=float)
    per = t4 / clouds.shape[0]
    mpts = n / per / 1e6
    print(json.dumps({
        "metric": "normals_1M_k10_throughput",
        "value": round(mpts, 3),
        "unit": "Mpts/s",
        "vs_baseline": round(mpts / OPEN3D_NORMALS_MPTS_S, 2),
    }))


if __name__ == "__main__":
    main()
