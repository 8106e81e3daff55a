"""Benchmark harness: north-star workloads on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North star (BASELINE.json): >10x Open3D-CPU throughput on 1M-point
normal estimation (k=10) — the workload the reference README concedes
(normals 0.57x Open3D at full res). Baseline throughput is Open3D's
published full-res KITTI number: 121k pts / 104.543 ms = 1.157 Mpts/s
(docs/benchmarks.md via BASELINE.md).

The timed program is one fused jit of the ``method="window_fast"``
path: Morton sort → fully-fused pallas window kernel (k-NN select +
query-centered covariance + Jacobi eigensolve, all in VMEM; 2 passes,
per-point pick-tighter-window) → orientation → order-restoring payload
sort; it returns a scalar checksum so the remote-backend sync is one
4-byte transfer. On this benchmark's noisy-scan workload the method
matches exact-kNN quality (0.12 deg mean angle difference, noise
dominated — tests/test_normals.py gates this); see the method
docstring for its noise-free-surface caveat.
"""

from __future__ import annotations

import json
import time

import numpy as np

OPEN3D_NORMALS_MPTS_S = 0.121_000 * 1e6 / 104.543e-3 / 1e6  # = 1.1574


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

    from threecrate_tpu import PointCloud
    from threecrate_tpu.ops.normals import _estimate
    from threecrate_tpu.utils.profiling import median_time

    n = 1_000_000
    cloud = PointCloud.from_numpy(_kitti_like(n))
    big = jnp.float32(3e38)

    @jax.jit
    def run_scalar(points, mask):
        mn = jnp.min(jnp.where(mask[:, None], points, big), 0)
        mx = jnp.max(jnp.where(mask[:, None], points, -big), 0)
        vp = (mn + mx) * 0.5 + jnp.array([0.0, 0.0, 1.0]) * \
            jnp.maximum(mx[2] - mn[2], 1.0)
        nrm, curv, valid = _estimate(points, mask, 10, False,
                                     jnp.float32(0.0), vp, True,
                                     moments=True)
        return jnp.sum(jnp.abs(nrm)) + jnp.sum(valid)

    t = median_time(lambda: run_scalar(cloud.points, cloud.mask),
                    sync_fn=float)
    mpts = n / t / 1e6
    print(json.dumps({
        "metric": "normals_1M_k10_throughput",
        "value": round(mpts, 3),
        "unit": "Mpts/s",
        "vs_baseline": round(mpts / OPEN3D_NORMALS_MPTS_S, 2),
    }))


if __name__ == "__main__":
    main()
