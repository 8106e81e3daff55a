"""Round-4 TPU batch 4: backend-aware device-weld bar.

Poisson e2e at depth 6 now routes its ~2M-row banded-MC soup through
the device weld on accelerators (bar dropped 6M -> 750k there; the r3c
numbers with the host weld were 1.2 s d6 / 0.83 s d7 on the 100k noisy
sphere). Expect d6 to shed the padded-soup pull (~0.3 s).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r4d_probe.py
"""

from __future__ import annotations

import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def main() -> None:
    import jax

    from threecrate_tpu.core.point_cloud import PointCloud
    from threecrate_tpu.reconstruction.poisson import (PoissonConfig,
                                                       poisson_reconstruct)

    assert jax.default_backend() != "cpu"
    log("backend:", jax.default_backend())

    rng = np.random.default_rng(0)
    n = 100_000
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v + rng.normal(0, 0.005, (n, 3)).astype(np.float32)
    # analytic sphere normals (what the r3c poisson probes used)
    pc = PointCloud.from_numpy(pts, normals=v)

    for depth in (6, 7):
        cfg = PoissonConfig(depth=depth)
        t0 = time.perf_counter()
        mesh = poisson_reconstruct(pc, cfg)
        log(f"poisson d{depth} COLD e2e: {time.perf_counter()-t0:.2f} s "
            f"({mesh.face_count()} faces)")
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            mesh = poisson_reconstruct(pc, cfg)
            times.append(time.perf_counter() - t0)
        log(f"poisson d{depth} WARM e2e: {min(times):.2f} s "
            f"(r3c host-weld: {'1.2' if depth == 6 else '0.83'} s)")
        vr = np.linalg.norm(mesh.to_numpy()[0], axis=1)
        log(f"  radius median {np.median(vr):.4f} std {vr.std():.4f}")

    log("DONE")


if __name__ == "__main__":
    main()
