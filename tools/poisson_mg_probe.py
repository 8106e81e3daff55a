"""HW probe: Poisson reconstruction with the multigrid solver at
depth 6 / 7 / 8 (the reference clamps at 6; depth 7-8 are new
capability). Prints one JSON line per config.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/poisson_mg_probe.py
"""
import json
import time

import numpy as np
import jax.numpy as jnp

from threecrate_tpu.core.point_cloud import PointCloud
from threecrate_tpu.reconstruction import poisson
from threecrate_tpu.reconstruction.poisson import PoissonConfig


def main():
    rng = np.random.default_rng(0)
    n = 100_000
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pc = PointCloud.from_numpy(v, normals=v)

    for depth, solver in ((6, "cg"), (6, "multigrid"),
                          (7, "multigrid"), (8, "multigrid")):
        cfg = PoissonConfig(depth=depth, solver=solver)
        # warm (compile) then measure one end-to-end reconstruct
        t0 = time.time()
        mesh = poisson.poisson_reconstruct(pc, cfg)
        verts, faces = mesh.to_numpy()
        cold = time.time() - t0
        t0 = time.time()
        mesh = poisson.poisson_reconstruct(pc, cfg)
        verts, faces = mesh.to_numpy()
        warm = time.time() - t0
        r = np.linalg.norm(verts, axis=1)
        print(json.dumps({
            "depth": depth, "solver": solver,
            "warm_s": round(warm, 2), "cold_s": round(cold, 1),
            "faces": int(len(faces)),
            "radius_med": round(float(np.median(r)), 5),
            "radius_std": round(float(r.std()), 5),
        }), flush=True)


if __name__ == "__main__":
    main()
