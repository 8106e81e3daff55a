"""HW probe: banded vs dense TSDF extract_surface at 128^3 / 256^3.

Same fused scene as benchmarks/r3_probe.py (20 wavy depth frames),
so numbers are comparable with the r3 dense rows in docs/benchmarks.md.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/extract_banded_probe.py
"""
import json

import numpy as np
import jax
import jax.numpy as jnp

from threecrate_tpu.ops import tsdf as tsdf_mod
from threecrate_tpu.utils.profiling import median_time


def main():
    h, w = 480, 640
    intr = jnp.asarray([525.0, 525.0, w / 2.0, h / 2.0], jnp.float32)
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

        @jax.jit
        def fuse(v, dd, pp):
            return tsdf_mod.integrate_sequence(v, dd, intr, pp)

        fused = fuse(vol, jnp.asarray(depths), jnp.asarray(poses))

        n_act = int(tsdf_mod._surface_active_count(fused, 1.0, block=8))
        cap = 256
        while cap < n_act:
            cap *= 2

        @jax.jit
        def surf_dense(v):
            sp = tsdf_mod.extract_surface(v)
            return jnp.sum(jnp.where(sp.cloud.mask[:, None],
                                     sp.cloud.points, 0.0)) + sp.count

        @jax.jit
        def surf_banded(v):
            sp = tsdf_mod.extract_surface_banded(v, 1.0, block=8,
                                                 max_blocks=cap)
            return jnp.sum(jnp.where(sp.cloud.mask[:, None],
                                     sp.cloud.points, 0.0)) + sp.count

        td = median_time(lambda: float(surf_dense(fused)), warmup=1,
                         iters=3, sync_fn=lambda x: x)
        tb = median_time(lambda: float(surf_banded(fused)), warmup=1,
                         iters=3, sync_fn=lambda x: x)
        print(json.dumps({
            "res": res3, "active_blocks": n_act, "cap": cap,
            "dense_ms": round(td * 1e3, 1),
            "banded_ms": round(tb * 1e3, 1),
            "speedup": round(td / tb, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
