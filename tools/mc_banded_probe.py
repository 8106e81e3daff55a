"""HW probe: banded vs dense marching cubes at 128^3 / 256^3.

Same methodology as the r3 dense numbers in docs/benchmarks.md (sphere
SDF grid, scalar-reduced output, median of 3 after 1 warmup). Run:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/mc_banded_probe.py
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from threecrate_tpu.reconstruction.marching_cubes import (
    VolumetricGrid, extract_soup_cubes, extract_soup_cubes_banded,
    _block_active_count)
from threecrate_tpu.utils.profiling import median_time


def sphere_grid(res: int) -> VolumetricGrid:
    ax = np.linspace(-1.2, 1.2, res, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    vals = np.sqrt(x * x + y * y + z * z) - 1.0
    return VolumetricGrid(values=jnp.asarray(vals),
                          origin=jnp.zeros(3, jnp.float32),
                          spacing=jnp.float32(2.4 / (res - 1)))


def scalar(soup):
    keep = jnp.repeat(soup.mask, 3)
    return jnp.sum(jnp.where(keep[:, None], soup.vertices, 0.0))


def main():
    for res in (128, 256):
        g = sphere_grid(res)
        n_act = int(_block_active_count(g.values, jnp.float32(0.0), block=8))
        cap = 256
        while cap < n_act:
            cap *= 2

        dense = jax.jit(lambda gr: scalar(extract_soup_cubes(
            gr, jnp.float32(0.0))))
        banded = jax.jit(lambda gr: scalar(extract_soup_cubes_banded(
            gr, jnp.float32(0.0), block=8, max_blocks=cap)))

        td = median_time(lambda: float(dense(g)), warmup=1, iters=3,
                         sync_fn=lambda x: x)
        tb = median_time(lambda: float(banded(g)), warmup=1, iters=3,
                         sync_fn=lambda x: x)
        print(json.dumps({
            "res": res, "active_blocks": n_act, "cap": cap,
            "dense_ms": round(td * 1e3, 1),
            "banded_ms": round(tb * 1e3, 1),
            "speedup": round(td / tb, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
