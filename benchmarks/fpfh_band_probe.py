"""Banded-FPFH probe (r4): timing + quality of the ±band SPFH tier vs
the exact full-window fused path at bench conditions (1M kitti-like,
r=0.5). One batched run; all comparisons stay on device (only summary
scalars cross the tunnel).

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     PALLAS_AXON_REMOTE_COMPILE=1 python benchmarks/fpfh_band_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from threecrate_tpu.ops.features import _fpfh_fused
    from threecrate_tpu.ops.normals import _estimate
    from threecrate_tpu.utils.profiling import median_time

    sys.path.insert(0, "/root/repo")
    from bench import _kitti_like

    n = 1_000_000
    src = jnp.asarray(_kitti_like(n, 0))
    mask = jnp.ones(n, bool)
    big = jnp.float32(3e38)

    @jax.jit
    def normals_fn(p, m):
        mn = jnp.min(jnp.where(m[:, None], p, big), 0)
        mx = jnp.max(jnp.where(m[:, None], p, -big), 0)
        vp = (mn + mx) * 0.5 + jnp.array([0.0, 0.0, 1.0])
        nrm, curv, valid = _estimate(p, m, 10, False, jnp.float32(0.0),
                                     vp, True, moments=True,
                                     window_merge="union")
        return nrm

    nrm = normals_fn(src, mask)
    _ = float(jnp.sum(nrm))
    print("normals ready", flush=True)

    @jax.jit
    def fpfh_exact(p, m, na):
        d, v = _fpfh_fused(p, m, na, 0.5)
        return jnp.sum(d) + jnp.sum(v)

    def make_band(b):
        @jax.jit
        def f(p, m, na):
            d, v = _fpfh_fused(p, m, na, 0.5, band=b)
            return jnp.sum(d) + jnp.sum(v)
        return f

    t_ex = median_time(lambda: fpfh_exact(src, mask, nrm),
                       warmup=1, iters=3, sync_fn=float)
    print(f"exact fused 1M: {t_ex*1e3:.1f} ms", flush=True)

    for b in (32, 64):
        fb = make_band(b)
        t_b = median_time(lambda: fb(src, mask, nrm),
                          warmup=1, iters=3, sync_fn=float)
        print(f"band={b} fused 1M: {t_b*1e3:.1f} ms", flush=True)

    # quality: descriptor cosine banded-vs-exact, on-device stats
    @jax.jit
    def quality(p, m, na, b: int = 64):
        de, ve = _fpfh_fused(p, m, na, 0.5)
        db, vb = _fpfh_fused(p, m, na, 0.5, band=64)
        v = ve & vb
        num = jnp.sum(de * db, axis=1)
        den = jnp.maximum(jnp.linalg.norm(de, axis=1)
                          * jnp.linalg.norm(db, axis=1), 1e-12)
        cos = jnp.where(v, num / den, 1.0)
        med = jnp.median(jnp.where(v, cos, 1.0))
        frac99 = jnp.sum((cos > 0.99) & v) / jnp.maximum(jnp.sum(v), 1)
        frac90 = jnp.sum((cos > 0.90) & v) / jnp.maximum(jnp.sum(v), 1)
        return med, frac99, frac90, jnp.sum(v)

    med, f99, f90, nv = quality(src, mask, nrm)
    print(f"band=64 vs exact at r=0.5: n={int(nv)} median_cos="
          f"{float(med):.5f} frac>0.99={float(f99):.4f} "
          f"frac>0.90={float(f90):.4f}", flush=True)


if __name__ == "__main__":
    main()
