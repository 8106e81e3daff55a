"""Round-3 TPU batch: band-compacted sparse_integrate + odometry.

Measures the effect of sparse_integrate's update_fraction compaction
(only blocks in the current frame's truncation band are projected and
depth-gathered; commit 0ec88da) on:

1. standalone sparse_integrate at 256^3v / 512^3v (old numbers:
   62.9 / 159.4 ms per frame at update_fraction=1.0 semantics)
2. the full frame-to-model odometry loop at 512^3v with
   model_render_scale=2 (old number: 324 ms/frame steady)

Also checks integrate parity (sum of weights after a short camera
path, fraction 1.0 vs 0.5) at full scale on the chip.
"""

from __future__ import annotations

import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from threecrate_tpu.utils.profiling import median_time
    from threecrate_tpu.ops import tsdf_sparse as sp
    from threecrate_tpu.ops import frame_to_model as f2m

    assert jax.default_backend() != "cpu"
    log("backend:", jax.default_backend())

    h, w = 480, 640
    intr = jnp.asarray([525.0, 525.0, w / 2, h / 2], jnp.float32)
    yy, xx = np.mgrid[0:h, 0:w]

    def wavy(shift=0.0):
        d = (2.0 + 0.3 * np.sin((xx + shift) / 60.0)
             * np.cos(yy / 45.0)).astype(np.float32)
        return jnp.asarray(d)

    eye = jnp.asarray(np.eye(4, dtype=np.float32))

    # ---------------- 1. standalone integrate ----------------
    for res, grid_b, mb in ((256, (32, 32, 32), 4096),
                            (512, (64, 64, 64), 16384)):
        svol = sp.create_sparse_volume(
            4.0 / res, origin=(-2.0, -2.0, 0.5), grid_blocks=grid_b,
            block=8, max_blocks=mb)
        d0 = wavy()
        svol = sp.sparse_integrate(svol, d0, intr, eye,
                                   grid_blocks=grid_b, block=8,
                                   update_fraction=1.0)
        for frac in (1.0, 0.5, 0.25):
            def run(frac=frac):
                out = sp.sparse_integrate(svol, d0, intr, eye,
                                          grid_blocks=grid_b, block=8,
                                          update_fraction=frac)
                return float(jnp.sum(out.weight))

            t = median_time(run, warmup=1, iters=5,
                            sync_fn=lambda x: x)
            log(f"integrate {res}^3v frac={frac}: {t*1e3:.1f} ms")

    # parity at full scale over a short path (512^3v)
    grid_b, mb, res = (64, 64, 64), 16384, 512
    sums = {}
    for frac in (1.0, 0.5):
        vol = sp.create_sparse_volume(
            4.0 / res, origin=(-2.0, -2.0, 0.5), grid_blocks=grid_b,
            block=8, max_blocks=mb)
        for i in range(4):
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = 0.02 * i
            vol = sp.sparse_integrate(vol, wavy(shift=2.6 * i), intr,
                                      jnp.asarray(pose),
                                      grid_blocks=grid_b, block=8,
                                      update_fraction=frac)
        sums[frac] = (float(jnp.sum(vol.weight)),
                      float(jnp.sum(jnp.abs(vol.tsdf * vol.weight))))
    log("parity 512^3v w-sum / |t*w|-sum:", sums)

    # ---------------- 2. odometry steady ----------------
    for frac in (1.0, 0.5):
        cfg = f2m.FrameToModelConfig(model_render_scale=2,
                                     update_fraction=frac)
        odo = f2m.FrameToModelOdometry(
            intr, h, w, voxel_size=4.0 / res, origin=(-2.0, -2.0, 0.5),
            grid_blocks=grid_b, block=8, max_blocks=mb, config=cfg)
        true_step = 0.01
        # warmup frames 0-2 compile track+integrate paths
        for i in range(3):
            tr = odo.register_frame(wavy(shift=i * true_step * 525.0 / 2.0))
            _ = np.asarray(tr.matrix)
        t0 = time.perf_counter()
        n_steady = 8
        for i in range(3, 3 + n_steady):
            tr = odo.register_frame(wavy(shift=i * true_step * 525.0 / 2.0))
            _ = np.asarray(tr.matrix)
        _ = float(jnp.sum(odo.volume.weight))   # force last integrate
        dt = (time.perf_counter() - t0) / n_steady
        est = np.asarray(tr.matrix)
        log(f"odometry 512^3v s=2 frac={frac}: {dt*1e3:.0f} ms/frame, "
            f"est x={est[0, 3]:+.4f} (true {(3 + n_steady - 1) * 0.01:+.4f})")


if __name__ == "__main__":
    main()
