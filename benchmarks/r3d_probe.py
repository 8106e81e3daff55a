"""Round-3 TPU batch: odometry config sweep toward real-time.

Sweeps (model_render_scale, track_stride, update_fraction) on the
512^3v frame-to-model loop. Current state (r3c probe): s=2, stride=1,
frac=0.5 → 258 ms/frame steady. Candidate levers:
  * track_stride=2 — 4x fewer GN residual gathers
  * update_fraction=0.25 — integrate 124→83 ms standalone
  * model_render_scale=3 — raycast cost scales with rays
Accuracy is tracked via the recovered x-translation on the drifting
wavy scene (true +0.0100/frame).
"""

from __future__ import annotations

import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

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

    res, grid_b, mb = 512, (64, 64, 64), 16384
    true_step = 0.01

    for (s, ts, frac) in ((2, 2, 0.5), (2, 2, 0.25), (3, 2, 0.25),
                          (4, 2, 0.25), (2, 1, 0.25)):
        cfg = f2m.FrameToModelConfig(model_render_scale=s,
                                     track_stride=ts,
                                     update_fraction=frac)
        odo = f2m.FrameToModelOdometry(
            intr, h, w, voxel_size=4.0 / res, origin=(-2.0, -2.0, 0.5),
            grid_blocks=grid_b, block=8, max_blocks=mb, config=cfg)
        for i in range(3):
            tr = odo.register_frame(wavy(shift=i * true_step * 525.0 / 2.0))
            _ = np.asarray(tr.matrix)
        t0 = time.perf_counter()
        n_steady = 8
        for i in range(3, 3 + n_steady):
            tr = odo.register_frame(wavy(shift=i * true_step * 525.0 / 2.0))
            _ = np.asarray(tr.matrix)
        _ = float(jnp.sum(odo.volume.weight))
        dt = (time.perf_counter() - t0) / n_steady
        est = np.asarray(tr.matrix)
        true_x = (3 + n_steady - 1) * true_step
        log(f"odometry 512^3v s={s} stride={ts} frac={frac}: "
            f"{dt*1e3:.0f} ms/frame, est x={est[0, 3]:+.4f} "
            f"(true {true_x:+.4f}, err {abs(est[0, 3] - true_x):.4f})")


if __name__ == "__main__":
    main()
