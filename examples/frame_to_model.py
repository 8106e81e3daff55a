#!/usr/bin/env python
"""KinectFusion-style frame-to-model odometry demo.

A synthetic depth camera pans across a wavy surface; every frame is
(1) tracked against a raycast of the fused block-sparse TSDF model
(projective point-to-plane Gauss-Newton, `tc.track_frame_to_model`),
then (2) fused into the model at the recovered pose. The final model
is rendered to PNG with the colored raycaster.

This loop has no analog in the reference (threecrate's TSDF,
threecrate-gpu/src/tsdf.rs:83-310, can only be viewed by extracting
points or a mesh); see `threecrate_tpu/ops/tsdf_raycast.py` and
`threecrate_tpu/ops/frame_to_model.py`.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")   # demo shapes are host-scale
import threecrate_tpu as tc
from threecrate_tpu.ops import frame_to_model as f2m
from threecrate_tpu.viz import save_image


def wavy_depth(h, w, shift=0.0):
    yy, xx = np.mgrid[0:h, 0:w]
    d = 2.0 + 0.3 * np.sin((xx + shift) / 12.0) * np.cos(yy / 9.0) \
        + 0.1 * np.sin(yy / 6.0)
    return jnp.asarray(d, jnp.float32)


def pose_x(t):
    m = np.eye(4, dtype=np.float32)
    m[0, 3] = t
    return jnp.asarray(m)


def main():
    h, w = 60, 80
    intr = jnp.asarray([70.0, 70.0, w / 2 - 0.5, h / 2 - 0.5],
                       jnp.float32)
    odo = f2m.FrameToModelOdometry(
        intr, h, w, voxel_size=4.0 / 128, origin=(-2.0, -2.0, 0.5),
        grid_blocks=(16, 16, 16), block=8, max_blocks=4096)

    # camera slides along +x; frames are the same surface seen from
    # the moving camera (depth pattern shifts accordingly)
    true_step = 0.02
    for i in range(5):
        depth = wavy_depth(h, w, shift=i * true_step * 70.0 / 2.0)
        tr = odo.register_frame(depth)
        est = np.asarray(tr.matrix)
        print(f"frame {i}: est x = {est[0, 3]:+.4f} "
              f"(true {i * true_step:+.4f})")

    render = odo.render()
    img = tc.tsdf_shade(render)
    out = Path(__file__).with_suffix(".png")
    save_image(out, np.stack([np.asarray(img)] * 3, axis=-1))
    print(f"model render -> {out} "
          f"({int(np.asarray(render.mask).sum())} hit pixels)")


if __name__ == "__main__":
    main()
