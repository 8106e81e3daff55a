#!/usr/bin/env python
"""Colorization + rendering tour: paint a cloud from camera images,
render it, then fuse a COLORED sparse TSDF and render the model with
the lit colored raycaster.

Covers the reference's colorization example family (threecrate-
algorithms colorization.rs: project points into posed RGB images,
sample colors) plus the rendering layer, and shows the color channel
flowing through the whole mapping stack: images → colored cloud →
colored TSDF blocks → colored raycast render (`shade_rgb`).

Run: python examples/colorize_and_render.py [out_dir]
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")   # demo shapes are host-scale
import jax.numpy as jnp

import threecrate_tpu as tc
from threecrate_tpu.core.organized import CameraIntrinsics
from threecrate_tpu.ops.colorization import RgbImageView, InterpolationMode
from threecrate_tpu.ops import frame_to_model as f2m
from threecrate_tpu.ops import tsdf_raycast as rc
from threecrate_tpu.viz import save_image


H, W = 120, 160
INTR = CameraIntrinsics(140.0, 140.0, W / 2 - 0.5, H / 2 - 0.5)


def wavy_depth():
    yy, xx = np.mgrid[0:H, 0:W]
    d = 2.0 + 0.3 * np.sin(xx / 24.0) * np.cos(yy / 18.0) \
        + 0.1 * np.sin(yy / 12.0)
    return jnp.asarray(d, jnp.float32)


def stripe_image(hue=0.0):
    """Synthetic camera image: smooth color ramps + stripes."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    r = 0.5 + 0.5 * np.sin(xx / 20.0 + hue)
    g = 0.5 + 0.5 * np.cos(yy / 16.0)
    b = 0.5 + 0.5 * np.sin((xx + yy) / 28.0)
    return jnp.asarray(np.stack([r, g, b], -1))


def main():
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp")
    out.mkdir(parents=True, exist_ok=True)

    # ---- back-project a depth frame into a cloud ----
    depth = wavy_depth()
    intr_v = jnp.asarray([INTR.fx, INTR.fy, INTR.cx, INTR.cy],
                         jnp.float32)
    from threecrate_tpu.core.organized import OrganizedPointCloud
    org = OrganizedPointCloud.from_depth_image(depth, INTR)
    cloud = org.to_unorganized()
    print(f"back-projected {int(cloud.size())} points")

    # ---- colorize from a posed camera image (bilinear sampling) ----
    view = RgbImageView(stripe_image(), INTR,
                        jnp.eye(4, dtype=jnp.float32))
    colored = tc.colorize_point_cloud(cloud, view,
                                      mode=InterpolationMode.BILINEAR)
    cols = np.asarray(colored.colors)[np.asarray(colored.mask)]
    print(f"colorized: color range [{cols.min():.2f}, {cols.max():.2f}]")

    # ---- render the colored cloud to PNG ----
    img = tc.viz.show_point_cloud(colored, path=out / "colored_cloud.png")
    print(f"point render -> {out / 'colored_cloud.png'} {img.shape}")

    # ---- fuse a COLORED sparse TSDF and render via raycast ----
    odo = f2m.FrameToModelOdometry(
        intr_v, H, W, voxel_size=4.0 / 128, origin=(-2.0, -2.0, 0.5),
        grid_blocks=(16, 16, 16), block=8, max_blocks=2048,
        with_color=True)
    odo.register_frame(depth, rgb=stripe_image())
    view_rc = odo.render()
    lit = rc.shade_rgb(view_rc)
    save_image(out / "colored_model.png", np.asarray(lit))
    hit = float(np.asarray(view_rc.mask).mean())
    print(f"colored raycast render -> {out / 'colored_model.png'} "
          f"(hit fraction {hit:.2f})")
    assert hit > 0.5


if __name__ == "__main__":
    main()
