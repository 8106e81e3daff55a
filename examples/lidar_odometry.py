#!/usr/bin/env python
"""KISS-ICP style frame-to-map odometry over synthetic LiDAR sweeps."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")   # demo shapes are host-scale
import threecrate_tpu as tc
from threecrate_tpu.ops.kiss_icp import KissIcpConfig, KissIcpOdometry


def sweep(rng, n=8000):
    ang = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(3, 50, n)
    z = np.abs(rng.normal(0, 1.2, n))
    return np.stack([r * np.cos(ang), r * np.sin(ang), z], -1
                    ).astype(np.float32)


def main():
    rng = np.random.default_rng(0)
    world = sweep(rng)
    odo = KissIcpOdometry(KissIcpConfig(voxel_size=0.8, max_range=60))
    truth = np.zeros(3)
    for step in range(5):
        # sensor moves +x 0.4 m per frame: world points shift -0.4
        frame = world - truth.astype(np.float32)
        pose = odo.register_frame(tc.PointCloud.from_numpy(frame))
        est = np.asarray(pose.matrix)[:3, 3]
        print(f"frame {step}: est {est.round(3)} truth {truth.round(3)}")
        truth = truth + np.array([0.4, 0.0, 0.0])


if __name__ == "__main__":
    main()
