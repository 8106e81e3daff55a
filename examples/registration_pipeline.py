#!/usr/bin/env python
"""Pairwise registration walkthrough: filters -> normals -> coarse
(global FPFH+RANSAC) -> fine (point-to-plane ICP).

Run: python examples/registration_pipeline.py [scan_a.ply scan_b.ply]
Without arguments a synthetic scan pair is generated.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")   # demo shapes are host-scale
import threecrate_tpu as tc


def synthetic_pair():
    rng = np.random.default_rng(0)
    xy = rng.uniform(-3, 3, (6000, 2)).astype(np.float32)
    z = 0.5 * np.sin(xy[:, 0] * 2) * np.cos(xy[:, 1] * 1.3)
    pts = np.stack([xy[:, 0], xy[:, 1], z], -1).astype(np.float32)
    t = tc.Transform.from_axis_angle([0, 0, 1], 0.5) @ \
        tc.Transform.from_translation([0.8, -0.4, 0.15])
    moved = np.asarray(t.apply(pts))
    return pts, moved.astype(np.float32), t


def main():
    if len(sys.argv) == 3:
        a = tc.read_point_cloud(sys.argv[1])
        b = tc.read_point_cloud(sys.argv[2])
        t_true = None
    else:
        pa, pb, t_true = synthetic_pair()
        a, b = tc.PointCloud.from_numpy(pa), tc.PointCloud.from_numpy(pb)

    a = tc.statistical_outlier_removal(a, k=8).cloud.compact()
    b = tc.statistical_outlier_removal(b, k=8).cloud.compact()
    a = tc.estimate_normals(a, k=10)
    b = tc.estimate_normals(b, k=10)

    coarse = tc.global_registration(a, b, tc.GlobalRegistrationConfig(
        ransac_iterations=8192, fpfh_radius=0.4, refine_with_icp=False))
    print(f"coarse: inliers={int(coarse.inlier_count)} "
          f"ratio={float(coarse.inlier_ratio):.2f}")

    fine = tc.icp_point_to_plane(a, b, max_iterations=40,
                                 init=coarse.as_transform())
    print(f"fine: converged={bool(fine.converged)} "
          f"iters={int(fine.iterations)} mse={float(fine.mse):.2e}")
    if t_true is not None:
        err = np.abs(np.asarray(fine.transformation)
                     - np.asarray(t_true.matrix)).max()
        print(f"recovery error vs ground truth: {err:.4f}")


if __name__ == "__main__":
    main()
