#!/usr/bin/env python
"""NDT registration demo: voxel Gaussians + Newton refinement.

Mirrors the reference's NDT example usage (threecrate-algorithms
ndt_registration.rs): build the target's normal-distributions voxel
model once, register a perturbed source against it, then refine with
point-to-plane ICP — the coarse-to-fine pattern NDT is used for in
practice (large initial offsets where point-to-point correspondence
would not converge).

Run: python examples/ndt_registration.py
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")   # demo shapes are host-scale
import jax.numpy as jnp

import threecrate_tpu as tc


def synthetic_scene(n=20000, seed=0):
    """Structured urban-ish scene: ground + two walls + boxes."""
    rng = np.random.default_rng(seed)
    parts = []
    g = rng.uniform([-10, -10, -0.05], [10, 10, 0.05], (n // 2, 3))
    parts.append(g)
    w1 = rng.uniform([-10, 4.9, 0], [10, 5.1, 3], (n // 4, 3))
    w2 = rng.uniform([-5.1, -10, 0], [-4.9, 10, 3], (n // 4, 3))
    parts.extend([w1, w2])
    return np.concatenate(parts).astype(np.float32)


def main():
    pts = synthetic_scene()
    target = tc.PointCloud.from_numpy(pts)

    # a LARGE perturbation: 0.25 rad yaw + 1.2 m shift — far outside
    # point-to-point ICP's convergence basin at this density
    true = tc.Transform.from_euler_xyz(
        jnp.asarray([0.0, 0.0, 0.25]), jnp.asarray([1.2, -0.8, 0.1]))
    src_pts = np.asarray(target.transform(true).points)
    source = tc.PointCloud.from_numpy(src_pts)

    # 1. NDT multi-resolution cascade: the convergence basin scales
    # with the cell size, so large offsets need coarse cells first
    # (Magnusson's classic schedule; measured on this scene: the 1.2 m
    # offset is unreachable at any single resolution, the 6→3→1.5 m
    # cascade lands within 0.17)
    init = None
    for res_m, step in ((6.0, 0.5), (3.0, 0.3), (1.5, 0.2)):
        ndt = tc.ndt_registration(
            source, target,
            tc.NdtConfig(resolution=res_m, step_size=step,
                         max_iterations=40), init=init)
        init = ndt.as_transform()
        err = np.abs(np.asarray(init.inverse().matrix)
                     - np.asarray(true.matrix)).max()
        print(f"NDT cells={res_m} m: converged={bool(ndt.converged)}, "
              f"|T - T_true|max={err:.3f}")

    # 2. point-to-plane refinement from the NDT estimate
    tgt_n = tc.estimate_normals(target, k=10)
    fine = tc.icp_point_to_plane(source, tgt_n, max_iterations=30,
                                 init=init)
    t_fine = fine.as_transform().inverse()
    fine_err = np.abs(np.asarray(t_fine.matrix)
                      - np.asarray(true.matrix)).max()
    print(f"p2plane refine: fitness mse={float(fine.mse):.2e}, "
          f"|T - T_true|max={fine_err:.4f}")
    assert fine_err < 0.02, "refinement should land on the true pose"
    print("recovered transform:")
    print(np.asarray(t_fine.matrix).round(4))


if __name__ == "__main__":
    main()
