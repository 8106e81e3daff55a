#!/usr/bin/env python
"""Surface reconstruction comparison on a synthetic scan."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")   # demo shapes are host-scale
import threecrate_tpu as tc
from threecrate_tpu import reconstruction as recon


def main():
    i = np.arange(4000, dtype=np.float64)
    phi = np.arccos(1 - 2 * (i + 0.5) / 4000)
    theta = np.pi * (1 + 5 ** 0.5) * i
    pts = np.stack([np.cos(theta) * np.sin(phi),
                    np.sin(theta) * np.sin(phi), np.cos(phi)],
                   -1).astype(np.float32)
    cloud = tc.estimate_normals(tc.PointCloud.from_numpy(pts), k=10)

    result = recon.auto_reconstruct_detailed(cloud)
    print(f"auto selected: {result.algorithm.value} "
          f"({result.quality.n_faces} faces, "
          f"watertight {result.quality.watertight_score:.2f})")

    for name, mesh in [
        ("poisson", tc.poisson_reconstruct(cloud)),
        ("marching_cubes", tc.reconstruct_marching_cubes(cloud, 48)),
        ("alpha_shape", tc.alpha_shape_reconstruction(cloud)),
        ("bpa", tc.ball_pivoting_reconstruction(cloud)),
    ]:
        v, f = mesh.to_numpy()
        print(f"{name:16s}: {len(v):6d} verts {len(f):6d} faces")
    simple = tc.simplify_mesh(tc.poisson_reconstruct(cloud), 2000)
    v, f = simple.to_numpy()
    print(f"{'simplified':16s}: {len(v):6d} verts {len(f):6d} faces")

    # High-depth Poisson: depth 7/8 run the geometric multigrid solver
    # (the reference clamps depth at 6 — its external octree-FEM crate
    # is the solver; here the bound was unpreconditioned CG, and the
    # V-cycle hierarchy removes it at a mesh-independent cycle count).
    # density_trim (default) drops far-field spurious components where
    # the indicator function is unconstrained by data.
    from threecrate_tpu import PoissonConfig
    for depth in (7, 8):
        mesh = tc.poisson_reconstruct(cloud, PoissonConfig(depth=depth))
        v, f = mesh.to_numpy()
        r = np.linalg.norm(v, axis=1)
        print(f"{'poisson d%d' % depth:16s}: {len(v):6d} verts "
              f"{len(f):6d} faces  radius {np.median(r):.4f} "
              f"+/- {r.std():.4f}")


if __name__ == "__main__":
    main()
