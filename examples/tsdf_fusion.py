#!/usr/bin/env python
"""TSDF fusion of a synthetic depth sequence -> isosurface mesh.

The whole sequence fuses in one lax.scan device program; the surface
comes out through marching tetrahedra.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax.numpy as jnp
import jax

jax.config.update("jax_platforms", "cpu")   # demo shapes are host-scale
import threecrate_tpu as tc
from threecrate_tpu.reconstruction import VolumetricGrid, marching_cubes


def main():
    res, vox = 96, 0.02
    vol = tc.create_tsdf_volume((res, res, res), vox,
                                origin=(-0.96, -0.96, 0.0))
    # orbiting camera looking at a wall + box scene
    h, w = 120, 160
    fx = fy = 120.0
    intr = jnp.asarray([fx, fy, w / 2, h / 2], jnp.float32)
    depths, poses = [], []
    for ang in np.linspace(0, 0.6, 8):
        depth = np.full((h, w), 1.2, np.float32)
        depth[40:80, 60:100] = 0.9  # a box sticking out
        c, s = np.cos(ang), np.sin(ang)
        pose = np.array([[c, 0, s, 0.2 * s], [0, 1, 0, 0],
                         [-s, 0, c, 0], [0, 0, 0, 1]], np.float32)
        depths.append(depth)
        poses.append(pose)
    vol = tc.tsdf_integrate_sequence(
        vol, jnp.asarray(np.stack(depths)), intr,
        jnp.asarray(np.stack(poses)))
    surf = tc.tsdf_extract_surface(vol)
    print("surface points:", int(surf.count))
    mesh = marching_cubes(VolumetricGrid(vol.tsdf, vol.origin,
                                         vol.voxel_size), 0.0)
    v, f = mesh.to_numpy()
    print("mesh:", v.shape[0], "verts", f.shape[0], "faces")
    tc.write_mesh("/tmp/tsdf_surface.ply", mesh)
    print("wrote /tmp/tsdf_surface.ply")

    # -- block-sparse variant: same frames, surface-band blocks only --
    from threecrate_tpu.reconstruction.marching_cubes import soup_to_mesh
    grid_blocks = (12, 12, 12)            # 96^3 virtual in 8^3 blocks
    svol = tc.create_sparse_tsdf_volume(vox, origin=(-0.96, -0.96, 0.0),
                                        grid_blocks=grid_blocks,
                                        block=8, max_blocks=512)
    for d, p in zip(depths, poses):
        svol = tc.sparse_tsdf_integrate(svol, jnp.asarray(d), intr,
                                        jnp.asarray(p),
                                        grid_blocks=grid_blocks)
    frac = int(svol.n_blocks) / (12 ** 3)
    smesh = soup_to_mesh(tc.sparse_tsdf_marching_cubes_soup(
        svol, grid_blocks))
    print(f"sparse: {int(svol.n_blocks)} blocks ({frac:.1%} of the "
          f"virtual grid), mesh {int(smesh.face_count())} faces")


if __name__ == "__main__":
    main()
