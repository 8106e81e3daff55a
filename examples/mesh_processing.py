#!/usr/bin/env python
"""Mesh-processing tour: smoothing, booleans, simplification, LODs.

Covers the reference's mesh example family (mesh_smoothing.rs,
mesh_boolean.rs, simplification crates, progressive.rs) in one flow:

  sphere mesh -> laplacian/taubin smooth -> CSG union with a cube ->
  quadric simplify -> progressive-mesh LOD ladder -> GLB export.

Run: python examples/mesh_processing.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

import threecrate_tpu as tc
from threecrate_tpu.ops import mesh_boolean, mesh_smoothing
from threecrate_tpu.simplification import ProgressiveMesh, simplify_mesh


def uv_sphere(n_u=48, n_v=24, r=1.0, center=(0, 0, 0)):
    us = np.linspace(0, 2 * np.pi, n_u, endpoint=False)
    vs = np.linspace(1e-3, np.pi - 1e-3, n_v)
    verts, faces = [], []
    for v in vs:
        for u in us:
            verts.append([r * np.sin(v) * np.cos(u) + center[0],
                          r * np.sin(v) * np.sin(u) + center[1],
                          r * np.cos(v) + center[2]])
    for i in range(n_v - 1):
        for j in range(n_u):
            a = i * n_u + j
            b = i * n_u + (j + 1) % n_u
            c = (i + 1) * n_u + j
            d = (i + 1) * n_u + (j + 1) % n_u
            faces += [[a, b, c], [b, d, c]]
    return tc.TriangleMesh.from_numpy(
        np.asarray(verts, np.float32), np.asarray(faces, np.int32))


def box(size=1.2, center=(0.8, 0.0, 0.0)):
    s = size / 2
    c = np.asarray(center, np.float32)
    v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                  for z in (-s, s)], np.float32) + c
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return tc.TriangleMesh.from_numpy(v, f)


def main():
    sphere = uv_sphere()
    noisy = tc.TriangleMesh.from_numpy(
        np.asarray(sphere.vertices)[: int(sphere.vertex_count())]
        + np.random.default_rng(0).normal(
            0, 0.02, (int(sphere.vertex_count()), 3)).astype(np.float32),
        np.asarray(sphere.faces)[: int(sphere.face_count())])
    print(f"sphere: {int(sphere.vertex_count())} verts "
          f"{int(sphere.face_count())} faces")

    lap = mesh_smoothing.smooth_laplacian(
        noisy, mesh_smoothing.LaplacianConfig(iterations=5))
    tau = mesh_smoothing.smooth_taubin(
        noisy, mesh_smoothing.TaubinConfig(iterations=10))
    rms = lambda m: float(np.sqrt(np.mean(
        (np.linalg.norm(np.asarray(m.vertices)[:int(m.vertex_count())],
                        axis=1) - 1.0) ** 2)))
    print(f"smoothing RMS radius error: noisy={rms(noisy):.4f} "
          f"laplacian={rms(lap):.4f} taubin={rms(tau):.4f}")

    joined = mesh_boolean.mesh_union(sphere, box())
    print(f"CSG union with cube: {int(joined.face_count())} faces")

    simple = simplify_mesh(joined, target_faces=max(
        int(joined.face_count()) // 3, 50))
    print(f"quadric simplify: {int(joined.face_count())} -> "
          f"{int(simple.face_count())} faces")

    pm = ProgressiveMesh.from_mesh(sphere, base_faces=200)
    n = len(pm.splits)
    for frac in (0.0, 0.5, 1.0):
        lod = pm.mesh_at(int(n * frac))
        print(f"LOD {frac:.2f}: {int(lod.face_count())} faces")

    tc.write_mesh("/tmp/mesh_tour.glb", simple)
    print("wrote /tmp/mesh_tour.glb")

    # offscreen renders: flat vs PBR (ShadingMode analog,
    # gpu/src/mesh.rs:849-1069)
    from threecrate_tpu.viz import (PbrMaterial, render_to_texture,
                                    save_image)
    img_flat = render_to_texture(simple, width=320, height=240,
                                 shading_mode="flat")
    img_pbr = render_to_texture(
        simple, width=320, height=240, shading_mode="pbr",
        material=PbrMaterial(albedo=(0.8, 0.5, 0.2), metallic=0.6,
                             roughness=0.25))
    save_image("/tmp/mesh_tour_flat.png", img_flat)
    save_image("/tmp/mesh_tour_pbr.png", img_pbr)
    print("rendered /tmp/mesh_tour_{flat,pbr}.png")


if __name__ == "__main__":
    main()
