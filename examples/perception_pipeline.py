#!/usr/bin/env python
"""Full LiDAR perception pipeline: ground removal -> clustering ->
per-cluster descriptors -> cross-scan matching.

Mirrors the reference's segmentation + features examples
(ground_segmentation.rs, segmentation.rs, features.rs) as one flow:

  scan -> Patchwork++ ground split -> euclidean clustering of the
  non-ground points -> SHOT descriptors at cluster keypoints ->
  descriptor matching against a second scan's keypoints.

Run: python examples/perception_pipeline.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

import threecrate_tpu as tc
from threecrate_tpu.ops import features, ground, segmentation


def lidar_scene(seed=0, n_ground=6000):
    """Ground plane + a few box-ish obstacles."""
    rng = np.random.default_rng(seed)
    gx = rng.uniform(-12, 12, n_ground)
    gy = rng.uniform(-12, 12, n_ground)
    pts = [np.stack([gx, gy, rng.normal(-1.6, 0.02, n_ground)], -1)]
    for i in range(4):
        c = rng.uniform(-8, 8, 2)
        w = rng.uniform(0.5, 1.5, 2)
        hgt = rng.uniform(0.8, 2.0)
        m = 700
        face = rng.integers(0, 3, m)
        u1, u2 = rng.uniform(0, 1, m), rng.uniform(0, 1, m)
        x = np.where(face == 0, (face == 0) * u1 * w[0],
                     np.where(face == 1, w[0], u1 * w[0]))
        y = np.where(face == 1, u2 * w[1], np.where(face == 0, 0, u2 * w[1]))
        z = np.where(face == 2, hgt, u2 * hgt)
        box = np.stack([c[0] + x, c[1] + y, -1.6 + z], -1)
        pts.append(box + rng.normal(0, 0.01, box.shape))
    return np.concatenate(pts).astype(np.float32)


def keypoint_descriptors(cloud, labels, n_clusters, k_per_cluster=24):
    """SHOT descriptors at a strided sample of each cluster's points."""
    pc = tc.estimate_normals(cloud, 10)
    res = features.extract_shot_features(
        pc, features.ShotConfig(radius=0.8, method="window"))
    desc = np.asarray(res.descriptors)
    valid = np.asarray(res.valid)
    keys, key_cluster = [], []
    lab = np.asarray(labels)
    for c in range(n_clusters):
        idx = np.flatnonzero((lab == c) & valid)
        if len(idx) == 0:
            continue
        pick = idx[:: max(len(idx) // k_per_cluster, 1)][:k_per_cluster]
        keys.append(desc[pick])
        key_cluster += [c] * len(pick)
    return np.concatenate(keys), np.asarray(key_cluster)


def main():
    scene = lidar_scene(0)
    pc = tc.PointCloud.from_numpy(scene)

    # 1. ground removal (Patchwork++)
    res = ground.patchwork_plus_plus(pc)
    gmask = np.asarray(res.ground_mask)
    print(f"ground split: {gmask.sum()} ground / "
          f"{int(np.asarray(res.nonground_mask).sum())} obstacle points")

    obstacles = pc.select(res.nonground_mask).compact()

    # 2. euclidean clustering
    cres = segmentation.extract_euclidean_clusters(
        obstacles, segmentation.EuclideanClusterConfig(
            tolerance=0.5, min_cluster_size=50))
    labels, n_clusters = cres.labels, cres.n_clusters
    print(f"clustering: {int(n_clusters)} obstacle clusters")

    # 3-4. descriptors at keypoints, matched across two scans
    scene_b = lidar_scene(0) + np.array([0.3, -0.2, 0.0], np.float32)
    pc_b = tc.PointCloud.from_numpy(scene_b)
    res_b = ground.patchwork_plus_plus(pc_b)
    obstacles_b = pc_b.select(res_b.nonground_mask).compact()
    cres_b = segmentation.extract_euclidean_clusters(
        obstacles_b, segmentation.EuclideanClusterConfig(
            tolerance=0.5, min_cluster_size=50))
    labels_b, n_b = cres_b.labels, cres_b.n_clusters

    da, ca = keypoint_descriptors(obstacles, labels, int(n_clusters))
    db, cb = keypoint_descriptors(obstacles_b, labels_b, int(n_b))
    import jax.numpy as jnp
    j, dist, ok = features.match_descriptors(
        jnp.asarray(da), jnp.ones(len(da), bool),
        jnp.asarray(db), jnp.ones(len(db), bool), mutual=True)
    j, ok = np.asarray(j), np.asarray(ok)
    agree = (cb[j[ok]] >= 0).mean() if ok.any() else 0.0
    print(f"descriptor matching: {ok.sum()}/{len(da)} mutual matches "
          f"across scans")


if __name__ == "__main__":
    main()
