#!/usr/bin/env python
"""Dataset benchmark CLI.

Covers examples/threecrate_dataset_bench.rs (433 LoC): tasks over a
dataset file (or synthetic clouds) with warmups → timed iterations →
median CSV rows in the same schema the reference's cross-library
harness consumes (library,dataset,task,points,median_ms,...). The ICP
task uses the reference's synthetic near-identity rigid target when no
pair is given (translation (0.05, −0.02, 0.01), 0.02 rad about z —
threecrate_dataset_bench.rs:20-80 / docs/benchmarks.md "Method notes").

Usage:
  python benchmarks/dataset_bench.py --dataset scan.ply \
      --tasks read,voxel,normals,icp --iterations 5 --warmup 2
  python benchmarks/dataset_bench.py --synthetic 1000000 --tasks all
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TASKS = ("read", "voxel", "normals", "normals_exact", "icp",
         "multiscale_icp", "fpfh", "tsdf", "knn")


def synthetic_cloud(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, n)
    r = np.abs(rng.normal(0, 25, n)) + 2.0
    pts = np.stack([r * np.cos(ang), r * np.sin(ang),
                    rng.normal(0, 0.05, n)], -1)
    lift = rng.uniform(0, 1, n) < 0.3
    pts[lift, 2] = rng.uniform(0, 4, lift.sum())
    return pts.astype(np.float32)


def rigid_target(pts: np.ndarray) -> np.ndarray:
    """Near-identity rigid target (docs/benchmarks.md method notes)."""
    c, s = np.cos(0.02), np.sin(0.02)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    return (pts @ rot.T + np.array([0.05, -0.02, 0.01], np.float32))


def median_time(fn, warmup: int, iters: int) -> float:
    # remote-backend-safe sync lives in utils.profiling (block_until_
    # ready can be a no-op over tunneled PJRT transports)
    from threecrate_tpu.utils.profiling import median_time as _mt
    return _mt(fn, warmup, iters)


def run_task(task: str, path, pts: np.ndarray, warmup: int, iters: int,
             voxel: float, k: int, collect: dict = None) -> float:
    """``collect`` (optional dict): receives ``peak_bytes`` — the
    device peak-memory delta of one task invocation, the TPU analog of
    the reference's instrumented-allocator benches
    (threecrate-bench/src/mem/allocations.rs:19-55)."""
    import jax.numpy as jnp

    # the inner def below makes ``median_time`` function-local, so BOTH
    # branches must bind it (the conditional-shadowing first version
    # left the no-memory path with an UnboundLocalError)
    _outer_mt = globals()["median_time"]
    if collect is None:
        median_time = _outer_mt
    else:
        from threecrate_tpu.utils.profiling import measure_peak_memory

        def median_time(fn, warmup, iters):
            t = _outer_mt(fn, warmup, iters)
            try:
                _, peak = measure_peak_memory(fn)
                collect["peak_bytes"] = int(peak)
            except Exception:
                collect["peak_bytes"] = -1
            return t

    import threecrate_tpu as tc
    from threecrate_tpu.ops.normals import (
        NormalEstimationConfig, estimate_normals_detailed)

    cloud = tc.PointCloud.from_numpy(pts)

    if task == "read":
        if path is None:
            raise ValueError("read task needs --dataset")
        return median_time(lambda: tc.read_point_cloud(path).points,
                           warmup, iters)
    if task == "voxel":
        return median_time(lambda: tc.voxel_grid_filter(cloud, voxel).points,
                           warmup, iters)
    if task in ("normals", "normals_exact"):
        method = "window" if task == "normals" else "exact"
        cfg = NormalEstimationConfig(k_neighbors=k, method=method)
        return median_time(
            lambda: estimate_normals_detailed(cloud, cfg).normals,
            warmup, iters)
    if task == "knn":
        return median_time(
            lambda: tc.knn_window(cloud.points, cloud.mask, k,
                                  n_passes=2).distances,
            warmup, iters)
    if task == "icp":
        tgt = tc.PointCloud.from_numpy(rigid_target(pts))
        return median_time(
            lambda: tc.icp_point_to_point(
                cloud, tgt, max_iterations=30).transformation,
            warmup, iters)
    if task == "multiscale_icp":
        tgt = tc.PointCloud.from_numpy(rigid_target(pts))
        return median_time(
            lambda: tc.multiscale_icp_point_to_point(cloud, tgt
                                                     ).transformation,
            warmup, max(iters // 2, 1))
    if task == "fpfh":
        sub = tc.PointCloud.from_numpy(pts[:min(len(pts), 100_000)])
        withn = tc.estimate_normals(sub, k=k)
        return median_time(
            lambda: tc.extract_fpfh_features_with_normals(
                withn, tc.FpfhConfig(radius=voxel * 5)).descriptors,
            warmup, iters)
    if task == "tsdf":
        vol = tc.create_tsdf_volume((128, 128, 128), 0.02,
                                    origin=(-1.3, -1.3, 0.0))
        depth = jnp.asarray(
            np.full((480, 640), 1.0, np.float32))
        intr = jnp.asarray([525.0, 525.0, 320.0, 240.0], jnp.float32)
        pose = jnp.eye(4)
        return median_time(
            lambda: tc.tsdf_integrate(vol, depth, intr, pose).tsdf,
            warmup, iters)
    raise ValueError(f"unknown task {task!r}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", type=Path, default=None)
    ap.add_argument("--synthetic", type=int, default=None,
                    help="generate N synthetic points instead of a file")
    ap.add_argument("--tasks", default="voxel,normals,icp")
    ap.add_argument("--iterations", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--voxel-size", type=float, default=0.2)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--max-points", type=int, default=None)
    ap.add_argument("--csv", type=Path, default=None)
    ap.add_argument("--memory", action="store_true",
                    help="also report each task's device peak-memory "
                         "delta (the allocation-bench analog; n/a on "
                         "backends without memory_stats)")
    ap.add_argument("--backend", default="auto",
                    choices=("auto", "cpu", "tpu"),
                    help="pin the jax backend (the container may "
                         "force-register a remote TPU that env vars "
                         "cannot override; 'cpu' makes local runs fast)")
    args = ap.parse_args()

    if args.backend != "auto":
        import jax
        jax.config.update("jax_platforms", args.backend)

    import threecrate_tpu as tc

    if args.dataset is not None:
        pts = tc.read_point_cloud(args.dataset).to_numpy()
        name = args.dataset.stem
    elif args.synthetic:
        pts = synthetic_cloud(args.synthetic)
        name = f"synthetic_{args.synthetic}"
    else:
        pts = synthetic_cloud(100_000)
        name = "synthetic_100000"
    if args.max_points is not None and len(pts) > args.max_points:
        pts = pts[:args.max_points]

    tasks = TASKS if args.tasks == "all" else tuple(
        t.strip() for t in args.tasks.split(","))
    hdr = "library,dataset,task,points,median_ms"
    rows = [hdr + ",peak_mb" if args.memory else hdr]
    for task in tasks:
        try:
            collect = {} if args.memory else None
            t = run_task(task, args.dataset, pts, args.warmup,
                         args.iterations, args.voxel_size, args.k,
                         collect)
            row = f"threecrate_tpu,{name},{task},{len(pts)},{t * 1e3:.3f}"
            if args.memory:
                peak = collect.get("peak_bytes", -1)
                row += f",{peak / 1e6:.1f}" if peak >= 0 else ",n/a"
            rows.append(row)
            print(rows[-1], flush=True)
        except Exception as e:  # noqa: BLE001 — keep benching other tasks
            print(f"# {task} failed: {e}", file=sys.stderr)
    if args.csv:
        args.csv.write_text("\n".join(rows) + "\n")


if __name__ == "__main__":
    main()
