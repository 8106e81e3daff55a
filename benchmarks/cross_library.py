#!/usr/bin/env python
"""Cross-library benchmark harness.

Covers scripts/bench_cross_library.py (512 LoC): run the same tasks on
threecrate-tpu and Open3D (when importable; gracefully skipped
otherwise, like the reference skips PCL), emit a combined CSV, a
markdown table, and the geometric-mean composite score the reference
publishes (docs/benchmarks.md "TL;DR" — composite > 100 means we are
faster on average).

Usage:
  python benchmarks/cross_library.py --synthetic 200000 \
      --tasks voxel,normals,icp --out results
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dataset_bench import median_time, rigid_target, synthetic_cloud  # noqa: E402


def run_ours(task, pts, warmup, iters, voxel, k):
    from dataset_bench import run_task
    return run_task(task, None, pts, warmup, iters, voxel, k)


def run_open3d(task, pts, warmup, iters, voxel, k):
    try:
        import open3d as o3d
    except ImportError:
        return None
    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(pts.astype(np.float64))

    def timeit(fn):
        for _ in range(warmup):
            fn()
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    if task == "voxel":
        return timeit(lambda: pcd.voxel_down_sample(voxel))
    if task in ("normals", "normals_exact"):
        def f():
            p = o3d.geometry.PointCloud(pcd)
            p.estimate_normals(
                o3d.geometry.KDTreeSearchParamKNN(knn=k))
        return timeit(f)
    if task == "icp":
        tgt = o3d.geometry.PointCloud()
        tgt.points = o3d.utility.Vector3dVector(
            rigid_target(pts).astype(np.float64))
        return timeit(lambda: o3d.pipelines.registration.registration_icp(
            pcd, tgt, 1e9, np.eye(4),
            o3d.pipelines.registration.TransformationEstimationPointToPoint(),
            o3d.pipelines.registration.ICPConvergenceCriteria(
                max_iteration=30)))
    return None


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", type=Path, default=None)
    ap.add_argument("--synthetic", type=int, default=200_000)
    ap.add_argument("--tasks", default="voxel,normals,icp")
    ap.add_argument("--iterations", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--voxel-size", type=float, default=0.2)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", type=Path, default=Path("bench_results"))
    args = ap.parse_args()

    if args.dataset is not None:
        import threecrate_tpu as tc
        pts = tc.read_point_cloud(args.dataset).to_numpy()
        name = args.dataset.stem
    else:
        pts = synthetic_cloud(args.synthetic)
        name = f"synthetic_{args.synthetic}"

    tasks = tuple(t.strip() for t in args.tasks.split(","))
    rows = []
    ratios = []
    for task in tasks:
        ours = run_ours(task, pts, args.warmup, args.iterations,
                        args.voxel_size, args.k)
        o3d_t = run_open3d(task, pts, args.warmup, args.iterations,
                           args.voxel_size, args.k)
        ratio = (o3d_t / ours) if (o3d_t and ours) else None
        if ratio:
            ratios.append(ratio)
        rows.append((task, len(pts), ours, o3d_t, ratio))
        print(f"{task}: ours {ours * 1e3:.2f} ms"
              + (f"  open3d {o3d_t * 1e3:.2f} ms  ratio {ratio:.2f}x"
                 if o3d_t else "  (open3d unavailable)"), flush=True)

    args.out.mkdir(parents=True, exist_ok=True)
    csv = ["task,dataset,points,ours_ms,open3d_ms,ratio"]
    md = ["| task | points | ours (ms) | open3d (ms) | ratio |",
          "|---|---:|---:|---:|---:|"]
    for task, n, ours, o3d_t, ratio in rows:
        csv.append(f"{task},{name},{n},{ours * 1e3:.3f},"
                   f"{'' if o3d_t is None else f'{o3d_t * 1e3:.3f}'},"
                   f"{'' if ratio is None else f'{ratio:.3f}'}")
        md.append(f"| {task} | {n} | {ours * 1e3:.2f} | "
                  f"{'-' if o3d_t is None else f'{o3d_t * 1e3:.2f}'} | "
                  f"{'-' if ratio is None else f'{ratio:.2f}x'} |")
    if ratios:
        composite = float(np.exp(np.mean(np.log(ratios))) * 100)
        md.append(f"\ncomposite (geom-mean × 100): **{composite:.1f}**")
        print(f"composite: {composite:.1f}")
    (args.out / "results.csv").write_text("\n".join(csv) + "\n")
    (args.out / "results.md").write_text("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
