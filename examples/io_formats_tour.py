#!/usr/bin/env python
"""I/O format tour: round-trip one cloud through every writable format.

Covers the reference's io example family (threecrate-io): PLY (ascii +
binary), PCD, XYZ, LAS 1.2 / LAS 1.4 / LAZ, E57, ROS2 PointCloud2, and
the tcz compression codec — each written, re-read, and checked against
the original.

Run: python examples/io_formats_tour.py
"""
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

import threecrate_tpu as tc


def main():
    rng = np.random.default_rng(0)
    n = 20_000
    pts = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    inten = rng.uniform(0, 1, n).astype(np.float32)
    pc = tc.PointCloud.from_numpy(pts, colors=colors, intensity=inten)

    tmp = Path(tempfile.mkdtemp(prefix="tc_io_"))
    cases = ["cloud.ply", "cloud.pcd", "cloud.xyz", "cloud.las",
             "cloud.laz", "cloud.e57", "cloud.tcz"]
    for name in cases:
        path = tmp / name
        try:
            tc.write_point_cloud(str(path), pc)
            back = tc.read_point_cloud(str(path))
            err = np.abs(np.sort(back.to_numpy(), axis=0)
                         - np.sort(pts, axis=0)).max()
            kb = path.stat().st_size / 1024
            print(f"{name:12s} {kb:9.1f} KB   max coord err {err:.2e}")
        except Exception as e:
            print(f"{name:12s} FAILED: {e}")

    # PCD binary_compressed (LZF; a mode the reference rejects)
    from threecrate_tpu.io import pcd
    pcd.write_point_cloud(str(tmp / "cloud_c.pcd"), pc, compressed=True)
    back = pcd.read_point_cloud(str(tmp / "cloud_c.pcd"))
    plain = (tmp / "cloud.pcd").stat().st_size
    comp = (tmp / "cloud_c.pcd").stat().st_size
    print(f"PCD binary_compressed: {int(back.size())} pts, "
          f"{comp / 1024:.1f} KB vs {plain / 1024:.1f} KB plain")

    # LAS 1.4 extended formats
    from threecrate_tpu.io import las
    las.write_point_cloud(str(tmp / "cloud14.las"), pc, point_format=7)
    back = las.read_point_cloud(str(tmp / "cloud14.las"))
    print(f"LAS 1.4 fmt 7 round-trip: {int(back.size())} pts, "
          f"colors kept: {'colors' in back.attrs}")

    # ROS2 PointCloud2 both directions
    from threecrate_tpu.io import ros2
    msg = ros2.make_pointcloud2(pc)
    back = ros2.from_pointcloud2(msg)
    print(f"ROS2 PointCloud2: {int(back.size())} pts, "
          f"fields: {[f['name'] for f in msg['fields']]}")


if __name__ == "__main__":
    main()
