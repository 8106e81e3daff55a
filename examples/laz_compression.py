#!/usr/bin/env python
"""Compressed LiDAR IO: LAS vs LAZ (native LASzip codec) vs .tcz.

Writes the same cloud as uncompressed LAS, LASzip-compressed LAZ
(native C++ codec, parallel chunk decode) and the internal .tcz
Morton-delta format, then compares sizes and verifies lossless
round-trips.
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")   # host-side IO demo
import threecrate_tpu as tc


def main():
    rng = np.random.default_rng(0)
    n = 500_000
    # smooth trajectory sweep — the structure LASzip's predictors exploit
    t = np.linspace(0, 60, n).astype(np.float32)
    pts = np.stack([t * 2.0 + np.sin(t) * 3.0,
                    np.cos(t * 0.7) * 8.0,
                    np.abs(np.sin(t * 0.2)) * 2.0], -1)
    pts += rng.normal(0, 0.01, (n, 3)).astype(np.float32)
    cloud = tc.PointCloud.from_numpy(
        pts, intensity=rng.uniform(0, 1, n).astype(np.float32))

    out = Path("/tmp/tc_laz_example")
    out.mkdir(exist_ok=True)
    sizes = {}
    for ext in ("las", "laz", "tcz"):
        p = out / f"scan.{ext}"
        t0 = time.perf_counter()
        tc.write_point_cloud(p, cloud)
        tw = time.perf_counter() - t0
        t0 = time.perf_counter()
        back = tc.read_point_cloud(p).to_numpy()
        tr = time.perf_counter() - t0
        sizes[ext] = os.path.getsize(p)
        if ext == "tcz":
            # tcz stores points in Morton order — compare as sets on
            # the codec's quantisation lattice (lossless there)
            p64 = pts.astype(np.float64)
            mn, extn = p64.min(0), np.maximum(np.ptp(p64, 0), 1e-12)
            s = ((1 << 14) - 1) / extn
            qa = set(map(tuple, np.round((p64 - mn) * s).astype(np.int64)))
            qb = set(map(tuple,
                         np.round((back.astype(np.float64) - mn) * s
                                  ).astype(np.int64)))
            fidelity = ("lattice-exact (reordered)" if qa == qb
                        else "LOSSY — MISMATCH")
        else:
            fidelity = f"max_err {np.abs(back - pts).max():.2e}"
        print(f"{ext:>4}: {sizes[ext]/1e6:6.2f} MB  write {tw*1e3:6.0f} ms  "
              f"read {tr*1e3:6.0f} ms  {fidelity}")
    print(f"\nLAZ is {sizes['las']/sizes['laz']:.2f}x smaller than LAS")


if __name__ == "__main__":
    main()
