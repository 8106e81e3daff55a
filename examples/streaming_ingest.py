#!/usr/bin/env python
"""Streaming / out-of-core ingestion demo (parallel/streaming.py,
mirroring the reference's streaming.rs pipeline + RealtimePipeline).

Three tiers:
  1. chunked out-of-core voxel downsample: the full cloud never exists
     in memory — memory is O(occupied voxels)
  2. streaming statistics over the same chunk source
  3. realtime bounded-queue ingestion with backpressure metrics

Run: python examples/streaming_ingest.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from threecrate_tpu.parallel.streaming import (BackpressureConfig,
                                               RealtimePipeline,
                                               RunOptions,
                                               StreamingStatistics,
                                               StreamingVoxelFilter,
                                               run_pipeline)


def scan_chunks(n_chunks=50, chunk=20_000, seed=0):
    """Simulated sensor: yields (chunk, 3) float32 batches."""
    rng = np.random.default_rng(seed)
    for i in range(n_chunks):
        ang = rng.uniform(0, 2 * np.pi, chunk)
        r = np.abs(rng.normal(0, 20, chunk)) + 2
        yield np.stack([r * np.cos(ang), r * np.sin(ang),
                        rng.normal(0, 0.1, chunk)], -1).astype(np.float32)


def main():
    total = 50 * 20_000

    # 1. out-of-core voxel downsample
    vf = StreamingVoxelFilter(voxel_size=0.5)
    cloud, stats = run_pipeline(scan_chunks(), vf, RunOptions())
    print(f"voxel stream: {total} pts in {stats.chunks} chunks -> "
          f"{int(cloud.size())} centroids "
          f"({stats.seconds:.2f}s, {total/stats.seconds/1e6:.1f} Mpts/s)")

    # 2. streaming statistics
    st = StreamingStatistics()
    summary, _ = run_pipeline(scan_chunks(), st)
    print(f"stream stats: mean={np.round(summary['mean'], 3)} "
          f"bbox z=[{summary['min'][2]:.2f}, {summary['max'][2]:.2f}]")

    # 3. realtime pipeline with backpressure
    rt = RealtimePipeline(StreamingVoxelFilter(voxel_size=0.5),
                          BackpressureConfig(max_queue_depth=8,
                                             chunk_size=4096,
                                             flush_timeout_s=0.05))
    dropped_sends = 0
    for chunk in scan_chunks(n_chunks=20, chunk=10_000, seed=1):
        if not rt.try_send(chunk):       # non-blocking: drops on overflow
            dropped_sends += 1
        time.sleep(0.002)                # sensor cadence
    result = rt.finish()
    m = rt.metrics
    print(f"realtime: queued={m.queued} processed={m.processed} "
          f"dropped={m.dropped + dropped_sends} -> "
          f"{int(result.size())} centroids")


if __name__ == "__main__":
    main()
