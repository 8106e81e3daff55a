"""Out-of-core streaming & realtime pipelines.

Covers threecrate-algorithms/src/streaming.rs:

* ``StreamingPipeline`` (streaming.rs:74-92): process_chunk/finalize/
  memory accounting over chunked sources, with the ``run_pipeline``
  driver, RunStats and skip_errors (:98-144);
* built-ins: StreamingVoxelFilter (voxel accumulator with O(voxels)
  memory, :197-242), StreamingStatistics (:308), StreamingCollector
  (:382);
* ``RealtimePipeline`` (:440-640): bounded queue + background worker,
  blocking ``send`` (backpressure) vs dropping ``try_send``, atomic
  RealtimeMetrics{queued, processed, dropped, depth} and a
  flush-timeout latency bound.

TPU adaptation (SURVEY §5): chunks are host NumPy arrays padded to a
fixed device batch shape, so every chunk reuses one compiled program;
accumulator state lives on device between chunks (running voxel
centroids are segment-merges, global statistics are running moments).
The realtime side is a host thread + queue feeding the same jitted
step — sensor ingestion is not a TPU collective problem.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Callable, Iterable, Iterator, List, Optional, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from ..core.point_cloud import PointCloud
from ..utils import padding


# ---------------------------------------------------------------------------
# streaming pipeline protocol + driver
# ---------------------------------------------------------------------------

class StreamingPipeline(Protocol):
    """streaming.rs:74-92."""

    def process_chunk(self, chunk: np.ndarray) -> None: ...

    def finalize(self): ...

    def memory_bytes(self) -> int: ...


@dataclasses.dataclass
class RunStats:
    """streaming.rs:98-104."""

    chunks: int = 0
    points: int = 0
    errors: int = 0
    seconds: float = 0.0


@dataclasses.dataclass(frozen=True)
class RunOptions:
    skip_errors: bool = False


def run_pipeline(source: Iterable[np.ndarray], pipeline: StreamingPipeline,
                 options: RunOptions = RunOptions()):
    """Driver (run_pipeline_with_options, streaming.rs:98-144):
    returns (result, RunStats)."""
    stats = RunStats()
    t0 = time.perf_counter()
    for chunk in source:
        try:
            pipeline.process_chunk(np.asarray(chunk, np.float32))
            stats.chunks += 1
            stats.points += len(chunk)
        except Exception:
            stats.errors += 1
            if not options.skip_errors:
                raise
    result = pipeline.finalize()
    stats.seconds = time.perf_counter() - t0
    return result, stats


# ---------------------------------------------------------------------------
# built-in pipelines
# ---------------------------------------------------------------------------

class StreamingVoxelFilter:
    """Out-of-core voxel downsample (streaming.rs:197-242): running
    (sum, count) per voxel key; memory O(occupied voxels), not O(points).

    The accumulator is a host dict keyed by the integer voxel triple —
    chunks themselves never materialise on device; the final centroids
    upload once.
    """

    def __init__(self, voxel_size: float, origin=(0.0, 0.0, 0.0)):
        if voxel_size <= 0:
            raise ValueError("voxel_size must be > 0")
        self.voxel = float(voxel_size)
        self.origin = np.asarray(origin, np.float64)
        self._sums: dict = {}

    def process_chunk(self, chunk: np.ndarray) -> None:
        keys = np.floor((chunk - self.origin) / self.voxel).astype(np.int64)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        sums = np.zeros((len(uniq), 3))
        cnts = np.zeros(len(uniq))
        np.add.at(sums, inv, chunk.astype(np.float64))
        np.add.at(cnts, inv, 1)
        for k, s, c in zip(map(tuple, uniq), sums, cnts):
            if k in self._sums:
                s0, c0 = self._sums[k]
                self._sums[k] = (s0 + s, c0 + c)
            else:
                self._sums[k] = (s, c)

    def finalize(self) -> PointCloud:
        if not self._sums:
            return PointCloud.empty()
        pts = np.stack([s / c for s, c in self._sums.values()])
        return PointCloud.from_numpy(pts.astype(np.float32))

    def memory_bytes(self) -> int:
        return len(self._sums) * (3 * 8 + 8 + 24)


class StreamingStatistics:
    """Running bbox/mean/count over chunks (streaming.rs:308)."""

    def __init__(self) -> None:
        self.count = 0
        self._sum = np.zeros(3, np.float64)
        self._sq = np.zeros(3, np.float64)
        self._min = np.full(3, np.inf)
        self._max = np.full(3, -np.inf)

    def process_chunk(self, chunk: np.ndarray) -> None:
        self.count += len(chunk)
        self._sum += chunk.sum(0)
        self._sq += (chunk.astype(np.float64) ** 2).sum(0)
        self._min = np.minimum(self._min, chunk.min(0))
        self._max = np.maximum(self._max, chunk.max(0))

    def finalize(self) -> dict:
        n = max(self.count, 1)
        mean = self._sum / n
        var = np.maximum(self._sq / n - mean ** 2, 0.0)
        return {"count": self.count, "mean": mean, "std": np.sqrt(var),
                "min": self._min, "max": self._max}

    def memory_bytes(self) -> int:
        return 14 * 8


class StreamingCollector:
    """Accumulate all chunks (streaming.rs:382) — for tests/debug."""

    def __init__(self) -> None:
        self._chunks: List[np.ndarray] = []

    def process_chunk(self, chunk: np.ndarray) -> None:
        self._chunks.append(np.asarray(chunk, np.float32))

    def finalize(self) -> PointCloud:
        if not self._chunks:
            return PointCloud.empty()
        return PointCloud.from_numpy(np.concatenate(self._chunks))

    def memory_bytes(self) -> int:
        return sum(c.nbytes for c in self._chunks)


class StreamingDeviceMap:
    """Run a jitted per-chunk function with a fixed padded batch shape —
    the TPU-shaped streaming stage (one compiled program for the whole
    stream; the reference's analog is chunked rayon work)."""

    def __init__(self, fn: Callable, chunk_capacity: int = 65536):
        self.capacity = chunk_capacity
        self._jitted = jax.jit(fn)
        self._out: List[np.ndarray] = []

    def process_chunk(self, chunk: np.ndarray) -> None:
        n = len(chunk)
        pts = padding.pad_array(chunk.astype(np.float32), self.capacity)
        mask = padding.make_mask(n, self.capacity)
        out = np.asarray(self._jitted(jnp.asarray(pts), jnp.asarray(mask)))
        self._out.append(out[:n])

    def finalize(self) -> np.ndarray:
        return (np.concatenate(self._out) if self._out
                else np.zeros((0, 3), np.float32))

    def memory_bytes(self) -> int:
        return sum(o.nbytes for o in self._out) + self.capacity * 16


# ---------------------------------------------------------------------------
# realtime pipeline (bounded queue + worker thread + metrics)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BackpressureConfig:
    """streaming.rs:449-463."""

    max_queue_depth: int = 1024
    chunk_size: int = 256
    flush_timeout_s: float = 0.010


@dataclasses.dataclass
class RealtimeMetrics:
    """streaming.rs:467-505 (atomics → a lock'd counter block)."""

    queued: int = 0
    processed: int = 0
    dropped: int = 0

    def depth(self) -> int:
        return self.queued - self.processed


class RealtimePipeline:
    """Bounded-queue realtime ingestion (streaming.rs:440-640).

    ``send`` blocks when the queue is full (backpressure); ``try_send``
    drops and counts. A background worker batches points into
    ``chunk_size`` chunks, flushing partial chunks after
    ``flush_timeout_s`` to bound latency.
    """

    def __init__(self, pipeline: StreamingPipeline,
                 config: BackpressureConfig = BackpressureConfig()):
        self.pipeline = pipeline
        self.config = config
        self.metrics = RealtimeMetrics()
        self._lock = threading.Lock()
        self._queue: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(
            maxsize=config.max_queue_depth)
        self._result = None
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- producer side -----------------------------------------------------
    def send(self, points: np.ndarray) -> None:
        """Blocking send — applies backpressure when the queue is full."""
        self._queue.put(np.asarray(points, np.float32))
        with self._lock:
            self.metrics.queued += 1

    def try_send(self, points: np.ndarray) -> bool:
        """Non-blocking send — drops (and counts) on overflow."""
        try:
            self._queue.put_nowait(np.asarray(points, np.float32))
        except queue.Full:
            with self._lock:
                self.metrics.dropped += 1
            return False
        with self._lock:
            self.metrics.queued += 1
        return True

    def finish(self, timeout: Optional[float] = 30.0):
        """Close the stream, join the worker, return finalize() result."""
        self._queue.put(None)
        self._worker.join(timeout=timeout)
        return self._result

    # -- worker side -------------------------------------------------------
    def _run(self) -> None:
        buf: List[np.ndarray] = []
        buffered = 0
        last_flush = time.perf_counter()

        def flush():
            nonlocal buf, buffered, last_flush
            if buf:
                batch = np.concatenate(buf)
                self.pipeline.process_chunk(batch)
                # `processed` counts messages the PIPELINE has consumed
                # (streaming.rs:470-472 items_processed), so it moves at
                # flush time — messages sitting in the pending flush
                # buffer still count toward depth().
                with self._lock:
                    self.metrics.processed += len(buf)
            buf, buffered = [], 0
            last_flush = time.perf_counter()

        while True:
            timeout = max(self.config.flush_timeout_s -
                          (time.perf_counter() - last_flush), 1e-4)
            try:
                item = self._queue.get(timeout=timeout)
            except queue.Empty:
                flush()
                continue
            if item is None:
                flush()
                self._result = self.pipeline.finalize()
                return
            buf.append(item)
            buffered += len(item)
            if buffered >= self.config.chunk_size:
                flush()


class RealtimeVoxelFilter(RealtimePipeline):
    """Sensor-rate voxel downsampling (the reference python API's
    RealtimeVoxelFilter class, threecrate-python/src/lib.rs): a
    RealtimePipeline pre-wired with a StreamingVoxelFilter."""

    def __init__(self, voxel_size: float,
                 config: BackpressureConfig = BackpressureConfig(),
                 origin=(0.0, 0.0, 0.0)):
        super().__init__(StreamingVoxelFilter(voxel_size, origin), config)
