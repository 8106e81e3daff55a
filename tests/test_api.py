"""API-surface + streaming + ROS2 + compression tests.

Verifies the tc.* flat surface matches the reference python module
(SURVEY §2.8) and exercises the end-to-end BASELINE bunny slice:
read → voxel → normals → icp self-align → write."""

import numpy as np
import pytest

import threecrate_tpu as tc
from threecrate_tpu.parallel import streaming

from conftest import make_sphere_points


REFERENCE_SURFACE = [
    # io
    "read_point_cloud", "write_point_cloud", "read_mesh", "write_mesh",
    "read_point_cloud_iter", "read_mesh_iter", "supported_extensions",
    # filtering
    "voxel_grid_filter", "voxel_downsample", "statistical_outlier_removal",
    "radius_outlier_removal", "passthrough_filter", "range_filter",
    # normals
    "estimate_normals", "estimate_normals_with_config",
    # registration (7 entry points + global)
    "icp", "icp_point_to_point", "icp_point_to_plane",
    "multiscale_icp_point_to_point", "gicp", "kiss_icp",
    "ndt_registration", "global_registration",
    # features
    "extract_fpfh_features", "extract_fpfh_features_with_normals",
    "extract_shot_features", "extract_usc_features", "match_descriptors",
    # segmentation
    "segment_plane", "segment_plane_parallel",
    "extract_euclidean_clusters", "patchwork_plus_plus", "segment_ground",
    # mesh ops
    "mesh_boolean", "mesh_union", "mesh_intersection", "mesh_difference",
    "smooth_laplacian", "smooth_taubin", "smooth_hc", "simplify_mesh",
    # reconstruction
    "poisson_reconstruct", "ball_pivoting_reconstruction",
    "alpha_shape_reconstruction", "delaunay_reconstruction",
    "marching_cubes", "reconstruct_marching_cubes", "mls_smooth",
    "mls_reconstruct", "auto_reconstruct",
    # tsdf
    "create_tsdf_volume", "tsdf_integrate", "tsdf_extract_surface",
    # colorization
    "colorize_point_cloud", "colorize_from_images",
    # compression (draco-compatible entry points)
    "compress_point_cloud", "decompress_point_cloud",
    "compress_draco", "decompress_draco",
    # ros2
    "make_pointcloud2", "from_pointcloud2",
    "make_pointcloud2_organized", "from_pointcloud2_organized",
    # ros2 named typed converters (lib.rs:2580-2588)
    "pointcloud2_to_xyz", "pointcloud2_to_normals",
    "pointcloud2_to_colored", "pointcloud2_to_colored_normals",
    "xyz_to_pointcloud2", "normals_to_pointcloud2",
    "colored_to_pointcloud2", "colored_normals_to_pointcloud2",
    # utilities / classes
    "concatenate",
    "transform_point_cloud", "KdTree", "PointCloud", "TriangleMesh",
    "Transform", "ICPResult", "GlobalRegistrationResult", "NdtResult",
    "PlaneSegmentationResult",
    # streaming / realtime (reference python classes)
    "RealtimePipeline", "RealtimeVoxelFilter", "RealtimeMetrics",
    "StreamingVoxelFilter", "StreamingStatistics", "run_pipeline",
]


class TestSurface:
    def test_every_reference_symbol_exists(self):
        missing = [s for s in REFERENCE_SURFACE if not hasattr(tc, s)]
        assert not missing, f"missing API symbols: {missing}"

    def test_numpy_coercion(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        out = tc.voxel_downsample(pts, 0.5)
        assert isinstance(out, tc.PointCloud)

    def test_transform_point_cloud(self):
        pts = np.array([[1, 0, 0]], np.float32)
        m = np.eye(4)
        m[:3, 3] = [0, 1, 0]
        out = tc.transform_point_cloud(pts, m)
        np.testing.assert_allclose(out.to_numpy(), [[1, 1, 0]], atol=1e-6)


class TestEndToEndBunnySlice:
    """BASELINE.json config #1: read → voxel(0.05) → normals(k=10) →
    ICP self-align → write."""

    def test_full_slice(self, tmp_path, rng):
        pts = make_sphere_points(2000, radius=0.5)
        src_path = tmp_path / "bunnyish.ply"
        tc.write_point_cloud(src_path, tc.PointCloud.from_numpy(pts))

        cloud = tc.read_point_cloud(src_path)
        down = tc.voxel_grid_filter(cloud, 0.05)
        with_n = tc.estimate_normals(down, k=10)
        res = tc.icp(with_n, with_n, max_iterations=10)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.transformation),
                                   np.eye(4), atol=1e-4)
        out_path = tmp_path / "out.ply"
        tc.write_point_cloud(out_path, with_n)
        back = tc.read_point_cloud(out_path)
        assert "normals" in back.attrs
        assert len(back) == len(with_n)


class TestRos2:
    def test_roundtrip_xyz(self, rng):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        pc = tc.PointCloud.from_numpy(pts)
        msg = tc.make_pointcloud2(pc, frame_id="lidar")
        assert msg["header"]["frame_id"] == "lidar"
        assert msg["width"] == 50
        back = tc.from_pointcloud2(msg)
        np.testing.assert_allclose(back.to_numpy(), pts, atol=1e-6)

    def test_roundtrip_full_attrs(self, rng):
        pts = rng.normal(size=(20, 3)).astype(np.float32)
        nrm = rng.normal(size=(20, 3)).astype(np.float32)
        col = rng.uniform(0, 1, (20, 3)).astype(np.float32)
        inten = rng.uniform(0, 1, 20).astype(np.float32)
        pc = tc.PointCloud.from_numpy(pts, normals=nrm, colors=col,
                                      intensity=inten)
        back = tc.from_pointcloud2(tc.make_pointcloud2(pc))
        np.testing.assert_allclose(back.attr_to_numpy("normals"), nrm,
                                   atol=1e-6)
        np.testing.assert_allclose(back.attr_to_numpy("colors"), col,
                                   atol=1 / 255)
        np.testing.assert_allclose(back.attr_to_numpy("intensity"), inten,
                                   atol=1e-6)

    def test_strided_fields_with_padding(self):
        """Foreign messages with extra padding bytes decode correctly."""
        import struct
        point_step = 20  # x(0) y(4) z(8) + 4 pad + intensity(16)
        data = b"".join(
            struct.pack("<fff4xf", i, 2.0 * i, 3.0 * i, 0.5 * i)
            for i in range(5))
        msg = {"height": 1, "width": 5, "is_bigendian": False,
               "point_step": point_step, "row_step": point_step * 5,
               "is_dense": True, "data": data,
               "fields": [
                   {"name": "x", "offset": 0, "datatype": 7, "count": 1},
                   {"name": "y", "offset": 4, "datatype": 7, "count": 1},
                   {"name": "z", "offset": 8, "datatype": 7, "count": 1},
                   {"name": "intensity", "offset": 16, "datatype": 7,
                    "count": 1}]}
        pc = tc.from_pointcloud2(msg)
        got = pc.to_numpy()
        np.testing.assert_allclose(got[:, 0], np.arange(5), atol=1e-6)
        np.testing.assert_allclose(
            pc.attr_to_numpy("intensity"), 0.5 * np.arange(5), atol=1e-6)

    def test_organized_roundtrip(self):
        pts = np.zeros((4, 6, 3), np.float32)
        pts[..., 0] = np.arange(6)
        pts[..., 1] = np.arange(4)[:, None]
        mask = np.ones((4, 6), bool)
        mask[0, 0] = False
        opc = tc.OrganizedPointCloud.from_numpy(pts, mask)
        msg = tc.make_pointcloud2_organized(opc)
        assert msg["height"] == 4 and msg["width"] == 6
        assert not msg["is_dense"]
        back = tc.from_pointcloud2_organized(msg)
        assert back.height == 4 and back.width == 6
        assert not bool(back.mask[0, 0])
        assert bool(back.mask[1, 1])


class TestCompression:
    def test_roundtrip_precision(self, rng):
        pts = rng.uniform(-50, 50, (5000, 3)).astype(np.float32)
        pc = tc.PointCloud.from_numpy(pts)
        blob = tc.compress_point_cloud(pc)
        back = tc.decompress_point_cloud(blob)
        got = back.to_numpy()
        # order changes (morton); compare the exact quantised lattices
        bits = 14
        mn = pts.astype(np.float64).min(0)
        ext = np.maximum(pts.astype(np.float64).max(0) - mn, 1e-12)
        scale = ((1 << bits) - 1) / ext

        def q(x):
            return np.round((x.astype(np.float64) - mn) * scale
                            ).astype(np.int64)
        qa = q(pts)
        qb = q(got)
        qa = qa[np.lexsort(qa.T)]
        qb = qb[np.lexsort(qb.T)]
        # decompressed values re-quantise onto the same lattice (±1 ulp
        # from the f32 round-trip)
        assert np.abs(qa - qb).max() <= 1
        # and absolute positions are within the quantisation step
        step = float(ext.max()) / ((1 << bits) - 1)
        a = pts[np.lexsort(q(pts).T)]
        b = got[np.lexsort(q(got).T)]
        assert np.abs(a - b).max() <= 2 * step

    def test_compresses(self, rng):
        pts = rng.uniform(-10, 10, (20000, 3)).astype(np.float32)
        pc = tc.PointCloud.from_numpy(pts)
        blob = tc.compress_point_cloud(pc)
        assert len(blob) < pts.nbytes * 0.7

    def test_attrs_roundtrip(self, rng):
        pts = rng.uniform(0, 1, (100, 3)).astype(np.float32)
        inten = rng.uniform(0, 1, 100).astype(np.float32)
        pc = tc.PointCloud.from_numpy(pts, intensity=inten)
        back = tc.decompress_point_cloud(tc.compress_point_cloud(pc))
        assert "intensity" in back.attrs
        assert len(back) == 100


class TestStreaming:
    def test_voxel_pipeline_matches_batch(self, rng):
        pts = rng.uniform(-5, 5, (3000, 3)).astype(np.float32)
        chunks = [pts[i:i + 500] for i in range(0, 3000, 500)]
        # align the streaming grid origin with the batch filter's
        # (cloud min); a streaming filter cannot know it upfront
        pipe = streaming.StreamingVoxelFilter(0.5, origin=pts.min(0))
        result, stats = streaming.run_pipeline(chunks, pipe)
        assert stats.chunks == 6 and stats.points == 3000
        batch = tc.voxel_grid_filter(tc.PointCloud.from_numpy(pts), 0.5)
        assert len(result) == len(batch)
        assert pipe.memory_bytes() > 0

    def test_statistics(self, rng):
        pts = rng.normal(2.0, 1.0, (4000, 3)).astype(np.float32)
        chunks = [pts[i:i + 1000] for i in range(0, 4000, 1000)]
        result, _ = streaming.run_pipeline(chunks,
                                           streaming.StreamingStatistics())
        np.testing.assert_allclose(result["mean"], 2.0, atol=0.1)
        np.testing.assert_allclose(result["std"], 1.0, atol=0.1)
        assert result["count"] == 4000

    def test_skip_errors(self):
        class Bad:
            def process_chunk(self, c):
                raise ValueError("boom")

            def finalize(self):
                return "done"

            def memory_bytes(self):
                return 0
        result, stats = streaming.run_pipeline(
            [np.zeros((5, 3))], Bad(),
            streaming.RunOptions(skip_errors=True))
        assert stats.errors == 1 and result == "done"

    def test_device_map_stage(self, rng):
        import jax.numpy as jnp
        pts = rng.normal(size=(1000, 3)).astype(np.float32)
        stage = streaming.StreamingDeviceMap(
            lambda p, m: p * 2.0, chunk_capacity=512)
        out, _ = streaming.run_pipeline(
            [pts[:500], pts[500:]], stage)
        np.testing.assert_allclose(out, pts * 2, atol=1e-6)

    def test_realtime_backpressure_and_drops(self, rng):
        pipe = streaming.StreamingCollector()
        cfg = streaming.BackpressureConfig(max_queue_depth=4, chunk_size=64,
                                           flush_timeout_s=0.005)
        rt = streaming.RealtimePipeline(pipe, cfg)
        for i in range(50):
            rt.send(rng.normal(size=(10, 3)).astype(np.float32))
        result = rt.finish()
        assert len(result) == 500
        assert rt.metrics.processed == 50
        assert rt.metrics.dropped == 0

    def test_realtime_processed_counts_flushed_only(self):
        """`processed` moves when the PIPELINE consumes a flush, not on
        dequeue (streaming.rs:470-472): messages sitting in the pending
        flush buffer still count toward depth()."""
        import time as _t

        class Gate:
            def process_chunk(self, c):
                pass

            def finalize(self):
                return None

            def memory_bytes(self):
                return 0
        cfg = streaming.BackpressureConfig(
            max_queue_depth=64, chunk_size=10**9, flush_timeout_s=60.0)
        rt = streaming.RealtimePipeline(Gate(), cfg)
        for _ in range(5):
            rt.send(np.zeros((4, 3), np.float32))
        deadline = _t.time() + 5.0
        while rt._queue.qsize() > 0 and _t.time() < deadline:
            _t.sleep(0.01)  # worker buffers the messages without flushing
        assert rt.metrics.queued == 5
        assert rt.metrics.processed == 0
        assert rt.metrics.depth() == 5
        rt.finish()
        assert rt.metrics.processed == 5
        assert rt.metrics.depth() == 0

    def test_realtime_try_send_drops(self):
        import time as _t

        class Slow:
            def __init__(self):
                self.n = 0

            def process_chunk(self, c):
                _t.sleep(0.05)
                self.n += len(c)

            def finalize(self):
                return self.n

            def memory_bytes(self):
                return 0
        cfg = streaming.BackpressureConfig(max_queue_depth=2, chunk_size=1,
                                           flush_timeout_s=0.001)
        rt = streaming.RealtimePipeline(Slow(), cfg)
        dropped = 0
        for i in range(50):
            if not rt.try_send(np.zeros((1, 3), np.float32)):
                dropped += 1
        rt.finish()
        assert rt.metrics.dropped == dropped
        assert dropped > 0
