"""Drop-in parity with the reference python module.

The reference extension registers its surface in one block
(threecrate-python/src/lib.rs:2504-2591: `m.add_class` / `m.add_function`
calls). These tests (a) derive that name list from the reference source
when it is available (falling back to a frozen copy so the suite stays
standalone), assert every name exists on ``tc.*``, and (b) smoke-call
each entry point with the REFERENCE calling conventions — scalars
positionally, ``init_transform`` as a 4×4 numpy array, uint8 colors —
so a reference user script runs unmodified.
"""

import re
from pathlib import Path

import numpy as np
import pytest

import threecrate_tpu as tc

from conftest import make_sphere_points

REFERENCE_LIB = Path("/root/reference/threecrate-python/src/lib.rs")

# frozen copy of the registration block (lib.rs:2504-2591), kept in sync
# by test_frozen_list_matches_reference when the reference is on disk
FROZEN_CLASSES = [
    "PointCloud", "NormalPointCloud", "ColoredPointCloud",
    "ColoredNormalPointCloud", "TriangleMesh", "IcpResult",
    "GlobalRegistrationResult", "NdtResult", "PlaneSegmentationResult",
    "PointCloud2Data", "KdTree", "RealtimeMetrics", "RealtimePipeline",
    "RealtimeVoxelFilter",
]
FROZEN_FUNCTIONS = [
    "voxel_downsample", "remove_statistical_outliers",
    "remove_radius_outliers", "estimate_normals",
    "icp", "icp_point_to_plane", "gicp", "kiss_icp",
    "global_registration", "global_registration_with_normals",
    "ndt_registration", "extract_fpfh_features",
    "segment_plane", "extract_clusters",
    "mesh_union", "mesh_intersection", "mesh_difference",
    "simplify_mesh",
    "smooth_mesh_laplacian", "smooth_mesh_taubin", "smooth_mesh_hc",
    "reconstruct", "poisson_reconstruct", "ball_pivoting_reconstruct",
    "alpha_shape_reconstruct", "delaunay_triangulate",
    "moving_least_squares_reconstruct",
    "colorize_point_cloud", "concatenate", "transform_point_cloud",
    "read_point_cloud", "write_point_cloud", "read_mesh", "write_mesh",
    "compress", "decompress",
    "pointcloud2_to_xyz", "pointcloud2_to_normals",
    "pointcloud2_to_colored", "pointcloud2_to_colored_normals",
    "xyz_to_pointcloud2", "normals_to_pointcloud2",
    "colored_to_pointcloud2", "colored_normals_to_pointcloud2",
]


def _parse_reference_registration():
    """Extract registered names from the #[pymodule] block."""
    text = REFERENCE_LIB.read_text()
    block = text[text.index("#[pymodule]"):]
    classes = re.findall(r"add_class::<Py(\w+)>", block)
    functions = re.findall(r"wrap_pyfunction!\((\w+), m\)", block)
    # pyo3 renames: py_estimate_normals registers as estimate_normals
    renames = {fn: name for name, fn in re.findall(
        r'#\[pyo3\(name = "(\w+)"[^\]]*\]\s*fn (\w+)', text)}
    functions = [renames.get(f, f) for f in functions]
    return classes, functions


class TestReferenceNameParity:
    def test_frozen_list_matches_reference(self):
        """When the reference source is on disk, the frozen lists must
        equal what its registration block actually registers."""
        if not REFERENCE_LIB.exists():
            pytest.skip("reference source not available")
        classes, functions = _parse_reference_registration()
        assert sorted(classes) == sorted(FROZEN_CLASSES)
        assert sorted(functions) == sorted(FROZEN_FUNCTIONS)

    def test_every_class_exists(self):
        missing = [c for c in FROZEN_CLASSES if not hasattr(tc, c)]
        assert not missing, f"missing reference classes: {missing}"

    def test_every_function_exists(self):
        missing = [f for f in FROZEN_FUNCTIONS
                   if not callable(getattr(tc, f, None))]
        assert not missing, f"missing reference functions: {missing}"


@pytest.fixture(scope="module")
def sphere():
    return make_sphere_points(400, seed=3).astype(np.float32)


@pytest.fixture(scope="module")
def misaligned(sphere):
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0.05, -0.02, 0.03]
    return (sphere @ T[:3, :3].T + T[:3, 3]).astype(np.float32), T


class TestReferenceConventions:
    """Each entry point called exactly as the reference docstrings show."""

    def test_filtering(self, sphere):
        pc = tc.PointCloud.from_numpy(sphere)
        kept = tc.remove_statistical_outliers(pc, 20, 2.0)
        assert isinstance(kept, tc.PointCloud)
        assert 0 < len(kept) <= len(pc)
        kept = tc.remove_radius_outliers(pc, 0.5, 2)
        assert 0 < len(kept) <= len(pc)
        down = tc.voxel_downsample(pc, 0.25)
        assert len(down) < len(pc)

    def test_estimate_normals_k_neighbors_kwarg(self, sphere):
        nc = tc.estimate_normals(tc.PointCloud.from_numpy(sphere),
                                 k_neighbors=10)
        assert nc.normals is not None

    def test_icp_reference_convention(self, sphere, misaligned):
        src, T = misaligned
        res = tc.icp(src, sphere, 25, init_transform=np.eye(4))
        # reference surface: transformation() METHOD + scalar attrs
        M = res.transformation()
        assert isinstance(M, np.ndarray) and M.shape == (4, 4)
        assert float(res.mse) < 1e-4
        assert int(res.iterations) <= 25
        bool(res.converged)
        # native surface unbroken: transformation as a field
        assert np.asarray(res.transformation).shape == (4, 4)
        # recovered inverse of the applied offset
        np.testing.assert_allclose(M[:3, 3], -T[:3, 3], atol=5e-3)

    def test_icp_point_to_plane_reference_convention(self, sphere,
                                                     misaligned):
        src, _ = misaligned
        tgt = tc.estimate_normals(tc.PointCloud.from_numpy(sphere), 10)
        res = tc.icp_point_to_plane(src, tgt, 20, np.eye(4))
        assert res.transformation().shape == (4, 4)

    def test_gicp_reference_convention(self, sphere, misaligned):
        src, _ = misaligned
        res = tc.gicp(src, sphere, 10, 1.0, 1e-6, 15)
        assert res.transformation().shape == (4, 4)

    def test_gicp_native_convention(self, sphere, misaligned):
        from threecrate_tpu.ops.gicp import GicpConfig
        src, _ = misaligned
        res = tc.gicp(tc.PointCloud.from_numpy(src),
                      tc.PointCloud.from_numpy(sphere),
                      GicpConfig(max_iterations=5))
        assert np.asarray(res.transformation).shape == (4, 4)

    def test_kiss_icp_reference_convention(self, sphere, misaligned):
        src, _ = misaligned
        res = tc.kiss_icp(src, sphere, 0.5, 100.0, 0.0, 10)
        assert res.transformation().shape == (4, 4)

    def test_ndt_reference_convention(self, sphere, misaligned):
        src, _ = misaligned
        res = tc.ndt_registration(src, sphere, None, 1.0, 0.1, 5)
        assert res.transformation().shape == (4, 4)

    def test_global_registration_reference_convention(self, sphere,
                                                      misaligned):
        src, _ = misaligned
        res = tc.global_registration(src, sphere, 2000, 0.1, 0.05, 0.5,
                                     10, 10, False)
        assert res.transformation().shape == (4, 4)
        float(res.inlier_ratio)

    def test_extract_fpfh_reference_convention(self, sphere):
        feats = tc.extract_fpfh_features(
            tc.PointCloud.from_numpy(sphere), 0.5, 10)
        assert isinstance(feats, np.ndarray)
        assert feats.shape == (len(sphere), 33)
        assert feats.dtype == np.float32

    def test_segment_plane_threshold_kwarg(self, rng):
        plane = np.concatenate(
            [rng.uniform(-1, 1, (300, 2)),
             rng.normal(scale=0.002, size=(300, 1))], 1).astype(np.float32)
        res = tc.segment_plane(tc.PointCloud.from_numpy(plane),
                               threshold=0.02, max_iterations=200)
        assert int(np.asarray(res.num_inliers)) > 250

    def test_extract_clusters(self, rng):
        a = rng.normal(scale=0.2, size=(150, 3)).astype(np.float32)
        b = a[:80] + np.float32([10, 0, 0])
        clusters = tc.extract_clusters(
            np.concatenate([a, b]), tolerance=1.0,
            min_cluster_size=10, max_cluster_size=100000)
        assert len(clusters) == 2
        # largest first (lib.rs:1294 docstring)
        assert len(clusters[0]) == 150 and len(clusters[1]) == 80
        assert all(isinstance(c, tc.PointCloud) for c in clusters)

    def test_mesh_pipeline_reference_conventions(self, sphere):
        mesh = tc.alpha_shape_reconstruct(sphere, 0.5)
        n_faces = int(np.asarray(mesh.face_mask).sum())
        assert n_faces > 50
        sm = tc.smooth_mesh_laplacian(mesh, 3, 0.5)
        sm = tc.smooth_mesh_taubin(sm, 2, 0.5, -0.53)
        sm = tc.smooth_mesh_hc(sm, 2, 0.0, 0.5)
        assert int(np.asarray(sm.face_mask).sum()) == n_faces
        # reference simplify: FLOAT = fraction of faces to remove
        simp = tc.simplify_mesh(mesh, 0.5)
        kept = int(np.asarray(simp.face_mask).sum())
        assert kept <= int(0.62 * n_faces)
        # native simplify: INT = target face count
        simp2 = tc.simplify_mesh(mesh, 100)
        assert int(np.asarray(simp2.face_mask).sum()) <= 110

    def test_reconstruct_family(self, sphere, rng):
        assert int(np.asarray(
            tc.reconstruct(sphere).face_mask).sum()) > 0
        assert int(np.asarray(
            tc.ball_pivoting_reconstruct(sphere, 0.4).face_mask).sum()) > 0
        plane = np.concatenate(
            [rng.uniform(-1, 1, (150, 2)),
             rng.normal(scale=0.01, size=(150, 1))], 1).astype(np.float32)
        assert int(np.asarray(
            tc.delaunay_triangulate(plane).face_mask).sum()) > 0

    def test_poisson_takes_normal_point_cloud(self, sphere):
        nc = tc.estimate_normals(tc.PointCloud.from_numpy(sphere), 10)
        npc = tc.NormalPointCloud(nc)
        mesh = tc.poisson_reconstruct(npc)
        assert int(np.asarray(mesh.face_mask).sum()) > 100

    def test_compress_decompress(self, sphere):
        pc = tc.PointCloud.from_numpy(sphere)
        blob = tc.compress(pc, 14, 7)
        assert isinstance(blob, bytes)
        back = tc.decompress(blob)
        assert len(back) == len(pc)
        # quantisation-lossy roundtrip: order-insensitive nearest match
        a = np.sort(pc.to_numpy(), axis=0)
        b = np.sort(back.to_numpy(), axis=0)
        np.testing.assert_allclose(a, b, atol=2e-3)

    def test_colorize_reference_convention(self, sphere, rng):
        img = rng.integers(0, 255, (24, 32, 3)).astype(np.uint8)
        w2c = np.eye(4, dtype=np.float32)
        w2c[2, 3] = 3.0  # camera 3 units back
        out = tc.colorize_point_cloud(
            tc.PointCloud.from_numpy(sphere), img.tobytes(), 32, 24,
            20.0, 20.0, 16.0, 12.0, w2c)
        assert isinstance(out, tc.ColoredPointCloud)
        cols = out.colors()
        assert cols.dtype == np.uint8 and cols.shape == (len(sphere), 3)


class TestTypedClouds:
    def test_normal_point_cloud(self, sphere, rng):
        normals = rng.normal(size=sphere.shape).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        npc = tc.NormalPointCloud.from_numpy(sphere, normals)
        assert len(npc) == len(sphere)
        np.testing.assert_allclose(npc.positions(), sphere, atol=1e-6)
        np.testing.assert_allclose(npc.normals(), normals, atol=1e-6)
        assert not npc.is_empty
        # delegates to the wrapped cloud: usable with native ops
        assert tc.voxel_grid_filter(npc.cloud, 0.5) is not None

    def test_colored_point_cloud_uint8_contract(self, sphere, rng):
        colors = rng.integers(0, 255, sphere.shape).astype(np.uint8)
        cpc = tc.ColoredPointCloud.from_numpy(sphere, colors)
        got = cpc.colors()
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(got, colors)

    def test_colored_normal_point_cloud(self, sphere, rng):
        normals = np.tile(np.float32([0, 0, 1]), (len(sphere), 1))
        colors = rng.integers(0, 255, sphere.shape).astype(np.uint8)
        c = tc.ColoredNormalPointCloud.from_numpy(sphere, normals, colors)
        assert c.normals().shape == sphere.shape
        assert c.colors().dtype == np.uint8

    def test_missing_attribute_rejected(self, sphere):
        with pytest.raises(tc.InvalidDataError):
            tc.NormalPointCloud(tc.PointCloud.from_numpy(sphere))


class TestPointCloud2Data:
    def test_reference_surface(self, sphere):
        pc = tc.PointCloud.from_numpy(sphere)
        msg = tc.xyz_to_pointcloud2(pc)
        assert isinstance(msg, tc.PointCloud2Data)
        assert msg.point_step == 12
        assert msg.width == len(sphere) and msg.height == 1
        assert msg.row_step == 12 * len(sphere)
        assert msg.is_bigendian is False and msg.is_dense is True
        assert isinstance(msg.data(), bytes)
        assert msg.fields() == [("x", 0, 7, 1), ("y", 4, 7, 1),
                                ("z", 8, 7, 1)]
        assert "PointCloud2Data" in repr(msg)

    def test_roundtrip_through_wrapper(self, sphere):
        pc = tc.PointCloud.from_numpy(sphere)
        msg = tc.xyz_to_pointcloud2(pc)
        back = tc.from_pointcloud2(msg)   # accepts the wrapper directly
        np.testing.assert_allclose(back.to_numpy(), sphere, atol=1e-6)
        # reference style: unpack the container into the raw converter
        back2 = tc.pointcloud2_to_xyz(msg.data(), msg.fields(),
                                      msg.point_step, msg.width, msg.height)
        np.testing.assert_allclose(back2.to_numpy(), sphere, atol=1e-6)

    def test_typed_converters_return_typed_clouds(self, sphere, rng):
        normals = np.tile(np.float32([0, 0, 1]), (len(sphere), 1))
        colors = rng.uniform(0, 1, sphere.shape).astype(np.float32)
        cloud = tc.PointCloud.from_numpy(sphere, normals=normals,
                                         colors=colors)
        m = tc.normals_to_pointcloud2(cloud)
        out = tc.pointcloud2_to_normals(m.data(), m.fields(),
                                        m.point_step, m.width, m.height)
        assert isinstance(out, tc.NormalPointCloud)
        np.testing.assert_allclose(out.normals(), normals, atol=1e-6)
        m = tc.colored_to_pointcloud2(cloud)
        out = tc.pointcloud2_to_colored(m.data(), m.fields(),
                                        m.point_step, m.width, m.height)
        assert isinstance(out, tc.ColoredPointCloud)
        m = tc.colored_normals_to_pointcloud2(cloud)
        out = tc.pointcloud2_to_colored_normals(
            m.data(), m.fields(), m.point_step, m.width, m.height)
        assert isinstance(out, tc.ColoredNormalPointCloud)


class TestDracoHonesty:
    """compress_draco emits tcz1, NOT a Draco bitstream; a real .drc
    payload must be detected and rejected with a conversion hint, never
    misparsed (VERDICT r4 item 5; compression.rs:36-187)."""

    def test_real_draco_header_rejected(self):
        # a real Draco point-cloud stream header: magic, version 1.3,
        # encoder type 0 (POINT_CLOUD), kd-tree method, flags
        fake_drc = b"DRACO" + bytes([1, 3, 0, 1, 0, 0]) + b"\x00" * 64
        with pytest.raises(tc.UnsupportedFormatError, match="draco_decoder"):
            tc.decompress(fake_drc)
        with pytest.raises(tc.UnsupportedFormatError):
            tc.decompress_draco(fake_drc)
        with pytest.raises(tc.UnsupportedFormatError):
            tc.decompress_point_cloud(fake_drc)

    def test_garbage_still_invalid_data(self):
        with pytest.raises(tc.InvalidDataError):
            tc.decompress(b"XXXXnot-a-container")
