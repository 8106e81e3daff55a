"""Core type tests: PointCloud / TriangleMesh / Transform / Organized.

Mirrors the reference's inline core tests (point_cloud.rs, mesh.rs,
transform.rs, organized_point_cloud.rs test modules).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threecrate_tpu import (
    CameraIntrinsics,
    OrganizedPointCloud,
    PointCloud,
    Transform,
    TriangleMesh,
)
from threecrate_tpu.core.errors import InvalidDataError


class TestPointCloud:
    def test_from_numpy_roundtrip(self, rng):
        pts = rng.normal(size=(37, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        assert pc.capacity % 128 == 0
        assert len(pc) == 37
        np.testing.assert_allclose(pc.to_numpy(), pts)

    def test_empty(self):
        pc = PointCloud.empty()
        assert len(pc) == 0
        assert bool(pc.is_empty())

    def test_invalid_shape_rejected(self):
        with pytest.raises(InvalidDataError):
            PointCloud.from_numpy(np.zeros((5, 2)))

    def test_attrs_roundtrip(self, rng):
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        nrm = rng.normal(size=(10, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts, normals=nrm)
        np.testing.assert_allclose(pc.attr_to_numpy("normals"), nrm)

    def test_attr_length_mismatch(self, rng):
        with pytest.raises(InvalidDataError):
            PointCloud.from_numpy(np.zeros((5, 3)), normals=np.zeros((4, 3)))

    def test_transform_translation(self, rng):
        pts = rng.normal(size=(20, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        t = Transform.from_translation([1.0, 2.0, 3.0])
        out = pc.transform(t).to_numpy()
        np.testing.assert_allclose(out, pts + np.array([1, 2, 3]), rtol=1e-6)

    def test_transform_rotates_normals(self):
        pts = np.array([[1, 0, 0]], np.float32)
        nrm = np.array([[0, 0, 1]], np.float32)
        pc = PointCloud.from_numpy(pts, normals=nrm)
        t = Transform.from_axis_angle([1.0, 0, 0], np.pi / 2)
        out = pc.transform(t)
        np.testing.assert_allclose(
            out.attr_to_numpy("normals"), [[0, -1, 0]], atol=1e-6)

    def test_bounding_box_and_centroid(self):
        pts = np.array([[0, 0, 0], [2, 4, 6]], np.float32)
        pc = PointCloud.from_numpy(pts)
        mn, mx = pc.bounding_box()
        np.testing.assert_allclose(np.asarray(mn), [0, 0, 0])
        np.testing.assert_allclose(np.asarray(mx), [2, 4, 6])
        np.testing.assert_allclose(np.asarray(pc.centroid()), [1, 2, 3])
        np.testing.assert_allclose(np.asarray(pc.center()), [1, 2, 3])

    def test_select_and_compact(self, rng):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        pc = PointCloud.from_numpy(pts)
        keep = jnp.asarray(np.arange(pc.capacity) % 2 == 0)
        sel = pc.select(keep)
        assert len(sel) == 25
        compacted = sel.compact()
        assert len(compacted) == 25
        np.testing.assert_allclose(compacted.to_numpy(), pts[::2])

    def test_pytree_roundtrip(self, random_cloud):
        pc, _ = random_cloud
        leaves, treedef = jax.tree_util.tree_flatten(pc)
        pc2 = jax.tree_util.tree_unflatten(treedef, leaves)
        np.testing.assert_allclose(pc2.to_numpy(), pc.to_numpy())

    def test_jit_through_pointcloud(self, random_cloud):
        pc, pts = random_cloud

        @jax.jit
        def shift(c: PointCloud) -> PointCloud:
            return c.with_points(c.points + 1.0)

        out = shift(pc)
        np.testing.assert_allclose(out.to_numpy(), pts + 1.0, rtol=1e-6)


class TestTransform:
    def test_identity(self):
        t = Transform.identity()
        p = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(t.apply_point(p)), [1, 2, 3])

    def test_compose_and_inverse(self, rng):
        a = Transform.from_axis_angle([0.3, 0.5, 0.8], 0.7)
        b = Transform.from_translation([1.0, -2.0, 0.5])
        c = a @ b
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        direct = c.apply(pts)
        seq = a.apply(b.apply(pts))
        np.testing.assert_allclose(np.asarray(direct), np.asarray(seq), rtol=1e-5)
        back = c.inverse().apply(direct)
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)

    def test_quaternion_matrix_roundtrip(self, rng):
        from threecrate_tpu.core.transform import (
            matrix_to_quaternion, quaternion_to_matrix)
        q = rng.normal(size=4).astype(np.float32)
        q /= np.linalg.norm(q)
        m = quaternion_to_matrix(jnp.asarray(q))
        q2 = np.asarray(matrix_to_quaternion(m))
        if np.dot(q, q2) < 0:
            q2 = -q2
        np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_se3_exp_small_angle(self):
        t = Transform.from_exp_coords(jnp.array([0, 0, 0, 1.0, 2.0, 3.0]))
        np.testing.assert_allclose(np.asarray(t.translation), [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(np.asarray(t.rotation), np.eye(3), atol=1e-6)

    def test_se3_exp_pure_rotation(self):
        xi = jnp.array([0, 0, np.pi / 2, 0, 0, 0.0])
        t = Transform.from_exp_coords(xi)
        out = np.asarray(t.apply_point(jnp.array([1.0, 0, 0])))
        np.testing.assert_allclose(out, [0, 1, 0], atol=1e-6)

    def test_apply_vector_ignores_translation(self):
        t = Transform.from_translation([5.0, 5.0, 5.0])
        v = np.asarray(t.apply_vector(jnp.array([[1.0, 0, 0]])))
        np.testing.assert_allclose(v, [[1, 0, 0]], atol=1e-7)


class TestTriangleMesh:
    def _tetra(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
        f = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
        return TriangleMesh.from_numpy(v, f)

    def test_counts(self):
        m = self._tetra()
        assert int(m.vertex_count()) == 4
        assert int(m.face_count()) == 4

    def test_face_normals_unit(self):
        m = self._tetra()
        fn = np.asarray(m.face_normals())
        fm = np.asarray(m.face_mask)
        norms = np.linalg.norm(fn[fm], axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
        # first face (0,2,1) lies in z=0 plane, normal along -z
        np.testing.assert_allclose(fn[0], [0, 0, -1], atol=1e-6)

    def test_vertex_normals_outward_sphereish(self):
        m = self._tetra().compute_vertex_normals()
        vn = m.attr_to_numpy("normals")
        assert vn.shape == (4, 3)
        np.testing.assert_allclose(np.linalg.norm(vn, axis=1), 1.0, rtol=1e-5)

    def test_to_numpy_reindexes(self):
        m = self._tetra()
        v, f = m.to_numpy()
        assert v.shape == (4, 3) and f.shape == (4, 3)
        assert f.max() == 3

    def test_face_index_validation(self):
        with pytest.raises(InvalidDataError):
            TriangleMesh.from_numpy(np.zeros((3, 3)), np.array([[0, 1, 5]]))

    def test_set_normals_guard(self):
        m = self._tetra()
        with pytest.raises(InvalidDataError):
            m.set_normals(np.zeros((2, 3)))

    def test_areas(self):
        m = self._tetra()
        areas = np.asarray(m.face_areas())
        assert abs(areas[0] - 0.5) < 1e-6


class TestOrganized:
    def test_from_depth_image(self):
        intr = CameraIntrinsics(fx=100.0, fy=100.0, cx=2.0, cy=1.5)
        depth = np.zeros((4, 4), np.uint16)
        depth[1, 2] = 1000  # 1 m at principal point x
        opc = OrganizedPointCloud.from_depth_image(depth, intr)
        assert int(opc.size()) == 1
        pt, valid = opc.at(1, 2)
        assert bool(valid)
        np.testing.assert_allclose(np.asarray(pt), [0.0, -0.005, 1.0], atol=1e-6)
        assert not bool(opc.is_dense())

    def test_to_unorganized(self):
        intr = CameraIntrinsics(100, 100, 1, 1)
        depth = np.full((2, 3), 500, np.uint16)
        opc = OrganizedPointCloud.from_depth_image(depth, intr)
        pc = opc.to_unorganized()
        assert int(pc.size()) == 6
        assert bool(opc.is_dense())

    def test_ring_alias(self):
        opc = OrganizedPointCloud.from_numpy(np.zeros((3, 5, 3), np.float32))
        pts, mask = opc.ring(1)
        assert pts.shape == (5, 3)


class TestPack:
    def test_pack_moves_valid_to_front(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from threecrate_tpu import PointCloud
        pts = np.arange(30, dtype=np.float32).reshape(10, 3)
        mask = np.array([0, 1, 0, 1, 1, 0, 0, 1, 0, 1], bool)
        pc = PointCloud.from_points(pts, mask,
                                    intensity=np.arange(10.0,
                                                        dtype=np.float32))
        packed = jax.jit(lambda c: c.pack())(pc)
        m = np.asarray(packed.mask)
        assert m[:5].all() and not m[5:].any()
        np.testing.assert_array_equal(np.asarray(packed.points)[:5],
                                      pts[mask])
        np.testing.assert_array_equal(
            np.asarray(packed.attrs["intensity"])[:5],
            np.arange(10.0)[mask])
        assert packed.capacity == pc.capacity


class TestConcatenate:
    """PointCloud.extend / concatenate (point_cloud.rs:128-140,
    threecrate-python/src/lib.rs:1634)."""

    def test_extend_counts_and_rows(self):
        import numpy as np
        a_pts = np.arange(9, dtype=np.float32).reshape(3, 3)
        b_pts = np.arange(9, 27, dtype=np.float32).reshape(6, 3)
        a = PointCloud.from_numpy(a_pts)
        b = PointCloud.from_numpy(b_pts)
        c = a.extend(b)
        assert c.capacity == a.capacity + b.capacity
        assert int(c.size()) == 9
        np.testing.assert_array_equal(c.to_numpy(),
                                      np.concatenate([a_pts, b_pts]))

    def test_add_operator(self):
        import numpy as np
        a = PointCloud.from_numpy(np.zeros((4, 3), np.float32))
        b = PointCloud.from_numpy(np.ones((5, 3), np.float32))
        assert int((a + b).size()) == 9

    def test_attr_union_zero_fill(self):
        import numpy as np
        a = PointCloud.from_numpy(np.zeros((4, 3), np.float32),
                                  intensity=np.arange(4.0))
        b = PointCloud.from_numpy(np.ones((3, 3), np.float32))
        c = a.extend(b)
        assert c.has("intensity")
        got = c.attr_to_numpy("intensity")
        np.testing.assert_array_equal(got[:4], np.arange(4.0))
        np.testing.assert_array_equal(got[4:], np.zeros(3))

    def test_concatenate_many(self):
        import numpy as np
        from threecrate_tpu.ops.point_cloud_ops import concatenate
        clouds = [PointCloud.from_numpy(
            np.full((n, 3), float(n), np.float32)) for n in (2, 3, 4)]
        c = concatenate(clouds)
        assert int(c.size()) == 9
        got = c.to_numpy()
        np.testing.assert_array_equal(got[:, 0],
                                      [2, 2, 3, 3, 3, 4, 4, 4, 4])

    def test_concatenate_empty_list_rejected(self):
        import pytest
        from threecrate_tpu.core.errors import InvalidDataError
        from threecrate_tpu.ops.point_cloud_ops import concatenate
        with pytest.raises(InvalidDataError):
            concatenate([])

    def test_concatenate_normals_ride(self):
        import numpy as np
        from threecrate_tpu.ops.point_cloud_ops import concatenate
        n1 = np.tile([0, 0, 1.0], (3, 1)).astype(np.float32)
        n2 = np.tile([1.0, 0, 0], (2, 1)).astype(np.float32)
        a = PointCloud.from_numpy(np.zeros((3, 3), np.float32), normals=n1)
        b = PointCloud.from_numpy(np.ones((2, 3), np.float32), normals=n2)
        c = concatenate([a, b])
        np.testing.assert_array_equal(c.attr_to_numpy("normals"),
                                      np.concatenate([n1, n2]))


class TestShapeBucketing:
    """Public entry points pad to capacity buckets so nearby sizes share
    compiled programs (utils/padding.pad_capacity; VERDICT r3 item 4).

    The HW analog (950k vs 990k: 87.75 s compile vs 0.35 s cached
    dispatch) is in benchmarks/r4b_probe.py; this test pins the policy
    on the CPU backend by counting backend compiles directly.
    """

    def test_nearby_sizes_share_bucket(self, rng):
        from threecrate_tpu.utils.padding import pad_capacity
        assert pad_capacity(950) == pad_capacity(990)
        # geometric growth: O(log N) buckets across 1..10M
        caps = {pad_capacity(n) for n in range(1, 10_000_001, 4999)}
        assert len(caps) < 40

    def test_second_size_in_bucket_skips_compile(self, rng):
        from jax._src import monitoring
        from threecrate_tpu import estimate_normals

        jax.clear_caches()   # deterministic compile count regardless
        compiles = []        # of what earlier tests compiled

        def listener(name, duration, **kw):
            if name == "/jax/core/compile/backend_compile_duration":
                compiles.append(name)

        monitoring.register_event_duration_secs_listener(listener)
        try:
            a = PointCloud.from_numpy(
                rng.normal(size=(950, 3)).astype(np.float32))
            b = PointCloud.from_numpy(
                rng.normal(size=(990, 3)).astype(np.float32))
            assert a.capacity == b.capacity
            ra = estimate_normals(a, k=8)
            n_after_first = len(compiles)
            assert n_after_first > 0  # fresh shape did compile
            rb = estimate_normals(b, k=8)
            assert len(compiles) == n_after_first, (
                "second cloud in the same capacity bucket recompiled")
            assert ra.normals.shape == rb.normals.shape
        finally:
            monitoring.unregister_event_duration_listener(listener)


class TestWithAttrPadding:
    def test_short_attr_zero_padded_to_capacity(self):
        import jax.numpy as jnp
        pts = np.random.default_rng(0).normal(
            size=(100, 3)).astype(np.float32)
        cloud = PointCloud.from_numpy(pts)          # capacity > 100
        cap = cloud.points.shape[0]
        assert cap > 100
        nrm = jnp.ones((100, 3), jnp.float32)
        c2 = cloud.with_normals(nrm)
        assert c2.normals.shape == (cap, 3)
        np.testing.assert_allclose(np.asarray(c2.normals[:100]), 1.0)
        np.testing.assert_allclose(np.asarray(c2.normals[100:]), 0.0)

    def test_oversize_attr_rejected(self):
        from threecrate_tpu.core.errors import InvalidDataError
        import jax.numpy as jnp
        pts = np.zeros((10, 3), np.float32)
        cloud = PointCloud.from_numpy(pts)
        with pytest.raises(InvalidDataError):
            cloud.with_normals(jnp.zeros((4096, 3), jnp.float32))
