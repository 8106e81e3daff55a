"""I/O round-trip tests (reference pattern: writers feed their own
readers, io/src/tests/mesh_serialization_tests.rs)."""

import io as _io
import struct

import numpy as np
import pytest

from threecrate_tpu import PointCloud, TriangleMesh
from threecrate_tpu import io as tcio
from threecrate_tpu.core.errors import (
    InvalidDataError, IoError, UnsupportedFormatError)


@pytest.fixture
def cloud(rng):
    pts = rng.uniform(-10, 10, (100, 3)).astype(np.float32)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    col = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    return PointCloud.from_numpy(pts, normals=nrm, colors=col)


@pytest.fixture
def mesh():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32)
    return TriangleMesh.from_numpy(v, f)


class TestPly:
    @pytest.mark.parametrize("binary", [True, False])
    def test_cloud_roundtrip(self, cloud, tmp_path, binary):
        p = tmp_path / "c.ply"
        tcio.write_point_cloud(p, cloud, binary=binary)
        back = tcio.read_point_cloud(p)
        np.testing.assert_allclose(back.to_numpy(), cloud.to_numpy(),
                                   atol=1e-4 if not binary else 1e-6)
        np.testing.assert_allclose(back.attr_to_numpy("normals"),
                                   cloud.attr_to_numpy("normals"), atol=1e-4)
        # colors quantised to u8
        np.testing.assert_allclose(back.attr_to_numpy("colors"),
                                   cloud.attr_to_numpy("colors"), atol=1 / 255)

    @pytest.mark.parametrize("binary", [True, False])
    def test_mesh_roundtrip(self, mesh, tmp_path, binary):
        p = tmp_path / "m.ply"
        tcio.write_mesh(p, mesh, binary=binary)
        back = tcio.read_mesh(p)
        v0, f0 = mesh.to_numpy()
        v1, f1 = back.to_numpy()
        np.testing.assert_allclose(v1, v0, atol=1e-5)
        np.testing.assert_array_equal(f1, f0)

    def test_reference_argument_order(self, cloud, mesh, tmp_path):
        # the reference python API writes (cloud, path) / (mesh, path)
        # (threecrate-python/src/lib.rs:1695,1713); both orders accepted
        pc = tmp_path / "ref_order_c.ply"
        pm = tmp_path / "ref_order_m.ply"
        tcio.write_point_cloud(cloud, pc)
        tcio.write_mesh(mesh, pm)
        np.testing.assert_allclose(tcio.read_point_cloud(pc).to_numpy(),
                                   cloud.to_numpy(), atol=1e-5)
        v0, f0 = mesh.to_numpy()
        v1, f1 = tcio.read_mesh(pm).to_numpy()
        np.testing.assert_allclose(v1, v0, atol=1e-5)
        np.testing.assert_array_equal(f1, f0)

    def test_big_endian_read(self, tmp_path):
        pts = np.array([[1, 2, 3], [4, 5, 6]], ">f4")
        header = (b"ply\nformat binary_big_endian 1.0\n"
                  b"element vertex 2\nproperty float x\nproperty float y\n"
                  b"property float z\nend_header\n")
        p = tmp_path / "be.ply"
        p.write_bytes(header + pts.tobytes())
        back = tcio.read_point_cloud(p)
        np.testing.assert_allclose(back.to_numpy(), pts.astype("<f4"))

    def test_streaming_matches_full(self, cloud, tmp_path):
        p = tmp_path / "s.ply"
        tcio.write_point_cloud(p, cloud)
        chunks = list(tcio.read_point_cloud_iter(p, chunk_size=16))
        assert all(len(c) <= 16 for c in chunks)
        np.testing.assert_allclose(np.concatenate(chunks), cloud.to_numpy())

    def test_double_precision_and_extra_props(self, tmp_path):
        header = (b"ply\nformat ascii 1.0\ncomment test\n"
                  b"element vertex 2\nproperty double x\nproperty double y\n"
                  b"property double z\nproperty float quality\nend_header\n"
                  b"1 2 3 0.5\n4 5 6 0.7\n")
        p = tmp_path / "d.ply"
        p.write_bytes(header)
        back = tcio.read_point_cloud(p)
        np.testing.assert_allclose(back.to_numpy(), [[1, 2, 3], [4, 5, 6]])

    def test_corrupt_rejected(self, tmp_path):
        p = tmp_path / "bad.ply"
        p.write_bytes(b"not a ply at all")
        with pytest.raises(InvalidDataError):
            tcio.read_point_cloud(p)

    def test_truncated_rejected(self, tmp_path):
        header = (b"ply\nformat binary_little_endian 1.0\n"
                  b"element vertex 100\nproperty float x\nproperty float y\n"
                  b"property float z\nend_header\n")
        p = tmp_path / "t.ply"
        p.write_bytes(header + b"\x00" * 10)
        with pytest.raises(InvalidDataError):
            tcio.read_point_cloud(p)


class TestObj:
    def test_mesh_roundtrip(self, mesh, tmp_path):
        p = tmp_path / "m.obj"
        tcio.write_mesh(p, mesh)
        back = tcio.read_mesh(p)
        v0, f0 = mesh.to_numpy()
        v1, f1 = back.to_numpy()
        np.testing.assert_allclose(v1, v0, atol=1e-5)
        np.testing.assert_array_equal(f1, f0)

    def test_polygon_fan(self, tmp_path):
        p = tmp_path / "quad.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
        m = tcio.read_mesh(p)
        _, f = m.to_numpy()
        assert f.shape == (2, 3)

    def test_negative_indices(self, tmp_path):
        p = tmp_path / "neg.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
        m = tcio.read_mesh(p)
        _, f = m.to_numpy()
        np.testing.assert_array_equal(f, [[0, 1, 2]])

    def test_normals_resolved(self, tmp_path):
        p = tmp_path / "n.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\n"
                     "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
                     "f 1//1 2//2 3//3\n")
        m = tcio.read_mesh(p)
        n = m.attr_to_numpy("normals")
        np.testing.assert_allclose(n, [[0, 0, 1]] * 3, atol=1e-6)

    def test_mtl_parsed(self, tmp_path):
        (tmp_path / "mat.mtl").write_text(
            "newmtl red\nKd 1 0 0\nNs 10\n")
        p = tmp_path / "m.obj"
        p.write_text("mtllib mat.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
                     "usemtl red\nf 1 2 3\n")
        from threecrate_tpu.io.obj import read_obj
        data = read_obj(p)
        assert "red" in data.materials
        np.testing.assert_allclose(data.materials["red"].diffuse, [1, 0, 0])
        assert data.face_materials == ["red"]


class TestPcd:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, cloud, tmp_path, binary):
        p = tmp_path / "c.pcd"
        tcio.write_point_cloud(p, cloud, binary=binary)
        back = tcio.read_point_cloud(p)
        np.testing.assert_allclose(back.to_numpy(), cloud.to_numpy(),
                                   atol=1e-4)
        np.testing.assert_allclose(back.attr_to_numpy("colors"),
                                   cloud.attr_to_numpy("colors"), atol=1 / 255)

    def test_compressed_roundtrip(self, cloud, tmp_path):
        """binary_compressed via the LZF codec — a mode the reference
        REJECTS (pcd.rs:426); field-major payload, PCL layout."""
        p = tmp_path / "c.pcd"
        tcio.write_point_cloud(p, cloud, compressed=True)
        raw = p.read_bytes()
        assert b"DATA binary_compressed" in raw
        back = tcio.read_point_cloud(p)
        np.testing.assert_allclose(back.to_numpy(), cloud.to_numpy(),
                                   atol=1e-4)
        np.testing.assert_allclose(back.attr_to_numpy("colors"),
                                   cloud.attr_to_numpy("colors"),
                                   atol=1 / 255)
        # structured data genuinely compresses (the fixture's random
        # floats don't — LZF is byte-oriented)
        from threecrate_tpu import PointCloud
        g = np.mgrid[0:20, 0:20].reshape(2, -1).T.astype(np.float32)
        grid_cloud = PointCloud.from_numpy(
            np.concatenate([g, np.zeros((400, 1), np.float32)], 1))
        pg = tmp_path / "g.pcd"
        pgb = tmp_path / "gb.pcd"
        tcio.write_point_cloud(pg, grid_cloud, compressed=True)
        tcio.write_point_cloud(pgb, grid_cloud, binary=True)
        assert pg.stat().st_size < pgb.stat().st_size
        back2 = tcio.read_point_cloud(pg)
        np.testing.assert_allclose(back2.to_numpy(),
                                   grid_cloud.to_numpy(), atol=1e-6)

    def test_compressed_truncated_rejected(self, tmp_path):
        p = tmp_path / "c.pcd"
        p.write_bytes(b"VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                      b"COUNT 1 1 1\nWIDTH 1\nHEIGHT 1\nPOINTS 1\n"
                      b"DATA binary_compressed\nxxxx")
        from threecrate_tpu.core.errors import InvalidDataError
        with pytest.raises(InvalidDataError):
            tcio.read_point_cloud(p)

    def test_lzf_codec_roundtrip(self):
        from threecrate_tpu import native
        rng = np.random.default_rng(0)
        cases = [
            rng.integers(0, 256, 50000, dtype=np.uint8).tobytes(),
            b"abcabcabcabc" * 5000,
            np.zeros(70000, np.uint8).tobytes(),
            b"x", b"",
        ]
        for data in cases:
            comp = native.lzf_compress(data)
            assert native.lzf_decompress(comp, len(data)) == data
        # repetitive data genuinely compresses
        rep = b"abcabcabcabc" * 5000
        assert len(native.lzf_compress(rep)) < len(rep) // 10


class TestStl:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, mesh, tmp_path, binary):
        p = tmp_path / "m.stl"
        tcio.write_mesh(p, mesh, binary=binary)
        back = tcio.read_mesh(p)
        v1, f1 = back.to_numpy()
        assert v1.shape == (4, 3)   # welded back to 4 unique vertices
        assert f1.shape == (4, 3)
        # same surface area
        np.testing.assert_allclose(float(back.face_areas().sum()),
                                   float(mesh.face_areas().sum()), rtol=1e-5)


class TestXyzCsv:
    def test_plain_xyz(self, tmp_path):
        p = tmp_path / "a.xyz"
        p.write_text("1 2 3\n4 5 6\n")
        pc = tcio.read_point_cloud(p)
        np.testing.assert_allclose(pc.to_numpy(), [[1, 2, 3], [4, 5, 6]])

    def test_csv_with_header(self, tmp_path):
        p = tmp_path / "a.csv"
        p.write_text("x,y,z,intensity\n1,2,3,0.5\n4,5,6,0.25\n")
        pc = tcio.read_point_cloud(p)
        np.testing.assert_allclose(pc.to_numpy(), [[1, 2, 3], [4, 5, 6]])
        np.testing.assert_allclose(pc.attr_to_numpy("intensity"), [0.5, 0.25])

    def test_six_col_normals(self, tmp_path):
        p = tmp_path / "a.txt"
        p.write_text("0 0 0 0 0 1\n1 1 1 0 1 0\n")
        pc = tcio.read_point_cloud(p)
        np.testing.assert_allclose(pc.attr_to_numpy("normals"),
                                   [[0, 0, 1], [0, 1, 0]])

    def test_roundtrip(self, cloud, tmp_path):
        p = tmp_path / "c.xyz"
        tcio.write_point_cloud(p, cloud)
        back = tcio.read_point_cloud(p)
        np.testing.assert_allclose(back.to_numpy(), cloud.to_numpy(),
                                   atol=1e-4)

    def test_streaming(self, tmp_path, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        p = tmp_path / "s.xyz"
        tcio.write_point_cloud(p, PointCloud.from_numpy(pts))
        chunks = list(tcio.read_point_cloud_iter(p, chunk_size=1000))
        np.testing.assert_allclose(np.concatenate(chunks), pts, atol=1e-4)


class TestKitti:
    def test_roundtrip(self, tmp_path, rng):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        inten = rng.uniform(0, 1, 50).astype(np.float32)
        pc = PointCloud.from_numpy(pts, intensity=inten)
        p = tmp_path / "scan.bin"
        tcio.write_point_cloud(p, pc)
        back = tcio.read_point_cloud(p)
        np.testing.assert_allclose(back.to_numpy(), pts)
        np.testing.assert_allclose(back.attr_to_numpy("intensity"), inten)


class TestRegistry:
    def test_unknown_extension(self, tmp_path):
        with pytest.raises(UnsupportedFormatError):
            tcio.read_point_cloud(tmp_path / "f.nope")

    def test_missing_file(self, tmp_path):
        with pytest.raises(IoError):
            tcio.read_point_cloud(tmp_path / "missing.ply")

    def test_supported_extensions(self):
        exts = tcio.supported_extensions()
        for e in ("ply", "obj", "pcd", "stl", "xyz", "csv", "bin"):
            assert e in exts


class TestVelodynePcap:
    def _make_pcap(self, payloads):
        buf = _io.BytesIO()
        buf.write(struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1))
        for pl in payloads:
            eth = b"\x00" * 12 + struct.pack(">H", 0x0800)
            ip = bytes([0x45, 0]) + struct.pack(">H", 20 + 8 + len(pl)) \
                + b"\x00" * 4 + bytes([64, 17]) + b"\x00" * 10
            udp = struct.pack(">HHHH", 2368, 2368, 8 + len(pl), 0)
            pkt = eth + ip + udp + pl
            buf.write(struct.pack("<IIII", 0, 0, len(pkt), len(pkt)))
            buf.write(pkt)
        return buf.getvalue()

    def _velodyne_payload(self):
        blocks = b""
        for _ in range(12):
            block = struct.pack("<HH", 0xEEFF, 9000)  # azimuth 90.00 deg
            for ch in range(32):
                block += struct.pack("<HB", 500, 100)  # 1m, intensity 100
            blocks += block
        return blocks + b"\x00" * 6

    def test_decode(self, tmp_path):
        p = tmp_path / "v.pcap"
        p.write_bytes(self._make_pcap([self._velodyne_payload()]))
        pc = tcio.read_point_cloud(p, model="VLP-16")
        pts = pc.to_numpy()
        assert len(pts) == 12 * 32
        r = np.linalg.norm(pts, axis=1)
        np.testing.assert_allclose(r, 1.0, atol=1e-5)  # all at 1 m


class TestStreamingMesh:
    """read_mesh_iter (io/src/lib.rs:292, PlyMeshStreamingReader
    ply.rs:1751, OBJ streaming lib.rs:302): chunked vertex + face
    reads that never materialise the whole mesh."""

    @staticmethod
    def _assemble(chunks):
        chunks = list(chunks)
        vs = [c.vertices for c in chunks if c.vertices is not None]
        fs = [c.faces for c in chunks if c.faces is not None]
        return (np.concatenate(vs) if vs else np.zeros((0, 3)),
                np.concatenate(fs) if fs else np.zeros((0, 3), np.int32))

    def _grid_mesh(self, n=40):
        """Synthetic grid mesh: (n+1)^2 vertices, 2n^2 triangles."""
        ii, jj = np.mgrid[0:n + 1, 0:n + 1]
        v = np.stack([ii.ravel(), jj.ravel(),
                      np.sin(ii.ravel() * 0.2)], -1).astype(np.float32)
        f = []
        for i in range(n):
            for j in range(n):
                a = i * (n + 1) + j
                f.append([a, a + 1, a + n + 1])
                f.append([a + 1, a + n + 2, a + n + 1])
        return v, np.asarray(f, np.int32)

    def test_ply_binary_streams_and_matches(self, tmp_path):
        import threecrate_tpu.io as tcio
        from threecrate_tpu.core.mesh import TriangleMesh
        v, f = self._grid_mesh(40)
        p = tmp_path / "grid.ply"
        tcio.write_mesh(p, TriangleMesh.from_numpy(v, f))
        chunks = list(tcio.read_mesh_iter(p, chunk_size=500))
        # genuinely chunked: several vertex chunks and face chunks
        assert sum(c.vertices is not None for c in chunks) >= 3
        assert sum(c.faces is not None for c in chunks) >= 3
        gv, gf = self._assemble(chunks)
        np.testing.assert_allclose(gv, v, atol=1e-6)
        np.testing.assert_array_equal(gf, f)

    def test_ply_ascii_fallback_matches(self, tmp_path):
        import threecrate_tpu.io as tcio
        from threecrate_tpu.core.mesh import TriangleMesh
        from threecrate_tpu.io.ply import PlyWriteOptions
        v, f = self._grid_mesh(10)
        p = tmp_path / "grid_ascii.ply"
        tcio.write_mesh(p, TriangleMesh.from_numpy(v, f),
                        options=PlyWriteOptions(binary=False))
        gv, gf = self._assemble(tcio.read_mesh_iter(p, chunk_size=64))
        np.testing.assert_allclose(gv, v, atol=1e-5)
        np.testing.assert_array_equal(gf, f)

    def test_obj_streams_and_matches(self, tmp_path):
        import threecrate_tpu.io as tcio
        from threecrate_tpu.core.mesh import TriangleMesh
        v, f = self._grid_mesh(30)
        p = tmp_path / "grid.obj"
        tcio.write_mesh(p, TriangleMesh.from_numpy(v, f))
        chunks = list(tcio.read_mesh_iter(p, chunk_size=300))
        assert sum(c.vertices is not None for c in chunks) >= 3
        gv, gf = self._assemble(chunks)
        np.testing.assert_allclose(gv, v, atol=1e-4)
        np.testing.assert_array_equal(gf, f)

    def test_obj_negative_and_polygon_faces(self, tmp_path):
        import threecrate_tpu.io as tcio
        p = tmp_path / "quad.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                     "f -4 -3 -2 -1\n")
        gv, gf = self._assemble(tcio.read_mesh_iter(p))
        assert gv.shape == (4, 3)
        np.testing.assert_array_equal(gf, [[0, 1, 2], [0, 2, 3]])

    def test_registry_fallback_glb(self, tmp_path):
        """Formats without a native streaming reader fall back to a
        full read sliced into chunks."""
        import threecrate_tpu.io as tcio
        from threecrate_tpu.core.mesh import TriangleMesh
        v, f = self._grid_mesh(6)
        p = tmp_path / "grid.glb"
        tcio.write_mesh(p, TriangleMesh.from_numpy(v, f))
        gv, gf = self._assemble(tcio.read_mesh_iter(p, chunk_size=20))
        assert gv.shape == v.shape
        assert gf.shape == f.shape

    def test_large_mesh_bounded_memory(self, tmp_path):
        """A mesh bigger than the chunk budget streams with bounded
        per-chunk sizes (the >memory-budget contract, scaled down)."""
        import threecrate_tpu.io as tcio
        from threecrate_tpu.core.mesh import TriangleMesh
        v, f = self._grid_mesh(100)   # 10201 verts, 20000 faces
        p = tmp_path / "big.ply"
        tcio.write_mesh(p, TriangleMesh.from_numpy(v, f))
        max_rows = 0
        n_v = n_f = 0
        for c in tcio.read_mesh_iter(p, chunk_size=1024):
            arr = c.vertices if c.vertices is not None else c.faces
            max_rows = max(max_rows, len(arr))
            n_v += len(c.vertices) if c.vertices is not None else 0
            n_f += len(c.faces) if c.faces is not None else 0
        assert max_rows <= 1024
        assert n_v == len(v) and n_f == len(f)
