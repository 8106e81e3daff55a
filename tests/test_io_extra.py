"""LAS + rosbag2 + native parser tests."""

import sqlite3
import struct

import numpy as np
import pytest

import threecrate_tpu as tc
from threecrate_tpu.io import rosbag, ros2
from threecrate_tpu import native


class TestLas:
    def test_roundtrip(self, tmp_path, rng):
        pts = rng.uniform(-100, 100, (500, 3)).astype(np.float32)
        inten = rng.uniform(0, 1, 500).astype(np.float32)
        col = rng.uniform(0, 1, (500, 3)).astype(np.float32)
        pc = tc.PointCloud.from_numpy(pts, intensity=inten, colors=col)
        p = tmp_path / "scan.las"
        tc.write_point_cloud(p, pc)
        back = tc.read_point_cloud(p)
        # mm quantisation
        np.testing.assert_allclose(back.to_numpy(), pts, atol=2e-3)
        np.testing.assert_allclose(back.attr_to_numpy("intensity"), inten,
                                   atol=1 / 65535 * 2)
        np.testing.assert_allclose(back.attr_to_numpy("colors"), col,
                                   atol=1 / 65535 * 2)

    def test_bad_magic(self, tmp_path):
        from threecrate_tpu.core.errors import InvalidDataError
        p = tmp_path / "bad.las"
        p.write_bytes(b"NOPE" + b"\x00" * 300)
        with pytest.raises(InvalidDataError):
            tc.read_point_cloud(p)

    def test_laz_roundtrip(self, tmp_path, rng):
        """LASzip-compressed write → read through the native codec
        (chunked compressor 2, POINT10+RGB12 v2 items)."""
        n = 120_000   # > chunk size, exercises multi-chunk + threads
        walk = np.cumsum(rng.normal(0, 0.05, (n, 3)), axis=0)
        pts = walk.astype(np.float32)
        inten = rng.uniform(0, 1, n).astype(np.float32)
        col = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        pc = tc.PointCloud.from_numpy(pts, intensity=inten, colors=col)
        p = tmp_path / "scan.laz"
        tc.write_point_cloud(p, pc)
        las_p = tmp_path / "scan.las"
        tc.write_point_cloud(las_p, pc)
        assert p.stat().st_size < 0.7 * las_p.stat().st_size  # compresses
        back = tc.read_point_cloud(p)
        ref = tc.read_point_cloud(las_p)
        np.testing.assert_array_equal(back.to_numpy(), ref.to_numpy())
        np.testing.assert_array_equal(back.attr_to_numpy("colors"),
                                      ref.attr_to_numpy("colors"))
        np.testing.assert_allclose(back.to_numpy(), pts, atol=2e-3)

    def test_laz_gps_time_fmt3(self, tmp_path, rng):
        """gps_time attribute promotes to point format 3 and survives
        the GPSTIME11 v2 codec bit-exactly."""
        n = 5000
        pts = np.cumsum(rng.normal(0, 0.1, (n, 3)), 0).astype(np.float32)
        gps = (3.0e5 + np.cumsum(rng.uniform(1e-6, 2e-4, n))).astype(
            np.float64)
        pc = tc.PointCloud.from_numpy(pts, gps_time=gps)
        p = tmp_path / "t.laz"
        tc.write_point_cloud(p, pc)
        back = tc.read_point_cloud(p)
        # PointCloud attrs are float32 — the codec itself is bit-exact
        # on the f64 records, so expect the f32-quantised values back
        np.testing.assert_array_equal(
            back.attr_to_numpy("gps_time"),
            gps.astype(np.float32))

    def test_laz_corrupt_stream(self, tmp_path, rng):
        """Corrupting the chunk table pointer raises, not crashes."""
        pc = tc.PointCloud.from_numpy(
            rng.normal(0, 1, (1000, 3)).astype(np.float32))
        p = tmp_path / "c.laz"
        tc.write_point_cloud(p, pc)
        blob = bytearray(p.read_bytes())
        off = int.from_bytes(blob[96:100], "little")
        blob[off:off + 8] = (2 ** 62).to_bytes(8, "little")
        p.write_bytes(bytes(blob))
        with pytest.raises(Exception):
            tc.read_point_cloud(p)


def _cdr_string(s: str) -> bytes:
    b = s.encode() + b"\x00"
    return struct.pack("<I", len(b)) + b


def _pad_to(buf: bytearray, align: int) -> None:
    rem = (len(buf) - 4) % align
    if rem:
        buf.extend(b"\x00" * (align - rem))


def make_pointcloud2_cdr(pts: np.ndarray, frame: str = "map") -> bytes:
    """Hand-build a CDR-encoded PointCloud2 (XYZ float32)."""
    buf = bytearray(b"\x00\x01\x00\x00")  # CDR_LE encapsulation
    _pad_to(buf, 4)
    buf += struct.pack("<iI", 7, 42)      # stamp sec, nanosec
    buf += _cdr_string(frame)
    _pad_to(buf, 4)
    buf += struct.pack("<II", 1, len(pts))  # height, width
    buf += struct.pack("<I", 3)             # 3 fields
    for i, name in enumerate("xyz"):
        buf += _cdr_string(name)
        _pad_to(buf, 4)
        buf += struct.pack("<I", i * 4)     # offset
        buf += struct.pack("<B", 7)         # FLOAT32
        _pad_to(buf, 4)
        buf += struct.pack("<I", 1)         # count
    buf += struct.pack("<B", 0)             # is_bigendian
    _pad_to(buf, 4)
    buf += struct.pack("<II", 12, 12 * len(pts))
    data = pts.astype("<f4").tobytes()
    buf += struct.pack("<I", len(data)) + data
    buf += struct.pack("<B", 1)             # is_dense
    return bytes(buf)


class TestRosbag2:
    def _make_bag(self, path, pts):
        conn = sqlite3.connect(str(path))
        conn.executescript("""
            CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT,
                type TEXT, serialization_format TEXT,
                offered_qos_profiles TEXT);
            CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,
                timestamp INTEGER, data BLOB);
        """)
        conn.execute(
            "INSERT INTO topics VALUES (1, '/lidar/points', "
            "'sensor_msgs/msg/PointCloud2', 'cdr', '')")
        for i in range(3):
            conn.execute(
                "INSERT INTO messages(topic_id, timestamp, data) "
                "VALUES (1, ?, ?)",
                (1000 + i, make_pointcloud2_cdr(pts + i)))
        conn.commit()
        conn.close()

    def test_cdr_decode(self, rng):
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        msg = rosbag.decode_pointcloud2_cdr(make_pointcloud2_cdr(pts))
        assert msg["header"]["frame_id"] == "map"
        assert msg["width"] == 10
        pc = ros2.from_pointcloud2(msg)
        np.testing.assert_allclose(pc.to_numpy(), pts, atol=1e-6)

    def test_bag_reading(self, tmp_path, rng):
        pts = rng.normal(size=(20, 3)).astype(np.float32)
        bag = tmp_path / "ride.db3"
        self._make_bag(bag, pts)
        reader = rosbag.Rosbag2Reader(bag)
        assert reader.pointcloud_topics() == ["/lidar/points"]
        clouds = reader.read_clouds()
        reader.close()
        assert len(clouds) == 3
        np.testing.assert_allclose(clouds[0].to_numpy(), pts, atol=1e-6)
        np.testing.assert_allclose(clouds[2].to_numpy(), pts + 2, atol=1e-6)

    def test_registry_dispatch(self, tmp_path, rng):
        pts = rng.normal(size=(15, 3)).astype(np.float32)
        bag = tmp_path / "ride.db3"
        self._make_bag(bag, pts)
        merged = tc.read_point_cloud(bag)
        assert len(merged) == 45

    def test_mcap_bad_magic(self, tmp_path):
        from threecrate_tpu.core.errors import InvalidDataError
        p = tmp_path / "x.mcap"
        p.write_bytes(b"nope nope")
        with pytest.raises(InvalidDataError):
            rosbag.McapReader(p)


class TestNativeParser:
    def test_matches_numpy(self, rng):
        vals = rng.uniform(-1e3, 1e3, 1000)
        text = " ".join(f"{v:.9g}" for v in vals)
        out = native.parse_floats(text)
        np.testing.assert_allclose(out, vals, rtol=1e-7)

    def test_delimiters(self):
        out = native.parse_floats("1,2;3\t4\n5 6")
        np.testing.assert_array_equal(out, [1, 2, 3, 4, 5, 6])

    def test_scientific_and_special(self):
        out = native.parse_floats("1e3 -2.5E-2 .5 -.25")
        np.testing.assert_allclose(out, [1000, -0.025, 0.5, -0.25])


class TestArtifacts:
    def test_cloud_roundtrip(self, tmp_path, rng):
        from threecrate_tpu.io.artifacts import load_artifact, save_artifact
        pts = rng.normal(size=(40, 3)).astype(np.float32)
        pc = tc.PointCloud.from_numpy(pts, intensity=rng.uniform(
            0, 1, 40).astype(np.float32))
        p = tmp_path / "c.npz"
        save_artifact(p, pc)
        back = load_artifact(p)
        np.testing.assert_allclose(back.to_numpy(), pts)
        assert "intensity" in back.attrs
        assert back.capacity == pc.capacity  # exact state, masks included

    def test_mesh_roundtrip(self, tmp_path):
        from threecrate_tpu.io.artifacts import load_artifact, save_artifact
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        f = np.array([[0, 1, 2]], np.int32)
        m = tc.TriangleMesh.from_numpy(v, f).compute_vertex_normals()
        p = tmp_path / "m.npz"
        save_artifact(p, m)
        back = load_artifact(p)
        v1, f1 = back.to_numpy()
        np.testing.assert_allclose(v1, v)
        assert "normals" in back.attrs

    def test_tsdf_resume(self, tmp_path):
        from threecrate_tpu.io.artifacts import load_artifact, save_artifact
        import jax.numpy as jnp
        vol = tc.create_tsdf_volume((8, 8, 8), 0.1, with_color=True)
        depth = np.full((8, 8), 0.3, np.float32)
        intr = np.array([8.0, 8.0, 4.0, 4.0], np.float32)
        vol = tc.tsdf_integrate(vol, depth, intr, np.eye(4, dtype=np.float32))
        p = tmp_path / "vol.npz"
        save_artifact(p, vol)
        back = load_artifact(p)
        np.testing.assert_allclose(np.asarray(back.tsdf),
                                   np.asarray(vol.tsdf))
        # resume fusion from the checkpoint
        vol2 = tc.tsdf_integrate(back, depth, intr,
                                 np.eye(4, dtype=np.float32))
        assert float(vol2.weight.max()) == 2.0


class TestGltf:
    def test_glb_roundtrip(self, tmp_path, rng):
        v = rng.normal(size=(20, 3)).astype(np.float32)
        f = np.stack([np.arange(18), np.arange(18) + 1,
                      np.arange(18) + 2], 1).astype(np.int32) % 20
        n = rng.normal(size=(20, 3)).astype(np.float32)
        c = rng.uniform(0, 1, (20, 3)).astype(np.float32)
        m = tc.TriangleMesh.from_numpy(v, f, normals=n, colors=c)
        p = tmp_path / "m.glb"
        tc.write_mesh(p, m)
        back = tc.read_mesh(p)
        v1, f1 = back.to_numpy()
        v0, f0 = m.to_numpy()
        np.testing.assert_allclose(v1, v0, atol=1e-6)
        np.testing.assert_array_equal(f1, f0)
        np.testing.assert_allclose(back.attr_to_numpy("normals"),
                                   m.attr_to_numpy("normals"), atol=1e-6)

    def test_glb_header_valid(self, tmp_path):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        f = np.array([[0, 1, 2]], np.int32)
        p = tmp_path / "t.glb"
        tc.write_mesh(p, tc.TriangleMesh.from_numpy(v, f))
        blob = p.read_bytes()
        assert blob[:4] == b"glTF"
        import struct as _s
        total = _s.unpack_from("<I", blob, 8)[0]
        assert total == len(blob)


class TestMmap:
    def test_large_file_mapped(self, tmp_path, rng):
        from threecrate_tpu.io.mmap import MmapReader
        pts = rng.normal(size=(10000, 3)).astype(np.float32)
        p = tmp_path / "big.ply"
        tc.write_point_cloud(p, tc.PointCloud.from_numpy(pts))
        with MmapReader(p) as mm:
            assert mm.is_mapped
            assert bytes(mm.data()[:3]) == b"ply"
        back = tc.read_point_cloud(p)  # goes through the mmap fast path
        np.testing.assert_allclose(back.to_numpy(), pts, atol=1e-6)

    def test_small_file_buffered(self, tmp_path):
        from threecrate_tpu.io.mmap import MmapReader
        p = tmp_path / "small.bin"
        p.write_bytes(b"tiny")
        with MmapReader(p) as mm:
            assert not mm.is_mapped
            assert mm.data() == b"tiny"


class TestMcap:
    def _make_mcap(self, path, pts):
        def record(op, body):
            return bytes([op]) + struct.pack("<Q", len(body)) + body

        def s(x):
            b = x.encode()
            return struct.pack("<I", len(b)) + b
        buf = bytearray(b"\x89MCAP0\r\n")
        # schema 1
        buf += record(0x03, struct.pack("<H", 1)
                      + s("sensor_msgs/msg/PointCloud2") + s("ros2msg")
                      + struct.pack("<I", 0))
        # channel 7 -> schema 1
        buf += record(0x04, struct.pack("<HH", 7, 1) + s("/points")
                      + s("cdr") + struct.pack("<I", 0))
        for i in range(2):
            payload = make_pointcloud2_cdr(pts + i)
            body = struct.pack("<HIQQ", 7, i, 1000 + i, 1000 + i) + payload
            buf += record(0x05, body)
        buf += b"\x89MCAP0\r\n"
        path.write_bytes(bytes(buf))

    def test_read(self, tmp_path, rng):
        pts = rng.normal(size=(12, 3)).astype(np.float32)
        p = tmp_path / "ride.mcap"
        self._make_mcap(p, pts)
        reader = rosbag.McapReader(p)
        assert reader.pointcloud_topics() == ["/points"]
        clouds = reader.read_clouds()
        assert len(clouds) == 2
        np.testing.assert_allclose(clouds[0].to_numpy(), pts, atol=1e-6)
        merged = tc.read_point_cloud(p)
        assert len(merged) == 24


class TestE57:
    def test_roundtrip(self, tmp_path, rng):
        pts = rng.uniform(-50, 50, (3000, 3)).astype(np.float32)
        inten = rng.uniform(0, 1, 3000).astype(np.float32)
        pc = tc.PointCloud.from_numpy(pts, intensity=inten)
        p = tmp_path / "scan.e57"
        tc.write_point_cloud(p, pc)
        back = tc.read_point_cloud(p)
        np.testing.assert_allclose(back.to_numpy(), pts, atol=1e-5)
        np.testing.assert_allclose(back.attr_to_numpy("intensity"), inten,
                                   atol=1e-6)

    def test_spherical_roundtrip(self, tmp_path, rng):
        """Spherical-only scans decode to cartesian (the reference
        reader skips them, e57.rs:56)."""
        from threecrate_tpu.io import e57 as e57mod
        pts = rng.uniform(-50, 50, (2000, 3)).astype(np.float32)
        pc = tc.PointCloud.from_numpy(pts)
        p = tmp_path / "sph.e57"
        e57mod.write_point_cloud(p, pc, spherical=True)
        back = tc.read_point_cloud(p)
        np.testing.assert_allclose(back.to_numpy(), pts, atol=1e-4)

    def test_header_and_crc(self, tmp_path, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        p = tmp_path / "s.e57"
        tc.write_point_cloud(p, tc.PointCloud.from_numpy(pts))
        blob = bytearray(p.read_bytes())
        assert blob[:8] == b"ASTM-E57"
        # corrupt a data byte in the first page → CRC failure on read
        blob[100] ^= 0xFF
        p.write_bytes(bytes(blob))
        from threecrate_tpu.core.errors import InvalidDataError
        with pytest.raises(InvalidDataError):
            tc.read_point_cloud(p)

    def test_scaled_integer_decode(self, tmp_path, rng):
        """Hand-build a ScaledInteger E57 (the common scanner layout)
        and verify the bit-unpack path."""
        from threecrate_tpu.io import e57 as e57mod
        import struct
        pts = rng.uniform(0, 10, (50, 3)).astype(np.float64)
        scale = 0.001
        q = np.round(pts / scale).astype(np.int64)
        mn, mx = int(q.min()), int(q.max())
        bits = max((mx - mn).bit_length(), 1)

        def pack(vals):
            u = (vals - mn).astype(np.uint64)
            out = np.zeros(((len(u) * bits + 7) // 8,), np.uint8)
            bitpos = 0
            for v in u:
                for b in range(bits):
                    if (int(v) >> b) & 1:
                        out[bitpos // 8] |= 1 << (bitpos % 8)
                    bitpos += 1
            return out.tobytes()

        streams = [pack(q[:, i]) for i in range(3)]
        n_streams = 3
        header_len = 6 + 2 * n_streams
        pad = (-header_len) % 4
        body = b"".join(streams)
        pkt_len = header_len + pad + len(body)
        pkt_len += (-pkt_len) % 4
        packet = struct.pack("<BBHH", 1, 0, pkt_len - 1, n_streams)
        packet += struct.pack("<3H", *map(len, streams))
        packet += b"\x00" * pad + body
        packet += b"\x00" * (pkt_len - len(packet))

        section = struct.pack("<B7xQQQ", 1, 32 + len(packet),
                              e57mod._phys_off(48 + 32), 0)
        proto = "".join(
            f'<{nm} type="ScaledInteger" minimum="{mn}" maximum="{mx}" '
            f'scale="{scale}" offset="0"/>'
            for nm in ("cartesianX", "cartesianY", "cartesianZ"))
        xml = ('<?xml version="1.0" encoding="UTF-8"?>'
               '<e57Root type="Structure" '
               'xmlns="http://www.astm.org/COMMIT/E57/2010-e57-v1.0">'
               '<data3D type="Vector"><vectorChild type="Structure">'
               f'<points type="CompressedVector" fileOffset="48" '
               f'recordCount="{len(pts)}">'
               f'<prototype type="Structure">{proto}</prototype>'
               '</points></vectorChild></data3D></e57Root>'
               ).encode()
        logical = bytearray(b"\x00" * 48) + section + packet
        xml_off = len(logical)
        logical += xml
        physical = bytearray(e57mod._to_physical(bytes(logical)))
        header = struct.pack("<8sIIQQQQ", b"ASTM-E57", 1, 0,
                             len(physical), e57mod._phys_off(xml_off),
                             len(xml), 1024)
        physical[:len(header)] = header
        first = bytes(physical[:1020])
        physical[1020:1024] = struct.pack("<I", e57mod.crc32c(first))
        p = tmp_path / "si.e57"
        p.write_bytes(bytes(physical))
        back = tc.read_point_cloud(p)
        np.testing.assert_allclose(back.to_numpy(), pts, atol=scale)


class TestTczRegistry:
    def test_extension_dispatch_roundtrip(self, tmp_path, rng):
        """.tcz routes through the registry; points survive on the
        quantisation lattice (order is Morton, not input order)."""
        pts = rng.uniform(-10, 10, (4000, 3)).astype(np.float32)
        p = tmp_path / "c.tcz"
        tc.write_point_cloud(p, tc.PointCloud.from_numpy(pts))
        back = tc.read_point_cloud(p).to_numpy()
        assert len(back) == 4000
        p64 = pts.astype(np.float64)
        mn, ext = p64.min(0), np.maximum(np.ptp(p64, 0), 1e-12)
        s = ((1 << 14) - 1) / ext
        qa = set(map(tuple, np.round((p64 - mn) * s).astype(np.int64)))
        qb = set(map(tuple, np.round((back.astype(np.float64) - mn) * s
                                     ).astype(np.int64)))
        assert qa == qb


class TestLaszipAdversarial:
    """Bit-exactness of the native LASzip codec under hostile records
    (exercised at the ctypes layer to control raw record bytes)."""

    def _roundtrip(self, rec, fmt, rec_len, chunk=1000):
        import ctypes
        from threecrate_tpu.native import _load_laz
        lib = _load_laz()
        if lib is None:
            pytest.skip("native codec unavailable")
        u8p = ctypes.POINTER(ctypes.c_uint8)
        n = len(rec)
        flat = np.ascontiguousarray(rec.reshape(-1))
        out = np.zeros(n * rec_len * 3 + (1 << 16), np.uint8)
        blen = lib.tc_laz_compress(
            flat.ctypes.data_as(u8p), n, rec_len, fmt, chunk, 500,
            out.ctypes.data_as(u8p), len(out))
        assert blen > 0
        fb = np.zeros(500 + blen, np.uint8)
        fb[500:500 + blen] = out[:blen]
        dec = np.zeros(n * rec_len, np.uint8)
        r = lib.tc_laz_decompress(
            fb.ctypes.data_as(u8p), len(fb), 500, n, chunk, fmt,
            dec.ctypes.data_as(u8p), rec_len)
        assert r == 0
        np.testing.assert_array_equal(dec, flat)

    def test_extreme_values(self, rng):
        n = 3333
        rec = np.zeros((n, 34), np.uint8)
        xyz = rng.integers(-2**31, 2**31, (n, 3), dtype=np.int64
                           ).astype("<i4")
        rec[:, :12] = xyz.view(np.uint8).reshape(n, 12)
        rec[:, 12:20] = rng.integers(0, 256, (n, 8), dtype=np.uint8)
        gps = rng.choice([0.0, 1e308, -1e-300, 3.14, np.inf, -np.inf],
                         n).astype("<f8")
        rec[:, 20:28] = gps.view(np.uint8).reshape(n, 8)
        rec[:, 28:34] = rng.integers(0, 256, (n, 6), dtype=np.uint8)
        self._roundtrip(rec, 3, 34)

    def test_constant_points_and_nan_gps(self, rng):
        n = 2000
        rec = np.zeros((n, 34), np.uint8)
        rec[:] = rng.integers(0, 256, (1, 34), dtype=np.uint8)
        self._roundtrip(rec, 3, 34)
        rec[:, 20:28] = np.full(n, np.nan, "<f8").view(np.uint8
                                                       ).reshape(n, 8)
        self._roundtrip(rec, 3, 34)

    def test_chunk_size_one(self, rng):
        n = 129
        rec = rng.integers(0, 256, (n, 20), dtype=np.uint8)
        self._roundtrip(rec, 0, 20, chunk=1)


def test_las_writer_rejects_int32_overflow(tmp_path):
    import pytest
    from threecrate_tpu import PointCloud
    from threecrate_tpu.core.errors import InvalidDataError
    from threecrate_tpu.io import las
    # 5000 km extent at the default 1e-3 scale overflows int32
    pts = np.array([[0, 0, 0], [5.0e6, 0, 0]], np.float32)
    cloud = PointCloud.from_numpy(pts)
    with pytest.raises(InvalidDataError, match="int32"):
        las.write_point_cloud(tmp_path / "x.las", cloud, scale=1e-3)
    # a coarser scale fits
    las.write_point_cloud(tmp_path / "ok.las", cloud, scale=10.0)


class TestLivoxLvx2:
    """Synthesized LVX2 containers (LivoxLvx2Reader, lidar.rs:772-880)."""

    @staticmethod
    def _make_lvx2(frames, device_count=1, header_size=28):
        """frames: list of list of (data_type, xyz_m (n,3) ndarray)."""
        out = bytearray()
        out += struct.pack("<I", 0x20200903)          # magic
        out += b"\x02\x00\x00\x00"                    # version
        out += struct.pack("<I", header_size)         # header_size
        out += struct.pack("<Q", 0)                   # file_size (unused)
        out += struct.pack("<I", 50)                  # frame_duration
        out += struct.pack("<BB", device_count, 1)    # device_count, data_type
        out += b"\x00" * (header_size - len(out))
        for _ in range(device_count):
            out += b"SN".ljust(16, b"\x00") + b"\x00" + b"\x00" * 24
        data_block_start = len(out)

        def pack_points(dtype, xyz):
            body = bytearray()
            for x, y, z in xyz:
                if dtype == 0:
                    body += struct.pack("<hhhBB", round(x * 100),
                                        round(y * 100), round(z * 100), 42, 0)
                elif dtype == 1:
                    body += struct.pack("<iiiBB", round(x * 1000),
                                        round(y * 1000), round(z * 1000),
                                        77, 0)
                else:  # spherical
                    r = float(np.linalg.norm([x, y, z]))
                    theta = float(np.degrees(np.arccos(z / max(r, 1e-9))))
                    phi = float(np.degrees(np.arctan2(y, x))) % 360.0
                    body += struct.pack("<IHHBB", round(r * 1000),
                                        round(theta * 100), round(phi * 100),
                                        9, 0)
            return bytes(body)

        rel = 0
        for i, packets in enumerate(frames):
            frame = bytearray()
            for dtype, xyz in packets:
                body = pack_points(dtype, xyz)
                frame += struct.pack("<BBIBI", 0, 8, len(xyz), dtype,
                                     len(body))
                frame += body
            frame_len = 24 + len(frame)
            nxt = 0 if i == len(frames) - 1 else rel + frame_len
            out += struct.pack("<QQQ", rel, nxt, i)
            out += frame
            rel += frame_len
        return bytes(out), data_block_start

    def test_cartesian_formats_roundtrip(self, tmp_path, rng):
        xyz16 = rng.uniform(-20, 20, (50, 3)).astype(np.float32)
        xyz32 = rng.uniform(-20, 20, (60, 3)).astype(np.float32)
        blob, _ = self._make_lvx2([[(0, xyz16)], [(1, xyz32)]])
        p = tmp_path / "rec.lvx2"
        p.write_bytes(blob)
        pc = tc.read_point_cloud(p)
        got = pc.to_numpy()
        assert got.shape == (110, 3)
        np.testing.assert_allclose(got[:50], xyz16, atol=6e-3)   # cm quant
        np.testing.assert_allclose(got[50:], xyz32, atol=6e-4)   # mm quant
        inten = pc.attr_to_numpy("intensity")
        assert (inten[:50] == 42).all() and (inten[50:] == 77).all()

    def test_spherical_format(self, tmp_path, rng):
        xyz = rng.uniform(1, 20, (40, 3)).astype(np.float32)
        blob, _ = self._make_lvx2([[(2, xyz)]])
        p = tmp_path / "sph.lvx2"
        p.write_bytes(blob)
        got = tc.read_point_cloud(p).to_numpy()
        # 0.01-degree angular quantisation at ~35 m range
        np.testing.assert_allclose(got, xyz, atol=2e-2)

    def test_bad_magic_rejected(self, tmp_path):
        p = tmp_path / "bad.lvx2"
        p.write_bytes(b"\x00" * 64)
        with pytest.raises(Exception, match="LVX2|magic"):
            tc.read_point_cloud(p)

    def test_max_frames(self, tmp_path, rng):
        from threecrate_tpu.io.lidar import read_livox_lvx2
        xyz = rng.uniform(-5, 5, (10, 3)).astype(np.float32)
        blob, _ = self._make_lvx2([[(1, xyz)], [(1, xyz)], [(1, xyz)]])
        p = tmp_path / "multi.lvx2"
        p.write_bytes(blob)
        assert len(read_livox_lvx2(p, max_frames=2).to_numpy()) == 20
        assert len(read_livox_lvx2(p).to_numpy()) == 30


class TestLas14:
    """LAS 1.4 extended formats (VERDICT r3 item 7): uncompressed
    formats 6/7 write+read round-trip; formats 8/9/10 read from
    hand-built files; LAZ of formats 6+ stays a documented rejection
    (no LASzip-3 spec/corpus/tooling reachable — re-verified r3)."""

    def _cloud(self, n=500, rgb=True, gps=True):
        rng = np.random.default_rng(40)
        pts = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
        attrs = {"intensity": rng.uniform(0, 1, n).astype(np.float32)}
        if rgb:
            attrs["colors"] = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        if gps:
            attrs["gps_time"] = np.linspace(1e5, 1e5 + 10, n)
        return tc.PointCloud.from_numpy(pts, **attrs)

    def test_format6_roundtrip(self, tmp_path):
        from threecrate_tpu.io import las
        pc = self._cloud(rgb=False)
        path = str(tmp_path / "f6.las")
        las.write_point_cloud(path, pc, scale=1e-3, point_format=6)
        data = open(path, "rb").read()
        assert data[24] == 1 and data[25] == 4       # LAS 1.4
        assert data[104] == 6
        back = las.read_point_cloud(path)
        np.testing.assert_allclose(back.to_numpy(), pc.to_numpy(),
                                   atol=1e-3)
        np.testing.assert_allclose(
            back.attr_to_numpy("gps_time"),
            pc.attr_to_numpy("gps_time"), atol=1e-9)
        np.testing.assert_allclose(
            back.attr_to_numpy("intensity"),
            pc.attr_to_numpy("intensity"), atol=1e-4)

    def test_format7_roundtrip(self, tmp_path):
        from threecrate_tpu.io import las
        pc = self._cloud()
        path = str(tmp_path / "f7.las")
        las.write_point_cloud(path, pc, scale=1e-3, point_format=7)
        assert open(path, "rb").read()[104] == 7
        back = las.read_point_cloud(path)
        np.testing.assert_allclose(back.to_numpy(), pc.to_numpy(),
                                   atol=1e-3)
        np.testing.assert_allclose(
            back.attr_to_numpy("colors"), pc.attr_to_numpy("colors"),
            atol=1e-4)

    @pytest.mark.parametrize("fmt,rec_len", [(8, 38), (9, 59), (10, 67)])
    def test_formats_8_9_10_read(self, tmp_path, fmt, rec_len):
        """Hand-built LAS 1.4 files for the wave/NIR formats the
        writer does not emit (reference reads them via pasture)."""
        import struct
        from threecrate_tpu.io import las
        n = 40
        rng = np.random.default_rng(fmt)
        xyz = rng.integers(-10000, 10000, (n, 3)).astype(np.int32)
        rec = np.zeros((n, rec_len), np.uint8)
        rec[:, 0:12] = xyz.astype("<i4").view(np.uint8).reshape(n, 12)
        inten = rng.integers(1, 65535, n).astype("<u2")
        rec[:, 12:14] = inten.view(np.uint8).reshape(n, 2)
        gps = np.linspace(5.0, 6.0, n).astype("<f8")
        rec[:, 22:30] = gps.view(np.uint8).reshape(n, 8)
        if fmt in (8, 10):
            rgb = rng.integers(0, 65535, (n, 3)).astype("<u2")
            rec[:, 30:36] = rgb.view(np.uint8).reshape(n, 6)
            nir = rng.integers(1, 65535, n).astype("<u2")
            rec[:, 36:38] = nir.view(np.uint8).reshape(n, 2)

        hdr = bytearray(375)
        hdr[0:4] = b"LASF"
        hdr[24], hdr[25] = 1, 4
        struct.pack_into("<H", hdr, 94, 375)
        struct.pack_into("<I", hdr, 96, 375)
        hdr[104] = fmt
        struct.pack_into("<H", hdr, 105, rec_len)
        struct.pack_into("<I", hdr, 107, 0)
        scale = 1e-2
        struct.pack_into("<6d", hdr, 131, scale, scale, scale, 1.0, 2.0,
                         3.0)
        struct.pack_into("<Q", hdr, 247, n)
        path = str(tmp_path / f"f{fmt}.las")
        with open(path, "wb") as f:
            f.write(bytes(hdr))
            f.write(rec.tobytes())

        back = las.read_point_cloud(path)
        exp = xyz.astype(np.float64) * scale + [1.0, 2.0, 3.0]
        np.testing.assert_allclose(back.to_numpy(), exp, atol=1e-4)
        np.testing.assert_allclose(back.attr_to_numpy("gps_time"), gps)
        if fmt in (8, 10):
            np.testing.assert_allclose(
                back.attr_to_numpy("nir"),
                nir.astype(np.float32) / 65535.0, atol=1e-6)

    def test_laz_of_format6_rejected(self, tmp_path):
        from threecrate_tpu.core.errors import UnsupportedError
        from threecrate_tpu.io import las
        pc = self._cloud(rgb=False)
        with pytest.raises(UnsupportedError, match="LASzip 3"):
            las.write_point_cloud(str(tmp_path / "f6.laz"), pc,
                                  point_format=6, compress=True)


class TestRos2NamedConverters:
    """The 8 typed entry points (threecrate-python/src/lib.rs:2580-2588,
    ros2.rs:214-637): raw-piece parsing with per-type field
    requirements, exact serializer layouts, rgba/strided decoding."""

    def _cloud(self, rng, n=12, normals=False, colors=False):
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        attrs = {}
        if normals:
            nr = rng.normal(size=(n, 3)).astype(np.float32)
            nr /= np.linalg.norm(nr, axis=1, keepdims=True)
            attrs["normals"] = nr
        if colors:
            attrs["colors"] = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        return tc.PointCloud.from_numpy(pts, **attrs), pts, attrs

    def test_xyz_roundtrip_layout(self, rng):
        cloud, pts, _ = self._cloud(rng, normals=True)  # normals stripped
        msg = ros2.xyz_to_pointcloud2(cloud)
        assert msg["point_step"] == 12
        assert [f["name"] for f in msg["fields"]] == ["x", "y", "z"]
        back = ros2.pointcloud2_to_xyz(
            msg["data"],
            [(f["name"], f["offset"], f["datatype"], f["count"])
             for f in msg["fields"]],
            msg["point_step"], msg["width"], msg["height"])
        np.testing.assert_allclose(back.to_numpy(), pts, atol=1e-6)
        assert not back.attrs

    def test_normals_roundtrip(self, rng):
        cloud, pts, attrs = self._cloud(rng, normals=True)
        msg = ros2.normals_to_pointcloud2(cloud)
        assert msg["point_step"] == 24
        offs = {f["name"]: f["offset"] for f in msg["fields"]}
        assert offs == {"x": 0, "y": 4, "z": 8, "normal_x": 12,
                        "normal_y": 16, "normal_z": 20}
        back = ros2.pointcloud2_to_normals(
            msg["data"], msg["fields"], msg["point_step"],
            msg["width"], msg["height"])
        np.testing.assert_allclose(back.attr_to_numpy("normals"),
                                   attrs["normals"], atol=1e-6)

    def test_colored_roundtrip_packing(self, rng):
        cloud, pts, attrs = self._cloud(rng, colors=True)
        msg = ros2.colored_to_pointcloud2(cloud)
        assert msg["point_step"] == 16
        # rgb field is f32 whose bits encode 0x00RRGGBB
        rec = np.frombuffer(msg["data"], np.dtype(
            [("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("rgb", "<f4")]))
        packed = rec["rgb"].view(np.uint32)
        r = (packed >> 16) & 0xFF
        exp = np.clip(attrs["colors"][:, 0] * 255 + 0.5, 0,
                      255).astype(np.uint32)
        np.testing.assert_array_equal(r, exp)
        back = ros2.pointcloud2_to_colored(
            msg["data"], msg["fields"], msg["point_step"],
            msg["width"], msg["height"])
        np.testing.assert_allclose(back.attr_to_numpy("colors"),
                                   attrs["colors"], atol=1 / 255.0)

    def test_colored_normals_roundtrip(self, rng):
        cloud, pts, attrs = self._cloud(rng, normals=True, colors=True)
        msg = ros2.colored_normals_to_pointcloud2(cloud)
        assert msg["point_step"] == 28
        offs = {f["name"]: f["offset"] for f in msg["fields"]}
        assert offs["rgb"] == 24
        back = ros2.pointcloud2_to_colored_normals(
            msg["data"], msg["fields"], msg["point_step"],
            msg["width"], msg["height"])
        np.testing.assert_allclose(back.attr_to_numpy("normals"),
                                   attrs["normals"], atol=1e-6)
        np.testing.assert_allclose(back.to_numpy(), pts, atol=1e-6)

    def test_missing_required_fields_raise(self, rng):
        from threecrate_tpu.core.errors import InvalidDataError
        cloud, _, _ = self._cloud(rng)
        msg = ros2.xyz_to_pointcloud2(cloud)
        args = (msg["data"], msg["fields"], msg["point_step"],
                msg["width"], msg["height"])
        with pytest.raises(InvalidDataError):
            ros2.pointcloud2_to_normals(*args)
        with pytest.raises(InvalidDataError):
            ros2.pointcloud2_to_colored(*args)
        with pytest.raises(InvalidDataError):
            ros2.normals_to_pointcloud2(cloud)
        with pytest.raises(InvalidDataError):
            ros2.colored_to_pointcloud2(cloud)

    def test_rgba_uint32_and_stride(self, rng):
        """Strided layout with extra bytes + rgba as UINT32 (datatype 6):
        the alpha byte is discarded."""
        n = 7
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        rec = np.zeros(n, np.dtype({
            "names": ["x", "y", "z", "rgba", "junk"],
            "formats": ["<f4", "<f4", "<f4", "<u4", "<u4"],
            "offsets": [0, 4, 8, 16, 20], "itemsize": 24}))
        rec["x"], rec["y"], rec["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
        rec["rgba"] = 0xFF000000 | (10 << 16) | (20 << 8) | 30
        back = ros2.pointcloud2_to_colored(
            rec.tobytes(),
            [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1),
             ("rgba", 16, 6, 1)], 24, n, 1)
        np.testing.assert_allclose(back.to_numpy(), pts, atol=1e-6)
        cols = back.attr_to_numpy("colors") * 255
        np.testing.assert_allclose(cols[0], [10, 20, 30], atol=0.5)

    def test_buffer_too_short(self, rng):
        from threecrate_tpu.core.errors import InvalidDataError
        cloud, _, _ = self._cloud(rng)
        msg = ros2.xyz_to_pointcloud2(cloud)
        with pytest.raises(InvalidDataError):
            ros2.pointcloud2_to_xyz(
                msg["data"][:-4], msg["fields"], msg["point_step"],
                msg["width"], msg["height"])

    def test_non_dense_nan_skipped(self, rng):
        n = 6
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        pts[2] = np.nan
        rec = np.zeros(n, np.dtype(
            [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]))
        rec["x"], rec["y"], rec["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
        back = ros2.pointcloud2_to_xyz(
            rec.tobytes(), [("x", 0, 7, 1), ("y", 4, 7, 1),
                            ("z", 8, 7, 1)], 12, n, 1, False, False)
        assert int(back.size()) == n - 1
