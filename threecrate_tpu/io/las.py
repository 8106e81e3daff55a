"""LAS LiDAR file reader/writer (formats 1.2-1.4, point formats 0-3,6,7).

Covers the reference's ``las_laz`` feature (threecrate-io Cargo feature;
backed by the ``las`` crate there). Uncompressed LAS decodes as one
structured ``np.frombuffer`` with the header's scale/offset applied;
LAZ (compressed) needs laszip and raises UnsupportedError with a
conversion hint, like the reference's feature-gated path when built
without the flag.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from ..core.errors import InvalidDataError, UnsupportedError
from ..core.point_cloud import PointCloud

_POINT_FORMATS = {
    0: 20, 1: 28, 2: 26, 3: 34, 6: 30, 7: 36,
}
_RGB_OFFSET = {2: 20, 3: 28, 7: 30}   # byte offset of the RGB triple
_INTENSITY_OFFSET = 12


def read_point_cloud(path, **_) -> PointCloud:
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"LASF":
        raise InvalidDataError("not a LAS file (missing LASF magic)")
    ver_major, ver_minor = data[24], data[25]
    header_size = struct.unpack_from("<H", data, 94)[0]
    offset_to_points = struct.unpack_from("<I", data, 96)[0]
    fmt = data[104]
    if fmt & 0x80:
        raise UnsupportedError(
            "LAZ (compressed LAS) requires laszip; convert with "
            "'laszip -i in.laz -o out.las' or pdal translate")
    rec_len = struct.unpack_from("<H", data, 105)[0]
    n_legacy = struct.unpack_from("<I", data, 107)[0]
    sx, sy, sz, ox, oy, oz = struct.unpack_from("<6d", data, 131)
    n = n_legacy
    if ver_minor >= 4 and header_size >= 247:
        n64 = struct.unpack_from("<Q", data, 247)[0]
        if n64:
            n = n64
    if fmt not in _POINT_FORMATS:
        raise UnsupportedError(f"LAS point format {fmt} not supported "
                               f"(have {sorted(_POINT_FORMATS)})")
    if rec_len < _POINT_FORMATS[fmt]:
        raise InvalidDataError(
            f"LAS record length {rec_len} < format {fmt} minimum")

    raw = np.frombuffer(data, np.uint8, n * rec_len, offset_to_points
                        ).reshape(n, rec_len)
    xyz_i = raw[:, :12].copy().view("<i4")
    pts = np.stack([
        xyz_i[:, 0] * sx + ox,
        xyz_i[:, 1] * sy + oy,
        xyz_i[:, 2] * sz + oz], -1).astype(np.float32)
    attrs = {}
    inten = raw[:, _INTENSITY_OFFSET:_INTENSITY_OFFSET + 2].copy(
        ).view("<u2").ravel()
    if inten.any():
        attrs["intensity"] = inten.astype(np.float32) / 65535.0
    if fmt in _RGB_OFFSET:
        o = _RGB_OFFSET[fmt]
        rgb = raw[:, o:o + 6].copy().view("<u2").reshape(n, 3)
        attrs["colors"] = rgb.astype(np.float32) / 65535.0
    return PointCloud.from_numpy(pts, **attrs)


def write_point_cloud(path, cloud: PointCloud, scale: float = 1e-3,
                      **_) -> None:
    """Write LAS 1.2, point format 2 (xyz + intensity + rgb)."""
    pts = cloud.to_numpy().astype(np.float64)
    n = len(pts)
    offset = pts.min(0) if n else np.zeros(3)
    fmt, rec_len = 2, 26
    header_size = 227
    hdr = bytearray(header_size)
    hdr[0:4] = b"LASF"
    hdr[24] = 1
    hdr[25] = 2
    struct.pack_into("<H", hdr, 94, header_size)
    struct.pack_into("<I", hdr, 96, header_size)       # points follow header
    struct.pack_into("<I", hdr, 100, 0)                # no VLRs
    hdr[104] = fmt
    struct.pack_into("<H", hdr, 105, rec_len)
    struct.pack_into("<I", hdr, 107, n)
    struct.pack_into("<6d", hdr, 131, scale, scale, scale, *offset)
    mx = pts.max(0) if n else np.zeros(3)
    mn = pts.min(0) if n else np.zeros(3)
    struct.pack_into("<6d", hdr, 179, mx[0], mn[0], mx[1], mn[1],
                     mx[2], mn[2])

    rec = np.zeros(n, np.dtype([
        ("x", "<i4"), ("y", "<i4"), ("z", "<i4"),
        ("intensity", "<u2"), ("flags", "u1"), ("class", "u1"),
        ("scan_angle", "i1"), ("user", "u1"), ("src", "<u2"),
        ("r", "<u2"), ("g", "<u2"), ("b", "<u2")]))
    q = np.round((pts - offset) / scale).astype(np.int64)
    rec["x"], rec["y"], rec["z"] = q[:, 0], q[:, 1], q[:, 2]
    if "intensity" in cloud.attrs:
        rec["intensity"] = np.clip(
            cloud.attr_to_numpy("intensity") * 65535, 0, 65535
        ).astype(np.uint16)
    if "colors" in cloud.attrs:
        c = np.clip(cloud.attr_to_numpy("colors") * 65535, 0, 65535
                    ).astype(np.uint16)
        rec["r"], rec["g"], rec["b"] = c[:, 0], c[:, 1], c[:, 2]
    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(rec.tobytes())
