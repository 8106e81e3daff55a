"""E57 point-cloud format (ASTM E2807).

The reference gates E57 behind a cargo feature and delegates to the
external ``e57`` crate (threecrate-io/src/e57.rs:23-91, RobustE57Reader/
Writer with multi-scan merge). E57's CompressedVector sections use
bit-packed per-field codecs behind CRC-paged binary streams — a full
decoder is planned; until it lands this module raises a clear error
with conversion guidance (mirroring the reference built without the
feature flag).
"""

from __future__ import annotations

from ..core.errors import UnsupportedError


def read_point_cloud(path, **_):
    raise UnsupportedError(
        "E57 decoding is not implemented yet (bit-packed CompressedVector "
        "streams); convert with 'pdal translate in.e57 out.ply' or "
        "CloudCompare and load the result")


def write_point_cloud(path, cloud, **_):
    raise UnsupportedError(
        "E57 writing is not implemented yet; write .ply/.las instead")
