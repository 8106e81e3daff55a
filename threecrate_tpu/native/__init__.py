"""Native (C++) IO kernels, compiled on demand and loaded via ctypes.

The reference's IO layer is native Rust; the equivalent here is a small
C++ library for the host-side byte crunching NumPy handles poorly
(ASCII float parsing, sensor packet decode). Compiled with g++ at first
use and cached next to the package; everything degrades gracefully to
pure NumPy when no compiler is available (HAS_NATIVE False).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tc_native.cpp")
_SO = os.path.join(_HERE, "libtc_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
HAS_NATIVE = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, HAS_NATIVE
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.tc_parse_floats.restype = ctypes.c_long
        lib.tc_parse_floats.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long]
        lib.tc_count_tokens.restype = ctypes.c_long
        lib.tc_count_tokens.argtypes = [ctypes.c_char_p, ctypes.c_long]
        lib.tc_decode_velodyne.restype = ctypes.c_long
        lib.tc_decode_velodyne.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        lib.tc_lzf_decompress.restype = ctypes.c_long
        lib.tc_lzf_decompress.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
        lib.tc_lzf_compress.restype = ctypes.c_long
        lib.tc_lzf_compress.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
        _lib = lib
        HAS_NATIVE = True
        return lib


def parse_floats(text) -> np.ndarray:
    """Parse all numeric tokens in ``text`` (str or bytes) → float64
    array. Uses the native parser when available, else NumPy."""
    if isinstance(text, str):
        text = text.encode("ascii", errors="replace")
    lib = _load()
    if lib is None:
        return np.array(text.split(), np.float64)
    n_max = lib.tc_count_tokens(text, len(text))
    out = np.empty(n_max, np.float64)
    n = lib.tc_parse_floats(
        text, len(text),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_max)
    if n < n_max:
        # exotic token hit the fallback stop — let numpy handle it all
        return np.array(text.split(), np.float64)
    return out


def decode_velodyne_batch(packets: np.ndarray, dist_resolution: float):
    """(P, 1206) uint8 packets → (distance, azimuth_rad, intensity)
    arrays of length P·12·32 (native) or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    packets = np.ascontiguousarray(packets, np.uint8)
    n_pkts = packets.shape[0]
    n = n_pkts * 12 * 32
    dist = np.empty(n, np.float32)
    az = np.empty(n, np.float32)
    inten = np.empty(n, np.float32)
    lib.tc_decode_velodyne(
        packets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_pkts,
        dist_resolution,
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        az.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        inten.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return dist, az, inten


def lzf_decompress(src: bytes, expected_size: int) -> bytes:
    """LZF block decode (the PCD ``binary_compressed`` payload codec).
    Native when available; pure-Python fallback otherwise."""
    lib = _load()
    if lib is not None:
        sarr = np.frombuffer(src, np.uint8)
        out = np.empty(expected_size, np.uint8)
        n = lib.tc_lzf_decompress(
            sarr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(src),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            expected_size)
        if n < 0:
            raise ValueError("corrupt LZF stream")
        return out[:n].tobytes()
    # fallback: byte-at-a-time python decoder (correct, slow)
    out = bytearray()
    ip, n = 0, len(src)
    while ip < n:
        ctrl = src[ip]
        ip += 1
        if ctrl < 32:
            ln = ctrl + 1
            if ip + ln > n:
                raise ValueError("corrupt LZF stream")
            out += src[ip:ip + ln]
            ip += ln
        else:
            ln = ctrl >> 5
            if ln == 7:
                if ip >= n:
                    raise ValueError("corrupt LZF stream")
                ln += src[ip]
                ip += 1
            ln += 2
            if ip >= n:
                raise ValueError("corrupt LZF stream")
            dist = ((ctrl & 0x1F) << 8 | src[ip]) + 1
            ip += 1
            ref = len(out) - dist
            if ref < 0:
                raise ValueError("corrupt LZF stream")
            for _ in range(ln):
                out.append(out[ref])
                ref += 1
    if len(out) > expected_size:
        raise ValueError("LZF output larger than declared size")
    return bytes(out)


def lzf_compress(data: bytes) -> bytes:
    """LZF block encode. Native greedy hash-chain when available; the
    fallback emits an all-literal stream (valid LZF, no compression)."""
    lib = _load()
    if lib is not None:
        sarr = np.frombuffer(data, np.uint8)
        cap = len(data) + len(data) // 16 + 64
        out = np.empty(cap, np.uint8)
        n = lib.tc_lzf_compress(
            sarr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
        if n > 0:
            return out[:n].tobytes()
    out = bytearray()
    for s in range(0, len(data), 32):
        run = data[s:s + 32]
        out.append(len(run) - 1)
        out += run
    return bytes(out)


# ---------------------------------------------------------------------------
# LASzip codec (separate shared object: tc_laz.cpp)
# ---------------------------------------------------------------------------

_LAZ_SRC = os.path.join(_HERE, "tc_laz.cpp")
_LAZ_SO = os.path.join(_HERE, "libtc_laz.so")
_laz_lib: Optional[ctypes.CDLL] = None


def _load_laz() -> Optional[ctypes.CDLL]:
    global _laz_lib
    with _lock:
        if _laz_lib is not None:
            return _laz_lib
        if not os.path.exists(_LAZ_SO) or \
                os.path.getmtime(_LAZ_SO) < os.path.getmtime(_LAZ_SRC):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", "-o", _LAZ_SO, _LAZ_SRC],
                    check=True, capture_output=True, timeout=240)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LAZ_SO)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.tc_laz_decompress.restype = ctypes.c_long
        lib.tc_laz_decompress.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_uint, ctypes.c_int, u8p, ctypes.c_int]
        lib.tc_laz_compress.restype = ctypes.c_long
        lib.tc_laz_compress.argtypes = [
            u8p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint, ctypes.c_long, u8p, ctypes.c_long]
        _laz_lib = lib
        return lib


def laz_decompress(file_bytes: bytes, point_off: int, n_points: int,
                   chunk_size: int, point_format: int,
                   rec_len: int) -> Optional[np.ndarray]:
    """Decompress a LAZ point block → (n, rec_len) uint8 records, or
    None when the native codec is unavailable. Raises ValueError on a
    corrupt/unsupported stream."""
    lib = _load_laz()
    if lib is None:
        return None
    buf = np.frombuffer(file_bytes, np.uint8)
    out = np.zeros(n_points * rec_len, np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    r = lib.tc_laz_decompress(
        buf.ctypes.data_as(u8p), len(buf), point_off, n_points,
        chunk_size, point_format, out.ctypes.data_as(u8p), rec_len)
    if r != 0:
        raise ValueError(f"LASzip decode failed (code {r})")
    return out.reshape(n_points, rec_len)


def laz_compress(records: np.ndarray, point_format: int,
                 chunk_size: int, block_file_off: int) -> Optional[bytes]:
    """Compress (n, rec_len) uint8 records → LAZ point block bytes
    ([i64 chunk-table pos][chunks][table]), or None when unavailable."""
    lib = _load_laz()
    if lib is None:
        return None
    records = np.ascontiguousarray(records, np.uint8)
    n, rec_len = records.shape
    cap = n * rec_len * 2 + (n // max(chunk_size, 1) + 2) * 64 + 65536
    out = np.zeros(cap, np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    r = lib.tc_laz_compress(
        records.ctypes.data_as(u8p), n, rec_len, point_format,
        chunk_size, block_file_off, out.ctypes.data_as(u8p), cap)
    if r < 0:
        raise ValueError(f"LASzip encode failed (code {r})")
    return out[:r].tobytes()


# try to load eagerly so HAS_NATIVE reflects reality at import time
_load()
