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


# try to load eagerly so HAS_NATIVE reflects reality at import time
_load()
