"""ctypes binding for the native rasterizer (graceful numpy fallback)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "raster.cpp")
_LIB_PATH = os.path.join(_HERE, "libraster.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_unavailable = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _unavailable
    if _lib is not None or _unavailable:
        return _lib
    with _lock:
        if _lib is not None or _unavailable:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH) or \
                    os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC,
                     "-o", _LIB_PATH],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.raster_polyline.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
                ctypes.POINTER(ctypes.c_uint8)]
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _unavailable = True
    return _lib


def rasterize_polyline_native(points_px: np.ndarray, height: int,
                              width: int, line_width: float
                              ) -> Optional[np.ndarray]:
    """Returns the raster, or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points_px, np.float64)
    out = np.zeros(height * width, np.uint8)
    lib.raster_polyline(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(pts), height, width, float(line_width),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.reshape(height, width)
