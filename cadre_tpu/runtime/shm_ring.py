"""ctypes bindings + on-demand build for the C++ shared-memory ring.

The native library is compiled once per machine with g++ (no pybind11
needed) and cached next to this file; see ringbuf.cpp for the design.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ringbuf.cpp")
_LIB_PATH = os.path.join(_HERE, "libringbuf.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> str:
    if os.path.exists(_LIB_PATH) and \
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC,
           "-o", _LIB_PATH, "-lrt"]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.rb_create.restype = ctypes.c_void_p
            lib.rb_create.argtypes = [ctypes.c_char_p, ctypes.c_uint32,
                                      ctypes.c_uint64]
            lib.rb_attach.restype = ctypes.c_void_p
            lib.rb_attach.argtypes = [ctypes.c_char_p]
            lib.rb_frame_bytes.restype = ctypes.c_uint64
            lib.rb_frame_bytes.argtypes = [ctypes.c_void_p]
            lib.rb_slots.restype = ctypes.c_uint32
            lib.rb_slots.argtypes = [ctypes.c_void_p]
            lib.rb_available.restype = ctypes.c_uint64
            lib.rb_available.argtypes = [ctypes.c_void_p]
            lib.rb_write.restype = ctypes.c_uint64
            lib.rb_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.c_uint64]
            lib.rb_read.restype = ctypes.c_uint64
            lib.rb_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_uint64]
            lib.rb_read_batch.restype = ctypes.c_uint64
            lib.rb_read_batch.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                          ctypes.c_uint64, ctypes.c_uint64]
            lib.rb_close.argtypes = [ctypes.c_void_p]
            _lib = lib
    return _lib


_TIMEOUT_SENTINEL = 2 ** 64 - 1


class ShmRing:
    """One direction of a worker<->trainer channel."""

    def __init__(self, name: str, n_slots: int = 0, frame_bytes: int = 0,
                 create: bool = False):
        self._lib = _load()
        self.name = name
        if create:
            self._h = self._lib.rb_create(name.encode(), n_slots,
                                          frame_bytes)
        else:
            self._h = self._lib.rb_attach(name.encode())
        if not self._h:
            raise OSError(f"failed to {'create' if create else 'attach'} "
                          f"ring {name!r}")
        self.frame_bytes = int(self._lib.rb_frame_bytes(self._h))
        self.n_slots = int(self._lib.rb_slots(self._h))

    def write(self, data: bytes | np.ndarray) -> int:
        if isinstance(data, np.ndarray):
            data = np.ascontiguousarray(data).tobytes()
        return int(self._lib.rb_write(self._h, data, len(data)))

    def read(self, timeout_ms: int = 1000) -> Optional[bytes]:
        buf = ctypes.create_string_buffer(self.frame_bytes)
        idx = self._lib.rb_read(self._h, buf, timeout_ms)
        if idx == _TIMEOUT_SENTINEL:
            return None
        return buf.raw

    def read_batch(self, max_frames: int, timeout_ms: int = 1000
                   ) -> np.ndarray:
        """Returns [k, frame_bytes] uint8 (k may be 0 on timeout)."""
        buf = ctypes.create_string_buffer(self.frame_bytes * max_frames)
        k = int(self._lib.rb_read_batch(self._h, buf, max_frames,
                                        timeout_ms))
        arr = np.frombuffer(buf.raw[: k * self.frame_bytes], np.uint8)
        return arr.reshape(k, self.frame_bytes)

    @property
    def available(self) -> int:
        return int(self._lib.rb_available(self._h))

    def close(self) -> None:
        if self._h:
            self._lib.rb_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
