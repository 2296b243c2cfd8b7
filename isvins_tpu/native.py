"""ctypes bindings for the native host runtime (native/isvins_native.cpp):
fast EuRoC CSV ingestion and the IMU/image measurement aligner — the C++
equivalent of the reference's driver + queue layer (run_euroc.cpp readers,
System.cpp getMeasurements + mid-frame interpolation).

The library is built on demand with g++ (`make -C native`); every entry point
has a pure-Python fallback so the engine runs without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_ROOT, "native", "libisvins_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load(build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and build:
        try:
            subprocess.run(
                ["make", "-C", os.path.join(_ROOT, "native")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.parse_csv_ns.restype = ctypes.c_long
    lib.parse_csv_ns.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.aligner_create.restype = ctypes.c_void_p
    lib.aligner_destroy.argtypes = [ctypes.c_void_p]
    lib.aligner_push_imu.argtypes = [
        ctypes.c_void_p, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.aligner_ready.restype = ctypes.c_int
    lib.aligner_ready.argtypes = [ctypes.c_void_p, ctypes.c_double]
    lib.aligner_collect.restype = ctypes.c_long
    lib.aligner_collect.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_csv_ns(path: str, cols: int, max_rows: int = 2_000_000):
    """Parse a ts_ns-first CSV natively. Returns (ts_seconds (n,), data (n,cols))
    or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    ts = np.empty(max_rows)
    data = np.empty((max_rows, cols))
    n = lib.parse_csv_ns(
        path.encode(), cols, max_rows,
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if n < 0:
        raise FileNotFoundError(path)
    return ts[:n].copy(), data[:n].copy()


class NativeAligner:
    """IMU/image measurement aligner (System.cpp:160–202, 279–296 semantics),
    backed by the C++ ring buffer."""

    def __init__(self):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.aligner_create()

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.aligner_destroy(self._h)
            self._h = None

    def push_imu(self, t: float, acc, gyr):
        acc = np.ascontiguousarray(acc, dtype=np.float64)
        gyr = np.ascontiguousarray(gyr, dtype=np.float64)
        self._lib.aligner_push_imu(
            self._h, t,
            acc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            gyr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )

    def ready(self, t_img: float) -> bool:
        return bool(self._lib.aligner_ready(self._h, t_img))

    def collect(self, t_img: float, max_rows: int = 4096):
        """Returns (dts (n,), accs (n,3), gyrs (n,3)) or None if not ready."""
        out = np.empty((max_rows, 7))
        n = self._lib.aligner_collect(
            self._h, t_img, max_rows,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if n < 0:
            return None
        return out[:n, 0].copy(), out[:n, 1:4].copy(), out[:n, 4:7].copy()
