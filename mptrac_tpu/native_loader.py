"""ctypes binding for the native met loader (native/metloader.cc).

Provides asynchronous decode-ahead of binary met files: while the
device integrates the current met interval, the next file is read and
unpacked by the C++ background thread (reference analog: the
page-cache-only prefetch in mptrac_get_met, c:6222).  Falls back to
the pure-Python reader when the shared library is not built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from mptrac_tpu.met.bin_io import BIN_2D, BIN_3D

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libmetloader.so")

_lib = None


def _build_library() -> bool:
    src_dir = os.path.dirname(_LIB_PATH)
    try:
        subprocess.run(["make", "-C", src_dir], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_library() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build_library():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.metloader_create.restype = ctypes.c_void_p
    lib.metloader_destroy.argtypes = [ctypes.c_void_p]
    lib.metloader_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.c_int]
    lib.metloader_wait_dims.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.metloader_copy.argtypes = [ctypes.c_void_p] + \
        [np.ctypeslib.ndpointer(np.float64)] * 3 + \
        [np.ctypeslib.ndpointer(np.float32)] * 2
    _lib = lib
    return lib


class AsyncMetLoader:
    """Decode-ahead reader for MPTRAC binary met containers."""

    def __init__(self):
        self._lib = get_library()
        if self._lib is None:
            raise RuntimeError("native metloader not available")
        self._h = self._lib.metloader_create()

    def close(self):
        if self._h:
            self._lib.metloader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def prefetch(self, path: str, met_type: int = 1):
        """Begin decoding ``path`` in the background."""
        self._lib.metloader_prefetch(self._h, path.encode(), met_type)

    def wait(self):
        """Block for the decode and return the raw met dict
        (mptrac_tpu.met.build consumes it like the Python reader's)."""
        time = ctypes.c_double()
        nx = ctypes.c_int()
        ny = ctypes.c_int()
        np_ = ctypes.c_int()
        ok = self._lib.metloader_wait_dims(
            self._h, ctypes.byref(time), ctypes.byref(nx),
            ctypes.byref(ny), ctypes.byref(np_))
        if not ok:
            raise IOError("native met decode failed")
        lon = np.empty(nx.value, np.float64)
        lat = np.empty(ny.value, np.float64)
        p = np.empty(np_.value, np.float64)
        f2flat = np.empty(len(BIN_2D) * nx.value * ny.value, np.float32)
        f3flat = np.empty(len(BIN_3D) * nx.value * ny.value * np_.value,
                          np.float32)
        if not self._lib.metloader_copy(self._h, lon, lat, p, f2flat,
                                        f3flat):
            raise IOError("native met copy failed")
        nxy = nx.value * ny.value
        f2 = {name: f2flat[i * nxy:(i + 1) * nxy].reshape(
            nx.value, ny.value) for i, name in enumerate(BIN_2D)}
        n3 = nxy * np_.value
        f3 = {name: f3flat[i * n3:(i + 1) * n3].reshape(
            nx.value, ny.value, np_.value)
            for i, (name, _, _) in enumerate(BIN_3D)}
        from mptrac_tpu.types import MET_2D_FIELDS, MET_3D_FIELDS
        for name in MET_2D_FIELDS:
            f2.setdefault(name, np.full((nx.value, ny.value), np.nan,
                                        np.float32))
        for name in MET_3D_FIELDS:
            f3.setdefault(name, np.zeros(
                (nx.value, ny.value, np_.value), np.float32))
        return dict(time=time.value, lon=lon, lat=lat, p=p,
                    hybrid=np.zeros(np_.value), fields2d=f2,
                    fields3d=f3, npl_ml=0)
