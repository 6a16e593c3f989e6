"""ctypes bindings + build for the native image loader (cap4d_runtime.cpp).

Replaces the reference's decord (C++) frame loading and the python-side
crop/resize host work with one fused native pass per frame, executed on a
worker pool off the GIL. Falls back transparently to the cv2 path when the
shared library cannot be built.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "cap4d_runtime.cpp"
_SO = _HERE / "libcap4d_runtime.so"

_lib = None
_build_failed = False


def build(force: bool = False) -> Optional[Path]:
    """Compile the runtime .so (g++ -O3; libpng + libjpeg + pthread)."""
    if _SO.exists() and not force and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
           str(_SRC), "-o", str(_SO), "-lpng", "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except (FileNotFoundError, subprocess.CalledProcessError) as e:
        print(f"WARNING: native loader build failed ({e}); using cv2 fallback")
        return None


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    so = build()
    if so is None:
        _build_failed = True
        return None
    lib = ctypes.CDLL(str(so))
    lib.c4d_load_frame.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.c4d_load_frame.restype = ctypes.c_int
    lib.c4d_decode_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.c4d_decode_image.restype = ctypes.c_int
    lib.c4d_pool_create.argtypes = [ctypes.c_int]
    lib.c4d_pool_create.restype = ctypes.c_void_p
    lib.c4d_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.c4d_pool_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.c4d_pool_submit.restype = ctypes.c_int
    lib.c4d_pool_wait.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.c4d_pool_wait.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_frame_native(path: str | Path, crop_box, target_res: int,
                      bg_value: int = 255) -> Optional[np.ndarray]:
    """Fused decode → pad-crop → resize → [-1,1] float (H, W, 3); None on failure."""
    lib = _get_lib()
    if lib is None:
        return None
    out = np.empty((target_res, target_res, 3), np.float32)
    box = None
    if crop_box is not None:
        box_arr = (ctypes.c_int * 4)(*[int(v) for v in crop_box])
        box = box_arr
    status = lib.c4d_load_frame(
        str(path).encode(), box, target_res, bg_value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if status == 0 else None


class NativePrefetcher:
    """Submit many frames, collect in order; decoding overlaps downstream work."""

    def __init__(self, n_threads: int = 8):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._pool = lib.c4d_pool_create(n_threads)
        self._next_ticket = 0

    def submit(self, path: str | Path, crop_box, target_res: int,
               bg_value: int = 255) -> int:
        ticket = self._next_ticket
        self._next_ticket += 1
        box = None
        if crop_box is not None:
            box = (ctypes.c_int * 4)(*[int(v) for v in crop_box])
        self._lib.c4d_pool_submit(self._pool, str(path).encode(), box,
                                  target_res, bg_value, ticket)
        # keep the box array alive until the worker copies it — submit copies
        # synchronously into the job, so no retention is needed
        return ticket

    def wait(self, ticket: int, target_res: int) -> np.ndarray:
        out = np.empty((target_res, target_res, 3), np.float32)
        status = self._lib.c4d_pool_wait(
            self._pool, ticket, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            target_res)
        if status != 0:
            raise IOError(f"native decode failed for ticket {ticket}")
        return out

    def close(self):
        if self._pool:
            self._lib.c4d_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
