"""ctypes binding for the native host runtime (native/stm_native.cpp).

Builds libstm_native.so on first use (make -C native) and degrades
gracefully to the pure-Python implementations when no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_SO = os.path.join(_NATIVE_DIR, "libstm_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO):
                subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                               check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
        except Exception:
            return None
        lib.stm_wall_time.restype = ctypes.c_double
        lib.stm_cpu_time.restype = ctypes.c_double
        lib.stm_bmp_read.restype = ctypes.c_int
        lib.stm_bmp_read.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.stm_bmp_write.restype = ctypes.c_int
        lib.stm_bmp_write.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
        lib.stm_queue_create.restype = ctypes.c_void_p
        lib.stm_queue_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.stm_queue_next.restype = ctypes.c_int
        lib.stm_queue_next.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.stm_queue_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def read_bmp(path: str) -> np.ndarray:
    """Native BMP read -> (H, W, 3) uint8 BGR."""
    lib = load()
    if lib is None:
        from stereo_to_multiview_tpu.utils.bmp import read_bmp as py_read
        return py_read(path)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = lib.stm_bmp_read(path.encode(), None, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"stm_bmp_read({path}) header failed: {rc}")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.stm_bmp_read(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                          ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"stm_bmp_read({path}) failed: {rc}")
    return out


def write_bmp(path: str, img: np.ndarray) -> None:
    lib = load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if lib is None:
        from stereo_to_multiview_tpu.utils.bmp import write_bmp as py_write
        py_write(path, img)
        return
    h, w = img.shape[:2]
    rc = lib.stm_bmp_write(path.encode(),
                           img.ctypes.data_as(ctypes.c_void_p), h, w)
    if rc != 0:
        raise IOError(f"stm_bmp_write({path}) failed: {rc}")


class NativeFrameQueue:
    """Multi-threaded decode-ahead frame queue (SBS frames or stitched L/R
    pairs).  Iterates (H, W_sbs, 3) uint8 frames in order."""

    def __init__(self, paths: List[str], pair_mode: bool = False,
                 depth: int = 4, loops: int = 1, threads: int = 2):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._q = lib.stm_queue_create(arr, len(paths), int(pair_mode),
                                       depth, loops, threads)
        if not self._q:
            raise RuntimeError("stm_queue_create failed")
        self._shape: Optional[Tuple[int, int]] = None

    def __iter__(self):
        h = ctypes.c_int32()
        w = ctypes.c_int32()
        while True:
            if self._shape is None:
                # first frame: two-phase (peek size via a big scratch is
                # avoided -- decode into max buffer once we know dims from
                # the first stm_queue_next call pattern).  We simply allocate
                # after a size-only probe is not possible here, so allocate
                # lazily using header read of the first path.
                raise RuntimeError("call prime() before iterating")
            out = np.empty((self._shape[0], self._shape[1], 3), np.uint8)
            rc = self._lib.stm_queue_next(
                self._q, out.ctypes.data_as(ctypes.c_void_p),
                ctypes.byref(h), ctypes.byref(w))
            if rc == 1:
                return
            if rc == -1:
                continue  # skip undecodable/mismatched frame
            if rc != 0:
                raise IOError(f"stm_queue_next failed: {rc}")
            yield out[: h.value, : w.value]

    def prime(self, h: int, w_sbs: int) -> "NativeFrameQueue":
        self._shape = (h, w_sbs)
        return self

    def close(self):
        if self._q:
            self._lib.stm_queue_destroy(self._q)
            self._q = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
