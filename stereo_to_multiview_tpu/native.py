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
            src = os.path.join(_NATIVE_DIR, "stm_native.cpp")
            stale = (not os.path.exists(_SO)
                     or os.path.getmtime(_SO) < os.path.getmtime(src))
            if stale:
                subprocess.run(["make", "-C", _NATIVE_DIR, "-sB"],
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
        lib.stm_y4m_open.restype = ctypes.c_void_p
        lib.stm_y4m_open.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.stm_y4m_next.restype = ctypes.c_int
        lib.stm_y4m_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.stm_y4m_rewind.argtypes = [ctypes.c_void_p]
        lib.stm_y4m_close.argtypes = [ctypes.c_void_p]
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
        # output buffer geometry from the first frame's BMP header
        # (pair mode stitches L|R side by side)
        h, w = read_bmp(paths[0]).shape[:2]
        self._shape: Tuple[int, int] = (h, 2 * w if pair_mode else w)

    def __iter__(self):
        h = ctypes.c_int32()
        w = ctypes.c_int32()
        while True:
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

    def close(self):
        if self._q:
            self._lib.stm_queue_destroy(self._q)
            self._q = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeY4M:
    """Native Y4M video reader (stm_y4m_*): sequential BGR uint8 frames
    with rewind support.  Bit-identical output to utils.y4m.Y4MReader."""

    def __init__(self, path: str):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        w = ctypes.c_int32()
        h = ctypes.c_int32()
        self._r = lib.stm_y4m_open(path.encode(), ctypes.byref(w),
                                   ctypes.byref(h))
        if not self._r:
            raise IOError(f"stm_y4m_open({path}) failed")
        self.w, self.h = w.value, h.value

    def read_frame(self) -> Optional[np.ndarray]:
        out = np.empty((self.h, self.w, 3), np.uint8)
        rc = self._lib.stm_y4m_next(self._r,
                                    out.ctypes.data_as(ctypes.c_void_p))
        if rc == 1:
            return None
        if rc != 0:
            raise IOError(f"stm_y4m_next failed: {rc}")
        return out

    def rewind(self) -> None:
        self._lib.stm_y4m_rewind(self._r)

    def __iter__(self):
        while True:
            fr = self.read_frame()
            if fr is None:
                return
            yield fr

    def close(self):
        if self._r:
            self._lib.stm_y4m_close(self._r)
            self._r = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
