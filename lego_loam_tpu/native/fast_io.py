"""ctypes bindings for the native host-IO library (native/fast_io.cpp).

Build with `make -C native`.  Every entry point degrades gracefully when the
shared library is absent (pure-NumPy fallbacks in the callers).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(root, "native", "libfast_io.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.kitti_read_bin.restype = ctypes.c_longlong
    lib.kitti_read_bin.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong]
    lib.pad_scan.restype = ctypes.c_longlong
    lib.pad_scan.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_longlong]
    lib.prefetcher_create.restype = ctypes.c_void_p
    lib.prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_longlong, ctypes.c_longlong]
    lib.prefetcher_next.restype = ctypes.c_longlong
    lib.prefetcher_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.prefetcher_destroy.restype = None
    lib.prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


_MAX_PTS = 1 << 18  # 262144 points: far above any HDL-64E scan


def read_kitti_bin(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    buf = np.empty((_MAX_PTS, 4), np.float32)
    n = lib.kitti_read_bin(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _MAX_PTS)
    if n < 0:
        raise IOError(f"failed to read {path}")
    return buf[:n].copy()


def pad_scan_native(pts: np.ndarray, cap: int):
    """(N, 4|3) -> (cap, 3) xyz + (cap,) bool valid, NaN-filtered."""
    lib = _load()
    pts = np.ascontiguousarray(pts, np.float32)
    if lib is None:
        xyz = np.zeros((cap, 3), np.float32)
        valid = np.zeros((cap,), bool)
        n = min(pts.shape[0], cap)
        ok = np.isfinite(pts[:n, :3]).all(axis=1)
        xyz[:n] = np.where(ok[:, None], pts[:n, :3], 0.0)
        valid[:n] = ok
        return xyz, valid
    xyz = np.empty((cap, 3), np.float32)
    valid_u8 = np.empty((cap,), np.uint8)
    lib.pad_scan(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pts.shape[0],
        pts.shape[1], xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), cap)
    return xyz, valid_u8.astype(bool)


class Prefetcher:
    """Background-threaded KITTI sequence loader (native)."""

    def __init__(self, paths: list[str], cap: int = _MAX_PTS):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (make -C native)")
        self._lib = lib
        self._cap = cap
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._h = lib.prefetcher_create(arr, len(paths), cap)
        self._buf = np.empty((cap, 4), np.float32)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        n = self._lib.prefetcher_next(
            self._h, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if n == -2:
            raise StopIteration
        if n < 0:
            raise IOError("prefetcher read error")
        return self._buf[:n].copy()

    def close(self):
        if self._h:
            self._lib.prefetcher_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
