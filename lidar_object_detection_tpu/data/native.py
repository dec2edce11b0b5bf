"""ctypes binding for the native C++ scan loader (csrc/lidar_loader.cpp).

Auto-builds the shared library on first use (``make -C csrc``) and falls
back to pure NumPy when no C++ toolchain is available, so the framework
never hard-depends on the native path -- it is a throughput optimization
for keeping the TPU fed (the reference does all IO serially inside its
frame loop, V1_BBox_Pointwise_filtering.py:318-324).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "liblidar_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.isfile(_LIB_PATH):
                subprocess.run(["make", "-C", _CSRC], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.lidar_load_scan.restype = ctypes.c_int
            lib.lidar_load_scan.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32)]
            lib.lidar_prefetcher_create.restype = ctypes.c_void_p
            lib.lidar_prefetcher_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
            lib.lidar_prefetcher_next.restype = ctypes.c_int
            lib.lidar_prefetcher_next.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            lib.lidar_prefetcher_destroy.restype = None
            lib.lidar_prefetcher_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_scan_padded(path: str, max_points: int
                     ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Load + pad one scan: returns (points (P, 4) f32, valid (P,) bool, n).

    Uses the native loader when available, NumPy otherwise; both paths are
    bit-identical.
    """
    lib = _get_lib()
    if lib is not None:
        out = np.empty((max_points, 4), np.float32)
        valid = np.empty((max_points,), np.uint8)
        n = ctypes.c_int32(0)
        rc = lib.lidar_load_scan(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_points, valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(n))
        if rc == 0:
            return out, valid.astype(bool), int(n.value)
        if rc == -3:
            raise ValueError(f"{path}: more than {max_points} points")
        raise FileNotFoundError(f"{path}: native load failed ({rc})")
    raw = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    n = raw.shape[0]
    if n > max_points:
        raise ValueError(f"{path}: more than {max_points} points")
    out = np.zeros((max_points, 4), np.float32)
    out[:n] = raw
    valid = np.zeros((max_points,), bool)
    valid[:n] = True
    return out, valid, n


class ScanPrefetcher:
    """Threaded read-ahead over a list of scan files.

    Yields (frame_index, points, valid, num_points) in completion order.
    Uses the C++ prefetcher when available; otherwise a Python
    ThreadPoolExecutor fallback with identical semantics.
    """

    def __init__(self, paths: List[str], max_points: int,
                 num_threads: int = 2, queue_depth: int = 4):
        self.paths = list(paths)
        self.max_points = max_points
        self.num_threads = num_threads
        self.queue_depth = queue_depth

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray, np.ndarray, int]]:
        lib = _get_lib()
        if lib is None:
            yield from self._python_iter()
            return
        c_paths = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        handle = lib.lidar_prefetcher_create(
            c_paths, len(self.paths), self.max_points, self.num_threads,
            self.queue_depth)
        try:
            while True:
                out = np.empty((self.max_points, 4), np.float32)
                valid = np.empty((self.max_points,), np.uint8)
                n = ctypes.c_int32(0)
                idx = ctypes.c_int32(0)
                rc = lib.lidar_prefetcher_next(
                    handle,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    ctypes.byref(n), ctypes.byref(idx))
                if rc == 1:
                    break
                if rc != 0:
                    raise IOError(
                        f"{self.paths[idx.value]}: native load failed ({rc})")
                yield int(idx.value), out, valid.astype(bool), int(n.value)
        finally:
            lib.lidar_prefetcher_destroy(handle)

    def _python_iter(self):
        from concurrent.futures import ThreadPoolExecutor, as_completed

        with ThreadPoolExecutor(max_workers=self.num_threads) as ex:
            futures = {
                ex.submit(load_scan_padded, p, self.max_points): i
                for i, p in enumerate(self.paths)}
            for fut in as_completed(futures):
                pts, valid, n = fut.result()
                yield futures[fut], pts, valid, n
