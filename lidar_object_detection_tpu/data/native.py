"""ctypes binding for the native C++ scan loader (csrc/lidar_loader.cpp).

Auto-builds the shared library on first use (``make -C csrc``) and falls
back to pure NumPy when no C++ toolchain is available, so the framework
never hard-depends on the native path -- it is a throughput optimization
for keeping the TPU fed (the reference does all IO serially inside its
frame loop, V1_BBox_Pointwise_filtering.py:318-324).
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class CompactionSpec:
    """Host-side FOV/depth point culling, done in the loader threads.

    ~3/4 of a KITTI-360 scan fails the camera-frustum validity test before
    the device-side mask gather (PERFORMANCE.md "The gather wall"); culling
    those points on the host shrinks every per-point device stage ~4x.  The
    cull is CONSERVATIVE: ``margin`` pixels + 1e-3 depth slack widen the
    bounds, and the device still applies the exact
    :func:`~...geom.projection.point_validity` test, so fusion outputs are
    bit-identical to the uncompacted path.
    """

    proj: np.ndarray          # (3, 4) f32: intrinsics @ velo_to_rect[:3, :]
    width: int
    height: int
    depth_min: float
    depth_max: float
    max_out: int              # fixed compacted point capacity
    margin: float = 1.0

    @staticmethod
    def build(velo_to_rect, intrinsics, width, height, depth_min, depth_max,
              max_out, margin: float = 1.0) -> "CompactionSpec":
        proj = (np.asarray(intrinsics, np.float64)
                @ np.asarray(velo_to_rect, np.float64)[:3, :])
        return CompactionSpec(proj=proj.astype(np.float32), width=int(width),
                              height=int(height), depth_min=float(depth_min),
                              depth_max=float(depth_max),
                              max_out=int(max_out), margin=float(margin))

    def cull_mask(self, points: np.ndarray) -> np.ndarray:
        """NumPy reference of the C++ predicate (keep-mask over (N, 4))."""
        xyz = points[:, :3].astype(np.float32)
        p = xyz @ self.proj[:, :3].T + self.proj[:, 3]
        z = p[:, 2]
        keep = (z > self.depth_min - 1e-3) & (z < self.depth_max + 1e-3)
        az = np.maximum(np.abs(z), 1e-6)
        u = p[:, 0] / az
        v = p[:, 1] / az
        lo = -(self.margin + 0.5)
        keep &= (u >= lo) & (u <= self.width - 0.5 + self.margin)
        keep &= (v >= lo) & (v <= self.height - 0.5 + self.margin)
        return keep

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
            lib.lidar_load_scan_compact.restype = ctypes.c_int
            lib.lidar_load_scan_compact.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ctypes.c_float, ctypes.c_float,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            lib.lidar_prefetcher_create_compact.restype = ctypes.c_void_p
            lib.lidar_prefetcher_create_compact.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float), ctypes.c_float,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ctypes.c_float]
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


def load_scan_compacted(path: str, spec: CompactionSpec
                        ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Load one scan with host-side FOV/depth culling.

    Returns (points (max_out, 4) f32 zero-padded, valid (max_out,) bool, n).
    Native when available; the NumPy fallback applies the identical
    predicate (:meth:`CompactionSpec.cull_mask`).
    """
    lib = _get_lib()
    if lib is not None:
        out = np.empty((spec.max_out, 4), np.float32)
        valid = np.empty((spec.max_out,), np.uint8)
        n = ctypes.c_int32(0)
        proj = np.ascontiguousarray(spec.proj, np.float32)
        rc = lib.lidar_load_scan_compact(
            path.encode(),
            proj.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            spec.width, spec.height, spec.depth_min, spec.depth_max,
            spec.margin,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            spec.max_out,
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(n), None)
        if rc == 0:
            return out, valid.astype(bool), int(n.value)
        if rc == -3:
            raise ValueError(
                f"{path}: more than {spec.max_out} points after compaction")
        raise FileNotFoundError(f"{path}: native load failed ({rc})")
    raw = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    kept = raw[spec.cull_mask(raw)]
    n = kept.shape[0]
    if n > spec.max_out:
        raise ValueError(
            f"{path}: more than {spec.max_out} points after compaction")
    out = np.zeros((spec.max_out, 4), np.float32)
    out[:n] = kept
    valid = np.zeros((spec.max_out,), bool)
    valid[:n] = True
    return out, valid, n


class ScanPrefetcher:
    """Threaded read-ahead over a list of scan files.

    Yields (frame_index, points, valid, num_points) in completion order.
    Uses the C++ prefetcher when available; otherwise a Python
    ThreadPoolExecutor fallback with identical semantics.

    With ``compaction`` set, the loader threads also project + FOV/depth
    cull each scan (see :class:`CompactionSpec`) and the yielded arrays are
    (spec.max_out, 4) compacted buffers instead of full padded scans.
    """

    def __init__(self, paths: List[str], max_points: int,
                 num_threads: int = 2, queue_depth: int = 4,
                 compaction: Optional[CompactionSpec] = None):
        self.paths = list(paths)
        self.compaction = compaction
        self.max_points = compaction.max_out if compaction else max_points
        self.num_threads = num_threads
        self.queue_depth = queue_depth

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray, np.ndarray, int]]:
        lib = _get_lib()
        if lib is None:
            yield from self._python_iter()
            return
        c_paths = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        if self.compaction is not None:
            spec = self.compaction
            proj = np.ascontiguousarray(spec.proj, np.float32)
            handle = lib.lidar_prefetcher_create_compact(
                c_paths, len(self.paths), spec.max_out, self.num_threads,
                self.queue_depth,
                proj.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                spec.width, spec.height, spec.depth_min, spec.depth_max,
                spec.margin)
        else:
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

        if self.compaction is not None:
            load = lambda p: load_scan_compacted(p, self.compaction)
        else:
            load = lambda p: load_scan_padded(p, self.max_points)
        with ThreadPoolExecutor(max_workers=self.num_threads) as ex:
            futures = {ex.submit(load, p): i
                       for i, p in enumerate(self.paths)}
            for fut in as_completed(futures):
                pts, valid, n = fut.result()
                yield futures[fut], pts, valid, n
