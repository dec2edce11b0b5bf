"""Native C++ loader parity with the NumPy path."""

import os

import numpy as np
import pytest

from lidar_object_detection_tpu.data import native


def test_native_builds_and_loads(dataset, frame100):
    if not native.native_available():
        pytest.skip("no C++ toolchain / build failed")
    path = dataset.scan_path(100)
    pts, valid, n = native.load_scan_padded(path, 131072)
    assert n == frame100.num_points
    np.testing.assert_array_equal(pts[:n], frame100.points)
    assert valid[:n].all() and not valid[n:].any()
    assert (pts[n:] == 0).all()


def test_native_missing_file_and_overflow(dataset):
    if not native.native_available():
        pytest.skip("no native lib")
    with pytest.raises(FileNotFoundError):
        native.load_scan_padded("/nonexistent/file.bin", 1024)
    with pytest.raises(ValueError):
        native.load_scan_padded(dataset.scan_path(100), 1000)


def test_prefetcher_yields_all_frames(dataset):
    paths = [dataset.scan_path(f) for f in dataset.frame_ids()[:6]]
    pre = native.ScanPrefetcher(paths, 131072, num_threads=3)
    got = {}
    for idx, pts, valid, n in pre:
        got[idx] = (n, pts[:2].copy())
    assert set(got) == set(range(6))
    for i, p in enumerate(paths):
        direct = np.fromfile(p, dtype=np.float32).reshape(-1, 4)
        assert got[i][0] == len(direct)
        np.testing.assert_array_equal(got[i][1], direct[:2])


def test_python_fallback_parity(dataset, frame100, monkeypatch):
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_failed", True)
    pts, valid, n = native.load_scan_padded(dataset.scan_path(100), 131072)
    assert n == frame100.num_points
    np.testing.assert_array_equal(pts[:n], frame100.points)
    pre = native.ScanPrefetcher([dataset.scan_path(100)], 131072)
    items = list(pre)
    assert len(items) == 1 and items[0][0] == 0
