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


def _spec(dataset, max_out=32768):
    return native.CompactionSpec.build(
        dataset.transforms.velo_to_rect, dataset.camera.intrinsics,
        dataset.camera.width, dataset.camera.height, 0.0, 50.0, max_out)


def test_compacted_load_native_vs_numpy(dataset, frame100, monkeypatch):
    spec = _spec(dataset)
    path = dataset.scan_path(100)
    ref_keep = frame100.points[spec.cull_mask(frame100.points)]
    assert 0 < len(ref_keep) < frame100.num_points // 2

    if native.native_available():
        pts, valid, n = native.load_scan_compacted(path, spec)
        assert n == len(ref_keep)
        np.testing.assert_array_equal(pts[:n], ref_keep)
        assert valid[:n].all() and not valid[n:].any()
        assert (pts[n:] == 0).all()

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_failed", True)
    pts2, valid2, n2 = native.load_scan_compacted(path, spec)
    assert n2 == len(ref_keep)
    np.testing.assert_array_equal(pts2[:n2], ref_keep)


def test_compacted_prefetcher(dataset):
    spec = _spec(dataset)
    paths = [dataset.scan_path(f) for f in dataset.frame_ids()[:4]]
    got = {}
    for idx, pts, valid, n in native.ScanPrefetcher(
            paths, 0, num_threads=2, compaction=spec):
        got[idx] = (pts, valid, n)
    assert set(got) == set(range(4))
    for i, p in enumerate(paths):
        ref, _, nref = native.load_scan_compacted(p, spec)
        assert got[i][2] == nref
        np.testing.assert_array_equal(got[i][0], ref)
        assert got[i][0].shape == (spec.max_out, 4)


def test_compacted_overflow_raises(dataset):
    spec = _spec(dataset, max_out=64)
    with pytest.raises(ValueError):
        native.load_scan_compacted(dataset.scan_path(100), spec)


def test_cull_is_conservative(dataset, frame100):
    """No device-valid point may be culled: the exact validity test run in
    f32 over the raw scan must be a subset of the host keep-mask."""
    import jax.numpy as jnp

    from lidar_object_detection_tpu.geom import projection as proj

    spec = _spec(dataset)
    pts = jnp.asarray(frame100.points, jnp.float32)
    u, v, d = proj.project_velo_points(
        pts, jnp.asarray(dataset.transforms.velo_to_rect, jnp.float32),
        jnp.asarray(dataset.camera.intrinsics, jnp.float32))
    exact = np.asarray(proj.point_validity(
        u, v, d, dataset.camera.width, dataset.camera.height, 0.0, 50.0))
    keep = spec.cull_mask(frame100.points)
    assert not (exact & ~keep).any()


def test_python_fallback_parity(dataset, frame100, monkeypatch):
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_failed", True)
    pts, valid, n = native.load_scan_padded(dataset.scan_path(100), 131072)
    assert n == frame100.num_points
    np.testing.assert_array_equal(pts[:n], frame100.points)
    pre = native.ScanPrefetcher([dataset.scan_path(100)], 131072)
    items = list(pre)
    assert len(items) == 1 and items[0][0] == 0


def test_compaction_simd_scalar_agree(dataset):
    """The AVX-512 compaction must keep exactly the scalar path's points.

    The dispatch is latched per process, so the scalar run happens in a
    subprocess with LIDAR_LOADER_NO_AVX512=1.  On hosts without AVX-512
    both runs take the scalar path and the test degenerates to a no-op
    sanity check (still worth running: it covers the env-var override).
    """
    if not native.native_available():
        pytest.skip("no native lib")
    import subprocess
    import sys

    path = dataset.scan_path(100)
    spec = _spec(dataset)
    pts, valid, n = native.load_scan_compacted(path, spec)

    code = (
        "import numpy as np\n"
        "from lidar_object_detection_tpu.data import native\n"
        "from lidar_object_detection_tpu.data import Kitti360Dataset\n"
        f"ds = Kitti360Dataset({dataset.root!a})\n"
        "spec = native.CompactionSpec.build(\n"
        "    ds.transforms.velo_to_rect, ds.camera.intrinsics,\n"
        "    ds.camera.width, ds.camera.height, 0.0, 50.0, 32768)\n"
        f"pts, valid, n = native.load_scan_compacted({path!a}, spec)\n"
        "print(n, float(np.abs(pts[:n]).sum()))\n")
    env = dict(os.environ, LIDAR_LOADER_NO_AVX512="1",
               PYTHONPATH="/root/repo")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=300)
    assert out.returncode == 0, out.stderr
    n_scalar, checksum = out.stdout.split()
    # the SIMD predicate uses FMA + reciprocal-multiply where scalar uses
    # separate mul/add + divide (<= 1-ulp deviation by design, absorbed by
    # the conservative margin): allow a couple of boundary points to
    # differ rather than demand bit-equality between the two host paths
    assert abs(int(n_scalar) - n) <= 2
    assert float(checksum) == pytest.approx(float(np.abs(pts[:n]).sum()),
                                            rel=1e-3)
