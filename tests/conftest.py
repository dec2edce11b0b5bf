"""Test configuration.

Tests run on CPU with 8 virtual devices (so multi-chip sharding tests work
without a pod) and with x64 enabled so geometry oracles compare bit-for-bit
against the float64 NumPy reference semantics.
"""

import os

# The image's sitecustomize registers the axon TPU backend before conftest
# runs, so plain env vars are too late; jax.config wins over both.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the suite's wall-clock is dominated by XLA
# compiles of the big pipeline jits; caching them on disk makes repeat
# runs ~2x faster.  Opt out with LIDAR_TPU_TEST_COMPILE_CACHE=0 (e.g. to
# time cold compiles).  Cache entries key on platform/flags/jax version,
# so sharing the directory with TPU runs is safe.
if os.environ.get("LIDAR_TPU_TEST_COMPILE_CACHE", "1") == "1":
    import logging

    _cache_dir = os.environ.get(
        "LIDAR_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "lidar_tpu_xla"))
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # the deserialized-executable path logs a noisy warning per hit
        logging.getLogger("jax._src.compilation_cache").setLevel(
            logging.ERROR)
        logging.getLogger("jax._src.compiler").setLevel(logging.ERROR)
    except Exception:
        pass  # the cache is an optimization; never fail the suite for it

import numpy as np  # noqa: E402
import pytest  # noqa: E402

KITTI_ROOT = os.environ.get("LIDAR_TPU_KITTI360",
                            "/root/reference/KITTI360_sample")


@pytest.fixture(scope="session")
def kitti_root():
    if not os.path.isdir(KITTI_ROOT):
        pytest.skip(f"KITTI-360 sample not found at {KITTI_ROOT}")
    return KITTI_ROOT


@pytest.fixture(scope="session")
def dataset(kitti_root):
    from lidar_object_detection_tpu.data import Kitti360Dataset

    return Kitti360Dataset(kitti_root)


@pytest.fixture(scope="session")
def frame100(dataset):
    rec = dataset.load_frame(100)
    assert rec is not None
    return rec


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
