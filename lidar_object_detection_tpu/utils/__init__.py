from lidar_object_detection_tpu.utils.cache import enable_compilation_cache
from lidar_object_detection_tpu.utils.profiling import (
    StageTimer, ThroughputMeter, device_barrier, trace)
from lidar_object_detection_tpu.utils.debug import (
    jit_eager_parity, assert_finite, checkify_nan_guard)

__all__ = ["enable_compilation_cache", "StageTimer", "ThroughputMeter",
           "device_barrier", "trace", "jit_eager_parity", "assert_finite",
           "checkify_nan_guard"]
