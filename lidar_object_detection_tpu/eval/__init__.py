from lidar_object_detection_tpu.eval.statistics import (
    CarStatistics,
    frame_statistics,
    append_to_master_csv,
    analyze_master_csv,
    summarize,
)
from lidar_object_detection_tpu.eval.kitti2d import (
    monocular_distance,
    evaluate_image,
)

__all__ = [
    "CarStatistics",
    "frame_statistics",
    "append_to_master_csv",
    "analyze_master_csv",
    "summarize",
    "monocular_distance",
    "evaluate_image",
]
