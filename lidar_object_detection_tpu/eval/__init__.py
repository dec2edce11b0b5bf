from lidar_object_detection_tpu.eval.statistics import (
    CarStatistics,
    frame_statistics,
    append_to_master_csv,
    analyze_master_csv,
    summarize,
    format_summary_table,
)
from lidar_object_detection_tpu.eval.kitti2d import (
    monocular_distance,
    evaluate_image,
)
from lidar_object_detection_tpu.eval.store import MetricStore
from lidar_object_detection_tpu.eval.erosion_study import (
    run_erosion_study, join_runs, analyze as analyze_erosion_study)
from lidar_object_detection_tpu.eval.xlsx import (
    export_erosion_workbook, read_xlsx, write_xlsx)

__all__ = [
    "CarStatistics",
    "frame_statistics",
    "append_to_master_csv",
    "analyze_master_csv",
    "summarize",
    "format_summary_table",
    "monocular_distance",
    "evaluate_image",
    "MetricStore",
    "run_erosion_study",
    "export_erosion_workbook",
    "read_xlsx",
    "write_xlsx",
    "join_runs",
    "analyze_erosion_study",
]
