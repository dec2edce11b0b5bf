from lidar_object_detection_tpu.pipelines.runner import (
    FusionPipeline,
    RunResult,
    FrameResult,
    v1_pointwise,
    v2_stats,
    v3_erosion,
    v4_iou,
    v5_projected,
    csv_eval,
)
from lidar_object_detection_tpu.pipelines.kitti2d import run_kitti2d_eval
from lidar_object_detection_tpu.pipelines.pointpillars import (
    train_pointpillars, load_training_batch, evaluate_bev)

__all__ = [
    "FusionPipeline", "RunResult", "FrameResult",
    "v1_pointwise", "v2_stats", "v3_erosion", "v4_iou", "v5_projected",
    "csv_eval", "run_kitti2d_eval", "train_pointpillars",
    "load_training_batch", "evaluate_bev",
]
