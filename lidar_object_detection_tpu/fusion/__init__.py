from lidar_object_detection_tpu.fusion.associate import (
    FusionParams,
    fuse_frame,
    fuse_batch,
    greedy_iou_match,
    hungarian_match,
)

__all__ = [
    "FusionParams",
    "fuse_frame",
    "fuse_batch",
    "greedy_iou_match",
    "hungarian_match",
]
