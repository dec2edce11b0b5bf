from lidar_object_detection_tpu.fusion.associate import (
    FusionParams,
    fuse_frame,
    fuse_batch,
    greedy_iou_match,
    hungarian_match,
    point_inside_labels,
)

__all__ = [
    "FusionParams",
    "fuse_frame",
    "fuse_batch",
    "greedy_iou_match",
    "hungarian_match",
    "point_inside_labels",
]
