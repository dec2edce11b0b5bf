from lidar_object_detection_tpu.geom.projection import (
    cam2image,
    project_velo_points,
    point_validity,
)
from lidar_object_detection_tpu.geom.boxes import (
    transform_corners,
    corners_visibility,
    corners_visibility_rich,
    points_in_oriented_boxes,
    points_in_aabb,
    project_boxes_to_2d,
    iou_2d_matrix,
)

__all__ = [
    "cam2image",
    "project_velo_points",
    "point_validity",
    "transform_corners",
    "corners_visibility",
    "corners_visibility_rich",
    "points_in_oriented_boxes",
    "points_in_aabb",
    "project_boxes_to_2d",
    "iou_2d_matrix",
]
