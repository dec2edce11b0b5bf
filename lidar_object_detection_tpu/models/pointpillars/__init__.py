from lidar_object_detection_tpu.models.pointpillars.voxelize import (
    PillarGridConfig, pillar_ids, point_features, scatter_bev)
from lidar_object_detection_tpu.models.pointpillars.model import (
    PillarsConfig, PointPillars, PillarFeatureNet)
from lidar_object_detection_tpu.models.pointpillars.decode import (
    anchor_grid, encode_boxes, decode_boxes, bev_aabb, decode_predictions,
    corners_to_boxes7, boxes7_to_corners)
from lidar_object_detection_tpu.models.pointpillars.loss import (
    assign_anchors, pointpillars_loss)
from lidar_object_detection_tpu.models.pointpillars.train import PillarsTrainer
from lidar_object_detection_tpu.models.pointpillars.center import (
    CenterHead, center_loss, decode_center, render_center_targets)

__all__ = [
    "PillarGridConfig", "pillar_ids", "point_features", "scatter_bev",
    "PillarsConfig", "PointPillars", "PillarFeatureNet",
    "anchor_grid", "encode_boxes", "decode_boxes", "bev_aabb",
    "decode_predictions", "corners_to_boxes7", "boxes7_to_corners",
    "assign_anchors", "pointpillars_loss", "PillarsTrainer",
    "CenterHead", "center_loss", "decode_center", "render_center_targets",
]
