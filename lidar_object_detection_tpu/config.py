"""Configuration for every pipeline version.

The reference hardcodes its knobs inline across scripts (SURVEY.md section 5,
"Config / flag system"); this module names all of them with the reference
defaults pinned per pipeline version:

  depth < 50 m        V1_BBox_Pointwise_filtering.py:357 (also V2/V3/cvs)
  depth < 30 m        V4_BBox_IoU_filtering.py:275, V5_ProjectingBBoxes.py:508
  min_points = 10     V1:401, cvs_erosion.py:372
  IoU gate 0.25       V4:140 (greedy matching)
  IoU gate 0.1        firsttest.py:218 (prototype greedy matching)
  score >= 0.3, IoU >= 0.15   V5:308 (Hungarian matching)
  erosion kernel 3, 1 iter    V3_point_cloud_with_erosion.py:580, cvs_erosion.py:77
  conf = 0.5          ObjectDetection_final.py:132 (KITTI 2D eval)
  camera_height 1.65  ObjectDetection_final.py:80 (monocular distance)
  bbox visibility: >= 2 corners, depth > 0.1   V1:96-115
"""

from __future__ import annotations

import dataclasses
import enum


class PipelineVersion(enum.Enum):
    """The five reference fusion pipelines plus auxiliary entry points."""

    V1_POINTWISE = "v1_pointwise"      # V1_BBox_Pointwise_filtering.py
    V2_STATS = "v2_stats"              # V2_point_cloud_without_erosion.py
    V3_EROSION = "v3_erosion"          # V3_point_cloud_with_erosion.py
    V4_IOU = "v4_iou"                  # V4_BBox_IoU_filtering.py
    V5_PROJECTED = "v5_projected"      # V5_ProjectingBBoxes.py (Hungarian)
    CSV_EVAL = "csv_eval"              # cvs_erosion.py (headless metrics)
    DEPTH_MAPS = "depth_maps"          # seg_with_pointcloud.py
    KITTI2D_EVAL = "kitti2d_eval"      # ObjectDetection_final.py


class MatchStrategy(enum.Enum):
    POINT_COUNT = "point_count"   # best box by inside-point count (V1/V2/V3/csv)
    GREEDY_IOU = "greedy_iou"     # greedy best-2D-IoU (V4, firsttest)
    HUNGARIAN = "hungarian"       # weighted-score Hungarian assignment (V5)


@dataclasses.dataclass(frozen=True)
class ShapeConfig:
    """Static padded shapes -- the fixed-shape discipline that replaces the
    reference's ragged NumPy arrays (109k-122k points, 0-31 boxes per frame)."""

    max_points: int = 131072   # scans are 109,355-122,183 pts (SURVEY.md 2.2)
    max_detections: int = 32   # packed into uint32 mask-bit planes
    max_boxes: int = 384       # BBoxes_2449.json has 314 boxes (3 x 128 lanes)
    image_height: int = 376    # S_rect_00 in perspective.txt:8
    image_width: int = 1408


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """All knobs of the fusion pipelines with reference defaults."""

    version: PipelineVersion = PipelineVersion.CSV_EVAL
    shapes: ShapeConfig = dataclasses.field(default_factory=ShapeConfig)

    # --- point validity (V1:357 / V4:275) ---
    depth_min: float = 0.0
    depth_max: float = 50.0

    # --- GT-box visibility pre-filter (V1:96-115; "rich" =
    #     secondtest.py:277-359's is_bbox_in_camera_view) ---
    bbox_filter_enabled: bool = True
    bbox_filter_mode: str = "simple"
    bbox_min_visible_corners: int = 2
    bbox_corner_depth_min: float = 0.1
    bbox_rich_depth_max: float = 100.0
    bbox_rich_min_corners_in_view: int = 4
    bbox_rich_min_area: float = 100.0

    # --- mask erosion (V3:580, cvs_erosion.py:77) ---
    erosion_enabled: bool = False
    erosion_kernel_size: int = 3
    erosion_iterations: int = 1

    # --- matching ---
    match_strategy: MatchStrategy = MatchStrategy.POINT_COUNT
    min_points: int = 10               # V1:401
    greedy_min_iou: float = 0.25       # V4:140
    hungarian_min_score: float = 0.3   # V5:308
    hungarian_min_iou: float = 0.15    # V5:308
    score_weight_iou: float = 0.5      # V5:277
    score_weight_center: float = 0.3
    score_weight_size: float = 0.2
    center_norm: float = 1000.0        # V5:286 center-distance normalizer

    # --- detector ---
    detector_conf: float = 0.25        # ultralytics predict default (fusion)
    detector_iou_nms: float = 0.7      # ultralytics NMS default
    car_class_id: int = 2              # classes=2 (V1:57)
    retina_masks: bool = True

    # --- KITTI 2D eval (ObjectDetection_final.py) ---
    eval2d_conf: float = 0.5           # :132
    eval2d_match_iou: float = 0.5      # :171
    camera_height: float = 1.65        # :80

    @staticmethod
    def for_version(version: PipelineVersion) -> "FusionConfig":
        """Reference-default config per pipeline version."""
        v = PipelineVersion
        if version in (v.V1_POINTWISE, v.V2_STATS):
            return FusionConfig(version=version)
        if version in (v.V3_EROSION, v.CSV_EVAL):
            return FusionConfig(version=version, erosion_enabled=True)
        if version == v.V4_IOU:
            # V4 uses depth<30 (V4:275) and greedy IoU>=0.25, no GT pre-filter
            # beyond visibility (V4 keeps filter_visible_bboxes, V4:96).
            return FusionConfig(
                version=version, depth_max=30.0,
                match_strategy=MatchStrategy.GREEDY_IOU)
        if version == v.V5_PROJECTED:
            # V5 skips the visibility pre-filter entirely (V5:445-461).
            return FusionConfig(
                version=version, depth_max=30.0,
                bbox_filter_enabled=False,
                match_strategy=MatchStrategy.HUNGARIAN)
        if version == v.DEPTH_MAPS:
            # seg_with_pointcloud.py:154-158 uses depth<30.
            return FusionConfig(version=version, depth_max=30.0)
        if version == v.KITTI2D_EVAL:
            return FusionConfig(version=version)
        raise ValueError(f"unknown version {version}")
