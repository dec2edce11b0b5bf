from lidar_object_detection_tpu.ops.masks import (
    pack_masks,
    unpack_masks,
    gather_mask_bits,
)
from lidar_object_detection_tpu.ops.erosion import (
    ellipse_kernel_offsets,
    erode_packed,
    erode_masks,
)
from lidar_object_detection_tpu.ops.hungarian import hungarian
from lidar_object_detection_tpu.ops.lap import lap
from lidar_object_detection_tpu.ops.nms import nms
from lidar_object_detection_tpu.ops.pallas_nms import pallas_nms
from lidar_object_detection_tpu.ops.rotated_iou import (
    rotated_iou_matrix, box7_to_bev_corners)
from lidar_object_detection_tpu.ops.scatter import scatter_depth_maps

__all__ = [
    "pack_masks",
    "unpack_masks",
    "gather_mask_bits",
    "ellipse_kernel_offsets",
    "erode_packed",
    "erode_masks",
    "hungarian",
    "lap",
    "nms",
    "pallas_nms",
    "scatter_depth_maps",
    "rotated_iou_matrix",
    "box7_to_bev_corners",
]
