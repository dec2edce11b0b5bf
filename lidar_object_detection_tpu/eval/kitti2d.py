"""KITTI (not 360) 2D detection evaluation -- the ObjectDetection_YOLO
subproject (ObjectDetection_final.py).

Reimplements, vectorized and jit-friendly:

* 2D IoU matching of detections to GT labels at IoU > 0.5
  (ObjectDetection_final.py:168-233): the reference iterates detections and
  takes the FIRST GT with IoU > threshold (``break`` at :233), counting one
  TP per detection -- replicated exactly, including the quirk that a GT box
  can be counted by several detections.
* monocular ground-plane distance from intrinsics
  (``calculate_distance_aligned``, :80-112): min over the 4 corners + 4 edge
  midpoints of sqrt(X^2 + h^2 + Y^2) with Y = h * fy / (v - cy),
  X = (u - cx) * Y / fx, camera height 1.65 m.
* precision / recall from TP / FP / FN (:237-241).
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

import jax.numpy as jnp

from lidar_object_detection_tpu.geom.boxes import iou_2d_matrix


def monocular_distance(intrinsics, boxes, camera_height: float = 1.65):
    """Ground-plane distance estimate per box (vectorized over (N, 4) xyxy).

    For each of 8 probe points (4 corners + 4 midpoints) the reference
    computes ``Y = h * fy / (v - cy)`` (infinite when v == cy) and returns the
    minimum distance over probes.
    """
    boxes = jnp.asarray(boxes)
    fx = intrinsics[0, 0]
    fy = intrinsics[1, 1]
    cx = intrinsics[0, 2]
    cy = intrinsics[1, 2]

    x_min, y_min, x_max, y_max = (boxes[..., 0], boxes[..., 1],
                                  boxes[..., 2], boxes[..., 3])
    xm = (x_min + x_max) / 2
    ym = (y_min + y_max) / 2
    us = jnp.stack([x_min, x_max, x_max, x_min, xm, x_max, xm, x_min], -1)
    vs = jnp.stack([y_min, y_min, y_max, y_max, y_min, ym, y_max, ym], -1)

    dv = vs - cy
    y = jnp.where(dv == 0, jnp.inf, camera_height * fy / dv)
    x = (us - cx) * y / fx
    dist = jnp.sqrt(x * x + camera_height * camera_height + y * y)
    dist = jnp.where(jnp.isfinite(dist), dist, jnp.inf)
    return jnp.min(dist, axis=-1)


def monocular_distance_bottom_center(intrinsics, boxes,
                                     camera_height: float = 1.65):
    """The earlier bottom-center-only distance variant (Final1.py:57-74):
    probe a single point at (box center x, y_max) instead of the 8-point
    minimum of :func:`monocular_distance`."""
    boxes = jnp.asarray(boxes)
    fx = intrinsics[0, 0]
    fy = intrinsics[1, 1]
    cx = intrinsics[0, 2]
    cy = intrinsics[1, 2]
    u = (boxes[..., 0] + boxes[..., 2]) / 2
    v = boxes[..., 3]
    dv = v - cy
    z = jnp.where(dv == 0, jnp.inf, camera_height * fy / dv)
    x = (u - cx) * z / fx
    dist = jnp.sqrt(x * x + camera_height * camera_height + z * z)
    # guard 0 * inf -> NaN (horizon box centred on cx), like the 8-point fn
    return jnp.where(jnp.isfinite(dist), dist, jnp.inf)


@dataclasses.dataclass
class MatchRecord:
    car_id: int
    det_box: np.ndarray
    gt_box: np.ndarray
    iou: float
    yolo_distance: float
    gt_distance: float


@dataclasses.dataclass
class ImageEvaluation:
    matches: List[MatchRecord]
    tp: int
    fp: int
    fn: int

    @property
    def precision(self) -> float:
        return self.tp / (self.tp + self.fp) if self.tp + self.fp > 0 else 0.0

    @property
    def recall(self) -> float:
        return self.tp / (self.tp + self.fn) if self.tp + self.fn > 0 else 0.0

    def result_lines(self) -> List[str]:
        """The ``results_<name>.txt`` line format (ObjectDetection_final.py:194)."""
        lines = []
        for m in self.matches:
            det = [int(x) for x in m.det_box]
            gt = [int(x) for x in m.gt_box]
            lines.append(
                f"CAR ID: {m.car_id}, YOLO distance: {m.yolo_distance:.2f}m, "
                f"GT distance: {m.gt_distance:.2f}m, "
                f"IoU Between YoloBB {det} and GT_BB {gt}: {m.iou:.2f}")
        return lines


def evaluate_image(det_boxes, gt_boxes, gt_distances, intrinsics,
                   iou_threshold: float = 0.5,
                   camera_height: float = 1.65) -> ImageEvaluation:
    """Evaluate one image's detections against GT labels.

    Args:
      det_boxes: (N, 4) int xyxy detections (already class- and conf-filtered).
      gt_boxes: (M, 4) int xyxy ground-truth boxes.
      gt_distances: (M,) GT distances (last label column).
      intrinsics: (3, 3) camera matrix.
    """
    det_boxes = np.asarray(det_boxes, dtype=np.float64).reshape(-1, 4)
    gt_boxes = np.asarray(gt_boxes, dtype=np.float64).reshape(-1, 4)
    gt_distances = np.asarray(gt_distances, dtype=np.float64).reshape(-1)

    matches: List[MatchRecord] = []
    tp = 0
    if len(det_boxes) and len(gt_boxes):
        iou = np.asarray(iou_2d_matrix(jnp.asarray(det_boxes),
                                       jnp.asarray(gt_boxes)))
        dists = np.asarray(monocular_distance(np.asarray(intrinsics),
                                              det_boxes, camera_height))
        for d in range(len(det_boxes)):
            over = np.nonzero(iou[d] > iou_threshold)[0]
            if len(over) == 0:
                continue
            g = int(over[0])   # first-match + break, like the reference
            tp += 1
            matches.append(MatchRecord(
                car_id=tp, det_box=det_boxes[d], gt_box=gt_boxes[g],
                iou=float(iou[d, g]), yolo_distance=float(dists[d]),
                gt_distance=float(gt_distances[g])))
    fp = len(det_boxes) - tp
    fn = len(gt_boxes) - tp
    return ImageEvaluation(matches=matches, tp=tp, fp=fp, fn=fn)
