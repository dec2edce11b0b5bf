"""KITTI 2D detection evaluation pipeline (ObjectDetection_final.py).

Runs a detector over a KITTI_Selection-style directory, matches detections
to GT labels at IoU > 0.5, computes monocular distances and
precision/recall, and writes the reference's ``results_<name>.png.txt``
files (writer format: ObjectDetection_final.py:194-195).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional

import numpy as np

from lidar_object_detection_tpu.data.kitti2d import Kitti2DDataset
from lidar_object_detection_tpu.eval.kitti2d import ImageEvaluation, evaluate_image


@dataclasses.dataclass
class Kitti2DRunResult:
    evaluations: Dict[str, ImageEvaluation]

    @property
    def totals(self) -> dict:
        tp = sum(e.tp for e in self.evaluations.values())
        fp = sum(e.fp for e in self.evaluations.values())
        fn = sum(e.fn for e in self.evaluations.values())
        return {
            "tp": tp, "fp": fp, "fn": fn,
            "precision": tp / (tp + fp) if tp + fp else 0.0,
            "recall": tp / (tp + fn) if tp + fn else 0.0,
        }


def _yolo_detect_fn(conf: float, class_id: int):
    """Build a per-image detector using the Flax YOLO11 (detection head).

    Detectors are cached per image shape (KITTI images vary slightly).
    """
    from lidar_object_detection_tpu.models.yolo.detector import YoloDetector
    from lidar_object_detection_tpu.models.yolo.model import YoloConfig

    cache: Dict[tuple, YoloDetector] = {}

    def detect(image: np.ndarray) -> np.ndarray:
        shape = image.shape[:2]
        if shape not in cache:
            cache[shape] = YoloDetector(
                shape, YoloConfig(segment=False), conf=conf,
                class_id=class_id)
        out = cache[shape].detect(image[None])
        valid = np.asarray(out["det_valid"][0])
        return np.asarray(out["boxes"][0])[valid].astype(np.int64)

    return detect


def run_kitti2d_eval(root: str,
                     detect_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
                     output_dir: Optional[str] = None,
                     conf: float = 0.5, iou_threshold: float = 0.5,
                     camera_height: float = 1.65,
                     class_id: int = 2,
                     write_images: bool = True) -> Kitti2DRunResult:
    """Evaluate every image under ``root``.

    Args:
      detect_fn: image (H, W, 3 uint8 RGB) -> (N, 4) int xyxy car boxes,
        already confidence-filtered.  Defaults to the Flax YOLO detector
        with the reference's conf=0.5 / class 2 settings (:132,141).
      output_dir: when set, ``results_<name>.<ext>.txt`` files are written
        (reference line format) plus -- unless ``write_images=False`` --
        the annotated per-image PNGs with box + ID/IoU/distance labels
        (ObjectDetection_final.py:166-253, same basename as the input).
    """
    ds = Kitti2DDataset(root)
    if detect_fn is None:
        detect_fn = _yolo_detect_fn(conf, class_id)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)

    from PIL import Image

    evaluations: Dict[str, ImageEvaluation] = {}
    for name in ds.sample_names():
        sample = ds.load(name)
        image = np.asarray(Image.open(sample.image_path).convert("RGB"))
        det_boxes = detect_fn(image)
        intrinsics = sample.intrinsics
        if intrinsics is None:
            intrinsics = np.eye(3)
        ev = evaluate_image(det_boxes, sample.gt_boxes, sample.gt_distances,
                            intrinsics, iou_threshold, camera_height)
        evaluations[name] = ev
        if output_dir:
            ext = os.path.splitext(sample.image_path)[1].lstrip(".")
            out_path = os.path.join(output_dir, f"results_{name}.{ext}.txt")
            with open(out_path, "w") as f:
                for line in ev.result_lines():
                    f.write(line + "\n")
            if write_images:
                from lidar_object_detection_tpu.viz.overlay import \
                    annotate_kitti2d_image
                annotated = annotate_kitti2d_image(
                    image, ev.matches, ev.precision, ev.recall)
                Image.fromarray(annotated).save(
                    os.path.join(output_dir,
                                 os.path.basename(sample.image_path)))
    return Kitti2DRunResult(evaluations=evaluations)
