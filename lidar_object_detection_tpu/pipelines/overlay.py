"""Batch segmentation-overlay export (Imagesegmentation_final.py:15-53):
run the detector over a directory of images, draw masks + boxes, save
overlays.  Host-side viz only; colors follow the reference generators."""

from __future__ import annotations

import glob
import os

import numpy as np

from lidar_object_detection_tpu.ops.masks import unpack_masks
from lidar_object_detection_tpu.viz.overlay import (draw_boxes, golden_colors,
                                                    overlay_masks)


def segment_overlay_dir(images_dir: str, output_dir: str, detector,
                        pattern: str = "*.png") -> int:
    """Detect + overlay every image in ``images_dir``; returns image count.

    ``detector`` must expose ``detect(images (1, H, W, 3) uint8)`` returning
    boxes/scores/det_valid/mask_bits (YoloDetector interface).
    """
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    count = 0
    for path in sorted(glob.glob(os.path.join(images_dir, pattern))):
        img = np.asarray(Image.open(path).convert("RGB"))
        out = detector.detect(img[None])
        det_valid = np.asarray(out["det_valid"][0])
        n = int(det_valid.sum())
        colors = golden_colors(max(n, 1))
        masks = np.asarray(unpack_masks(np.asarray(out["mask_bits"][0]),
                                        len(det_valid)))[det_valid]
        boxes = np.asarray(out["boxes"][0])[det_valid]
        vis = overlay_masks(img, masks, colors)
        vis = draw_boxes(vis, boxes, colors)
        Image.fromarray(vis).save(
            os.path.join(output_dir, os.path.basename(path)))
        count += 1
    return count
