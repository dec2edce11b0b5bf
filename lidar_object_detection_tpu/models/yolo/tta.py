"""Horizontal-flip test-time augmentation for the seg decode path.

Mechanism (probe: ``examples/quality_flip_probe.py``; numbers:
PERFORMANCE.md "flip TTA"): run the network on the frame AND its
horizontal mirror, decode both views, mirror the flipped view's mask
PROBABILITY fields back to normal-frame coordinates, and per
IoU-matched detection average the two fields before the serving
binarization.  Boxes, scores, validity, and detection ORDER stay the
normal view's — detection coverage cannot regress by construction; only
the mask boundary moves, toward the two-view consensus.  On the
committed checkpoints the consensus boundary beats the single view at
every probed operating point (guarded serving point: x 77.44 / n 77.06
mean inside-% eroded @ all 65 cars vs 76.96 / 76.58), because averaging
two views' soft fields cancels the anti-symmetric half of the per-view
boundary error that the high-threshold cut then shrinks past.

The reference has no TTA (its predict path is one ultralytics call,
V1_BBox_Pointwise_filtering.py:57); this is a framework extension, off
by default — the second forward doubles detector compute, so it ships
as an opt-in serving mode (``YoloDetector(tta="hflip")``, sidecar
``serving.tta``).

TPU shape notes: both views ride ONE batched forward (2B frames — the
MXU sees a bigger batch, not two launches) and the per-frame merge runs
under ``jax.lax.map``.  Bilinear upsampling is LINEAR, so the consensus
average happens at PROTO resolution (two ~1 MB cropped sigmoid tables,
``postprocess.cropped_prob_table``) and ONE table flows into the shared
assembly tail (``postprocess._finish_masks``) — the mirrored table's
width reversal commutes exactly with the symmetric-resize + source-
resolution mirror, so this equals averaging the upsampled (D, H0, W0)
fields while materializing neither, and the fused stack-free Pallas
kernel (ops/pallas_masks.py) serves the consensus mode unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from lidar_object_detection_tpu.models.yolo.postprocess import (
    PostprocessParams,
    _finish_masks,
    cropped_prob_table,
    postprocess_single,
)

__all__ = ["flip_boxes", "postprocess_tta_pair", "validate_tta_params"]


def flip_boxes(boxes, src_w: float):
    """xyxy boxes in flipped-source pixels -> normal-source pixels."""
    return jnp.stack([src_w - boxes[:, 2], boxes[:, 1],
                      src_w - boxes[:, 0], boxes[:, 3]], axis=-1)


def validate_tta_params(params: PostprocessParams) -> None:
    """hflip TTA averages PROBABILITY fields and binarizes through
    :func:`pack_thresholded_masks` (the prob/absolute XLA tail, bit-parity
    pinned in tests/test_yolo.py) — reject decode modes it cannot honor."""
    if params.mask_upsample != "prob":
        raise ValueError(
            "tta='hflip' needs mask_upsample='prob': the consensus "
            "averages per-view probability fields, which has no "
            "logit-space equivalent after the sigmoid")
    if params.mask_threshold_mode != "absolute":
        raise ValueError(
            "tta='hflip' needs mask_threshold_mode='absolute': a "
            "relative cut of an AVERAGED field re-normalizes against a "
            "peak neither view produced")


def postprocess_tta_pair(out_n, out_f, params: PostprocessParams,
                         match_iou: float = 0.5) -> Dict[str, jnp.ndarray]:
    """One frame's consensus detections from the two views' raw outputs.

    Args:
      out_n: ``Yolo11.__call__`` outputs for the normal view (batch dim
        removed per level, as :func:`postprocess_single` takes them).
      out_f: same, for the horizontally flipped SOURCE image (flip before
        letterbox — the view the detector's TTA forward produces).
      params: serving decode parameters (threshold / guarded-shrink floor
        apply to the averaged field).
      match_iou: a normal-view detection adopts the consensus field only
        when its best flipped-view IoU (boxes mapped back) reaches this;
        unmatched detections keep their single-view field untouched.

    Returns the :func:`postprocess_single` serving schema: ``boxes`` /
    ``scores`` / ``det_valid`` (the normal view's, unchanged) and
    ``mask_bits`` packed from the consensus table.  Under jit the two
    single-view mask assemblies are dead code (only ``coef`` is read) and
    XLA eliminates them.
    """
    validate_tta_params(params)
    p = dataclasses.replace(params, emit_coef=True)
    det_n = postprocess_single(out_n, p)
    det_f = postprocess_single(out_f, p)
    if "coef" not in det_n:
        raise ValueError("tta='hflip' needs a segmentation head: the "
                         "consensus is over mask probability fields")
    spec = params.spec

    # proto-resolution consensus: mirroring the cropped table's width
    # axis == mirroring the upsampled field (symmetric bilinear taps),
    # and the average commutes with the linear upsample -- so neither
    # view's (D, H0, W0) float stack is ever materialized here
    table_n = cropped_prob_table(out_n["proto"], det_n["coef"], spec)
    table_f = cropped_prob_table(out_f["proto"], det_f["coef"],
                                 spec)[:, :, ::-1]
    boxes_f = flip_boxes(det_f["boxes"], float(spec.src_w))

    from lidar_object_detection_tpu.geom.boxes import iou_2d_matrix
    iou = iou_2d_matrix(det_n["boxes"], boxes_f)               # (D, D)
    iou = jnp.where(det_f["det_valid"][None, :], iou, 0.0)
    best = jnp.argmax(iou, axis=1)                             # (D,)
    matched = (jnp.max(iou, axis=1) >= match_iou) & det_n["det_valid"]
    table = jnp.where(matched[:, None, None],
                      0.5 * (table_n + table_f[best]), table_n)

    bits = _finish_masks(
        table, det_n["boxes"], det_n["det_valid"], spec,
        fast=params.fast_masks, impl=params.mask_assembly,
        threshold=params.mask_threshold,
        floor=params.mask_threshold_floor,
        min_pixels=params.mask_min_pixels)
    return {"boxes": det_n["boxes"], "scores": det_n["scores"],
            "det_valid": det_n["det_valid"], "mask_bits": bits}
