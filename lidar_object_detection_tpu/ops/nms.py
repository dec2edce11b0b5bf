"""Fixed-shape greedy non-maximum suppression.

The reference delegates NMS to ultralytics' torchvision call inside
``model.predict`` (V1_BBox_Pointwise_filtering.py:57).  Here it is a
jit-compiled O(N^2) greedy sweep over a static candidate count: sort by
score, walk the sorted list once, and suppress later boxes whose IoU with a
surviving earlier box exceeds the threshold.  N is small (<= a few hundred
post-threshold candidates), so the N x N IoU matrix is one fused elementwise
block and the sweep is a ``fori_loop`` over rows -- no dynamic shapes, fully
vmappable over a batch of images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lidar_object_detection_tpu.geom.boxes import iou_2d_matrix


def nms(boxes, scores, valid, iou_threshold: float, max_outputs: int):
    """Greedy NMS.

    Args:
      boxes: (N, 4) xyxy.
      scores: (N,) confidence.
      valid: (N,) bool candidate mask.
      iou_threshold: suppress IoU > threshold (torchvision semantics:
        strictly-greater survives the tie).
      max_outputs: static number of detections to keep.

    Returns:
      (indices, keep_valid): (max_outputs,) int32 indices into the input
      arrays, in descending-score order, and a (max_outputs,) bool mask of
      which slots hold real detections.
    """
    n = boxes.shape[0]
    neg = jnp.asarray(-jnp.inf, scores.dtype)
    # Stable descending sort (ties keep original order, like torchvision).
    order = jnp.argsort(-jnp.where(valid, scores, neg))
    boxes_s = boxes[order]
    alive = valid[order]

    iou = iou_2d_matrix(boxes_s, boxes_s)
    idx = jnp.arange(n)

    def body(i, alive):
        suppress = alive[i] & (iou[i] > iou_threshold) & (idx > i)
        return alive & ~suppress

    alive = jax.lax.fori_loop(0, n, body, alive)

    # Compact the survivors (stable: they are already score-sorted).
    rank = jnp.cumsum(alive) - 1
    slot = jnp.where(alive, rank, n)
    out_idx = jnp.full((max_outputs,), 0, jnp.int32)
    out_idx = out_idx.at[slot].set(order.astype(jnp.int32), mode="drop")
    kept = jnp.sum(alive)
    keep_valid = jnp.arange(max_outputs) < jnp.minimum(kept, max_outputs)
    return out_idx, keep_valid
