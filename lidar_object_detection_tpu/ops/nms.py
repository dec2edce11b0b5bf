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
    neg = jnp.float32(-jnp.inf)
    # Stable descending order via scores (ties keep original order, like
    # torchvision); implemented as an output-slot selection loop: each of
    # the max_outputs iterations picks the best surviving candidate and
    # suppresses its overlaps.  Sequential depth is max_outputs (e.g. 32),
    # not the candidate count (e.g. 256) -- 8x fewer loop steps on TPU,
    # identical results to the classic sorted sweep.
    iou = iou_2d_matrix(boxes, boxes)
    # NaN scores (diverged training, bf16 overflow) are dropped rather than
    # poisoning argmax; equal scores resolve to the lowest index via
    # jnp.argmax's first-occurrence guarantee (stable order, like the old
    # sorted sweep).
    finite = valid & jnp.isfinite(scores)
    base = jnp.where(finite, scores.astype(jnp.float32), neg)

    def body(slot, state):
        alive, out_idx, out_valid = state
        masked = jnp.where(alive, base, neg)
        best = jnp.argmax(masked).astype(jnp.int32)
        ok = alive[best] & (base[best] > neg)
        out_idx = out_idx.at[slot].set(jnp.where(ok, best, 0))
        out_valid = out_valid.at[slot].set(ok)
        suppress = (iou[best] > iou_threshold) | (jnp.arange(n) == best)
        alive = jnp.where(ok, alive & ~suppress, alive)
        return alive, out_idx, out_valid

    state = (finite, jnp.zeros((max_outputs,), jnp.int32),
             jnp.zeros((max_outputs,), bool))
    _, out_idx, keep_valid = jax.lax.fori_loop(0, max_outputs, body, state)
    return out_idx, keep_valid
