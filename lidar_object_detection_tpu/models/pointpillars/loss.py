"""PointPillars training loss: anchor assignment + focal/smooth-L1/dir.

Assignment uses the EXACT rotated BEV IoU between anchors and GT boxes by
default (``PillarsConfig.assign_iou="rotated"``; positive >= 0.6,
negative < 0.45, ignore between -- the paper's car thresholds), computed
in anchor chunks through the vectorized Sutherland-Hodgman op so the
(107k x 64) pair matrix never materializes its polygon buffers at once.
``assign_iou="aabb"`` keeps the cheap axis-aligned approximation.
Classification is a focal loss over all non-ignored anchors, regression a
smooth-L1 on the 7 encoded residuals with ``sin(dyaw)`` for the angle
channel, plus a 2-way direction cross-entropy.  All GT lists are
fixed-size (MAX_GT) with validity masks, so the whole loss jits and shards
with the training step.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from lidar_object_detection_tpu.geom.boxes import iou_2d_matrix
from lidar_object_detection_tpu.models.pointpillars.decode import (
    anchor_grid, bev_aabb, encode_boxes)
from lidar_object_detection_tpu.models.pointpillars.model import PillarsConfig


def rotated_iou_chunked(boxes_a, boxes_b, chunk: int = 1024):
    """(N, 7) x (M, 7) exact rotated BEV IoU, scanned over N-chunks to
    bound the clip-polygon workspace (ops/rotated_iou.py docstring).
    The chunk is sized for the batched (vmapped) training assignment:
    B x chunk x MAX_GT pairs of doubling clip buffers stay well under a
    GB of transient HBM."""
    from lidar_object_detection_tpu.ops.rotated_iou import rotated_iou_matrix

    n = boxes_a.shape[0]
    if n <= chunk:
        return rotated_iou_matrix(boxes_a, boxes_b)
    pad = (-n) % chunk
    a = jnp.pad(boxes_a, ((0, pad), (0, 0)))
    a = a.reshape(-1, chunk, boxes_a.shape[-1])
    ious = jax.lax.map(lambda ch: rotated_iou_matrix(ch, boxes_b), a)
    return ious.reshape(-1, boxes_b.shape[0])[:n]


def _rotated_iou_topk(anchors, gt_boxes7, k: int = 512):
    """Exact rotated IoU, dense (N, G), computed sparsely.

    The polygon-clipping op is gather-bound; running it over every
    (anchor, gt) pair costs tens of seconds per step.  But
    ``IoU_rot <= I_aabb / (area_a + area_b - I_aabb)`` (the rotated
    intersection can't exceed the AABB intersection, and the rotated union
    is at least areas-minus-that), so any pair whose BOUND is below the
    negative threshold is provably negative without clipping a single
    polygon.  We take the top-k anchors per gt by bound (k=512 covers the
    ~100 anchors a car-sized box can overlap at 0.32 m spacing many times
    over), clip exactly there, and scatter back into a dense matrix that
    is ZERO for non-candidates -- identical pos/neg/force decisions, since
    every untouched pair's true IoU is below any threshold in use.
    """
    from lidar_object_detection_tpu.ops.rotated_iou import rotated_iou_matrix

    n, g = anchors.shape[0], gt_boxes7.shape[0]
    a_aabb = bev_aabb(anchors)
    g_aabb = bev_aabb(gt_boxes7)
    x1 = jnp.maximum(a_aabb[:, None, 0], g_aabb[None, :, 0])
    y1 = jnp.maximum(a_aabb[:, None, 1], g_aabb[None, :, 1])
    x2 = jnp.minimum(a_aabb[:, None, 2], g_aabb[None, :, 2])
    y2 = jnp.minimum(a_aabb[:, None, 3], g_aabb[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)   # (N, G)
    area_a = (anchors[:, 3] * anchors[:, 4])[:, None]
    area_g = (gt_boxes7[:, 3] * gt_boxes7[:, 4])[None, :]
    denom = jnp.maximum(area_a + area_g - inter, 1e-9)
    bound = inter / denom                                       # (N, G)

    k = min(k, n)
    _, top_idx = jax.lax.top_k(bound.T, k)                      # (G, K)
    cand = anchors[top_idx]                                     # (G, K, 7)
    exact = jax.vmap(
        lambda a_, b_: rotated_iou_matrix(a_, b_[None])[:, 0])(
        cand, gt_boxes7)                                        # (G, K)
    return jnp.zeros((n, g), jnp.float32).at[
        top_idx, jnp.arange(g, dtype=jnp.int32)[:, None]].max(exact)


def assign_anchors(gt_boxes7, gt_valid, cfg: PillarsConfig,
                   pos_iou: float = 0.6, neg_iou: float = 0.45):
    """Per-anchor assignment for one frame.

    Returns dict: matched_gt (N,) int32 (best gt per anchor), pos (N,) bool,
    neg (N,) bool (N = H*W*A anchors).
    """
    anchors = anchor_grid(cfg).reshape(-1, 7)
    if cfg.assign_iou == "rotated":
        iou = _rotated_iou_topk(anchors, gt_boxes7)     # (N, G)
    else:
        a_aabb = bev_aabb(anchors)
        g_aabb = bev_aabb(gt_boxes7)
        iou = iou_2d_matrix(a_aabb, g_aabb)             # (N, G)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    best_iou = jnp.max(iou, axis=1)
    matched = jnp.argmax(iou, axis=1).astype(jnp.int32)
    pos = best_iou >= pos_iou
    # force-match: the best anchor of every valid gt is positive (standard
    # lowest-quality fallback so no gt goes unassigned)
    best_anchor = jnp.argmax(iou, axis=0)            # (G,)
    # Invalid / zero-IoU gts all argmax to anchor 0; scatter them to a dummy
    # slot instead so they can't overwrite a real gt's force-match there
    # (duplicate-index scatter write order is unspecified).
    force_ok = gt_valid & (jnp.max(iou, axis=0) > 0)
    idx = jnp.where(force_ok, best_anchor, anchors.shape[0])
    force = jnp.zeros(anchors.shape[0] + 1, bool).at[idx].set(True)[:-1]
    matched = jnp.where(force, jnp.argmax(jnp.where(
        force[:, None], iou, -1.0), axis=1).astype(jnp.int32), matched)
    pos = pos | force
    neg = (best_iou < neg_iou) & ~pos
    return {"matched": matched, "pos": pos, "neg": neg}


def focal_loss(logits, labels, alpha: float = 0.25, gamma: float = 2.0):
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    p_t = p * labels + (1 - p) * (1 - labels)
    a_t = alpha * labels + (1 - alpha) * (1 - labels)
    return a_t * (1 - p_t) ** gamma * ce


def smooth_l1(x, beta: float = 1.0 / 9.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def pointpillars_loss(outputs, gt_boxes7, gt_classes, gt_valid,
                      cfg: PillarsConfig,
                      cls_weight: float = 1.0, box_weight: float = 2.0,
                      dir_weight: float = 0.2,
                      gt_pos_weight=None) -> Dict[str, jnp.ndarray]:
    """Batched loss.

    Args:
      outputs: dict(cls (B, H, W, A, nc), box (B, H, W, A, 7),
        dir (B, H, W, A, 2)).
      gt_boxes7: (B, MAX_GT, 7); gt_classes: (B, MAX_GT) int32;
      gt_valid: (B, MAX_GT) bool.

    With ``cfg.head == "center"`` the outputs are the CenterPoint heads
    and the loss dispatches to :func:`..center.center_loss` (same metric
    dict keys, so the train step is head-agnostic).
    """
    if cfg.head == "center":
        from lidar_object_detection_tpu.models.pointpillars.center import (
            center_loss)
        return center_loss(outputs, gt_boxes7, gt_classes, gt_valid, cfg,
                           gt_pos_weight=gt_pos_weight)
    b = outputs["cls"].shape[0]
    nc = cfg.num_classes
    anchors = anchor_grid(cfg).reshape(-1, 7)
    n = anchors.shape[0]

    cls_logits = outputs["cls"].reshape(b, n, nc).astype(jnp.float32)
    box_deltas = outputs["box"].reshape(b, n, 7).astype(jnp.float32)
    dir_logits = outputs["dir"].reshape(b, n, 2).astype(jnp.float32)

    assign = jax.vmap(lambda g, v: assign_anchors(g, v, cfg))(
        gt_boxes7, gt_valid)
    pos = assign["pos"]                                   # (B, N)
    neg = assign["neg"]
    matched = assign["matched"]

    gt_per_anchor = jnp.take_along_axis(
        gt_boxes7, matched[..., None].astype(jnp.int32), axis=1)  # (B, N, 7)
    cls_per_anchor = jnp.take_along_axis(gt_classes, matched, axis=1)

    # --- classification: focal over pos+neg anchors ---
    labels = (jax.nn.one_hot(cls_per_anchor, nc)
              * pos[..., None].astype(jnp.float32))
    weights = (pos | neg).astype(jnp.float32)[..., None]
    num_pos = jnp.maximum(jnp.sum(pos), 1)
    cls_loss = jnp.sum(focal_loss(cls_logits, labels) * weights) / num_pos

    # --- regression on positives (sin for the yaw channel) ---
    targets = encode_boxes(gt_per_anchor, anchors[None])
    diff = box_deltas - targets
    diff = diff.at[..., 6].set(jnp.sin(diff[..., 6]))
    box_loss = jnp.sum(
        jnp.sum(smooth_l1(diff), -1) * pos.astype(jnp.float32)) / num_pos

    # --- direction: gt yaw in (-pi/2, pi/2] of the anchor frame -> class ---
    dyaw = gt_per_anchor[..., 6] - anchors[None, :, 6]
    dir_target = (jnp.remainder(dyaw + jnp.pi, 2 * jnp.pi) - jnp.pi)
    dir_cls = (jnp.abs(dir_target) > jnp.pi / 2).astype(jnp.int32)
    dir_ce = -jax.nn.log_softmax(dir_logits)[
        jnp.arange(b)[:, None], jnp.arange(n)[None, :], dir_cls]
    dir_loss = jnp.sum(dir_ce * pos.astype(jnp.float32)) / num_pos

    total = (cls_weight * cls_loss + box_weight * box_loss
             + dir_weight * dir_loss)
    return {"loss": total, "cls": cls_loss, "box": box_loss,
            "dir": dir_loss, "num_pos": num_pos}
