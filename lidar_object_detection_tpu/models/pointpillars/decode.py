"""Anchor grid, box encoding/decoding and BEV NMS for PointPillars.

Encoding follows SECOND/PointPillars: center offsets normalized by the
anchor diagonal, log-ratio sizes, yaw as a direct residual trained through
``sin(dyaw)`` with a 2-way direction classifier resolving the pi ambiguity.
NMS runs on the axis-aligned BEV extent of the rotated boxes (a documented
approximation of rotated NMS; exact rotated IoU is a follow-up kernel).

7-dof box layout everywhere: (x, y, z, w, l, h, yaw) in the velodyne frame,
with w along the box's lateral axis, l longitudinal, yaw about +z.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from lidar_object_detection_tpu.models.pointpillars.model import PillarsConfig
from lidar_object_detection_tpu.ops.nms import nms


def anchor_grid(cfg: PillarsConfig):
    """Dense anchors at the head resolution.

    Returns (H, W, A, 7) float32: (x, y, z, w, l, h, yaw) with yaw in
    {0, pi/2}.
    """
    g = cfg.grid
    stride = cfg.out_stride
    h = g.ny // stride
    w = g.nx // stride
    cell = g.pillar_size * stride
    ys = g.y_range[0] + (np.arange(h) + 0.5) * cell
    xs = g.x_range[0] + (np.arange(w) + 0.5) * cell
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    aw, al, ah = cfg.anchor_size
    anchors = np.zeros((h, w, cfg.num_anchors, 7), np.float32)
    for a in range(cfg.num_anchors):
        anchors[..., a, 0] = gx
        anchors[..., a, 1] = gy
        anchors[..., a, 2] = cfg.anchor_z
        anchors[..., a, 3] = aw
        anchors[..., a, 4] = al
        anchors[..., a, 5] = ah
        anchors[..., a, 6] = (math.pi / 2) * (a % 2)
    return jnp.asarray(anchors)


def encode_boxes(boxes, anchors):
    """(..., 7) gt boxes + anchors -> regression targets."""
    diag = jnp.sqrt(anchors[..., 3] ** 2 + anchors[..., 4] ** 2)
    return jnp.stack([
        (boxes[..., 0] - anchors[..., 0]) / diag,
        (boxes[..., 1] - anchors[..., 1]) / diag,
        (boxes[..., 2] - anchors[..., 2]) / anchors[..., 5],
        jnp.log(jnp.maximum(boxes[..., 3], 1e-3) / anchors[..., 3]),
        jnp.log(jnp.maximum(boxes[..., 4], 1e-3) / anchors[..., 4]),
        jnp.log(jnp.maximum(boxes[..., 5], 1e-3) / anchors[..., 5]),
        boxes[..., 6] - anchors[..., 6],
    ], axis=-1)


def decode_boxes(deltas, anchors):
    """Inverse of :func:`encode_boxes`."""
    diag = jnp.sqrt(anchors[..., 3] ** 2 + anchors[..., 4] ** 2)
    return jnp.stack([
        deltas[..., 0] * diag + anchors[..., 0],
        deltas[..., 1] * diag + anchors[..., 1],
        deltas[..., 2] * anchors[..., 5] + anchors[..., 2],
        jnp.exp(deltas[..., 3]) * anchors[..., 3],
        jnp.exp(deltas[..., 4]) * anchors[..., 4],
        jnp.exp(deltas[..., 5]) * anchors[..., 5],
        deltas[..., 6] + anchors[..., 6],
    ], axis=-1)


def bev_aabb(boxes7):
    """Axis-aligned BEV extent (x1, y1, x2, y2) of rotated boxes."""
    x, y = boxes7[..., 0], boxes7[..., 1]
    w, l, yaw = boxes7[..., 3], boxes7[..., 4], boxes7[..., 6]
    c, s = jnp.abs(jnp.cos(yaw)), jnp.abs(jnp.sin(yaw))
    ex = (l * c + w * s) / 2
    ey = (l * s + w * c) / 2
    return jnp.stack([x - ex, y - ey, x + ex, y + ey], axis=-1)


def decode_predictions(outputs, cfg: PillarsConfig,
                       score_threshold: float = 0.3,
                       iou_threshold: float = 0.5,
                       max_detections: int = 64,
                       rotated_nms: bool = False):
    """Raw SSD heads -> final detections for ONE frame.

    Args:
      outputs: dict(cls (H, W, A, nc), box (H, W, A, 7), dir (H, W, A, 2)).
      rotated_nms: exact rotated-rectangle IoU suppression
        (ops/rotated_iou.py) instead of the BEV-AABB approximation.

    Returns dict: boxes7 (M, 7), scores (M,), classes (M,), valid (M,).

    With ``cfg.head == "center"`` the outputs are CenterPoint heads and
    decoding dispatches to :func:`..center.decode_center` (NMS-free peak
    decode; ``iou_threshold``/``rotated_nms`` are ignored there).
    """
    if cfg.head == "center":
        from lidar_object_detection_tpu.models.pointpillars.center import (
            decode_center)
        return decode_center(outputs, cfg, score_threshold=score_threshold,
                             max_detections=max_detections)
    anchors = anchor_grid(cfg)
    n = int(np.prod(outputs["cls"].shape[:-1]))
    cls = outputs["cls"].reshape(n, -1)
    scores_all = jnp.max(jax.nn.sigmoid(cls.astype(jnp.float32)), axis=-1)
    classes = jnp.argmax(cls, axis=-1).astype(jnp.int32)
    deltas = outputs["box"].reshape(n, 7)
    dirs = jnp.argmax(outputs["dir"].reshape(n, 2), axis=-1)
    boxes7 = decode_boxes(deltas.astype(jnp.float32), anchors.reshape(n, 7))
    # direction classifier resolves the pi ambiguity
    yaw = boxes7[..., 6] + jnp.where(dirs == 1, jnp.pi, 0.0)
    yaw = jnp.remainder(yaw + jnp.pi, 2 * jnp.pi) - jnp.pi
    boxes7 = boxes7.at[..., 6].set(yaw)

    k = min(512, n)
    top_scores, top_idx = jax.lax.top_k(scores_all, k)
    cand_valid = top_scores > score_threshold
    if rotated_nms:
        keep_idx, keep_valid = _rotated_nms(
            boxes7[top_idx], top_scores, cand_valid, iou_threshold,
            max_detections)
    else:
        aabb = bev_aabb(boxes7[top_idx])
        keep_idx, keep_valid = nms(aabb, top_scores, cand_valid,
                                   iou_threshold, max_detections)
    sel = top_idx[keep_idx]
    return {
        "boxes7": boxes7[sel],
        "scores": jnp.where(keep_valid, top_scores[keep_idx], 0.0),
        "classes": classes[sel],
        "valid": keep_valid,
    }


def _rotated_nms(boxes7, scores, valid, iou_threshold, max_outputs):
    """Greedy NMS on the exact rotated BEV IoU matrix (same slot-selection
    loop as ops.nms, different overlap metric)."""
    from lidar_object_detection_tpu.ops.rotated_iou import rotated_iou_matrix

    n = boxes7.shape[0]
    iou = rotated_iou_matrix(boxes7, boxes7)
    neg = jnp.float32(-jnp.inf)
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


def corners_to_boxes7(corners):
    """Velodyne-frame (G, 8, 3) KITTI-360 corners -> (G, 7) boxes.

    The actual KITTI-360 corner layout (verified empirically on the
    fixture; NOT the order the reference scripts assume) is a unit-cube
    vertex enumeration from c0 with

      c1 = c0 + H    c2 = c0 + W    c3 = c0 + W + H
      c5 = c0 + L    c4 = c0 + L + H
      c7 = c0 + L + W    c6 = c0 + L + W + H

    i.e. the orthogonal edges at c0 are c1 (height), c2 (width), c5
    (length).  The reference's ``oriented_point_in_bbox`` instead spans
    (c1, c3, c4) -- a parallelepiped over (H, W+H, L+H) -- which our
    fusion replicates verbatim for parity; this converter extracts the
    TRUE box for the PointPillars 7-dof representation.  Yaw is the
    length-edge direction about +z.
    """
    corners = jnp.asarray(corners)
    center = jnp.mean(corners, axis=-2)
    hvec = corners[..., 1, :] - corners[..., 0, :]
    wvec = corners[..., 2, :] - corners[..., 0, :]
    lvec = corners[..., 5, :] - corners[..., 0, :]
    w = jnp.linalg.norm(wvec, axis=-1)
    l = jnp.linalg.norm(lvec, axis=-1)
    h = jnp.linalg.norm(hvec, axis=-1)
    yaw = jnp.arctan2(lvec[..., 1], lvec[..., 0])
    return jnp.stack([center[..., 0], center[..., 1], center[..., 2],
                      w, l, h, yaw], axis=-1)


def boxes7_to_corners(boxes7):
    """(…, 7) boxes -> (…, 8, 3) corners in the KITTI-360 layout of
    :func:`corners_to_boxes7` (its exact inverse for upright boxes):
    c0 at -L/2,-W/2,-H/2 with c1=c0+H, c2=c0+W, c3=c0+W+H, c5=c0+L,
    c4=c0+L+H, c7=c0+L+W, c6=c0+L+W+H.  Used to render predicted boxes
    through the same viz/export path as GT corners."""
    b = jnp.asarray(boxes7)
    c, s = jnp.cos(b[..., 6]), jnp.sin(b[..., 6])
    zero = jnp.zeros_like(c)
    lhat = jnp.stack([c, s, zero], axis=-1)               # length axis
    what = jnp.stack([-s, c, zero], axis=-1)              # width axis
    zhat = jnp.stack([zero, zero, jnp.ones_like(c)], axis=-1)
    L = b[..., 4:5] * lhat
    W = b[..., 3:4] * what
    H = b[..., 5:6] * zhat
    c0 = b[..., :3] - 0.5 * (L + W + H)
    offsets = jnp.stack([
        jnp.zeros_like(c0), H, W, W + H, L + H, L, L + W + H, L + W,
    ], axis=-2)                                           # (…, 8, 3)
    return c0[..., None, :] + offsets
