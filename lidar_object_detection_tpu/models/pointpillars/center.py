"""CenterPoint-style center-heatmap head on the pillar backbone.

Second LiDAR detection family next to the anchor-based SSD head
(``models/pointpillars/model.py``): a dense per-cell center heatmap with
gaussian-splat targets (CenterNet/CenterPoint, Yin et al. 2021) plus an
8-channel regression map (sub-cell offset, z, log dims, sin/cos yaw).
Decode is NMS-free -- a 3x3 max-pool peak test plus ``top_k`` -- which
maps far better onto the TPU than sequential suppression loops: the whole
head is convs (MXU) and one reduce-window.

Everything is fixed-shape and jittable: targets render MAX_GT gaussian
windows (33x33 cells each) with a scatter-max, the loss gathers
regression predictions at the GT center cells, and decode returns the
same ``{boxes7, scores, classes, valid}`` dict as
:func:`..decode.decode_predictions` so the eval/pipeline layers are
shared between both heads.

No counterpart exists in the reference (it has no LiDAR-only detector);
this extends the stretch goal of SURVEY.md §7 step 8 / BASELINE.json
configs[4] with a second head family.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# gaussian window half-size in cells; a car (3.9 x 1.6 m) at the surround
# preset's 0.64 m head cells spans ~6 x 3 cells, so radius <= 16 covers
# every practical overlap radius several times over
WINDOW_R = 16
WINDOW = 2 * WINDOW_R + 1


class CenterHead(nn.Module):
    """Shared 3x3 trunk + 1x1 heatmap / regression heads.

    heat: (B, H, W, nc) center logits (bias init -2.19 so the initial
    sigmoid is ~0.1, the CenterNet/RetinaNet stability trick).
    reg:  (B, H, W, 8) = (off_x, off_y, z, log w, log l, log h,
    sin yaw, cos yaw).
    """

    cfg: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from lidar_object_detection_tpu.models.pointpillars.model import (
            ConvBN)

        cfg = self.cfg
        x = ConvBN(cfg.up_channels, 3, 1, bn_momentum=cfg.bn_momentum,
                   dtype=self.dtype, name="trunk")(x, train)
        heat = nn.Conv(cfg.num_classes, (1, 1), dtype=self.dtype,
                       bias_init=nn.initializers.constant(-2.19),
                       name="heat")(x)
        reg = nn.Conv(8, (1, 1), dtype=self.dtype, name="reg")(x)
        return {"heat": heat, "reg": reg}


def _head_cell(cfg) -> float:
    return cfg.grid.pillar_size * cfg.out_stride


def _head_shape(cfg):
    return cfg.grid.ny // cfg.out_stride, cfg.grid.nx // cfg.out_stride


def gaussian_radius(l_cells, w_cells, min_overlap: float = 0.7):
    """CornerNet radius: the largest center shift (in cells) keeping IoU
    with the true box above ``min_overlap``, minimum over the three
    standard displacement cases."""
    h, w = l_cells, w_cells
    a1 = 1.0
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))) / (2 * a1)
    a2 = 4.0
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 - jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))) / (2 * a2)
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (-b3 + jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def render_center_targets(gt_boxes7, gt_classes, gt_valid, cfg):
    """GT boxes -> dense heatmap targets + per-GT regression targets.

    One frame.  Returns dict:
      heat (H, W, nc): max-composed gaussians, exactly 1.0 at center cells;
      ind (G,) int32: flattened H*W center cell per gt (0 if invalid);
      reg (G, 8): regression targets at those cells;
      mask (G,) bool: gt valid AND center inside the grid.
    """
    g0 = cfg.grid
    cell = _head_cell(cfg)
    h, w = _head_shape(cfg)
    nc = cfg.num_classes
    gmax = gt_boxes7.shape[0]

    cx = (gt_boxes7[:, 0] - g0.x_range[0]) / cell          # (G,) cells
    cy = (gt_boxes7[:, 1] - g0.y_range[0]) / cell
    ix = jnp.floor(cx).astype(jnp.int32)
    iy = jnp.floor(cy).astype(jnp.int32)
    inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    mask = gt_valid & inside

    l_cells = gt_boxes7[:, 4] / cell
    w_cells = gt_boxes7[:, 3] / cell
    radius = jnp.clip(gaussian_radius(l_cells, w_cells), 1.0, WINDOW_R)
    sigma = (2 * radius + 1) / 6.0                          # (G,)

    dy = jnp.arange(-WINDOW_R, WINDOW_R + 1)
    dxx, dyy = jnp.meshgrid(dy, dy, indexing="xy")          # (W, W)
    val = jnp.exp(-(dxx[None] ** 2 + dyy[None] ** 2)
                  / (2 * sigma[:, None, None] ** 2))        # (G, W, W)
    wy = iy[:, None, None] + dyy[None]                      # (G, W, W)
    wx = ix[:, None, None] + dxx[None]
    ok = (mask[:, None, None] & (wx >= 0) & (wx < w)
          & (wy >= 0) & (wy < h))
    val = jnp.where(ok, val, 0.0)
    # route out-of-bounds / invalid cells to a scratch slot past the map
    flat = jnp.where(ok, wy * w + wx, h * w)
    cls = jnp.clip(gt_classes, 0, nc - 1)
    # cast explicitly: under x64 `val` promotes to float64 and a
    # dtype-mismatched .at[].max scatter is a (future) hard error
    heat = jnp.zeros((h * w + 1, nc), jnp.float32).at[
        flat.reshape(gmax, -1),
        cls[:, None].astype(jnp.int32)].max(
        val.reshape(gmax, -1).astype(jnp.float32))
    heat = heat[:-1].reshape(h, w, nc)

    ind = jnp.where(mask, iy * w + ix, 0).astype(jnp.int32)
    reg = jnp.stack([
        cx - ix.astype(jnp.float32),
        cy - iy.astype(jnp.float32),
        gt_boxes7[:, 2],
        jnp.log(jnp.maximum(gt_boxes7[:, 3], 1e-3)),
        jnp.log(jnp.maximum(gt_boxes7[:, 4], 1e-3)),
        jnp.log(jnp.maximum(gt_boxes7[:, 5], 1e-3)),
        jnp.sin(gt_boxes7[:, 6]),
        jnp.cos(gt_boxes7[:, 6]),
    ], axis=-1)
    return {"heat": heat, "ind": ind, "reg": reg, "mask": mask}


def penalty_reduced_focal(logits, targets, alpha: float = 2.0,
                          beta: float = 4.0, pos_weight=None):
    """CornerNet focal: positives are cells with target exactly 1, the
    gaussian tail (4th power) downweights negatives near centers.

    ``pos_weight`` (same shape as targets, default 1) scales the positive
    term per cell -- the per-GT starvation upweighting hook."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    p = jnp.clip(p, 1e-6, 1 - 1e-6)
    pos = (targets >= 1.0 - 1e-6).astype(jnp.float32)
    pos_loss = -((1 - p) ** alpha) * jnp.log(p) * pos
    if pos_weight is not None:
        pos_loss = pos_loss * pos_weight
    neg_loss = (-((1 - targets) ** beta) * (p ** alpha) * jnp.log(1 - p)
                * (1 - pos))
    return pos_loss + neg_loss


def center_loss(outputs, gt_boxes7, gt_classes, gt_valid, cfg,
                heat_weight: float = 1.0,
                reg_weight: float = 2.0,
                gt_pos_weight=None) -> Dict[str, jnp.ndarray]:
    """Batched CenterPoint loss; same signature family as
    :func:`..loss.pointpillars_loss` so the shared train step dispatches
    on ``cfg.head``.

    ``gt_pos_weight`` (B, G) >= 1 upweights each GT's positive heatmap
    cell and regression term -- the per-GT starvation weighting
    (cfg.starve_weight) that lets point-starved boxes compete for peaks.
    """
    targets = jax.vmap(lambda g, c, v: render_center_targets(g, c, v, cfg))(
        gt_boxes7, gt_classes, gt_valid)
    heat_logits = outputs["heat"].astype(jnp.float32)
    b = heat_logits.shape[0]
    h, w = _head_shape(cfg)
    nc = cfg.num_classes
    num_pos = jnp.maximum(jnp.sum(targets["mask"]), 1).astype(jnp.float32)

    pw_map = None
    gt_w = None
    if gt_pos_weight is not None:
        gt_w = jnp.maximum(gt_pos_weight.astype(jnp.float32), 1.0)

        def wmap_one(ind, cls, mask, wgt):
            wm = jnp.ones((h * w + 1, nc), jnp.float32).at[
                ind, jnp.clip(cls, 0, nc - 1).astype(jnp.int32)].max(
                jnp.where(mask, wgt, 1.0))
            return wm[:-1].reshape(h, w, nc)

        pw_map = jax.vmap(wmap_one)(targets["ind"], gt_classes,
                                    targets["mask"], gt_w)

    heat_l = jnp.sum(penalty_reduced_focal(
        heat_logits, targets["heat"], pos_weight=pw_map)) / num_pos

    reg_map = outputs["reg"].astype(jnp.float32).reshape(b, h * w, 8)
    pred = jnp.take_along_axis(
        reg_map, targets["ind"][..., None].astype(jnp.int32), axis=1)
    l1 = jnp.sum(jnp.abs(pred - targets["reg"]), axis=-1)
    reg_w = targets["mask"].astype(jnp.float32)
    if gt_w is not None:
        reg_w = reg_w * gt_w
    reg_l = jnp.sum(l1 * reg_w) / num_pos

    total = heat_weight * heat_l + reg_weight * reg_l
    return {"loss": total, "cls": heat_l, "box": reg_l,
            "dir": jnp.zeros((), jnp.float32), "num_pos": num_pos}


def gt_point_counts(points, valid, gt_boxes7, gt_valid):
    """Per-GT in-box point counts (batched): rotated-BEV footprint + z
    containment.  points (B, P, >=3), gt_boxes7 (B, G, 7) with length
    along local +x (ops/rotated_iou.py convention).  Returns (B, G) f32."""
    xy = points[..., :2]                                     # (B, P, 2)
    z = points[..., 2]
    dx = xy[..., 0][:, :, None] - gt_boxes7[:, None, :, 0]   # (B, P, G)
    dy = xy[..., 1][:, :, None] - gt_boxes7[:, None, :, 1]
    yaw = gt_boxes7[..., 6][:, None, :]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    lx = dx * c + dy * s
    ly = -dx * s + dy * c
    dz = z[:, :, None] - gt_boxes7[:, None, :, 2]
    inside = ((jnp.abs(lx) <= gt_boxes7[:, None, :, 4] / 2)
              & (jnp.abs(ly) <= gt_boxes7[:, None, :, 3] / 2)
              & (jnp.abs(dz) <= gt_boxes7[:, None, :, 5] / 2)
              & valid[:, :, None])
    return jnp.sum(inside, axis=1).astype(jnp.float32) * gt_valid


def starve_weights(points, valid, gt_boxes7, gt_valid, cfg):
    """1 + starve_weight * exp(-count / n0): smooth inverse-point-count
    positive weighting, ~(1 + w) for empty boxes -> 1 for dense ones."""
    counts = gt_point_counts(points, valid, gt_boxes7, gt_valid)
    return 1.0 + cfg.starve_weight * jnp.exp(-counts / cfg.starve_n0)


def decode_center(outputs, cfg, score_threshold: float = 0.3,
                  max_detections: int = 64, **_ignored):
    """Raw center heads -> final detections for ONE frame, NMS-free.

    A cell is a detection iff it is the 3x3 local max of its class
    heatmap (CenterPoint's peak NMS); top-``max_detections`` peaks by
    score are decoded.  Returns the same dict as
    :func:`..decode.decode_predictions`.
    """
    heat = jax.nn.sigmoid(outputs["heat"].astype(jnp.float32))  # (H, W, nc)
    h, w, nc = heat.shape
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (3, 3, 1), (1, 1, 1),
        [(1, 1), (1, 1), (0, 0)])
    peak = jnp.where(heat >= hmax, heat, 0.0)

    flat = peak.reshape(-1)                                  # H*W*nc
    k = min(max_detections, flat.shape[0])
    scores, idx = jax.lax.top_k(flat, k)
    cls = (idx % nc).astype(jnp.int32)
    cell = idx // nc
    iy = cell // w
    ix = cell % w

    reg = outputs["reg"].astype(jnp.float32).reshape(h * w, 8)
    r = reg[cell]                                            # (K, 8)
    csize = _head_cell(cfg)
    g0 = cfg.grid
    x = g0.x_range[0] + (ix.astype(jnp.float32) + r[:, 0]) * csize
    y = g0.y_range[0] + (iy.astype(jnp.float32) + r[:, 1]) * csize
    boxes7 = jnp.stack([
        x, y, r[:, 2],
        jnp.exp(r[:, 3]), jnp.exp(r[:, 4]), jnp.exp(r[:, 5]),
        jnp.arctan2(r[:, 6], r[:, 7]),
    ], axis=-1)
    valid = scores > score_threshold
    return {"boxes7": boxes7, "scores": jnp.where(valid, scores, 0.0),
            "classes": cls, "valid": valid}


__all__ = ["CenterHead", "center_loss", "decode_center",
           "render_center_targets", "gaussian_radius",
           "penalty_reduced_focal"]
