"""Distributed YOLO training step: DP over frames + TP over conv channels.

The reference never trains -- it consumes pretrained ultralytics weights
(V1:14).  A production framework needs the training path, so this module
provides a jit-compiled train step for the Flax YOLO11 with:

* the v8-family detection loss under task-aligned assignment (TAL:
  per-GT top-k by score^alpha * IoU^beta, soft targets, stop-gradiented)
  -- BCE classification, IoU + distribution-focal box regression -- plus
  the Segment-head instance-mask BCE (proto x coefficients, box-cropped,
  area-normalized) when GT masks are provided; a simpler single-anchor
  center assigner remains selectable (assigner='center'),
* optax AdamW,
* mesh sharding: the image batch over ``data``; conv kernels (and their
  optimizer moments) tensor-parallel over ``model`` along output channels
  wherever divisible, replicated otherwise.  XLA inserts the ICI
  collectives.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct as flax_struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lidar_object_detection_tpu.models.yolo.model import (
    REG_MAX, STRIDES, Yolo11, YoloConfig)
from lidar_object_detection_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------

def _level_of(box_wh, strides=STRIDES):
    """Assign a target to a pyramid level by size: the level whose stride
    is closest to sqrt(area)/4 (small boxes -> P3, large -> P5)."""
    scale = jnp.sqrt(jnp.maximum(box_wh[..., 0] * box_wh[..., 1], 1e-6)) / 4.0
    dist = jnp.abs(jnp.log2(scale[..., None]
                            / jnp.asarray(strides, jnp.float32)))
    return jnp.argmin(dist, axis=-1)


def _anchor_centers(level_shapes, strides=STRIDES):
    """Anchor centers in letterbox pixels, flattened over levels: (N, 2),
    plus per-anchor strides (N,)."""
    import numpy as np

    pts, sts = [], []
    for (h, w), s in zip(level_shapes, strides):
        ys = (np.arange(h) + 0.5) * s
        xs = (np.arange(w) + 0.5) * s
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.ravel(), gy.ravel()], -1))
        sts.append(np.full(h * w, s, np.float32))
    return (jnp.asarray(np.concatenate(pts).astype(np.float32)),
            jnp.asarray(np.concatenate(sts)))


def task_aligned_assign(cls_logits, pred_boxes, targets, level_shapes,
                        topk: int = 10, alpha: float = 0.5,
                        beta: float = 6.0):
    """Task-aligned assignment (TOOD/ultralytics TAL): per GT, rank
    center-inside-box anchors by ``score^alpha * IoU^beta`` and take the
    top-k; anchors claimed by several GTs go to the highest-alignment one.

    Args:
      cls_logits: (N, nc) raw logits for ONE image.
      pred_boxes: (N, 4) decoded xyxy predictions (letterbox px).
      targets: dict with boxes (T, 4), classes (T,), valid (T,).

    Returns dict: assigned_gt (N,) int32, pos (N,) bool,
    norm_align (N,) float32 soft target scale in [0, 1].
    """
    tb = targets["boxes"].astype(jnp.float32)          # (T, 4)
    tvalid = targets["valid"]
    centers, _ = _anchor_centers(level_shapes)         # (N, 2)
    n = centers.shape[0]
    t = tb.shape[0]

    inside = ((centers[None, :, 0] >= tb[:, None, 0])
              & (centers[None, :, 0] <= tb[:, None, 2])
              & (centers[None, :, 1] >= tb[:, None, 1])
              & (centers[None, :, 1] <= tb[:, None, 3])
              & tvalid[:, None])                       # (T, N)

    from lidar_object_detection_tpu.geom.boxes import iou_2d_matrix

    iou = iou_2d_matrix(tb, pred_boxes)                # (T, N)
    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    cls_t = scores[:, targets["classes"]].T            # (T, N)
    align = (cls_t ** alpha) * (jnp.maximum(iou, 0.0) ** beta)
    align = jnp.where(inside, align, 0.0)

    k = min(topk, n)
    thresh = jax.lax.top_k(align, k)[0][:, -1:]        # (T, 1) kth value
    is_topk = (align >= jnp.maximum(thresh, 1e-9)) & inside & (align > 0)

    # conflict resolution: anchor belongs to the GT with max alignment
    masked_align = jnp.where(is_topk, align, -1.0)
    assigned_gt = jnp.argmax(masked_align, axis=0).astype(jnp.int32)  # (N,)
    best_align = jnp.max(masked_align, axis=0)
    pos = best_align > 0

    # soft target: per-GT normalize alignment by its max, scaled by max IoU
    per_gt_max_align = jnp.max(jnp.where(is_topk, align, 0.0), axis=1,
                               keepdims=True)
    per_gt_max_iou = jnp.max(jnp.where(is_topk, iou, 0.0), axis=1,
                             keepdims=True)
    norm = align / jnp.maximum(per_gt_max_align, 1e-9) * per_gt_max_iou
    norm_align = jnp.max(jnp.where(is_topk, norm, 0.0), axis=0)
    return {"assigned_gt": assigned_gt, "pos": pos,
            "norm_align": jnp.where(pos, norm_align, 0.0)}


def detection_loss(outputs, targets, num_classes: int,
                   level_shapes: Tuple[Tuple[int, int], ...],
                   cls_weight: float = 0.5, box_weight: float = 7.5,
                   dfl_weight: float = 1.5, assigner: str = "tal",
                   seg_weight: float = 1.0):
    """Compute the loss for one batch.

    Args:
      outputs: Yolo11 raw outputs (box/cls [+coef/proto ignored]).
      targets: dict with ``boxes`` (B, T, 4) xyxy in letterbox pixels,
        ``classes`` (B, T) int32, ``valid`` (B, T) bool.
      level_shapes: static (h, w) per level.
    """
    b = targets["boxes"].shape[0]
    strides = jnp.asarray(STRIDES, jnp.float32)
    level_offset = []
    off = 0
    for (h, w) in level_shapes:
        level_offset.append(off)
        off += h * w
    n_anchors = off
    level_offset = jnp.asarray(level_offset)
    level_w = jnp.asarray([w for (_, w) in level_shapes])

    box_flat = jnp.concatenate(
        [o.reshape(b, -1, 4 * REG_MAX) for o in outputs["box"]], 1)
    cls_flat = jnp.concatenate(
        [o.reshape(b, -1, o.shape[-1]) for o in outputs["cls"]], 1)

    if assigner == "tal":
        seg = None
        if "masks" in targets and "coef" in outputs:
            coef_flat = jnp.concatenate(
                [o.reshape(b, -1, o.shape[-1]) for o in outputs["coef"]], 1)
            seg = (outputs["proto"], coef_flat, targets["masks"])
        return _tal_loss(box_flat, cls_flat, targets, num_classes,
                         level_shapes, cls_weight, box_weight, dfl_weight,
                         seg=seg, seg_weight=seg_weight)

    tb = targets["boxes"].astype(jnp.float32)
    center = (tb[..., :2] + tb[..., 2:]) / 2
    wh = tb[..., 2:] - tb[..., :2]
    lvl = _level_of(wh)                                        # (B, T)
    stride_t = strides[lvl]
    cell = jnp.floor(center / stride_t[..., None]).astype(jnp.int32)
    lh = jnp.asarray([h for (h, _) in level_shapes])[lvl]
    lw = level_w[lvl]
    cx = jnp.clip(cell[..., 0], 0, lw - 1)
    cy = jnp.clip(cell[..., 1], 0, lh - 1)
    anchor_idx = level_offset[lvl] + cy * lw + cx              # (B, T)
    tvalid = targets["valid"]

    # --- classification: BCE over every anchor, one-hot at assignments ---
    cls_target = jnp.zeros((b, n_anchors, num_classes), jnp.float32)
    batch_ix = jnp.arange(b)[:, None]
    cls_target = cls_target.at[
        batch_ix, anchor_idx, targets["classes"]].max(
        tvalid.astype(jnp.float32))
    cls_logits = cls_flat.astype(jnp.float32)
    cls_loss = optax.sigmoid_binary_cross_entropy(cls_logits, cls_target)
    cls_loss = jnp.sum(cls_loss) / jnp.maximum(jnp.sum(tvalid), 1)

    # --- box regression at assigned anchors ---
    pred_bins = box_flat[batch_ix, anchor_idx].astype(jnp.float32)
    pred_dist = jax.nn.softmax(pred_bins.reshape(b, -1, 4, REG_MAX), -1)
    pred_ltrb = pred_dist @ jnp.arange(REG_MAX, dtype=jnp.float32)

    # anchor centers in letterbox px
    ax = (cx.astype(jnp.float32) + 0.5) * stride_t
    ay = (cy.astype(jnp.float32) + 0.5) * stride_t
    tgt_ltrb = jnp.stack([
        (ax - tb[..., 0]) / stride_t, (ay - tb[..., 1]) / stride_t,
        (tb[..., 2] - ax) / stride_t, (tb[..., 3] - ay) / stride_t], -1)
    tgt_ltrb = jnp.clip(tgt_ltrb, 0.0, REG_MAX - 1.01)

    # IoU loss on decoded boxes
    px1 = ax - pred_ltrb[..., 0] * stride_t
    py1 = ay - pred_ltrb[..., 1] * stride_t
    px2 = ax + pred_ltrb[..., 2] * stride_t
    py2 = ay + pred_ltrb[..., 3] * stride_t
    ix1 = jnp.maximum(px1, tb[..., 0])
    iy1 = jnp.maximum(py1, tb[..., 1])
    ix2 = jnp.minimum(px2, tb[..., 2])
    iy2 = jnp.minimum(py2, tb[..., 3])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    area_p = jnp.maximum(px2 - px1, 0) * jnp.maximum(py2 - py1, 0)
    area_t = jnp.maximum(wh[..., 0], 0) * jnp.maximum(wh[..., 1], 0)
    union = area_p + area_t - inter
    iou = inter / jnp.maximum(union, 1e-9)
    box_loss = jnp.sum((1.0 - iou) * tvalid) / jnp.maximum(jnp.sum(tvalid), 1)

    # DFL: cross-entropy against the two adjacent integer bins
    tl = jnp.floor(tgt_ltrb)
    wr = tgt_ltrb - tl
    wl = 1.0 - wr
    logp = jax.nn.log_softmax(pred_bins.reshape(b, -1, 4, REG_MAX), -1)
    tl_i = tl.astype(jnp.int32)
    gather = lambda idx: jnp.take_along_axis(logp, idx[..., None], -1)[..., 0]
    dfl = -(gather(tl_i) * wl + gather(jnp.minimum(tl_i + 1, REG_MAX - 1)) * wr)
    dfl = jnp.sum(jnp.mean(dfl, -1) * tvalid) / jnp.maximum(jnp.sum(tvalid), 1)

    total = cls_weight * cls_loss + box_weight * box_loss + dfl_weight * dfl
    return total, {"cls": cls_loss, "box": box_loss, "dfl": dfl}


def _tal_loss(box_flat, cls_flat, targets, num_classes, level_shapes,
              cls_weight, box_weight, dfl_weight, seg=None,
              seg_weight: float = 1.0):
    """Anchor-centric v8-style loss under task-aligned assignment:
    BCE classification with soft (alignment-normalized) targets, IoU +
    DFL regression on positives weighted by the soft target."""
    b, n, nc = cls_flat.shape
    centers, strides_n = _anchor_centers(level_shapes)    # (N, 2), (N,)

    dist = jax.nn.softmax(
        box_flat.reshape(b, n, 4, REG_MAX).astype(jnp.float32), -1)
    ltrb = dist @ jnp.arange(REG_MAX, dtype=jnp.float32)  # (B, N, 4) cells
    px1y1 = centers[None] - ltrb[..., :2] * strides_n[None, :, None]
    px2y2 = centers[None] + ltrb[..., 2:] * strides_n[None, :, None]
    pred_boxes = jnp.concatenate([px1y1, px2y2], -1)      # (B, N, 4)

    # assignment is a target-construction step: no gradients flow through
    # the alignment metric (ultralytics detaches it the same way)
    assign = jax.vmap(
        lambda cl, pb, tb, tc, tv: task_aligned_assign(
            cl, pb, {"boxes": tb, "classes": tc, "valid": tv},
            level_shapes))(
        jax.lax.stop_gradient(cls_flat),
        jax.lax.stop_gradient(pred_boxes),
        targets["boxes"], targets["classes"], targets["valid"])
    pos = assign["pos"]                                   # (B, N)
    soft = assign["norm_align"]                           # (B, N)
    agt = assign["assigned_gt"]                           # (B, N)

    gt_boxes = jnp.take_along_axis(
        targets["boxes"].astype(jnp.float32), agt[..., None], axis=1)
    gt_cls = jnp.take_along_axis(targets["classes"], agt, axis=1)

    # --- classification: BCE with soft targets (ultralytics v8 style) ---
    labels = jax.nn.one_hot(gt_cls, nc) * soft[..., None]
    cls_bce = optax.sigmoid_binary_cross_entropy(
        cls_flat.astype(jnp.float32), labels)
    norm = jnp.maximum(jnp.sum(soft), 1.0)
    cls_loss = jnp.sum(cls_bce) / norm

    # --- IoU loss on positives, weighted by the soft target ---
    ix1 = jnp.maximum(pred_boxes[..., 0], gt_boxes[..., 0])
    iy1 = jnp.maximum(pred_boxes[..., 1], gt_boxes[..., 1])
    ix2 = jnp.minimum(pred_boxes[..., 2], gt_boxes[..., 2])
    iy2 = jnp.minimum(pred_boxes[..., 3], gt_boxes[..., 3])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    area_p = (jnp.maximum(pred_boxes[..., 2] - pred_boxes[..., 0], 0)
              * jnp.maximum(pred_boxes[..., 3] - pred_boxes[..., 1], 0))
    area_g = ((gt_boxes[..., 2] - gt_boxes[..., 0])
              * (gt_boxes[..., 3] - gt_boxes[..., 1]))
    iou = inter / jnp.maximum(area_p + area_g - inter, 1e-9)
    w = soft * pos.astype(jnp.float32)
    box_loss = jnp.sum((1.0 - iou) * w) / norm

    # --- DFL on positives ---
    tgt_lt = (centers[None] - gt_boxes[..., :2]) / strides_n[None, :, None]
    tgt_rb = (gt_boxes[..., 2:] - centers[None]) / strides_n[None, :, None]
    tgt_ltrb = jnp.clip(jnp.concatenate([tgt_lt, tgt_rb], -1),
                        0.0, REG_MAX - 1.01)
    tl = jnp.floor(tgt_ltrb)
    wr = tgt_ltrb - tl
    wl = 1.0 - wr
    logp = jax.nn.log_softmax(
        box_flat.reshape(b, n, 4, REG_MAX).astype(jnp.float32), -1)
    tl_i = tl.astype(jnp.int32)
    gather = lambda idx: jnp.take_along_axis(logp, idx[..., None], -1)[..., 0]
    dfl = -(gather(tl_i) * wl
            + gather(jnp.minimum(tl_i + 1, REG_MAX - 1)) * wr)
    dfl_loss = jnp.sum(jnp.mean(dfl, -1) * w) / norm

    total = (cls_weight * cls_loss + box_weight * box_loss
             + dfl_weight * dfl_loss)
    parts = {"cls": cls_loss, "box": box_loss, "dfl": dfl_loss}
    if seg is not None:
        proto, coef_flat, gt_masks = seg
        seg_l = segmentation_loss(proto, coef_flat, assign, gt_masks,
                                  targets["boxes"], level_shapes)
        total = total + seg_weight * seg_l
        parts["seg"] = seg_l
    return total, parts


def segmentation_loss(proto, coef_flat, assign, gt_masks, gt_boxes,
                      level_shapes, max_pos: int = 64):
    """Instance-mask loss for the Segment head (ultralytics v8-seg style).

    For (up to) the ``max_pos`` highest-aligned positive anchors per image,
    predict the instance mask as sigmoid(coef . proto) at proto resolution
    and take the BCE against the assigned GT mask, cropped to the GT box
    and normalized by the box area.

    Args:
      proto: (B, Hp, Wp, nm) prototypes.
      coef_flat: (B, N, nm) per-anchor mask coefficients.
      assign: dict from the TAL assignment (pos, norm_align, assigned_gt).
      gt_masks: (B, T, Hp, Wp) float {0,1} GT instance masks at proto
        resolution (letterbox frame).
      gt_boxes: (B, T, 4) xyxy in letterbox pixels.
      level_shapes: static head shapes (for the letterbox->proto scale).
    """
    b, hp, wp, nm = proto.shape
    # letterbox -> proto-resolution scale (stride-4 prototypes)
    h0 = level_shapes[0][0] * STRIDES[0]
    scale = hp / h0

    # top max_pos positive anchors by soft target
    key = jnp.where(assign["pos"], assign["norm_align"], -1.0)   # (B, N)
    top_w, top_i = jax.lax.top_k(key, max_pos)                   # (B, K)
    sel_ok = top_w > 0
    coef = jnp.take_along_axis(coef_flat, top_i[..., None], axis=1)
    agt = jnp.take_along_axis(assign["assigned_gt"], top_i, axis=1)

    pred = jnp.einsum("bkn,bhwn->bkhw", coef.astype(jnp.float32),
                      proto.astype(jnp.float32))                 # logits

    tgt = jnp.take_along_axis(
        gt_masks.astype(jnp.float32), agt[..., None, None], axis=1)
    boxes = jnp.take_along_axis(gt_boxes.astype(jnp.float32),
                                agt[..., None], axis=1) * scale  # (B,K,4)

    bce = optax.sigmoid_binary_cross_entropy(pred, tgt)          # (B,K,H,W)
    xs = jnp.arange(wp, dtype=jnp.float32)[None, None, None, :]
    ys = jnp.arange(hp, dtype=jnp.float32)[None, None, :, None]
    in_box = ((xs >= boxes[..., 0, None, None])
              & (xs < boxes[..., 2, None, None])
              & (ys >= boxes[..., 1, None, None])
              & (ys < boxes[..., 3, None, None]))
    area = jnp.maximum(jnp.sum(in_box.astype(jnp.float32), (-2, -1)), 1.0)
    per_inst = jnp.sum(bce * in_box.astype(jnp.float32), (-2, -1)) / area
    w = sel_ok.astype(jnp.float32) * top_w
    return jnp.sum(per_inst * w) / jnp.maximum(jnp.sum(w), 1.0)


# ---------------------------------------------------------------------------
# Train state + sharded step
# ---------------------------------------------------------------------------

@flax_struct.dataclass
class TrainState:
    variables: Any          # {'params': ..., 'batch_stats': ...}
    opt_state: Any
    step: Any
    # exponential moving average of `variables` (None when disabled);
    # serving the EMA weights is the standard detector-distillation
    # fidelity win -- updated inside the jitted step, so it costs one
    # fused multiply-add sweep on device and no host traffic
    ema_variables: Any = None


def param_shardings(mesh: Mesh, variables) -> Any:
    """TP rule: shard conv-kernel output channels over ``model`` when
    divisible by the axis size; everything else replicated."""
    tp = mesh.shape[MODEL_AXIS]

    def rule(path, value):
        leaf = path[-1].key if hasattr(path[-1], "key") else None
        if (leaf == "kernel" and value.ndim == 4
                and value.shape[-1] % tp == 0 and tp > 1):
            return NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, variables)


class YoloTrainer:
    def __init__(self, cfg: YoloConfig, mesh: Mesh,
                 image_size: Tuple[int, int] = (192, 640),
                 max_targets: int = 32,
                 learning_rate: float = 1e-3, weight_decay: float = 5e-4,
                 seg_weight: float = 1.0, ema_decay: float = 0.0,
                 dtype: Any = jnp.float32, seed: int = 0):
        self.cfg = cfg
        self.mesh = mesh
        self.model = Yolo11(cfg, dtype=dtype)
        self.image_size = image_size
        self.level_shapes = tuple(
            (image_size[0] // s, image_size[1] // s) for s in STRIDES)
        self.tx = optax.adamw(learning_rate, weight_decay=weight_decay)

        dummy = jnp.zeros((1, *image_size, 3), dtype)
        # jitted init: eager flax init dispatches every layer op
        # individually (~10x slower on CPU, relay-bound on TPU)
        variables = jax.jit(functools.partial(self.model.init, train=False))(
            jax.random.PRNGKey(seed), dummy)
        self.var_shardings = param_shardings(mesh, variables)
        variables = jax.device_put(variables, self.var_shardings)
        params = variables["params"]
        opt_state = self.tx.init(params)
        self.ema_decay = float(ema_decay)
        ema = variables if self.ema_decay > 0 else None
        self.state = TrainState(variables=variables, opt_state=opt_state,
                                step=jnp.zeros((), jnp.int32),
                                ema_variables=ema)

        data_spec = NamedSharding(mesh, P(DATA_AXIS))
        self._step = jax.jit(
            functools.partial(_train_step, model=self.model, tx=self.tx,
                              num_classes=cfg.num_classes,
                              level_shapes=self.level_shapes,
                              seg_weight=seg_weight,
                              ema_decay=self.ema_decay))

    def train_step(self, images, targets) -> Dict[str, Any]:
        """One optimizer step.  images (B, H, W, 3) in [0,1]; targets dict
        of boxes/classes/valid.  B must divide the data-axis size."""
        put = lambda a: jax.device_put(
            jnp.asarray(a),
            NamedSharding(self.mesh, P(DATA_AXIS,
                                       *([None] * (jnp.asarray(a).ndim - 1)))))
        images = put(images)
        targets = {k: put(v) for k, v in targets.items()}
        self.state, metrics = self._step(self.state, images, targets)
        return metrics


def _train_step(state: TrainState, images, targets, *, model: Yolo11,
                tx, num_classes: int, level_shapes,
                seg_weight: float = 1.0, ema_decay: float = 0.0):
    variables = state.variables
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, updates = model.apply({"params": p, **rest}, images, train=True,
                                   mutable=["batch_stats"])
        loss, parts = detection_loss(out, targets, num_classes, level_shapes,
                                     seg_weight=seg_weight)
        return loss, (parts, updates)

    (loss, (parts, updates)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    updates_tx, opt_state = tx.update(grads, state.opt_state, params)
    params = optax.apply_updates(params, updates_tx)
    new_vars = {"params": params, **rest}
    new_vars.update(updates)
    step = state.step + 1
    ema = state.ema_variables
    if ema is not None and ema_decay > 0:
        # warmup-ramped decay (min(d, (1+t)/(10+t))): early steps track the
        # raw weights so a short run is not stuck at the init average
        d = jnp.minimum(ema_decay, (1.0 + step) / (10.0 + step))
        ema = jax.tree_util.tree_map(
            lambda e, v: e * d + v.astype(e.dtype) * (1.0 - d),
            ema, new_vars)
    new_state = TrainState(variables=new_vars, opt_state=opt_state,
                           step=step, ema_variables=ema)
    metrics = {"loss": loss, **parts, "step": new_state.step}
    return new_state, metrics
