"""Distributed YOLO training step: DP over frames + TP over conv channels.

The reference never trains -- it consumes pretrained ultralytics weights
(V1:14).  A production framework needs the training path, so this module
provides a jit-compiled train step for the Flax YOLO11 with:

* a detection/segmentation loss (BCE classification over all anchors,
  CIoU-style box loss + distribution-focal loss on assigned anchors; a
  single-anchor center assigner stands in for ultralytics' task-aligned
  assigner -- simple, differentiable, and sufficient for convergence on
  fine-tuning workloads),
* optax AdamW,
* mesh sharding: the image batch over ``data``; conv kernels (and their
  optimizer moments) tensor-parallel over ``model`` along output channels
  wherever divisible, replicated otherwise.  XLA inserts the ICI
  collectives.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

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


def detection_loss(outputs, targets, num_classes: int,
                   level_shapes: Tuple[Tuple[int, int], ...],
                   cls_weight: float = 0.5, box_weight: float = 7.5,
                   dfl_weight: float = 1.5):
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


# ---------------------------------------------------------------------------
# Train state + sharded step
# ---------------------------------------------------------------------------

@flax_struct.dataclass
class TrainState:
    variables: Any          # {'params': ..., 'batch_stats': ...}
    opt_state: Any
    step: Any


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
                 dtype: Any = jnp.float32, seed: int = 0):
        self.cfg = cfg
        self.mesh = mesh
        self.model = Yolo11(cfg, dtype=dtype)
        self.image_size = image_size
        self.level_shapes = tuple(
            (image_size[0] // s, image_size[1] // s) for s in STRIDES)
        self.tx = optax.adamw(learning_rate, weight_decay=weight_decay)

        dummy = jnp.zeros((1, *image_size, 3), dtype)
        variables = self.model.init(jax.random.PRNGKey(seed), dummy,
                                    train=False)
        self.var_shardings = param_shardings(mesh, variables)
        variables = jax.device_put(variables, self.var_shardings)
        params = variables["params"]
        opt_state = self.tx.init(params)
        self.state = TrainState(variables=variables, opt_state=opt_state,
                                step=jnp.zeros((), jnp.int32))

        data_spec = NamedSharding(mesh, P(DATA_AXIS))
        self._step = jax.jit(
            functools.partial(_train_step, model=self.model, tx=self.tx,
                              num_classes=cfg.num_classes,
                              level_shapes=self.level_shapes))

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
                tx, num_classes: int, level_shapes):
    variables = state.variables
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, updates = model.apply({"params": p, **rest}, images, train=True,
                                   mutable=["batch_stats"])
        loss, parts = detection_loss(out, targets, num_classes, level_shapes)
        return loss, (parts, updates)

    (loss, (parts, updates)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    updates_tx, opt_state = tx.update(grads, state.opt_state, params)
    params = optax.apply_updates(params, updates_tx)
    new_vars = {"params": params, **rest}
    new_vars.update(updates)
    new_state = TrainState(variables=new_vars, opt_state=opt_state,
                           step=state.step + 1)
    metrics = {"loss": loss, **parts, "step": new_state.step}
    return new_state, metrics
