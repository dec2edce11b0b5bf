"""Pallas TPU kernel: greedy NMS entirely in VMEM.

The XLA implementation (:mod:`lidar_object_detection_tpu.ops.nms`) runs the
slot-selection loop as ~max_outputs separate fused ops with HBM-visible
state; this kernel keeps the whole problem on-chip -- the (N, N) IoU matrix
(256 KB at N=256), the alive mask, and the selection loop all live in VMEM,
so each of the max_outputs sequential steps is one argmax + one masked
update with no per-step dispatch.

Semantics identical to ops.nms (same tests): stable descending order via
argmax first-occurrence, NaN scores dropped, strictly-greater suppression.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(max_outputs: int, iou_threshold: float,
                boxes_ref, scores_ref, valid_ref, idx_ref, keep_ref,
                iou_scratch, alive_scratch):
    # boxes: (4, N) / scores, valid: (1, N) / outputs: (1, M)
    x1, y1, x2, y2 = (boxes_ref[0], boxes_ref[1], boxes_ref[2], boxes_ref[3])
    n = x1.shape[0]
    xi = jnp.maximum(x1[:, None], x1[None, :])
    yi = jnp.maximum(y1[:, None], y1[None, :])
    xa = jnp.minimum(x2[:, None], x2[None, :])
    ya = jnp.minimum(y2[:, None], y2[None, :])
    iw = xa - xi
    ih = ya - yi
    inter = jnp.where((iw <= 0) | (ih <= 0), 0.0, iw * ih)
    area = (x2 - x1) * (y2 - y1)
    union = area[:, None] + area[None, :] - inter
    iou_scratch[:] = jnp.where(union > 0, inter / union, 0.0)

    neg = jnp.float32(-jnp.inf)
    scores = scores_ref[0]
    finite = valid_ref[0] & jnp.isfinite(scores)
    base = jnp.where(finite, scores.astype(jnp.float32), neg)
    alive_scratch[:] = jnp.where(finite[None, :], 1.0, 0.0)

    idx_ref[:] = jnp.zeros_like(idx_ref)
    keep_ref[:] = jnp.zeros_like(keep_ref)

    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, max_outputs), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)

    def body(slot, _):
        alive = alive_scratch[0] > 0.5
        masked = jnp.where(alive, base, neg)
        best = jnp.argmax(masked).astype(jnp.int32)
        ok = jnp.max(masked) > neg       # no array dynamic_slice in Mosaic
        idx_ref[:] = jnp.where(slot_ids == slot,
                               jnp.where(ok, best, 0), idx_ref[:])
        keep_ref[:] = jnp.where(slot_ids == slot,
                                jnp.where(ok, 1, 0), keep_ref[:])
        row = iou_scratch[pl.ds(best, 1), :][0]        # ref dynamic slice OK
        suppress = (row > iou_threshold) | (col_ids == best)
        new_alive = jnp.where(ok & suppress, 0.0, alive_scratch[0])
        alive_scratch[:] = new_alive[None, :]
        return 0

    jax.lax.fori_loop(0, max_outputs, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("iou_threshold", "max_outputs",
                                    "interpret"))
def pallas_nms(boxes, scores, valid, iou_threshold: float,
               max_outputs: int, interpret: bool = False):
    """Drop-in for :func:`lidar_object_detection_tpu.ops.nms.nms`."""
    n = boxes.shape[0]
    idx, keep = pl.pallas_call(
        functools.partial(_nms_kernel, max_outputs, iou_threshold),
        in_specs=[
            pl.BlockSpec((4, n), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, max_outputs), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max_outputs), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, max_outputs), jnp.int32),
            jax.ShapeDtypeStruct((1, max_outputs), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(boxes.T.astype(jnp.float32),
      scores.reshape(1, n).astype(jnp.float32),
      valid.reshape(1, n))
    return idx[0], keep[0].astype(bool)
