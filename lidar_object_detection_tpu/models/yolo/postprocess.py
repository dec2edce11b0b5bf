"""YOLO decode + NMS + retina-mask assembly, fixed-shape and jitted.

Replaces everything ultralytics does inside ``model.predict(..., classes=2,
retina_masks=True)`` (V1_BBox_Pointwise_filtering.py:57): letterbox
preprocessing, DFL box decoding, confidence gating, class filtering, NMS,
coordinate un-letterboxing, and native-resolution mask assembly
(``process_mask_native`` semantics: sigmoid(coef @ protos) -> remove
letterbox padding -> bilinear resize to the original image -> crop to the
box -> threshold 0.5).

TPU idioms: every stage has a static shape (top-K candidate gather, padded
detection slots with validity masks); the final instance masks are emitted
directly as the uint32 bit-plane image
(:mod:`lidar_object_detection_tpu.ops.masks`) the fusion stage consumes, so
masks never round-trip through a ragged per-instance representation.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from lidar_object_detection_tpu.models.yolo.model import REG_MAX, STRIDES
from lidar_object_detection_tpu.ops.nms import nms


@dataclasses.dataclass(frozen=True)
class LetterboxSpec:
    """Static letterbox geometry (ultralytics ``LetterBox`` with
    ``auto=True``, stride 32): scale the long side to ``imgsz``, pad the
    short side up to the next stride multiple, split padding evenly with
    the reference's round(x -/+ 0.1) tie-break."""

    src_h: int
    src_w: int
    dst_h: int
    dst_w: int
    scaled_h: int
    scaled_w: int
    top: int
    left: int
    ratio: float

    @staticmethod
    def build(src_h: int, src_w: int, imgsz: int = 640,
              stride: int = 32) -> "LetterboxSpec":
        r = min(imgsz / src_h, imgsz / src_w)
        new_w, new_h = round(src_w * r), round(src_h * r)
        dw = (-new_w) % stride
        dh = (-new_h) % stride
        dw2, dh2 = dw / 2, dh / 2
        top = int(round(dh2 - 0.1))
        left = int(round(dw2 - 0.1))
        return LetterboxSpec(
            src_h=src_h, src_w=src_w, dst_h=new_h + dh, dst_w=new_w + dw,
            scaled_h=new_h, scaled_w=new_w, top=top, left=left, ratio=r)


def letterbox_image(image, spec: LetterboxSpec, pad_value: float = 114 / 255):
    """(H0, W0, 3) float [0,1] -> (dst_h, dst_w, 3) letterboxed."""
    resized = jax.image.resize(
        image, (spec.scaled_h, spec.scaled_w, 3), method="bilinear")
    out = jnp.full((spec.dst_h, spec.dst_w, 3), pad_value, image.dtype)
    return jax.lax.dynamic_update_slice(out, resized, (spec.top, spec.left, 0))


def _anchors(level_shapes: Tuple[Tuple[int, int], ...], dtype=jnp.float32):
    """Anchor centers (cell + 0.5) and per-anchor strides, flattened over
    all levels."""
    points, strides = [], []
    for (h, w), s in zip(level_shapes, STRIDES):
        ys = (jnp.arange(h, dtype=dtype) + 0.5)
        xs = (jnp.arange(w, dtype=dtype) + 0.5)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        points.append(jnp.stack([gx.ravel(), gy.ravel()], -1))
        strides.append(jnp.full((h * w,), s, dtype))
    return jnp.concatenate(points, 0), jnp.concatenate(strides, 0)


def decode_boxes(box_logits, level_shapes):
    """DFL decode -> xyxy in letterbox pixels.

    Args:
      box_logits: (N, 4 * REG_MAX) flattened over levels.
      level_shapes: static ((h, w), ...) per level.
    """
    n = box_logits.shape[0]
    dist = jax.nn.softmax(
        box_logits.reshape(n, 4, REG_MAX).astype(jnp.float32), axis=-1)
    dist = dist @ jnp.arange(REG_MAX, dtype=jnp.float32)       # (N, 4) ltrb
    points, strides = _anchors(level_shapes)
    lt, rb = dist[:, :2], dist[:, 2:]
    x1y1 = (points - lt) * strides[:, None]
    x2y2 = (points + rb) * strides[:, None]
    return jnp.concatenate([x1y1, x2y2], -1)


def unletterbox_boxes(boxes, spec: LetterboxSpec):
    """Letterbox pixels -> original-image pixels, clipped (scale_boxes)."""
    shift = jnp.asarray([spec.left, spec.top, spec.left, spec.top],
                        boxes.dtype)
    out = (boxes - shift) / spec.ratio
    limit = jnp.asarray([spec.src_w, spec.src_h, spec.src_w, spec.src_h],
                        boxes.dtype)
    return jnp.clip(out, 0.0, limit)


@dataclasses.dataclass(frozen=True)
class PostprocessParams:
    spec: LetterboxSpec
    conf_threshold: float = 0.25
    iou_threshold: float = 0.7
    class_id: int = 2            # car (V1:57)
    max_candidates: int = 256
    max_detections: int = 32
    retina_masks: bool = True
    # instance-mask binarization threshold (ultralytics hardcodes 0.5 in
    # process_mask_native).  Raising it shrinks predicted masks toward
    # their confident core -- a serving-side precision/recall knob for the
    # inside-% metric (see examples/quality_knob_sweep.py).
    mask_threshold: float = 0.5
    # how mask_threshold is applied: "absolute" (ultralytics -- one fixed
    # cut for every instance) or "relative" (cut at threshold x the
    # detection's own peak in-box probability, so a soft-boundary
    # instance whose peak never reaches a high absolute cut keeps a mask
    # instead of vanishing; bilinear upsampling cannot exceed proto-cell
    # maxima, so the peak is well-defined on the upsampled field).
    # "relative" requires mask_upsample="prob" (a peak of raw logits has
    # no comparable scale) and the XLA assembly path (the Pallas kernel
    # bakes one static threshold).
    mask_threshold_mode: str = "absolute"
    # guarded shrink: when set, a detection whose mask_threshold cut
    # leaves fewer than mask_min_pixels pixels falls back to this lower
    # cut instead of serving a near-empty mask (the failure that unmatches
    # small cars at high thresholds -- fusion's >=10-LiDAR-point gate,
    # associate.py).  None = plain single-threshold behavior.  Requires
    # mask_upsample="prob"; served by both the XLA path and the Pallas
    # kernel (count pass + per-detection cuts, ops/pallas_masks.py).
    mask_threshold_floor: float | None = None
    mask_min_pixels: int = 0
    # where the bilinear upsample interpolates: "prob" (ultralytics --
    # sigmoid at proto res, interpolate probabilities) or "logit"
    # (interpolate logits, threshold at logit(mask_threshold)); logit
    # space keeps boundaries sharper where logits swing hard across a
    # proto cell
    mask_upsample: str = "prob"
    # mask assembly backend: "auto" uses the fused Pallas kernel on TPU
    # (ops/pallas_masks.py -- no (D, H, W) float stack in HBM, exact f32)
    # and the XLA resize elsewhere; "xla" / "pallas" force a backend.
    # Default stays "xla" until the kernel's Mosaic lowering is validated
    # on a real chip (interpret-mode parity is green; see ops/pallas_masks).
    mask_assembly: str = "xla"
    # bf16 mask upsampling halves the HBM traffic of the (D, H, W) resize;
    # pixels whose bilinear value sits within bf16 epsilon of the 0.5
    # threshold may flip vs the f32 path -- opt-in for serving throughput.
    fast_masks: bool = False
    # "xla" (default) = slot-selection loop, lockstep over the vmapped
    # batch; "pallas" = ops/pallas_nms.py, all-VMEM single kernel --
    # identical results, faster single-frame, slower under vmap (the
    # Pallas grid serializes the batch: 1.26 vs 0.85 ms for 19 frames
    # on v5e).
    nms_impl: str = "xla"
    # also emit the kept detections' mask coefficients ("coef", (D, nm))
    # so downstream consumers can re-compose probability fields from the
    # protos (multi-view mask ensembling, introspection); the serving
    # path never reads it.
    emit_coef: bool = False


def postprocess_single(outputs, params: PostprocessParams):
    """Decode one image's raw network outputs.

    Args:
      outputs: dict from ``Yolo11.__call__`` with leading batch dim of 1
        removed per level (each level (h, w, C)).
      params: static decode parameters.

    Returns dict:
      boxes: (D, 4) xyxy in original-image pixels,
      scores: (D,), det_valid: (D,) bool (confidence-sorted, like the
      reference's sort at V1:69-72),
      mask_bits: (H0, W0) uint32 packed instance masks (zeros when the
      model head has no mask branch).
    """
    p = params
    spec = p.spec
    level_shapes = tuple(b.shape[:2] for b in outputs["box"])

    box_flat = jnp.concatenate(
        [b.reshape(-1, 4 * REG_MAX) for b in outputs["box"]], 0)
    cls_flat = jnp.concatenate(
        [c.reshape(-1, c.shape[-1]) for c in outputs["cls"]], 0)

    scores = jax.nn.sigmoid(
        cls_flat[:, p.class_id].astype(jnp.float32))           # (N,)
    # Static top-K candidate gather (replaces the dynamic conf filter).
    k = min(p.max_candidates, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    cand_valid = top_scores > p.conf_threshold

    boxes_lb = decode_boxes(box_flat, level_shapes)[top_idx]
    if p.nms_impl == "pallas":
        from lidar_object_detection_tpu.ops.pallas_nms import pallas_nms
        keep_idx, keep_valid = pallas_nms(boxes_lb, top_scores, cand_valid,
                                          p.iou_threshold, p.max_detections)
    else:
        keep_idx, keep_valid = nms(boxes_lb, top_scores, cand_valid,
                                   p.iou_threshold, p.max_detections)

    det_boxes_lb = boxes_lb[keep_idx]
    det_scores = jnp.where(keep_valid, top_scores[keep_idx], 0.0)
    det_boxes = unletterbox_boxes(det_boxes_lb, spec)
    det_boxes = jnp.where(keep_valid[:, None], det_boxes, 0.0)

    out = {"boxes": det_boxes, "scores": det_scores, "det_valid": keep_valid}

    if "coef" in outputs and p.retina_masks:
        coef_flat = jnp.concatenate(
            [c.reshape(-1, c.shape[-1]) for c in outputs["coef"]], 0)
        det_coef = coef_flat[top_idx][keep_idx]                # (D, nm)
        if p.emit_coef:
            out["coef"] = det_coef
        out["mask_bits"] = _assemble_masks(
            outputs["proto"], det_coef, det_boxes, keep_valid, spec,
            fast=p.fast_masks, impl=p.mask_assembly,
            threshold=p.mask_threshold, upsample=p.mask_upsample,
            threshold_mode=p.mask_threshold_mode,
            floor=p.mask_threshold_floor, min_pixels=p.mask_min_pixels)
    else:
        out["mask_bits"] = jnp.zeros((spec.src_h, spec.src_w), jnp.uint32)
    return out


def _proto_crop_bounds(mh: int, mw: int, spec: LetterboxSpec):
    """scale_masks' letterbox-padding removal, computed at mask (proto)
    resolution: the (top, bottom, left, right) slice bounds of the
    image-content region inside the (mh, mw) proto grid."""
    gain = min(mh / spec.src_h, mw / spec.src_w)
    pad_w = (mw - spec.src_w * gain) / 2
    pad_h = (mh - spec.src_h * gain) / 2
    top = int(round(pad_h - 0.1))
    left = int(round(pad_w - 0.1))
    bottom = mh - int(round(pad_h + 0.1))
    right = mw - int(round(pad_w + 0.1))
    return top, bottom, left, right


def mask_prob_fields(protos, coef, spec: LetterboxSpec):
    """(D, H0, W0) float32 mask probability fields: sigmoid(coef @ protos),
    letterbox padding stripped at proto resolution, bilinear-resized to the
    original image — exactly the field the prob-space XLA assembly
    thresholds, BEFORE the box crop and binarization.  Exposed for
    multi-view mask ensembling (e.g. flip-TTA averaging,
    examples/quality_flip_probe.py) and introspection; the serving path
    itself never materializes this stack through this entry point."""
    mh, mw, _ = protos.shape
    d = coef.shape[0]
    probs = jax.nn.sigmoid(
        jnp.einsum("dn,hwn->dhw", coef.astype(jnp.float32),
                   protos.astype(jnp.float32)))
    top, bottom, left, right = _proto_crop_bounds(mh, mw, spec)
    probs = probs[:, top:bottom, left:right]
    return jax.image.resize(probs, (d, spec.src_h, spec.src_w),
                            method="bilinear")


def pack_thresholded_masks(fields, boxes, det_valid, threshold: float,
                           floor: float | None = None, min_pixels: int = 0):
    """Binarize (D, H0, W0) probability fields at ``threshold``, crop to
    each detection's box, apply the guarded-shrink floor, and pack to the
    (H0, W0) uint32 bit-plane image — the tail of the prob-space XLA
    assembly (``_assemble_masks``; bit-parity pinned by
    tests/test_yolo.py), exposed so ensembling experiments that build
    their own probability fields (:func:`mask_prob_fields`) share the
    serving binarization exactly."""
    d, h, w = fields.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x1 = boxes[:, 0][:, None, None]
    y1 = boxes[:, 1][:, None, None]
    x2 = boxes[:, 2][:, None, None]
    y2 = boxes[:, 3][:, None, None]
    in_box = (xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
    binary = (fields > threshold) & in_box & det_valid[:, None, None]
    if floor is not None:
        low = (fields > floor) & in_box & det_valid[:, None, None]
        keep_hi = jnp.sum(binary, axis=(1, 2)) >= min_pixels      # (D,)
        binary = jnp.where(keep_hi[:, None, None], binary, low)
    weights = (jnp.uint32(1) << jnp.arange(d, dtype=jnp.uint32))
    return jnp.sum(binary.astype(jnp.uint32) * weights[:, None, None],
                   axis=0, dtype=jnp.uint32)


def _assemble_masks(protos, coef, boxes, det_valid, spec: LetterboxSpec,
                    fast: bool = False, impl: str = "xla",
                    threshold: float = 0.5, upsample: str = "prob",
                    threshold_mode: str = "absolute",
                    floor: float | None = None, min_pixels: int = 0):
    """``process_mask_native``: sigmoid(coef @ protos), strip letterbox
    padding at proto resolution, bilinear-resize to the original image,
    crop to each box, threshold (0.5 default) -- emitted as packed uint32
    bits.  ``upsample="logit"`` interpolates the logits instead and
    thresholds at logit(threshold) -- identical at proto-cell centers,
    sharper in between."""
    if upsample not in ("prob", "logit"):
        raise ValueError(f"mask_upsample must be 'prob' or 'logit', "
                         f"got {upsample!r}")
    if threshold_mode not in ("absolute", "relative"):
        raise ValueError(f"mask_threshold_mode must be 'absolute' or "
                         f"'relative', got {threshold_mode!r}")
    if threshold_mode == "relative":
        if upsample != "prob":
            raise ValueError(
                "mask_threshold_mode='relative' needs mask_upsample="
                "'prob': a fraction of the per-instance peak is only "
                "meaningful on the [0, 1] probability field")
        if impl == "pallas":
            raise ValueError(
                "mask_threshold_mode='relative' needs the XLA assembly "
                "path: the Pallas kernel bakes one static threshold "
                "(ops/pallas_masks.py)")
        impl = "xla"    # 'auto' falls back: per-instance cut, not static
    if floor is not None:
        if not floor < threshold:
            raise ValueError(
                f"mask_threshold_floor ({floor}) must sit below "
                f"mask_threshold ({threshold}) -- it is the fallback cut "
                f"for detections the primary cut leaves near-empty")
        if upsample != "prob":
            raise ValueError(
                "mask_threshold_floor needs mask_upsample='prob' (the "
                "floor compares on the same probability field)")
        if threshold_mode != "absolute":
            raise ValueError(
                "mask_threshold_floor needs mask_threshold_mode="
                "'absolute': with a relative primary cut the absolute "
                "floor can sit ABOVE a soft detection's effective cut, "
                "shrinking the mask the guard was meant to save")
        if min_pixels < 1:
            raise ValueError(
                f"mask_threshold_floor needs mask_min_pixels >= 1 "
                f"(got {min_pixels}): with no pixel guard the floor can "
                f"never fire and only doubles the assembly cost")
    mh, mw, nm = protos.shape
    logits = jnp.einsum("dn,hwn->dhw", coef.astype(jnp.float32),
                        protos.astype(jnp.float32))
    if upsample == "logit":
        import math

        if not 0.0 < threshold < 1.0:
            raise ValueError(
                f"logit-space interpolation needs mask_threshold in "
                f"(0, 1), got {threshold} (logit(t) is unbounded at the "
                f"endpoints)")
        masks = logits                                          # (D, mh, mw)
        threshold = math.log(threshold / (1.0 - threshold))
    else:
        masks = jax.nn.sigmoid(logits)                          # (D, mh, mw)

    top, bottom, left, right = _proto_crop_bounds(mh, mw, spec)
    masks = masks[:, top:bottom, left:right]
    return _finish_masks(masks, boxes, det_valid, spec, fast=fast,
                         impl=impl, threshold=threshold,
                         threshold_mode=threshold_mode, floor=floor,
                         min_pixels=min_pixels)


def cropped_prob_table(protos, coef, spec: LetterboxSpec):
    """(D, mh_c, mw_c) float32 sigmoid mask table at proto resolution,
    letterbox padding stripped — the pre-upsample half of the prob-space
    assembly.  Bilinear upsampling is LINEAR, so consensus modes (e.g.
    the hflip-TTA field average, models/yolo/tta.py) can average THESE
    tiny tables and feed one table to :func:`_finish_masks` instead of
    averaging two (D, H0, W0) float stacks — which also lets the fused
    stack-free Pallas kernel (ops/pallas_masks.py) serve the consensus
    unchanged."""
    mh, mw, _ = protos.shape
    probs = jax.nn.sigmoid(
        jnp.einsum("dn,hwn->dhw", coef.astype(jnp.float32),
                   protos.astype(jnp.float32)))
    top, bottom, left, right = _proto_crop_bounds(mh, mw, spec)
    return probs[:, top:bottom, left:right]


def _finish_masks(masks, boxes, det_valid, spec: LetterboxSpec,
                  fast: bool = False, impl: str = "xla",
                  threshold: float = 0.5,
                  threshold_mode: str = "absolute",
                  floor: float | None = None, min_pixels: int = 0):
    """Upsample + threshold + box-crop + bit-pack a cropped proto-res mask
    table (the tail of ``_assemble_masks``; ``threshold``/``floor`` are
    already in the table's space).  Dispatches to the fused Pallas kernel
    when requested/available, else the XLA resize path."""
    d = masks.shape[0]
    cropped_h, cropped_w = masks.shape[1], masks.shape[2]

    use_pallas = False
    # the fused kernel bakes the (already space-transformed) threshold as
    # a compile-time constant, so it serves both upsample spaces and any
    # operating point
    if impl != "xla":
        from lidar_object_detection_tpu.ops import pallas_masks
        use_pallas = impl == "pallas" or (
            impl == "auto" and jax.default_backend() == "tpu"
            and pallas_masks.supported(d, spec.src_h, spec.src_w,
                                       cropped_h, cropped_w))
    if use_pallas:
        # fused upsample+threshold+crop+pack: no (D, H, W) float stack in
        # HBM and exact f32 regardless of `fast` (the bf16 shortcut exists
        # only to shrink the XLA path's stack)
        interp = jax.default_backend() != "tpu"
        if floor is not None:
            # guarded shrink: stack-free count pass + per-detection cuts
            return pallas_masks.pallas_assemble_masks_guarded(
                masks, boxes, det_valid, spec.src_h, spec.src_w,
                threshold=threshold, floor=floor, min_pixels=min_pixels,
                interpret=interp)
        return pallas_masks.pallas_assemble_masks(
            masks, boxes, det_valid, spec.src_h, spec.src_w,
            threshold=threshold,
            interpret=interp)

    if fast:
        masks = masks.astype(jnp.bfloat16)
    masks = jax.image.resize(masks, (d, spec.src_h, spec.src_w),
                             method="bilinear")

    ys = jnp.arange(spec.src_h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(spec.src_w, dtype=jnp.float32)[None, None, :]
    x1 = boxes[:, 0][:, None, None]
    y1 = boxes[:, 1][:, None, None]
    x2 = boxes[:, 2][:, None, None]
    y2 = boxes[:, 3][:, None, None]
    in_box = (xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
    if threshold_mode == "relative":
        # per-instance cut: threshold x that detection's peak in-box
        # probability (an empty/invalid box peaks at 0, and 0 > 0 is
        # False, so it still emits no bits)
        peak = jnp.max(jnp.where(in_box, masks, 0), axis=(1, 2))   # (D,)
        cut = (threshold * peak)[:, None, None]
    else:
        cut = threshold
    binary = (masks > cut) & in_box & det_valid[:, None, None]
    if floor is not None:
        # guarded shrink: detections the primary cut leaves near-empty
        # (< min_pixels) serve the floor cut instead -- one reduction and
        # a per-detection select on fields already in registers
        low = (masks > floor) & in_box & det_valid[:, None, None]
        keep_hi = jnp.sum(binary, axis=(1, 2)) >= min_pixels      # (D,)
        binary = jnp.where(keep_hi[:, None, None], binary, low)

    weights = (jnp.uint32(1) << jnp.arange(d, dtype=jnp.uint32))
    return jnp.sum(binary.astype(jnp.uint32) * weights[:, None, None],
                   axis=0, dtype=jnp.uint32)
