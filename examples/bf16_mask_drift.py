"""Quantify the f32-vs-bf16 retina-mask assembly drift (fast_masks flag).

``PostprocessParams.fast_masks`` upsamples the (D, H, W) instance masks in
bfloat16, halving the HBM traffic of the most expensive postprocess stage;
pixels whose bilinear value lands within bf16 epsilon of the 0.5 threshold
may flip.  This script measures, on the bundled 20-frame sample:

  1. mask-pixel flip rate (f32 vs bf16 assembly, same detections),
  2. the downstream effect on per-car fusion counts (inside/total deltas).

Two measurements:

  A. **Synthetic saturated masks** (the meaningful one): car-like
     elliptical masks with a logistic edge profile are injected through
     the exact ``_assemble_masks`` path (identity mask coefficients, so
     sigmoid(coef @ protos) reproduces the injected probabilities).
     Real segmentation masks are saturated (~0 / ~1) away from a 1-2
     proto-pixel boundary band; only bilinear outputs within bf16
     epsilon of the 0.5 threshold can flip, so the flip rate per
     boundary-band pixel is the statistic that transfers to real
     weights.
  B. The random-weight detector end to end -- DEGENERATE by
     construction: random proto x coef logits are ~0 everywhere, i.e.
     every pixel sits exactly at the 0.5 threshold, so flips count noise,
     not drift (reported for completeness; see "degenerate" fields).

Writes one JSON line; run on the TPU chip.
"""

import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lidar_object_detection_tpu.config import (FusionConfig,
                                                   PipelineVersion)
    from lidar_object_detection_tpu.data import Kitti360Dataset
    from lidar_object_detection_tpu.fusion import FusionParams, fuse_batch
    from lidar_object_detection_tpu.models.yolo.detector import YoloDetector
    from lidar_object_detection_tpu.models.yolo.model import YoloConfig

    scale = sys.argv[1] if len(sys.argv) > 1 else "n"
    cfg = FusionConfig.for_version(PipelineVersion.CSV_EVAL)
    ds = Kitti360Dataset("/root/reference/KITTI360_sample",
                         shapes=cfg.shapes)
    records = ds.load_frames()
    batch = ds.make_batch(records)
    images = ds.load_images(batch)
    params = FusionParams.from_config(cfg)

    shape = (cfg.shapes.image_height, cfg.shapes.image_width)
    det32 = YoloDetector(shape, YoloConfig(scale=scale),
                         max_detections=cfg.shapes.max_detections,
                         fast_masks=False, dtype=jnp.bfloat16)
    det16 = YoloDetector(shape, YoloConfig(scale=scale),
                         max_detections=cfg.shapes.max_detections,
                         fast_masks=True, dtype=jnp.bfloat16,
                         variables=det32.variables)  # same weights

    d_images = jax.device_put(jnp.asarray(images))
    out32 = det32.detect(d_images)
    out16 = det16.detect(d_images)

    m32 = np.asarray(out32["mask_bits"])    # (B, H, W) packed uint32
    m16 = np.asarray(out16["mask_bits"])
    diff_bits = np.bitwise_xor(m32, m16)
    flips = int(np.unpackbits(
        diff_bits.view(np.uint8), bitorder="little").sum())
    set32 = int(np.unpackbits(m32.view(np.uint8), bitorder="little").sum())

    # boundary pixels of the f32 masks (union over detections): a pixel
    # whose 4-neighborhood is not uniform
    u = m32 != 0
    interior = u.copy()
    interior[:, 1:, :] &= u[:, :-1, :]
    interior[:, :-1, :] &= u[:, 1:, :]
    interior[:, :, 1:] &= u[:, :, :-1]
    interior[:, :, :-1] &= u[:, :, 1:]
    boundary = int((u & ~interior).sum())

    def counts(det_out):
        fused = fuse_batch(jnp.asarray(batch.points),
                           jnp.asarray(batch.point_valid),
                           det_out["mask_bits"], det_out["det_valid"],
                           jnp.asarray(batch.corners_cam0),
                           jnp.asarray(batch.box_valid),
                           jnp.asarray(ds.transforms.velo_to_rect,
                                       dtype=jnp.float32),
                           jnp.asarray(ds.transforms.cam_to_velo,
                                       dtype=jnp.float32),
                           jnp.asarray(ds.camera.intrinsics,
                                       dtype=jnp.float32),
                           params=params)
        return (np.asarray(fused["total_points"]),
                np.asarray(fused["points_inside"]))

    t32, i32 = counts(out32)
    t16, i16 = counts(out16)
    sel = t32 > 0
    rel_total = np.abs(t16 - t32)[sel] / np.maximum(t32[sel], 1)
    rel_inside = np.abs(i16 - i32)[sel] / np.maximum(i32[sel], 1)

    # --- A. synthetic saturated masks through the same assembly path ---
    from lidar_object_detection_tpu.models.yolo.postprocess import (
        LetterboxSpec, _assemble_masks)

    src_h, src_w = shape
    spec = LetterboxSpec.build(src_h, src_w)
    mh, mw = spec.dst_h // 4, spec.dst_w // 4   # proto resolution
    d = 16
    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.arange(mh, dtype=np.float32),
                         np.arange(mw, dtype=np.float32), indexing="ij")
    protos = np.zeros((mh, mw, d), np.float32)
    boxes = np.zeros((d, 4), np.float32)
    for i in range(d):
        cy = rng.uniform(10, mh - 10)
        cx = rng.uniform(20, mw - 20)
        ry = rng.uniform(4, 14)          # car-sized at proto res
        rx = rng.uniform(8, 40)
        k = rng.uniform(2.0, 6.0)        # logistic edge sharpness (px)
        r = np.sqrt(((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2)
        protos[:, :, i] = k * (1.0 - r) * max(ry, rx)  # saturated logits
        # full-image boxes: the crop is not the mechanism under test
        boxes[i] = [0.0, 0.0, src_w, src_h]
    coef = np.eye(d, dtype=np.float32)   # sigmoid(coef @ protos) = masks
    dv = np.ones(d, bool)
    s32 = np.asarray(_assemble_masks(jnp.asarray(protos), jnp.asarray(coef),
                                     jnp.asarray(boxes), jnp.asarray(dv),
                                     spec, fast=False))
    s16 = np.asarray(_assemble_masks(jnp.asarray(protos), jnp.asarray(coef),
                                     jnp.asarray(boxes), jnp.asarray(dv),
                                     spec, fast=True))
    # per-CHANNEL boundary rings: overlapping masks must not steal each
    # other's boundary pixels from the denominator, and the
    # "flips stay in the ring" claim has to be computed per bit plane
    syn_flips = syn_set = syn_boundary = flips_outside_ring = 0
    for i in range(d):
        bit = np.uint32(1) << np.uint32(i)
        a = (s32 & bit) != 0
        b = (s16 & bit) != 0
        ch_flip = a ^ b
        inte = a.copy()
        inte[1:, :] &= a[:-1, :]
        inte[:-1, :] &= a[1:, :]
        inte[:, 1:] &= a[:, :-1]
        inte[:, :-1] &= a[:, 1:]
        ring = a & ~inte
        # widen by 1 px: a flip can also sit just OUTSIDE the f32 mask
        grow = ring.copy()
        grow[1:, :] |= ring[:-1, :]
        grow[:-1, :] |= ring[1:, :]
        grow[:, 1:] |= ring[:, :-1]
        grow[:, :-1] |= ring[:, 1:]
        syn_flips += int(ch_flip.sum())
        syn_set += int(a.sum())
        syn_boundary += int(ring.sum())
        flips_outside_ring += int((ch_flip & ~grow).sum())

    print(json.dumps({
        "scale": scale,
        "synthetic_mask_pixels_set": syn_set,
        "synthetic_flips": syn_flips,
        "synthetic_flip_rate_vs_set": syn_flips / max(syn_set, 1),
        "synthetic_boundary_pixels": syn_boundary,
        "synthetic_flip_rate_vs_boundary": syn_flips / max(syn_boundary, 1),
        "synthetic_flips_outside_boundary_band": flips_outside_ring,
        "degenerate_randomweight_pixels_set_f32": set32,
        "degenerate_randomweight_flips": flips,
        "degenerate_randomweight_boundary": boundary,
        "cars_with_points": int(sel.sum()),
        "max_rel_total_count_drift": float(rel_total.max()) if sel.any()
        else 0.0,
        "max_rel_inside_count_drift": float(rel_inside.max()) if sel.any()
        else 0.0,
        "mean_rel_inside_count_drift": float(rel_inside.mean()) if sel.any()
        else 0.0,
    }))


if __name__ == "__main__":
    main()
