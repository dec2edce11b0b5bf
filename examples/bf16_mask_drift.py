"""Quantify the f32-vs-bf16 retina-mask assembly drift (fast_masks flag).

``PostprocessParams.fast_masks`` upsamples the (D, H, W) instance masks in
bfloat16, halving the HBM traffic of the most expensive postprocess stage;
pixels whose bilinear value lands within bf16 epsilon of the 0.5 threshold
may flip.  This script measures, on the bundled 20-frame sample:

  1. mask-pixel flip rate (f32 vs bf16 assembly, same detections),
  2. the downstream effect on per-car fusion counts (inside/total deltas).

Caveat: no real yolo11x-seg checkpoint exists in this environment
(BASELINE.md "Reproducibility status"), so the detector runs with random
weights -- mask *geometry* is arbitrary, but the drift mechanism
(bilinear resample + 0.5 threshold in reduced precision) is the same one
real masks face at their boundaries; the flip-rate-per-boundary-pixel
statistic transfers.

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

    print(json.dumps({
        "scale": scale,
        "mask_pixels_set_f32": set32,
        "mask_pixel_flips": flips,
        "flip_rate_vs_set": flips / max(set32, 1),
        "boundary_pixels": boundary,
        "flip_rate_vs_boundary": flips / max(boundary, 1),
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
