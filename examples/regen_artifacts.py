#!/usr/bin/env python
"""Regenerate the reference's full artifact set behind a LEARNED detector.

The reference produced its quality artifacts with a trained YOLO-seg
(`cvs_erosion.py:232-295` wrote master_car_statistics.csv; the xlsx
workbook aggregates 74.48 % mean inside / +7.67 % erosion improvement /
5.87 stddev; `seg_with_pointcloud.py:173-194` the depth-map PNGs;
`Imagesegmentation_final.py:15-53` the segmentation overlays).  This
driver reruns every one of those outputs through the TPU pipelines with
the in-repo distilled checkpoint (examples/train_yolo_distill.py):

  out/
    master_car_statistics.csv          eroded-run rows (cvs_erosion schema)
    master_car_statistics_raw.csv      no-erosion rows
    erosion_study.csv                  joined per-car study rows
    master_car_statistics.csv.xlsx     3-sheet workbook (eval/xlsx.py)
    summary.json                       headline aggregates + run metadata
    depth_maps/                        per-car PNG figures (subset)
    seg_overlays/                      mask+box overlays (subset)

Usage:
  python examples/regen_artifacts.py --ckpt checkpoints/yolo11n_seg_distill.msgpack
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KITTI = os.environ.get("LIDAR_TPU_KITTI360", "/root/reference/KITTI360_sample")


def build_detector(ckpt: str, conf: float = 0.25,
                   mask_threshold: float | None = None,
                   mask_threshold_floor: float | None = None,
                   mask_min_pixels: int | None = None,
                   tta: str | None = None):
    """``mask_threshold=None`` uses the checkpoint sidecar's recorded
    serving point (quality_knob_sweep), falling back to ultralytics' 0.5;
    same for ``tta`` (models/yolo/tta.py flip consensus)."""
    from lidar_object_detection_tpu.models.yolo.serving import \
        load_serving_checkpoint

    det, step, _ = load_serving_checkpoint(
        ckpt, conf=conf, mask_threshold=mask_threshold,
        mask_threshold_floor=mask_threshold_floor,
        mask_min_pixels=mask_min_pixels, tta=tta)
    return det, step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dataset", default=KITTI)
    ap.add_argument("--out", default="artifacts/learned_detector")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--mask-thr", type=float, default=None,
                    help="mask binarization threshold (default: the "
                         "checkpoint sidecar's recorded serving point, "
                         "else 0.5; see quality_knob_sweep.py)")
    ap.add_argument("--mask-floor", type=float, default=None,
                    help="guarded-shrink floor threshold override "
                         "(default: sidecar serving block)")
    ap.add_argument("--mask-min-pixels", type=int, default=None,
                    help="guarded-shrink pixel guard override")
    ap.add_argument("--tta", default=None, choices=["none", "hflip"],
                    help="test-time augmentation override (default: the "
                         "sidecar serving block; models/yolo/tta.py)")
    ap.add_argument("--depth-map-frames", type=int, nargs="*", default=[100])
    ap.add_argument("--overlay-frames", type=int, nargs="*",
                    default=[100, 2033])
    ap.add_argument("--platform", default=os.environ.get(
        "LIDAR_TPU_PLATFORM"), help="jax platform override (cpu/tpu); the "
        "image's sitecustomize pins the axon TPU otherwise")
    args = ap.parse_args()

    if args.platform and args.platform != "default":
        import jax
        jax.config.update("jax_platforms", args.platform)
    from lidar_object_detection_tpu.utils.cache import \
        enable_compilation_cache
    enable_compilation_cache()

    os.makedirs(args.out, exist_ok=True)
    detector, step = build_detector(args.ckpt, args.conf, args.mask_thr,
                                    args.mask_floor, args.mask_min_pixels,
                                    args.tta)
    print(f"[regen] detector from {args.ckpt} (step {step}, "
          f"tta {detector.tta})", flush=True)

    # --- 1. erosion study: both fusion runs behind ONE detection pass ---
    from lidar_object_detection_tpu.eval.erosion_study import \
        run_erosion_study
    from lidar_object_detection_tpu.eval.statistics import \
        append_to_master_csv
    res = run_erosion_study(
        args.dataset, detector=detector,
        output_csv=os.path.join(args.out, "erosion_study.csv"),
        output_xlsx=os.path.join(args.out, "master_car_statistics.csv.xlsx"))
    summary = res.summary()
    print(f"[regen] erosion study: {summary}", flush=True)

    # the per-run master CSVs (cvs_erosion.py writes the eroded one)
    from lidar_object_detection_tpu.config import FusionConfig, \
        PipelineVersion
    from lidar_object_detection_tpu.data import Kitti360Dataset
    from lidar_object_detection_tpu.pipelines.runner import FusionPipeline
    cfg_e = FusionConfig.for_version(PipelineVersion.CSV_EVAL)
    ds = Kitti360Dataset(args.dataset, shapes=cfg_e.shapes)
    run_e = FusionPipeline(ds, cfg_e, detector).run(
        master_csv=os.path.join(args.out, "master_car_statistics.csv"))
    cfg_r = FusionConfig.for_version(PipelineVersion.V2_STATS)
    run_r = FusionPipeline(ds, cfg_r, detector).run(
        master_csv=os.path.join(args.out, "master_car_statistics_raw.csv"))

    # --- 2. depth maps (seg_with_pointcloud figures) ---
    from lidar_object_detection_tpu.viz.overlay import depth_map_figure
    dm_dir = os.path.join(args.out, "depth_maps")
    os.makedirs(dm_dir, exist_ok=True)
    cfg_dm = FusionConfig.for_version(PipelineVersion.DEPTH_MAPS)
    pipe_dm = FusionPipeline(
        Kitti360Dataset(args.dataset, shapes=cfg_dm.shapes), cfg_dm, detector)
    n_dm = 0
    for fid, car, dm, seg in pipe_dm.depth_maps(args.depth_map_frames):
        depth_map_figure(
            dm, seg, car, fid,
            os.path.join(dm_dir, f"{fid:010d},depth_map_car_{car:02d}_.png"))
        n_dm += 1
    print(f"[regen] {n_dm} depth maps", flush=True)

    # --- 3. segmentation overlays (Imagesegmentation_final) ---
    from PIL import Image

    from lidar_object_detection_tpu.ops.masks import unpack_masks
    from lidar_object_detection_tpu.viz.overlay import (draw_boxes,
                                                        golden_colors,
                                                        overlay_masks)
    ov_dir = os.path.join(args.out, "seg_overlays")
    os.makedirs(ov_dir, exist_ok=True)
    # image-only: segmentation overlays need no bboxes, so the no-bbox
    # frame (2717 -- skipped by load_frames) is still covered, matching
    # the reference's Predictions/Seg inventory of ALL 20 frames
    ov_ids = [f for f in args.overlay_frames
              if os.path.exists(ds.image_path(f))]
    dropped = sorted(set(args.overlay_frames) - set(ov_ids))
    if dropped:
        print(f"[regen] WARNING: no image for overlay frames {dropped}; "
              "skipped", flush=True)
    if not ov_ids:
        raise SystemExit("regen: none of the requested overlay frames "
                         "have images")
    images = np.stack([np.asarray(Image.open(ds.image_path(f)).convert("RGB"))
                       for f in ov_ids])
    det_out = detector.detect(images)
    for i, fid in enumerate(ov_ids):
        dv = np.asarray(det_out["det_valid"][i])
        n = int(dv.sum())
        colors = golden_colors(max(n, 1))
        masks = np.asarray(unpack_masks(
            np.asarray(det_out["mask_bits"][i]), len(dv)))[dv]
        boxes = np.asarray(det_out["boxes"][i])[dv]
        vis = draw_boxes(overlay_masks(images[i], masks, colors),
                         boxes, colors)
        Image.fromarray(vis).save(
            os.path.join(ov_dir, f"{fid:010d}.png"))
    print(f"[regen] {len(ov_ids)} overlays", flush=True)

    # --- 4. V5 Hungarian smoke (matched pairs from the learned boxes) ---
    cfg5 = FusionConfig.for_version(PipelineVersion.V5_PROJECTED)
    run5 = FusionPipeline(
        Kitti360Dataset(args.dataset, shapes=cfg5.shapes), cfg5,
        detector).run([100])
    v5_pairs = sum(1 for p in run5.frames[0].matched_pairs
                   if not p.get("unmatched"))

    payload = {
        "checkpoint": args.ckpt, "ckpt_step": step, "conf": args.conf,
        "mask_threshold": detector.params.mask_threshold,
        "mask_threshold_floor": detector.params.mask_threshold_floor,
        "mask_min_pixels": detector.params.mask_min_pixels,
        "tta": detector.tta,
        "erosion_study": summary,
        "csv_eval": run_e.summary(),
        "no_erosion": run_r.summary(),
        "v5_frame100_matched_pairs": v5_pairs,
        "reference_baseline": {
            "mean_inside_pct_eroded": 74.48,
            "mean_pct_improvement": 7.67,
            "std_inside_point_diff": 5.87,
            "source": "master_car_statistics.csv.xlsx sheets Ero_stats / "
                      "Ero_vs_NoERo (reference workbook)",
        },
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: payload[k] for k in
                      ("erosion_study", "csv_eval",
                       "v5_frame100_matched_pairs")}, indent=2))


if __name__ == "__main__":
    main()
