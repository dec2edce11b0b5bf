#!/usr/bin/env python
"""Flip-TTA probe: the last untried decode-side lever.

Horizontal-flip test-time augmentation keeps the input scale unchanged
(unlike the imgsz probe, which showed the distilled weights collapse at
unseen scales — PERFORMANCE.md), so it is the mildest possible view
shift: run the detector on the mirrored frame too, mirror its mask
probability fields back, and AVERAGE them with the normal view's fields
per matched detection before the serving binarization.  If the
distilled masks spill past the car boundary with view-dependent noise,
averaging two views cancels part of it; if the model (trained on these
19 exact frames, no flip augmentation) degrades hard on mirrored
inputs, the average inherits the damage — this probe answers which,
on the full erosion study with reference matching semantics.

Three rows per operating point (machinery shared with the CV script in
quality_common.py: tta_detections / rows_for_tta):
  * baseline   — the committed single-view decode (probe self-check);
  * flipped    — mirrored-view detections alone, mapped back (diagnostic:
                 how much does the view shift cost by itself?);
  * averaged   — normal boxes/scores, per-detection prob fields averaged
                 with the IoU-matched (>=0.5) mirrored detection's field.

Result (PERFORMANCE.md): averaged wins on both checkpoints at the
committed guarded point — x 77.44 / n 77.06 @ all 65 cars vs
76.96 / 76.58 single-view — while the mirrored view alone collapses to
9-23 matched cars (the no-augmentation distill memorized the
unmirrored frames), i.e. the gain is pure boundary consensus.

KITTI-360 frames letterbox with zero horizontal padding (1408 is the
long side), so mirroring commutes exactly with the letterbox and the
proto-grid crop; fields are mirrored at native resolution.

Usage:
  python examples/quality_flip_probe.py --ckpt checkpoints/yolo11x_seg_distill.msgpack \
      --platform cpu --out /tmp/flip_probe_x.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KITTI = os.environ.get("LIDAR_TPU_KITTI360", "/root/reference/KITTI360_sample")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/yolo11n_seg_distill.msgpack")
    ap.add_argument("--dataset", default=KITTI)
    ap.add_argument("--out", default="/tmp/flip_probe.json")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--configs", nargs="*", default=["0.9::", "0.99:0.5:200"],
                    metavar="THR:FLOOR:MINPIX",
                    help="operating points (empty floor = plain threshold); "
                         "default: previous default + committed guarded point")
    ap.add_argument("--match-iou", type=float, default=0.5)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from quality_common import (prepare_flip, prepare_study, rows_for,
                                rows_for_tta)

    from lidar_object_detection_tpu.eval.erosion_study import analyze

    ctx = prepare_study(args.ckpt, args.dataset, args.platform)
    prepare_flip(ctx)

    results = []
    for spec_str in args.configs:
        thr_s, floor_s, pix_s = spec_str.split(":")
        thr = float(thr_s)
        floor = float(floor_s) if floor_s else None
        min_pix = int(pix_s) if pix_s else 0

        for mode in ("baseline", "flipped", "averaged"):
            t0 = time.time()
            if mode == "baseline":
                rows = rows_for(ctx, args.conf, thr, floor=floor,
                                min_pixels=min_pix)
            else:
                rows = rows_for_tta(ctx, args.conf, thr, floor=floor,
                                    min_pixels=min_pix, mode=mode,
                                    match_iou=args.match_iou)
            row = {"mode": mode, "mask_threshold": thr,
                   "floor": floor, "min_pixels": min_pix,
                   **analyze(rows).summary(),
                   "sweep_s": round(time.time() - t0, 1)}
            results.append(row)
            print(f"[flip] {json.dumps(row)}", flush=True)

    payload = {"ckpt": args.ckpt, "match_iou": args.match_iou,
               "reference_mean_inside_pct_eroded": 74.48,
               "results": results}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"[flip] -> {args.out}")


if __name__ == "__main__":
    main()
