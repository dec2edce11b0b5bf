#!/usr/bin/env python
"""Input-resolution probe: the one decode-side axis the round-5 sweeps
never touched.

Every quality experiment so far ran at ultralytics' default ``imgsz=640``
(reference predict path, V1_BBox_Pointwise_filtering.py:57), which
letterboxes the 376x1408 KITTI-360 frame down to 171x640 (r=0.4545) and
puts the mask prototypes at a coarse 48x160 grid.  The serving-point
work showed the residual error lives exactly at the proto-resolution
boundary (PERFORMANCE.md round-5 section), so a finer proto grid is the
natural next lever: at imgsz=1408 the letterbox is identity (384x1408)
and the protos quadruple in linear resolution.

The counter-force is scale shift: the distilled weights only ever saw
640-letterboxed frames, so objects at higher imgsz are up to 2.2x larger
than anything in training; the FPN octaves may or may not absorb that.
This probe answers the question empirically on the full erosion study
(both fusion runs, reference matching semantics): per imgsz, one
network forward, then a small threshold grid (plain points bracketing
the committed 0.99 + the committed guarded-shrink config), reported
with the same guard rails as quality_knob_sweep.py (matched_cars, gain,
std).

Usage:
  python examples/quality_imgsz_probe.py --ckpt checkpoints/yolo11n_seg_distill.msgpack \
      --imgsz 640 896 1408 --out /tmp/imgsz_probe_n.json
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
    ap.add_argument("--out", default="/tmp/imgsz_probe.json")
    ap.add_argument("--imgsz", type=int, nargs="*", default=[640, 896, 1408])
    ap.add_argument("--mask-thr", type=float, nargs="*",
                    default=[0.5, 0.9, 0.99],
                    help="plain thresholds per size (bracket the committed "
                         "operating point; the optimum may shift with the "
                         "proto resolution)")
    ap.add_argument("--guarded", nargs="*", default=["0.99:0.5:200"],
                    metavar="THR:FLOOR:MINPIX",
                    help="guarded-shrink configs per size (committed "
                         "serving point by default). mask_min_pixels is a "
                         "native-resolution pixel count, so it is "
                         "imgsz-invariant")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from quality_common import prepare_study, rows_for

    from lidar_object_detection_tpu.eval.erosion_study import analyze

    results = []
    for s in args.imgsz:
        t0 = time.time()
        ctx = prepare_study(args.ckpt, args.dataset, args.platform,
                            imgsz=s)
        fwd_s = round(time.time() - t0, 1)
        configs = [
            {"mask_threshold": t} for t in args.mask_thr
        ] + [
            {"mask_threshold": float(g.split(":")[0]),
             "floor": float(g.split(":")[1]),
             "min_pixels": int(g.split(":")[2])}
            for g in args.guarded
        ]
        for cfg in configs:
            t0 = time.time()
            res = analyze(rows_for(
                ctx, args.conf, cfg["mask_threshold"],
                floor=cfg.get("floor"),
                min_pixels=cfg.get("min_pixels", 0)))
            row = {"imgsz": s, "conf": args.conf, **cfg,
                   **res.summary(),
                   "forward_s": fwd_s,
                   "sweep_s": round(time.time() - t0, 1)}
            results.append(row)
            print(f"[imgsz] {json.dumps(row)}", flush=True)
        del ctx  # free the raw feature maps before the next (bigger) size

    results.sort(key=lambda r: -r["mean_inside_pct_eroded"])
    payload = {"ckpt": args.ckpt,
               "reference_mean_inside_pct_eroded": 74.48,
               "committed_serving_point": {
                   "imgsz": 640, "mask_threshold": 0.99,
                   "floor": 0.5, "min_pixels": 200},
               "results": results}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)

    print("\n| imgsz | mask_thr | guarded | matched | inside% ero | raw |")
    print("|---|---|---|---|---|---|")
    for r in results:
        guarded = (f"{r['floor']}@{r['min_pixels']}"
                   if r.get("floor") is not None else "-")
        print(f"| {r['imgsz']} | {r['mask_threshold']} | {guarded} "
              f"| {r['matched_cars']} | {r['mean_inside_pct_eroded']} "
              f"| {r['mean_inside_pct_raw']} |")
    print(f"\n[imgsz] best: {json.dumps(results[0])} -> {args.out}")


if __name__ == "__main__":
    main()
