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

Three rows per operating point:
  * baseline   — the committed single-view decode (probe self-check);
  * flipped    — mirrored-view detections alone, mapped back (diagnostic:
                 how much does the view shift cost by itself?);
  * averaged   — normal boxes/scores, per-detection prob fields averaged
                 with the IoU-matched (>=0.5) mirrored detection's field.

KITTI-360 frames letterbox with zero horizontal padding (1408 is the
long side), so mirroring commutes exactly with the letterbox and the
proto-grid crop; fields are mirrored at native resolution.

Usage:
  python examples/quality_flip_probe.py --ckpt checkpoints/yolo11n_seg_distill.msgpack \
      --platform cpu --out /tmp/flip_probe_n.json
"""

from __future__ import annotations

import argparse
import functools
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

    from quality_common import prepare_study

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_object_detection_tpu.eval.erosion_study import analyze, join_runs
    from lidar_object_detection_tpu.geom.boxes import iou_2d_matrix
    from lidar_object_detection_tpu.models.yolo.postprocess import (
        PostprocessParams, mask_prob_fields, pack_thresholded_masks,
        postprocess_single)

    ctx = prepare_study(args.ckpt, args.dataset, args.platform)
    spec = ctx.spec
    src_w = float(spec.src_w)

    t0 = time.time()
    flip_out = ctx.run_forward(ctx.images[:, :, ::-1, :])
    print(f"[flip] mirrored forward: {time.time() - t0:.1f}s", flush=True)

    def decode(raw, pp):
        post = jax.jit(jax.vmap(lambda one: postprocess_single(one, pp)))
        return post(jax.device_put(raw))

    @functools.partial(jax.jit, static_argnames=("thr", "floor", "min_pix",
                                                 "mode"))
    def frame_bits(protos_n, det_n, protos_f, det_f, thr, floor, min_pix,
                   mode):
        """One frame's packed mask bits for the requested TTA mode."""
        p_n = mask_prob_fields(protos_n, det_n["coef"], spec)
        p_f = mask_prob_fields(protos_f, det_f["coef"], spec)[:, :, ::-1]
        # mirrored-view boxes back into normal-frame coordinates
        bf = det_f["boxes"]
        boxes_f = jnp.stack([src_w - bf[:, 2], bf[:, 1],
                             src_w - bf[:, 0], bf[:, 3]], axis=-1)
        if mode == "flipped":
            return pack_thresholded_masks(
                p_f, boxes_f, det_f["det_valid"], thr, floor, min_pix)
        iou = iou_2d_matrix(det_n["boxes"], boxes_f)             # (D, D)
        iou = jnp.where(det_f["det_valid"][None, :], iou, 0.0)
        best = jnp.argmax(iou, axis=1)                           # (D,)
        matched = (jnp.max(iou, axis=1) >= args.match_iou) \
            & det_n["det_valid"]
        fields = jnp.where(matched[:, None, None],
                           0.5 * (p_n + p_f[best]), p_n)
        return pack_thresholded_masks(
            fields, det_n["boxes"], det_n["det_valid"], thr, floor, min_pix)

    def study_rows(detections):
        run_r = ctx.pipe_raw.run(detections=detections)
        run_e = ctx.pipe_ero.run(detections=detections)
        return join_runs(run_r.csv_rows, run_e.csv_rows)

    results = []
    for spec_str in args.configs:
        thr_s, floor_s, pix_s = spec_str.split(":")
        thr = float(thr_s)
        floor = float(floor_s) if floor_s else None
        min_pix = int(pix_s) if pix_s else 0

        pp = PostprocessParams(
            spec=spec, conf_threshold=args.conf, mask_threshold=thr,
            mask_threshold_floor=floor, mask_min_pixels=min_pix,
            max_detections=32, emit_coef=True)
        det_n = decode(ctx.raw_out, pp)
        det_f = decode(flip_out, pp)

        for mode in ("baseline", "flipped", "averaged"):
            t0 = time.time()
            if mode == "baseline":
                detections = {k: np.asarray(v) for k, v in det_n.items()
                              if k != "coef"}
            else:
                bits, boxes, scores, valid = [], [], [], []
                for i in range(ctx.n_frames):
                    sl = lambda tree: jax.tree_util.tree_map(
                        lambda x: x[i], tree)
                    bits.append(np.asarray(frame_bits(
                        sl(ctx.raw_out)["proto"], sl(det_n),
                        sl(flip_out)["proto"], sl(det_f),
                        thr, floor, min_pix, mode)))
                src = det_f if mode == "flipped" else det_n
                boxes = np.asarray(src["boxes"]).copy()
                if mode == "flipped":
                    x1 = src_w - boxes[:, :, 2].copy()
                    boxes[:, :, 2] = src_w - boxes[:, :, 0]
                    boxes[:, :, 0] = x1
                detections = {
                    "boxes": boxes,
                    "scores": np.asarray(src["scores"]),
                    "det_valid": np.asarray(src["det_valid"]),
                    "mask_bits": np.stack(bits)}
            res = analyze(study_rows(detections))
            row = {"mode": mode, "mask_threshold": thr,
                   "floor": floor, "min_pixels": min_pix,
                   **res.summary(), "sweep_s": round(time.time() - t0, 1)}
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
