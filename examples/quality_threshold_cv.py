#!/usr/bin/env python
"""Leave-one-frame-out cross-validation of the mask-threshold choice.

`examples/quality_knob_sweep.py` selects the serving mask binarization
threshold (0.9) on the same 19-frame erosion study it is scored on, which
invites a selection-bias objection against the 76.29 %-vs-74.48 % headline
(PERFORMANCE.md "Round-5" section).  This script removes that bias:

For each frame f in the study, the threshold is selected using ONLY the
other frames' per-car rows, then frame f's cars are scored at that
selected threshold.  The cross-validated aggregate is computed over the
union of held-out rows — no car ever contributes to the threshold that
scores it.  Two selection rules are evaluated, mirroring the two points
the sweep surfaced:

* ``argmax``   — pick the threshold maximizing mean inside-% eroded on
  the training frames (the 0.99-style pick).
* ``guarded``  — same, but restricted to thresholds whose matched-car
  count on the training frames is within --guard (default 2) of the
  ultralytics-default (0.5) matched count, i.e. the rule that actually
  chose 0.9 ("margin of matched cars", PERFORMANCE.md).
* ``coverage`` — only configs keeping the MOST matched cars on the
  training frames compete on mean inside-%; used for the mixed
  plain+guarded-shrink grid (``--guarded-grid``), where it selected the
  committed ``0.99+floor0.5@200`` serving point in 16/16 folds.

The expensive network forward runs once (as in the sweep); each grid
point re-runs only decode/NMS/mask assembly and the two fusion passes.
Reference protocol throughout: both fusion runs per config, reference
matching semantics, joined on (frame, car_id) matched-in-both
(eval/erosion_study.py; reference workbook kept 61/72 rows).

Usage:
  python examples/quality_threshold_cv.py \
      --ckpt checkpoints/yolo11x_seg_distill.msgpack --out /tmp/thr_cv.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KITTI = os.environ.get("LIDAR_TPU_KITTI360", "/root/reference/KITTI360_sample")


def select_threshold(rows_by_thr, thresholds, train_frames, rule, guard):
    """Pick a config using only rows whose frame is in train_frames.

    ``thresholds`` may be plain floats or arbitrary hashable config keys
    (e.g. ``(thr, floor, min_pixels)`` tuples for the guarded-shrink
    decode mode); the ``guarded`` rule's 0.5 baseline applies to float
    grids only, ``argmax``/``coverage`` work for any key type."""
    def train_rows(thr):
        return [r for r in rows_by_thr[thr] if r.frame in train_frames]

    candidates = list(thresholds)
    if rule == "coverage":
        # full-coverage rule: only configs that keep the MOST matched
        # cars on the training frames compete on mean inside-% -- the
        # rule behind the guarded-shrink serving point (a config may
        # only win by scoring better, never by dropping hard cars)
        counts = {t: len(train_rows(t)) for t in thresholds}
        top = max(counts.values())
        candidates = [t for t in thresholds if counts[t] == top]
    elif rule == "guarded":
        # guard baseline: the ultralytics 0.5 default when swept, else
        # the lowest threshold (lower thresholds keep the most cars) --
        # NOT positional, so a reordered --mask-thr list can't silently
        # re-baseline the guard
        base_thr = 0.5 if 0.5 in thresholds else min(thresholds)
        base = len(train_rows(base_thr))
        candidates = [t for t in thresholds
                      if len(train_rows(t)) >= base - guard]
        if not candidates:
            candidates = list(thresholds)
    best, best_mean = candidates[0], -1.0
    for t in candidates:
        rows = train_rows(t)
        if not rows:
            continue
        m = float(np.mean([r.inside_pct_eroded for r in rows]))
        if m > best_mean:
            best, best_mean = t, m
    return best


def cv_aggregate(rows_by_thr, thresholds, frames, rule, guard):
    """LOFO: per-fold threshold selection, score held-out frame's rows."""
    held_rows, picks = [], {}
    for f in frames:
        train = set(frames) - {f}
        thr = select_threshold(rows_by_thr, thresholds, train, rule, guard)
        picks[f] = thr
        held_rows.extend(r for r in rows_by_thr[thr] if r.frame == f)
    mean_ero = float(np.mean([r.inside_pct_eroded for r in held_rows]))
    mean_raw = float(np.mean([r.inside_pct_raw for r in held_rows]))
    diffs = [r.inside_pct_diff for r in held_rows]
    return {
        "rule": rule,
        "matched_cars": len(held_rows),
        "mean_inside_pct_eroded": round(mean_ero, 2),
        "mean_inside_pct_raw": round(mean_raw, 2),
        "std_inside_pct_diff": round(float(np.std(diffs, ddof=1)), 2),
        "fold_picks": {str(f): picks[f] for f in frames},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/yolo11x_seg_distill.msgpack")
    ap.add_argument("--dataset", default=KITTI)
    ap.add_argument("--out", default="/tmp/thr_cv.json")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--mask-thr", type=float, nargs="*",
                    default=[0.5, 0.6, 0.7, 0.8, 0.85, 0.9, 0.95, 0.99])
    ap.add_argument("--guard", type=int, default=2,
                    help="guarded rule: max matched-car drop vs the 0.5 "
                         "default allowed on the training frames")
    ap.add_argument("--guarded-grid", nargs="*", default=[],
                    metavar="THR:FLOOR:MINPIX",
                    help="additional guarded-shrink configs (mask_threshold"
                         "_floor decode mode), e.g. 0.99:0.5:200; when "
                         "given, the CV runs over the mixed plain+guarded "
                         "grid with the coverage and argmax rules")
    ap.add_argument("--tta-grid", nargs="*", default=[],
                    metavar="THR:FLOOR:MINPIX",
                    help="additional flip-TTA configs (two-view mask-"
                         "probability consensus, quality_common.rows_for_"
                         "tta), e.g. 0.99:0.5:200 -- empty floor for a "
                         "plain threshold. Mixed-grid rules apply as with "
                         "--guarded-grid")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from quality_common import prepare_study, rows_for, rows_for_tta

    from lidar_object_detection_tpu.eval.erosion_study import analyze

    # stage 1 (shared with quality_knob_sweep.py): network forward ONCE
    ctx = prepare_study(args.ckpt, args.dataset, args.platform)

    # config keys: plain floats, or (thr, floor, min_pixels) label strings
    # for the mixed grid (keys must be JSON-serializable in fold_picks)
    configs = list(args.mask_thr)
    guarded_cfgs, tta_cfgs = {}, {}

    def parse_cfg(spec_str):
        thr_s, floor_s, pix_s = spec_str.split(":")
        floor = float(floor_s) if floor_s else None
        pix = int(pix_s) if pix_s else 0
        label = (f"{thr_s}+floor{floor_s}@{pix_s}" if floor is not None
                 else thr_s)
        return label, (float(thr_s), floor, pix)

    for spec_str in args.guarded_grid:
        key, parsed = parse_cfg(spec_str)
        guarded_cfgs[key] = parsed
        configs.append(key)
    for spec_str in args.tta_grid:
        key, parsed = parse_cfg(spec_str)
        key = "tta:" + key
        tta_cfgs[key] = parsed
        configs.append(key)

    rows_by_thr, insample = {}, []
    for cfg in configs:
        t0 = time.time()
        if cfg in tta_cfgs:
            thr, floor, pix = tta_cfgs[cfg]
            rows = rows_for_tta(ctx, args.conf, thr, floor=floor,
                                min_pixels=pix)
        elif cfg in guarded_cfgs:
            thr, floor, pix = guarded_cfgs[cfg]
            rows = rows_for(ctx, args.conf, thr, floor=floor,
                            min_pixels=pix)
        else:
            rows = rows_for(ctx, args.conf, cfg)
        rows_by_thr[cfg] = rows
        row = {"config": cfg, **analyze(rows).summary(),
               "config_s": round(time.time() - t0, 1)}
        insample.append(row)
        print(f"[cv] {json.dumps(row)}", flush=True)

    frames = sorted({r.frame for rows in rows_by_thr.values() for r in rows})
    # the guarded rule's 0.5 baseline is float-grid-specific; the mixed
    # grid runs the coverage rule in its place
    rules = (("coverage", "argmax") if (guarded_cfgs or tta_cfgs)
             else ("guarded", "argmax"))
    results = [cv_aggregate(rows_by_thr, configs, frames, rule, args.guard)
               for rule in rules]
    payload = {"ckpt": args.ckpt, "scale": ctx.scale,
               "reference_mean_inside_pct_eroded": 74.48,
               "n_frames": len(frames), "thresholds": configs,
               "insample": insample, "cv": results}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)

    for res in results:
        picks = sorted(set(res["fold_picks"].values()))
        print(f"\n[cv] rule={res['rule']}: mean inside-% eroded "
              f"{res['mean_inside_pct_eroded']} over {res['matched_cars']} "
              f"held-out cars (raw {res['mean_inside_pct_raw']}, "
              f"std {res['std_inside_pct_diff']}); fold picks {picks}")
    print(f"[cv] reference: 74.48 -> {args.out}")


if __name__ == "__main__":
    main()
