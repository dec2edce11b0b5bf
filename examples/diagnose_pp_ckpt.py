"""Diagnose a PointPillars surround checkpoint: where do the misses live?

Loads the train state saved by ``train_pointpillars_surround.py --ckpt``,
re-runs eval on the cached aggregated frames at several score/IoU
thresholds, and histograms matched vs unmatched GT by ego distance and
by in-box point count -- distinguishing "detections are there but below
the IoU bar" (localization) from "no detection at all" (recall) from
"outside the reachable set" (no points).

Usage: python examples/diagnose_pp_ckpt.py [--ckpt=/tmp/pp_ckpt.msgpack]
           [--cache=/tmp/pp_frames.npz] [--subsample=65536] [--head=ssd]
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from lidar_object_detection_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()
    flags = dict(f.split("=", 1) for f in sys.argv[1:] if "=" in f)
    ckpt_path = flags.get("--ckpt", "/tmp/pp_ckpt.msgpack")
    cache_path = flags.get("--cache", "/tmp/pp_frames.npz")
    subsample = int(flags.get("--subsample", 65536))
    head = flags.get("--head", "ssd")
    eval_points = int(flags.get("--eval-points", 1 << 18))

    import dataclasses

    import jax.numpy as jnp
    from flax import serialization

    from lidar_object_detection_tpu.models.pointpillars import (
        PillarsConfig, PillarsTrainer, decode_predictions)
    from lidar_object_detection_tpu.ops.rotated_iou import (
        rotated_iou_matrix_np)
    from lidar_object_detection_tpu.parallel.mesh import make_mesh
    from lidar_object_detection_tpu.parallel.train import TrainState
    from lidar_object_detection_tpu.pipelines import pointpillars as pp

    cfg = dataclasses.replace(PillarsConfig.kitti360_surround(), head=head)
    z = np.load(cache_path)
    frames = [(z[f"p{i}"], z[f"b{i}"]) for i in range(int(z["n"]))]

    import optax

    mesh = make_mesh(jax.devices()[:1])
    # schedule (not a constant) so the opt-state template matches the
    # training run's checkpoint (scale_by_schedule carries a count leaf)
    trainer = PillarsTrainer(cfg, mesh, num_points=subsample,
                             learning_rate=optax.cosine_decay_schedule(
                                 2e-3, 1000))
    with open(ckpt_path, "rb") as f:
        tmpl = (trainer.state.variables, trainer.state.opt_state,
                trainer.state.step)
        v, o, s = serialization.from_bytes(tmpl, f.read())
    trainer.state = TrainState(variables=v, opt_state=o, step=s)
    print(f"checkpoint step {int(np.asarray(s))}")

    MAX_GT = pp.MAX_GT
    n = len(frames)
    e_pts = np.zeros((n, eval_points, 4), np.float32)
    e_pv = np.zeros((n, eval_points), bool)
    e_gt = np.zeros((n, MAX_GT, 7), np.float32)
    e_gv = np.zeros((n, MAX_GT), bool)
    for j, (p, bx) in enumerate(frames):
        k = min(len(p), eval_points)
        e_pts[j, :k] = p[:k]
        e_pv[j, :k] = True
        g = min(len(bx), MAX_GT)
        e_gt[j, :g] = bx[:g]
        e_gv[j, :g] = True

    out = trainer.apply(e_pts, e_pv)

    def in_box_count(pts, box):
        d = pts[:, :2] - box[:2]
        c, si = np.cos(box[6]), np.sin(box[6])
        lx = d[:, 0] * c + d[:, 1] * si
        ly = -d[:, 0] * si + d[:, 1] * c
        return int(np.sum((np.abs(lx) <= box[4] / 2)
                          & (np.abs(ly) <= box[3] / 2)
                          & (pts[:, 2] >= box[2] - box[5] / 2)
                          & (pts[:, 2] <= box[2] + box[5] / 2)))

    for st in (0.3, 0.1, 0.05):
        for iou_t in (0.5, 0.3, 0.1):
            matched = total = dets = 0
            for i in range(n):
                one = jax.tree_util.tree_map(lambda x: x[i], out)
                det = decode_predictions(one, cfg, score_threshold=st,
                                         rotated_nms=True,
                                         max_detections=128)
                r = pp.evaluate_bev(det, e_gt[i], e_gv[i],
                                    iou_threshold=iou_t, exact=True)
                matched += r.matched
                total += r.total_gt
                dets += r.total_det
            print(f"score>{st} iou>{iou_t}: recall {matched}/{total}, "
                  f"{dets} detections")

    # per-gt miss analysis at the headline gates
    print("\nper-GT analysis (score>0.1, iou>0.5):")
    rows = []
    for i in range(n):
        one = jax.tree_util.tree_map(lambda x: x[i], out)
        det = decode_predictions(one, cfg, score_threshold=0.1,
                                 rotated_nms=True, max_detections=128)
        ok = np.asarray(det["valid"])
        dboxes = np.asarray(det["boxes7"])[ok]
        gt = e_gt[i][e_gv[i]]
        iou = (rotated_iou_matrix_np(dboxes, gt) if len(dboxes) and len(gt)
               else np.zeros((0, len(gt))))
        best = iou.max(axis=0) if len(dboxes) else np.zeros(len(gt))
        pts = e_pts[i][e_pv[i]]
        for g in range(len(gt)):
            rows.append((float(np.hypot(gt[g, 0], gt[g, 1])),
                         in_box_count(pts, gt[g]), float(best[g])))
    rows.sort()
    bins = [(0, 20), (20, 40), (40, 60), (60, 80), (80, 150)]
    for lo, hi in bins:
        sel = [r for r in rows if lo <= r[0] < hi]
        if not sel:
            continue
        hit = sum(1 for r in sel if r[2] >= 0.5)
        near = sum(1 for r in sel if 0.1 <= r[2] < 0.5)
        empty = sum(1 for r in sel if r[1] < 10)
        print(f"  {lo:3d}-{hi:3d} m: {len(sel):3d} gt, {hit:3d} hit, "
              f"{near:3d} near-miss (0.1<=IoU<0.5), {empty:3d} with <10 pts")


if __name__ == "__main__":
    main()
