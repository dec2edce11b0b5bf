"""PointPillars quality run: surround grid + multi-sweep training clouds.

The front-sector grid caps overfit recall at 19/102 (only 19 GT boxes lie
inside it) and single sweeps leave 53/102 boxes with zero LiDAR points.
This run removes both ceilings: PillarsConfig.kitti360_surround() covers
+-102.4 m, and each training frame is a pose-aggregated multi-sweep cloud
(data/poses.aggregate_sweeps; 101/102 boxes contain points, 98 with >=10).

Recipe: GT-paste + global augmentation (fade for the last 15 %), cosine
LR decay, random point subsampling to --subsample per step, full-cloud
eval every 500 steps with rotated-NMS decode, recall + BEV-AP reported.

Usage: python examples/train_pointpillars_surround.py [steps] [out.json]
           [--subsample=65536] [--fade=0.85] [--frames=4] [--lr=2e-3]
           [--cache=/tmp/pp_frames.npz] [--ckpt=/tmp/pp_ckpt.msgpack]
           [--head=ssd|center] [--starve-weight=4] [--protect-starved=2048]
           [--eval-frames=auto|2903,2939]

``--eval-frames`` switches from the legacy 4-frame overfit gate to a REAL
held-out split over every usable sample frame (spatial_split: train on
17, evaluate on the 2 most ego-separated; GT-paste database built from
train frames only).  Reported alongside overall held-out recall is
``heldout_clean_recall`` over eval boxes outside every train frame's grid
footprint -- the leakage-free subset.  Recommended quality run:

  python examples/train_pointpillars_surround.py 8000 /tmp/pp_split.json \
      --eval-frames=auto --protect-starved=2048 \
      --cache=/tmp/pp_frames_split.npz --ckpt=/tmp/pp_split_ckpt.msgpack

``--cache`` memoizes the pose-aggregated clouds (the aggregation +
GT-database build costs ~8 min); ``--ckpt`` saves train state after every
eval chunk and resumes from it on restart, so a killed run loses at most
one chunk.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

from lidar_object_detection_tpu.models.pointpillars import (
    PillarsConfig, decode_predictions)
from lidar_object_detection_tpu.pipelines.pointpillars import (
    bev_average_precision as bev_ap)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    steps = int(args[0]) if args else 8000
    out_path = args[1] if len(args) > 1 else "/tmp/pp_surround.json"

    def flag_val(name, default, cast=float):
        for f in flags:
            if f.startswith(f"--{name}="):
                return cast(f.split("=", 1)[1])
        return default

    # --platform=cpu: pin the backend before first use (the image's
    # sitecustomize overrides a plain JAX_PLATFORMS env var)
    platform = flag_val("platform", "", str)
    if platform:
        jax.config.update("jax_platforms", platform)
    from lidar_object_detection_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    subsample = flag_val("subsample", 65536, int)
    fade = flag_val("fade", 0.85, float)
    n_frames = flag_val("frames", 4, int)
    lr_peak = flag_val("lr", 2e-3, float)
    eval_points = flag_val("eval-points", 1 << 18, int)
    cache_path = flag_val("cache", "", str)
    ckpt_path = flag_val("ckpt", "", str)
    head = flag_val("head", "ssd", str)
    starve_w = flag_val("starve-weight", 0.0, float)
    # --eval-frames=2903,2939 (or "auto"): REAL train/eval split over all
    # usable sample frames -- train on the rest, evaluate on the held-out
    # aggregated clouds (pipelines.pointpillars.spatial_split; the 4-frame
    # default below is the legacy overfit gate).  "auto" picks the eval
    # pair maximizing ego separation (103 m -> frames 2903+2939).
    eval_frames_flag = flag_val("eval-frames", "", str)
    no_augment = "--no-augment" in flags   # pure clean-frame overfit polish
    # protect-starved=T: points inside GT boxes holding <= T points are
    # exempt from the per-step random subsample.  Root cause this fixes:
    # uniform subsampling to --subsample keeps ~25 % of each cloud, so a
    # distant box with < 10 aggregate points has most training steps see
    # ZERO of them -- its pillars are empty and (for the conv-only center
    # head especially) no peak can form.  Applied where the clean-frame
    # index mapping holds (polish + post-fade global phase).
    protect_thresh = flag_val("protect-starved", 0, int)

    root = "/root/reference/KITTI360_sample"
    chunk = 500
    import dataclasses
    cfg = dataclasses.replace(PillarsConfig.kitti360_surround(), head=head,
                              starve_weight=starve_w)
    t0 = time.time()
    report = {"chunks": [], "config": {
        "steps": steps, "subsample": subsample, "fade": fade,
        "frames": n_frames, "lr_peak": lr_peak, "head": head,
        "starve_weight": starve_w, "protect_starved": protect_thresh,
        "grid": "kitti360_surround"}}
    try:
        with open(out_path) as f:
            report["chunks"] = json.load(f).get("chunks", [])
    except (OSError, ValueError):
        pass

    from lidar_object_detection_tpu.pipelines import pointpillars as pp
    from lidar_object_detection_tpu.config import ShapeConfig
    from lidar_object_detection_tpu.data.kitti360 import Kitti360Dataset
    from lidar_object_detection_tpu.models.pointpillars import PillarsTrainer
    from lidar_object_detection_tpu.models.pointpillars.augment import (
        GtDatabase, augment_frame, global_augment)
    from lidar_object_detection_tpu.parallel.mesh import make_mesh
    import optax

    import os
    ds = Kitti360Dataset(root, shapes=ShapeConfig())
    split = None
    if eval_frames_flag:
        ev = (None if eval_frames_flag == "auto"
              else [int(x) for x in eval_frames_flag.split(",")])
        split = pp.spatial_split(ds, eval_frames=ev, grid=cfg.grid)
        targets = split.train + split.eval
        report["config"]["split"] = split.summary()
        print(f"split: {json.dumps(split.summary())}", flush=True)
    else:
        targets = ds.frame_ids()[:n_frames]

    # cache key: frame ids AND the aggregation knobs — a cache built at a
    # different max_points/protect level would otherwise load silently
    # (e.g. a 32k-point smoke cache feeding an 8000-step split run)
    cache_meta = np.asarray([eval_points, protect_thresh], np.int64)
    cached = None
    if cache_path and os.path.exists(cache_path):
        z = np.load(cache_path)
        ids = list(z["ids"]) if "ids" in z else None
        meta = list(z["meta"]) if "meta" in z else None
        # caches from before the 'meta' key always rebuild (meta is None)
        if ids == targets and meta == list(cache_meta):
            nf = int(z["n"])
            cached = [(z[f"p{i}"], z[f"b{i}"]) for i in range(nf)]
            print(f"loaded {nf} cached aggregated frames from {cache_path}",
                  flush=True)
        else:
            print(f"cache {cache_path} is for frames {ids} "
                  f"meta={meta} (want {list(cache_meta)}); rebuilding",
                  flush=True)
    if cached is not None:
        frames = cached
    else:
        print(f"aggregating {len(ds.frame_ids())} sweeps into "
              f"{len(targets)} target frames...", flush=True)
        frames = pp.load_aggregated_frames(ds, targets, grid=cfg.grid,
                                           max_points=eval_points,
                                           protect_in_box=protect_thresh)
        if cache_path:
            arrs = {"n": np.int32(len(frames)),
                    "ids": np.asarray(targets, np.int64),
                    "meta": cache_meta}
            for i, (p, b) in enumerate(frames):
                arrs[f"p{i}"], arrs[f"b{i}"] = p, b
            np.savez(cache_path, **arrs)
    # index ranges: with a split, training samples ONLY train frames and
    # evaluation runs ONLY on the held-out tail
    train_idx = list(range(len(split.train))) if split else list(
        range(len(frames)))
    eval_idx = (list(range(len(split.train), len(frames))) if split
                else list(range(len(frames))))
    for (p, b) in frames:
        print(f"  {len(p)} pts, {len(b)} gt boxes", flush=True)
    prot_idx = rest_idx = None
    if protect_thresh > 0:
        # per clean frame: indices of points inside starved GT boxes
        # (count <= protect_thresh); AABB-prefiltered rotated membership,
        # same box7 convention as examples/diagnose_pp_ckpt.py
        prot_idx, rest_idx = [], []
        for (p, bx) in frames:
            keep = []
            for b in np.asarray(bx, np.float32).reshape(-1, 7):
                d0 = p[:, 0] - b[0]
                d1 = p[:, 1] - b[1]
                r = float(np.hypot(b[3], b[4])) / 2
                cand = np.nonzero((np.abs(d0) <= r) & (np.abs(d1) <= r))[0]
                if len(cand) == 0 or len(cand) > 8 * protect_thresh:
                    continue
                c, si = np.cos(b[6]), np.sin(b[6])
                lx = d0[cand] * c + d1[cand] * si
                ly = -d0[cand] * si + d1[cand] * c
                inb = ((np.abs(lx) <= b[4] / 2) & (np.abs(ly) <= b[3] / 2)
                       & (p[cand, 2] >= b[2] - b[5] / 2)
                       & (p[cand, 2] <= b[2] + b[5] / 2))
                idx = cand[inb]
                if 0 < len(idx) <= protect_thresh:
                    keep.append(idx)
            pr = (np.unique(np.concatenate(keep)) if keep
                  else np.zeros(0, np.int64))
            prot_idx.append(pr)
            rest_idx.append(np.setdiff1d(np.arange(len(p)), pr,
                                         assume_unique=False))
        print("protect-starved: " + ", ".join(
            f"{len(pr)}/{len(p)}" for pr, (p, _) in zip(prot_idx, frames)),
            flush=True)

    # GT-paste database from TRAIN frames only (pasting eval cars into
    # training clouds would be direct label leakage under a split)
    db = GtDatabase.build([frames[i] for i in train_idx])
    print(f"gt database: {len(db)} cut-outs from {len(train_idx)} train "
          f"frames ({time.time() - t0:.0f}s)", flush=True)
    MAX_GT = pp.MAX_GT

    mesh = make_mesh(jax.devices()[:1])
    schedule = optax.cosine_decay_schedule(lr_peak, max(steps, 1),
                                           alpha=0.05)
    trainer = PillarsTrainer(cfg, mesh, num_points=subsample,
                             learning_rate=schedule)

    from flax import serialization
    from lidar_object_detection_tpu.parallel.train import TrainState
    start_step = 0
    if ckpt_path and os.path.exists(ckpt_path):
        with open(ckpt_path, "rb") as f:
            tmpl = (trainer.state.variables, trainer.state.opt_state,
                    trainer.state.step)
            v, o, s = serialization.from_bytes(tmpl, f.read())
        trainer.state = TrainState(variables=v, opt_state=o, step=s)
        start_step = int(np.asarray(s))
        print(f"resumed from {ckpt_path} at step {start_step}", flush=True)

    def save_ckpt():
        if not ckpt_path:
            return
        st = jax.device_get((trainer.state.variables,
                             trainer.state.opt_state, trainer.state.step))
        tmp = ckpt_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(st))
        os.replace(tmp, ckpt_path)
        # sidecar: grid/head metadata so pointpillars-infer can reject a
        # mismatched config loudly (pipelines.load_pillars_variables)
        from lidar_object_detection_tpu.pipelines.pointpillars import (
            pillars_config_meta)
        with open(ckpt_path + ".json", "w") as f:
            json.dump(pillars_config_meta(cfg), f)

    # full-cloud eval batch (clean frames, deterministic; under a split:
    # ONLY the held-out frames)
    n_eval = len(eval_idx)
    e_pts, e_pv, e_gt, _, e_gv = pp.pack_frames(
        [frames[i] for i in eval_idx], eval_points, MAX_GT)

    def evaluate(score_threshold=0.1):
        out = trainer.apply(e_pts, e_pv)
        matched = total_gt = total_det = 0
        clean_matched = clean_total = 0
        dets, gts = [], []
        for i in range(n_eval):
            one = jax.tree_util.tree_map(lambda x: x[i], out)
            det = decode_predictions(one, cfg,
                                     score_threshold=score_threshold,
                                     rotated_nms=True)
            r = pp.evaluate_bev(det, e_gt[i], e_gv[i], iou_threshold=0.5,
                                exact=True)
            matched += r.matched
            total_gt += r.total_gt
            total_det += r.total_det
            if split is not None:
                # non-overlapped subset: eval boxes outside every train
                # frame's grid footprint (annotation order, MAX_GT-capped)
                ov = split.overlap_masks[split.eval[i]][:MAX_GT]
                clean = e_gv[i].copy()
                clean[:len(ov)] &= ~ov
                clean_total += int(clean.sum())
                clean_matched += int((r.matched_gt & clean).sum())
            ok = np.asarray(det["valid"])
            dets.append((np.asarray(det["boxes7"])[ok],
                         np.asarray(det["scores"])[ok]))
            gts.append(e_gt[i][e_gv[i]])
        clean = (f"{clean_matched}/{clean_total}" if split is not None
                 else None)
        return matched, total_gt, total_det, bev_ap(dets, gts), clean

    import queue
    import threading

    batch_q: "queue.Queue" = queue.Queue(maxsize=4)
    fade_step = int(steps * fade)

    def producer():
        prng = np.random.default_rng(1 + start_step)
        s = start_step
        while s < steps:
            sel = [train_idx[int(prng.integers(len(train_idx)))]
                   for _ in range(4)]
            b = len(sel)
            pts = np.zeros((b, subsample, 4), np.float32)
            pv = np.zeros((b, subsample), bool)
            gt = np.zeros((b, MAX_GT, 7), np.float32)
            gcls = np.zeros((b, MAX_GT), np.int32)
            gv = np.zeros((b, MAX_GT), bool)
            for j, i in enumerate(sel):
                p, bx = frames[i]
                mapping_intact = no_augment or s >= fade_step
                if no_augment:
                    pass
                elif s < fade_step:
                    room = max(0, MAX_GT - bx.shape[0])
                    p, bx = augment_frame(p, bx, db, prng,
                                          max_samples=min(12, room))
                else:
                    p, bx = global_augment(p, bx, prng)
                if len(p) > subsample:
                    if (prot_idx is not None and mapping_intact
                            and 0 < len(prot_idx[i]) < subsample):
                        take = subsample - len(prot_idx[i])
                        idx = np.concatenate([
                            prot_idx[i],
                            prng.choice(rest_idx[i], take, replace=False)])
                    else:
                        idx = prng.choice(len(p), subsample, replace=False)
                    p = p[idx]
                k = len(p)
                pts[j, :k] = p
                pv[j, :k] = True
                g = min(len(bx), MAX_GT)
                gt[j, :g] = bx[:g]
                gv[j, :g] = True
            batch_q.put((pts, pv, gt, gcls, gv))
            s += 1

    threading.Thread(target=producer, daemon=True).start()

    step = start_step
    while step < steps:
        losses = []
        m = None
        for _ in range(chunk):
            m = trainer.train_step(*batch_q.get())
            step += 1
            if step % 50 == 0 or step == 1:
                loss = float(m["loss"])
                losses.append(loss)
                print(f"step {step}: loss={loss:.4f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
            if step >= steps:
                break
        if not losses:
            losses.append(float(m["loss"]))
        save_ckpt()
        matched, total_gt, total_det, ap, clean = evaluate()
        entry = {"step": step, "loss": losses[-1],
                 "mean_loss": float(np.mean(losses)),
                 "recall": f"{matched}/{total_gt}",
                 "precision": (matched / total_det) if total_det else 0.0,
                 "bev_ap_050": ap,
                 "elapsed_s": round(time.time() - t0, 1)}
        if clean is not None:
            entry["heldout_clean_recall"] = clean
        report["chunks"].append(entry)
        print(json.dumps(entry), flush=True)
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    print("DONE", json.dumps(report["chunks"][-1]))


if __name__ == "__main__":
    main()
