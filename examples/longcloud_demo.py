#!/usr/bin/env python
"""Long-context fusion at scale: a >= 1M-point multi-sweep aggregate
through the full jitted fusion step (SURVEY.md §5.7 stretch).

Builds the 20-sweep pose-aggregated cloud for a target frame (no point
cap -- the bundled sample aggregates to ~2.3M points), pushes it through
``fuse_frame`` on the real chip, and reports ms/cloud + points/s at
steady state.  The point axis is the CP/SP analogue: the same step runs
point-sharded over a multi-chip mesh (`parallel.point_sharded_fuse_frame`,
validated on the 8-device virtual CPU mesh by the driver dryrun); on one
chip the chunked `lax.scan` reduction bounds live memory the same way.

  python examples/longcloud_demo.py [--frame 100] [--sweeps 20] [--iters 5]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frame", type=int, default=100)
    ap.add_argument("--sweeps", type=int, default=20)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--min-points", type=int, default=1 << 20)
    args = ap.parse_args()

    from lidar_object_detection_tpu.utils.cache import \
        enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from lidar_object_detection_tpu.config import FusionConfig, \
        PipelineVersion
    from lidar_object_detection_tpu.data import Kitti360Dataset
    from lidar_object_detection_tpu.data.poses import aggregate_sweeps
    from lidar_object_detection_tpu.fusion import FusionParams, fuse_frame
    from lidar_object_detection_tpu.models.stub import StubDetector

    cfg = FusionConfig.for_version(PipelineVersion.CSV_EVAL)
    ds = Kitti360Dataset(KITTI, shapes=cfg.shapes)
    ids = ds.frame_ids()[:args.sweeps]
    agg = aggregate_sweeps(ds, target_frame=args.frame, source_frames=ids)
    p = len(agg.points)
    assert p >= args.min_points, f"aggregate only {p} points"
    print(f"[longcloud] {p:,} points from {args.sweeps} sweeps "
          f"({int(agg.point_valid.sum()):,} valid)", flush=True)

    rec = ds.load_frames([args.frame])[0]
    batch = ds.make_batch([rec])
    det = StubDetector(ds.camera,
                       corners_to_cam=ds.transforms.corners_cam0_to_cam
                       ).detect_records([rec])
    params = FusionParams.from_config(cfg)
    t = ds.transforms

    fuse = jax.jit(lambda pts, pv, mb, dv, c, bv: fuse_frame(
        pts, pv, mb, dv, c, bv,
        jnp.asarray(t.velo_to_rect, jnp.float32),
        jnp.asarray(t.corners_to_velo, jnp.float32),
        jnp.asarray(ds.camera.intrinsics, jnp.float32), params))

    d_args = (jax.device_put(jnp.asarray(agg.points, jnp.float32)),
              jax.device_put(jnp.asarray(agg.point_valid)),
              jax.device_put(jnp.asarray(det["mask_bits"][0])),
              jax.device_put(jnp.asarray(det["det_valid"][0])),
              jax.device_put(jnp.asarray(batch.corners_cam0[0])),
              jax.device_put(jnp.asarray(batch.box_valid[0])))

    out = fuse(*d_args)
    # axon relay: block_until_ready does not block; host-read instead
    total = float(out["total_points"].sum())

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fuse(*d_args)
    float(out["total_points"].sum())
    dt = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "metric": "longcloud_fuse_ms_per_cloud",
        "points": p,
        "value_ms": round(dt * 1e3, 2),
        "points_per_sec": round(p / dt / 1e6, 1),
        "unit": "Mpts/s",
        "detections_points": int(total),
    }))


if __name__ == "__main__":
    main()
