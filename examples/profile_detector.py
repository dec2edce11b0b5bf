#!/usr/bin/env python
"""Per-op TPU profile of the serving detector forward (the round-3 perf
target: the detector runs at ~21 % MXU and is the end-to-end wall).

Captures a jax.profiler trace of the jitted detect step at the serving
batch, parses the XPlane protobuf directly (pure-python protobuf -- the
tensorboard-plugin native wrapper in this image is incompatible), and
prints the top ops by device self-time.

  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      python examples/profile_detector.py [--batch 38] [--scale x]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KITTI = os.environ.get("LIDAR_TPU_KITTI360", "/root/reference/KITTI360_sample")


def parse_xspace(trace_dir: str, top: int = 30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        # self-time per op name over all lines (XLA op level)
        tally = defaultdict(float)
        total = 0.0
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9          # ms
                tally[name] += dur
                total += dur
        if not tally:
            continue
        print(f"\n== plane: {plane.name}  (op total {total:.3f} ms)")
        groups = defaultdict(float)
        for name, ms in tally.items():
            key = name.split(".")[0].split("_")[0]
            groups[key] += ms
        print("-- by op family --")
        for k, v in sorted(groups.items(), key=lambda kv: -kv[1])[:12]:
            print(f"  {k:<28} {v:9.3f} ms  {100 * v / total:5.1f}%")
        print(f"-- top {top} individual ops --")
        for name, ms in sorted(tally.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {name[:76]:<76} {ms:8.3f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=38)
    ap.add_argument("--scale", default="x")
    ap.add_argument("--fold", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="fold BN + store weights bf16 (serving prep)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--trace-dir", default="/tmp/jax_detector_trace")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if args.parse_only:
        parse_xspace(args.trace_dir)
        return

    from lidar_object_detection_tpu.utils.cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from lidar_object_detection_tpu.models.yolo.detector import YoloDetector
    from lidar_object_detection_tpu.models.yolo.model import YoloConfig

    det = YoloDetector((376, 1408), YoloConfig(scale=args.scale),
                       max_detections=32, fast_masks=True,
                       fold_weights=args.fold, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (args.batch, 376, 1408, 3), np.uint8)))

    out = det.detect(images)
    float(out["scores"].sum())          # relay-safe barrier

    import time
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = det.detect(images)
    float(out["scores"].sum())
    dt = (time.perf_counter() - t0) / args.iters
    print(f"detect: {dt * 1e3:.2f} ms/batch "
          f"({dt * 1e3 / args.batch:.3f} ms/frame, batch {args.batch})")

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            out = det.detect(images)
        float(out["scores"].sum())
    parse_xspace(args.trace_dir)


if __name__ == "__main__":
    main()
