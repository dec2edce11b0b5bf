#!/usr/bin/env python
"""Interactive frame-stepping 3D viewer -- the V1 blocking loop equivalent.

The reference steps through frames showing the fused cloud + matched GT
wireframes in an Open3D window and blocks on Enter between frames
(Coding_testes/V1_BBox_Pointwise_filtering.py:405-430: draw_geometries +
``input("Press Enter to continue...")``).  This driver reproduces that
loop on the TPU pipeline's analysis cloud:

* with ``open3d`` installed (optional extra -- not in this image), each
  frame opens an interactive window via viz.export.show_open3d and the
  loop blocks on Enter, exactly like the reference;
* headless (the default here), each frame is exported as a PLY scene
  (viz.export.export_fusion_scene: cloud colors + wireframe edge lists
  baked in) and the loop prints the path -- open them in any point-cloud
  tool.  Pass ``--no-pause`` to skip the Enter prompts.

Usage:
  python examples/view_ply.py --frames 100 250 --out /tmp/view
  python examples/view_ply.py --version v2_stats --mode per_car
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KITTI = os.environ.get("LIDAR_TPU_KITTI360", "/root/reference/KITTI360_sample")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default=KITTI)
    ap.add_argument("--version", default="v1_pointwise",
                    choices=["v1_pointwise", "v2_stats", "v3_erosion",
                             "v4_iou", "v5_projected"])
    ap.add_argument("--frames", type=int, nargs="*", default=None,
                    help="frame ids (default: every usable frame)")
    ap.add_argument("--mode", default="inside_outside",
                    choices=["inside_outside", "per_car"],
                    help="analysis-cloud coloring (V2:446-491 semantics)")
    ap.add_argument("--out", default="/tmp/view_ply",
                    help="PLY output dir for the headless fallback")
    ap.add_argument("--no-pause", action="store_true",
                    help="do not block on Enter between frames")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from lidar_object_detection_tpu.utils.cache import \
        enable_compilation_cache
    enable_compilation_cache()

    from lidar_object_detection_tpu.pipelines import runner
    from lidar_object_detection_tpu.viz.export import (export_fusion_scene,
                                                       show_open3d)

    pipe = getattr(runner, args.version)(args.dataset)
    frame_ids = args.frames or [
        f for f in pipe.dataset.frame_ids()
        if pipe.dataset.load_bboxes_exists(f)]

    try:
        import open3d  # noqa: F401  -- optional extra
        interactive = True
    except ImportError:
        interactive = False
        os.makedirs(args.out, exist_ok=True)
        print(f"[view] open3d not installed -- exporting PLY scenes to "
              f"{args.out} (open in any point-cloud viewer)")

    for fid in frame_ids:
        pts, colors, corners = pipe.analysis_cloud(fid, mode=args.mode)
        boxes = [{"corners_velo": c} for c in corners]
        print(f"[view] frame {fid}: {len(pts)} points, "
              f"{len(corners)} matched boxes")
        if interactive:
            # blocks until the window is closed (V1:422 draw_geometries)
            show_open3d(pts, colors, boxes)
        else:
            path = os.path.join(args.out, f"frame_{fid:010d}.ply")
            export_fusion_scene(path, pts, colors, boxes)
            print(f"[view]   -> {path}")
        if not args.no_pause:
            try:
                input("Press Enter to continue...")   # V1:429
            except EOFError:
                pass


if __name__ == "__main__":
    main()
