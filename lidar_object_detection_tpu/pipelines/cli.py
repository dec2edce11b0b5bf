"""Command-line interface -- the framework's answer to the reference's
``python V1_BBox_Pointwise_filtering.py`` style entry points.

  python -m lidar_object_detection_tpu run --version csv_eval \
      --dataset /path/to/KITTI360_sample --output results/

Subcommands: ``run`` (any fusion pipeline version), ``depth-maps``
(per-car depth-map PNG export), ``kitti2d`` (2D detection eval), ``bench``.
"""

from __future__ import annotations

import argparse
import os
import sys

from lidar_object_detection_tpu.config import PipelineVersion


def _add_common(p, detector: bool = True):
    p.add_argument("--dataset", required=True,
                   help="KITTI-360 root (contains calibration/, data_3d_raw/...)")
    p.add_argument("--frames", type=int, nargs="*", default=None,
                   help="frame ids (default: all)")
    if detector:
        p.add_argument("--detector", choices=["stub", "yolo"], default="stub",
                       help="stub = GT-derived synthetic detections; yolo = "
                            "Flax YOLOv11-seg (needs --weights for real "
                            "accuracy)")
        p.add_argument("--weights", default=None,
                       help="yolo weights: an orbax dir (convert-weights), a "
                            ".pt/.safetensors state dict, or a distilled "
                            "msgpack checkpoint "
                            "(examples/train_yolo_distill.py)")
        p.add_argument("--yolo-scale", default=None, choices=list("nsmlx"),
                       help="yolo scale (default: x, or the checkpoint "
                            "sidecar's scale for msgpack weights)")
        p.add_argument("--conf", type=float, default=None,
                       help="yolo confidence threshold (default 0.25)")
        p.add_argument("--mask-thr", type=float, default=None,
                       help="mask binarization threshold (default 0.5 = "
                            "ultralytics; 0.9 is the sweep-selected "
                            "serving point for the distilled checkpoints, "
                            "see examples/quality_knob_sweep.py)")
        p.add_argument("--mask-floor", type=float, default=None,
                       help="guarded shrink: fallback threshold for "
                            "detections --mask-thr leaves near-empty "
                            "(PostprocessParams.mask_threshold_floor)")
        p.add_argument("--mask-min-pixels", type=int, default=None,
                       help="guarded shrink: pixel count under which a "
                            "detection falls back to --mask-floor")
        p.add_argument("--tta", default=None, choices=["none", "hflip"],
                       help="test-time augmentation: hflip averages the "
                            "two views' mask probability fields per "
                            "IoU-matched detection before binarization "
                            "(2x detector compute; models/yolo/tta.py)")


def _build_detector(args, dataset):
    if args.detector == "stub":
        return None
    from lidar_object_detection_tpu.models.yolo.detector import YoloDetector
    from lidar_object_detection_tpu.models.yolo.model import YoloConfig
    from lidar_object_detection_tpu.models.yolo.serving import \
        resolve_serving
    from lidar_object_detection_tpu.models.yolo.weights import (
        convert_state_dict, load_state_dict_file)

    is_msgpack = bool(args.weights) and args.weights.endswith(".msgpack")
    if is_msgpack:
        # sweep-selected serving params recorded by the checkpoint
        # sidecar (examples/quality_knob_sweep.py); explicit flags win --
        # one shared resolver with bench/regen (models/yolo/serving.py)
        resolved = resolve_serving(
            args.weights, scale=args.yolo_scale, conf=args.conf,
            mask_threshold=getattr(args, "mask_thr", None),
            mask_threshold_floor=getattr(args, "mask_floor", None),
            mask_min_pixels=getattr(args, "mask_min_pixels", None),
            tta=getattr(args, "tta", None),
            default_scale="x")
    else:
        resolved = {"scale": args.yolo_scale or "x", "conf": args.conf,
                    "mask_threshold": getattr(args, "mask_thr", None)
                    or 0.5,
                    "mask_threshold_floor": getattr(args, "mask_floor",
                                                    None),
                    "mask_min_pixels": getattr(args, "mask_min_pixels",
                                               None) or 0,
                    "tta": getattr(args, "tta", None) or "none"}
    kw = {"mask_threshold": resolved["mask_threshold"],
          "mask_threshold_floor": resolved["mask_threshold_floor"],
          "mask_min_pixels": resolved["mask_min_pixels"],
          "tta": resolved["tta"]}
    if resolved["conf"] is not None:
        kw["conf"] = resolved["conf"]
    det = YoloDetector((dataset.camera.height, dataset.camera.width),
                       YoloConfig(scale=resolved["scale"]), **kw)
    if is_msgpack:
        # distilled checkpoint (examples/train_yolo_distill.py)
        from flax import serialization
        with open(args.weights, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        det.variables = raw["variables"]
        return det
    if args.weights:
        if os.path.isdir(args.weights):
            import orbax.checkpoint as ocp
            from lidar_object_detection_tpu.parallel.checkpoint import (
                CheckpointManager)
            mgr = CheckpointManager(args.weights)
            step = mgr.latest_step()
            if step is None:
                raise SystemExit(
                    f"no orbax checkpoint found under {args.weights} "
                    "(run convert-weights first)")
            restored = mgr._mgr.restore(
                step, args=ocp.args.StandardRestore(
                    {"variables": det.variables}))
            det.variables = restored["variables"]
        else:
            sd = load_state_dict_file(args.weights)
            det.variables = convert_state_dict(sd, det.variables)
    return det


def _select_platform(platform: str | None) -> None:
    """Pin the JAX backend before first use.

    The deployment image's sitecustomize registers the TPU backend for
    every process, so a plain ``JAX_PLATFORMS`` env var set by the user is
    ignored once jax initialises; ``jax.config`` wins over both.  Called
    before any jax computation so ``--platform cpu`` (or
    ``LIDAR_TPU_PLATFORM=cpu``) gives a working CPU run on a machine whose
    TPU is busy or unreachable.
    """
    platform = platform or os.environ.get("LIDAR_TPU_PLATFORM")
    if platform and platform != "default":
        import jax

        jax.config.update("jax_platforms", platform)


def main(argv=None) -> int:
    from lidar_object_detection_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser(prog="lidar_object_detection_tpu")
    parser.add_argument(
        "--platform", default=None,
        help="JAX backend to run on (e.g. cpu, tpu, axon; default: the "
             "process default). Also settable via LIDAR_TPU_PLATFORM. Must "
             "precede the subcommand.")
    sub = parser.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="run a fusion pipeline version")
    _add_common(run_p)
    run_p.add_argument("--version", default="csv_eval",
                       choices=[v.value for v in PipelineVersion
                                if v not in (PipelineVersion.DEPTH_MAPS,
                                             PipelineVersion.KITTI2D_EVAL)])
    run_p.add_argument("--output", default="results",
                       help="output dir (master CSV, PLY exports)")
    run_p.add_argument("--export-ply", action="store_true")
    run_p.add_argument(
        "--analysis-cloud", choices=["inside_outside", "car_color"],
        default=None,
        help="export the V2 per-point bbox-analysis cloud (green/red "
             "inside-outside labels, or the reference's car colors)")

    dm_p = sub.add_parser("depth-maps", help="per-car depth-map export")
    _add_common(dm_p)
    dm_p.add_argument("--output", default="Predictions")

    es_p = sub.add_parser("erosion-study",
                          help="erosion vs no-erosion comparison (the "
                               "reference's results workbook)")
    _add_common(es_p)
    es_p.add_argument("--output", default="results")

    pp_p = sub.add_parser("pointpillars-train",
                          help="train the pure-LiDAR PointPillars on the "
                               "bundled sample")
    _add_common(pp_p, detector=False)
    pp_p.add_argument("--steps", type=int, default=50)
    pp_p.add_argument("--checkpoint-dir", default=None)
    pp_p.add_argument("--surround", action="store_true",
                      help="360-degree KITTI-360 grid "
                           "(PillarsConfig.kitti360_surround)")
    pp_p.add_argument("--aggregate-sweeps", action="store_true",
                      help="train on pose-aggregated multi-sweep clouds "
                           "(data/poses.py)")
    pp_p.add_argument("--max-points", type=int, default=None,
                      help="subsample training clouds to this many points")
    pp_p.add_argument("--head", default="ssd", choices=("ssd", "center"),
                      help="detection head family: anchor-based SSD or the "
                           "CenterPoint heatmap head (NMS-free decode)")

    pi_p = sub.add_parser("pointpillars-infer",
                          help="run a trained PointPillars checkpoint over "
                               "dataset frames (detections JSON + optional "
                               "PLY scenes)")
    _add_common(pi_p, detector=False)
    pi_p.add_argument("--ckpt", required=True,
                      help="checkpoint from the surround training runner "
                           "(flax msgpack of (variables, opt_state, step))")
    pi_p.add_argument("--output", default="pp_detections")
    pi_p.add_argument("--surround", action="store_true")
    pi_p.add_argument("--aggregate-sweeps", action="store_true")
    pi_p.add_argument("--head", default="ssd", choices=("ssd", "center"))
    pi_p.add_argument("--score-threshold", type=float, default=0.3)
    pi_p.add_argument("--max-points", type=int, default=None)
    pi_p.add_argument("--export-ply", action="store_true")

    cw_p = sub.add_parser("convert-weights",
                          help="torch state dict -> orbax checkpoint for "
                               "the Flax YOLOv11-seg")
    cw_p.add_argument("--state-dict", required=True,
                      help="torch-saved raw state dict (.pt)")
    cw_p.add_argument("--output", required=True, help="orbax checkpoint dir")
    cw_p.add_argument("--scale", default="x", choices=list("nsmlx"))
    cw_p.add_argument("--image-shape", type=int, nargs=2, default=(376, 1408))

    k2_p = sub.add_parser("kitti2d", help="KITTI 2D detection eval")
    k2_p.add_argument("--dataset", required=True,
                      help="KITTI_Selection root (images/ labels/ calib/)")
    k2_p.add_argument("--output", default="results")
    k2_p.add_argument("--conf", type=float, default=0.5)

    args = parser.parse_args(argv)
    _select_platform(args.platform)

    if args.cmd == "convert-weights":
        from lidar_object_detection_tpu.models.yolo.detector import YoloDetector
        from lidar_object_detection_tpu.models.yolo.model import YoloConfig
        from lidar_object_detection_tpu.models.yolo.weights import (
            convert_state_dict, load_state_dict_file)
        from lidar_object_detection_tpu.parallel.checkpoint import (
            CheckpointManager)
        det = YoloDetector(tuple(args.image_shape),
                           YoloConfig(scale=args.scale))
        sd = load_state_dict_file(args.state_dict)
        variables = convert_state_dict(sd, det.variables)
        CheckpointManager(args.output).save_detector_variables(variables)
        print(f"converted {len(sd)} tensors -> {args.output}")
        return 0

    if args.cmd == "erosion-study":
        from lidar_object_detection_tpu.data.kitti360 import Kitti360Dataset
        from lidar_object_detection_tpu.eval.erosion_study import (
            run_erosion_study)
        os.makedirs(args.output, exist_ok=True)
        ds = Kitti360Dataset(args.dataset)
        res = run_erosion_study(
            args.dataset, frame_ids=args.frames,
            detector=_build_detector(args, ds),
            output_csv=os.path.join(args.output, "erosion_study.csv"),
            output_xlsx=os.path.join(args.output,
                                     "master_car_statistics.csv.xlsx"))
        print("erosion study:", res.summary())
        return 0

    if args.cmd == "pointpillars-train":
        from lidar_object_detection_tpu.pipelines.pointpillars import (
            train_pointpillars)
        out = train_pointpillars(args.dataset, steps=args.steps,
                                 frame_ids=args.frames,
                                 checkpoint_dir=args.checkpoint_dir,
                                 surround=args.surround,
                                 aggregate=args.aggregate_sweeps,
                                 max_points=args.max_points,
                                 head=args.head)
        evals = out["eval"]
        last = (f"{out['loss_history'][-1]:.4f}" if out["loss_history"]
                else "n/a (0 steps)")
        print(f"final loss: {last}; eval "
              f"recall={sum(e.matched for e in evals)}/"
              f"{sum(e.total_gt for e in evals)}")
        return 0

    if args.cmd == "pointpillars-infer":
        from lidar_object_detection_tpu.pipelines.pointpillars import (
            infer_pointpillars)
        dets = infer_pointpillars(
            args.dataset, args.ckpt, frame_ids=args.frames,
            surround=args.surround, aggregate=args.aggregate_sweeps,
            head=args.head, max_points=args.max_points,
            score_threshold=args.score_threshold, output_dir=args.output,
            export_ply=args.export_ply)
        total = sum(len(d["boxes7"]) for d in dets)
        print(f"{len(dets)} frames, {total} detections -> {args.output}")
        return 0

    if args.cmd == "kitti2d":
        from lidar_object_detection_tpu.pipelines.kitti2d import run_kitti2d_eval
        result = run_kitti2d_eval(args.dataset, output_dir=args.output,
                                  conf=args.conf)
        t = result.totals
        print(f"TP: {t['tp']}  FP: {t['fp']}  FN: {t['fn']}")
        print(f"Precision: {t['precision']:.2f}  Recall: {t['recall']:.2f}")
        return 0

    from lidar_object_detection_tpu.data.kitti360 import Kitti360Dataset
    from lidar_object_detection_tpu.pipelines import runner

    if args.cmd == "depth-maps":
        from lidar_object_detection_tpu.config import FusionConfig
        cfg = FusionConfig.for_version(PipelineVersion.DEPTH_MAPS)
        ds = Kitti360Dataset(args.dataset, shapes=cfg.shapes)
        pipe = runner.FusionPipeline(ds, cfg, _build_detector(args, ds))
        os.makedirs(args.output, exist_ok=True)
        from lidar_object_detection_tpu.viz.overlay import depth_map_figure
        count = 0
        for frame_id, car_id, dm, seg in pipe.depth_maps(args.frames):
            path = os.path.join(
                args.output, f"{frame_id:010d},depth_map_car_{car_id:02d}_.png")
            if seg is None:
                seg = __import__("numpy").zeros((*dm.shape, 3), "uint8")
            depth_map_figure(dm, seg, car_id, frame_id, path)
            count += 1
        print(f"wrote {count} depth maps to {args.output}")
        return 0

    # cmd == run
    version = PipelineVersion(args.version)
    from lidar_object_detection_tpu.config import FusionConfig
    cfg = FusionConfig.for_version(version)
    ds = Kitti360Dataset(args.dataset, shapes=cfg.shapes)
    pipe = runner.FusionPipeline(ds, cfg, _build_detector(args, ds))
    os.makedirs(args.output, exist_ok=True)
    master_csv = (os.path.join(args.output, "master_car_statistics.csv")
                  if version in (PipelineVersion.CSV_EVAL,
                                 PipelineVersion.V2_STATS,
                                 PipelineVersion.V3_EROSION) else None)
    result = pipe.run(args.frames, master_csv=master_csv)

    print(f"processed {len(result.frames)} frames in {result.elapsed_s:.3f}s "
          f"({result.frames_per_s:.1f} frames/s)")
    s = result.summary()
    print(f"cars: {s['total_cars']}  matched: {s['matched']}  "
          f"avg inside%: {s['avg_inside_pct']:.2f}")
    for fr in result.frames:
        n_matched = sum(1 for p in fr.matched_pairs
                        if not p.get("unmatched"))
        print(f"frame {fr.frame_id}: {fr.num_detections} detections, "
              f"{fr.num_visible_boxes} visible boxes, {n_matched} matched")
    if master_csv:
        from lidar_object_detection_tpu.eval.statistics import analyze_master_csv
        print("analysis:", analyze_master_csv(master_csv))
    if args.export_ply:
        from lidar_object_detection_tpu.viz.export import export_fusion_scene
        records = ds.load_frames(args.frames)
        batch = ds.make_batch(records)
        for fr, rec in zip(result.frames, records):
            path = os.path.join(args.output, f"frame_{fr.frame_id:010d}.ply")
            export_fusion_scene(path, rec.points[:, :3], None,
                                fr.matched_pairs)
        print(f"PLY scenes written to {args.output}")
    if args.analysis_cloud:
        from lidar_object_detection_tpu.viz.export import write_ply
        for fr in result.frames:
            pts, colors, _ = pipe.analysis_cloud(fr.frame_id,
                                                 mode=args.analysis_cloud)
            path = os.path.join(args.output,
                                f"analysis_{fr.frame_id:010d}.ply")
            write_ply(path, pts, colors)
        print(f"analysis clouds written to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
