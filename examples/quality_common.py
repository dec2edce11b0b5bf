"""Shared stage-1 scaffolding for the serving-side quality experiments.

`quality_knob_sweep.py` (in-sample grid sweep) and
`quality_threshold_cv.py` (leave-one-frame-out validation of the same
grid) must evaluate every configuration under the IDENTICAL protocol --
same dataset batch, same single network forward, same decode path, same
two fusion runs and reference matching semantics -- or their comparison
in PERFORMANCE.md stops meaning anything.  Both scripts previously
carried a verbatim copy of this stage; this module is the single copy.

Protocol (reference: cvs_erosion.py:298-379 run twice, V2 vs CSV_EVAL
configs; workbook kept 61/72 matched rows):
  1. network forward ONCE over the full sample (the expensive half);
  2. per configuration: decode/NMS/mask assembly + BOTH fusion runs
     (raw + eroded) + the matched-in-both join.
"""

from __future__ import annotations

import time
from types import SimpleNamespace


def prepare_study(ckpt: str, dataset: str, platform: str | None = None,
                  log=print, **detector_kw) -> SimpleNamespace:
    """Load the checkpoint, build the pipelines, run the forward once.

    Extra keyword args pass through to ``YoloDetector`` (e.g.
    ``imgsz=896`` for the input-resolution probe); the forward and every
    ``rows_for`` decode then run at that detector's letterbox spec.
    """
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    from lidar_object_detection_tpu.utils.cache import \
        enable_compilation_cache
    enable_compilation_cache()

    import jax.numpy as jnp

    from lidar_object_detection_tpu.config import (FusionConfig,
                                                   PipelineVersion)
    from lidar_object_detection_tpu.data import Kitti360Dataset
    from lidar_object_detection_tpu.models.yolo.postprocess import \
        letterbox_image
    from lidar_object_detection_tpu.models.yolo.serving import \
        load_serving_checkpoint
    from lidar_object_detection_tpu.pipelines.runner import FusionPipeline

    det0, _, resolved = load_serving_checkpoint(ckpt, **detector_kw)
    cfg_raw = FusionConfig.for_version(PipelineVersion.V2_STATS)
    cfg_ero = FusionConfig.for_version(PipelineVersion.CSV_EVAL)
    ds = Kitti360Dataset(dataset, shapes=cfg_raw.shapes)
    records = ds.load_frames()
    batch = ds.make_batch(records)
    images = ds.load_images(batch)
    spec, model = det0.spec, det0.model
    log(f"[quality] {len(records)} frames, ckpt={ckpt} "
        f"({resolved['scale']}, letterbox {spec.dst_h}x{spec.dst_w})",
        flush=True)

    @jax.jit
    def forward(variables, images):
        imgs = images.astype(model.dtype) / jnp.asarray(255.0, model.dtype)
        lb = jax.vmap(lambda im: letterbox_image(im, spec))(imgs)
        return model.apply(variables, lb)

    t0 = time.time()
    raw_out = jax.device_get(forward(det0.variables, jnp.asarray(images)))
    log(f"[quality] forward pass: {time.time() - t0:.1f}s", flush=True)

    return SimpleNamespace(
        scale=resolved["scale"], n_frames=len(records), spec=spec,
        raw_out=raw_out,
        # extra handles for probes that need more than the one forward
        # (e.g. the flip-TTA probe re-runs it on mirrored images)
        det=det0, images=images,
        run_forward=lambda imgs: jax.device_get(
            forward(det0.variables, jnp.asarray(imgs))),
        pipe_raw=FusionPipeline(ds, cfg_raw, det0),
        pipe_ero=FusionPipeline(ds, cfg_ero, det0))


def rows_for(ctx: SimpleNamespace, conf: float, mask_threshold: float,
             upsample: str = "prob", threshold_mode: str = "absolute",
             floor: float | None = None, min_pixels: int = 0):
    """Decode at one configuration and run both fusion passes; returns the
    matched-in-both joined per-car rows (eval/erosion_study.join_runs)."""
    import jax
    import numpy as np

    from lidar_object_detection_tpu.models.yolo.postprocess import (
        PostprocessParams, postprocess_single)

    pp = PostprocessParams(
        spec=ctx.spec, conf_threshold=conf, mask_threshold=mask_threshold,
        mask_upsample=upsample, mask_threshold_mode=threshold_mode,
        mask_threshold_floor=floor, mask_min_pixels=min_pixels,
        max_detections=32)
    post = jax.jit(jax.vmap(lambda one: postprocess_single(one, pp)))
    det_out = post(jax.device_put(ctx.raw_out))
    detections = {k: np.asarray(v) for k, v in det_out.items()}
    return _joined_rows(ctx, detections)


def _joined_rows(ctx: SimpleNamespace, detections):
    from lidar_object_detection_tpu.eval.erosion_study import join_runs

    run_r = ctx.pipe_raw.run(detections=detections)
    run_e = ctx.pipe_ero.run(detections=detections)
    return join_runs(run_r.csv_rows, run_e.csv_rows)


def prepare_flip(ctx: SimpleNamespace, log=print) -> None:
    """Run the mirrored-view forward once and stash it on the study
    context (flip-TTA configs need both views)."""
    import time

    t0 = time.time()
    ctx.flip_out = ctx.run_forward(ctx.images[:, :, ::-1, :])
    log(f"[quality] mirrored forward: {time.time() - t0:.1f}s", flush=True)


def tta_detections(ctx: SimpleNamespace, conf: float, mask_threshold: float,
                   floor: float | None = None, min_pixels: int = 0,
                   mode: str = "averaged", match_iou: float = 0.5):
    """Flip-TTA detections dict (see examples/quality_flip_probe.py).

    ``mode="averaged"`` is the library serving path
    (models/yolo/tta.postprocess_tta_pair — decode both views, mirror the
    flipped view's mask probability fields back, average per IoU-matched
    detection before the serving binarization), run per frame via
    lax.map exactly as ``YoloDetector(tta="hflip")`` serves it.
    ``mode="flipped"`` returns the mirrored-view detections alone — a
    probe-only diagnostic, built here from the same library pieces."""
    import dataclasses

    import jax
    import numpy as np

    from lidar_object_detection_tpu.models.yolo.postprocess import (
        PostprocessParams, mask_prob_fields, pack_thresholded_masks,
        postprocess_single)
    from lidar_object_detection_tpu.models.yolo.tta import (
        flip_boxes, postprocess_tta_pair)

    if getattr(ctx, "flip_out", None) is None:
        prepare_flip(ctx)
    spec = ctx.spec
    src_w = float(spec.src_w)

    pp = PostprocessParams(
        spec=spec, conf_threshold=conf, mask_threshold=mask_threshold,
        mask_threshold_floor=floor, mask_min_pixels=min_pixels,
        max_detections=32)

    if mode == "averaged":
        merge = jax.jit(lambda on, of: jax.lax.map(
            lambda pair: postprocess_tta_pair(pair[0], pair[1], pp,
                                              match_iou), (on, of)))
        out = merge(jax.device_put(ctx.raw_out),
                    jax.device_put(ctx.flip_out))
        return {k: np.asarray(v) for k, v in out.items()}

    assert mode == "flipped", mode
    pp_coef = dataclasses.replace(pp, emit_coef=True)

    def one_frame(out_f):
        det_f = postprocess_single(out_f, pp_coef)
        p_f = mask_prob_fields(out_f["proto"], det_f["coef"],
                               spec)[:, :, ::-1]
        boxes_f = flip_boxes(det_f["boxes"], src_w)
        bits = pack_thresholded_masks(
            p_f, boxes_f, det_f["det_valid"], mask_threshold, floor,
            min_pixels)
        return {"boxes": boxes_f, "scores": det_f["scores"],
                "det_valid": det_f["det_valid"], "mask_bits": bits}

    out = jax.jit(lambda of: jax.lax.map(one_frame, of))(
        jax.device_put(ctx.flip_out))
    return {k: np.asarray(v) for k, v in out.items()}


def rows_for_tta(ctx: SimpleNamespace, conf: float, mask_threshold: float,
                 floor: float | None = None, min_pixels: int = 0,
                 mode: str = "averaged", match_iou: float = 0.5):
    """Flip-TTA counterpart of :func:`rows_for` -- same protocol, same
    joined per-car rows, detections built by :func:`tta_detections`."""
    return _joined_rows(ctx, tta_detections(
        ctx, conf, mask_threshold, floor, min_pixels, mode, match_iou))
