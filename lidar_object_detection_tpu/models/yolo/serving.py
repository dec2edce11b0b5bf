"""Serving-checkpoint resolution, shared by every consumer.

A committed detector checkpoint is a flax msgpack ``{"variables",
"step"}`` plus a JSON sidecar ``<ckpt>.json`` carrying at least
``{"scale": ...}`` and, for sweep-tuned checkpoints, a ``{"serving":
{...}}`` block recorded at export time (``examples/export_yolo_ckpt.py``)
with the selected operating point (``mask_threshold``, optionally
``conf``).  The CLI, ``examples/regen_artifacts.py``, ``bench.py``'s
quality extra, and the quality sweep/CV scripts must all resolve that
block the SAME way — a round-5 review found three hand-rolled resolvers
whose fallback defaults had drifted (0.5 vs 0.9), i.e. a published
quality number measured at an operating point the CLI would not serve.
This module is the single resolution path.

Precedence, per knob: explicit caller override > sidecar ``serving``
block > library default (``mask_threshold`` 0.5 — ultralytics'
``process_mask_native`` constant, reference V1:57 predict path — and the
detector's own ``conf`` default).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

__all__ = ["load_sidecar", "resolve_serving", "load_serving_checkpoint"]


def load_sidecar(ckpt_path: str) -> Dict[str, Any]:
    """The checkpoint's JSON sidecar, or {} when none exists."""
    path = ckpt_path + ".json"
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def resolve_serving(ckpt_path: str, *,
                    scale: Optional[str] = None,
                    conf: Optional[float] = None,
                    mask_threshold: Optional[float] = None,
                    mask_threshold_floor: Optional[float] = None,
                    mask_min_pixels: Optional[int] = None,
                    tta: Optional[str] = None,
                    default_scale: str = "n") -> Dict[str, Any]:
    """Resolved serving config for a checkpoint.

    Returns ``{"scale", "mask_threshold", "conf", "mask_threshold_floor",
    "mask_min_pixels", "tta"}`` where ``conf`` is None when neither the
    caller nor the sidecar pins one (the detector default applies).  The
    floor pair is the guarded-shrink decode mode (PostprocessParams.
    mask_threshold_floor): None/0 unless the sidecar's serving block or
    the caller sets it.  ``tta`` is the test-time-augmentation mode
    (``"none"`` or ``"hflip"``, models/yolo/tta.py) — same precedence.
    """
    meta = load_sidecar(ckpt_path)
    serving = meta.get("serving", {})
    if scale is None:
        scale = meta.get("scale", default_scale)
    if mask_threshold is None:
        mask_threshold = float(serving.get("mask_threshold", 0.5))
    if conf is None and "conf" in serving:
        conf = float(serving["conf"])
    if mask_threshold_floor is None and "mask_threshold_floor" in serving:
        mask_threshold_floor = float(serving["mask_threshold_floor"])
    if mask_min_pixels is None:
        mask_min_pixels = int(serving.get("mask_min_pixels", 0))
    if tta is None:
        tta = str(serving.get("tta", "none"))
    if (mask_threshold_floor is not None
            and mask_threshold_floor >= float(mask_threshold)):
        # an explicit threshold at/below the sidecar's floor implicitly
        # disables the guarded shrink (a floor only makes sense BELOW the
        # primary cut -- postprocess.py validates the same invariant)
        mask_threshold_floor, mask_min_pixels = None, 0
    return {"scale": scale, "mask_threshold": float(mask_threshold),
            "conf": conf, "mask_threshold_floor": mask_threshold_floor,
            "mask_min_pixels": mask_min_pixels, "tta": tta}


def load_serving_checkpoint(ckpt_path: str,
                            image_hw: Tuple[int, int] = (376, 1408),
                            *,
                            scale: Optional[str] = None,
                            conf: Optional[float] = None,
                            mask_threshold: Optional[float] = None,
                            mask_threshold_floor: Optional[float] = None,
                            mask_min_pixels: Optional[int] = None,
                            tta: Optional[str] = None,
                            max_detections: int = 32,
                            default_scale: str = "n",
                            **detector_kw):
    """Build a ``YoloDetector`` serving ``ckpt_path`` at its recorded
    operating point.

    Returns ``(detector, step, resolved)`` where ``resolved`` is the
    :func:`resolve_serving` dict actually applied.  Extra keyword args
    pass through to ``YoloDetector`` (e.g. ``mask_assembly``,
    ``fold_weights``, ``dtype``).
    """
    from flax import serialization

    from lidar_object_detection_tpu.models.yolo.detector import YoloDetector
    from lidar_object_detection_tpu.models.yolo.model import YoloConfig
    import numpy as np

    resolved = resolve_serving(ckpt_path, scale=scale, conf=conf,
                               mask_threshold=mask_threshold,
                               mask_threshold_floor=mask_threshold_floor,
                               mask_min_pixels=mask_min_pixels,
                               tta=tta, default_scale=default_scale)
    with open(ckpt_path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    kw = dict(detector_kw)
    if resolved["conf"] is not None:
        kw["conf"] = resolved["conf"]
    det = YoloDetector(image_hw, YoloConfig(scale=resolved["scale"]),
                       variables=raw["variables"],
                       mask_threshold=resolved["mask_threshold"],
                       mask_threshold_floor=resolved["mask_threshold_floor"],
                       mask_min_pixels=resolved["mask_min_pixels"],
                       tta=resolved["tta"],
                       max_detections=max_detections, **kw)
    return det, int(np.asarray(raw["step"])), resolved
