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
                    default_scale: str = "n") -> Dict[str, Any]:
    """Resolved serving config for a checkpoint.

    Returns ``{"scale", "mask_threshold", "conf"}`` where ``conf`` is
    None when neither the caller nor the sidecar pins one (the detector
    default applies).
    """
    meta = load_sidecar(ckpt_path)
    serving = meta.get("serving", {})
    if scale is None:
        scale = meta.get("scale", default_scale)
    if mask_threshold is None:
        mask_threshold = float(serving.get("mask_threshold", 0.5))
    if conf is None and "conf" in serving:
        conf = float(serving["conf"])
    return {"scale": scale, "mask_threshold": float(mask_threshold),
            "conf": conf}


def load_serving_checkpoint(ckpt_path: str,
                            image_hw: Tuple[int, int] = (376, 1408),
                            *,
                            scale: Optional[str] = None,
                            conf: Optional[float] = None,
                            mask_threshold: Optional[float] = None,
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
                               default_scale=default_scale)
    with open(ckpt_path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    kw = dict(detector_kw)
    if resolved["conf"] is not None:
        kw["conf"] = resolved["conf"]
    det = YoloDetector(image_hw, YoloConfig(scale=resolved["scale"]),
                       variables=raw["variables"],
                       mask_threshold=resolved["mask_threshold"],
                       max_detections=max_detections, **kw)
    return det, int(np.asarray(raw["step"])), resolved
