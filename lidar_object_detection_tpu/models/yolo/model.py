"""YOLOv11 detection / instance-segmentation model in Flax (NHWC).

From-scratch TPU port of the network the reference runs through ultralytics
(``YOLO('yolo11x-seg.pt')`` at V1_BBox_Pointwise_filtering.py:14; plain
``yolo11x.pt`` detection in ObjectDetection_final.py:114).  The layer graph
follows the published YOLO11 architecture (backbone 0-10, FPN/PAN head
11-22, Detect/Segment at 23) with per-scale depth/width multipliers; layer
indices and submodule names mirror the ultralytics state dict so converted
checkpoints map 1:1.

The forward returns *raw* per-level heads (box-distribution logits, class
logits, mask coefficients, prototypes); decoding (DFL, sigmoid, NMS,
retina-mask assembly) lives in
:mod:`lidar_object_detection_tpu.models.yolo.postprocess` so the network
body stays a pure, differentiable function usable for training.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from lidar_object_detection_tpu.models.yolo import blocks as B

SCALES = {
    # name: (depth, width, max_channels) -- YOLO11 scale table
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}

STRIDES = (8, 16, 32)
REG_MAX = 16


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    scale: str = "x"
    num_classes: int = 80
    nm: int = 32       # mask coefficients (Segment)
    npr: int = 256     # prototype channels before width scaling
    segment: bool = True

    @property
    def depth(self) -> float:
        return SCALES[self.scale][0]

    @property
    def width(self) -> float:
        return SCALES[self.scale][1]

    @property
    def max_channels(self) -> int:
        return SCALES[self.scale][2]

    def ch(self, c: int) -> int:
        """Scaled channel count."""
        return B.make_divisible(min(c, self.max_channels) * self.width, 8)

    def reps(self, n: int) -> int:
        return max(round(n * self.depth), 1)

    @property
    def c3k(self) -> bool:
        """m/l/x scales use C3k inner blocks everywhere."""
        return self.scale in ("m", "l", "x")


class DetectHead(nn.Module):
    """Per-level detection head: cv2 -> 4*reg_max box bins, cv3 -> classes.

    cv3 is the YOLO11 (non-legacy) depthwise variant.
    """

    cfg: YoloConfig
    level_channels: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cfg = self.cfg
        nc = cfg.num_classes
        c2 = max(16, self.level_channels[0] // 4, REG_MAX * 4)
        c3 = max(self.level_channels[0], min(nc, 100))
        boxes, classes = [], []
        for i, x in enumerate(feats):
            b = B.ConvBNAct(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            b = B.ConvBNAct(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
            b = nn.Conv(4 * REG_MAX, (1, 1), use_bias=True, dtype=self.dtype,
                        name=f"cv2_{i}_2")(b)
            c = B.DWConv(x.shape[-1], 3, dtype=self.dtype,
                         name=f"cv3_{i}_0_0")(x, train)
            c = B.ConvBNAct(c3, 1, dtype=self.dtype, name=f"cv3_{i}_0_1")(c, train)
            c = B.DWConv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1_0")(c, train)
            c = B.ConvBNAct(c3, 1, dtype=self.dtype, name=f"cv3_{i}_1_1")(c, train)
            c = nn.Conv(nc, (1, 1), use_bias=True, dtype=self.dtype,
                        name=f"cv3_{i}_2")(c)
            boxes.append(b)
            classes.append(c)
        return boxes, classes


class SegmentHead(nn.Module):
    """Segment = Detect + mask-coefficient branch (cv4) + Proto."""

    cfg: YoloConfig
    level_channels: Tuple[int, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cfg = self.cfg
        boxes, classes = DetectHead(cfg, self.level_channels,
                                    dtype=self.dtype, name="detect")(feats, train)
        c4 = max(self.level_channels[0] // 4, cfg.nm)
        coeffs = []
        for i, x in enumerate(feats):
            m = B.ConvBNAct(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            m = B.ConvBNAct(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(m, train)
            m = nn.Conv(cfg.nm, (1, 1), use_bias=True, dtype=self.dtype,
                        name=f"cv4_{i}_2")(m)
            coeffs.append(m)
        protos = B.Proto(cfg.ch(cfg.npr), cfg.nm, dtype=self.dtype,
                         name="proto")(feats[0], train)
        return boxes, classes, coeffs, protos


class Yolo11(nn.Module):
    """Full YOLO11(-seg) network.  Input NHWC float in [0, 1]; H, W must be
    multiples of 32.  Returns a dict of raw per-level outputs."""

    cfg: YoloConfig = YoloConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, Any]:
        cfg = self.cfg
        dt = self.dtype
        ch = cfg.ch
        n2 = cfg.reps(2)
        saved = {}

        # --- backbone ---
        x = B.ConvBNAct(ch(64), 3, 2, dtype=dt, name="layer0")(x, train)
        x = B.ConvBNAct(ch(128), 3, 2, dtype=dt, name="layer1")(x, train)
        x = B.C3k2(ch(256), n2, cfg.c3k, 0.25, dtype=dt, name="layer2")(x, train)
        x = B.ConvBNAct(ch(256), 3, 2, dtype=dt, name="layer3")(x, train)
        x = B.C3k2(ch(512), n2, cfg.c3k, 0.25, dtype=dt, name="layer4")(x, train)
        saved[4] = x
        x = B.ConvBNAct(ch(512), 3, 2, dtype=dt, name="layer5")(x, train)
        x = B.C3k2(ch(512), n2, True, 0.5, dtype=dt, name="layer6")(x, train)
        saved[6] = x
        x = B.ConvBNAct(ch(1024), 3, 2, dtype=dt, name="layer7")(x, train)
        x = B.C3k2(ch(1024), n2, True, 0.5, dtype=dt, name="layer8")(x, train)
        x = B.SPPF(ch(1024), 5, dtype=dt, name="layer9")(x, train)
        x = B.C2PSA(ch(1024), n2, dtype=dt, name="layer10")(x, train)
        saved[10] = x

        # --- head (FPN up, PAN down) ---
        x = B.upsample2x(x)                                       # 11
        x = jnp.concatenate([x, saved[6]], -1)                    # 12
        x = B.C3k2(ch(512), n2, cfg.c3k, 0.5, dtype=dt, name="layer13")(x, train)
        saved[13] = x
        x = B.upsample2x(x)                                       # 14
        x = jnp.concatenate([x, saved[4]], -1)                    # 15
        p3 = B.C3k2(ch(256), n2, cfg.c3k, 0.5, dtype=dt, name="layer16")(x, train)
        x = B.ConvBNAct(ch(256), 3, 2, dtype=dt, name="layer17")(p3, train)
        x = jnp.concatenate([x, saved[13]], -1)                   # 18
        p4 = B.C3k2(ch(512), n2, cfg.c3k, 0.5, dtype=dt, name="layer19")(x, train)
        x = B.ConvBNAct(ch(512), 3, 2, dtype=dt, name="layer20")(p4, train)
        x = jnp.concatenate([x, saved[10]], -1)                   # 21
        p5 = B.C3k2(ch(1024), n2, True, 0.5, dtype=dt, name="layer22")(x, train)

        feats = (p3, p4, p5)
        level_channels = tuple(f.shape[-1] for f in feats)
        if cfg.segment:
            boxes, classes, coeffs, protos = SegmentHead(
                cfg, level_channels, dtype=dt, name="head")(feats, train)
            return {"box": boxes, "cls": classes, "coef": coeffs,
                    "proto": protos}
        boxes, classes = DetectHead(cfg, level_channels, dtype=dt,
                                    name="head")(feats, train)
        return {"box": boxes, "cls": classes}
