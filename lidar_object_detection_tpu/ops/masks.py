"""Bit-packed instance masks and the per-point mask gather.

The reference's per-mask hot loop (``extract_car_points_by_mask``,
V1_BBox_Pointwise_filtering.py:186-208) resizes each float mask to camera
resolution and gathers ``mask[v, u] > 0.5`` per valid point, once per
detection.  TPU-first redesign: all <= 32 binary instance masks of a frame are
packed into ONE ``uint32`` bit-plane image, so

* the per-point lookup becomes a single gather of one uint32 per point
  (32x less HBM traffic than 32 float-mask gathers), and
* morphology (erosion) runs on all instances simultaneously with bitwise ops
  (see :mod:`lidar_object_detection_tpu.ops.erosion`).

Masks are binary by construction here: the reference's
``mask.astype(np.uint8)`` truncation + ``cv2.resize`` + ``> 0.5`` chain
(V1:197-200) is the identity on {0, 1} retina masks at image resolution, which
is what our detector emits.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_masks(masks):
    """Pack (D, H, W) {0,1} masks into a (H, W) uint32 bit-plane image.

    Bit d of pixel (y, x) is set iff detection d's mask covers it.  D <= 32.
    Works on numpy or jax arrays.
    """
    if masks.shape[0] > 32:
        raise ValueError(f"at most 32 masks per frame, got {masks.shape[0]}")
    xp = jnp if isinstance(masks, jnp.ndarray) else np
    d = masks.shape[0]
    weights = (xp.ones((), dtype=xp.uint32) << xp.arange(d, dtype=xp.uint32))
    bits = (masks.astype(xp.uint32) * weights[:, None, None]).sum(
        axis=0, dtype=xp.uint32)
    return bits


def unpack_masks(bits, num_masks):
    """Inverse of :func:`pack_masks`: (H, W) uint32 -> (D, H, W) bool."""
    xp = jnp if isinstance(bits, jnp.ndarray) else np
    d = xp.arange(num_masks, dtype=xp.uint32)
    return ((bits[None, :, :] >> d[:, None, None]) & 1).astype(bool)


def gather_point_bits(mask_bits, u, v, valid):
    """Per-point packed membership word: one uint32 lookup per point.

    Invalid points get 0 (no membership).  This is the HBM-minimal form the
    fused Pallas count kernel consumes directly.

    TPU note: element gathers cost ~11 ns each on v5e; fetching an aligned
    128-lane ROW per point and selecting the lane with a one-hot compare
    is ~1.5x faster (contiguous 512 B per issue), so the image is viewed as
    (H*W/128, 128) rows when the flattened size allows it.
    """
    h, w = mask_bits.shape
    ui = jnp.clip(u.astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, h - 1)
    lin = vi * w + ui
    hw = h * w
    if hw % 128 == 0:
        rows_tbl = mask_bits.reshape(hw // 128, 128)
        rows = rows_tbl[lin // 128]                       # (P, 128) row gather
        lane = jnp.arange(128, dtype=lin.dtype)[None, :]
        bits = jnp.sum(jnp.where(lane == (lin % 128)[:, None], rows,
                                 jnp.uint32(0)), axis=1)
    else:
        bits = mask_bits.reshape(-1)[lin]                 # (P,) uint32
    return jnp.where(valid, bits, jnp.uint32(0))


def unpack_point_bits(bits, num_detections):
    """(P,) uint32 -> (D, P) bool membership."""
    d = jnp.arange(num_detections, dtype=jnp.uint32)
    return ((bits[None, :] >> d[:, None]) & 1).astype(bool)


def gather_mask_bits(mask_bits, u, v, valid, num_detections):
    """Per-point mask membership for every detection at once.

    Args:
      mask_bits: (H, W) uint32 packed masks.
      u, v: (P,) pixel coordinates (float or int; will be cast to int32).
      valid: (P,) bool point validity (already includes FOV bounds).
      num_detections: static D (<= 32).

    Returns:
      (D, P) bool: point p belongs to detection d's mask and is valid.
    """
    return unpack_point_bits(gather_point_bits(mask_bits, u, v, valid),
                             num_detections)
