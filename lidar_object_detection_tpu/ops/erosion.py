"""Binary mask erosion with ``cv2.erode`` parity, on bit-packed masks.

The reference erodes each float mask separately on the host
(``image_segmentation_with_erosion``, cvs_erosion.py:77-111 /
V3_point_cloud_with_erosion.py:55-118): ``(mask * 255).astype(uint8)``,
``cv2.erode`` with an elliptical structuring element (3x3 ellipse == the
cross kernel), then back to {0, 1} floats.

TPU-first redesign: binary erosion of mask M by structuring element S is
``AND over offsets s in S of shift(M, -s)``, with out-of-image neighbours
counting as foreground (cv2's default border for erode is +inf, i.e. the
border never erodes).  On a uint32 bit-plane image this is a handful of
shifted bitwise-ANDs that erode ALL <= 32 instance masks of a frame in one
fused elementwise pass -- no per-mask loop, no uint8 round-trips.

The structuring-element offsets are computed on the host with
``cv2.getStructuringElement`` semantics reimplemented (an ellipse rasterized
exactly like OpenCV does), so tests can assert bit-exact parity against cv2.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def ellipse_kernel_offsets(ksize: int):
    """Offsets (dy, dx) of the OpenCV ``MORPH_ELLIPSE`` (ksize x ksize)
    structuring element, anchor at the center.

    OpenCV rasterizes the ellipse row-wise: for each row j it fills columns
    ``[c - dx, c + dx]`` where ``dx = r_x * sqrt(1 - (dy/r_y)^2)`` evaluated
    with the same integer truncation as ``cv::getStructuringElement``.  For
    ksize == 3 this yields the cross kernel the reference's erosion uses.
    """
    r = ksize // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    offsets = []
    for j in range(ksize):
        dy = abs(j - r)
        if dy <= r:
            # cv::getStructuringElement: dx = saturate_cast<int>(r_x * sqrt(...))
            dx = int(round(r * np.sqrt(max(0.0, 1.0 - dy * dy * inv_r2)))) if r > 0 else 0
        else:
            dx = -1
        for i in range(ksize):
            if abs(i - r) <= dx:
                offsets.append((j - r, i - r))
    return tuple(offsets)


def _shift_all_ones_border(bits, dy: int, dx: int):
    """``out[y, x] = bits[y + dy, x + dx]`` with out-of-bounds neighbours
    all-ones (so the border never erodes).

    Implemented as pad + static slice (pure layout ops XLA fuses into the
    consuming AND chain) instead of roll + scatter-update, so the whole
    multi-tap erosion compiles to one elementwise pass over the packed
    image rather than materializing each shifted copy."""
    import jax.lax as lax

    h, w = bits.shape
    py, px = abs(dy), abs(dx)
    padded = jnp.pad(bits, ((py, py), (px, px)),
                     constant_values=np.uint32(0xFFFFFFFF))
    return lax.slice(padded, (py + dy, px + dx), (py + dy + h, px + dx + w))


def erode_packed(mask_bits, kernel_size: int = 3, iterations: int = 1):
    """Erode a (H, W) uint32 bit-packed mask image; all planes at once."""
    offsets = ellipse_kernel_offsets(kernel_size)
    out = mask_bits
    for _ in range(iterations):
        acc = out
        for dy, dx in offsets:
            if dy == 0 and dx == 0:
                continue
            acc = acc & _shift_all_ones_border(out, dy, dx)
        out = acc
    return out


def erode_masks(masks, kernel_size: int = 3, iterations: int = 1):
    """Erode (D, H, W) {0,1} masks (bool or float); returns bool masks.

    Convenience wrapper for unpacked masks; the pipeline itself stays packed.
    """
    from lidar_object_detection_tpu.ops.masks import pack_masks, unpack_masks

    binary = jnp.asarray(masks) > 0.5
    bits = pack_masks(binary)
    eroded = erode_packed(bits, kernel_size, iterations)
    return unpack_masks(eroded, masks.shape[0])
