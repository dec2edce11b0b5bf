"""Pallas TPU kernel: fused mask upsample + threshold + box-crop + bit-pack.

The serving pipeline's largest HBM stream is YOLO-seg mask assembly
(``postprocess._assemble_masks``, mirroring ultralytics
``process_mask_native`` -- the mask path behind the reference's
``V1_BBox_Pointwise_filtering.py:57`` predict call): XLA materializes the
bilinear-upsampled (D, H, W) float mask stack (34-67 MB/frame at
32 x 376 x 1408) just to threshold it at 0.5 and pack it into one (H, W)
uint32 bit image.  At large serving batches that intermediate is exactly
the "fusion HBM pressure" that caps end-to-end throughput
(PERFORMANCE.md).

This kernel never materializes the stack.  Per (8-row, 128-column) output
tile it:

  1. reads the whole proto-resolution sigmoid mask table
     (mh_c, 32, mw_c) -- ~1.5 MB, VMEM-resident across the grid;
  2. y-interpolates two proto rows with the EXACT ``jax.image.resize``
     weights (extracted by resizing identity matrices, so boundary
     renormalization and tap placement match);
  3. x-interpolates as one (32, mw_c) @ (mw_c, 128) MXU matmul against a
     dense column-weight matrix (two nonzeros per column, like XLA's
     separable resize);
  4. applies the binarization threshold (one (32, 1) per-detection
     column: ultralytics' 0.5, the swept serving cut, or the
     guarded-shrink per-detection cuts), the xyxy box crop, and detector
     validity;
  5. packs the 32 detection bits with a shift + OR-tree and writes one
     (8, 128) uint32 tile.

HBM per frame: ~1.5 MB table + ~0.9 MB weights + 2.1 MB packed output --
~20x less than the XLA path's float stack, and f32 throughout (no bf16
fast-path compromise needed).

Parity vs the XLA path: interpolated values agree to <= 1-2 ulp (XLA's
resize dot fuses its second multiply-add into a single fma rounding; the
2-tap form rounds the product first), so a 0.5-threshold flip at a
mask-boundary pixel is possible in principle.  Measured: ZERO flipped
bits over ~50M pixel-detection pairs of random masks
(tests/test_pallas_masks.py) -- vs the bf16 fast path's 0.038 % flip
rate, this is indistinguishable from exact.

The guarded-shrink serving mode (``PostprocessParams.
mask_threshold_floor`` -- the committed checkpoints' operating point)
runs as two stack-free passes: :func:`pallas_count_above` accumulates
each detection's primary-cut pixel count across the grid into one
(32, 1) block (TPU grids are sequential, so the revisited block
accumulates), then :func:`pallas_assemble_masks` re-runs with the
per-detection threshold column.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 8
COL_TILE = 128
NUM_BITS = 32


def _mask_kernel(mh_c: int, y0_ref, w0_ref, w1_ref, m_ref,
                 wx_ref, boxes_ref, thr_ref, out_ref):
    """One (ROW_TILE, COL_TILE) packed-output tile.

    ``thr_ref`` is a (32, 1) per-detection threshold column -- one
    broadcast value for a plain operating point (ultralytics' 0.5 or the
    swept serving cut), or the per-detection cuts of the guarded-shrink
    mode (``PostprocessParams.mask_threshold_floor``: detections whose
    primary-cut mask is near-empty serve the floor cut instead).  The
    compare costs the same either way.

    y0/w0/w1: (ROW_TILE,) SMEM -- resize row taps for this tile's rows.
    m_ref:    (mh_c, 32, mw_c) VMEM -- sigmoid masks at proto resolution.
    wx_ref:   (mw_c, COL_TILE) VMEM -- dense x-resize weights, this tile.
    boxes_ref:(32, 4) VMEM -- xyxy boxes in image px (invalid => empty).
    """
    r = pl.program_id(0)
    c = pl.program_id(1)

    xs = jax.lax.broadcasted_iota(jnp.float32, (1, COL_TILE), 1) \
        + (c * COL_TILE).astype(jnp.float32)
    x1 = boxes_ref[:, 0:1]
    y1 = boxes_ref[:, 1:2]
    x2 = boxes_ref[:, 2:3]
    y2 = boxes_ref[:, 3:4]
    in_x = (xs >= x1) & (xs < x2)                       # (32, COL_TILE)
    thr = thr_ref[:]                                    # (32, 1)

    d_ids = jax.lax.broadcasted_iota(jnp.uint32, (NUM_BITS, 1), 0)
    bit_val = jnp.uint32(1) << d_ids                    # (32, 1)

    wx = wx_ref[:]                                      # (mw_c, COL_TILE)
    for i in range(ROW_TILE):
        y0 = y0_ref[i]
        row0 = m_ref[y0]                                # (32, mw_c)
        row1 = m_ref[jnp.minimum(y0 + 1, mh_c - 1)]
        combined = w0_ref[i] * row0 + w1_ref[i] * row1  # (32, mw_c)
        vals = jnp.dot(combined, wx,
                       preferred_element_type=jnp.float32)   # (32, COL_TILE)

        yf = (r * ROW_TILE + i).astype(jnp.float32)
        in_y = (yf >= y1) & (yf < y2)                   # (32, 1)
        binary = (vals > thr) & in_x & in_y
        word = jnp.where(binary, bit_val, jnp.uint32(0))    # (32, COL_TILE)
        # OR-tree over the 32 detection sublanes -> one packed word/pixel
        word = word[0:16] | word[16:32]
        word = word[0:8] | word[8:16]
        word = word[0:4] | word[4:8]
        word = word[0:2] | word[2:4]
        word = word[0:1] | word[1:2]                    # (1, COL_TILE)
        out_ref[i:i + 1, :] = word


def _count_kernel(mh_c: int, y0_ref, w0_ref, w1_ref, m_ref,
                  wx_ref, boxes_ref, thr_ref, out_ref):
    """Per-detection count of pixels passing (vals > thr) & in-box,
    accumulated across the whole (r, c) grid into one (32, 1) block --
    the guarded-shrink pixel guard, computed WITHOUT materializing the
    upsampled mask stack (same on-the-fly interpolation as
    :func:`_mask_kernel`; TPU grids iterate sequentially, so the
    revisited output block accumulates)."""
    r = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when((r == 0) & (c == 0))
    def _init():
        out_ref[:, :] = jnp.zeros((NUM_BITS, 1), jnp.int32)

    xs = jax.lax.broadcasted_iota(jnp.float32, (1, COL_TILE), 1) \
        + (c * COL_TILE).astype(jnp.float32)
    x1 = boxes_ref[:, 0:1]
    y1 = boxes_ref[:, 1:2]
    x2 = boxes_ref[:, 2:3]
    y2 = boxes_ref[:, 3:4]
    in_x = (xs >= x1) & (xs < x2)                       # (32, COL_TILE)
    thr = thr_ref[:]                                    # (32, 1)

    wx = wx_ref[:]
    acc = jnp.zeros((NUM_BITS, 1), jnp.int32)
    for i in range(ROW_TILE):
        y0 = y0_ref[i]
        row0 = m_ref[y0]
        row1 = m_ref[jnp.minimum(y0 + 1, mh_c - 1)]
        combined = w0_ref[i] * row0 + w1_ref[i] * row1
        vals = jnp.dot(combined, wx,
                       preferred_element_type=jnp.float32)
        yf = (r * ROW_TILE + i).astype(jnp.float32)
        in_y = (yf >= y1) & (yf < y2)
        binary = (vals > thr) & in_x & in_y             # (32, COL_TILE)
        acc = acc + jnp.sum(binary.astype(jnp.int32), axis=1,
                            keepdims=True)
    out_ref[:, :] += acc


def resize_taps(n_in: int, n_out: int):
    """Per-output-pixel (tap index, weight0, weight1) of a 1-D bilinear
    ``jax.image.resize`` from n_in to n_out, extracted from the resize
    itself (identity-matrix trick) so boundary renormalization matches
    bitwise."""
    eye = jnp.eye(n_in, dtype=jnp.float32)
    w = jax.image.resize(eye, (n_in, n_out), method="bilinear")  # (in, out)
    idx0 = jnp.argmax(w > 0, axis=0).astype(jnp.int32)           # (out,)
    ar = jnp.arange(n_out)
    w0 = w[idx0, ar]
    idx1 = jnp.minimum(idx0 + 1, n_in - 1)
    w1 = jnp.where(idx1 > idx0, w[idx1, ar], 0.0)
    return idx0, w0.astype(jnp.float32), w1.astype(jnp.float32), w


def supported(num_det: int, src_h: int, src_w: int,
              mh_c: int | None = None, mw_c: int | None = None) -> bool:
    """``mh_c``/``mw_c`` are the cropped proto-resolution mask dims.
    Upsample-only: the 2-tap bilinear taps in :func:`resize_taps` match
    ``jax.image.resize`` only when scaling up (downscale antialiases with
    >2 taps per output)."""
    ok = (num_det <= NUM_BITS and src_h % ROW_TILE == 0
          and src_w % COL_TILE == 0)
    if mh_c is not None:
        ok = ok and mh_c <= src_h
    if mw_c is not None:
        ok = ok and mw_c <= src_w
    return ok


def _prep_operands(masks_c, boxes, det_valid, src_h: int, src_w: int,
                   threshold):
    """Shared operand prep for the assembly and count kernels."""
    d, mh_c, mw_c = masks_c.shape
    if not supported(d, src_h, src_w, mh_c, mw_c):
        raise ValueError(
            f"unsupported shape d={d} {mh_c}x{mw_c} -> {src_h}x{src_w} "
            "(needs d<=32, tile-aligned output, upsample-only)")

    m32 = jnp.zeros((NUM_BITS, mh_c, mw_c), jnp.float32)
    m32 = m32.at[:d].set(masks_c.astype(jnp.float32))
    m_t = jnp.transpose(m32, (1, 0, 2))                 # (mh_c, 32, mw_c)

    y0s, wy0, wy1, _ = resize_taps(mh_c, src_h)
    _, _, _, wx_full = resize_taps(mw_c, src_w)         # (mw_c, src_w)

    # invalid detections -> empty crop rectangle (never sets a bit)
    empty = jnp.asarray([src_w, src_h, src_w, src_h], jnp.float32)
    boxes32 = jnp.full((NUM_BITS, 4), 0.0, jnp.float32)
    boxes32 = boxes32.at[:d].set(
        jnp.where(det_valid[:, None], boxes.astype(jnp.float32),
                  empty[None, :]))
    boxes32 = boxes32.at[d:].set(empty[None, :])

    # (32, 1) per-detection threshold column; a scalar broadcasts (the
    # plain single-cut operating point)
    thr = jnp.asarray(threshold, jnp.float32)
    if thr.ndim == 0:
        thr32 = jnp.full((NUM_BITS, 1), thr, jnp.float32)
    else:
        thr32 = jnp.full((NUM_BITS, 1), 2.0, jnp.float32)  # pad: nothing
        thr32 = thr32.at[:d, 0].set(thr.astype(jnp.float32))

    in_specs = [
        pl.BlockSpec((ROW_TILE,), lambda r, c: (r,),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((ROW_TILE,), lambda r, c: (r,),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((ROW_TILE,), lambda r, c: (r,),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((mh_c, NUM_BITS, mw_c), lambda r, c: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mw_c, COL_TILE), lambda r, c: (0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NUM_BITS, 4), lambda r, c: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NUM_BITS, 1), lambda r, c: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    grid = (src_h // ROW_TILE, src_w // COL_TILE)
    operands = (y0s, wy0, wy1, m_t, wx_full, boxes32, thr32)
    return mh_c, grid, in_specs, operands


@functools.partial(jax.jit,
                   static_argnames=("src_h", "src_w", "interpret"))
def pallas_assemble_masks(masks_c, boxes, det_valid, src_h: int, src_w: int,
                          threshold=0.5,
                          interpret: bool = False):
    """Packed (src_h, src_w) uint32 mask image from proto-res sigmoids.

    Args:
      masks_c: (D, mh_c, mw_c) float32 masks at proto resolution
        (sigmoid probabilities, or logits when the caller thresholds in
        logit space), letterbox padding already cropped
        (``_assemble_masks`` steps up to the resize).
      boxes: (D, 4) xyxy in original-image pixels.
      det_valid: (D,) bool.
      src_h / src_w: original image size (src_h % 8 == 0, src_w % 128 == 0).
      threshold: binarization point applied to the interpolated values --
        the same compare as the XLA path's ``masks > threshold``.  A
        scalar (any serving cut), or a (D,) per-detection vector (the
        guarded-shrink mode, :func:`pallas_assemble_masks_guarded`).

    Returns (src_h, src_w) uint32; bit d = detection d's binary mask --
    bit-compatible with the XLA ``_assemble_masks`` output.
    """
    mh_c, grid, in_specs, operands = _prep_operands(
        masks_c, boxes, det_valid, src_h, src_w, threshold)
    return pl.pallas_call(
        functools.partial(_mask_kernel, mh_c),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ROW_TILE, COL_TILE), lambda r, c: (r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((src_h, src_w), jnp.uint32),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit,
                   static_argnames=("src_h", "src_w", "interpret"))
def pallas_count_above(masks_c, boxes, det_valid, src_h: int, src_w: int,
                       threshold=0.5, interpret: bool = False):
    """(D,) int32 -- per detection, how many full-resolution pixels pass
    ``(interpolated > threshold) & in-box & valid``.  Bit-compatible with
    counting the XLA path's binary mask, but never materializes the
    (D, H, W) stack (the guard input of the guarded-shrink serving
    mode)."""
    d = masks_c.shape[0]
    mh_c, grid, in_specs, operands = _prep_operands(
        masks_c, boxes, det_valid, src_h, src_w, threshold)
    counts = pl.pallas_call(
        functools.partial(_count_kernel, mh_c),
        grid=grid,
        in_specs=in_specs,
        # every grid step revisits the single (32, 1) block -> sequential
        # accumulation (TPU grids are serial; interpret mode matches)
        out_specs=pl.BlockSpec((NUM_BITS, 1), lambda r, c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NUM_BITS, 1), jnp.int32),
        interpret=interpret,
    )(*operands)
    return counts[:d, 0]


@functools.partial(jax.jit,
                   static_argnames=("src_h", "src_w", "min_pixels",
                                    "interpret"))
def pallas_assemble_masks_guarded(masks_c, boxes, det_valid,
                                  src_h: int, src_w: int,
                                  threshold, floor, min_pixels: int,
                                  interpret: bool = False):
    """Guarded-shrink mask assembly, two stack-free passes.

    Pass 1 counts each detection's primary-cut pixels
    (:func:`pallas_count_above`); detections under ``min_pixels`` fall
    back to the ``floor`` cut.  Pass 2 assembles the packed bits at the
    per-detection thresholds.  Bit-compatible with the XLA
    ``_assemble_masks(..., floor=, min_pixels=)`` path
    (PostprocessParams.mask_threshold_floor -- the serving default of
    the committed checkpoints, PERFORMANCE.md "Guarded shrink").  2x the
    compute of the plain kernel, still ~20x less HBM than the XLA
    float-stack path.
    """
    counts = pallas_count_above(masks_c, boxes, det_valid, src_h, src_w,
                                threshold=threshold, interpret=interpret)
    thr_vec = jnp.where(counts >= min_pixels,
                        jnp.asarray(threshold, jnp.float32),
                        jnp.asarray(floor, jnp.float32))
    return pallas_assemble_masks(masks_c, boxes, det_valid, src_h, src_w,
                                 threshold=thr_vec, interpret=interpret)
