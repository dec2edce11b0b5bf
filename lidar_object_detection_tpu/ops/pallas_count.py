"""Pallas TPU kernel: fused oriented point-in-box test + inside-count.

The hottest reduction of the framework (the cars x boxes x points loop,
V1_BBox_Pointwise_filtering.py:211-265): for every (detection, box) pair,
count the detection's points that fall inside the oriented box.  The XLA
fallback (:func:`lidar_object_detection_tpu.fusion.associate.
_chunked_inside_counts`) materializes a (chunk, G) inside matrix in HBM per
scan chunk; this kernel keeps everything in VMEM and -- crucially -- takes
the per-point detection membership as the PACKED uint32 word stream
(bit d = detection d), so the (D, P) float membership matrix (16 MB/frame
each way at 32 x 131k) never exists in HBM at all:

  grid step t (over point tiles of TILE):
    car      = (bits (1, TILE) >> d) & 1          # in-VMEM bit unpack
    proj_k   = A_k (G, 3) @ pts (3, TILE)         # 3 MXU matmuls
    inside   = AND_k (0 <= proj_k + b_k <= 1)     # fused VPU compares
    counts  += car (D, TILE) @ inside^T           # MXU accumulate
    totals  += rowsum(car)

HBM traffic per frame: 1.5 MB points + 0.5 MB bits + tiny outputs.
Counts/totals accumulate in float32 output blocks across the sequential
TPU grid (exact: 0/1 operands, < 2^24 points).

Boxes are encoded by ``box_frame``-style axes (edge / |edge|^2) and
offsets (see geom.boxes); invalid boxes get zeroed axes + offset -2 so no
point ever tests inside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidar_object_detection_tpu.geom.boxes import box_frame

DEFAULT_TILE = 4096


def _count_kernel(num_det: int, bits_ref, pts_ref, axes_ref, offs_ref,
                  counts_ref, totals_ref):
    # bits: (1, TILE) uint32 / pts: (3, TILE) / axes: (3, G, 3) / offs: (3, G)
    d_ids = jax.lax.broadcasted_iota(jnp.uint32, (num_det, 1), 0)
    # Mosaic has no uint32->f32 cast; go through a compare + select.
    car = jnp.where(((bits_ref[:] >> d_ids) & jnp.uint32(1)) != 0,
                    jnp.float32(1.0), jnp.float32(0.0))

    pts = pts_ref[:]                            # (3, TILE)
    inside = None
    for k in range(3):
        a_k = axes_ref[k]                       # (G, 3)
        proj = jnp.dot(a_k, pts, preferred_element_type=jnp.float32)
        proj = proj + offs_ref[k][:, None]      # (G, TILE)
        ok = (proj >= 0.0) & (proj <= 1.0)
        inside = ok if inside is None else (inside & ok)
    inside_f = inside.astype(jnp.float32)       # (G, TILE)
    partial = jax.lax.dot_general(
        car, inside_f,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # (D, G)

    @pl.when(pl.program_id(0) == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        totals_ref[:] = jnp.zeros_like(totals_ref)

    counts_ref[:] += partial
    totals_ref[:] += jnp.sum(car, axis=1, keepdims=True)


@functools.partial(jax.jit,
                   static_argnames=("num_det", "tile", "interpret"))
def pallas_inside_counts_packed(points, point_bits, corners, box_mask,
                                num_det: int, tile: int = DEFAULT_TILE,
                                interpret: bool = False):
    """Fused membership-unpack + inside-count.

    Args:
      points: (P, 3) float32 velodyne points (P % tile == 0).
      point_bits: (P,) uint32 packed per-point detection membership
        (invalid points must already be zeroed; detection validity folded
        by masking bits).
      corners: (G, 8, 3) float32 box corners (velodyne frame).
      box_mask: (G,) bool valid boxes.
      num_det: static number of detection bit planes (<= 32).

    Returns:
      (counts (D, G) float32, totals (D,) float32), both exact.
    """
    p, _ = points.shape
    g = corners.shape[0]
    if p % tile:
        raise ValueError(f"P={p} not divisible by tile={tile}")

    axes, offsets = box_frame(corners)           # (G, 3, 3), (G, 3)
    # Invalid boxes: zero axes + offset -2 => proj constantly -2, never
    # inside (offset alone is not enough: a.p - 2 could land in [0, 1]).
    axes = jnp.where(box_mask[:, None, None], axes, 0.0)
    axes = jnp.transpose(axes, (1, 0, 2)).astype(jnp.float32)      # (3, G, 3)
    offsets = jnp.where(box_mask[None, :],
                        jnp.transpose(offsets).astype(jnp.float32),
                        -2.0)                                      # (3, G)
    pts_t = points.T.astype(jnp.float32)          # (3, P)
    bits2d = point_bits.reshape(1, p)

    grid = (p // tile,)
    counts, totals = pl.pallas_call(
        functools.partial(_count_kernel, num_det),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, g, 3), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, g), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((num_det, g), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_det, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_det, g), jnp.float32),
            jax.ShapeDtypeStruct((num_det, 1), jnp.float32),
        ),
        interpret=interpret,
    )(bits2d, pts_t, axes, offsets)
    return counts, totals[:, 0]


def pallas_inside_counts(points, car_mask_f, corners, box_mask,
                         tile: int = DEFAULT_TILE, interpret: bool = False):
    """Compatibility wrapper taking an unpacked (D, P) float membership
    matrix; packs it and calls the fused kernel."""
    d = car_mask_f.shape[0]
    weights = (jnp.uint32(1) << jnp.arange(d, dtype=jnp.uint32))
    bits = jnp.sum((car_mask_f > 0.5).astype(jnp.uint32)
                   * weights[:, None], axis=0, dtype=jnp.uint32)
    counts, _ = pallas_inside_counts_packed(
        points, bits, corners, box_mask, num_det=d, tile=tile,
        interpret=interpret)
    return counts
