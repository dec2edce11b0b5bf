"""Sharded execution of the fusion pipeline.

Two composable strategies (SURVEY.md sections 2.4 / 5.7):

* **Frame data-parallelism** (:func:`sharded_fuse_batch`): the padded frame
  batch shards over the ``data`` mesh axis; every per-frame output inherits
  the sharding.  No collectives are needed -- frames are independent -- so
  scaling is linear in chips.

* **Point-axis sharding** (:func:`point_sharded_fuse_frame`): the
  context-parallel analogue.  ``shard_map`` splits the 131k-point axis over
  the ``model`` axis; each device projects its point shard, gathers its
  mask bits and computes partial (D, G) inside-counts locally, then ONE
  ``psum`` of the tiny (D, G) count matrix (+ (D,) totals) crosses ICI.
  Per-point interactions never cross devices, so the communication volume
  is independent of the scan size -- the right layout for multi-sweep
  (>1M point) scans.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from lidar_object_detection_tpu.fusion.associate import (
    FusionParams, fuse_batch, fuse_frame)
from lidar_object_detection_tpu.geom import boxes as boxes_lib
from lidar_object_detection_tpu.geom import projection as proj_lib
from lidar_object_detection_tpu.ops import masks as masks_lib
from lidar_object_detection_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, replicated)


def sharded_fuse_batch(mesh, batch_arrays, calib_arrays,
                       params: FusionParams):
    """Run ``fuse_batch`` with the frame axis sharded over ``data``.

    Args:
      mesh: (data, model) mesh.
      batch_arrays: tuple (points, point_valid, mask_bits, det_valid,
        corners_cam0, box_valid), each with leading batch dim divisible by
        the data-axis size.
      calib_arrays: (velo_to_rect, cam_to_velo, intrinsics), replicated.
    """
    ds = lambda a: jax.device_put(
        a, NamedSharding(mesh, P(DATA_AXIS, *([None] * (a.ndim - 1)))))
    rep = lambda a: jax.device_put(a, replicated(mesh))
    arrays = tuple(ds(jnp.asarray(a)) for a in batch_arrays)
    calib = tuple(rep(jnp.asarray(a)) for a in calib_arrays)
    fn = jax.jit(functools.partial(fuse_batch, params=params))
    return fn(*arrays, *calib)


def point_sharded_fuse_frame(mesh, points, point_valid, mask_bits, det_valid,
                             corners_cam0, box_valid, velo_to_rect,
                             cam_to_velo, intrinsics, params: FusionParams):
    """One frame with the point axis sharded over the ``model`` mesh axis.

    Numerically identical to :func:`fuse_frame` (counts are exact integer
    sums, and psum of f32 integers < 2^24 is associative-safe).  Matches
    erosion-enabled configs too: the packed mask image is replicated, so
    erosion runs once before the shard_map.
    """
    p = params
    n_shards = mesh.shape[MODEL_AXIS]
    if points.shape[0] % n_shards:
        raise ValueError("point count must divide the model axis")
    if p.erosion_enabled:
        from lidar_object_detection_tpu.ops import erosion as erosion_lib
        mask_bits = erosion_lib.erode_packed(
            mask_bits, p.erosion_kernel_size, p.erosion_iterations)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS), P(), P(),
                  P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
    )
    def shard_fn(pts, pmask, bits, dets, corners, bvalid, v2r, c2v, K):
        dtype = pts.dtype
        u, v, depth = proj_lib.project_velo_points(
            pts, v2r.astype(dtype), K.astype(dtype))
        valid = proj_lib.point_validity(
            u, v, depth, p.width, p.height, p.depth_min, p.depth_max, pmask)
        if p.bbox_filter:
            vis = boxes_lib.corners_visibility(
                corners, K.astype(dtype), p.width, p.height,
                min_corners=p.bbox_min_visible_corners,
                depth_min=p.bbox_corner_depth_min, box_mask=bvalid)
        else:
            vis = bvalid
        corners_velo = boxes_lib.transform_corners(corners, c2v.astype(dtype))
        car_mask = masks_lib.gather_mask_bits(bits, u, v, valid,
                                              p.num_detections)
        car_mask = car_mask & dets[:, None]
        inside = boxes_lib.points_in_oriented_boxes(
            pts[:, :3], corners_velo, box_mask=vis)
        car_f = car_mask.astype(jnp.float32)
        local_counts = car_f @ inside.astype(jnp.float32)
        local_total = jnp.sum(car_f, axis=1)
        # the only cross-device traffic: (D, G) + (D,) per frame
        counts = jax.lax.psum(local_counts, MODEL_AXIS)
        total = jax.lax.psum(local_total, MODEL_AXIS)
        return counts, total

    counts, total = shard_fn(
        points, point_valid, mask_bits, det_valid, corners_cam0, box_valid,
        jnp.asarray(velo_to_rect), jnp.asarray(cam_to_velo),
        jnp.asarray(intrinsics))

    counts_i = counts.astype(jnp.int32)
    best_count = jnp.max(counts_i, axis=1)
    best_idx = jnp.argmax(counts_i, axis=1).astype(jnp.int32)
    matched = (best_count >= p.min_points) & (best_count > 0) & det_valid
    return {
        "counts": counts_i,
        "total_points": total.astype(jnp.int32),
        "best_box": jnp.where(matched, best_idx, -1),
        "points_inside": jnp.where(matched, best_count, 0),
        "matched": matched,
    }
