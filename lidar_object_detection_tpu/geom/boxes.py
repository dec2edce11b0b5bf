"""3D box geometry as batched, MXU-friendly matmuls.

Replaces the reference's per-(car, box) Python loops:

* ``oriented_point_in_bbox`` (V1_BBox_Pointwise_filtering.py:142-183): project
  point offsets onto the three box edge vectors and test [0, 1].  Here the
  whole (P points) x (G boxes) x (3 axes) test is ONE ``(P,3) @ (3,3G)``
  matmul plus fused compares -- this is the kernel behind the
  cars-x-boxes-x-points hot loop at V1:211-265.
* ``transform_bboxes_to_velodyne`` (V1:41-52): batched homogeneous transform.
* ``filter_visible_bboxes`` (V1:96-115): per-box corner projection + >= 2
  visible corners.
* ``project_3d_bbox_to_2d`` (V5_ProjectingBBoxes.py:215-252): projected-box
  2D info (bbox/center/size/area/avg-depth).
* ``calculate_iou_2d`` (V4_BBox_IoU_filtering.py:118-137): pairwise IoU
  matrix.

Corner order convention (V1:157-158): corners 0-3 = bottom face, 4-7 = top;
edges v1 = c1-c0 (width), v2 = c3-c0 (length), v3 = c4-c0 (height).
"""

from __future__ import annotations

import jax.numpy as jnp

from lidar_object_detection_tpu.geom.projection import cam2image


def transform_corners(corners, transform):
    """Apply a 4x4 homogeneous transform to (..., 8, 3) corners."""
    T = jnp.asarray(transform, dtype=corners.dtype)
    return corners @ T[:3, :3].T + T[:3, 3]


def box_frame(corners):
    """Decompose (..., 8, 3) corners into the affine map used by the
    oriented inside-test.

    Returns (axes, offsets) such that a point ``p`` is inside iff
    ``0 <= p @ axes[k] + offsets[k] <= 1`` for all three axes, where
    ``axes[k] = v_k / (v_k . v_k)`` and ``offsets[k] = -c0 . axes[k]``.
    Degenerate axes (zero length) produce inf/nan projections and therefore
    never test inside, mirroring the reference's try/except fallback never
    firing on real boxes.
    """
    c0 = corners[..., 0, :]
    edges = jnp.stack(
        [corners[..., 1, :] - c0,
         corners[..., 3, :] - c0,
         corners[..., 4, :] - c0], axis=-2)           # (..., 3, 3)
    sq = jnp.sum(edges * edges, axis=-1, keepdims=True)
    axes = edges / sq                                  # (..., 3axes, 3xyz)
    offsets = -jnp.einsum("...d,...kd->...k", c0, axes)
    return axes, offsets


def points_in_oriented_boxes(points, corners, box_mask=None):
    """Vectorized oriented point-in-box test.

    Args:
      points: (P, 3) points (velodyne frame).
      corners: (G, 8, 3) box corners (same frame).
      box_mask: optional (G,) bool of valid boxes.

    Returns:
      (P, G) bool: point p inside box g.
    """
    axes, offsets = box_frame(corners)                 # (G,3,3), (G,3)
    # One MXU matmul: (P,3) @ (3, G*3)
    G = corners.shape[0]
    proj = points @ axes.reshape(G * 3, 3).T           # (P, G*3)
    proj = proj.reshape(points.shape[0], G, 3) + offsets
    inside = jnp.all((proj >= 0) & (proj <= 1), axis=-1)
    if box_mask is not None:
        inside = inside & box_mask
    return inside


def points_in_aabb(points, corners, box_mask=None):
    """Axis-aligned fallback test (``point_in_bbox``, V1:118-139)."""
    lo = jnp.min(corners, axis=-2)                     # (G, 3)
    hi = jnp.max(corners, axis=-2)
    p = points[:, None, :]
    inside = jnp.all((p >= lo[None]) & (p <= hi[None]), axis=-1)
    if box_mask is not None:
        inside = inside & box_mask
    return inside


def corners_visibility(corners_cam0, intrinsics, width, height,
                       min_corners=2, depth_min=0.1, box_mask=None):
    """``filter_visible_bboxes`` (V1:96-115) as a batched mask.

    A box is kept when >= ``min_corners`` of its 8 cam0-frame corners project
    in front of the camera (depth > 0.1) and inside the image.
    """
    u, v, depth = cam2image(corners_cam0, intrinsics)  # (G, 8) each
    ok = ((depth > depth_min)
          & (u >= 0) & (u < width) & (v >= 0) & (v < height))
    visible = jnp.sum(ok, axis=-1) >= min_corners
    if box_mask is not None:
        visible = visible & box_mask
    return visible


REASON_VALID = 0
REASON_ALL_BEHIND = 1
REASON_NO_INTERSECTION = 2
REASON_TOO_SMALL = 3


def corners_visibility_rich(corners_cam0, intrinsics, width, height,
                            min_corners_in_view=4,
                            depth_range=(0.1, 100.0),
                            min_projected_area=100.0,
                            box_mask=None):
    """The richest reference visibility filter, ``is_bbox_in_camera_view``
    (secondtest.py:277-359), batched: depth-range check, in-image corner
    count with an image-intersection fallback, and a minimum projected-area
    gate, returning both the keep mask and per-box filter-reason codes
    (secondtest.py's filter_reasons statistics, :362-419).

    Returns (keep (G,) bool, reason (G,) int32 of REASON_* codes).
    """
    u, v, depth = cam2image(corners_cam0, intrinsics)      # (G, 8)
    dmin, dmax = depth_range
    valid_depth = (depth >= dmin) & (depth <= dmax)
    n_depth = jnp.sum(valid_depth, axis=-1)

    in_image = ((u >= 0) & (u < width) & (v >= 0) & (v < height)
                & valid_depth)
    n_view = jnp.sum(in_image, axis=-1)

    big = jnp.asarray(jnp.inf, u.dtype)
    u_min = jnp.min(jnp.where(valid_depth, u, big), axis=-1)
    u_max = jnp.max(jnp.where(valid_depth, u, -big), axis=-1)
    v_min = jnp.min(jnp.where(valid_depth, v, big), axis=-1)
    v_max = jnp.max(jnp.where(valid_depth, v, -big), axis=-1)
    intersects = ~((u_max < 0) | (u_min >= width)
                   | (v_max < 0) | (v_min >= height))
    area = (u_max - u_min) * (v_max - v_min)

    any_depth = n_depth > 0
    # reference control flow: few corners in view is OK if the projected
    # extent still intersects the image; >= 2 depth-valid corners enable
    # the min-area gate
    enough_view = (n_view >= min_corners_in_view) | intersects
    big_enough = (n_depth < 2) | (area >= min_projected_area)
    keep = any_depth & enough_view & big_enough
    reason = jnp.where(
        ~any_depth, REASON_ALL_BEHIND,
        jnp.where(~enough_view, REASON_NO_INTERSECTION,
                  jnp.where(~big_enough, REASON_TOO_SMALL, REASON_VALID)))
    if box_mask is not None:
        keep = keep & box_mask
    return keep, reason.astype(jnp.int32)


def project_boxes_to_2d(corners_cam0, intrinsics):
    """``project_3d_bbox_to_2d`` (V5:215-252) batched over boxes.

    Returns a dict of (G,)-shaped arrays: ``bbox`` (G, 4) xyxy, ``center``
    (G, 2), ``size`` (G, 2), ``area``, ``avg_depth``, and ``valid`` (any
    corner with depth > 0).  Boxes with no positive-depth corner get
    sentinel zeros and ``valid=False`` (the reference returns None there).
    """
    u, v, depth = cam2image(corners_cam0, intrinsics)  # (G, 8)
    pos = depth > 0
    valid = jnp.any(pos, axis=-1)
    big = jnp.asarray(jnp.inf, u.dtype)
    x_min = jnp.min(jnp.where(pos, u, big), axis=-1)
    x_max = jnp.max(jnp.where(pos, u, -big), axis=-1)
    y_min = jnp.min(jnp.where(pos, v, big), axis=-1)
    y_max = jnp.max(jnp.where(pos, v, -big), axis=-1)
    x_min = jnp.where(valid, x_min, 0.0)
    x_max = jnp.where(valid, x_max, 0.0)
    y_min = jnp.where(valid, y_min, 0.0)
    y_max = jnp.where(valid, y_max, 0.0)
    width = x_max - x_min
    height = y_max - y_min
    depth_sum = jnp.sum(jnp.where(pos, depth, 0.0), axis=-1)
    depth_cnt = jnp.maximum(jnp.sum(pos, axis=-1), 1)
    return {
        "bbox": jnp.stack([x_min, y_min, x_max, y_max], axis=-1),
        "center": jnp.stack([(x_min + x_max) / 2, (y_min + y_max) / 2], axis=-1),
        "size": jnp.stack([width, height], axis=-1),
        "area": width * height,
        "avg_depth": depth_sum / depth_cnt,
        "valid": valid,
    }


def iou_2d_matrix(boxes_a, boxes_b):
    """Pairwise 2D IoU (``calculate_iou_2d``, V4:118-137).

    Args:
      boxes_a: (N, 4) xyxy; boxes_b: (M, 4) xyxy.
    Returns:
      (N, M) IoU; zero where the intersection is empty or union is zero.
    """
    a = boxes_a[:, None, :]
    b = boxes_b[None, :, :]
    xi_min = jnp.maximum(a[..., 0], b[..., 0])
    yi_min = jnp.maximum(a[..., 1], b[..., 1])
    xi_max = jnp.minimum(a[..., 2], b[..., 2])
    yi_max = jnp.minimum(a[..., 3], b[..., 3])
    iw = xi_max - xi_min
    ih = yi_max - yi_min
    empty = (iw <= 0) | (ih <= 0)
    inter = jnp.where(empty, 0.0, iw * ih)
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)
