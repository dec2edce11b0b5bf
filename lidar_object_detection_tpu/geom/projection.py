"""Jitted Velodyne -> rectified-camera projection.

The reference's hot projection loop (V1_BBox_Pointwise_filtering.py:340-344)
is a 4x4 matmul over ~120k points followed by the devkit's
``CameraPerspective.cam2image`` (intrinsic multiply, perspective divide by
``abs(depth)``, round to integer pixels) and the validity mask at V1:357.
Here the whole thing is one fused XLA pass over a padded point tensor: the
matmuls hit the MXU, the elementwise tail fuses, and nothing leaves the
device.

Parity notes (vs the devkit):
* zero depths are replaced by ``-1e-6`` before the divide,
* the divisor is ``abs(depth)`` (points behind the camera keep their sign
  quirks),
* pixel coords are ``round`` (numpy/jax round-half-to-even) -- kept as the
  input float dtype; cast to int only where consumers need it.
"""

from __future__ import annotations

import jax.numpy as jnp


def cam2image(points_cam, intrinsics):
    """Project camera-frame points to pixel coordinates.

    Args:
      points_cam: (..., 3) rectified-camera-frame points.
      intrinsics: (3, 3) camera matrix (left 3x3 of P_rect).

    Returns:
      (u, v, depth): each (...,); u/v are rounded floats, depth is raw z.
    """
    proj = points_cam @ jnp.asarray(intrinsics, dtype=points_cam.dtype).T
    depth = proj[..., 2]
    depth = jnp.where(depth == 0, jnp.asarray(-1e-6, depth.dtype), depth)
    abs_depth = jnp.abs(depth)
    u = jnp.round(proj[..., 0] / abs_depth)
    v = jnp.round(proj[..., 1] / abs_depth)
    return u, v, depth


def project_velo_points(points, velo_to_rect, intrinsics):
    """Velodyne points -> (u, v, depth) in the rectified camera.

    Args:
      points: (P, 4) or (P, 3) velodyne-frame points; any 4th (reflectance)
        channel is ignored (the reference overwrites it with 1, V1:341).
      velo_to_rect: (4, 4) ``R_rect @ TrVeloToCam``.
      intrinsics: (3, 3).
    """
    xyz = points[..., :3]
    T = jnp.asarray(velo_to_rect, dtype=xyz.dtype)
    # Homogeneous transform without materializing the w column:
    points_rect = xyz @ T[:3, :3].T + T[:3, 3]
    return cam2image(points_rect, intrinsics)


def point_validity(u, v, depth, width, height, depth_min, depth_max,
                   point_mask=None):
    """The reference's FOV/depth validity mask (V1:357):
    ``(u >= 0) & (u < W) & (v >= 0) & (v < H) & (depth > dmin) & (depth < dmax)``.
    """
    valid = ((u >= 0) & (u < width) & (v >= 0) & (v < height)
             & (depth > depth_min) & (depth < depth_max))
    if point_mask is not None:
        valid = valid & point_mask
    return valid
