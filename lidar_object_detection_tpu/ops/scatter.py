"""On-device per-detection depth-map scatter.

Replaces the reference's Python scatter loop
(``seg_with_pointcloud.py:160-170``): for each car mask it iterates the valid
point indices and writes ``depthMap[y, x] = depth``.  Here the scatter is one
vmapped ``scatter-max`` over the packed per-point membership -- deterministic
on device (the reference's loop is last-write-wins in scan order; colliding
points on the same pixel of the same instance differ only at millimetres, and
the parity tests compare against a max-reduced oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_depth_maps(u, v, depth, car_mask, valid, height: int, width: int):
    """Build per-detection depth maps.

    Args:
      u, v: (P,) pixel coordinates.
      depth: (P,) depths.
      car_mask: (D, P) bool membership (from ``gather_mask_bits``).
      valid: (P,) bool point validity.
      height, width: static image size.

    Returns:
      (D, H, W) float32 depth maps; zero where no point landed.
    """
    ui = jnp.clip(u.astype(jnp.int32), 0, width - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, height - 1)
    neg = jnp.asarray(-jnp.inf, depth.dtype)

    def one(mask_d):
        vals = jnp.where(mask_d & valid, depth, neg)
        dm = jnp.full((height, width), neg, depth.dtype)
        dm = dm.at[vi, ui].max(vals)
        return jnp.where(jnp.isfinite(dm), dm, 0.0).astype(jnp.float32)

    return jax.vmap(one)(car_mask)
