"""TPU-native pillar voxelization.

PointPillars (Lang et al., CVPR 2019 -- PAPERS.md) discretizes the x-y
plane into pillars, augments each point with pillar statistics, runs a
per-point linear + max-pool per pillar, and scatters pillar features into a
dense BEV image.  CUDA implementations build ragged per-pillar point lists;
the TPU-first redesign here never materializes them:

  1. per-point pillar id via floor-divide (fixed grid, fixed P),
  2. pillar sums / counts via one ``scatter-add`` over the dense grid,
  3. per-point augmented features (offsets from pillar mean + center),
  4. (after the pointwise embedding) ``scatter-max`` straight into the
     dense (ny, nx, C) BEV image.

Everything is fixed-shape, mask-disciplined, and differentiable (the
scatter-max gradient flows to the argmax points), so the same path serves
training and inference and shards over the ``data`` mesh axis like the rest
of the framework.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PillarGridConfig:
    """Standard KITTI car-detection grid (PointPillars section 4.1)."""

    x_range: Tuple[float, float] = (0.0, 69.12)
    y_range: Tuple[float, float] = (-39.68, 39.68)
    z_range: Tuple[float, float] = (-3.0, 1.0)
    pillar_size: float = 0.16

    @property
    def nx(self) -> int:
        return int(round((self.x_range[1] - self.x_range[0])
                         / self.pillar_size))

    @property
    def ny(self) -> int:
        return int(round((self.y_range[1] - self.y_range[0])
                         / self.pillar_size))


def pillar_ids(points, valid, cfg: PillarGridConfig):
    """Per-point pillar index into the flattened (ny, nx) grid.

    Returns (ids (P,) int32, in_grid (P,) bool).  Out-of-range or invalid
    points get id 0 with in_grid False (callers mask their contribution).
    """
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    ix = jnp.floor((x - cfg.x_range[0]) / cfg.pillar_size).astype(jnp.int32)
    iy = jnp.floor((y - cfg.y_range[0]) / cfg.pillar_size).astype(jnp.int32)
    in_grid = (valid
               & (ix >= 0) & (ix < cfg.nx)
               & (iy >= 0) & (iy < cfg.ny)
               & (z >= cfg.z_range[0]) & (z <= cfg.z_range[1]))
    ids = jnp.where(in_grid, iy * cfg.nx + ix, 0)
    return ids, in_grid


def point_features(points, valid, cfg: PillarGridConfig, batch: int = 1):
    """The 9-dim PointPillars per-point feature:
    (x, y, z, reflectance, x-xc, y-yc, z-zc, x-cx, y-cy) where (xc, yc, zc)
    is the pillar's point mean and (cx, cy) the pillar's geometric center.

    Fully batched without vmap: callers flatten (B, P) -> (B*P) and pass
    ``batch``; pillar ids get per-frame offsets so one scatter serves the
    whole batch.

    Returns (features (B*P, 9) f32, ids (B*P,) batch-offset, in_grid).
    """
    ids, in_grid = pillar_ids(points, valid, cfg)
    if batch > 1:
        per = points.shape[0] // batch
        offs = jnp.repeat(jnp.arange(batch, dtype=jnp.int32) * cfg.nx * cfg.ny,
                          per)
        ids = ids + offs
    n_pillars = batch * cfg.nx * cfg.ny
    w = in_grid.astype(jnp.float32)

    # float32 explicitly: float64 points (x64 test mode) would otherwise
    # hit the scatter dtype-promotion FutureWarning / future hard error
    xyz = points[:, :3].astype(jnp.float32) * w[:, None]
    sums = jnp.zeros((n_pillars, 3), jnp.float32).at[ids].add(xyz)
    counts = jnp.zeros((n_pillars,), jnp.float32).at[ids].add(w)
    means = sums[ids] / jnp.maximum(counts[ids], 1.0)[:, None]   # (P, 3)

    cx = (jnp.floor((points[:, 0] - cfg.x_range[0]) / cfg.pillar_size)
          + 0.5) * cfg.pillar_size + cfg.x_range[0]
    cy = (jnp.floor((points[:, 1] - cfg.y_range[0]) / cfg.pillar_size)
          + 0.5) * cfg.pillar_size + cfg.y_range[0]

    refl = points[:, 3] if points.shape[1] > 3 else jnp.zeros_like(points[:, 0])
    feats = jnp.stack([
        points[:, 0], points[:, 1], points[:, 2], refl,
        points[:, 0] - means[:, 0],
        points[:, 1] - means[:, 1],
        points[:, 2] - means[:, 2],
        points[:, 0] - cx,
        points[:, 1] - cy,
    ], axis=-1).astype(jnp.float32)
    feats = feats * w[:, None]
    return feats, ids, in_grid


def scatter_bev(embedded, ids, in_grid, cfg: PillarGridConfig,
                batch: int = 1):
    """Max-pool per pillar + dense BEV scatter in one op.

    Args:
      embedded: (B*P, C) per-point embeddings (post linear+BN+ReLU, >= 0).
      ids / in_grid: from :func:`point_features` (batch-offset ids).

    Returns:
      (B, ny, nx, C) float32 BEV pseudo-image (zeros where no points --
      exact for ReLU-activated embeddings: empty pillars contribute zero
      features, like the reference's dense scatter).
    """
    n_pillars = batch * cfg.nx * cfg.ny
    c = embedded.shape[-1]
    vals = jnp.where(in_grid[:, None], embedded, 0.0)
    grid = jnp.zeros((n_pillars, c), embedded.dtype).at[ids].max(vals)
    return grid.reshape(batch, cfg.ny, cfg.nx, c)
